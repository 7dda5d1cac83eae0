"""FrequentDirections build-throughput rehearsal at 2M x 64
(materialized parquet, one sketch_global pass, best-of-3).
Run EXCLUSIVELY. Writes BENCH/fd_rehearsal.json."""

import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession, functions as F

spark = (SparkSession.builder.master("local[32]")
         .config("spark.driver.memory", "16g")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from algebird_spark.agg import sketch_global
from algebird_spark.sketches import FrequentDirections
import numpy as np
import pandas as pd

PATH = "/root/repo/.data/fd_vectors_2m"
N, D, ELL = 2_000_000, 64, 16
if not os.path.exists(os.path.join(PATH, "_SUCCESS")):
    def make(it):
        for pdf in it:
            ids = pdf["id"].to_numpy()
            rng = np.random.default_rng(ids[0] if len(ids) else 0)
            mat = rng.standard_normal((len(ids), D)) * np.linspace(4, 0.1, D)
            out = pd.DataFrame({"vec_id": ids})
            out["embedding"] = list(mat)
            yield out
    (spark.range(N).repartition(64)
     .mapInPandas(make, "vec_id long, embedding array<double>")
     .write.mode("overwrite").parquet(PATH))
vec = spark.read.parquet(PATH)

best = float("inf")
sk = None
for _ in range(3):
    t0 = time.time()
    sk = sketch_global(vec, "embedding", lambda: FrequentDirections(D, ELL))
    best = min(best, time.time() - t0)
assert sk.n == N
rec = {"rows": N, "dim": D, "ell": ELL, "build_s": round(best, 2),
       "vectors_per_sec": int(N / best),
       "state_bytes": len(sk.to_bytes()),
       "error_bound": round(sk.error_bound(), 1),
       "sq_frob": round(sk.sq_frob, 1)}
json.dump(rec, open("/root/repo/BENCH/fd_rehearsal.json", "w"), indent=2)
print(json.dumps(rec))
spark.stop()
