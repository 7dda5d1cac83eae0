"""Split Spark-side cost: null kernel (scan+arrow+grouping only) vs
single-sketch vs full multisketch, at a given core count.
Usage: python scripts/split_probe.py <cores> <null|hllonly|full>"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
cores = int(sys.argv[1])
mode = sys.argv[2]

from pyspark.sql import SparkSession

spark = (SparkSession.builder.master(f"local[{cores}]")
         .config("spark.sql.shuffle.partitions", str(cores))
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
         .config("spark.driver.memory", "48g")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from algebird_spark.agg import sketch_by_key
from algebird_spark.sketches import (CMS, HLL, KLL, BloomFilter, MultiSketch,
                                     TDigest)
from algebird_spark.sketches.base import Sketch
import algebird_spark.sketches.base as B


class NullSketch(Sketch):
    KIND = 99

    def __init__(self):
        self.n = 0

    def _params(self):
        return {}

    def update_batch(self, v):
        self.n += len(v)

    def merge_in_place(self, o):
        self.n += o.n
        return self

    def present(self):
        return self.n

    def _payload(self):
        return b""


B._DECODERS[99] = lambda p, b: NullSketch()

tok = spark.read.parquet("/root/repo/.data/tokens_scaling_200000")
n_tokens = 121_700_512
factory = {
    "null": NullSketch,
    "hllonly": lambda: HLL(14),
    "full": lambda: MultiSketch({
        "hll": HLL(14),
        "cms": CMS(0.001, 1e-6, heavy_hitters_pct=0.001),
        "kll": KLL(200), "tdigest": TDigest(200),
        "bloom": BloomFilter(300_000, 0.01)})}[mode]
t0 = time.time()
n = sketch_by_key(tok, ["source"], "tokens", factory).count()
el = time.time() - t0
print(json.dumps({"cores": cores, "mode": mode, "sec": round(el, 1),
                  "mtoks": round(n_tokens / el / 1e6, 2)}))
spark.stop()
