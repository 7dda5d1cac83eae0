"""A/B rehearsal for pruned deterministic weighted sampling at
window-dominated scale: draw k=10,000 docs by quality weight from 50M
wide-ish rows — the "sample a training subset from the corpus" shape.

``weighted_sample`` is Efraimidis-Spirakis A-ES on a reproducible
uniform, so the sample IS a global top-k on the A-ES key
``ln(u)/w``; the plain plan ships all 50M keyed rows (with payload)
through one rank Exchange. ``pruned=True`` routes through
``top_k_pruned``'s grid cutoff so the Exchange sees only the
survivors. Both are exact and deterministic, so the row SETS must be
identical — checked by checksum.

Run EXCLUSIVELY (no concurrent Spark jobs — BENCH/BASELINE.md notes).
Writes BENCH/wsample_rehearsal.json. Trials alternate plans so a
drifting VM window cannot favor one side; wall is best-of-2 per plan.
The box-independent structural number is the survivor count: the rank
input under the prune vs N for the plain plan — the shuffle-bytes cut
a real cluster's network would see.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

N = 50_000_000
K = 10_000
ACC = 10_000


def main():
    spark = (SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("wsample_rehearsal")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from algebird_spark.operators.topk import weighted_sample

    # log-uniform weights in [1, 1000] (quality-score-ish heavy tail),
    # wide-ish payload so the rank Exchange carries real bytes
    df = (spark.range(N)
          .select(F.col("id").alias("doc_id"),
                  F.exp((F.pmod(F.hash(F.col("id")), F.lit(10000))
                         / 10000.0) * math.log(1000.0)).alias("w"),
                  F.concat(F.lit("payload-"),
                           F.md5(F.col("id").cast("string"))).alias("pay"))
          .repartition(64).persist())
    df.count()

    def checksum(out):
        r = out.agg(F.count(F.lit(1)).alias("n"),
                    F.sum(F.crc32(F.col("pay"))).alias("s"),
                    F.sum("w").alias("sw")).collect()[0]
        return {"n": int(r["n"]), "s": int(r["s"]),
                "sw": round(float(r["sw"]), 6)}

    def run_window():
        return checksum(weighted_sample(df, K, "w", id_col="doc_id"))

    def run_pruned():
        return checksum(weighted_sample(df, K, "w", id_col="doc_id",
                                        pruned=True))

    rec = {"rows": N, "k": K, "accuracy": ACC,
           "cpus": spark.sparkContext.defaultParallelism,
           "protocol": "alternating trials, best-of-2 per plan"}

    walls = {"window": [], "pruned": []}
    results = {}
    for _ in range(2):
        for name, fn in (("window", run_window), ("pruned", run_pruned)):
            t0 = time.time()
            results[name] = fn()
            walls[name].append(round(time.time() - t0, 2))
    rec["wall_s"] = {k: min(v) for k, v in walls.items()}
    rec["trials"] = walls
    rec["checksums"] = results
    rec["checksums_equal"] = results["window"] == results["pruned"]

    # structural: exact survivor count of the grid prune on the A-ES
    # key (the rank-window input), re-derived the way the operator does
    U48 = 281474976710656.0
    u = (F.conv(F.substring(
            F.md5(F.concat(F.lit("wsample"), F.lit(":"),
                           F.col("doc_id").cast("string"))), 1, 12),
         16, 10).cast("long") + 1) / F.lit(U48)
    keyed = (df.filter(F.col("w") > 0)
               .select((F.log(u) / F.col("w")).alias("__wkey"))
               .persist())
    n = keyed.count()
    ps = [1.0 - 2.0 ** -j for j in range(1, 41)]
    qs = keyed.agg(F.percentile_approx(
        "__wkey", F.array(*[F.lit(p) for p in ps]),
        F.lit(ACC)).alias("qs")).collect()[0]["qs"]
    slack = K + 2.0 / ACC * n
    j = min(int(math.floor(math.log2(n / slack))), 40)
    surv = keyed.filter(F.col("__wkey") >= qs[j - 1]).count()
    rec["window_input_rows"] = {"plain": n, "grid": int(surv)}
    rec["exchange_row_cut"] = round(n / max(surv, 1), 1)
    print(json.dumps(rec, indent=1))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH", "wsample_rehearsal.json"),
            "w") as f:
        json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
