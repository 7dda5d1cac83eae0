"""Worst-case rehearsal for asof_join's two-phase mode: ONE key,
20M events x 200k snapshots.

The default keyed-window plan puts the whole key in a single task —
correct, but serial no matter the cluster size (the same failure shape
the round-5 VERDICT flagged on pack_sequences). ``time_buckets=64``
slices the timeline so 64 tasks each carry one slice, with a 64-row
carry table broadcast for the hand-off. At 100x the data the bucketed
plan's wall tracks slice size; the single-window plan's tracks the
whole key.

Checksums must be IDENTICAL (last-non-null carry is associative
across the bucket cut). Run EXCLUSIVELY. Writes
BENCH/asof_bucketed_rehearsal.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

N_LEFT = 20_000_000
N_RIGHT = 200_000
BUCKETS = 64


def main():
    spark = (SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("asof_bucketed_rehearsal")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from algebird_spark.operators.joins import asof_join

    left = (spark.range(N_LEFT)
            .select(F.col("id").alias("event_id"),
                    F.lit("the_key").alias("k"),
                    (F.pmod(F.xxhash64("id"), F.lit(50_000_000)) * 2 + 1)
                    .alias("t")))
    right = (spark.range(N_RIGHT)
             .select(F.lit("the_key").alias("k"),
                     (F.pmod(F.xxhash64("id", F.lit(7)),
                             F.lit(50_000_000)) * 2).alias("t"),
                     (F.col("id") % 1000).cast("double").alias("snap")))
    right = right.groupBy("k", "t").agg(F.max("snap").alias("snap"))
    left.cache().count(); right.cache().count()

    def checksum(df):
        return df.agg(F.count("*").alias("n"),
                      F.sum("t_asof").alias("sum_ts"),
                      F.sum("snap_asof").alias("sum_snap")) \
                 .collect()[0].asDict()

    def timed(**kw):
        t0 = time.time()
        c = checksum(asof_join(left, right, key="k", left_ts="t",
                               right_ts="t", **kw))
        return round(time.time() - t0, 2), c

    # alternate, best of 2 per plan
    results = {}
    for trial in range(2):
        for name, kw in (("single_window", {"time_buckets": None}),
                         ("bucketed_64", {"time_buckets": BUCKETS})):
            t, c = timed(**kw)
            if name not in results or t < results[name][0]:
                results[name] = (t, c)
    (t_a, c_a), (t_b, c_b) = results["single_window"], results["bucketed_64"]
    out = {
        "left_rows": N_LEFT, "right_rows": N_RIGHT, "keys": 1,
        "time_buckets": BUCKETS,
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        "wall_s": {"single_window": t_a, "bucketed": t_b},
        "speedup": round(t_a / t_b, 2),
        "checksums_equal": c_a == c_b,
        "checksum": c_a,
    }
    print(json.dumps(out, indent=1))
    assert c_a == c_b, (c_a, c_b)
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH",
            "asof_bucketed_rehearsal.json"), "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
