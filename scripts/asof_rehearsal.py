"""A/B rehearsal for asof_join at scale: 20M events x 2M snapshots
over 100k keys.

The obvious SQL a user writes — a range join (``l.key = r.key AND
r.ts <= l.ts``) followed by a per-event max — materializes every
(event, prior-snapshot) PAIR before reducing: with ~10 prior
snapshots per event that is ~200M intermediate rows, and it grows
with snapshot history. ``asof_join``'s union + window carry-forward
touches each input row exactly once (22M rows through one keyed
window), so its cost tracks the INPUTS, not the pair count.

Both plans must agree on the matched-snapshot checksum (snapshots are
unique per (key, ts) by construction, so the as-of pick is
deterministic). Run EXCLUSIVELY. Writes BENCH/asof_rehearsal.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

N_LEFT = 20_000_000
N_RIGHT = 2_000_000
KEYS = 100_000


def main():
    spark = (SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("asof_rehearsal")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from algebird_spark.operators.joins import asof_join

    # deterministic synthetic streams: ts unique per (key, side-row)
    left = (spark.range(N_LEFT)
            .select(F.col("id").alias("event_id"),
                    F.pmod(F.col("id"), F.lit(KEYS)).alias("k"),
                    (F.pmod(F.xxhash64("id"), F.lit(1_000_000)) * 2 + 1)
                    .alias("t")))
    right = (spark.range(N_RIGHT)
             .select(F.pmod(F.col("id"), F.lit(KEYS)).alias("k"),
                     (F.pmod(F.xxhash64("id", F.lit(7)),
                             F.lit(1_000_000)) * 2).alias("t"),
                     (F.col("id") % 1000).cast("double").alias("snap")))
    # odd left ts vs even right ts -> no cross-side ties; right ts
    # unique per key w.h.p. is NOT guaranteed, so dedupe exactly:
    right = right.groupBy("k", "t").agg(F.max("snap").alias("snap"))
    left.cache().count(); right.cache().count()

    def checksum(df):
        return df.agg(
            F.count("*").alias("n"),
            F.sum("t_asof").alias("sum_ts"),
            F.sum("snap_asof").alias("sum_snap")).collect()[0].asDict()

    t0 = time.time()
    a = checksum(asof_join(left, right, key="k", left_ts="t",
                           right_ts="t"))
    t_asof = time.time() - t0

    # the naive range-join plan (pairs then per-event max)
    t0 = time.time()
    r2 = right.withColumnRenamed("t", "rt").withColumnRenamed("k", "rk")
    pairs = left.join(r2, (left["k"] == r2["rk"]) & (r2["rt"] <= left["t"]),
                      "left")
    naive = (pairs.groupBy("event_id")
             .agg(F.max(F.struct(F.col("rt").alias("t_asof"),
                                 F.col("snap").alias("snap_asof")))
                  .alias("m"))
             .select("event_id", "m.t_asof", "m.snap_asof"))
    b = checksum(naive)
    t_naive = time.time() - t0

    out = {
        "left_rows": N_LEFT, "right_rows": N_RIGHT, "keys": KEYS,
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        "wall_s": {"asof_join": round(t_asof, 2),
                   "naive_range_join": round(t_naive, 2)},
        "speedup": round(t_naive / t_asof, 2),
        "checksums_equal": a == b,
        "checksum": a,
    }
    print(json.dumps(out, indent=1))
    assert a == b, (a, b)
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH", "asof_rehearsal.json"),
            "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
