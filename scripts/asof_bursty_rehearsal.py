"""Bursty-timeline rehearsal for asof_join's quantile time buckets
(round-7 VERDICT item #1).

The r6 bucketed mode sliced the timeline into FIXED-WIDTH buckets from
min/max — on a bursty timeline (crawl snapshots: most events in one
epoch, a thin tail across years) ~99% of rows land in ONE bucket and
the mode degenerates back to the serial single-task window it exists
to fix. Round 7 replaced the boundaries with percentile_approx
quantiles (equi-depth in ROWS, skew-proof by construction).

This script plants exactly that adversarial shape — 20M events, one
key, 99% of timestamps inside a 1e6-wide epoch, 1% strewn to 5e13 —
and measures:

* the single-window plan (baseline; serial on the one key),
* the quantile-bucketed two-phase plan (the shipped code),
* the OLD fixed-width assignment, reconstructed inline, timed on the
  identical within-bucket carry window (the stage bucketing
  parallelizes) so the comparison isolates the boundary rule,
* the max bucket row-share under both rules (the skew itself).

Checksums of the two full plans must be identical. Run EXCLUSIVELY.
Writes BENCH/asof_bursty_rehearsal.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F
from pyspark.sql.window import Window

N_LEFT = 20_000_000
N_RIGHT = 200_000
BUCKETS = 64
EPOCH = 1_000_000          # the burst: 99% of ts in [0, 1e6)
SPREAD = 50_000_000_000_000  # the tail: 1% out to 5e13


def bursty_ts(idcol, salt):
    h = F.pmod(F.xxhash64(idcol, F.lit(salt)), F.lit(100))
    inside = F.pmod(F.xxhash64(idcol, F.lit(salt + 1)), F.lit(EPOCH))
    outside = F.pmod(F.xxhash64(idcol, F.lit(salt + 2)), F.lit(SPREAD))
    return F.when(h < 99, inside).otherwise(outside)


def main():
    spark = (SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("asof_bursty_rehearsal")
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
                    (bursty_ts(F.col("id"), 11) * 2 + 1).alias("t")))
    right = (spark.range(N_RIGHT)
             .select(F.lit("the_key").alias("k"),
                     (bursty_ts(F.col("id"), 101) * 2).alias("t"),
                     (F.col("id") % 1000).cast("double").alias("snap")))
    right = right.groupBy("k", "t").agg(F.max("snap").alias("snap"))
    left.cache().count(); right.cache().count()

    def checksum(df):
        # modular sum: ts reach 5e13 so a raw 20M-row SUM overflows
        # int64; pmod keeps it exact and order-independent
        return df.agg(F.count("*").alias("n"),
                      F.sum(F.pmod(F.col("t_asof"), F.lit(1_000_000_007)))
                      .alias("sum_ts_mod"),
                      F.sum("snap_asof").alias("sum_snap")) \
                 .collect()[0].asDict()

    def timed(**kw):
        t0 = time.time()
        c = checksum(asof_join(left, right, key="k", left_ts="t",
                               right_ts="t", **kw))
        return round(time.time() - t0, 2), c

    results = {}
    for trial in range(2):
        for name, kw in (("single_window", {"time_buckets": None}),
                         ("quantile_bucketed", {"time_buckets": BUCKETS})):
            t, c = timed(**kw)
            if name not in results or t < results[name][0]:
                results[name] = (t, c)
    (t_win, c_win) = results["single_window"]
    (t_q, c_q) = results["quantile_bucketed"]
    assert c_win == c_q, (c_win, c_q)

    # --- isolate the boundary rule on the carry window stage --------
    u = (left.select("k", F.col("t").alias("__ts"),
                     F.lit(1).alias("__side"),
                     F.lit(None).cast("double").alias("__snap"))
         .unionByName(right.select(
             "k", F.col("t").alias("__ts"), F.lit(0).alias("__side"),
             F.col("snap").alias("__snap"))))
    u = u.cache(); u.count()
    lo, hi = u.select(F.min(F.col("__ts").cast("double")),
                      F.max(F.col("__ts").cast("double"))).first()
    width = (hi - lo) / BUCKETS
    fixed_b = F.least(F.lit(BUCKETS - 1),
                      F.floor((F.col("__ts").cast("double") - F.lit(lo))
                              / F.lit(width))).cast("int")
    qs = [i / BUCKETS for i in range(1, BUCKETS)]
    bounds = sorted({b for b in u.select(F.percentile_approx(
        F.col("__ts").cast("double"),
        F.array(*[F.lit(q) for q in qs]), F.lit(10_000))
        .alias("c")).first()["c"] if b is not None})
    quant_b = F.lit(0)
    for b in bounds:
        quant_b = quant_b + ((F.col("__ts").cast("double") >= F.lit(b))
                             .cast("int"))

    def carry_stage_time(bcol):
        w = (Window.partitionBy("k", "__b").orderBy("__ts", "__side")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        t0 = time.time()
        (u.withColumn("__b", bcol)
         .withColumn("__w", F.last("__snap", ignorenulls=True).over(w))
         .agg(F.sum("__w")).collect())
        return round(time.time() - t0, 2)

    def max_share(bcol):
        hist = [r["n"] for r in u.groupBy(bcol.alias("__b"))
                .agg(F.count("*").alias("n")).collect()]
        return round(max(hist) / sum(hist), 4)

    stage = {}
    for trial in range(2):
        for name, col in (("fixed_width", fixed_b),
                          ("quantile", quant_b)):
            t = carry_stage_time(col)
            if name not in stage or t < stage[name]:
                stage[name] = t

    out = {
        "left_rows": N_LEFT, "right_rows": N_RIGHT, "keys": 1,
        "time_buckets": BUCKETS, "effective_quantile_buckets":
            len(bounds) + 1,
        "burst": {"epoch_width": EPOCH, "tail_spread": SPREAD,
                  "burst_fraction": 0.99},
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        "full_plan_wall_s": {"single_window": t_win,
                             "quantile_bucketed": t_q},
        "full_plan_speedup": round(t_win / t_q, 2),
        "carry_stage_wall_s": stage,
        "carry_stage_speedup_quantile_vs_fixed":
            round(stage["fixed_width"] / stage["quantile"], 2),
        "max_bucket_share": {"fixed_width": max_share(fixed_b),
                             "quantile": max_share(quant_b)},
        "checksums_equal": c_win == c_q,
        "checksum": c_win,
    }
    print(json.dumps(out, indent=1))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH",
            "asof_bursty_rehearsal.json"), "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
