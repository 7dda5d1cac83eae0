"""A/B rehearsal for rollup_or_resume at warehouse-maintenance scale:
a 50M-row base corpus with a 1% daily increment, distinct ids over
ROLLUP(source, day).

The naive daily job rebuilds the cube from ALL rows (base + increment)
— the cost grows with history. ``rollup_or_resume`` sketches ONLY the
increment's files (monoid append into the checkpointed finest states)
and re-derives every level from the state table — the cost tracks the
increment, not the corpus. At a 100:1 corpus:increment ratio the full
rebuild scans 100x the data the incremental path touches; at 100 TB
with years of history the ratio (and the win) is far larger.

Run EXCLUSIVELY (no concurrent Spark jobs — BENCH/BASELINE.md notes).
Writes BENCH/cube_maintenance_rehearsal.json. Level estimates must be
IDENTICAL between the incremental path and a fresh full rollup
(HLL register-max associativity), checked per level.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

N_BASE = 50_000_000
N_INC = 500_000
SOURCES = 10
DAYS = 16
P = 14


def main():
    spark = (SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("cube_maintenance_rehearsal")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.ui.enabled", "false")
        .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from algebird_spark.agg import STATE_COL, sketch_rollup
    from algebird_spark.sketches import HLL, from_bytes
    from algebird_spark.sources.checkpoint import rollup_or_resume

    work = "/tmp/cube_rehearsal"
    shutil.rmtree(work, ignore_errors=True)
    src = f"{work}/corpus"
    ck = f"{work}/ck"

    def gen(n, id_off, day_off, days):
        return (spark.range(n)
                .withColumn("id", F.col("id") + id_off)
                .withColumn("source",
                            F.concat(F.lit("s"),
                                     F.pmod(F.xxhash64("id"), SOURCES)))
                .withColumn("day",
                            (day_off + F.pmod(F.xxhash64("id", F.lit(7)),
                                              days)).cast("int"))
                .withColumn("uid", F.pmod(F.xxhash64("id", F.lit(13)),
                                          N_BASE // 5))
                .select("source", "day", "uid"))

    # base corpus lands as many files (day-partition-ish write)
    gen(N_BASE, 0, 0, DAYS).repartition(32).write.parquet(src)

    factory = lambda: HLL(p=P)  # noqa: E731
    keys = ["source", "day"]

    def ests(levels_df):
        return {tuple(r[c] for c in ("source", "day", "grouping_id")):
                from_bytes(bytes(r[STATE_COL])).estimate()
                for r in levels_df.collect()}

    # day 0: build the checkpointed cube (one-time cost, reported)
    t0 = time.time()
    base_levels = ests(rollup_or_resume(
        spark, spark.read.parquet(src), keys, "uid", factory, ck))
    t_build = time.time() - t0

    # the daily increment arrives as appended files (new day)
    gen(N_INC, N_BASE, DAYS, 1).coalesce(2).write.mode("append").parquet(src)
    full_df = spark.read.parquet(src)

    # A: incremental maintenance — sketch only the new files
    t0 = time.time()
    inc_levels = ests(rollup_or_resume(spark, full_df, keys, "uid",
                                       factory, ck))
    t_inc = time.time() - t0
    with open(f"{ck}/manifest.json") as f:
        stage = json.load(f)["stage"]

    # B: the naive daily job — full rollup over base + increment
    t0 = time.time()
    full_levels = ests(sketch_rollup(full_df, keys, "uid", factory))
    t_full = time.time() - t0

    equal = inc_levels == full_levels
    out = {
        "base_rows": N_BASE, "increment_rows": N_INC,
        "sources": SOURCES, "days": DAYS + 1, "p": P,
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        "levels": len(inc_levels),
        "manifest_stage": stage,
        "wall_s": {"initial_build": round(t_build, 2),
                   "incremental_refresh": round(t_inc, 2),
                   "full_rebuild": round(t_full, 2)},
        "speedup_vs_full": round(t_full / t_inc, 2),
        "estimates_equal": bool(equal),
        "base_levels": len(base_levels),
    }
    print(json.dumps(out, indent=1))
    assert stage.startswith("incremental_append"), stage
    assert equal, "incremental levels diverged from the full rebuild"
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/cube_maintenance_rehearsal.json", "w") as f:
        json.dump(out, f, indent=1)
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
