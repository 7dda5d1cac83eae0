"""A/B rehearsal for the round-7 single-pass ``rollup_levels`` plan.

Isolates the LEVEL-DERIVATION stage (the corpus scan is held fixed):
a persisted finest-grain state table (3 keys, 10 x 32 x 20 = 6,400
HLL(p=14) states built from 50M rows) is expanded to its full 8-level
CUBE two ways:

  A (round-6 plan): one ``merge_sketches`` job per level over the
    cached fine table — 2^d Exchanges + 2^d applyInPandas stages,
    fine table persisted for the loop's lifetime;
  B (round-7 plan): every fine state row explodes into one
    (grouping_id, masked-keys) struct per level, then ONE keyed
    shuffle + ONE applyInPandas stage merges all levels.

Both plans must produce IDENTICAL per-level estimates and n_values
(HLL register-max associativity). Run EXCLUSIVELY (BENCH/BASELINE.md
protocol). Writes BENCH/rollup_levels_ab.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

N = 50_000_000
SOURCES = 10
DAYS = 32
LANGS = 20
P = 14
KEYS = ["source", "day", "lang"]
TRIALS = 2


def main():
    spark = (SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("rollup_levels_ab")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.ui.enabled", "false")
        .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from algebird_spark.agg import (COUNT_COL, STATE_COL, merge_sketches,
                                    rollup_levels, sketch_by_key)
    from algebird_spark.sketches import HLL, from_bytes

    df = (spark.range(N)
          .select(F.pmod(F.hash(F.col("id")), F.lit(SOURCES))
                  .cast("string").alias("source"),
                  F.pmod(F.hash(F.col("id") + 7), F.lit(DAYS))
                  .cast("int").alias("day"),
                  F.pmod(F.hash(F.col("id") + 31), F.lit(LANGS))
                  .cast("string").alias("lang"),
                  F.pmod(F.hash(F.col("id") + 13), F.lit(10_000_000))
                  .alias("uid"))
          .repartition(64))
    fine = sketch_by_key(df, KEYS, "uid", lambda: HLL(p=P)).persist()
    n_fine = fine.count()
    d = len(KEYS)
    key_types = {k: fine.schema[k].dataType for k in KEYS}
    subsets = [frozenset(j for j in range(d) if (m >> (d - 1 - j)) & 1 == 0)
               for m in range(2 ** d)]

    def collect_ests(lv):
        return {tuple(r[k] for k in KEYS) + (r["grouping_id"],):
                (round(from_bytes(bytes(r[STATE_COL])).estimate(), 6),
                 r[COUNT_COL])
                for r in lv.collect()}

    def plan_a():
        """The round-6 per-level loop, reproduced verbatim."""
        out = None
        for sub in subsets:
            kept = [KEYS[i] for i in range(d) if i in sub]
            gid = sum(1 << (d - 1 - i) for i in range(d) if i not in sub)
            if len(kept) == d:
                lvl = fine
            elif kept:
                lvl = merge_sketches(fine, kept)
            else:
                lvl = merge_sketches(fine.select(STATE_COL, COUNT_COL), [])
            sel = [(F.col(k) if i in sub
                    else F.lit(None).cast(key_types[k])).alias(k)
                   for i, k in enumerate(KEYS)]
            lvl = lvl.select(*sel,
                             F.lit(gid).cast("long").alias("grouping_id"),
                             STATE_COL, COUNT_COL)
            out = lvl if out is None else out.unionByName(lvl)
        return out

    def plan_b():
        return rollup_levels(fine, KEYS, lambda: HLL(p=P), grouping="cube")

    # correctness: identical estimates + counts at every level
    ea, eb = collect_ests(plan_a()), collect_ests(plan_b())
    assert ea == eb, {k: (ea.get(k), eb.get(k))
                      for k in set(ea) ^ set(eb) or
                      [k for k in ea if ea[k] != eb[k]][:5]}
    n_levels = len({k[-1] for k in eb})

    best_a = best_b = float("inf")
    for _ in range(TRIALS):
        t0 = time.time()
        plan_a().count()
        best_a = min(best_a, time.time() - t0)
        t0 = time.time()
        plan_b().count()
        best_b = min(best_b, time.time() - t0)

    rec = {
        "rows": N, "fine_groups": n_fine, "cube_levels": n_levels,
        "level_rows": len(eb), "hll_p": P, "trials": TRIALS,
        "plan_a_per_level_loop_s": round(best_a, 3),
        "plan_b_single_pass_s": round(best_b, 3),
        "speedup": round(best_a / best_b, 2),
        "estimates_identical": True,
        "note": ("level-derivation stage only (fine table persisted, "
                 "scan excluded); plan A = 2^d merge jobs, plan B = one "
                 "explode + one keyed merge"),
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH", "rollup_levels_ab.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=2)
        f.write("\n")
    print(json.dumps(rec))
    spark.stop()


if __name__ == "__main__":
    main()
