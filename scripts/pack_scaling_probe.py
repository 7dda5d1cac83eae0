"""Parallelism-scaling probe for the two pack_sequences plans.

The best-of-2 wall-clock comparison at local[32]
(BENCH/pack_rehearsal.json) is nearly a tie on this box — 16-byte rows
shuffle at memcpy speed, so the single-task window plan hides its
serial critical path behind local memory bandwidth. What separates the
plans is SCALING: the window plan's running sum over one source is ONE
task at any core count, while the two-phase plan's critical path is
N/P rows per task. This probe runs the IDENTICAL job (same rows, same
checksum) at local[8] and local[32], cold JVM each (the BASELINE.md §3
two-cluster-size protocol), and reports each plan's parallel speedup.

Usage: python scripts/pack_scaling_probe.py [--rows 50000000]
Writes BENCH/pack_scaling.json.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import sys, time, json
cores = int(sys.argv[1]); rows = int(sys.argv[2]); plan = sys.argv[3]
from pyspark.sql import SparkSession, functions as F
from pyspark.sql.window import Window
spark = (SparkSession.builder.master(f"local[{cores}]")
         .appName(f"pack_scaling_{plan}_{cores}")
         .config("spark.sql.shuffle.partitions", str(2 * cores))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.driver.memory", "16g")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
sys.path.insert(0, %(repo)r)
from algebird_spark.operators.text import pack_sequences

SEQ = 2048
docs = (spark.range(rows)
        .select(F.col("id").alias("doc_id"),
                F.lit("web").alias("source"),
                (F.pmod(F.col("id") * F.lit(2654435761), F.lit(2048))
                 + F.lit(1)).cast("long").alias("n_tok")))

def window_pack(df):
    w = (Window.partitionBy("source").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    out = df.withColumn(
        "start_offset",
        F.coalesce(F.sum("n_tok").over(w), F.lit(0)).cast("long"))
    return out.withColumn(
        "bin_end", F.floor((F.col("start_offset")
                            + F.greatest(F.col("n_tok") - 1, F.lit(0)))
                           / SEQ))

def run():
    df = (pack_sequences(docs, SEQ, token_col="n_tok")
          if plan == "two_phase" else window_pack(docs))
    r = df.agg(F.count("*").alias("n"),
               F.sum("start_offset").alias("s"),
               F.max("bin_end").alias("m")).collect()[0]
    return {"n": int(r["n"]), "s": int(r["s"]), "m": int(r["m"])}

# one warm-up pass absorbs codegen+JIT, then best-of-2 measured
run()
spark.catalog.clearCache()
best, cs = None, None
for _ in range(2):
    t0 = time.time()
    cs = run()
    el = time.time() - t0
    best = el if best is None else min(best, el)
    spark.catalog.clearCache()
print(json.dumps({"plan": plan, "cores": cores, "wall_s": round(best, 2),
                  "rows_per_sec": int(rows / best), "checksum": cs}))
spark.stop()
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=50_000_000)
    args = ap.parse_args()
    results = []
    for plan in ("two_phase", "window"):
        for cores in (8, 32):
            out = subprocess.run(
                [sys.executable, "-c", WORKER % {"repo": REPO},
                 str(cores), str(args.rows), plan],
                capture_output=True, text=True, check=True)
            rec = json.loads(out.stdout.strip().splitlines()[-1])
            print(rec)
            results.append(rec)
    by = {(r["plan"], r["cores"]): r for r in results}
    checks = {json.dumps(r["checksum"], sort_keys=True) for r in results}
    rec = {
        "rows": args.rows,
        "protocol": "cold JVM per (plan, cores); warm-up + best-of-2",
        "runs": results,
        "checksums_equal": len(checks) == 1,
        "speedup_8_to_32": {
            p: round(by[(p, 8)]["wall_s"] / by[(p, 32)]["wall_s"], 2)
            for p in ("two_phase", "window")},
    }
    with open(os.path.join(REPO, "BENCH", "pack_scaling.json"), "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
