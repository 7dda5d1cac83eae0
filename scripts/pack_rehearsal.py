"""pack_sequences scale rehearsal: 10^8 documents in ONE source.

The r5 VERDICT scale defect: a Window.partitionBy(source) prefix sum
executes each source in ONE task, so a single hot source serializes the
whole packing step. The round-6 two-phase distributed prefix sum must
(a) produce the identical packing and (b) beat the window plan on a
one-source corpus — the exact shape where the window plan degenerates.

Token counts come from a `token_col` (deterministic pseudo-random
expression) so the rehearsal measures the PREFIX SUM, not tokenization.
Run EXCLUSIVELY. Writes BENCH/pack_rehearsal.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

N = int(os.environ.get("PACK_REHEARSAL_ROWS", 100_000_000))
SEQ = 2048


def checksum(df):
    """Order-insensitive full-result fingerprint: sums over every
    packing output column (start_offset/bin_start/bin_end), so any
    per-row disagreement between the two plans shows up."""
    r = df.agg(
        F.count("*").alias("rows"),
        F.sum("start_offset").alias("sum_off"),
        F.sum("bin_start").alias("sum_bs"),
        F.sum("bin_end").alias("sum_be"),
        F.max("bin_end").alias("max_bin"),
    ).collect()[0]
    return {k: int(r[k]) for k in
            ("rows", "sum_off", "sum_bs", "sum_be", "max_bin")}


def window_pack(df, seq_len):
    """The r5 plan: per-group window prefix sum (one task per source)."""
    w = (Window.partitionBy("source").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    out = df.withColumn(
        "start_offset",
        F.coalesce(F.sum("n_tok").over(w), F.lit(0)).cast("long"))
    return (out
            .withColumn("bin_start", F.floor(F.col("start_offset") / seq_len))
            .withColumn("bin_end",
                        F.floor((F.col("start_offset")
                                 + F.greatest(F.col("n_tok") - 1, F.lit(0)))
                                / seq_len)))


def main():
    spark = (SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("pack_rehearsal")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from algebird_spark.operators.text import pack_sequences

    # one source, deterministic per-doc token counts in [1, 2048]
    docs = (spark.range(N)
            .select(F.col("id").alias("doc_id"),
                    F.lit("web").alias("source"),
                    (F.pmod(F.col("id") * F.lit(2654435761), F.lit(2048))
                     + F.lit(1)).cast("long").alias("n_tok")))

    rec = {"rows": N, "sources": 1, "seq_len": SEQ,
           "cpus": spark.sparkContext.defaultParallelism, "trials": 2}

    # alternate trials, best-of-2 per plan: this VM shows 2x+
    # noisy-neighbor swings between identical runs, so a single
    # back-to-back pair can flatter either plan
    best2, bestw, cs2, csw = None, None, None, None
    for trial in range(2):
        t0 = time.time()
        cs2 = checksum(pack_sequences(docs, SEQ, token_col="n_tok"))
        el = time.time() - t0
        best2 = el if best2 is None else min(best2, el)
        spark.catalog.clearCache()
        print(f"two_phase trial {trial}: {el:.1f}s")
        t0 = time.time()
        csw = checksum(window_pack(docs, SEQ))
        el = time.time() - t0
        bestw = el if bestw is None else min(bestw, el)
        print(f"window trial {trial}: {el:.1f}s")
    rec["two_phase"] = {"wall_s": round(best2, 2),
                        "rows_per_sec": int(N / best2), "checksum": cs2}
    rec["window_plan"] = {"wall_s": round(bestw, 2),
                          "rows_per_sec": int(N / bestw), "checksum": csw}
    print("two_phase", rec["two_phase"])
    print("window_plan", rec["window_plan"])

    rec["checksums_equal"] = cs2 == csw
    rec["speedup"] = round(
        rec["window_plan"]["wall_s"] / rec["two_phase"]["wall_s"], 2)
    out = os.path.join(os.path.dirname(__file__), "..",
                       "BENCH", "pack_rehearsal.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
