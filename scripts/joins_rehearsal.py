"""A/B rehearsal for the sketch-accelerated joins at shuffle-dominated
scale (50M-row fact side, dims too big to auto-broadcast — the 100 TB
regime, where the dim side exceeds the broadcast threshold and the
plain plan must shuffle both sides).

Run EXCLUSIVELY (no concurrent Spark jobs — BENCH/BASELINE.md memory-bus
notes). Writes BENCH/joins_rehearsal.json.

  A. bloom_join: fact keys uniform over 5M, dim holds a 10% key subset.
     Plain shuffle join moves all 50M fact rows; the Bloom probe keeps
     ~10% (+FPP). Expect the prune to pay for one extra scan pass.
  B. skew_join: 50% of fact rows on ONE key, dim = 1M keys. Plain
     shuffle join sends 25M rows to one reducer task (AQE skew-split
     mitigates but still shuffles them); skew_join broadcasts the one
     hot dim row and never shuffles the hot rows.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

N_FACT = 50_000_000
N_KEYS = 5_000_000
DIM_FRAC = 10  # dim holds every 10th key


def timed(fn, reps=2):
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        n = fn()
        best = min(best, time.time() - t0)
    return best, n


def main():
    spark = (SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("joins_rehearsal")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.ui.enabled", "false")
        # the regime under test: dim exceeds any broadcast threshold
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from algebird_spark.operators.joins import bloom_join, skew_join

    rec: dict = {
        "n_fact": N_FACT, "cpus": spark.sparkContext.defaultParallelism,
        "note": "local[32] shuffles are memcpy, not network+disk — the "
                "narrow-row case shows the honest crossover (probe CPU > "
                "in-memory shuffle of 16B rows); the wide-row case is the "
                "training-data shape where the prune pays even locally, "
                "and its advantage grows with payload width and real "
                "network shuffle. skew detection is sampled (2%) and "
                "amortizable: skew is a data property, detect once.",
    }

    # --- A: selectivity sweep, uniform keys ------------------------------
    fact = spark.range(N_FACT).select(
        (F.abs(F.xxhash64("id")) % N_KEYS).alias("k"),
        F.col("id").alias("v"))
    fact.persist().count()  # isolate generation cost from join timing
    rec["bloom"] = []
    for dim_frac in (10, 100):
        dim = spark.range(0, N_KEYS, dim_frac).select(
            F.col("id").alias("dk"), (F.col("id") * 7).alias("attr"))
        dim.persist().count()
        t_plain, n_plain = timed(
            lambda: fact.join(dim, fact["k"] == dim["dk"], "inner").count())
        t_bloom, n_bloom = timed(
            lambda: bloom_join(fact, dim, "k", "dk", fp_prob=0.01).count())
        assert n_plain == n_bloom, (n_plain, n_bloom)
        row = {
            "dim_rows": N_KEYS // dim_frac, "selectivity": 1.0 / dim_frac,
            "join_rows": n_plain,
            "plain_shuffle_join_s": round(t_plain, 2),
            "bloom_join_s": round(t_bloom, 2),
            "speedup": round(t_plain / t_bloom, 2),
        }
        rec["bloom"].append(row)
        print("bloom:", row)
        dim.unpersist()
    fact.unpersist()

    # --- A2: wide rows (the training-data shape: rows carry payload) ----
    # the probe reads ONLY the key column (columnar scan), but every
    # non-pruned byte of payload rides the exchange — this is where the
    # prune pays. 200B payload ~ a short document/metadata row.
    n_wide = 20_000_000
    wfact = spark.range(n_wide).select(
        (F.abs(F.xxhash64("id")) % N_KEYS).alias("k"),
        F.repeat(F.sha1(F.col("id").cast("string")), 5).alias("payload"))
    wfact.persist().count()
    for dim_frac in (10, 100):
        dim = spark.range(0, N_KEYS, dim_frac).select(
            F.col("id").alias("dk"), (F.col("id") * 7).alias("attr"))
        dim.persist().count()
        # the action must CONSUME the payload post-join, else column
        # pruning would drop it from the exchange and hide the effect
        def run_wide(df):
            r = df.select(F.count("*").alias("n"),
                          F.sum(F.length("payload")).alias("b")).collect()[0]
            return int(r["n"])

        t_plain, n_plain = timed(
            lambda: run_wide(wfact.join(dim, wfact["k"] == dim["dk"],
                                        "inner")))
        t_bloom, n_bloom = timed(
            lambda: run_wide(bloom_join(wfact, dim, "k", "dk",
                                        fp_prob=0.01)))
        assert n_plain == n_bloom, (n_plain, n_bloom)
        row = {
            "n_fact": n_wide, "payload_bytes": 200,
            "dim_rows": N_KEYS // dim_frac, "selectivity": 1.0 / dim_frac,
            "join_rows": n_plain,
            "plain_shuffle_join_s": round(t_plain, 2),
            "bloom_join_s": round(t_bloom, 2),
            "speedup": round(t_plain / t_bloom, 2),
        }
        rec.setdefault("bloom_wide", []).append(row)
        print("bloom_wide:", row)
        dim.unpersist()
    wfact.unpersist()

    # --- B: planted skew -------------------------------------------------
    n_dim = 1_000_000
    sfact = spark.range(N_FACT).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))
         .otherwise(F.abs(F.xxhash64("id")) % n_dim).alias("k"),
        F.col("id").alias("v"))
    sdim = spark.range(n_dim).select(
        F.col("id").alias("dk"), (F.col("id") * 3).alias("attr"))
    sfact.persist().count()
    sdim.persist().count()

    from algebird_spark.operators.joins import hot_keys
    t0 = time.time()
    hot = hot_keys(sfact, "k", min_share=0.01, sample_fraction=0.02)
    t_detect = time.time() - t0
    assert 0 in hot, hot

    t_splain, n_splain = timed(
        lambda: sfact.join(sdim, sfact["k"] == sdim["dk"], "inner").count())
    # production shape: skew is a data property, detected once (sampled)
    # and reused across runs — time detection separately from the join
    t_skew, n_skew = timed(
        lambda: skew_join(sfact, sdim, "k", "dk", hot=hot).count())
    assert n_splain == n_skew, (n_splain, n_skew)
    rec["skew"] = {
        "dim_rows": n_dim, "hot_share": 0.5, "join_rows": n_splain,
        "detect_sampled_s": round(t_detect, 2),
        "plain_shuffle_join_aqe_s": round(t_splain, 2),
        "skew_join_s": round(t_skew, 2),
        "speedup": round(t_splain / t_skew, 2),
        "hot_keys_found": len(hot),
    }
    print("skew:", rec["skew"])

    with open(os.path.join(os.path.dirname(__file__), "..",
                           "BENCH", "joins_rehearsal.json"), "w") as f:
        json.dump(rec, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
