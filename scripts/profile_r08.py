"""Round-8 stage-isolation profiler (guide §1.4): times sub-stages of
the expensive headline queries with the noop sink at the bench's Spark
config, so each optimization targets the measured bottleneck rather
than the query total. Not part of the frozen bench; numbers land in
OPTIMIZATION_r08.md.

Usage: python scripts/profile_r08.py [sf_dir] [which ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
WHICH = set(sys.argv[2:])


def want(name):
    return not WHICH or name in WHICH


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, fn, n=2):
    best = float("inf")
    for i in range(n):
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        best = min(best, dt)
        print(f"  {label}: run{i} {dt:.3f}s", flush=True)
    print(f"* {label}: best {best:.3f}s", flush=True)
    return best


def main():
    from pyspark.sql import SparkSession, functions as F
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("profile_r08")
             .config("spark.sql.shuffle.partitions", str(cpus))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.driver.memory", "16g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from algebird_spark import queries as Q
    from algebird_spark.operators import dedup

    # warmup
    spark.read.parquet(f"{SF}/lineitem.parquet").limit(1000) \
        .groupBy("l_returnflag").count().collect()

    sc = spark.sparkContext

    if want("ngram"):
        sc.setJobDescription("ngram: full query")
        timed("ngram full query", lambda: Q.q_ngram_jaccard_dedup(spark, SF).count())
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        sh = (docs.filter(dedup.has_tokens("text"))
              .select(F.col("doc_id"),
                      dedup.shingle_hashes_udf(3)(F.col("text")).alias("sh"))
              .filter(F.size("sh") > 0))
        sc.setJobDescription("ngram: shingle kernel only")
        timed("ngram shingle kernel", lambda: noop(sh))
        ex = sh.select(
            F.struct(F.col("doc_id").alias("id"), F.size("sh").alias("n")).alias("d"),
            F.explode("sh").alias("shingle"))
        buckets = (ex.groupBy("shingle")
                   .agg(F.sort_array(F.collect_list("d")).alias("ds"))
                   .filter(F.size("ds") > 1))
        sc.setJobDescription("ngram: buckets")
        timed("ngram shingle+explode+buckets", lambda: noop(buckets))
        # bucket size distribution
        dist = (ex.groupBy("shingle").count()
                .selectExpr("count(*) n_shingles", "sum(count) n_rows",
                            "sum(count*(count-1)/2) n_pairs_raw",
                            "max(count) max_df",
                            "sum(case when count>1 then count*(count-1)/2 else 0 end) n_pairs")
                .collect())
        print("ngram bucket dist:", dist[0].asDict(), flush=True)

    if want("quantile"):
        from algebird_spark.agg import sketch_by_key
        from algebird_spark.sketches import KLL, TDigest
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        sc.setJobDescription("quantile: kll sketch side")
        timed("kll sketch_by_key", lambda: sketch_by_key(
            li, ["l_returnflag"], "l_extendedprice", lambda: KLL(k=200)).count())
        sc.setJobDescription("quantile: tdigest sketch side")
        timed("tdigest sketch_by_key", lambda: sketch_by_key(
            li, ["l_returnflag"], "l_extendedprice", lambda: TDigest(200)).count())
        sc.setJobDescription("quantile: exact percentile side")
        ps = "0.05,0.25,0.5,0.75,0.95"
        timed("exact percentile", lambda: li
              .select("l_returnflag", "l_extendedprice")
              .groupBy("l_returnflag")
              .agg(F.expr(f"percentile(l_extendedprice, array({ps}))").alias("q"))
              .collect())
        sc.setJobDescription("quantile: full kll query")
        timed("kll full query", lambda: Q.q_kll_quantiles(spark, SF).count())

    if want("simhash"):
        sc.setJobDescription("simhash: full query")
        timed("simhash full", lambda: (
            Q.q_simhash_near_dup(spark, SF).count(),
            spark.catalog.clearCache())[0])
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        from algebird_spark.operators.text import simhash64_df
        sc.setJobDescription("simhash: fingerprint stage")
        timed("simhash64_df", lambda: noop(simhash64_df(docs, "doc_id", "text")))

    if want("multisketch"):
        from algebird_spark.agg import sketch_by_key
        from algebird_spark.sketches import (CMS, HLL, KLL, BloomFilter,
                                             MultiSketch, TDigest)
        from algebird_spark.sources.datagen import token_table
        tok_path = "/root/repo/.data/bench_tokens_60k"
        if not os.path.exists(os.path.join(tok_path, "_SUCCESS")):
            token_table(spark, rows=60_000, n_sources=8, vocab=250_000,
                        median_n_tok=256, seed=42, partitions=16) \
                .write.mode("overwrite").parquet(tok_path)
        tok = spark.read.parquet(tok_path)

        def factory():
            return MultiSketch({
                "hll": HLL(p=14),
                "cms": CMS(eps=0.001, delta=1e-6, heavy_hitters_pct=0.001),
                "kll": KLL(k=200),
                "tdigest": TDigest(200),
                "bloom": BloomFilter(num_entries=300_000, fp_prob=0.01),
            })
        sc.setJobDescription("multisketch build")
        timed("multisketch build", lambda: sketch_by_key(
            tok, ["source"], "tokens", factory, min_partitions=1).count(), n=3)

    if want("others"):
        for name in ["bloom_membership", "hll_rollup_sketch",
                     "sketchmap_hll_distinct", "cdf_normalize",
                     "topk_pruned", "hll_distinct_per_group",
                     "cms_point_queries", "cms_heavy_hitters",
                     "text_repetition", "skew_join", "bloom_join",
                     "scan_state", "pack_sequences", "embedding_topk",
                     "hll_string_distinct", "minhash_lsh_recall",
                     "dedup_exact", "sum_by_key"]:
            fn = getattr(Q, f"q_{name}")
            sc.setJobDescription(name)
            timed(name, lambda fn=fn: (fn(spark, SF).count(),
                                       spark.catalog.clearCache())[0])

    spark.stop()


if __name__ == "__main__":
    main()
