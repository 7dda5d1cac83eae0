"""spark-submit entrypoint: end-to-end corpus deduplication pipeline —
quality gate -> exact dedup -> (optional) MinHash-LSH near-dup ->
connected-component clustering -> one survivor per cluster.

Usage (north_rule deployment shape):
  zip -r algebird_spark.zip algebird_spark
  spark-submit --py-files algebird_spark.zip \\
      algebird_spark/jobs/dedup_corpus.py \\
      --input /path/to/documents_parquet --output /path/to/out \\
      --min-chars 100 --min-tokens 20 --near-dup minhash

Outputs:
  out/survivors  parquet of surviving docs (all input columns)
  out/clusters   parquet of (doc_id, component, keep) for every doc
                 that passed the quality gate
plus a one-line JSON metrics summary on stderr (counts per stage).

At warehouse scale each stage is one bounded-shuffle pass: the quality
gate is a scan-time filter, exact dedup shuffles 128-bit fingerprints
(never text), LSH shuffles (band, bucket) signature slices, and the
star rounds of connected components shuffle only (node, long) edges.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None, spark=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", default=None)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--min-chars", type=int, default=0)
    ap.add_argument("--min-tokens", type=int, default=0)
    ap.add_argument("--near-dup", choices=["none", "minhash", "simhash"],
                    default="minhash")
    ap.add_argument("--threshold", type=float, default=0.7)
    ap.add_argument("--num-perm", type=int, default=64)
    ap.add_argument("--bands", type=int, default=16)
    ap.add_argument("--max-hamming", type=int, default=3)
    args = ap.parse_args(argv)

    owns_session = spark is None
    if owns_session:
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder.appName("algebird_spark_dedup_corpus")
                 .config("spark.sql.adaptive.enabled", "true")
                 .config("spark.sql.execution.arrow.pyspark.enabled", "true")
                 .getOrCreate())
        spark.sparkContext.setLogLevel("WARN")

    from pyspark.sql import functions as F

    from algebird_spark.operators import dedup, text
    from algebird_spark.operators.graph import dedup_clusters

    id_col, text_col = args.id_col, args.text_col
    t0 = time.time()
    docs = spark.read.parquet(args.input)
    n_input = docs.count()

    gated = docs
    if args.min_chars:
        gated = gated.filter(F.length(text_col) >= args.min_chars)
    if args.min_tokens:
        gated = gated.filter(
            text.token_count(F.col(text_col)) >= args.min_tokens)
    gated = gated.persist()
    n_gated = gated.count()

    exact_kept = dedup.dedup_exact(gated, text_col, id_col).persist()
    n_exact = exact_kept.count()

    if args.near_dup == "minhash":
        pairs = dedup.near_dup_pairs_minhash(
            exact_kept, id_col, text_col, num_perm=args.num_perm,
            bands=args.bands, threshold=args.threshold)
    elif args.near_dup == "simhash":
        pairs = dedup.near_dup_pairs_simhash(
            exact_kept, id_col, text_col, max_hamming=args.max_hamming)
    else:
        pairs = None

    if pairs is not None:
        clusters = dedup_clusters(exact_kept,
                                  pairs.select("id_a", "id_b"), id_col)
        survivors = (exact_kept.join(
            clusters.filter("keep").select(id_col), id_col, "left_semi"))
    else:
        clusters = exact_kept.select(
            F.col(id_col), F.col(id_col).alias("component"),
            F.lit(True).alias("keep"))
        survivors = exact_kept
    survivors = survivors.persist()
    n_survivors = survivors.count()

    if args.output:
        survivors.write.mode("overwrite").parquet(args.output + "/survivors")
        clusters.write.mode("overwrite").parquet(args.output + "/clusters")

    metrics = {"n_input": n_input, "n_after_quality": n_gated,
               "n_after_exact_dedup": n_exact, "n_survivors": n_survivors,
               "near_dup": args.near_dup,
               "seconds": round(time.time() - t0, 2)}
    print(json.dumps(metrics), file=sys.stderr)
    gated.unpersist()
    exact_kept.unpersist()
    if owns_session:
        spark.stop()
    return metrics


if __name__ == "__main__":
    main()
