"""PQ rehearsal at 200k x 64 (the shared ANN fixture): the compressed
scale path's three claims, measured —

  1. storage: the m=8 uint8 code table vs the float vector table
     (at 100 TB of vectors this ratio IS the scan-bandwidth cut);
  2. latency: ADC code-scan top-k vs the brute-force float scan for
     the same 10 queries (both steady-state, same protocol as
     ann_rehearsal.py);
  3. quality: recall@10 of pure ADC and of ADC + exact re-rank of the
     top-100 candidates, vs the exact brute-force answer.

Run EXCLUSIVELY. Writes BENCH/pq_rehearsal.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
VEC = os.path.join(REPO, ".data", "ann_vectors_200k")
CODES = os.path.join(REPO, ".data", "pq_codes_200k")
M, K_SUB, N_ITER, K, RERANK, NQ = 8, 256, 6, 10, 100, 10


def dir_bytes(path):
    return sum(os.path.getsize(os.path.join(path, f))
               for f in os.listdir(path) if f.endswith(".parquet"))


def main():
    from pyspark.sql import SparkSession, functions as F
    spark = (SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("pq_rehearsal")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.ui.enabled", "false")
        .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from algebird_spark.operators import pq, similarity

    vec = spark.read.parquet(VEC)
    rec = {"rows": 200_000, "dim": 64, "m": M, "k_sub": K_SUB,
           "n_queries": NQ, "k": K, "rerank": RERANK}

    # codebook: train on a 20k-row deterministic sample (protocol the
    # docstring prescribes at scale), then encode the full table once
    t0 = time.time()
    train = vec.filter(F.col("vec_id") % 10 == 0)
    cb = pq.train_pq_codebook(train, m=M, k_sub=K_SUB, n_iter=N_ITER)
    rec["train_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    pq.encode_pq(vec, cb).select("vec_id", "pq_code") \
        .write.mode("overwrite").parquet(CODES)
    rec["encode_write_s"] = round(time.time() - t0, 2)
    rec["vector_table_bytes"] = dir_bytes(VEC)
    rec["code_table_bytes"] = dir_bytes(CODES)
    rec["storage_ratio"] = round(rec["vector_table_bytes"]
                                 / rec["code_table_bytes"], 1)

    queries = (vec.orderBy("vec_id").limit(NQ)
               .select(F.col("vec_id").alias("q_id"),
                       F.col("embedding").alias("q_vec")).persist())
    queries.count()
    enc = spark.read.parquet(CODES)

    def steady(fn, n=3):
        best = float("inf")
        out = None
        for _ in range(n):
            t0 = time.time()
            out = fn()
            best = min(best, time.time() - t0)
        return best, out

    def collect_sets(rows):
        by = {}
        for r in rows:
            by.setdefault(r["q_id"], set()).add(r["vec_id"])
        return by

    brute_s, brute_rows = steady(
        lambda: similarity.cosine_topk(vec, queries, k=K).collect())
    rec["brute_scan_s"] = round(brute_s, 2)
    adc_s, adc_rows = steady(
        lambda: pq.pq_topk(enc, queries, k=K, codebook=cb).collect())
    rec["adc_scan_s"] = round(adc_s, 2)
    rr_s, rr_rows = steady(
        lambda: pq.pq_topk(enc, queries, k=K, codebook=cb,
                           rerank=RERANK, vectors=vec).collect())
    rec["adc_rerank_s"] = round(rr_s, 2)
    rec["adc_speedup_vs_brute"] = round(brute_s / adc_s, 2)

    truth = collect_sets(brute_rows)
    for name, rows in (("adc", adc_rows), ("rerank", rr_rows)):
        got = collect_sets(rows)
        hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
        rec[f"recall_{name}_at_{K}"] = round(hits / (len(truth) * K), 3)

    # NOTE: brute force ranks by COSINE, PQ by squared L2 — these agree
    # only up to norm variation; the fixture's vectors are not unit-norm,
    # so recall reflects both quantization AND the metric gap. Report
    # the L2-true recall too (exact L2 top-k via rerank over everything).
    exact_l2_s, exact_l2_rows = steady(
        lambda: pq.pq_topk(enc, queries, k=K, codebook=cb,
                           rerank=200_000, vectors=vec).collect(), n=1)
    truth_l2 = collect_sets(exact_l2_rows)
    for name, rows in (("adc", adc_rows), ("rerank", rr_rows)):
        got = collect_sets(rows)
        hits = sum(len(truth_l2[q] & got.get(q, set())) for q in truth_l2)
        rec[f"recall_l2_{name}_at_{K}"] = round(hits / (len(truth_l2) * K), 3)

    # rerank-depth curve on the random fixture (near-random 64-d is
    # the WORST case for any quantizer: neighbors are nearly
    # equidistant, so quantization error swamps the distance gaps)
    for depth in (400, 1600):
        _, rows = steady(
            lambda d=depth: pq.pq_topk(enc, queries, k=K, codebook=cb,
                                       rerank=d, vectors=vec).collect(),
            n=1)
        got = collect_sets(rows)
        hits = sum(len(truth_l2[q] & got.get(q, set())) for q in truth_l2)
        rec[f"recall_l2_rerank{depth}_at_{K}"] = round(
            hits / (len(truth_l2) * K), 3)

    # clustered fixture (the realistic embedding shape: 2000 centers,
    # 100 points each, sigma=0.05 x center scale): same operators
    cl = (spark.range(200_000)
          .select(F.col("id").alias("vec_id"),
                  (F.col("id") % 2000).alias("c")))

    import numpy as np
    import pandas as pd
    from typing import Iterator

    centers = np.random.default_rng(11).standard_normal((2000, 64))

    def make_vecs(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            c = pdf["c"].to_numpy()
            # deterministic per-row noise from vec_id
            noise = np.vstack([
                np.random.default_rng(int(v)).standard_normal(64) * 0.05
                for v in pdf["vec_id"].to_numpy()])
            out = pdf[["vec_id"]].copy()
            out["embedding"] = list(centers[c] + noise)
            yield out

    clv = cl.mapInPandas(
        make_vecs, "vec_id long, embedding array<double>").persist()
    clv.count()
    cb2 = pq.train_pq_codebook(
        clv.filter(F.col("vec_id") % 10 == 0), m=M, k_sub=K_SUB,
        n_iter=N_ITER)
    enc2 = pq.encode_pq(clv, cb2).select("vec_id", "pq_code").persist()
    enc2.count()
    q2 = (clv.orderBy("vec_id").limit(NQ)
          .select(F.col("vec_id").alias("q_id"),
                  F.col("embedding").alias("q_vec")).persist())
    q2.count()
    _, truth_rows = steady(
        lambda: pq.pq_topk(enc2, q2, k=K, codebook=cb2,
                           rerank=200_000, vectors=clv).collect(), n=1)
    truth_cl = collect_sets(truth_rows)
    for name, fn in (
            ("adc", lambda: pq.pq_topk(enc2, q2, k=K, codebook=cb2)),
            ("rerank", lambda: pq.pq_topk(enc2, q2, k=K, codebook=cb2,
                                          rerank=RERANK, vectors=clv))):
        _, rows = steady(lambda f=fn: f().collect(), n=1)
        got = collect_sets(rows)
        hits = sum(len(truth_cl[q] & got.get(q, set())) for q in truth_cl)
        rec[f"clustered_recall_l2_{name}_at_{K}"] = round(
            hits / (len(truth_cl) * K), 3)

    out = os.path.join(REPO, "BENCH", "pq_rehearsal.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=2)
        f.write("\n")
    print(json.dumps(rec))
    spark.stop()


if __name__ == "__main__":
    main()
