"""IVF-PQ indexed-layout rehearsal at 200k x 64: the compounded
100 TB story — partition pruning (read nprobe/n_lists of the
directories) TIMES PQ compression (each directory holds m-byte codes,
not float vectors). Measures write cost, probe latency, parity with
the in-memory operator, L2 recall, and the actual bytes-read ratios
via Hadoop FileSystem storage statistics (same method as
ann_rehearsal.py's `indexed` stage).

Run EXCLUSIVELY. Writes BENCH/ivf_pq_rehearsal.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
VEC = os.path.join(REPO, ".data", "ann_vectors_200k")
IDX = os.path.join(REPO, ".data", "ivf_pq_index_200k")
FLOAT_IDX = os.path.join(REPO, ".data", "ann_ivf_index_200k")
N_LISTS, M, K_SUB, NPROBE, K, RERANK, NQ = 64, 8, 256, 8, 10, 100, 5


def dir_bytes(path):
    total = 0
    for root, _, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f))
                     for f in files if f.endswith(".parquet"))
    return total


def main():
    from pyspark.sql import SparkSession, functions as F
    spark = (SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("ivf_pq_rehearsal")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from algebird_spark.operators import pq

    vec = spark.read.parquet(VEC)
    rec = {"rows": 200_000, "dim": 64, "n_lists": N_LISTS, "m": M,
           "k_sub": K_SUB, "nprobe": NPROBE, "k": K, "rerank": RERANK,
           "n_queries": NQ}

    t0 = time.time()
    coarse = pq.train_coarse_centroids(
        vec.filter(F.col("vec_id") % 5 == 0), n_lists=N_LISTS, n_iter=5)
    rec["coarse_train_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    cb = pq.train_pq_codebook(
        pq.residual_vectors(vec.filter(F.col("vec_id") % 10 == 0), coarse),
        m=M, k_sub=K_SUB, n_iter=5)
    rec["codebook_train_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    pq.write_ivf_pq_index(vec, coarse, cb, IDX)
    rec["write_s"] = round(time.time() - t0, 1)
    rec["pq_index_bytes"] = dir_bytes(IDX)
    if os.path.exists(FLOAT_IDX):
        rec["float_index_bytes"] = dir_bytes(FLOAT_IDX)
        rec["index_compression_x"] = round(
            rec["float_index_bytes"] / rec["pq_index_bytes"], 1)

    queries = (vec.orderBy("vec_id").limit(NQ)
               .select(F.col("vec_id").alias("q_id"),
                       F.col("embedding").alias("q_vec")).persist())
    queries.count()

    def local_bytes_read():
        it = spark._jvm.org.apache.hadoop.fs.FileSystem \
            .getGlobalStorageStatistics().iterator()
        while it.hasNext():
            st = it.next()
            if st.getScheme() == "file":
                return st.getLong("bytesRead")
        return 0

    def run_indexed(nprobe, rerank):
        return pq.ivf_pq_topk_indexed(
            spark, IDX, queries, k=K, coarse=coarse, codebook=cb,
            nprobe=nprobe, rerank=rerank, vectors=vec).collect()

    best = float("inf")
    rows = None
    for _ in range(3):
        t0 = time.time()
        rows = run_indexed(NPROBE, RERANK)
        best = min(best, time.time() - t0)
    rec["indexed_probe_s"] = round(best, 2)
    got = {(r["q_id"], r["vec_id"]) for r in rows}

    mem_rows = pq.ivf_pq_topk(
        pq.encode_ivf_pq(vec, coarse, cb), queries, k=K, coarse=coarse,
        codebook=cb, nprobe=NPROBE, rerank=RERANK, vectors=vec).collect()
    rec["parity_with_in_memory"] = \
        got == {(r["q_id"], r["vec_id"]) for r in mem_rows}

    truth_rows = run_indexed(N_LISTS, 200_000)  # exact L2 via full probe
    truth = {(r["q_id"], r["vec_id"]) for r in truth_rows}
    rec["recall_l2_at_10"] = round(len(got & truth) / len(truth), 3)

    b0 = local_bytes_read()
    run_indexed(NPROBE, 0)
    pruned = local_bytes_read() - b0
    b1 = local_bytes_read()
    run_indexed(N_LISTS, 0)
    full = local_bytes_read() - b1
    rec["bytes_read_ratio_pruned_vs_full"] = round(pruned / max(full, 1), 3)
    rec["nominal_probe_share"] = round(NPROBE * NQ / N_LISTS, 3) \
        if NPROBE * NQ < N_LISTS else "unions overlap; see probed dirs"
    probed_dirs = len({d for d in os.listdir(IDX)
                       if d.startswith("__list=")})
    rec["n_list_dirs"] = probed_dirs

    out = os.path.join(REPO, "BENCH", "ivf_pq_rehearsal.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=2)
        f.write("\n")
    print(json.dumps(rec))
    spark.stop()


if __name__ == "__main__":
    main()
