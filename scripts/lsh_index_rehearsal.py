"""A/B rehearsal for the persisted LSH index at corpus scale: the
daily-increment workflow (probe a 5% increment against a written index)
vs re-running the full two-corpus near-dup join — the cost the index
exists to amortize.

Run EXCLUSIVELY. Writes BENCH/lsh_index_rehearsal.json. The corpus is
the sf0.1 documents table replicated 64x with distinct doc_ids (320k
docs); every doc near-duplicates its 63 replicas, so both paths carry
a heavy (~10^6-pair) verify load — a worst-case-dense fixture.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

REPS = 64
INCREMENT_MOD = 20  # 5% of docs arrive as the increment


def main():
    spark = (SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("lsh_index_rehearsal")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from algebird_spark.operators.dedup import near_dup_pairs_minhash
    from algebird_spark.sources.lsh_index import (near_dups_against_index,
                                                  write_minhash_index)

    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet") \
        .select("doc_id", "text")
    reps = spark.range(REPS).select(F.col("id").alias("rep"))
    corpus = (docs.crossJoin(reps)
              .select((F.col("doc_id") * REPS + F.col("rep"))
                      .alias("doc_id"), "text")
              .repartition(64).persist())
    n = corpus.count()
    base = corpus.filter(F.col("doc_id") % INCREMENT_MOD != 0).persist()
    inc = corpus.filter(F.col("doc_id") % INCREMENT_MOD == 0).persist()
    n_base, n_inc = base.count(), inc.count()
    rec = {"docs": n, "index_docs": n_base, "increment_docs": n_inc,
           "cpus": spark.sparkContext.defaultParallelism}

    path = "/tmp/lsh_index_rehearsal_idx"
    shutil.rmtree(path, ignore_errors=True)
    t0 = time.time()
    write_minhash_index(base, path, mode="overwrite")
    rec["index_build_s"] = round(time.time() - t0, 2)

    t0 = time.time()
    probe_pairs = near_dups_against_index(
        spark, path, inc, threshold=0.8).count()
    rec["probe_s"] = round(time.time() - t0, 2)
    rec["probe_pairs"] = int(probe_pairs)

    # the workflow the index replaces: full near-dup join over the
    # whole (index + increment) corpus, then keep the cross pairs
    t0 = time.time()
    full = near_dup_pairs_minhash(corpus, "doc_id", "text",
                                  num_perm=64, bands=16, threshold=0.8)
    cross = full.filter(
        ((F.col("id_a") % INCREMENT_MOD == 0)
         != (F.col("id_b") % INCREMENT_MOD == 0))).count()
    rec["full_recompute_s"] = round(time.time() - t0, 2)
    rec["full_cross_pairs"] = int(cross)

    rec["probe_speedup"] = round(rec["full_recompute_s"]
                                 / max(rec["probe_s"], 1e-9), 1)
    rec["index_bytes"] = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(path) for f in fs)
    print(json.dumps(rec, indent=1))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH",
            "lsh_index_rehearsal.json"), "w") as f:
        json.dump(rec, f, indent=1)
    shutil.rmtree(path, ignore_errors=True)


if __name__ == "__main__":
    main()
