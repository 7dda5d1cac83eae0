"""Capture .explain('formatted') before/after plans for every query the
r8 optimization round touched, into plans/r08/. 'Before' plans come
from the still-present at-scale code paths (or the reconstructed old
expression for the replaced exact-percentile aggregate)."""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "plans", "r08")
os.makedirs(OUT, exist_ok=True)


def cap(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def write(name: str, text: str):
    with open(os.path.join(OUT, name), "w") as f:
        f.write(text)
    print("wrote", name)


def main():
    from pyspark.sql import SparkSession, functions as F
    spark = (SparkSession.builder.master("local[8]")
             .appName("capture_plans_r08")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from algebird_spark import queries as Q
    from algebird_spark.operators import dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")

    # --- ngram_jaccard_dedup -------------------------------------------
    def ngram_sel(out):
        return out.select("id_a", "id_b",
                          F.floor(F.col("jaccard") * 10000 + 0.5)
                          .cast("long").alias("jaccard_m4"))
    before = ngram_sel(dedup.near_dup_pairs_ngram(
        docs, "doc_id", "text", shingle_n=3, threshold=0.5,
        broadcast_max_docs=0))
    write("ngram_jaccard_dedup_before.txt",
          "# at-scale inverted-index plan (broadcast gate disabled):\n"
          "# 2 Exchanges; the second one carried 127M pair rows at sf1.0\n"
          + cap(before))
    after = Q.q_ngram_jaccard_dedup(spark, SF)
    write("ngram_jaccard_dedup_after.txt",
          "# r8 broadcast-index kernel plan (default below the 2M-doc\n"
          "# gate): one small round-robin Exchange feeding mapInPandas\n"
          "# over the broadcast CSR index; no pair row shuffles\n"
          + cap(after))

    # --- simhash_near_dup ----------------------------------------------
    b4 = dedup.near_dup_pairs_simhash(docs, "doc_id", "text",
                                      max_hamming=3, chunks=4)
    write("simhash_near_dup_before.txt",
          "# old default (4-chunk JVM banding; 33.9M raw candidate pairs\n"
          "# at sf1.0 from 16-bit bucket concentration)\n" + cap(b4))
    b4._algebird_cache.release()
    aft = Q.q_simhash_near_dup(spark, SF)
    write("simhash_near_dup_after.txt",
          "# r8 broadcast-kernel plan (approx_rows hint below the 200k\n"
          "# gate): per-combo tasks over the 16 B/doc broadcast\n"
          "# fingerprint table; exact popcount verify; same final distinct\n"
          + cap(aft))
    aft._algebird_cache.release()

    # --- kll/tdigest exact side ----------------------------------------
    src = li.select("l_returnflag", "l_extendedprice")
    ps = "0.05,0.25,0.5,0.75,0.95"
    old_exact = src.groupBy("l_returnflag").agg(
        F.expr(f"percentile(l_extendedprice, array({ps}))").alias("q"))
    write("kll_tdigest_exact_side_before.txt",
          "# exact side both quantile queries shared: the Percentile\n"
          "# aggregate (per-group ~5.5M-entry counts map at sf1.0;\n"
          "# measured 10.1 s alone)\n" + cap(old_exact))
    # after: the three GK-pruned jobs (see queries._exact_percentiles)
    A = 10_000
    margin = 3.0 / A
    qs = []
    for p in [0.05, 0.25, 0.5, 0.75, 0.95]:
        qs += [max(0.0, p - margin), min(1.0, p + margin)]
    src2 = (li.select(F.col("l_returnflag").alias("k"),
                      F.col("l_extendedprice").cast("double").alias("v"))
            .filter(F.col("v").isNotNull()))
    j1 = src2.groupBy("k").agg(
        F.percentile_approx("v", F.array(*[F.lit(q) for q in qs]),
                            F.lit(A)).alias("c"))
    txt = ("# r8 exact side = three codegen jobs (queries._exact_percentiles):\n"
           "# job 1 — GK bounds (deterministic rank error <= n/accuracy):\n"
           + cap(j1))
    cuts = {r["k"]: list(r["c"]) for r in j1.collect()}
    names = [x for i in range(5) for x in (f"vlo{i}", f"vhi{i}")]
    cut_df = spark.createDataFrame(
        [(k, *v) for k, v in cuts.items()],
        ", ".join(["k string"] + [f"{n} double" for n in names]))
    j = src2.join(F.broadcast(cut_df), "k")
    j2 = j.groupBy("k").agg(
        F.count("*").alias("n"),
        *[F.sum((F.col("v") < F.col(f"vlo{i}")).cast("long"))
          .alias(f"below{i}") for i in range(5)])
    txt += ("\n# job 2 — exact below-window rank counts (broadcast cuts,\n"
            "# whole-stage codegen conditional sums):\n" + cap(j2))
    cond = None
    for i in range(5):
        c = (F.col("v") >= F.col(f"vlo{i}")) & (F.col("v") <= F.col(f"vhi{i}"))
        cond = c if cond is None else cond | c
    j3 = j.filter(cond).select("k", "v")
    txt += ("\n# job 3 — window-row collect (~6*len(ps)/accuracy of the\n"
            "# input; exact order statistics picked driver-side with\n"
            "# Percentile.getPercentile's bit-exact interpolation):\n"
            + cap(j3))
    write("kll_tdigest_exact_side_after.txt", txt)

    # --- text_repetition -----------------------------------------------
    from algebird_spark.operators import text
    d0 = (docs.filter(F.trim(F.col("text")) != "")
          .select("doc_id", "source", "text"))
    st0 = text.repetition_stats(d0)
    agg0 = st0.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum((F.col("top2_frac") > 0.2).cast("long")).alias("n_top2_flagged"),
        F.sum((F.col("dup3_frac") > 0.1).cast("long")).alias("n_dup3_flagged"),
        F.round(F.max("top2_frac"), 6).alias("max_top2_frac"),
        F.round(F.max("dup3_frac"), 6).alias("max_dup3_frac"))
    write("text_repetition_before.txt",
          "# old plan: Counter kernel directly over the 1-2 input scan\n"
          "# partitions (serialized at sf1.0)\n" + cap(agg0))
    write("text_repetition_after.txt",
          "# r8 plan: round-robin Exchange to cores ahead of the kernel\n"
          "# (no-op at warehouse scale where the scan supplies splits)\n"
          + cap(Q.q_text_repetition(spark, SF)))

    spark.stop()


if __name__ == "__main__":
    main()
