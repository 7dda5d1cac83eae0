"""Benchmark decontamination: flag training documents that overlap an
evaluation/benchmark set at the n-gram level — the standard pre-train
hygiene pass (n-gram collision decontamination, cf. GPT-3 appendix C /
PaLM-style 8-gram overlap).

Scale design: the benchmark side is SMALL (thousands of eval docs) —
its distinct shingle hashes broadcast; the 100 TB training side streams
once through a JVM-side shingle expression and a broadcast LEFT SEMI
join per shingle. No Python, no shuffle of the training side; the only
aggregation is the per-doc hit count (partial-aggregated).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import shingle_hashes_udf


def _full_shingles(text_col: str, shingle_n: int):
    """Shingles for contamination semantics: rows with fewer than
    ``shingle_n`` tokens contribute NO shingles (the near-dup
    short-row fallback — the whole text as one shingle — would flag
    every short/blank doc against a short/blank benchmark row here).
    Batch-vectorized kernel UDF: one murmur call per Arrow batch, so
    the 100 TB corpus side hashes each byte once — the previous
    higher-order-function expression evaluated an interpreted lambda
    per shingle (~90k shingles/s/core)."""
    return shingle_hashes_udf(shingle_n, full_only=True)(F.col(text_col))


def benchmark_shingles(benchmark: DataFrame, text_col: str = "text",
                       shingle_n: int = 8) -> DataFrame:
    """Distinct shingle hashes of the benchmark set: one column ``sh``.
    Materialize/broadcast this once per eval suite."""
    return (benchmark
            .select(F.explode(_full_shingles(text_col, shingle_n))
                    .alias("sh"))
            .distinct())


def ngram_contamination(docs: DataFrame, benchmark: DataFrame,
                        shingle_n: int = 8, min_hits: int = 1,
                        id_col: str = "doc_id",
                        text_col: str = "text",
                        bench_text_col: str = "text") -> DataFrame:
    """Per-doc benchmark overlap: (id, n_shingles, n_hits, hit_ratio,
    contaminated). A doc is contaminated when >= ``min_hits`` of its
    word ``shingle_n``-grams appear anywhere in the benchmark set."""
    bench = benchmark_shingles(benchmark, bench_text_col, shingle_n)
    exploded = docs.select(
        F.col(id_col),
        F.explode_outer(_full_shingles(text_col, shingle_n))
         .alias("sh"))
    hit = F.when(F.col("bh").isNotNull(), 1).otherwise(0)
    per_doc = (exploded
               .join(F.broadcast(bench.withColumnRenamed("sh", "bh")),
                     exploded["sh"] == F.col("bh"), "left")
               .groupBy(id_col)
               .agg(F.count("sh").alias("n_shingles"),
                    F.sum(hit).alias("n_hits")))
    return per_doc.select(
        id_col, "n_shingles", "n_hits",
        (F.col("n_hits") / F.greatest("n_shingles", F.lit(1)))
            .alias("hit_ratio"),
        (F.col("n_hits") >= min_hits).alias("contaminated"))


def decontaminate(docs: DataFrame, benchmark: DataFrame,
                  shingle_n: int = 8, min_hits: int = 1,
                  id_col: str = "doc_id", text_col: str = "text",
                  bench_text_col: str = "text") -> DataFrame:
    """Drop contaminated docs; returns the surviving rows of ``docs``."""
    flagged = ngram_contamination(docs, benchmark, shingle_n, min_hits,
                                  id_col, text_col, bench_text_col)
    clean = flagged.filter(~F.col("contaminated")).select(id_col)
    return docs.join(clean, id_col, "left_semi")


def frequent_spans(docs: DataFrame, span_n: int = 30, min_docs: int = 2,
                   id_col: str = "doc_id", text_col: str = "text",
                   use_sketch: bool = False,
                   hh_pct: float = 1e-6) -> DataFrame:
    """Cross-document duplicate passages: word ``span_n``-gram spans
    that occur in >= ``min_docs`` DISTINCT documents. Returns
    (span, n_docs) with span as the rolling hash.

    This is the sketch-friendly formulation of training-data substring
    dedup (boilerplate headers, license blocks, templated pages that
    doc-level near-dup misses): span strings never materialize — the
    batch shingle kernel emits per-doc DISTINCT span hashes (so a doc
    repeating its own boilerplate counts once), one explode + groupBy
    count gives document frequency.

    ``use_sketch=True`` is the 100 TB path: the same span-hash stream
    feeds a TopPctCMS global build instead of an exact groupBy — NO
    shuffle of span rows at all (partition-combined sketch states
    merge instead), at the cost of CMS one-sided count error and the
    ``hh_pct`` floor (a span must hold >= hh_pct of all span
    occurrences to surface; boilerplate does by definition). n_docs is
    then the CMS estimate: never under the true document frequency,
    over by <= eps * total spans."""
    spans_col = shingle_hashes_udf(span_n, full_only=True)(F.col(text_col))
    if use_sketch:
        from ..agg import sketch_global
        from ..sketches import CMS
        span_stream = docs.select(spans_col.alias("__spans"))
        sk = sketch_global(span_stream, "__spans",
                           lambda: CMS(eps=1e-4, delta=1e-6,
                                       heavy_hitters_pct=hh_pct))
        spark = docs.sparkSession
        rows = [(int(span), int(est)) for span, est
                in sk.heavy_hitters().items() if est >= min_docs]
        return spark.createDataFrame(rows or [],
                                     "span long, n_docs long")
    spans = docs.select(
        F.col(id_col),
        F.explode(spans_col).alias("span"))
    return (spans.groupBy("span")
            .agg(F.count("*").alias("n_docs"))  # per-doc distinct already
            .filter(F.col("n_docs") >= min_docs))


def flag_duplicated_passages(docs: DataFrame, span_n: int = 30,
                             min_docs: int = 2, id_col: str = "doc_id",
                             text_col: str = "text",
                             broadcast_freq: bool | None = None) -> DataFrame:
    """Per-doc duplicate-passage flags: (id, n_spans, n_frequent,
    has_duplicate_passage). A doc is flagged when any of its spans is
    shared by >= ``min_docs`` docs (itself included).

    ``broadcast_freq``: join-strategy hint for the frequent-span
    table. On a mostly-unique corpus that table is small (only
    repeated content survives the filter) and broadcasting it keeps
    the 100 TB span side shuffle-free — but on a HEAVILY duplicated
    corpus (exactly the workload dedup targets) it is unbounded, and
    an unconditional ``F.broadcast`` would OOM the driver with no
    fallback (ADVICE r3). Default ``None`` hints nothing and lets
    AQE pick broadcast vs shuffle from the table's measured runtime
    size; pass ``True``/``False`` to force when the corpus shape is
    known."""
    freq = frequent_spans(docs, span_n, min_docs, id_col, text_col)
    if broadcast_freq is True:
        freq = F.broadcast(freq)
    elif broadcast_freq is False:
        freq = freq.hint("shuffle_hash")
    spans = docs.select(
        F.col(id_col),
        F.explode_outer(shingle_hashes_udf(span_n, full_only=True)
                        (F.col(text_col))).alias("span"))
    hit = F.when(F.col("n_docs").isNotNull(), 1).otherwise(0)
    per_doc = (spans.join(freq, "span", "left")
               .groupBy(id_col)
               .agg(F.count("span").alias("n_spans"),
                    F.sum(hit).alias("n_frequent")))
    return per_doc.select(
        id_col, "n_spans", "n_frequent",
        (F.col("n_frequent") > 0).alias("has_duplicate_passage"))
