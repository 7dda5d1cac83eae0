"""Benchmark decontamination: exact flagging, ratios, survivor set."""

from pyspark.sql import functions as F

from algebird_spark.operators.contamination import (decontaminate,
                                                    ngram_contamination)


def _docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        (1, "completely unrelated text about sketch algorithms and spark"),
        (2, "prefix words then the quick brown fox jumps over the lazy "
            "dog embedded inside"),
        (3, "short doc"),
        (4, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_flags_exact_overlaps(spark):
    docs = _docs(spark)
    bench = spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dog",)], "text string")
    out = {r["doc_id"]: r for r in
           ngram_contamination(docs, bench, shingle_n=8).collect()}
    assert out[0]["contaminated"] and out[2]["contaminated"]
    assert not out[1]["contaminated"]
    assert not out[3]["contaminated"] and not out[4]["contaminated"]
    assert len(out) == 5  # short/empty docs still get a row
    assert out[0]["n_hits"] >= 1 and 0 < out[0]["hit_ratio"] <= 1.0


def test_min_hits_threshold(spark):
    docs = _docs(spark)
    bench = spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dog",)], "text string")
    strict = {r["doc_id"]: r["contaminated"] for r in
              ngram_contamination(docs, bench, shingle_n=8,
                                  min_hits=3).collect()}
    # doc 0 contains 2 qualifying 8-gram windows of the 9-token phrase
    # within its 12 tokens; min_hits=3 must clear it
    assert not strict[0]


def test_decontaminate_survivors(spark):
    docs = _docs(spark)
    bench = spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dog",)], "text string")
    kept = decontaminate(docs, bench, shingle_n=8)
    assert {r["doc_id"] for r in kept.collect()} == {1, 3, 4}


def test_empty_benchmark_flags_nothing(spark):
    docs = _docs(spark)
    bench = spark.createDataFrame([], "text string")
    out = ngram_contamination(docs, bench, shingle_n=8)
    assert out.filter("contaminated").count() == 0


def test_short_and_blank_rows_never_cross_match(spark):
    # a blank/short benchmark row must not flag blank/short docs:
    # sub-shingle_n rows contribute no shingles on either side
    docs = spark.createDataFrame(
        [(0, ""), (1, "tiny"), (2, "a b c d e f g h i j")],
        "doc_id long, text string")
    bench = spark.createDataFrame([("",), ("tiny",), ("   ",)],
                                  "text string")
    out = ngram_contamination(docs, bench, shingle_n=8)
    assert out.filter("contaminated").count() == 0
    assert out.count() == 3


def test_unicode_whitespace_docs_never_band(spark):
    # tab/newline/NBSP-only texts slip past Spark's trim but tokenize
    # to zero under Python .split(): they must get NULL signatures and
    # never enter LSH banding (no shared sentinel bucket)
    from algebird_spark.operators.dedup import (add_minhash_signature,
                                                near_dup_pairs_minhash)
    docs = spark.createDataFrame(
        [(0, "\t"), (1, "\n"), (2, " "), (3, " "), (4, ""),
         (5, "real words in a document here")],
        "doc_id long, text string")
    signed = add_minhash_signature(docs, "text")
    nulls = {r["doc_id"] for r in
             signed.filter("minhash IS NULL").collect()}
    assert nulls == {0, 1, 2, 3, 4}
    assert near_dup_pairs_minhash(docs).count() == 0


def test_frequent_spans_and_passage_flags(spark):
    """Duplicate-passage detection: a shared 12-token block across
    three docs is found with the exact doc frequency; a doc repeating
    its OWN block is not flagged (per-doc distinct spans); unique docs
    are unflagged."""
    from pyspark.sql import Row
    from algebird_spark.operators.contamination import (
        flag_duplicated_passages, frequent_spans)

    block = " ".join(f"b{i}" for i in range(12))
    rows = [
        Row(doc_id=1, text=f"alpha beta {block} gamma"),
        Row(doc_id=2, text=f"{block} delta epsilon"),
        Row(doc_id=3, text=f"zeta {block}"),
        # repeats its own block twice but shares nothing cross-doc
        Row(doc_id=4, text=" ".join(f"x{i}" for i in range(12)) + " "
            + " ".join(f"x{i}" for i in range(12))),
        Row(doc_id=5, text=" ".join(f"u{i}" for i in range(20))),
        Row(doc_id=6, text="short"),
    ]
    docs = spark.createDataFrame(rows)
    freq = frequent_spans(docs, span_n=12, min_docs=3)
    got = {r["span"]: r["n_docs"] for r in freq.collect()}
    assert len(got) == 1 and set(got.values()) == {3}
    flags = {r["doc_id"]: r for r in
             flag_duplicated_passages(docs, span_n=12, min_docs=3)
             .collect()}
    assert all(flags[i]["has_duplicate_passage"] for i in (1, 2, 3))
    assert not flags[4]["has_duplicate_passage"]
    assert not flags[5]["has_duplicate_passage"]
    assert flags[6]["n_spans"] == 0  # < span_n tokens -> no spans
    assert not flags[6]["has_duplicate_passage"]


def test_frequent_spans_sketch_path_matches_exact(spark):
    """use_sketch=True (the no-shuffle TopPctCMS path) finds the same
    frequent spans as the exact groupBy at fixture scale (CMS error is
    << 1 count here, and the never-under bound guarantees no misses)."""
    from pyspark.sql import Row
    from algebird_spark.operators.contamination import frequent_spans

    block = " ".join(f"b{i}" for i in range(12))
    rows = [Row(doc_id=i, text=f"pre{i} {block} post{i}")
            for i in range(1, 5)]
    rows += [Row(doc_id=9, text=" ".join(f"u{i}" for i in range(20)))]
    docs = spark.createDataFrame(rows)
    exact = {r["span"]: r["n_docs"]
             for r in frequent_spans(docs, span_n=12, min_docs=3).collect()}
    sk = {r["span"]: r["n_docs"]
          for r in frequent_spans(docs, span_n=12, min_docs=3,
                                  use_sketch=True).collect()}
    assert set(sk) == set(exact)
    for s, n in exact.items():
        assert sk[s] >= n  # CMS never underestimates
