"""token_budget_sample (operators/exact.py): deterministic data-mixing
semantics — budget modes, keep-all/keep-none edges, rerun determinism,
and expected token mass within Bernoulli noise."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from algebird_spark.operators.exact import token_budget_sample


@pytest.fixture(scope="module")
def docs(spark):
    # 3 sources with very different masses: 400/100/10 docs x 20 tokens
    rows = []
    i = 0
    for src, n in (("a", 400), ("b", 100), ("c", 10)):
        for _ in range(n):
            rows.append((i, src, " ".join(f"w{j}" for j in range(20))))
            i += 1
    return spark.createDataFrame(
        rows, "doc_id long, source string, text string").persist()


def _mass(df):
    return {r["source"]: r["t"] for r in df.groupBy("source").agg(
        (F.count("*") * 20).alias("t")).collect()}


def test_uniform_mix_equalizes_and_keeps_small_group_whole(docs):
    # grand = 10200 tokens; uniform 30% budget = 1020 per source:
    # c (200 tokens) keeps everything, a/b downsample toward 1020
    out = token_budget_sample(docs, total_budget=0.3 * 10200, mix="uniform")
    m = _mass(out)
    assert m["c"] == 200                      # budget > mass: keep all
    for s, tot in (("a", 8000), ("b", 2000)):
        # expected 1020; Bernoulli sd = sqrt(f(1-f)N_docs)*20
        f = 1020.0 / tot
        sd = (f * (1 - f) * tot / 20) ** 0.5 * 20
        assert abs(m[s] - 1020) <= 4 * sd, (s, m[s])


def test_explicit_budget_and_keep_none(docs):
    out = token_budget_sample(
        docs, budget={"a": 1000.0, "b": 0.0, "c": 1e9})
    m = _mass(out)
    assert "b" not in m                       # zero budget drops the group
    assert m["c"] == 200                      # oversized budget keeps all
    assert 400 <= m["a"] <= 1800


def test_proportional_mode_downsamples_evenly(docs):
    out = token_budget_sample(docs, total_budget=5100.0)  # half of grand
    m = _mass(out)
    for s, tot in (("a", 8000), ("b", 2000), ("c", 200)):
        f_obs = m.get(s, 0) / tot
        assert abs(f_obs - 0.5) < 0.35, (s, f_obs)


def test_rerun_and_partitioning_determinism(docs):
    a = sorted(r["doc_id"] for r in
               token_budget_sample(docs, total_budget=3000.0).collect())
    b = sorted(r["doc_id"] for r in
               token_budget_sample(docs.repartition(7),
                                   total_budget=3000.0).collect())
    assert a == b and len(a) > 0


def test_requires_some_budget(docs):
    with pytest.raises(ValueError):
        token_budget_sample(docs)


# --- pack_sequences (text.py) ---------------------------------------------

def test_pack_sequences_hand_computed(spark):
    from algebird_spark.operators.text import pack_sequences
    df = spark.createDataFrame(
        [(1, "a", "t " * 5), (2, "a", "t " * 3), (3, "a", ""),
         (4, "a", "t " * 10), (10, "b", "t " * 4)],
        "doc_id long, source string, text string")
    got = {r["doc_id"]: r for r in pack_sequences(df, 8).collect()}
    assert (got[1]["start_offset"], got[1]["bin_start"], got[1]["bin_end"]) \
        == (0, 0, 0)
    assert (got[2]["start_offset"], got[2]["bin_end"]) == (5, 0)
    assert got[3]["n_tokens"] == 0 and got[3]["bin_start"] == got[3]["bin_end"]
    # doc 4: tokens 8..17 -> spans bins 1 and 2
    assert (got[4]["bin_start"], got[4]["bin_end"]) == (1, 2)
    assert got[10]["start_offset"] == 0  # fresh stream per group


def test_pack_sequences_offsets_are_a_prefix_sum(spark):
    from algebird_spark.operators.text import pack_sequences
    import pytest as _pt
    rows = [(i, "s", "w " * (1 + i % 13)) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = sorted((r["doc_id"], r["n_tokens"], r["start_offset"])
                 for r in pack_sequences(df, 64).collect())
    acc = 0
    for _, nt, so in out:
        assert so == acc
        acc += nt
    with _pt.raises(ValueError):
        pack_sequences(df, 0)


def test_pack_sequences_matches_window_reference(spark):
    """The two-phase distributed prefix sum (r6) must equal the naive
    window formulation exactly — many partitions, several groups, a
    NULL group, ties broken by id."""
    from pyspark.sql import Window, functions as F

    from algebird_spark.operators.text import pack_sequences, token_count
    rows = [(i, None if i % 11 == 10 else f"src{i % 3}",
             "w " * (i % 17)) for i in range(3000)]
    df = spark.createDataFrame(rows,
                               "doc_id long, source string, text string")
    got = sorted((r["doc_id"], r["start_offset"], r["bin_start"],
                  r["bin_end"])
                 for r in pack_sequences(df, 32, num_partitions=16)
                 .collect())
    w = (Window.partitionBy("source").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    ref = (df.withColumn("n_tokens",
                         F.coalesce(token_count(F.col("text"))
                                    .cast("long"), F.lit(0)))
           .withColumn("so", F.coalesce(F.sum("n_tokens").over(w),
                                        F.lit(0))))
    want = sorted((r["doc_id"], r["so"],
                   r["so"] // 32,
                   (r["so"] + max(r["n_tokens"] - 1, 0)) // 32)
                  for r in ref.collect())
    assert got == want


def test_pack_sequences_no_per_group_window_task(spark):
    """Plan gate (r5 VERDICT wrong #1): no Window over the data may be
    partitioned by the group alone — one by-group must never serialize
    into one task. Every window spec in the two-phase plan involves
    __pid (phase 2 partitions the data by (__pid, by); phase 1's
    cross-slice prefix sum over the TINY subtotal table orders by
    __pid) — the degenerate plan's windowspecdefinition(source,
    doc_id) mentions no __pid at all."""
    import io
    import re
    from contextlib import redirect_stdout

    from algebird_spark.operators.text import pack_sequences
    df = spark.createDataFrame([(1, "s", "w w")],
                               "doc_id long, source string, text string")
    buf = io.StringIO()
    with redirect_stdout(buf):
        pack_sequences(df, 8).explain("formatted")
    plan = buf.getvalue()
    specs = re.findall(r"windowspecdefinition\([^)]*\)", plan)
    assert specs, "two-phase plan should contain its two window passes"
    for s in specs:
        assert "__pid" in s, f"window not sliced by partition id: {s}"
    # and zero Python in the data path
    assert "ArrowEvalPython" not in plan and "mapInPandas" not in plan


# --- assign_splits (exact.py) ---------------------------------------------

def test_assign_splits_partition_of_rows(spark):
    from algebird_spark.operators.exact import assign_splits
    df = spark.range(50000).select(F.col("id").alias("doc_id"))
    out = assign_splits(df, {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["__split"]: r["n"] for r in
              out.groupBy("__split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 50000          # exhaustive
    assert out.select("doc_id").distinct().count() == 50000  # disjoint
    assert abs(counts["train"] / 50000 - 0.8) < 0.01
    assert abs(counts["val"] / 50000 - 0.1) < 0.01


def test_assign_splits_deterministic_and_stable_under_growth(spark):
    from algebird_spark.operators.exact import assign_splits
    fr = {"train": 0.9, "test": 0.1}
    small = spark.range(1000).select(F.col("id").alias("doc_id"))
    big = spark.range(5000).select(F.col("id").alias("doc_id"))
    a = {r["doc_id"]: r["__split"] for r in assign_splits(small, fr).collect()}
    b = {r["doc_id"]: r["__split"] for r in assign_splits(big, fr).collect()}
    # membership depends only on the row's own id: growing the corpus
    # never flips an existing row's split
    assert all(b[k] == v for k, v in a.items())


def test_assign_splits_salt_decorrelates(spark):
    from algebird_spark.operators.exact import assign_splits
    df = spark.range(20000).select(F.col("id").alias("doc_id"))
    a = assign_splits(df, {"x": 0.5, "y": 0.5}, salt="s1")
    b = assign_splits(df, {"x": 0.5, "y": 0.5}, salt="s2") \
        .withColumnRenamed("__split", "__split2")
    both = a.join(b, "doc_id")
    agree = both.filter(F.col("__split") == F.col("__split2")).count()
    assert abs(agree / 20000 - 0.5) < 0.02   # independent coin flips


def test_assign_splits_rejects_bad_fractions(spark):
    from algebird_spark.operators.exact import assign_splits
    df = spark.range(10).select(F.col("id").alias("doc_id"))
    import pytest as _pt
    with _pt.raises(ValueError):
        assign_splits(df, {"a": 0.5, "b": 0.4})
    with _pt.raises(ValueError):
        assign_splits(df, {"a": -0.1, "b": 1.1})


# --- end-to-end mixing pipeline composition --------------------------------

def test_mixing_pipeline_composes(spark):
    """budget-sample -> scrub -> split -> pack (+ chunk): the full
    data-mixing chain over the real documents fixture, checking the
    cross-stage invariants a pipeline relies on (all deterministic,
    so this is stable). Mirrors the README chain."""
    from algebird_spark.operators.exact import (assign_splits,
                                                token_budget_sample)
    from algebird_spark.operators.text import (chunk_documents,
                                               pack_sequences, scrub_pii,
                                               token_count)

    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "source", "text"))
    grand = docs.select(F.sum(token_count(F.col("text"))).alias("g")) \
        .collect()[0]["g"]
    mixed = token_budget_sample(docs, total_budget=0.5 * float(grand))
    kept = mixed.select(F.sum(token_count(F.col("text"))).alias("g")) \
        .collect()[0]["g"]
    assert 0.3 * grand <= kept <= 0.7 * grand   # proportional half-ish

    # PII scrub composes mid-chain: row count preserved, fixture text
    # has no natural PII so the scrubbed text is byte-identical
    scrubbed = scrub_pii(mixed).withColumn(
        "text", F.col("text_scrubbed")).drop("text_scrubbed")
    assert scrubbed.count() == mixed.count()
    assert scrubbed.filter(
        (F.col("n_email") + F.col("n_phone") + F.col("n_ipv4")) > 0
    ).count() == 0
    mixed = scrubbed.drop("n_email", "n_phone", "n_ipv4")

    split = assign_splits(mixed, {"train": 0.9, "test": 0.1})
    n_mixed = mixed.count()
    assert split.count() == n_mixed             # exhaustive
    train = split.filter(F.col("__split") == "train")

    packed = pack_sequences(train, 256)
    # stream offsets are consistent: per source, total tokens ==
    # max(start_offset + n_tokens)
    per = packed.groupBy("source").agg(
        F.sum("n_tokens").alias("tot"),
        F.max(F.col("start_offset") + F.col("n_tokens")).alias("end")
    ).collect()
    assert per and all(r["tot"] == r["end"] for r in per)

    # the chunking alternative: every train token lands in >= 1 chunk,
    # and no chunk exceeds the context budget
    chunks = chunk_documents(train, max_tokens=64, overlap=8)
    agg = chunks.agg(
        F.max("n_chunk_tokens").alias("mx"),
        F.count("*").alias("n")).collect()[0]
    assert agg["mx"] <= 64
    assert agg["n"] >= train.count()  # at least one chunk per doc


def test_pack_sequences_null_text_counts_zero(spark):
    from algebird_spark.operators.text import pack_sequences
    df = spark.createDataFrame(
        [(1, "a", "x y z"), (2, "a", None), (3, "a", "p q")],
        "doc_id long, source string, text string")
    got = {r["doc_id"]: r for r in pack_sequences(df, 4).collect()}
    assert got[2]["n_tokens"] == 0
    assert got[3]["start_offset"] == 3  # null doc advances nothing
