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
