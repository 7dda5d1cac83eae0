"""Persisted MinHash-LSH index (sources/lsh_index.py): probe results
must equal the direct two-corpus computation, appends must refuse
config drift, and the daily probe->append cycle must converge."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from algebird_spark.sources.lsh_index import (near_dups_against_index,
                                              read_index_manifest,
                                              write_minhash_index)

CFG = dict(num_perm=64, bands=16, shingle_n=3, seed=12345678)


def _mk_docs(spark, ids_texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in ids_texts])


@pytest.fixture(scope="module")
def corpus(spark):
    import random
    rng = random.Random(7)
    rows = []
    for i in range(60):
        # mutually-distinct docs (random vocab, cross-pair jaccard ~0)
        words = [f"w{rng.randrange(50_000)}" for _ in range(120)]
        rows.append((i, " ".join(words)))
    # near-dup clones of docs 3 and 7 (j ~ 118/122 ~ 0.97) live
    # OUTSIDE the index split; background pairs sit near 0, so the
    # LSH recall at threshold 0.5 is deterministic for this fixture
    rows.append((1003, rows[3][1] + " tiny tail"))
    rows.append((1007, rows[7][1] + " tiny tail"))
    # and one exact duplicate
    rows.append((1011, rows[11][1]))
    return rows


def test_roundtrip_probe_matches_direct(spark, tmp_path, corpus):
    idx_docs = _mk_docs(spark, [r for r in corpus if r[0] < 1000])
    new_docs = _mk_docs(spark, [r for r in corpus if r[0] >= 1000])
    path = str(tmp_path / "idx")
    m = write_minhash_index(idx_docs, path, **CFG)
    assert m["n_docs"] == 60
    got = sorted(
        (r["index_id"], r["new_id"], round(r["jaccard"], 6))
        for r in near_dups_against_index(
            spark, path, new_docs, threshold=0.5).collect())
    # direct truth: exact jaccard between the splits (clones planted
    # far above threshold, so LSH recall is deterministic here)
    sh = {}
    for i, t in corpus:
        toks = t.lower().split()
        sh[i] = {tuple(toks[j:j + 3]) for j in range(len(toks) - 2)}
    want = []
    for a, _ in [r for r in corpus if r[0] < 1000]:
        for b, _ in [r for r in corpus if r[0] >= 1000]:
            j = len(sh[a] & sh[b]) / len(sh[a] | sh[b])
            if j >= 0.5:
                want.append((a, b, round(j, 6)))
    assert got == sorted(want)
    assert {(a, b) for a, b, _ in got} == {(3, 1003), (7, 1007), (11, 1011)}


def test_append_cycle_and_config_guard(spark, tmp_path, corpus):
    path = str(tmp_path / "idx2")
    first = _mk_docs(spark, [r for r in corpus if r[0] < 30])
    second = _mk_docs(spark, [r for r in corpus if 30 <= r[0] < 1000])
    probe = _mk_docs(spark, [r for r in corpus if r[0] >= 1000])
    write_minhash_index(first, path, **CFG)
    with pytest.raises(ValueError, match="already exists"):
        write_minhash_index(first, path, **CFG)
    bad = dict(CFG, bands=8)
    with pytest.raises(ValueError, match="config mismatch"):
        write_minhash_index(second, path, mode="append", **bad)
    m = write_minhash_index(second, path, mode="append", **CFG)
    assert m["n_docs"] == 60
    assert read_index_manifest(path)["n_docs"] == 60
    pairs = near_dups_against_index(spark, path, probe, threshold=0.5)
    assert {(r["index_id"], r["new_id"]) for r in pairs.collect()} \
        == {(3, 1003), (7, 1007), (11, 1011)}
    # append the probe docs too; re-probing must exclude self-matches
    write_minhash_index(probe, path, mode="append", **CFG)
    again = near_dups_against_index(spark, path, probe, threshold=0.99)
    got = {(r["index_id"], r["new_id"]) for r in again.collect()}
    assert (1011, 1011) not in got and (11, 1011) in got


def test_crashed_append_segment_is_invisible(spark, tmp_path, corpus):
    """A crash between the segment writes and the manifest publish
    must leave the index exactly as it was: the orphan segment dirs
    are never read by a probe (no phantom candidates), and a retried
    append reclaims them."""
    from algebird_spark.sources.lsh_index import (_bucket_rows,
                                                  _shingle_rows)
    import os
    path = str(tmp_path / "idx4")
    idx_docs = _mk_docs(spark, [r for r in corpus if r[0] < 1000])
    new_docs = _mk_docs(spark, [r for r in corpus if r[0] >= 1000])
    write_minhash_index(idx_docs, path, **CFG)
    before = sorted((r["index_id"], r["new_id"]) for r in
                    near_dups_against_index(spark, path, new_docs,
                                            threshold=0.5).collect())
    # simulate the crash: the next append's segment dirs exist on disk
    # (and even contain duplicate-prone data — the probe docs
    # themselves) but the manifest was never republished
    docs = new_docs.select("doc_id", "text")
    _bucket_rows(docs, "doc_id", "text", CFG).write.mode("overwrite") \
        .parquet(os.path.join(path, "buckets", "seg-1"))
    _shingle_rows(docs, "doc_id", "text", CFG).write.mode("overwrite") \
        .parquet(os.path.join(path, "shingles", "seg-1"))
    after = sorted((r["index_id"], r["new_id"]) for r in
                   near_dups_against_index(spark, path, new_docs,
                                           threshold=0.5).collect())
    assert after == before  # orphans invisible: no self/phantom pairs
    assert read_index_manifest(path)["segments"] == ["seg-0"]
    # the retried append commits under the SAME segment name,
    # reclaiming the orphan instead of stacking a duplicate of it
    m = write_minhash_index(new_docs, path, mode="append", **CFG)
    assert m["segments"] == ["seg-0", "seg-1"]
    again = near_dups_against_index(spark, path, new_docs,
                                    threshold=0.99)
    got = {(r["index_id"], r["new_id"]) for r in again.collect()}
    assert (1011, 1011) not in got and (11, 1011) in got


def test_probe_plan_broadcasts_increment(spark, tmp_path, corpus):
    import io
    from contextlib import redirect_stdout

    path = str(tmp_path / "idx3")
    idx_docs = _mk_docs(spark, [r for r in corpus if r[0] < 1000])
    new_docs = _mk_docs(spark, [r for r in corpus if r[0] >= 1000])
    write_minhash_index(idx_docs, path, **CFG)
    out = near_dups_against_index(spark, path, new_docs, threshold=0.5)
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    # the candidate join must be broadcast (index side never shuffles
    # for it); verify joins run over candidate-bounded slices
    assert "BroadcastHashJoin" in buf.getvalue()


def test_api_dedup_incremental_filters_dups(spark, tmp_path, corpus):
    from algebird_spark import api

    path = str(tmp_path / "idx4")
    idx_docs = _mk_docs(spark, [r for r in corpus if r[0] < 1000])
    new_docs = _mk_docs(spark, [r for r in corpus if r[0] >= 1000])
    api.build_dedup_index(idx_docs, path, **CFG)
    kept = api.dedup_incremental(new_docs, path, threshold=0.5)
    assert {r["doc_id"] for r in kept.collect()} == set()
    kept2 = api.dedup_incremental(new_docs, path, threshold=0.999)
    # only the exact duplicate crosses 0.999
    assert {r["doc_id"] for r in kept2.collect()} == {1003, 1007}


def test_streaming_probe_append_cycle(spark, tmp_path, corpus):
    """The daily cycle on a STREAM (foreachBatch): each micro-batch
    probes the index, keeps only novel docs, and appends them — so a
    later batch's clone of an EARLIER batch's survivor is dropped too.
    Three single-file micro-batches, final kept set checked against
    the hand-computed sequential truth."""
    import os

    from algebird_spark import api

    path = str(tmp_path / "idx5")
    api.build_dedup_index(
        _mk_docs(spark, [r for r in corpus if r[0] < 1000]), path, **CFG)

    base = dict(corpus)
    novel = " ".join(f"n{j}" for j in range(120))
    batches = [
        [(1003, base[3] + " tiny tail"), (2000, novel)],
        [(2001, novel + " tail"), (1011, base[11])],
        [(2002, novel + " tail tail")],
    ]
    d = tmp_path / "stream"
    d.mkdir()
    for i, rows in enumerate(batches):
        p = str(d / f"b{i}")
        _mk_docs(spark, rows).coalesce(1).write.parquet(p)
        os.utime(p, (1_000_000 + i, 1_000_000 + i))
        for f in os.listdir(p):
            os.utime(os.path.join(p, f), (1_000_000 + i, 1_000_000 + i))

    kept_ids = []

    def cycle(bdf, bid):
        kept = api.dedup_incremental(bdf, path, threshold=0.5)
        kept = kept.persist()
        ids = [r["doc_id"] for r in kept.select("doc_id").collect()]
        if ids:
            api.build_dedup_index(kept, path, mode="append", **CFG)
        kept_ids.extend(ids)
        kept.unpersist()

    schema = "doc_id long, text string"
    sdf = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", 1).parquet(str(d / "b*")))
    q = sdf.writeStream.foreachBatch(cycle).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # 1003 dups indexed doc 3; 1011 dups indexed doc 11; 2000 is
    # novel and gets appended, so 2001 dups it, and 2002 dups it too
    assert sorted(kept_ids) == [2000]
    from algebird_spark.sources.lsh_index import read_index_manifest
    assert read_index_manifest(path)["n_docs"] == 61
