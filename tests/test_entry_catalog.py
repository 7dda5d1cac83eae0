"""Guards on the driver-contract catalog in __spark_entry__.py.

The driver's correctness gate hashes only the FIRST 50 ``queries()``
entries (VERDICT r3 "What's wrong" #1), so ordering is load-bearing:
the window must hold the highest-value hard-signal queries and every
entry in it must carry an oracle. These tests keep future edits from
silently pushing a training-data/ANN/streaming query past the window.
"""

from __future__ import annotations

import __spark_entry__ as entry

DRIVER_WINDOW = 50

# Queries that must receive the driver's hard rows+schema+hash signal
# in THIS round's window. Per-round rotation (r6 VERDICT #2): swap the
# stalest driver-green rows in, freshest multi-green rows out;
# scripts/window_debt.py computes the staleness ranking mechanically.
MUST_BE_IN_WINDOW = {
    # round-7 new surfaces (hard signal on first appearance)
    "asof_rollup", "wav_features", "minhash_near_dup", "fd_covariance",
    "pq_topk", "ivf_pq_topk",
    # round-5/6 additions still carrying window signal
    "bloom_join", "skew_join", "range_pruned", "ngram_jaccard_dedup",
    "hll_scan", "streaming_kll", "streaming_sessions", "text_repetition",
    "budget_sample", "pack_sequences", "train_splits", "cdf_normalize",
    "eventually_quantiles", "scan_compose",
    "skew_join_outer", "cdf_normalize_hicard", "sketchmap_set",
    "topk_pruned", "weighted_sample", "index_dedup", "hll_rollup",
    "kll_rollup", "topk_rollup", "pii_scrub", "domain_stats",
    "time_rollup", "asof_join",
    # training-data pipeline
    "dedup_exact",
    "minhash_lsh_recall", "weighted_minhash_recall",
    "simhash_planted_recall", "connected_components",
    "embedding_near_dup",
    # r6-displaced text/dedup rows back for fresh green (r6 VERDICT #2)
    "doc_fingerprint", "duplicate_passages", "text_quality",
    "dedup_clusters",
    # core rows whose keyed-agg path changed in r6 (r6 VERDICT #2)
    "hll_distinct_per_group", "tdigest_quantiles", "bloom_membership",
    "minhash_jaccard",
    # stalest oracled tail rows (window_debt.py; last green r3)
    "stratified_sample", "decaying_cms_inner", "setsize_distinct",
}

# Queries whose semantics are declared non-SQL-expressible; the driver
# records a rows-only check for them, so they must NOT consume window
# slots that could carry a value-hashed query. (minhash_near_dup left
# this list in r7: its LSH output provably equals the exact
# inverted-index answer on these fixtures, so it now carries a DuckDB
# oracle — see q_minhash_near_dup.)
ROWS_ONLY = {
    "simhash_near_dup", "embedding_lsh_recall",
}


def test_window_holds_all_hard_signal_queries():
    window = list(entry.queries())[:DRIVER_WINDOW]
    missing = MUST_BE_IN_WINDOW - set(window)
    assert not missing, f"pushed out of the driver window: {sorted(missing)}"


def test_every_window_entry_is_oracled():
    window = list(entry.queries())[:DRIVER_WINDOW]
    oracles = entry.oracle_sql()
    unoracled = [n for n in window if n not in oracles]
    assert not unoracled, f"window entries without an oracle: {unoracled}"


def test_rows_only_entries_sit_in_tail():
    window = list(entry.queries())[:DRIVER_WINDOW]
    misplaced = ROWS_ONLY & set(window)
    assert not misplaced, f"rows-only entries wasting window slots: {sorted(misplaced)}"


def test_oracles_reference_real_queries():
    q = entry.queries()
    stray = [n for n in entry.oracle_sql() if n not in q]
    assert not stray, f"oracle_sql keys without a queries() entry: {stray}"


def test_all_query_callables_importable():
    for name, fn in entry.queries().items():
        assert callable(fn), name


def test_tail_marker_comment_matches_window_boundary():
    """The '=== tail (51+)' source comment must sit exactly at the
    50/51 boundary so the section labels match the hashed window
    (ADVICE r4: six entries were labeled in-window but fell outside)."""
    import inspect

    src = inspect.getsource(entry.queries)
    names = list(entry.queries())
    before_marker = src.split("=== tail (51+)")[0]
    # every window entry is declared before the marker...
    for name in names[:DRIVER_WINDOW]:
        assert f'"{name}"' in before_marker, f"{name} labeled as tail"
    # ...and no tail entry is
    for name in names[DRIVER_WINDOW:]:
        assert f'"{name}"' not in before_marker, f"{name} labeled in-window"
