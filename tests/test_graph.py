"""Connected components (large-star/small-star) vs a NetworkX-free
pure-Python union-find oracle, plus dedup_clusters policy checks."""

import random

import pytest

from pyspark.sql import functions as F

from algebird_spark.operators.graph import connected_components, dedup_clusters


def _uf_components(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-label per component
    label = {}
    for v in range(n_nodes):
        r = find(v)
        label.setdefault(r, v)
    return {v: label[find(v)] for v in range(n_nodes)}


def _check(spark, n_nodes, edges):
    e = spark.createDataFrame(edges or [(0, 0)], "src long, dst long")
    if not edges:
        e = e.filter(F.lit(False))
    v = spark.range(n_nodes).withColumnRenamed("id", "node")
    got = {r["node"]: r["component"]
           for r in connected_components(e, vertices=v,
                                         vertex_col="node").collect()}
    assert got == _uf_components(n_nodes, edges)


def test_empty_graph(spark):
    _check(spark, 5, [])


def test_single_chain_multihop(spark):
    # a 40-node chain needs several star rounds
    _check(spark, 40, [(i, i + 1) for i in range(39)])


def test_self_loops_and_duplicates(spark):
    _check(spark, 6, [(0, 0), (1, 2), (2, 1), (1, 2), (4, 5)])


def test_random_graphs_match_union_find(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 60
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(45)]
        _check(spark, n, edges)


def test_star_hub_no_collect_list(spark):
    # one hub connected to everyone: degree n-1, exercises the
    # groupBy-min path a collect_list formulation would choke on
    n = 200
    _check(spark, n, [(0, i) for i in range(1, n)])


def test_dedup_clusters_policy(spark):
    docs = spark.createDataFrame([(i,) for i in range(7)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 4), (4, 6), (2, 3)], "id_a long, id_b long")
    rows = {r["doc_id"]: (r["component"], r["keep"])
            for r in dedup_clusters(docs, pairs).collect()}
    assert rows == {0: (0, True), 1: (1, True), 2: (2, True),
                    3: (2, False), 4: (1, False), 5: (5, True),
                    6: (1, False)}


def test_no_convergence_raises(spark):
    e = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(RuntimeError):
        connected_components(e, max_iter=0)


def test_pipeline_near_none_is_lazy_fingerprint_groups(spark):
    from algebird_spark.operators.pipeline import dedup_pipeline
    docs = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other"), (4, None)],
        "doc_id long, text string")
    stages = dedup_pipeline(docs, near=None)
    clusters = {r["doc_id"]: (r["component"], r["keep"])
                for r in stages["clusters"].collect()}
    # NULL text is its own singleton, never an "exact duplicate"
    assert clusters == {1: (1, True), 2: (1, False),
                        3: (3, True), 4: (4, True)}
    kept = {r["doc_id"] for r in stages["survivors"].collect()}
    assert kept == {1, 3, 4}


def test_pipeline_exact_edges_feed_cc_with_near_mode(spark):
    from algebird_spark.operators.pipeline import dedup_pipeline
    docs = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b c d e f g h"),
         (3, "z y x w v u t s")],
        "doc_id long, text string")
    stages = dedup_pipeline(docs, near="minhash", threshold=0.99)
    clusters = {r["doc_id"]: r["component"]
                for r in stages["clusters"].collect()}
    assert clusters[2] == 1  # exact loser maps to its keeper
    assert clusters[3] == 3
