"""The canonical corpus-dedup pipeline, shared by ``api.dedup`` and
``jobs/dedup_corpus.py`` so the two surfaces cannot drift: quality
gate -> exact dedup -> (optional) near-dup pairs -> connected-component
clustering -> one survivor (min id) per cluster.

Every stage is one bounded-shuffle pass (fingerprints, signatures, and
(node, long) edges shuffle — never document text). The returned
``clusters`` table is provenance-COMPLETE over the gated set: exact-dup
losers contribute (loser -> keeper) edges, so every gated doc maps to
its surviving component.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from . import dedup as _d
from . import text as _t
from .graph import dedup_clusters


def dedup_pipeline(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", near: str | None = "minhash",
                   threshold: float = 0.7, num_perm: int = 64,
                   bands: int = 16, max_hamming: int = 3,
                   min_chars: int = 0, min_tokens: int = 0
                   ) -> dict[str, DataFrame]:
    """Returns the pipeline's stage DataFrames:

    - ``gated``: rows passing the quality gate
    - ``exact_kept``: one doc (min id) per distinct text
    - ``clusters``: (id, component, keep) for EVERY gated doc —
      exact-dup losers cluster with their keeper, near-dup components
      merge transitively
    - ``survivors``: gated rows with ``keep``
    """
    gated = df
    if min_chars:
        gated = gated.filter(F.length(text_col) >= min_chars)
    if min_tokens:
        gated = gated.filter(_t.token_count(F.col(text_col)) >= min_tokens)

    # exact losers -> keeper edges, linear in group size (no cliques):
    # every doc links to its fingerprint group's min id
    keeper = (gated.select(F.col(id_col),
                           _t.fingerprint(F.col(text_col)).alias("__fp"))
              .withColumn("__keep",
                          F.min(id_col).over(Window.partitionBy("__fp"))))
    exact_edges = (keeper.filter(F.col(id_col) != F.col("__keep"))
                   .select(F.col(id_col).alias("id_a"),
                           F.col("__keep").alias("id_b")))
    exact_kept = gated.join(
        keeper.filter(F.col(id_col) == F.col("__keep")).select(id_col),
        id_col, "left_semi")

    if near == "minhash":
        pairs = _d.near_dup_pairs_minhash(exact_kept, id_col, text_col,
                                          num_perm=num_perm, bands=bands,
                                          threshold=threshold)
    elif near == "simhash":
        pairs = _d.near_dup_pairs_simhash(exact_kept, id_col, text_col,
                                          max_hamming=max_hamming)
    elif near is None:
        pairs = None
    else:
        raise ValueError(f"unknown near-dup mode {near!r}")

    edges = exact_edges if pairs is None else \
        exact_edges.unionByName(pairs.select("id_a", "id_b"))
    clusters = dedup_clusters(gated, edges, id_col)
    survivors = gated.join(clusters.filter("keep").select(id_col),
                           id_col, "left_semi")
    return {"gated": gated, "exact_kept": exact_kept,
            "clusters": clusters, "survivors": survivors}
