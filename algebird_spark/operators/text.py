"""Text-analysis operators for training-data pipelines over the
``documents`` table: token counting, quality scoring, language-ID
heuristic, document fingerprinting. All hot paths are built-in
``pyspark.sql.functions`` expressions (JVM-side, codegen) — no Python
UDFs — so they survive 100 TB scans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny stopword lists for the n-gram/stopword language heuristic
_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "sie"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "dans", "que", "pour"],
    "es": ["el", "la", "los", "que", "de", "no", "una", "con", "por", "para"],
}


def token_count(text: Column) -> Column:
    """Whitespace token count (empty string -> 0)."""
    t = F.trim(text)
    return F.when(t == "", F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))).cast("int")


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish upper bound: word pieces + punctuation as singletons,
    approximated as count of word/punct regex matches."""
    words = F.size(F.regexp_extract_all(text, F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"), 0))
    return F.greatest(words, F.lit(0)).cast("int")


def punct_ratio(text: Column) -> Column:
    n = F.length(text)
    punct = F.length(F.regexp_replace(text, r"[^.,;:!?'\"()-]", ""))
    return F.when(n > 0, punct / n).otherwise(F.lit(0.0))


def upper_ratio(text: Column) -> Column:
    n = F.length(text)
    upper = F.length(F.regexp_replace(text, r"[^A-Z]", ""))
    return F.when(n > 0, upper / n).otherwise(F.lit(0.0))


def mean_word_length(text: Column) -> Column:
    t = F.trim(text)
    n_tok = token_count(text)
    letters = F.length(F.regexp_replace(t, r"\s+", ""))
    return F.when(n_tok > 0, letters / n_tok).otherwise(F.lit(0.0))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    words = F.split(F.lower(F.trim(text)), r"\s+")
    hits = F.size(F.array_intersect(
        words, F.array(*[F.lit(w) for w in _STOPWORDS[lang]])))
    # array_intersect dedups; ratio over distinct words is stable enough
    n = F.size(F.array_distinct(words))
    return F.when(n > 0, hits / n).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length, punctuation sanity,
    word-length sanity, stopword presence."""
    length_ok = F.least(F.length(text) / F.lit(500.0), F.lit(1.0))
    punct_ok = F.lit(1.0) - F.least(punct_ratio(text) * 5.0, F.lit(1.0))
    mwl = mean_word_length(text)
    word_ok = F.when((mwl >= 3.0) & (mwl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.4))
    stop_ok = F.least(stopword_ratio(text) * 5.0, F.lit(1.0))
    return (0.3 * length_ok + 0.2 * punct_ok + 0.2 * word_ok + 0.3 * stop_ok)


def detect_language(text: Column) -> Column:
    """Stopword-vote language ID across the built-in lists; 'und' when
    no stopwords hit."""
    words = F.split(F.lower(F.trim(text)), r"\s+")
    scores = {lang: F.size(F.array_intersect(
        words, F.array(*[F.lit(w) for w in sw])))
        for lang, sw in _STOPWORDS.items()}
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    for lang in reversed(list(scores)):  # earlier langs win ties
        expr = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def fingerprint(text: Column) -> Column:
    """Deterministic 128-bit document fingerprint (md5 hex) — the exact
    dedup key; engine-portable."""
    return F.md5(text)


_SIMHASH_LANE_BITS = 20          # counters per packed long: 3 x 20 bits
_SIMHASH_MAX_TOKENS = 1 << _SIMHASH_LANE_BITS


def simhash64_df(df: DataFrame, id_col: str, text_col: str = "text",
                 alias: str = "simhash") -> DataFrame:
    """64-bit SimHash per document: bit b of the result = majority vote
    of bit b across the xxhash64 of each whitespace token.

    Spark-first formulation: explode tokens once, then ONE groupBy —
    with the 64 majority counters PACKED three-per-long into 22
    aggregate columns (20-bit lanes). Packing shrinks the partial-
    aggregation buffer from 65 to 23 longs per in-flight doc (512 ->
    184 bytes of hash-map state and map-side-spill volume per document
    — material at 10^9 docs) while the per-row work stays identical
    shift/mask/add; results are bit-identical to the unpacked
    formulation (tested). Documents longer than 2^20 tokens would
    overflow a lane and yield NULL (chunk such documents upstream);
    no Python, no per-row loops anywhere."""
    par = df.sparkSession.sparkContext.defaultParallelism
    src = df if df.rdd.getNumPartitions() >= par else df.repartition(par)
    toks = src.select(
        id_col,
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("__tok"))
    h = F.xxhash64("__tok")
    groups = [list(range(g, min(g + 3, 64))) for g in range(0, 64, 3)]
    aggs = [F.count("*").alias("__n")]
    for gi, bits in enumerate(groups):
        packed = None
        for j, b in enumerate(bits):
            lane = F.shiftright(h, b).bitwiseAND(F.lit(1)).cast("long")
            if j:
                lane = F.shiftleft(lane, _SIMHASH_LANE_BITS * j)
            packed = lane if packed is None else packed.bitwiseOR(lane)
        aggs.append(F.sum(packed).alias(f"__p{gi}"))
    per_doc = toks.groupBy(id_col).agg(*aggs)
    lane_mask = (1 << _SIMHASH_LANE_BITS) - 1
    sim = F.lit(0).cast("long")
    for b in range(64):
        cnt = F.shiftright(F.col(f"__p{b // 3}"),
                           _SIMHASH_LANE_BITS * (b % 3)) \
            .bitwiseAND(F.lit(lane_mask))
        sim = sim.bitwiseOR(
            F.when(cnt * 2 > F.col("__n"),
                   F.shiftleft(F.lit(1).cast("long"), b))
             .otherwise(F.lit(0).cast("long")))
    sim = F.when(F.col("__n") < _SIMHASH_MAX_TOKENS, sim)
    return per_doc.select(id_col, sim.alias(alias))


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Standard per-document feature block."""
    t = F.col(text_col)
    return df.withColumns({
        "n_tokens": token_count(t),
        "n_tokens_bpe": bpe_ish_token_count(t),
        "punct_ratio": punct_ratio(t),
        "mean_word_len": mean_word_length(t),
        "stopword_ratio_en": stopword_ratio(t),
        "quality": quality_score(t),
        "lang_guess": detect_language(t),
        "fingerprint": fingerprint(t),
    })
