"""Exact-aggregate parity layer: algebird operators that map 1:1 onto
Spark built-ins (SURVEY.md §2.2-2.4, §7.2 step 6). No UDAFs here —
Catalyst's partial/final HashAggregate already gives the map-side
combine these monoids hand-roll in the reference.

| algebird | here | reference |
|---|---|---|
| Moments (count/mean/var/skew/kurt) | moments() | core/MomentsGroup.scala |
| AveragedValue | avg + count | core/AveragedValue.scala:40 |
| Correlation monoid | corr/covar_pop | core/CorrelationMonoid.scala |
| sortedTake / TopKMonoid | top_k / top_k_per_group | core/Aggregator.scala:226-263 |
| MapAlgebra.sumByKey | sum_by_key | core/MapAlgebra.scala:30-114 |
| MapAlgebra.join | map_join | core/MapAlgebra.scala:234-245 |
| cube/rollup (Cuber/Roller macros) | cube_agg / rollup_agg | core/MapAlgebra.scala:274-318 |
| exists/forall | bool_or/bool_and | core/Aggregator.scala:180-187 |
| maxBy/minBy | max_by/min_by | core/Max.scala, core/Min.scala |
| randomSample (seeded) | deterministic_sample | core/Aggregator.scala:270-278 |
| Scan (running aggregates) | running_agg | core/Scan.scala |
| Window monoid (last-N) | last_n_window | core/Window.scala:41-169 |
| DecayedValue | decayed_sum | core/DecayedValue.scala:31-58 |
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def moments(df: DataFrame, value: str, keys: Sequence[str] = ()) -> DataFrame:
    """count/mean/variance/stddev/skewness/kurtosis — population forms,
    matching MomentsGroup semantics (population central moments)."""
    aggs = [
        F.count(value).alias("n"),
        F.avg(value).alias("mean"),
        F.var_pop(value).alias("variance"),
        F.stddev_pop(value).alias("stddev"),
        F.skewness(value).alias("skewness"),
        F.kurtosis(value).alias("kurtosis"),
    ]
    return df.groupBy(*keys).agg(*aggs) if keys else df.agg(*aggs)


def averaged_value(df: DataFrame, value: str, keys: Sequence[str] = ()) -> DataFrame:
    aggs = [F.count(value).alias("n"), F.avg(value).alias("mean")]
    return df.groupBy(*keys).agg(*aggs) if keys else df.agg(*aggs)


def correlation(df: DataFrame, x: str, y: str, keys: Sequence[str] = ()) -> DataFrame:
    aggs = [F.corr(x, y).alias("pearson"), F.covar_pop(x, y).alias("covariance")]
    return df.groupBy(*keys).agg(*aggs) if keys else df.agg(*aggs)


def top_k(df: DataFrame, order_col: str, k: int, ascending: bool = False,
          tiebreak: str | None = None) -> DataFrame:
    """Global bounded top-k (sortedTake): orderBy + limit — Spark plans
    this as TakeOrderedAndProject (no full sort at scale)."""
    oc = F.col(order_col).asc() if ascending else F.col(order_col).desc()
    order = [oc] + ([F.col(tiebreak).asc()] if tiebreak else [])
    return df.orderBy(*order).limit(k)


def top_k_per_group(df: DataFrame, keys: Sequence[str], order_col: str, k: int,
                    ascending: bool = False, tiebreak: str | None = None) -> DataFrame:
    oc = F.col(order_col).asc() if ascending else F.col(order_col).desc()
    order = [oc] + ([F.col(tiebreak).asc()] if tiebreak else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    return (df.withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") <= k).drop("__rn"))


def sum_by_key(df: DataFrame, keys: Sequence[str], values: dict[str, str]) -> DataFrame:
    """MapAlgebra.sumByKey: per-key monoid sum of one or more columns.
    ``values`` maps column -> output alias."""
    return df.groupBy(*keys).agg(*[F.sum(c).alias(a) for c, a in values.items()])


def map_join(left: DataFrame, right: DataFrame, key: str) -> DataFrame:
    """MapAlgebra.join: key-wise full outer join of two keyed maps."""
    return left.join(right, on=key, how="full_outer")


def cube_agg(df: DataFrame, keys: Sequence[str], aggs: list[Column]) -> DataFrame:
    return df.cube(*keys).agg(*aggs)


def rollup_agg(df: DataFrame, keys: Sequence[str], aggs: list[Column]) -> DataFrame:
    return df.rollup(*keys).agg(*aggs)


def exists_forall(df: DataFrame, pred: Column, keys: Sequence[str] = ()) -> DataFrame:
    aggs = [F.bool_or(pred).alias("exists"), F.bool_and(pred).alias("forall")]
    return df.groupBy(*keys).agg(*aggs) if keys else df.agg(*aggs)


def head_last(df: DataFrame, keys: Sequence[str], order: Column | str,
              value: str) -> DataFrame:
    """``Aggregator.head`` / ``Aggregator.last``
    (core/Aggregator.scala head/last): first and last value of the fold.
    The reference's fold order is the traversal order; on a distributed
    engine that is nondeterministic, so the order is made EXPLICIT —
    pass a unique ordering column/expression. head = min_by(value,
    order), last = max_by(value, order)."""
    aggs = [F.min_by(value, order).alias("head"),
            F.max_by(value, order).alias("last")]
    return df.groupBy(*keys).agg(*aggs) if keys else df.agg(*aggs)


def either_agg(df: DataFrame, pred: Column, left_val: Column,
               right_val: Column, keys: Sequence[str] = ()) -> DataFrame:
    """Fold over Either values (the reference's ``either`` combinator,
    core/Aggregator.scala: route each element to the left or right
    aggregator by predicate): rows where ``pred`` holds contribute
    left_val to the left sum, the rest contribute right_val to the
    right sum, with counts per side."""
    aggs = [
        F.sum(F.when(pred, left_val)).alias("left_sum"),
        F.count(F.when(pred, F.lit(1))).alias("left_n"),
        F.sum(F.when(~pred, right_val)).alias("right_sum"),
        F.count(F.when(~pred, F.lit(1))).alias("right_n"),
    ]
    return df.groupBy(*keys).agg(*aggs) if keys else df.agg(*aggs)


def max_min_by(df: DataFrame, keys: Sequence[str], by: str, value: str) -> DataFrame:
    return df.groupBy(*keys).agg(
        F.max_by(value, by).alias("argmax"),
        F.min_by(value, by).alias("argmin"),
        F.max(by).alias("max_val"),
        F.min(by).alias("min_val"))


def deterministic_sample(df: DataFrame, key: str, prob: float) -> DataFrame:
    """Seeded Bernoulli sample that is engine-portable: keep rows whose
    md5(key) 4-hex-digit prefix falls below prob * 0x10000. Same rows
    selected by any engine with md5 — the cross-engine analog of
    algebird's seeded randomSample aggregator."""
    thresh = format(int(prob * 0x10000), "04x")
    return df.filter(F.substring(F.md5(F.col(key).cast("string")), 1, 4) < thresh)


def running_agg(df: DataFrame, keys: Sequence[str], order: str,
                value: str, alias: str = "running_sum") -> DataFrame:
    """Scan.fromMonoidAggregator analog: running prefix sums."""
    w = (Window.partitionBy(*keys).orderBy(order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return df.withColumn(alias, F.sum(value).over(w))


def last_n_window(df: DataFrame, keys: Sequence[str], order: str, value: str,
                  n: int, alias: str = "last_n_sum") -> DataFrame:
    """algebird Window[T] monoid: aggregate over the last n rows."""
    w = Window.partitionBy(*keys).orderBy(order).rowsBetween(-(n - 1), Window.currentRow)
    return df.withColumn(alias, F.sum(value).over(w))


def decayed_sum(df: DataFrame, keys: Sequence[str], ts: str, value: str,
                half_life_seconds: float, alias: str = "decayed") -> DataFrame:
    """DecayedValue: sum of value * 2^((t - t_max)/halfLife) per key —
    every observation decayed to the key's newest timestamp
    (DecayedValue.scala:31-58 rescaling, expressed as one aggregate)."""
    w = Window.partitionBy(*keys)
    # NTZ timestamps can't cast to double; via TIMESTAMP (session tz is
    # pinned UTC) we get epoch seconds with sub-second fraction intact
    sec = F.col(ts).cast("timestamp").cast("double")
    tmax = F.max(sec).over(w)
    decayed = F.col(value) * F.pow(
        F.lit(2.0), (sec - tmax) / F.lit(half_life_seconds))
    return (df.withColumn("__d", decayed)
              .groupBy(*keys).agg(F.sum("__d").alias(alias)))


def reservoir_sample(df: DataFrame, key: str, count: int, seed: int = 42,
                     keys: Sequence[str] = ()) -> DataFrame:
    """Seeded reservoir sample of ``count`` rows (per group if ``keys``):
    algebird's reservoirSample aggregator (core/Aggregator.scala:279-295)
    as a deterministic window — rank rows by a seeded hash of the key,
    keep the lowest ``count``. Equivalent to a uniform sample without
    replacement; one shuffle, no driver state."""
    w = Window.partitionBy(*keys).orderBy(F.xxhash64(F.col(key), F.lit(seed)))
    return (df.withColumn("__rs", F.row_number().over(w))
              .filter(F.col("__rs") <= count).drop("__rs"))


def stratified_sample(df: DataFrame, strata_col: str,
                      fractions: dict, key: str) -> DataFrame:
    """Per-stratum deterministic Bernoulli sample — the training-mix
    primitive ("keep 50% of books, 5% of web"). Same engine-portable
    md5-prefix rule as deterministic_sample, with the threshold chosen
    per stratum; strata absent from ``fractions`` are dropped. One
    scan, no shuffle — the predicate pushes to the source."""
    expr = None
    prefix = F.substring(F.md5(F.col(key).cast("string")), 1, 4)
    for stratum, prob in fractions.items():
        ti = int(prob * 0x10000)
        if ti >= 0x10000:
            # prob == 1.0: format() would yield the 5-char '10000',
            # which is lexicographically SMALLER than 'ffff' — keep
            # the whole stratum explicitly instead
            cond = F.col(strata_col) == stratum
        elif ti <= 0:
            continue  # prob < 1/65536 keeps nothing
        else:
            cond = (F.col(strata_col) == stratum) \
                & (prefix < format(ti, "04x"))
        expr = cond if expr is None else (expr | cond)
    return df.filter(expr if expr is not None else F.lit(False))


def token_budget_sample(df: DataFrame, by: str = "source",
                        id_col: str = "doc_id", text_col: str = "text",
                        token_col: str | None = None,
                        budget: dict | None = None,
                        total_budget: float | None = None,
                        mix=None) -> DataFrame:
    """Deterministic token-budget sampler — the data-MIXING primitive of
    a training pipeline: given per-group token budgets (or a total
    budget split by ``mix`` weights, or proportionally), keep a
    deterministic Bernoulli sample of each group sized so its expected
    token mass meets the budget. The keep decision is the engine-
    portable md5 6-hex-digit prefix test (``deterministic_sample``
    scaled to 16^6 granularity) on ``group:doc_id``, so any engine —
    and any RERUN — selects the identical rows: reproducible mixtures,
    no RNG state to ship.

    ``mix``: dict of weights, or ``"uniform"`` for equal token budgets
    per observed group; omitted with ``total_budget`` = proportional
    (every group downsampled by the same factor). Groups whose budget
    exceeds their mass keep everything (no upsampling — repetition
    policy belongs to the caller).

    One aggregation pass computes group token totals (tiny: one row
    per group); the filter itself is a pure expression on a literal
    map, evaluated in the scan stage — nothing shuffles to sample."""
    from .text import token_count

    tok = F.col(token_col) if token_col else token_count(F.col(text_col))
    t = df.withColumn("__nt", tok)
    totals = {r[by]: int(r["tot"]) for r in
              t.groupBy(by).agg(F.sum("__nt").alias("tot")).collect()}
    if budget is None:
        if total_budget is None:
            raise ValueError("give budget= or total_budget=")
        if mix == "uniform":
            n = len(totals)
            budget = {g: total_budget * (1.0 / n) for g in totals}
        elif isinstance(mix, dict):
            ws = float(sum(mix.values()))
            budget = {g: total_budget * (mix.get(g, 0.0) / ws)
                      for g in totals}
        else:
            grand = float(sum(totals.values()))
            budget = {g: float(total_budget) * totals[g] / grand
                      for g in totals}
    scale = 0x1000000
    thrs = {}
    for g, tot in totals.items():
        target = float(budget.get(g, 0.0))
        if tot <= 0 or target >= tot:
            thrs[g] = "zzzzzz"      # keep all ('z' > any hex digit)
        elif target <= 0:
            thrs[g] = "000000"      # keep none
        else:
            thrs[g] = format(int(target / tot * scale), "06x")
    mapping = F.create_map(*[F.lit(x) for g, th in sorted(thrs.items())
                             for x in (g, th)])
    # strict concat (not concat_ws): a NULL id nulls the hash and the
    # row drops, matching the SQL `||` semantics engines agree on
    h = F.substring(
        F.md5(F.concat(F.col(by).cast("string"), F.lit(":"),
                       F.col(id_col).cast("string"))), 1, 6)
    return t.filter(h < mapping[F.col(by)]).drop("__nt")


def assign_splits(df: DataFrame, fractions: dict, id_col: str = "doc_id",
                  salt: str = "split") -> DataFrame:
    """Deterministic train/val/test assignment: adds ``__split`` by
    cutting the md5 6-hex-digit prefix of ``salt:id`` at cumulative-
    fraction thresholds. Disjoint and exhaustive by construction (one
    hash, consecutive half-open intervals), engine-portable and stable
    across reruns/engines like ``deterministic_sample`` — membership
    never silently changes when the corpus grows, because the decision
    depends only on the row's own id. ``salt`` decorrelates this
    assignment from every other md5-prefix decision (sampling, mixing)
    made on the same ids."""
    fr = list(fractions.items())
    if not fr or any(f < 0 for _, f in fr) or abs(sum(f for _, f in fr) - 1.0) > 1e-9:
        raise ValueError("fractions must be nonnegative and sum to 1")
    scale = 0x1000000
    # strict concat: NULL ids hash NULL -> fall to the last split
    # (deterministic), same as SQL `||`
    h = F.substring(
        F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))),
        1, 6)
    cum = 0.0
    bounds = []
    for name, f in fr[:-1]:
        cum += f
        bounds.append((name, format(min(int(cum * scale), scale - 1), "06x")))
    expr = None
    for name, b in bounds:  # first matching threshold wins
        cond = h < b
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (expr.otherwise(fr[-1][0]) if expr is not None
            else F.lit(fr[-1][0]))
    return df.withColumn("__split", expr)
