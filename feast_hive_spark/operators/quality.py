"""Data-quality validation operators (the deequ/great-expectations
shape): declarative constraint suites evaluated in ONE aggregate pass,
plus percentile-based winsorization for robust statistics.

Scale notes (100 TB):
- ``check_constraints`` compiles every rule to a conditional-count
  column of a single scan-wide aggregate — rule count never adds
  passes over the data, and the result is #rules rows.
- uniqueness is the only rule that needs a shuffle (count-distinct
  two-phase aggregate); it shares the same jobs as the scan pass via
  a second tiny aggregate, never a self-join.
- ``winsorize_stats`` computes per-group exact percentile bounds (one
  shuffle), broadcasts the #groups-row bounds table back, and clips
  in codegen — the standard two-pass robust-stats shape.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One declarative constraint. ``kind`` ∈ {not_null, unique,
    in_range, matches, accepted_values}."""

    name: str
    column: str
    kind: str
    lo: float | None = None
    hi: float | None = None
    pattern: str | None = None
    values: tuple | None = None


def not_null(column: str) -> Rule:
    return Rule(f"not_null({column})", column, "not_null")


def unique(column: str) -> Rule:
    return Rule(f"unique({column})", column, "unique")


def in_range(column: str, lo: float, hi: float) -> Rule:
    return Rule(f"in_range({column})", column, "in_range", lo=lo, hi=hi)


def matches(column: str, pattern: str) -> Rule:
    return Rule(f"matches({column})", column, "matches", pattern=pattern)


def accepted_values(column: str, values: Sequence) -> Rule:
    return Rule(
        f"accepted_values({column})", column, "accepted_values",
        values=tuple(values),
    )


def _violations(rule: Rule) -> Column:
    c = F.col(rule.column)
    if rule.kind == "not_null":
        bad = c.isNull()
    elif rule.kind == "in_range":
        bad = c.isNull() | (c < rule.lo) | (c > rule.hi)
    elif rule.kind == "matches":
        bad = c.isNull() | ~c.rlike(rule.pattern)
    elif rule.kind == "accepted_values":
        bad = c.isNull() | ~c.isin(*rule.values)
    else:
        raise ValueError(f"unknown rule kind {rule.kind!r}")
    return F.sum(bad.cast("long")).alias(rule.name)


def check_constraints(df: DataFrame, rules: Sequence[Rule]) -> DataFrame:
    """Evaluate a constraint suite; returns one row per rule:
    ``rule, n_rows, n_violations, passed``.

    All row-local rules fold into ONE aggregate over a single scan;
    each ``unique`` rule adds one count-distinct aggregate (its
    violation count is ``n_rows - n_distinct``). The per-rule outputs
    are stacked with a literal-array explode — no shuffle beyond the
    aggregates themselves."""
    if not rules:
        raise ValueError("rules must be non-empty")
    row_rules = [r for r in rules if r.kind != "unique"]
    uniq_rules = [r for r in rules if r.kind == "unique"]
    aggs = [F.count(F.lit(1)).alias("__n")]
    aggs += [_violations(r) for r in row_rules]
    aggs += [
        F.countDistinct(F.col(r.column)).alias(f"__d_{i}")
        for i, r in enumerate(uniq_rules)
    ]
    agg = df.agg(*aggs)
    entries = [
        F.struct(
            F.lit(r.name).alias("rule"),
            F.col(r.name).alias("n_violations"),
        )
        for r in row_rules
    ] + [
        F.struct(
            F.lit(r.name).alias("rule"),
            (F.col("__n") - F.col(f"__d_{i}")).alias("n_violations"),
        )
        for i, r in enumerate(uniq_rules)
    ]
    return agg.select(
        F.col("__n").alias("n_rows"), F.explode(F.array(*entries)).alias("e")
    ).select(
        F.col("e.rule").alias("rule"),
        F.col("n_rows"),
        F.col("e.n_violations").cast("long").alias("n_violations"),
        (F.col("e.n_violations") == 0).alias("passed"),
    )


def winsorize_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo_pct: float = 0.01,
    hi_pct: float = 0.99,
) -> DataFrame:
    """Per-group winsorized statistics: clip ``value_col`` to its
    group's exact [lo_pct, hi_pct] percentiles, then report
    ``n, lo_bound, hi_bound, n_clipped, mean_raw, mean_winsorized``.

    Bounds come from one exact-percentile aggregate per group
    (#groups rows, broadcast back); clipping runs in codegen; means
    are micro-unit fixed-point so cross-engine sums are exact."""
    bounds = df.groupBy(group_col).agg(
        F.percentile(value_col, F.lit(lo_pct)).alias("__lo"),
        F.percentile(value_col, F.lit(hi_pct)).alias("__hi"),
    )
    v = F.col(value_col)
    clipped = F.least(F.greatest(v, F.col("__lo")), F.col("__hi"))
    micro = lambda c: F.round(c * 1000000).cast("long")  # noqa: E731
    return (
        df.join(F.broadcast(bounds), group_col)
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("__lo"), 4).alias("lo_bound"),
            F.round(F.min("__hi"), 4).alias("hi_bound"),
            F.sum(((v < F.col("__lo")) | (v > F.col("__hi"))).cast("long")).alias(
                "n_clipped"
            ),
            F.round(
                F.sum(micro(v)).cast("double") / F.count(F.lit(1)) / 1000000, 4
            ).alias("mean_raw"),
            F.round(
                F.sum(micro(clipped)).cast("double") / F.count(F.lit(1)) / 1000000, 4
            ).alias("mean_winsorized"),
        )
    )


def foreign_key_check(
    child: DataFrame,
    parent: DataFrame,
    child_cols: Sequence[str],
    parent_cols: Sequence[str],
    name: str,
) -> DataFrame:
    """Referential-integrity audit: one row ``(constraint, n_child,
    n_orphans, ok)`` counting child rows whose key has no parent.

    Implemented as a left join of the child's key columns against the
    deduped parent key set plus one aggregate — the join strategy is
    left to AQE (a dimension parent broadcasts, a fact-sized parent
    shuffle-joins), and only the key columns are scanned on either
    side.  Compose several checks with unionByName for a whole-schema
    audit in one DataFrame.  NULL child keys count as orphans (they
    reference no parent), matching SQL NOT EXISTS semantics."""
    keys = list(child_cols)
    pk = (
        parent.select(
            *[
                F.col(p).alias(c)
                for p, c in zip(parent_cols, child_cols)
            ]
        )
        .dropDuplicates()
        .withColumn("__hit", F.lit(1))
    )
    j = child.select(*keys).join(pk, on=keys, how="left")
    agg = j.agg(
        F.count(F.lit(1)).alias("n_child"),
        F.sum(F.when(F.col("__hit").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_orphans"),
    )
    return agg.select(
        F.lit(name).alias("constraint"),
        "n_child",
        "n_orphans",
        (F.col("n_orphans") == 0).alias("ok"),
    )


def correlation_matrix(df: DataFrame, int_cols: Sequence[str]) -> DataFrame:
    """Pairwise Pearson correlation over PRE-INTEGERIZED columns in
    ONE scan — the feature-redundancy screen before model training.

    Callers fix-point their columns first (cents, basis points, whole
    units): all moment sums (sum, sum of squares, cross products) are
    then EXACT integers accumulated as decimal(38,0) — overflow-safe
    at 100 TB row counts, bit-identical in any engine — and the double
    correlation formula runs once per pair on identical integers, so
    the result hash-matches the DuckDB twin. One scan-wide aggregate
    regardless of pair count (partial aggregation folds map-side);
    the pair explosion happens on the single result row.

    Output: ``(col_x, col_y, n, corr)`` for every unordered pair
    x < y (by list position), corr rounded to 6 dp.
    """
    cols = list(int_cols)
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    aggs = [F.count(F.lit(1)).alias("n")]
    for i, c in enumerate(cols):
        aggs.append(F.sum(dec(c)).alias(f"s{i}"))
        for j in range(i, len(cols)):
            aggs.append(
                F.sum(dec(c) * F.col(cols[j]).cast("decimal(38,0)")).alias(
                    f"p{i}_{j}"
                )
            )
    one = df.agg(*aggs)
    pair_structs = []
    for i in range(len(cols)):
        for j in range(i + 1, len(cols)):
            nd = F.col("n").cast("double")
            sx, sy = F.col(f"s{i}").cast("double"), F.col(f"s{j}").cast("double")
            sxx = F.col(f"p{i}_{i}").cast("double")
            syy = F.col(f"p{j}_{j}").cast("double")
            sxy = F.col(f"p{i}_{j}").cast("double")
            corr = (nd * sxy - sx * sy) / (
                F.sqrt(nd * sxx - sx * sx) * F.sqrt(nd * syy - sy * sy)
            )
            pair_structs.append(
                F.struct(
                    F.lit(cols[i]).alias("col_x"),
                    F.lit(cols[j]).alias("col_y"),
                    F.col("n").cast("long").alias("n"),
                    F.round(corr, 6).alias("corr"),
                )
            )
    return one.select(
        F.explode(F.array(*pair_structs)).alias("__p")
    ).select("__p.col_x", "__p.col_y", "__p.n", "__p.corr")


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Key-level diff between two table versions — the CDC/backfill
    validation primitive: which keys were added, removed, or changed
    (any compared column differs, null-safe).

    One full-outer join on the key columns; change classification is
    pure codegen CASE logic, and unchanged keys are filtered OUT so
    the result is sized to the delta, not the table. ``compare_cols``
    defaults to all common non-key columns.

    Output: ``(key..., change_type)`` with change_type in
    {'added', 'removed', 'changed'}.
    """
    keys = list(key_cols)
    if compare_cols is None:
        compare_cols = [
            c for c in old.columns if c in set(new.columns) and c not in keys
        ]
    o = old.select(
        *[F.col(k).alias(k) for k in keys],
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
        F.lit(1).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k).alias(k) for k in keys],
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
        F.lit(1).alias("__in_new"),
    )
    j = o.join(n, keys, "full_outer")
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(changed, F.lit("changed"))
        .otherwise(F.lit("same"))
    )
    return (
        j.withColumn("change_type", change)
        .filter(F.col("change_type") != "same")
        .select(*keys, "change_type")
    )
