"""Plan-keyed memoization for eager operator work.

Several operators are not single lazy plans: they run driver-blocking
jobs at DataFrame-construction time — quantile-boundary probes
(`prefix.quantile_bucket`), per-bucket count/sum collects, and the
iterative localCheckpoint rounds of connected components / PageRank /
k-core. A warm loop that rebuilds the same operator over the same
inputs re-runs every one of those jobs to produce byte-identical
results (each is a pure function of the input plan — the r5 verdict's
"prepare is per-retrieval cost in real use" finding).

This module generalizes the PIT bounds memo: results are keyed by the
EXACT canonicalized analyzed plan of every input DataFrame
(``sameResult`` — the identity check Spark's own CacheManager trusts
for cache substitution, so LocalRelation data and file listings
participate in the comparison) plus a structural token for scalar
parameters. Like ``spark.catalog.cacheTable``, the memo assumes
sources are immutable within a session; entries are app-scoped and
LRU-bounded.

Two entry points:

- ``job_memo``   — memoize the RESULT of a driver job (a collected
                   list, quantile boundaries, a count): re-running it
                   on the same input is pure repeated work.
- ``plan_memo``  — memoize a BUILT DataFrame (the output of an
                   iterative algorithm whose lineage was truncated by
                   localCheckpoint): rebuilding replays every round.

Caveat shared with every cached Dataset: a ``plan_memo`` hit returns
the original compiled plan, so session-conf changes between identical
builds don't re-plan it.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Union

from pyspark.sql import DataFrame, SparkSession

_MEMO: list = []  # (app_id, kind, token, [analyzed plans], value)
_MEMO_MAX = 64


def _analyzed(df: DataFrame):
    return df._jdf.queryExecution().analyzed()


def _lookup_or_run(
    spark: SparkSession,
    kind: str,
    inputs: Sequence[DataFrame],
    token: tuple,
    run: Callable[[], Any],
) -> Any:
    app_id = spark.sparkContext.applicationId
    plans = [_analyzed(df) for df in inputs]
    for aid, ckind, ctoken, cplans, value in reversed(_MEMO):
        if (
            aid == app_id
            and ckind == kind
            and ctoken == token
            and len(cplans) == len(plans)
            and all(c.sameResult(p) for c, p in zip(cplans, plans))
        ):
            return value
    value = run()
    _MEMO[:] = [e for e in _MEMO if e[0] == app_id][-(_MEMO_MAX - 1):]
    _MEMO.append((app_id, kind, token, plans, value))
    return value


def job_memo(
    spark: SparkSession,
    inputs: Union[DataFrame, Sequence[DataFrame]],
    token: tuple,
    run: Callable[[], Any],
) -> Any:
    """Memoize a driver-job result (collect/quantile/count) keyed by
    the input plan(s) + ``token``. ``token`` must make the call site
    unambiguous (include the operator name and every scalar param)."""
    if isinstance(inputs, DataFrame):
        inputs = [inputs]
    return _lookup_or_run(spark, "job", inputs, token, run)


def plan_memo(
    spark: SparkSession,
    inputs: Union[DataFrame, Sequence[DataFrame]],
    token: tuple,
    build: Callable[[], DataFrame],
) -> DataFrame:
    """Memoize a built DataFrame (iterative/eager construction) keyed
    by the input plan(s) + ``token``."""
    if isinstance(inputs, DataFrame):
        inputs = [inputs]
    return _lookup_or_run(spark, "plan", inputs, token, build)


def clear() -> None:
    """Drop every memo entry (tests; or after mutating a source)."""
    _MEMO.clear()
