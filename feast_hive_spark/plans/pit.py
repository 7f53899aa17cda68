"""Point-in-time (as-of) join — the engine's flagship query program.

Re-expression of the reference's 195-line Jinja2 HiveQL template
(feast_hive/hive.py:527-721) as a composed DataFrame plan. Semantics
(prose spec at hive.py:567-582, :639-644, :656-658, :681-684,
:701-704): for each entity row ``(keys…, entity_ts)`` and each feature
view, among feature rows with equal keys and
``event_ts ∈ [entity_ts - ttl, entity_ts]`` (no lower bound when
``ttl == 0``, guards hive.py:595/:602/:614/:622), pick the max
``event_ts``, tie-break max ``created_timestamp``; left-join back to
the entity rows (missing -> NULL, duplicates preserved).

Spark-first plan (SURVEY §2.3 J1-J6, §4):

1. The entity df is ingested natively (``spark.createDataFrame`` /
   ``spark.sql``) — the reference's dominant cost, a chunked
   row-literal ``INSERT INTO`` upload (hive.py:394-460), disappears.
2. **Coarse bounds pushdown (kept, manual — J2):** Catalyst cannot
   derive data-dependent bounds across a join, so we compute
   ``min/max(entity_ts)`` with one tiny driver job and inject them as
   *literal* filters on each feature scan. At 100 TB this is what
   turns a full feature-table scan into parquet row-group skipping /
   partition pruning on the timestamp column.
3. **Entity dedup before the join (kept — A1):** ``dropDuplicates``
   on (keys, entity_ts) shrinks the join's build side.
4. **One argmax aggregation replaces the reference's J4+J5+A3+A4
   dedup cascade** (2 aggregates + 2 self-joins): ``max_by(features,
   struct(event_ts, created_ts, tiebreaks))`` grouped by
   ``(keys…, entity_ts)``. Partial aggregation runs MAP-SIDE, so a
   whale entity key collapses to one row per partition before the
   shuffle — skew-immune at 100 TB (a row_number window, even with
   WindowGroupLimit's streaming top-1, still funnels every matching
   row of a hot key through one shuffle partition; it remains
   available via ``use_max_by=False``). We join on the raw
   ``(keys…, entity_ts)`` tuple, NOT the collision-prone
   separator-less string rid of hive.py:537-544.
5. **Broadcast the (deduped) entity side** when small: the feature
   table — the 100 TB side — then streams through a BroadcastHashJoin
   with zero shuffle; the only shuffle in the whole per-fv pipeline is
   the argmax hash partition. When the entity df is huge, fall back
   to letting AQE pick sort-merge (``broadcast_entities=False``).

Physical plan per feature view: Scan(feature, pushed time filter) ->
BroadcastHashJoin(entity keys) + range condition ->
partial_max_by -> Exchange -> max_by -> broadcast left-join assembly.
Exactly one shuffle per fv, with map-side combine.
"""

from __future__ import annotations

import math
import threading
from dataclasses import dataclass, field
from datetime import timedelta
from typing import Mapping, Optional, Sequence, Union

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from feast_hive_spark.retrieval import RetrievalJob
from feast_hive_spark.sources.tables import bind_sql_view
from feast_hive_spark.sources.source import DataSource

DEFAULT_ENTITY_DF_EVENT_TIMESTAMP_COL = "event_timestamp"

_ENTITY_TS = "__entity_ts"
_EVENT_TS = "__event_ts"
_CREATED_TS = "__created_ts"

# Guards the overwrite-three-views-then-sql window in _join_fv_sql:
# concurrent plan builds on one SparkSession must not interleave the
# __pit_sql_* temp-view bindings.
_SQL_VIEW_LOCK = threading.Lock()


def _bt(name: str) -> str:
    """Backtick-quote an identifier for composed SQL fragments."""
    return "`" + name.replace("`", "``") + "`"


class EntityTimestampInferenceException(Exception):
    def __init__(self) -> None:
        super().__init__(
            "Unable to infer the event timestamp column from the entity "
            f"dataframe: provide a column named "
            f"'{DEFAULT_ENTITY_DF_EVENT_TIMESTAMP_COL}' or exactly one "
            "timestamp-typed column."
        )


class EntityDFMissingColumnsError(Exception):
    """Parity with FeastEntityDFMissingColumnsError
    (reference validation, hive.py:218-224; tested
    tests/test_all.py:402-418)."""

    def __init__(self, expected: Sequence[str], missing: Sequence[str]):
        super().__init__(
            f"The entity dataframe is missing columns {list(missing)}; "
            f"expected at least {list(expected)}."
        )


class InvalidEntityType(Exception):
    def __init__(self, t: type):
        super().__init__(
            f"The entity dataframe has unsupported type {t}; expected "
            "a Spark DataFrame, a pandas DataFrame, or a SQL string."
        )


@dataclass
class FeatureView:
    """Metadata driving one as-of-joined feature set.

    ``join_keys`` maps feature-table column -> entity-df column (the
    reference's ``entity_selections``, "col AS join_key"); a plain
    sequence means same-named columns. ``ttl_seconds == 0`` means NO
    lower time bound (hive.py:595), not a zero-width window.
    """

    name: str
    source: Union[DataSource, DataFrame]
    join_keys: Union[Mapping[str, str], Sequence[str]] = field(default_factory=list)
    features: Sequence[str] = field(default_factory=list)
    ttl_seconds: float = 0
    event_timestamp_column: Optional[str] = None
    created_timestamp_column: Optional[str] = None

    def __post_init__(self) -> None:
        # Normalize TTL to whole seconds ONCE so the coarse pushdown
        # bound (J2) and the per-row join window (J3) use the same
        # value. Ceil, not truncate: int(0.5) == 0 would silently flip
        # a sub-second TTL to "no lower bound at all".
        self.ttl_seconds = math.ceil(self.ttl_seconds)

    def key_map(self) -> dict[str, str]:
        if isinstance(self.join_keys, Mapping):
            return dict(self.join_keys)
        return {k: k for k in self.join_keys}

    def resolve_df(self, spark: SparkSession) -> DataFrame:
        if isinstance(self.source, DataSource):
            return self.source.to_df(spark)
        return self.source

    def event_ts_col(self) -> str:
        if self.event_timestamp_column:
            return self.event_timestamp_column
        if isinstance(self.source, DataSource) and self.source.event_timestamp_column:
            return self.source.event_timestamp_column
        raise ValueError(f"FeatureView {self.name}: event_timestamp_column required")

    def created_ts_col(self) -> Optional[str]:
        if self.created_timestamp_column:
            return self.created_timestamp_column
        if isinstance(self.source, DataSource):
            return self.source.created_timestamp_column or None
        return None

    def output_name(self, feat: str, full_feature_names: bool) -> str:
        # hive.py:590/:713 — "{fv}__{feature}" when full_feature_names
        return f"{self.name}__{feat}" if full_feature_names else feat


def normalize_timestamps(pdf: pd.DataFrame) -> pd.DataFrame:
    """Normalize tz-aware / mixed-tz pandas timestamp columns to naive
    UTC — the reference's ``_format_datetime`` semantics
    (hive.py:355-360; mixed-flavor fixture feast_tests_funcs.py:15-30).
    Pandas-legal mixed-tz object columns are Spark-hostile, so this is
    applied at the ``createDataFrame`` boundary.
    """
    out = pdf.copy()
    for col in out.columns:
        s = out[col]
        if isinstance(s.dtype, pd.DatetimeTZDtype):
            out[col] = s.dt.tz_convert("UTC").dt.tz_localize(None)
        elif s.dtype == object and s.map(lambda v: isinstance(v, pd.Timestamp)).all() and len(s):
            out[col] = (
                pd.to_datetime(s, utc=True).dt.tz_localize(None)
            )
    return out


def entity_df_to_spark(
    spark: SparkSession, entity_df: Union[DataFrame, pd.DataFrame, str]
) -> DataFrame:
    """Ingest the entity df — replaces the reference's upload operators
    S3/S4 (hive.py:363-460) with native ingestion; SQL strings stay
    fully lazy (no CTAS materialization)."""
    if isinstance(entity_df, DataFrame):
        return entity_df
    if isinstance(entity_df, pd.DataFrame):
        return spark.createDataFrame(normalize_timestamps(entity_df))
    if isinstance(entity_df, str):
        return spark.sql(entity_df)
    raise InvalidEntityType(type(entity_df))


def infer_event_timestamp_col(df: DataFrame, provided: Optional[str] = None) -> str:
    """Reference step 3 (hive.py:214 via feast offline_utils): prefer
    an explicit/'event_timestamp' column, else the unique
    timestamp-typed column."""
    if provided:
        if provided not in df.columns:
            raise EntityDFMissingColumnsError([provided], [provided])
        return provided
    if DEFAULT_ENTITY_DF_EVENT_TIMESTAMP_COL in df.columns:
        return DEFAULT_ENTITY_DF_EVENT_TIMESTAMP_COL
    ts_cols = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType))
    ]
    if len(ts_cols) == 1:
        return ts_cols[0]
    raise EntityTimestampInferenceException()


def _validate_entity_df(
    entity_df: DataFrame, feature_views: Sequence[FeatureView], entity_ts_col: str
) -> None:
    """Reference step 4 (hive.py:218-224): every expected join key +
    the event timestamp column must exist; error parity with
    test_all.py:402-418."""
    expected = {entity_ts_col}
    for fv in feature_views:
        expected.update(fv.key_map().values())
    missing = sorted(expected - set(entity_df.columns))
    if missing:
        raise EntityDFMissingColumnsError(sorted(expected), missing)


# (app_id, analyzed-plan JVM object, bounds Row) — newest last
_BOUNDS_CACHE: list = []
_BOUNDS_CACHE_MAX = 8

# Prepared-retrieval plan cache: (app_id, flags tuple, fv structural
# fingerprints, [entity + per-fv-source analyzed plans], built
# DataFrame, pinned caches) — newest last. See get_historical_features.
_PLAN_CACHE: list = []
_PLAN_CACHE_MAX = 8


def _fv_fingerprint(fv: FeatureView) -> tuple:
    return (
        fv.name,
        tuple(fv.key_map().items()),
        tuple(fv.features),
        fv.ttl_seconds,
        fv.event_ts_col(),
        fv.created_ts_col(),
    )


def _plan_cache_lookup(app_id: str, flags: tuple, fps: tuple, plans: list):
    for aid, cflags, cfps, cplans, df, pinned in reversed(_PLAN_CACHE):
        if (
            aid == app_id
            and cflags == flags
            and cfps == fps
            and all(c.sameResult(p) for c, p in zip(cplans, plans))
        ):
            return df, pinned
    return None


class _EvictOnClose:
    """Rides a RetrievalJob's pinned list: ``close()`` calls
    ``unpersist()`` on every pinned entry, and this one drops the
    prepared-plan cache entry whose caches were just released (a later
    identical retrieval then rebuilds and re-pins instead of returning
    a plan whose caches are gone)."""

    def __init__(self, df) -> None:
        self._df = df

    def unpersist(self) -> None:
        _PLAN_CACHE[:] = [e for e in _PLAN_CACHE if e[4] is not self._df]


def _plan_cache_store(
    app_id: str, flags: tuple, fps: tuple, plans: list, df, pinned: list
) -> None:
    pinned.append(_EvictOnClose(df))
    _PLAN_CACHE[:] = [e for e in _PLAN_CACHE if e[0] == app_id][
        -(_PLAN_CACHE_MAX - 1):
    ]
    _PLAN_CACHE.append((app_id, flags, fps, plans, df, list(pinned)))


def _entity_bounds(spark: SparkSession, sdf: DataFrame, entity_ts_col: str):
    """min/max(entity_ts) + row count in ONE driver job (J2 bounds →
    literal pushdown, fused with the broadcast guard), memoized per
    semantically-identical entity frame within a session.

    A warm retrieval loop re-submits the same entity batch (bench r6:
    the bounds job was ~0.15 s of every PIT rebuild's prepare); the
    memo recognizes it by EXACT canonicalized-plan equality —
    ``analyzed().sameResult(...)``, the identical mechanism Spark's
    own CacheManager trusts for cache substitution, so there is no
    hash-collision risk and LocalRelation data is part of the
    comparison. Bounded LRU of 8 plans; entries from other
    applications are dropped. Like ``spark.catalog.cacheTable``, the
    memo assumes sources are immutable within a session — mutating a
    table mid-session invalidates caches and this memo alike."""
    probe = sdf.select(F.col(entity_ts_col).alias(_ENTITY_TS))
    app_id = spark.sparkContext.applicationId
    plan = probe._jdf.queryExecution().analyzed()
    for aid, cached_plan, row in reversed(_BOUNDS_CACHE):
        if aid == app_id and cached_plan.sameResult(plan):
            return row
    row = probe.agg(
        F.min(_ENTITY_TS).alias("mn"),
        F.max(_ENTITY_TS).alias("mx"),
        F.count(F.lit(1)).alias("cnt"),
    ).first()
    _BOUNDS_CACHE[:] = [e for e in _BOUNDS_CACHE if e[0] == app_id][
        -(_BOUNDS_CACHE_MAX - 1):
    ]
    _BOUNDS_CACHE.append((app_id, plan, row))
    return row


def _estimated_bytes(df: DataFrame) -> int:
    """Catalyst's own size estimate for a plan (driver-side, no job):
    file-relation bytes for scans, materialized storage size for
    cached relations, pass-through for filters/projections without
    CBO column stats — the same statistic autoBroadcastJoinThreshold
    consults."""
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


def get_historical_features(
    spark: SparkSession,
    entity_df: Union[DataFrame, pd.DataFrame, str],
    feature_views: Sequence[FeatureView],
    full_feature_names: bool = False,
    entity_event_timestamp_col: Optional[str] = None,
    broadcast_entities: "bool | str" = "auto",
    tiebreak_columns: Sequence[str] = (),
    use_max_by: bool = True,
    on_demand_transforms=None,
    broadcast_threshold_rows: int = 1_000_000,
    plan_cache: bool = True,
    shuffle_small_features_bytes: int = 64 << 20,
) -> RetrievalJob:
    """Build the lazy multi-feature-view PIT retrieval job
    (reference entry point 1, hive.py:192-269).

    ``tiebreak_columns``: extra descending-order columns applied after
    (event_ts, created_ts) in each feature view's window, making row
    choice deterministic under full timestamp ties (the reference fans
    tied rows out through an inner join, hive.py:685-696 — a bug-shaped
    behavior we deliberately do not reproduce; see SURVEY §7 risks).

    ``broadcast_entities``: ``"auto"`` (default) broadcasts the entity
    join side only while the entity row count stays under
    ``broadcast_threshold_rows`` — the count is one cheap job against
    the already-cached entity df, and the guardrail means a huge
    entity df cannot OOM every executor by default; beyond it, AQE
    picks sort-merge with the range filter applied post-join.
    ``True``/``False`` force either physical path (both oracle-
    verified to agree).

    ``shuffle_small_features_bytes`` (r10): the second arm of the
    "auto" policy. Forcing the entity-side broadcasts is the 100 TB
    shape (the feature table — the big side — streams through the
    joins with ZERO shuffle), but every broadcast exchange is a
    separate driver-collect job on EVERY execution of the plan, and
    when the feature side is itself small that per-exec job floor
    costs more than the shuffle the broadcast avoids (measured at
    sf0.1: flagship exec 0.195 s / 3 jobs forced-broadcast vs
    0.109 s / 2 jobs unhinted — the broadcast builds were pure
    scheduler floor). So under "auto", when EVERY feature view's
    bounds-filtered, column-pruned side is estimated below this
    threshold (Catalyst's own sizeInBytes statistic — no job), the
    explicit broadcast hints are dropped and Catalyst plans the joins
    freely, exactly as it would any similarly-sized query (it may
    still auto-broadcast sides under its own threshold). At cluster
    scale a real feature table blows past 64 MB and the forced-
    broadcast path is untouched. ``0`` disables the check (always
    follow the row-count guard alone); explicit ``True``/``False``
    bypass it entirely.
    """
    sdf = entity_df_to_spark(spark, entity_df)
    entity_ts_col = infer_event_timestamp_col(sdf, entity_event_timestamp_col)
    _validate_entity_df(sdf, feature_views, entity_ts_col)
    # caches build() pins, surfaced through RetrievalJob.close() so a
    # long-lived session can return storage memory to baseline
    pinned: list[DataFrame] = []

    def build() -> DataFrame:
        # Prepared-retrieval cache (the plan-level analogue of a
        # prepared statement): a warm serving loop re-issues the same
        # retrieval shape against the same sources, and the JVM-side
        # analysis of the multi-join plan (~0.15 s/build measured at
        # r6) is pure repeated work. Key = structural fv spec + flags
        # + EXACT canonicalized-plan equality (``sameResult``) of the
        # entity df and every fv source — the same mechanism and the
        # same immutable-sources-within-a-session assumption as
        # ``spark.catalog.cacheTable``. ``RetrievalJob.close()``
        # evicts the entry alongside unpersisting its pinned caches.
        # Caveat (shared with every cached Dataset): the returned
        # plan's PHYSICAL compilation is frozen, so session-conf
        # changes between identical retrievals don't re-plan it —
        # pass ``plan_cache=False`` when toggling optimizer confs.
        app_id = spark.sparkContext.applicationId
        flags = (
            bool(full_feature_names),
            broadcast_entities
            if isinstance(broadcast_entities, str)
            else bool(broadcast_entities),
            tuple(tiebreak_columns),
            bool(use_max_by),
            int(broadcast_threshold_rows),
            int(shuffle_small_features_bytes),
        )
        fps = tuple(_fv_fingerprint(fv) for fv in feature_views)
        plans = [sdf._jdf.queryExecution().analyzed()]
        for fv in feature_views:
            plans.append(
                fv.resolve_df(spark)._jdf.queryExecution().analyzed()
            )
        hit = (
            _plan_cache_lookup(app_id, flags, fps, plans)
            if plan_cache
            else None
        )
        if hit is not None:
            df, cached_pinned = hit
            pinned.extend(cached_pinned)
            return df

        ent = sdf.withColumn(_ENTITY_TS, F.col(entity_ts_col))
        # Entity df is read >= 3x (bounds, per-fv join sides, final
        # assembly) — cache it (replaces the reference's in-memory temp
        # table, hive.py:532/:253).
        ent = ent.cache()
        pinned.append(ent)

        # J2 kept manual: one tiny job for global bounds -> literal
        # pushdown filters on every feature scan.  The broadcast-guard
        # row count rides the SAME aggregate — one driver-blocking job
        # here, not three.  Probe the PRE-cache pruned projection, not
        # the cached ent: aggregating the cache would materialize every
        # entity column right here at plan-construction time, while the
        # single-column probe is a column-pruned scan (r5 verdict #1:
        # this job is per-retrieval cost in real use — at 100 TB the
        # pruned scan reads one column's pages, the cache build reads
        # them all).  The cache itself materializes during the first
        # execution, which reads it >= 3x and would build it anyway.
        bounds = _entity_bounds(spark, sdf, entity_ts_col)
        parts = [
            _prepare_fv(
                fv, spark, bounds, full_feature_names, tiebreak_columns
            )
            for fv in feature_views
        ]
        if broadcast_entities == "auto":
            do_broadcast = bounds["cnt"] <= broadcast_threshold_rows
            # Second arm (r10, see docstring): when every feature side
            # is small by Catalyst's own estimate, the per-execution
            # broadcast-build jobs cost more than the shuffle they
            # avoid — drop the hints and let Catalyst plan freely.
            if do_broadcast and shuffle_small_features_bytes and parts:
                try:
                    if all(
                        _estimated_bytes(p.feat)
                        < shuffle_small_features_bytes
                        for p in parts
                    ):
                        do_broadcast = False
                except Exception:
                    pass  # stats unavailable: keep the broadcast path
        else:
            do_broadcast = bool(broadcast_entities)
        result = ent

        # A1 hoisted: build the deduped entity-key side ONCE per
        # distinct join-key tuple. Catalyst's exchange reuse does not
        # fire across the per-view branches (fresh expr IDs per
        # resolve defeat the canonical match), so without this a
        # multi-view retrieval re-runs the same dedup shuffle +
        # broadcast build per view; a shared cached DataFrame makes
        # the second and later views read the materialized keys.
        tuples: dict[tuple, int] = {}
        for fv in feature_views:
            t = tuple(fv.key_map().values())
            tuples[t] = tuples.get(t, 0) + 1
        ekeys_by_tuple: dict[tuple, DataFrame] = {}
        for t, uses in tuples.items():
            ek = ent.select(*t, _ENTITY_TS).dropDuplicates()
            # cache even single-use key sets (r6): the deduped keys are
            # read once per EXECUTION, and without the cache every
            # re-execution of the retrieval replays the dedup exchange
            # + broadcast build. Bounded by the deduped entity-key
            # count (the broadcast guard's own bound) and released by
            # RetrievalJob.close() like every plan-pinned cache.
            ek = ek.cache()
            pinned.append(ek)
            ekeys_by_tuple[t] = ek

        # SQL-path eligibility (r10, ADVICE r9#3): the one-statement
        # assembly references accumulated columns as qualified
        # ``a.`col``` at every nesting level, so any duplicate in the
        # would-be output (two views emitting the same feature name
        # under full_feature_names=False, or a feature shadowing an
        # entity column) fails analysis with AMBIGUOUS_REFERENCE at
        # the NEXT level. The DataFrame chain carries duplicate
        # columns through silently (positional resolution), matching
        # the pre-r9 behavior — route collisions there.
        all_out = [n for p in parts for n in p.out_names]
        final_cols = list(ent.columns) + all_out
        sql_safe = len(final_cols) == len(set(final_cols))
        if use_max_by and parts and all(p.fast for p in parts) and sql_safe:
            # All views take the default keyed-max_by shape: assemble
            # the WHOLE retrieval as one spark.sql statement (one
            # parse + one analysis pass; the per-view loop below pays
            # both per view).
            result = _join_fvs_sql(
                spark,
                ent,
                parts,
                [
                    ekeys_by_tuple[tuple(fv.key_map().values())]
                    for fv in feature_views
                ],
                do_broadcast,
            )
        else:
            for fv, part in zip(feature_views, parts):
                result = _join_feature_view(
                    result,
                    ent,
                    fv,
                    spark,
                    bounds,
                    full_feature_names,
                    do_broadcast,
                    tiebreak_columns,
                    use_max_by,
                    ekeys=ekeys_by_tuple[tuple(fv.key_map().values())],
                    part=part,
                    force_chain=not sql_safe,
                )
        # P4: drop internal columns (the reference's regex column
        # exclusion, hive.py:706) — everything else (incl. passthrough
        # entity columns) survives.
        result = result.drop(_ENTITY_TS)
        if plan_cache:
            _plan_cache_store(app_id, flags, fps, plans, result, pinned)
        return result

    return RetrievalJob(
        build, on_demand_transforms=on_demand_transforms, pinned=pinned
    )


@dataclass
class _FvPart:
    """Per-feature-view prepared inputs for the join step: the
    projected+bounds-filtered feature frame plus the SQL fragments the
    fast path assembles. ``fast`` marks default-shape eligibility
    (keyed fv with features under the max_by strategy)."""

    feat: DataFrame
    entity_cols: list
    out_names: list
    created_ts: Optional[str]
    tiebreaks: list
    range_cond: str
    fast: bool


def _prepare_fv(
    fv: FeatureView,
    spark: SparkSession,
    bounds,
    full_feature_names: bool,
    tiebreak_columns: Sequence[str],
) -> _FvPart:
    key_map = fv.key_map()  # feature col -> entity col
    entity_cols = list(key_map.values())
    event_ts = fv.event_ts_col()
    created_ts = fv.created_ts_col()

    feat = fv.resolve_df(spark)
    # Subquery projection (hive.py:584-591): event/created ts under
    # internal names, join keys renamed to entity-side names, features
    # under their output names. Pure projection — column pruning
    # reaches the scan. ONE selectExpr call: plan CONSTRUCTION here is
    # dominated by py4j round-trips (~0.4 ms each; a Column-API
    # projection costs one per col/alias, ~190 per feature view
    # profiled at r6), and a warm retrieval loop pays it per call.
    sel = [f"{_bt(event_ts)} AS {_EVENT_TS}"]
    if created_ts:
        sel.append(f"{_bt(created_ts)} AS {_CREATED_TS}")
    for fcol, ecol in key_map.items():
        sel.append(f"{_bt(fcol)} AS {_bt(ecol)}")
    out_names = []
    for feat_name in fv.features:
        out = fv.output_name(feat_name, full_feature_names)
        out_names.append(out)
        sel.append(f"{_bt(feat_name)} AS {_bt(out)}")
    sel.extend(_bt(c) for c in tiebreak_columns if c in feat.columns)
    feat = feat.selectExpr(*sel)

    # J2: literal coarse bounds — ttl==0 -> upper bound only
    # (hive.py:594-605). Timestamps stay F.lit (NOT SQL-string
    # literals): a TIMESTAMP'...' literal parses in the SESSION tz
    # while the Row->datetime->lit roundtrip uses the OS tz on both
    # legs, so only the latter is exact when session tz != OS tz —
    # and a shifted COARSE bound would wrongly exclude matching rows.
    if bounds is not None and bounds["mx"] is not None:
        cond = F.col(_EVENT_TS) <= F.lit(bounds["mx"])
        if fv.ttl_seconds:
            lower = bounds["mn"] - timedelta(seconds=fv.ttl_seconds)
            cond = cond & (F.col(_EVENT_TS) >= F.lit(lower))
        feat = feat.filter(cond)

    range_cond = f"{_EVENT_TS} <= {_ENTITY_TS}"
    if fv.ttl_seconds:
        # micros arithmetic, not `ts - INTERVAL n SECOND`: timestamp -
        # CalendarInterval routes through non-codegen datetime logic
        # and measurably dominates the whole join stage (~2x on the
        # flagship bench query); long compares are exact to the micro
        # and stay inside whole-stage codegen
        range_cond += (
            f" AND unix_micros({_EVENT_TS}) >= "
            f"unix_micros({_ENTITY_TS}) - {fv.ttl_seconds * 1_000_000}"
        )

    return _FvPart(
        feat=feat,
        entity_cols=entity_cols,
        out_names=out_names,
        created_ts=created_ts,
        tiebreaks=[c for c in tiebreak_columns if c in feat.columns],
        range_cond=range_cond,
        fast=bool(entity_cols and out_names),
    )


def _join_feature_view(
    acc: DataFrame,
    ent: DataFrame,
    fv: FeatureView,
    spark: SparkSession,
    bounds,
    full_feature_names: bool,
    broadcast_entities: bool,
    tiebreak_columns: Sequence[str],
    use_max_by: bool = True,
    ekeys: Optional[DataFrame] = None,
    part: Optional[_FvPart] = None,
    force_chain: bool = False,
) -> DataFrame:
    if part is None:
        part = _prepare_fv(
            fv, spark, bounds, full_feature_names, tiebreak_columns
        )
    feat = part.feat
    entity_cols = part.entity_cols
    out_names = part.out_names
    created_ts = part.created_ts
    range_cond = part.range_cond

    # A1: dedup entity join side (shared across views via the caller's
    # per-key-tuple cache; rebuilt here only for direct callers).
    if ekeys is None:
        ekeys = ent.select(*entity_cols, _ENTITY_TS).dropDuplicates()

    if use_max_by and part.fast and not force_chain:
        # Fast path for the default shape (keyed fv with features,
        # max_by strategy): J3+J4/J5+J6 as ONE ``spark.sql`` statement.
        # The step-by-step chain below costs ~6 eagerly-analyzed
        # Dataset creations per feature view (~60 ms/view of py4j +
        # repeated analysis, profiled at r8); the parsed text is one
        # round trip + one analysis pass and produces the identical
        # logical plan (broadcast hints stand in for the F.broadcast
        # wrappers; the stable temp views keep the cached ekeys/entity
        # plans, so cache reuse is unchanged).
        return _join_fvs_sql(
            spark, acc, [part], [ekeys], broadcast_entities
        )

    if broadcast_entities:
        ekeys = F.broadcast(ekeys)

    # J3: equi join on keys (entity-less fv -> cross of the deduped
    # timestamps, matching the rid=cast(entity_ts) semantics of
    # hive.py:543-544) + range predicate.
    if entity_cols:
        joined = feat.join(ekeys, on=entity_cols, how="inner")
    else:
        joined = feat.crossJoin(ekeys)
    joined = joined.filter(range_cond)

    # W1 replaces J4/J5/A3/A4. Two equivalent physical strategies:
    #
    # max_by (default): argmax of the feature struct over the
    # (event_ts, created_ts, tiebreaks) ordering key as a hash
    # aggregate. Partial aggregation runs map-side, so a whale entity
    # key (one key matching millions of feature rows) reduces to one
    # row per partition BEFORE the shuffle — skew-immune at 100 TB.
    #
    # row_number window: same result; Spark's WindowGroupLimit rewrite
    # inserts a partial top-1 BEFORE the shuffle too (load-verified in
    # test_pit_skew.py), so on this engine version both strategies are
    # skew-immune; on engines without the rewrite the window path ships
    # every hot-key row through one shuffle partition (the negative-
    # control test demonstrates it by disabling the rewrite). Kept
    # selectable for comparison/debugging.
    # ordering keys as micros longs, not raw timestamps: the max_by /
    # row_number comparator runs per joined row, and long compares
    # codegen tighter than timestamp ones (measured on the flagship
    # bench query); unix_micros is a monotone transform, so the argmax
    # and NULL placement are unchanged
    ord_sql = [f"unix_micros({_EVENT_TS})"]
    if created_ts:
        ord_sql.append(f"unix_micros({_CREATED_TS})")
    ord_sql.extend(_bt(c) for c in tiebreak_columns if c in joined.columns)
    ord_key = "struct(" + ", ".join(ord_sql) + ")"
    if use_max_by:
        if out_names:
            payload = "struct(" + ", ".join(_bt(n) for n in out_names) + ")"
            agg = F.expr(f"max_by({payload}, {ord_key})").alias("__best")
        else:
            agg = F.expr("count(1)").alias("__n")
        latest = joined.groupBy(*entity_cols, _ENTITY_TS).agg(agg)
        if out_names:
            latest = latest.selectExpr(
                *[_bt(c) for c in entity_cols],
                _ENTITY_TS,
                *[f"__best.{_bt(n)} AS {_bt(n)}" for n in out_names],
            )
        else:
            latest = latest.select(*entity_cols, _ENTITY_TS)
    else:
        w = Window.partitionBy(*entity_cols, _ENTITY_TS).orderBy(
            *[F.expr(c).desc() for c in ord_sql]
        )
        latest = (
            joined.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(*entity_cols, _ENTITY_TS, *out_names)
        )

    # J6: left join assembly on the raw key tuple; NULL features for
    # unmatched entity rows, duplicate entity rows preserved. The fv
    # result is bounded by the deduped entity-key count, so when the
    # entity side is broadcastable the assembly side is too — skipping
    # the sort-merge exchange on the (possibly large) entity df.
    if broadcast_entities:
        latest = F.broadcast(latest)
    return acc.join(latest, on=[*entity_cols, _ENTITY_TS], how="left")


def _join_fvs_sql(
    spark: SparkSession,
    acc: DataFrame,
    parts: Sequence[_FvPart],
    ekeys_list: Sequence[DataFrame],
    broadcast_entities: bool,
) -> DataFrame:
    """J3+W1+J6 for one or more default-shape (keyed max_by) feature
    views, assembled as ONE ``spark.sql`` statement — the per-level
    subquery nests where the step-by-step chain accumulated
    DataFrames, so an n-view retrieval pays ONE parse + ONE analysis
    pass instead of n (r9: pit_multi_feature_view cold build −1 sql
    −2 temp views vs the r8 per-view statements). Semantically
    identical to the chain: same equi join on the deduped entity
    keys, same range predicate, same ``max_by(struct(features),
    struct(ordering))`` argmax, same USING-style left assembly with
    join keys leading the schema at every level — the old
    ``acc.join(latest, on=[...])`` also emitted
    ``[keys, _ENTITY_TS, acc-rest, features]``.

    Manual reused view names instead of spark.sql's {df} placeholders,
    for two measured reasons: the placeholder formatter creates AND
    drops a uniquely-named temp view per DataFrame argument (6 catalog
    round trips/build for a 2-view retrieval — half the SQL-path cost
    profiled at r8), and a placeholder-resolved plan no longer
    sameResult-matches cached tables, silently disabling
    CacheManager substitution (measured at r9 on tfidf — stable
    createOrReplaceTempView names keep cache reuse intact). The
    overwrite+sql window is guarded by a module lock so two
    concurrent plan builds on one session cannot interleave view
    bindings; the ``__pit_sql_*`` names are engine-reserved (a user
    temp view with one of these names is overwritten by plan
    construction), and the returned plan resolved the views at
    analysis time, so later overwrites cannot reach it."""
    latest_hint = "/*+ BROADCAST(latest) */ " if broadcast_entities else ""
    ek_hint = "/*+ BROADCAST(ek) */ " if broadcast_entities else ""
    acc_cols = list(acc.columns)
    # dedupe shared ekeys frames (multi-view retrievals share the
    # per-key-tuple cached dedup) so each registers exactly once
    ek_views: dict[int, str] = {}
    with _SQL_VIEW_LOCK:
        # bind_sql_view: stable engine-reserved names under classic
        # py4j (eager analysis; cache substitution intact), UNIQUE
        # per-build names under Spark Connect, where lazy spark.sql
        # would let a later rebind silently redirect this plan
        # (r9 ADVICE).
        acc_sql = bind_sql_view(acc, "__pit_sql_acc")
        for idx, (part, ekeys) in enumerate(zip(parts, ekeys_list)):
            fview = bind_sql_view(part.feat, f"__pit_sql_f{idx}")
            ekv = ek_views.get(id(ekeys))
            if ekv is None:
                ekv = bind_sql_view(ekeys, f"__pit_sql_ek{len(ek_views)}")
                ek_views[id(ekeys)] = ekv
            keys_sql = ", ".join(_bt(c) for c in part.entity_cols)
            ord_sql = [f"unix_micros({_EVENT_TS})"]
            if part.created_ts:
                ord_sql.append(f"unix_micros({_CREATED_TS})")
            ord_sql.extend(_bt(c) for c in part.tiebreaks)
            ord_key = "struct(" + ", ".join(ord_sql) + ")"
            payload = (
                "struct(" + ", ".join(_bt(n) for n in part.out_names) + ")"
            )
            best = ", ".join(
                f"__best.{_bt(n)} AS {_bt(n)}" for n in part.out_names
            )
            feats = ", ".join(f"latest.{_bt(n)}" for n in part.out_names)
            acc_rest = [
                f"a.{_bt(c)}"
                for c in acc_cols
                if c not in part.entity_cols and c != _ENTITY_TS
            ]
            proj = ", ".join([keys_sql, _ENTITY_TS, *acc_rest, feats])
            acc_sql = f"""
            SELECT {latest_hint}{proj}
            FROM {acc_sql} a
            LEFT JOIN (
              SELECT {keys_sql}, {_ENTITY_TS}, {best}
              FROM (
                SELECT {ek_hint}{keys_sql}, {_ENTITY_TS},
                       max_by({payload}, {ord_key}) AS __best
                FROM {fview} f
                JOIN {ekv} ek USING ({keys_sql})
                WHERE {part.range_cond}
                GROUP BY {keys_sql}, {_ENTITY_TS}
              )
            ) latest
            USING ({keys_sql}, {_ENTITY_TS})
            """
            if idx + 1 < len(parts):
                acc_sql = f"({acc_sql})"
            # track the accumulated schema without a py4j round trip:
            # the USING join emits [keys, ts, acc-rest, features]
            acc_cols = (
                list(part.entity_cols)
                + [_ENTITY_TS]
                + [
                    c
                    for c in acc_cols
                    if c not in part.entity_cols and c != _ENTITY_TS
                ]
                + list(part.out_names)
            )
        return spark.sql(acc_sql)
