"""Forward as-of join and incremental-materialization delta plans —
the two temporal complements of the flagship backward PIT join
(plans/pit.py).

- ``asof_forward_join``: for each probe row, the FIRST source row at
  or after the probe time (pandas ``merge_asof(direction='forward')``
  semantics, unbounded horizon). Implemented as a union + one keyed
  window with a forward IGNORE NULLS ``first_value`` — ONE shuffle on
  the key, no range join, no per-probe scan, which is the shape that
  survives 100 TB: the window frame never materializes, Spark streams
  it per key partition.
- ``materialize_delta``: the rows whose latest-per-key value CHANGED
  between two snapshot cutoffs — exactly what an incremental online-
  store materialization ships (the reference's
  ``materialize_incremental`` consumer path, hive.py:143-190 feeding
  Feast's incremental loop). Both snapshots use the skew-immune
  ``max_by(struct)`` selection; the diff is one per-key join of two
  1-row-per-key aggregates.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_forward_join(
    probes: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    probe_ts_col: str,
    event_ts_col: str,
    value_cols: Sequence[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Attach to each probe the first source row with
    ``event_ts >= probe_ts`` for the same key (NULLs when no future
    row exists). Returns ``keys + probe_ts + next_ts + next_<value>``.

    Rows from both sides union into one stream ordered by
    ``(ts, is_event, tiebreak)`` — probes sort BEFORE events at the
    same timestamp so an exactly-coincident event still matches; the
    tiebreak column (COALESCEd to -1 on probe rows, mirroring the SQL
    twin, since ASC NULL placement differs between engines) makes the
    frame order total, so ties are deterministic cross-engine."""
    keys = list(keys)
    ev = source.select(
        *keys,
        F.col(event_ts_col).alias("__ts"),
        *[F.col(v) for v in value_cols],
        F.lit(1).alias("__is_event"),
        *(
            [F.col(tiebreak_col).alias("__tb")]
            if tiebreak_col
            else [F.lit(0).alias("__tb")]
        ),
    )
    pr = probes.select(
        *keys,
        F.col(probe_ts_col).alias("__ts"),
        F.lit(0).alias("__is_event"),
        F.lit(-1).alias("__tb"),
    )
    unioned = pr.unionByName(ev, allowMissingColumns=True)
    w = (
        Window.partitionBy(*keys)
        .orderBy(
            F.col("__ts").asc(),
            F.col("__is_event").asc(),
            F.col("__tb").asc(),
        )
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    is_ev = F.col("__is_event") == 1
    picked = [
        F.first(F.when(is_ev, F.col("__ts")), ignorenulls=True)
        .over(w)
        .alias("next_ts")
    ] + [
        F.first(F.when(is_ev, F.col(v)), ignorenulls=True)
        .over(w)
        .alias(f"next_{v}")
        for v in value_cols
    ]
    return (
        unioned.select(*keys, "__ts", "__is_event", *picked)
        .filter(F.col("__is_event") == 0)
        .select(
            *keys,
            F.col("__ts").alias("probe_ts"),
            "next_ts",
            *[f"next_{v}" for v in value_cols],
        )
    )


def asof_nearest_join(
    probes: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    probe_ts_col: str,
    event_ts_col: str,
    value_cols: Sequence[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Attach to each probe the source row whose timestamp is NEAREST
    in absolute time (pandas ``merge_asof(direction='nearest')``
    semantics; backward wins exact ties in distance).  Both candidate
    directions come from the SAME unioned stream and the SAME key
    partitioning — one shuffle total: a backward ``last_value IGNORE
    NULLS`` and a forward ``first_value IGNORE NULLS`` window over one
    sort, then a codegen pick of the closer side.

    Row-consistent values: each direction resolves ONE packed struct
    ``(ts, value_cols...)`` — the event struct is never NULL even when
    individual value columns are, so all ``nearest_<value>`` outputs
    come from the SAME source row as ``nearest_ts`` (a NULL in the
    nearest row stays NULL, exactly as ``merge_asof`` attaches it).
    Resolving each value column with its own IGNORE-NULLS window would
    instead stitch older rows' values under the nearest row's
    timestamp.

    Returns ``keys + probe_ts + nearest_ts + nearest_<value>``."""
    keys = list(keys)
    ev = source.select(
        *keys,
        F.col(event_ts_col).alias("__ts"),
        *[F.col(v) for v in value_cols],
        F.lit(1).alias("__is_event"),
        *(
            [F.col(tiebreak_col).alias("__tb")]
            if tiebreak_col
            else [F.lit(0).alias("__tb")]
        ),
    )
    pr = probes.select(
        *keys,
        F.col(probe_ts_col).alias("__ts"),
        F.lit(0).alias("__is_event"),
        F.lit(-1).alias("__tb"),
    )
    unioned = pr.unionByName(ev, allowMissingColumns=True)
    order = [
        F.col("__ts").asc(),
        F.col("__is_event").asc(),
        F.col("__tb").asc(),
    ]
    wb = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    is_ev = F.col("__is_event") == 1
    packed = F.struct(
        F.col("__ts").alias("ts"),
        *[F.col(v).alias(v) for v in value_cols],
    )
    stream = (
        unioned.select(
            *keys,
            "__ts",
            "__is_event",
            F.last(F.when(is_ev, packed), ignorenulls=True)
            .over(wb)
            .alias("__bk"),
            F.first(F.when(is_ev, packed), ignorenulls=True)
            .over(wf)
            .alias("__fw"),
        )
        .filter(F.col("__is_event") == 0)
    )
    # closer side wins; backward wins exact ties; a NULL side loses
    # double-epoch distances keep sub-second precision (DuckDB's
    # epoch() matches Spark's double cast, fraction included)
    bk_ts = F.col("__bk.ts")
    fw_ts = F.col("__fw.ts")
    bk_d = F.col("__ts").cast("double") - bk_ts.cast("double")
    fw_d = fw_ts.cast("double") - F.col("__ts").cast("double")
    use_bk = fw_ts.isNull() | (bk_ts.isNotNull() & (bk_d <= fw_d))
    pick = F.when(use_bk, F.col("__bk")).otherwise(F.col("__fw"))
    return stream.select(
        *keys,
        F.col("__ts").alias("probe_ts"),
        pick["ts"].alias("nearest_ts"),
        *[pick[v].alias(f"nearest_{v}") for v in value_cols],
    )


def scd2_build(
    changes: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Build a type-2 slowly-changing dimension from a change-event
    stream: collapse consecutive rows whose tracked attributes did not
    change, then assign each surviving version its validity interval.
    Output: ``keys + attr_cols + valid_from + valid_to + is_current``
    (``valid_to`` NULL on the open current version) — the standard
    warehouse dimension-history shape the reference's Hive users build
    with HiveQL windows.

    Plan shape: ONE shuffle on the key. Change detection is a ``lag``
    over (key, ts[, tiebreak]); the post-filter ``lead`` for
    ``valid_to`` runs over the SAME partitioning, which the filter
    preserves, so Catalyst plans a single Exchange feeding both
    windows (asserted in the plan audit).

    NULL caveat: a NULL attribute compares as "no change" (struct
    inequality is NULL-propagating, same as SQL ``<>``) — use sentinel
    values if NULL-to-value transitions must open a new version."""
    keys = list(keys)
    attr_cols = list(attr_cols)
    order = [F.col(ts_col).asc()] + (
        [F.col(tiebreak_col).asc()] if tiebreak_col else []
    )
    w = Window.partitionBy(*keys).orderBy(*order)
    attrs = F.struct(*[F.col(a) for a in attr_cols])
    changed = (
        changes.withColumn("__prev", F.lag(attrs).over(w))
        .filter(F.col("__prev").isNull() | (F.col("__prev") != attrs))
        .drop("__prev")
    )
    return changed.select(
        *keys,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(F.col(ts_col)).over(w).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())


def apply_cdc(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    op_col: str,
    value_cols: Sequence[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """MERGE-INTO semantics as one plan: apply a CDC change stream
    (``op_col`` in {'upsert','delete'}) to a snapshot and return the
    resulting latest state per key.  Snapshot rows participate as
    upserts that sort BEFORE any change at the same timestamp, the
    per-key winner is picked with the same skew-immune
    ``max_by(struct)`` aggregate as the PIT join (one shuffle on the
    key, whale keys collapse map-side), and keys whose winner is a
    delete drop out.  This is what a batch CDC compaction job (Hudi/
    Delta-style) does each cycle, expressed engine-natively.

    Output: ``keys + value_cols + ts_col`` for live keys only."""
    keys = list(keys)
    value_cols = list(value_cols)
    snap = snapshot.select(
        *keys,
        F.col(ts_col).alias("__ts"),
        F.lit("upsert").alias("__op"),
        *[F.col(v) for v in value_cols],
        F.lit(-1).cast("long").alias("__tb"),
        F.lit(0).alias("__src"),
    )
    chg = changes.select(
        *keys,
        F.col(ts_col).alias("__ts"),
        F.col(op_col).alias("__op"),
        *[F.col(v) for v in value_cols],
        (
            F.col(tiebreak_col).cast("long")
            if tiebreak_col
            else F.lit(0).cast("long")
        ).alias("__tb"),
        F.lit(1).alias("__src"),
    )
    unioned = snap.unionByName(chg)
    payload = F.struct(
        F.col("__op"), F.col("__ts"), *[F.col(v) for v in value_cols]
    )
    order = F.struct(F.col("__ts"), F.col("__src"), F.col("__tb"))
    latest = unioned.groupBy(*keys).agg(
        F.max_by(payload, order).alias("__w")
    )
    return (
        latest.filter(F.col("__w.__op") != "delete")
        .select(
            *keys,
            *[F.col(f"__w.{v}").alias(v) for v in value_cols],
            F.col("__w.__ts").alias(ts_col),
        )
    )


def materialize_delta(
    source: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    id_col: str,
    value_col: str,
    cutoff_old,
    cutoff_new,
) -> DataFrame:
    """Incremental materialization delta: keys whose latest row (by
    ``(ts, id)``) changed between ``ts < cutoff_old`` and
    ``ts < cutoff_new``. Returns
    ``keys + change_type('new'|'updated') + old_id + new_id + new_value``.

    Each snapshot is one ``max_by(struct(values), struct(ts, id))``
    aggregate — partial aggregation collapses hot keys map-side, the
    same skew-immune selection as the PIT join — and the diff is a
    per-key left join of two key-cardinality tables."""
    keys = list(keys)

    def latest(df: DataFrame, prefix: str) -> DataFrame:
        picked = F.max_by(
            F.struct(F.col(id_col).alias("id"), F.col(value_col).alias("val")),
            F.struct(F.col(ts_col), F.col(id_col)),
        )
        return df.groupBy(*keys).agg(
            picked.getField("id").alias(f"{prefix}_id"),
            picked.getField("val").alias(f"{prefix}_value"),
        )

    old = latest(source.filter(F.col(ts_col) < F.lit(cutoff_old)), "old")
    new = latest(source.filter(F.col(ts_col) < F.lit(cutoff_new)), "new")
    return (
        new.join(old, keys, "left")
        .filter(
            F.col("old_id").isNull() | (F.col("old_id") != F.col("new_id"))
        )
        .select(
            *keys,
            F.when(F.col("old_id").isNull(), F.lit("new"))
            .otherwise(F.lit("updated"))
            .alias("change_type"),
            "old_id",
            F.col("new_id"),
            "new_value",
        )
    )


def bitemporal_asof_join(
    probes: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    probe_id_col: str,
    probe_ts_col: str,
    knowledge_ts_col: str,
    event_ts_col: str,
    created_ts_col: str,
    value_cols: Sequence[str],
    ttl_seconds: int = 0,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Bitemporal as-of join: for each probe row, the feature version
    that was VALID as of ``probe_ts`` (``event_ts <= probe_ts``, the
    flagship PIT axis) AND KNOWN as of ``knowledge_ts``
    (``created_ts <= knowledge_ts``, the transaction-time axis).
    This answers the backfill-reproducibility question the flagship
    PIT join cannot: "what would the serving system have returned had
    I run this retrieval at time K?" — late-arriving feature rows
    (created after K) are invisible even when their event time
    qualifies, so a training set built today for last month's labels
    matches what the model actually saw. The reference has no
    transaction-time axis at all (its created_timestamp is a dedup
    tiebreak only, feast_hive/hive.py:645-654); this is the
    beyond-reference completion of that column into a real bitemporal
    model (Snodgrass, TSQL2; SQL:2011 system-versioned tables).

    Selection among visible versions mirrors the flagship: argmax by
    ``(event_ts, created_ts, tiebreak)`` via ONE skew-immune
    ``max_by(struct)`` aggregate — no window over the join product.
    Shape: equi join on ``keys`` with both time predicates attached
    (they ride the join as pushed range conditions), then a grouped
    argmax keyed by probe id; with ``ttl_seconds > 0`` the
    ``event_ts >= probe_ts - ttl`` bound additionally prunes the
    scan. Probes with no visible version keep NULLs (left
    semantics). Output: probe columns + ``value_cols`` +
    ``served_event_ts`` + ``served_created_ts``."""
    keys = list(keys)
    pr = probes.select(
        F.col(probe_id_col).alias("__pid"),
        *keys,
        F.col(probe_ts_col).alias("__pts"),
        F.col(knowledge_ts_col).alias("__kts"),
    )
    # source-side keys get unique internal names: probes and source
    # typically derive from the same base scan (events vs events), and
    # same-name df["col"] references across a self-join are the
    # classic ambiguous-lineage trap
    sc = source.select(
        *[F.col(k).alias(f"__sk_{n}") for n, k in enumerate(keys)],
        F.col(event_ts_col).alias("__ets"),
        F.col(created_ts_col).alias("__cts"),
        *[F.col(v) for v in value_cols],
        *(
            [F.col(tiebreak_col).alias("__tb")]
            if tiebreak_col
            else [F.lit(0).alias("__tb")]
        ),
    )
    cond = (F.col("__ets") <= F.col("__pts")) & (
        F.col("__cts") <= F.col("__kts")
    )
    if ttl_seconds > 0:
        cond = cond & (
            F.col("__ets")
            >= F.col("__pts") - F.expr(f"INTERVAL {int(ttl_seconds)} SECOND")
        )
    on = cond
    for n, k in enumerate(keys):
        on = (F.col(k) == F.col(f"__sk_{n}")) & on
    j = pr.join(sc, on=on, how="inner")
    # positional field aliases inside the struct: a value column
    # legally named "ets"/"cts" (or colliding with another value
    # name) must not shadow the reserved timestamp fields
    # (r13 review finding)
    picked = F.max_by(
        F.struct(
            F.col("__ets").alias("__e"),
            F.col("__cts").alias("__c"),
            *[
                F.col(v).alias(f"__v{n}")
                for n, v in enumerate(value_cols)
            ],
        ),
        F.struct(F.col("__ets"), F.col("__cts"), F.col("__tb")),
    )
    matched = j.groupBy("__pid").agg(picked.alias("__m"))
    out = pr.join(matched, "__pid", "left").select(
        F.col("__pid").alias(probe_id_col),
        *keys,
        F.col("__pts").alias(probe_ts_col),
        F.col("__kts").alias(knowledge_ts_col),
        *[
            F.col("__m").getField(f"__v{n}").alias(v)
            for n, v in enumerate(value_cols)
        ],
        F.col("__m").getField("__e").alias("served_event_ts"),
        F.col("__m").getField("__c").alias("served_created_ts"),
    )
    return out
