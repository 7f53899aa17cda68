"""Event-sequence training-data prep: per-entity ordered histories
and skip-gram co-occurrence pairs (the item2vec / behavior-model
input shapes).

Both operators use the collect-ordered-array shape: ONE shuffle on
the entity key brings a user's events together, ordering is imposed
by ``array_sort`` over a (ts, tiebreak, payload) struct (deterministic
under equal timestamps), and all pair/sequence generation happens in
JVM higher-order functions — no self-join (the naive skip-gram plan
joins the event table to itself on the user key: two shuffles and a
position range filter; this is one shuffle and codegen).

Per-group state is the user's own history — bounded by the longest
single history, the same envelope any sequence-model featurizer
needs."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _ordered_seq(
    df: DataFrame, key_col: str, ts_col: str, item_col: str, tiebreak_col: str
):
    """Grouped, (ts, tiebreak)-ordered array of items per key."""
    packed = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(ts_col).alias("t"),
                F.col(tiebreak_col).alias("tb"),
                F.col(item_col).alias("it"),
            )
        )
    )
    return F.transform(packed, lambda x: x["it"])


def event_sequences(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    item_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Per-key ordered event history: ``(key, n_events, seq_fp)``
    where ``seq_fp`` is the md5 of the space-joined item sequence —
    the stable lineage/dedup key for a training sample built from
    that history."""
    seq = _ordered_seq(df, key_col, ts_col, item_col, tiebreak_col)
    return df.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.md5(F.concat_ws(" ", seq)).alias("seq_fp"),
    )


def skipgram_pairs(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    item_col: str,
    tiebreak_col: str,
    window: int = 3,
) -> DataFrame:
    """Directed skip-gram co-occurrence counts: for each key's ordered
    event sequence, every (item[i], item[j]) with ``i < j <= i+window``
    counts once — the training-pair corpus for item2vec-style
    embedding fits.  Output: ``(item_a, item_b, n)``."""
    # Materialize the ordered sequence as a real COLUMN before the
    # pair lambdas touch it: Catalyst does not CSE through lambda
    # bodies, so referencing the (sort+transform) EXPRESSION inside
    # the per-position slice re-evaluated the whole O(n log n)
    # sequence build for every position — O(n^2 log n) per key, a
    # whale-key scale-killer (measured 4x on the bench query). A
    # bound column reference is O(1) per access; the pair generation
    # is then the genuine O(n * window).
    grouped = df.groupBy(key_col).agg(
        _ordered_seq(df, key_col, ts_col, item_col, tiebreak_col).alias("__seq")
    )
    seq = F.col("__seq")
    pairs = F.flatten(
        F.transform(
            seq,
            lambda x, i: F.transform(
                F.slice(seq, i + 2, window),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    return (
        grouped.select(F.explode(pairs).alias("__p"))
        .groupBy(
            F.col("__p.a").alias("item_a"), F.col("__p.b").alias("item_b")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def next_item_samples(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    item_col: str,
    tiebreak_col: str,
    context: int = 5,
) -> DataFrame:
    """Next-item-prediction dataset prep: every event becomes a
    training sample whose label is the event's item and whose
    features are the entity's ``context`` most recent prior items —
    the sequential-recommendation / behavior-LM input shape.

    One key-window shuffle: ``collect_list`` over a BOUNDED sliding
    frame ``rowsBetween(-context, -1)`` (frame order = the window's
    (ts, tiebreak) sort, deterministic) — O(context) work and state
    per row, so a whale key with millions of events costs the same
    per row as anyone else.  (An unbounded-preceding frame + tail
    slice is byte-identical output but materializes the FULL running
    prefix array per row: O(n^2) element copies on a hot key — the
    scale-killer this frame avoids.)  The context is emitted as a
    fingerprint + length so downstream joins/dedups shuffle 16
    bytes, not arrays; swap the md5 for the raw slice when the
    trainer wants the items themselves.
    Output: (key, tiebreak, n_context, ctx_fp, label)."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col), F.col(tiebreak_col))
        .rowsBetween(-context, -1)
    )
    ctx = F.collect_list(F.col(item_col)).over(w)
    return df.select(
        F.col(key_col),
        F.col(tiebreak_col),
        F.size(ctx).cast("long").alias("n_context"),
        F.md5(F.concat_ws(" ", ctx)).alias("ctx_fp"),
        F.col(item_col).alias("label"),
    )


def covisitation_topk(
    df: DataFrame,
    user_col: str,
    item_col: str,
    ts_col: str,
    k: int = 5,
    max_items_per_user: int = 50,
) -> DataFrame:
    """Item-to-item covisitation candidates — the classic recsys
    candidate generator: for every item, the ``k`` items most often
    seen by the same users, ranked by co-occurrence count.

    Scale shape: per-user pair generation is QUADRATIC in the user's
    distinct-item count, so a whale user (a bot touching the whole
    catalog) is capped FIRST: per user, keep only the
    ``max_items_per_user`` earliest-first-seen distinct items (first
    occurrence = min(ts); deterministic tiebreak by item). Pair
    production is then one user-keyed self-join over the capped rows
    (<= cap^2 pairs per user), the count aggregate collapses map-side,
    and the final per-item top-k is a WindowGroupLimit window whose
    groups are bounded by catalog size, not corpus size.

    Output: ``(item_a, item_b, n_co, rank)`` with rank <= k per
    item_a (ordered by n_co desc, item_b).
    """
    first_seen = df.groupBy(user_col, item_col).agg(
        F.min(ts_col).alias("__fs")
    )
    w_cap = Window.partitionBy(user_col).orderBy(
        F.col("__fs"), F.col(item_col)
    )
    # capped per-user item set cached (r13, guide §1.3): it feeds
    # BOTH sides of the pair self-join — uncached, the corpus-sized
    # first-seen aggregate + cap window executed twice per run; the
    # cache is bounded at max_items_per_user rows per user.
    # plan_memo'd (r14, r13 ADVICE #2): rebuilds reuse one cached
    # frame instead of stacking blocks per invocation.
    from feast_hive_spark.plans.memo import plan_memo

    capped = plan_memo(
        df.sparkSession,
        df,
        ("covisitation.capped", user_col, item_col, ts_col,
         max_items_per_user),
        lambda: first_seen.withColumn(
            "__rn", F.row_number().over(w_cap)
        )
        .filter(F.col("__rn") <= max_items_per_user)
        .select(user_col, item_col)
        .cache(),
    )
    a = capped.select(
        F.col(user_col).alias("__u"), F.col(item_col).alias("item_a")
    )
    b = capped.select(
        F.col(user_col).alias("__u"), F.col(item_col).alias("item_b")
    )
    pairs = a.join(b, "__u").filter(F.col("item_a") != F.col("item_b"))
    counts = pairs.groupBy("item_a", "item_b").agg(
        F.count(F.lit(1)).alias("n_co")
    )
    w_top = Window.partitionBy("item_a").orderBy(
        F.col("n_co").desc(), F.col("item_b")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w_top))
        .filter(F.col("rank") <= k)
        .select(
            "item_a",
            "item_b",
            F.col("n_co").cast("long").alias("n_co"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def covisitation_hitrate_at_k(
    df: DataFrame,
    user_col: str,
    item_col: str,
    ts_col: str,
    seq_col: str,
    k: int = 5,
    max_items_per_user: int = 50,
) -> DataFrame:
    """Leave-last-out evaluation of the covisitation candidate
    generator — the hit-rate@k readout every recsys pipeline reports
    before shipping a retrieval model: per user, hold out the LAST
    interaction (by ``(ts, seq)``), train :func:`covisitation_topk`
    on everything else (leakage-safe BY CONSTRUCTION — the held-out
    event never enters pair production), query with the
    second-to-last item, and count a hit when the held-out item
    appears in the query item's top-``k``.

    Users with < 2 events are not evaluable; a self-transition
    (query item == held-out item) counts as a miss since covisitation
    excludes self-pairs — both are deterministic metric properties,
    mirrored in the SQL twin.

    Scale shape: two user-keyed windows (last/prev extraction), the
    covisitation trainer's capped pair join, one broadcast-sized join
    of the per-user (query, target) table against the catalog-sized
    top-k model, and a 1-row aggregate.

    Output: 1 row ``(n_eval, n_hits, hit_rate_micro)``.
    """
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).desc(), F.col(seq_col).desc()
    )
    # (r13, §1.3) feeds the holdout extraction AND the trainer's
    # input — uncached, the events scan + user window executed twice
    # per run; plan_memo'd (r14, ADVICE #2) so rebuilds reuse one
    # cached frame.
    from feast_hive_spark.plans.memo import plan_memo

    ranked = plan_memo(
        df.sparkSession,
        df,
        ("covisitation_hitrate.ranked", user_col, item_col, ts_col,
         seq_col),
        lambda: df.select(user_col, item_col, ts_col, seq_col)
        .withColumn("__rn", F.row_number().over(w))
        .cache(),
    )
    holdout = (
        ranked.filter(F.col("__rn") <= 2)
        .groupBy(user_col)
        .agg(
            # __rn = 1 is the held-out LAST event (the target); __rn =
            # 2 the second-to-last (the query)
            F.max_by(F.col(item_col), F.col("__rn")).alias("__query"),
            F.min_by(F.col(item_col), F.col("__rn")).alias("__target"),
            F.count(F.lit(1)).alias("__c"),
        )
        .filter(F.col("__c") >= 2)
    )
    train = ranked.filter(F.col("__rn") >= 2).select(
        user_col, item_col, ts_col
    )
    model = covisitation_topk(
        train,
        user_col,
        item_col,
        ts_col,
        k=k,
        max_items_per_user=max_items_per_user,
    )
    hits = holdout.join(
        model,
        (holdout["__query"] == model["item_a"])
        & (holdout["__target"] == model["item_b"]),
        "left",
    ).select(
        F.when(F.col("rank").isNotNull(), 1).otherwise(0).alias("__hit")
    )
    return hits.agg(
        F.count(F.lit(1)).cast("long").alias("n_eval"),
        F.sum("__hit").cast("long").alias("n_hits"),
    ).selectExpr(
        "n_eval",
        "n_hits",
        "(2 * n_hits * 1000000 + n_eval) div (2 * n_eval) AS hit_rate_micro",
    )
