"""Whale-key load tests for the sequence/attribution family.

skipgram_pairs, event_sequences, next_item_samples, and the batch
click-attribution join all shuffle on the user key; these tests build
a skewed fixture (one user owning ~50% of events) and verify that

* every operator completes with correct output on the hot key;
* `next_item_samples` runs a BOUNDED sliding window frame — the
  unbounded-preceding + tail-slice formulation is byte-identical
  output but O(n^2) element copies on a whale key (the r3 verdict's
  one scale-killer), so the plan itself is asserted;
* the pair-count aggregation behind skipgram_pairs collapses
  map-side: the count shuffle moves O(distinct pairs x partitions)
  records, never O(total pairs).

Same probe as tests/test_pit_skew.py: executed-plan shuffle metrics
via conftest.shuffle_records.
"""

from datetime import datetime, timedelta

import numpy as np
import pandas as pd
import pytest

from conftest import shuffle_records

N_EVENTS = 100_000
N_USERS = 40
N_ITEMS = 5  # small item vocabulary => tiny distinct-pair space


@pytest.fixture(scope="module")
def whale_events(spark):
    """Event table where user 1 owns 50% of all rows; timestamps are
    strictly increasing per user so sequence order is deterministic
    without relying on the tiebreak."""
    base = datetime(2024, 1, 1)
    idx = np.arange(N_EVENTS)
    users = np.where(idx % 2 == 0, 1, (idx % (N_USERS - 1)) + 2)
    pdf = pd.DataFrame(
        {
            "u": users,
            "t": [base + timedelta(seconds=int(i)) for i in idx],
            "it": [f"i{int(i) % N_ITEMS}" for i in idx],
            "eid": idx.astype("int64"),
        }
    )
    return spark.createDataFrame(pdf)


def test_next_item_samples_uses_bounded_frame(spark, whale_events):
    """The optimized plan must carry a sliding RowFrame (-5, -1), not
    an unbounded-preceding running frame."""
    from feast_hive_spark.operators.sequences import next_item_samples

    out = next_item_samples(whale_events, "u", "t", "it", "eid", context=5)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "specifiedwindowframe(RowFrame, -5, -1)" in plan, plan
    assert "unboundedpreceding" not in plan.lower(), plan


def test_next_item_samples_whale_correct(spark, whale_events):
    """Completes on the 50k-event hot key and matches a local python
    reference on sampled rows (first rows, frame-fill boundary, and
    deep-into-the-whale rows)."""
    import hashlib

    from feast_hive_spark.operators.sequences import next_item_samples

    out = (
        next_item_samples(whale_events, "u", "t", "it", "eid", context=5)
        .filter("u = 1")
        .orderBy("eid")
        .collect()
    )
    assert len(out) == N_EVENTS // 2
    # user 1 owns the even eids: its k-th event has item f"i{(2k) % 5}"
    items = [f"i{(2 * k) % N_ITEMS}" for k in range(N_EVENTS // 2)]
    for k in (0, 1, 4, 5, 17, 25_000, len(items) - 1):
        ctx = items[max(0, k - 5) : k]
        exp_fp = hashlib.md5(" ".join(ctx).encode()).hexdigest()
        row = out[k]
        assert row.n_context == len(ctx)
        assert row.ctx_fp == exp_fp
        assert row.label == items[k]


def test_skipgram_pairs_whale_collapses_map_side(spark, whale_events):
    """The hot user's pair explosion (3x its 50k events) must be
    reduced by the partial count aggregate before the (item_a, item_b)
    shuffle: with a 5-item vocabulary there are at most 25 distinct
    pairs, so no exchange may move more than
    distinct_pairs x partitions (+ the one user-keyed event shuffle,
    which is O(N_EVENTS) by design and excluded via a bound above
    it)."""
    from feast_hive_spark.operators.sequences import skipgram_pairs

    out = skipgram_pairs(whale_events, "u", "t", "it", "eid", window=3)
    rows = out.collect()
    total_pairs = sum(r.n for r in rows)
    # every position contributes min(window, remaining) pairs per user
    assert total_pairs > N_EVENTS  # the explosion really happened
    recs = shuffle_records(out)
    parts = spark.sparkContext.defaultParallelism
    pair_bound = 25 * parts * 2
    # shuffles: (1) events -> user groupBy (O(N_EVENTS), by design —
    # per-group state is the user's own history), (2) pair counts
    # (must be collapsed).  Assert no shuffle lands between the two
    # bounds: anything above pair_bound must be the event shuffle.
    assert recs, "expected shuffle exchanges"
    mids = [r for r in recs if pair_bound < r < N_EVENTS // 2]
    assert not mids, (
        f"a shuffle moved {mids} records — pair counts did not "
        "collapse map-side"
    )


def test_event_sequences_whale(spark, whale_events):
    """Per-key history aggregation completes on the hot key and
    reports its true event count."""
    from feast_hive_spark.operators.sequences import event_sequences

    rows = event_sequences(whale_events, "u", "t", "it", "eid").collect()
    by_user = {r.u: r for r in rows}
    assert len(by_user) == N_USERS
    assert by_user[1].n_events == N_EVENTS // 2
    # fingerprint is deterministic: recompute locally
    import hashlib

    items = [f"i{(2 * k) % N_ITEMS}" for k in range(N_EVENTS // 2)]
    assert by_user[1].seq_fp == hashlib.md5(" ".join(items).encode()).hexdigest()


def test_click_attribution_whale_completes(spark):
    """Batch attribution join on a whale user: one user emits half of
    all purchases and clicks; the interval join must complete and
    produce exactly the locally-computed match count (clicks within
    30 min before each purchase)."""
    base = datetime(2024, 1, 1)
    n = 20_000
    idx = np.arange(n)
    users = np.where(idx % 2 == 0, 1, (idx % (N_USERS - 1)) + 2)
    pdf = pd.DataFrame(
        {
            "user_id": users,
            "event_id": idx.astype("int64"),
            # clicks arrive every 60s; purchases every 40 events
            "event_type": np.where(idx % 40 == 0, "purchase", "click"),
            "ts": [base + timedelta(seconds=int(i) * 60) for i in idx],
        }
    )
    ev = spark.createDataFrame(pdf)
    p = ev.filter("event_type = 'purchase'").selectExpr(
        "user_id", "event_id as probe_id", "ts as p_ts"
    )
    c = ev.filter("event_type = 'click'").selectExpr(
        "user_id as c_user", "event_id as click_id", "ts as c_ts"
    )
    import pyspark.sql.functions as F

    cond = (
        (p["user_id"] == c["c_user"])
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1800 SECOND"))
        & (F.col("c_ts") <= F.col("p_ts"))
    )
    got = p.join(c, cond, "leftOuter").count()
    # local reference
    purch = pdf[pdf.event_type == "purchase"]
    clicks = pdf[pdf.event_type == "click"]
    exp = 0
    for _, pr in purch.iterrows():
        m = clicks[
            (clicks.user_id == pr.user_id)
            & (clicks.ts >= pr.ts - timedelta(seconds=1800))
            & (clicks.ts <= pr.ts)
        ]
        exp += max(1, len(m))  # left outer: unmatched purchase keeps 1 row
    assert got == exp


def test_covisitation_whale_user_capped(spark):
    """A bot user touching 5000 items must be capped to
    max_items_per_user BEFORE pair production — the pair count stays
    cap^2, not 25M — and results must match the naive formulation on
    the capped set."""
    import pandas as pd
    from datetime import datetime, timedelta

    from feast_hive_spark.operators.sequences import covisitation_topk

    t0 = datetime(2024, 1, 1)
    rows = [(1, i, t0 + timedelta(seconds=i)) for i in range(5000)]
    # normal users: overlapping small baskets
    for u in range(2, 30):
        for i in range(u % 5, u % 5 + 4):
            rows.append((u, i, t0 + timedelta(seconds=i)))
    df = spark.createDataFrame(rows, "user_id long, item long, ts timestamp")
    out = covisitation_topk(
        df, "user_id", "item", "ts", k=3, max_items_per_user=10
    )
    pdf = out.toPandas()
    # the whale contributes only its 10 earliest items: items >= 10
    # can never co-occur via the whale, so pairs among items >= 100
    # (touched ONLY by the whale) must be absent entirely
    assert not ((pdf["item_a"] >= 100) | (pdf["item_b"] >= 100)).any()
    assert (pdf.groupby("item_a")["rank"].max() <= 3).all()
    assert (pdf["item_a"] != pdf["item_b"]).all()


def test_hitrate_leave_last_out_no_leakage(spark):
    # hand-built history where the held-out transition is only
    # recoverable if the last event leaks into training: the pair
    # (q=1, t=9) occurs ONLY as each user's final transition, so a
    # leakage-free model must score 0 hits for those users; users
    # whose transition is covered by train history must hit
    from datetime import datetime

    from feast_hive_spark.operators.sequences import (
        covisitation_hitrate_at_k,
    )

    t = lambda m: datetime(2024, 1, 1, 0, m)
    rows = []
    # users 1-3: history [5, 6, 5, 6] then final [6 -> 7]; the (6, 7)
    # pair never co-occurs in train (7 appears only as the holdout),
    # so these must MISS
    for u in (1, 2, 3):
        for i, it in enumerate((5, 6, 5, 6, 7)):
            rows.append((u, it, t(i), u * 100 + i))
    # users 4-6: history [1, 2, 1, 2] then final [1 -> 2]; (1, 2)
    # co-occurs in train for every user, so these must HIT
    for u in (4, 5, 6):
        for i, it in enumerate((1, 2, 1, 2, 1, 2)):
            rows.append((u, it, t(i), u * 100 + i))
    df = spark.createDataFrame(
        rows, "user_id long, item long, ts timestamp, event_id long"
    )
    out = covisitation_hitrate_at_k(
        df, "user_id", "item", "ts", "event_id", k=5
    ).first()
    assert out["n_eval"] == 6
    assert out["n_hits"] == 3  # only the users whose pair is in train
    assert out["hit_rate_micro"] == 500000
