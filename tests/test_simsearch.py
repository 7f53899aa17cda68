"""Similarity-search tests: brute force vs numpy; LSH recall vs brute."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from feast_hive_spark.operators import simsearch as S
from feast_hive_spark.sources.tables import read_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return read_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def emb_np(emb):
    pdf = emb.toPandas().sort_values("vec_id").reset_index(drop=True)
    V = np.array(pdf.embedding.tolist(), dtype=np.float64)
    return pdf.vec_id.to_numpy(), V


def numpy_topk(ids, V, query_ids, k=5):
    Vn = V / np.linalg.norm(V, axis=1)[:, None]
    id_to_ix = {v: i for i, v in enumerate(ids)}
    out = {}
    for q in query_ids:
        sims = Vn @ Vn[id_to_ix[q]]
        order = sorted(
            [(round(s, 6), -i) for i, s in zip(ids, sims) if i != q], reverse=True
        )
        out[q] = [(-neg_i) for (s, neg_i) in order[:k]]
    return out


def test_brute_force_topk_matches_numpy(emb, emb_np):
    ids, V = emb_np
    queries = emb.filter(F.col("vec_id") < 8)
    got = S.brute_force_topk(emb, queries, "vec_id", "embedding", k=5).toPandas()
    expected = numpy_topk(ids, V, [i for i in ids if i < 8], k=5)
    for q, grp in got.groupby("query_id"):
        ordered = grp.sort_values("rank").neighbor_id.tolist()
        assert ordered == expected[q], q


def test_lsh_topk_recall(emb, emb_np):
    """Multi-table sign-LSH: recall of exact top-5 must be substantial
    (approximate by design — that's the scale trade)."""
    ids, V = emb_np
    queries = emb.filter(F.col("vec_id") < 20)
    got = S.lsh_topk(
        emb, queries, "vec_id", "embedding", k=5, n_planes=4, n_tables=12
    ).toPandas()
    expected = numpy_topk(ids, V, [i for i in ids if i < 20], k=5)
    hits = total = 0
    for q, exp in expected.items():
        found = set(got[got.query_id == q].neighbor_id)
        hits += len(found & set(exp))
        total += len(exp)
    assert total > 0
    assert hits / total >= 0.5, f"recall {hits}/{total}"
    # every reported neighbor must be a true candidate with correct cosine sign
    assert (got["rank"] <= 5).all()


def test_ivf_topk_recall(emb, emb_np):
    """IVF coarse quantizer: with n_probe/n_lists = 1/4 of the corpus
    scanned, recall of exact top-5 must be substantial."""
    from feast_hive_spark.operators.simsearch import ivf_topk

    ids, V = emb_np
    queries = emb.filter(F.col("vec_id") < 20)
    got = ivf_topk(
        emb, queries, "vec_id", "embedding", k=5, n_lists=16, n_probe=4
    ).toPandas()
    expected = numpy_topk(ids, V, [i for i in ids if i < 20], k=5)
    hits = total = 0
    for q, exp in expected.items():
        found = set(got[got.query_id == q].neighbor_id)
        hits += len(found & set(exp))
        total += len(exp)
    assert hits / total >= 0.4, f"recall {hits}/{total}"


def test_brute_force_no_self_rows_tiny_corpus(spark):
    """A query whose candidate pool is smaller than k must not emit
    self-match sentinel rows (ADVICE: -inf row surviving argpartition
    when a batch has <= k rows)."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "vec_id": [1, 2, 3],
            "embedding": [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]],
        }
    )
    df = spark.createDataFrame(pdf)
    got = S.brute_force_topk(df, df.filter(F.col("vec_id") == 1), "vec_id", "embedding", k=5).toPandas()
    assert (got.query_id != got.neighbor_id).all()
    assert np.isfinite(got.cosine).all()
    assert len(got) == 2  # only two non-self candidates exist


def test_label_centroids_match_numpy(emb, emb_np, spark):
    from feast_hive_spark.operators.simsearch import label_centroids

    got = label_centroids(emb, "embedding", "label").toPandas()
    pdf = emb.select("vec_id", "label").toPandas()
    ids, V = emb_np
    # numpy twin with the same micro-unit accumulation
    import numpy as np

    raw = emb.select("embedding").toPandas()["embedding"]
    M = np.array([np.asarray(v, dtype=np.float64) for v in raw])

    def half_away(x, dec=0):  # Spark/DuckDB ROUND, not numpy's half-even
        s = 10.0**dec
        return np.sign(x) * np.floor(np.abs(x) * s + 0.5) / s

    Vu = half_away(M * 1_000_000)
    for lbl in pdf.label.unique():
        mask = (pdf.label == lbl).to_numpy()
        exp = half_away(Vu[mask].sum(axis=0) / (1_000_000.0 * mask.sum()), 6)
        sub = got[got.label == lbl].sort_values("pos")
        assert np.allclose(sub.centroid_val.to_numpy(), exp, atol=1e-9)


def test_knn_label_accuracy_matches_numpy(emb, emb_np):
    from feast_hive_spark.operators.simsearch import knn_label_accuracy

    got = (
        knn_label_accuracy(emb, "vec_id", "embedding", "label", k=5)
        .toPandas()
        .set_index("label")
        .sort_index()
    )
    ids, Vn = emb_np
    labels = emb.select("vec_id", "label").toPandas().set_index("vec_id")["label"]
    import numpy as np

    S = np.round(Vn @ Vn.T, 6)
    order = np.argsort(ids)
    correct: dict[int, int] = {}
    total: dict[int, int] = {}
    for qi, q in enumerate(ids):
        sims = [
            (-S[qi, ci], ids[ci]) for ci in range(len(ids)) if ids[ci] != q
        ]
        sims.sort()
        top = [labels[nb] for _, nb in sims[:5]]
        votes: dict[int, int] = {}
        for lb in top:
            votes[lb] = votes.get(lb, 0) + 1
        pred = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        gold = labels[q]
        total[gold] = total.get(gold, 0) + 1
        if pred == gold:
            correct[gold] = correct.get(gold, 0) + 1
    for lbl in total:
        assert got.loc[lbl, "n"] == total[lbl]
        assert got.loc[lbl, "n_correct"] == correct.get(lbl, 0)


def test_query_collect_guardrail(spark):
    import pytest as _pt

    from feast_hive_spark.operators import simsearch as S

    big = spark.range(S.MAX_QUERY_ROWS + 1).select(
        F.col("id").alias("vec_id"), F.array(F.lit(1.0)).alias("embedding")
    )
    with _pt.raises(ValueError, match="query set exceeds"):
        S._query_matrix(big, "vec_id", "embedding")


def test_gramian_matches_numpy(spark):
    """Distributed micro-unit Gramian vs a direct numpy model,
    including the round-before-sum order independence."""
    import numpy as np
    import pandas as pd

    from feast_hive_spark.operators.vecstats import gramian_e6

    rng = np.random.RandomState(11)
    X32 = rng.randn(300, 8).astype(np.float32)
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(300), "embedding": [list(map(float, r)) for r in X32]})
    ).repartition(7)  # force multiple partial matrices
    got = {
        (r.i, r.j): r.sum_e6
        for r in gramian_e6(df, "embedding", 8).collect()
    }
    X = X32.astype(np.float64)
    exp = np.round(X[:, :, None] * X[:, None, :] * 1e6).astype(np.int64).sum(axis=0)
    assert len(got) == 64
    for (i, j), s in got.items():
        assert s == exp[i, j]
    # symmetry holds exactly in fixed point
    assert all(got[(i, j)] == got[(j, i)] for i in range(8) for j in range(8))


def test_covariance_matches_numpy(spark):
    """Integer covariance numerators vs numpy, and the derived float
    covariance approximates np.cov to fixed-point tolerance."""
    import numpy as np
    import pandas as pd

    from feast_hive_spark.operators.vecstats import covariance_num_e6

    rng = np.random.RandomState(5)
    X32 = rng.randn(200, 6).astype(np.float32)
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(200), "embedding": [list(map(float, r)) for r in X32]})
    ).repartition(5)
    got = {
        (r.i, r.j): r.cov_num
        for r in covariance_num_e6(df, "embedding", 6).collect()
    }
    X = X32.astype(np.float64)
    n = X.shape[0]
    G = np.round(X[:, :, None] * X[:, None, :] * 1e6).astype(np.int64).sum(axis=0)
    s3 = np.round(X * 1e3).astype(np.int64).sum(axis=0)
    for (i, j), v in got.items():
        assert v == n * G[i, j] - s3[i] * s3[j]
    # derived float covariance ~ population covariance
    C = np.array([[got[(i, j)] / (n * n) / 1e6 for j in range(6)] for i in range(6)])
    exp = np.cov(X.T, bias=True)
    assert np.abs(C - exp).max() < 1e-2


def test_pq_adc_recall_vs_exact(spark, sf_dir):
    """PQ-ADC is an approximation; sanity-gate it with recall@5
    against the exact brute-force kernel (>= 0.25 with the seed
    codebook at m=32/64 codes — synthetic uniform embeddings are
    PQ's worst case, but it must be far above the ~0.01 random
    baseline) and check the output
    contract: k rows per query, rank total order, self excluded."""
    from feast_hive_spark.operators import simsearch as S
    from feast_hive_spark.sources.tables import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    pq = S.pq_adc_topk(
        emb, queries, "vec_id", "embedding", k=5, m=32, n_codes=64
    ).toPandas()
    exact = S.brute_force_topk(
        emb, queries, "vec_id", "embedding", k=5
    ).toPandas()
    assert (pq.groupby("query_id").size() == 5).all()
    assert (pq["query_id"] != pq["neighbor_id"]).all()
    hits = 0
    for q in pq["query_id"].unique():
        got = set(pq[pq.query_id == q]["neighbor_id"])
        true = set(exact[exact.query_id == q]["neighbor_id"])
        hits += len(got & true)
    recall = hits / len(exact)
    assert recall >= 0.25, f"recall@5 {recall}"


def test_ivfpq_recall_and_contract(spark, sf_dir):
    """IVF-PQ composes two approximations; recall must still beat the
    random baseline by a wide margin, every returned neighbor must lie
    in a probed list, and raising n_probe must not lower recall."""
    from feast_hive_spark.operators import simsearch as S
    from feast_hive_spark.sources.tables import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    exact = S.brute_force_topk(emb, queries, "vec_id", "embedding", k=5).toPandas()

    def recall(n_probe):
        got = S.ivfpq_topk(
            emb, queries, "vec_id", "embedding",
            k=5, n_lists=16, n_probe=n_probe, m=32, n_codes=64,
        ).toPandas()
        hits = 0
        for q in got["query_id"].unique():
            hits += len(
                set(got[got.query_id == q]["neighbor_id"])
                & set(exact[exact.query_id == q]["neighbor_id"])
            )
        return hits / len(exact)

    r4 = recall(4)
    r16 = recall(16)  # probe everything -> pure PQ
    assert r4 >= 0.1  # far above the ~0.01 random baseline
    assert r16 >= r4 - 1e-9  # more probes never hurt


def test_kmeans_assign_partitions_corpus(spark, sf_dir):
    from feast_hive_spark.operators.simsearch import kmeans_assign
    from feast_hive_spark.plans import memo
    from feast_hive_spark.sources.tables import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    n = emb.count()
    a = kmeans_assign(emb, "vec_id", "embedding", k=4, iters=2)
    rows = a.collect()
    assert len(rows) == n
    assert {r["vec_id"] for r in rows} == {
        r["vec_id"] for r in emb.select("vec_id").collect()
    }
    assert all(0 <= r["cluster"] < 4 for r in rows)
    assert all(r["dist"] >= 0 for r in rows)
    # deterministic: a fresh (memo-cleared) rebuild agrees exactly
    memo.clear()
    again = kmeans_assign(emb, "vec_id", "embedding", k=4, iters=2)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))


def test_kmeans_final_assignment_is_argmin(spark, sf_dir):
    # the iters=2 result must be exactly one Lloyd step past the
    # iters=1 result: rebuild the round-2 centroids from the iters=1
    # assignment with numpy (floor(sum/count) in micro units) and
    # verify every point's final cluster is the argmin against them,
    # ties to the lowest cluster id, with the reported dist
    import numpy as np

    from feast_hive_spark.operators.simsearch import kmeans_assign
    from feast_hive_spark.sources.tables import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    a1 = kmeans_assign(emb, "vec_id", "embedding", k=4, iters=1)
    a2 = kmeans_assign(emb, "vec_id", "embedding", k=4, iters=2)
    vecs = {
        r["vec_id"]: np.round(
            np.array(r["embedding"], dtype=np.float64) * 1_000_000
        ).astype(np.int64)
        for r in emb.select("vec_id", "embedding").collect()
    }
    groups: dict = {}
    for r in a1.collect():
        groups.setdefault(r["cluster"], []).append(vecs[r["vec_id"]])
    cents = {
        c: np.floor(
            np.sum(np.stack(g), axis=0).astype(np.float64) / len(g)
        ).astype(np.int64)
        for c, g in groups.items()
    }
    for r in a2.collect():
        x = vecs[r["vec_id"]]
        dists = {c: int(((x - cm) ** 2).sum()) for c, cm in cents.items()}
        best = min(sorted(dists), key=lambda c: (dists[c], c))
        assert r["cluster"] == best
        assert r["dist"] == dists[best]


def test_semdedup_pairs_within_cluster_only(spark, sf_dir):
    from feast_hive_spark.operators.simsearch import (
        kmeans_assign,
        semdedup_report,
    )
    from feast_hive_spark.sources.tables import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    rep = semdedup_report(
        emb, "vec_id", "embedding", k=4, iters=2, threshold=0.45
    ).collect()
    a = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_assign(
            emb, "vec_id", "embedding", k=4, iters=2
        ).collect()
    }
    by_cluster = {r["cluster"]: r for r in rep}
    # report covers every cluster exactly once, sizes match assignment
    import collections

    want = collections.Counter(a.values())
    assert {c: r["n_vectors"] for c, r in by_cluster.items()} == dict(want)
    for r in rep:
        assert r["n_removed"] <= r["n_pairs"]
        assert r["n_removed"] <= r["n_vectors"]


def test_pq_trained_codebooks_reduce_quantization_error(spark, sf_dir):
    # Lloyd-refined codebooks must quantize the corpus at least as
    # well as the md5-seeded ones (measured as mean squared sub-vector
    # error under nearest-code assignment, numpy ground truth)
    import numpy as np

    from feast_hive_spark.operators.simsearch import (
        pq_codebooks_from_table,
        pq_seed_codebooks,
        pq_train_codebooks_df,
    )
    from feast_hive_spark.sources.tables import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    m, n_codes, sub = 4, 16, 16
    rows = pq_train_codebooks_df(
        emb, "vec_id", "embedding", dim=64, m=m, n_codes=n_codes, iters=2
    ).collect()
    trained = pq_codebooks_from_table(rows, m, n_codes, sub)
    seeds = pq_seed_codebooks(emb, "vec_id", "embedding", n_codes)

    X = np.array(
        [r["embedding"] for r in emb.select("embedding").collect()],
        dtype=np.float64,
    )

    def mse(C):
        err = 0.0
        for s in range(m):
            Xs = X[:, s * sub : (s + 1) * sub]
            Cs = C[:, s * sub : (s + 1) * sub]
            d = ((Xs[:, None, :] - Cs[None, :, :]) ** 2).sum(axis=2)
            err += d.min(axis=1).sum()
        return err / X.size

    assert mse(trained) <= mse(seeds) * 1.0001


def test_pq_adc_with_trained_codebooks_runs(spark, sf_dir):
    from feast_hive_spark.operators.simsearch import (
        pq_adc_topk,
        pq_codebooks_from_table,
        pq_train_codebooks_df,
    )
    from feast_hive_spark.sources.tables import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    rows = pq_train_codebooks_df(
        emb, "vec_id", "embedding", dim=64, m=4, n_codes=16, iters=2
    ).collect()
    C = pq_codebooks_from_table(rows, 4, 16, 16)
    q = emb.limit(3)
    out = pq_adc_topk(
        emb, q, "vec_id", "embedding", k=5, m=4, n_codes=16, codebooks=C
    ).collect()
    assert len(out) == 15
    assert all(r["rank"] <= 5 for r in out)


def test_kmeans_join_path_matches_literal(spark, sf_dir):
    # r6 verdict #6: the broadcast-join argmin must be bit-identical
    # to the literal-SQL argmin (shared seeding/arithmetic/tie-break)
    from feast_hive_spark.operators.simsearch import kmeans_assign
    from feast_hive_spark.plans import memo
    from feast_hive_spark.sources.tables import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    lit = sorted(
        map(
            tuple,
            kmeans_assign(
                emb, "vec_id", "embedding", k=4, iters=2, assign="literal"
            ).collect(),
        )
    )
    memo.clear()
    jn = sorted(
        map(
            tuple,
            kmeans_assign(
                emb, "vec_id", "embedding", k=4, iters=2, assign="join"
            ).collect(),
        )
    )
    assert lit == jn


def test_kmeans_large_k_uses_broadcast_join(spark):
    # k=1024/dim=64 must complete without generating k x dim literal
    # SQL, and the final-assignment plan must be a broadcast join
    import random

    from feast_hive_spark.operators.simsearch import kmeans_assign

    rng = random.Random(7)
    rows = [
        (i, [round(rng.uniform(-1, 1), 4) for _ in range(64)])
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = kmeans_assign(df, "vec_id", "embedding", k=1024, iters=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    got = out.collect()
    assert len(got) == 300
    assert all(0 <= r["cluster"] < 1024 for r in got)


def test_pq_train_join_path_matches_literal(spark, sf_dir):
    from feast_hive_spark.operators.simsearch import pq_train_codebooks_df
    from feast_hive_spark.plans import memo
    from feast_hive_spark.sources.tables import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    lit = sorted(
        map(
            tuple,
            pq_train_codebooks_df(
                emb, "vec_id", "embedding", dim=64, m=4, n_codes=16,
                iters=2, assign="literal",
            ).collect(),
        )
    )
    memo.clear()
    jn = sorted(
        map(
            tuple,
            pq_train_codebooks_df(
                emb, "vec_id", "embedding", dim=64, m=4, n_codes=16,
                iters=2, assign="join",
            ).collect(),
        )
    )
    assert lit == jn


def test_ann_filtered_topk_label_constraint(spark, sf_dir):
    """Filtered ANN: every neighbor must carry the query's label, ranks
    are 1..k dense per query, and the top-1 matches a numpy oracle
    restricted to the same label block."""
    import numpy as np
    from feast_hive_spark.registry import REGISTRY
    import feast_hive_spark.registry_ext  # noqa: F401
    from feast_hive_spark.sources.tables import read_table

    out = REGISTRY["ann_filtered_topk"][0](spark, sf_dir).toPandas()
    emb = read_table(spark, sf_dir, "embeddings").toPandas()
    lab = dict(zip(emb.vec_id, emb.label))
    for _, r in out.iterrows():
        assert lab[r.neighbor_id] == lab[r.query_id] == r.label
    M = {r.vec_id: np.array(list(r.embedding), dtype=np.float64)
         for r in emb.itertuples()}
    for qid in [q for q in emb.vec_id if q < 8]:
        block = [v for v in emb.vec_id if lab[v] == lab[qid] and v != qid]
        if not block:
            assert qid not in set(out.query_id)
            continue
        qv = M[qid] / np.linalg.norm(M[qid])
        best = max(
            block,
            key=lambda v: (
                round(float(np.dot(M[v] / np.linalg.norm(M[v]), qv)), 6),
                -v,
            ),
        )
        got = out[(out.query_id == qid) & (out["rank"] == 1)]
        assert got.neighbor_id.iloc[0] == best
        rks = sorted(out[out.query_id == qid]["rank"])
        assert rks == list(range(1, len(rks) + 1))


def test_kcenter_diverse_sample_invariants(spark, sf_dir):
    """Gonzalez k-center: the covering radius (distance of each pick
    to its nearest earlier center) is non-increasing round over
    round, picks are distinct, and the seed is the smallest id."""
    from feast_hive_spark.operators.simsearch import kcenter_diverse_sample
    from feast_hive_spark.sources.tables import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    out = kcenter_diverse_sample(emb, "vec_id", "embedding", k=4).collect()
    assert len(out) == 4
    assert out[0]["vec_id"] == emb.agg({"vec_id": "min"}).first()[0]
    dists = [r["dist_micro"] for r in out[1:]]
    assert dists == sorted(dists, reverse=True)
    assert all(d > 0 for d in dists)
    assert len({r["vec_id"] for r in out}) == 4


def test_kcenter_diverse_sample_string_ids(spark):
    """Output id column keeps the input id type (r8 advice: the
    schema — including the empty-corpus branch — hardcoded `long`)."""
    from feast_hive_spark.operators.simsearch import kcenter_diverse_sample

    emb = spark.createDataFrame(
        [("x", [1.0, 0.0]), ("y", [0.0, 1.0]), ("z", [0.9, 0.1])],
        "vid string, v array<double>",
    )
    out = kcenter_diverse_sample(emb, "vid", "v", k=2)
    assert out.schema["vid"].dataType.simpleString() == "string"
    rows = out.orderBy("pick_rank").collect()
    assert rows[0]["vid"] == "x" and rows[1]["vid"] == "y"
    empty = kcenter_diverse_sample(emb.filter("1=0"), "vid", "v", k=2)
    assert empty.schema["vid"].dataType.simpleString() == "string"
    assert empty.count() == 0


def test_lsh_hard_negative_topk_invariants(spark, sf_dir):
    """Collect-free hard-negative miner: every neighbor carries a
    different label, ranks are dense 1..<=k per query, and each
    query's rank-1 cosine never exceeds the exact miner's rank-1
    (the LSH result is a subset of the exact candidate set)."""
    from feast_hive_spark.operators.simsearch import (
        hard_negative_topk,
        lsh_hard_negative_topk,
    )
    from feast_hive_spark.sources.tables import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    out = lsh_hard_negative_topk(emb, "vec_id", "embedding", "label", k=5)
    pdf = out.toPandas()
    labs = {r["vec_id"]: r["label"] for r in emb.collect()}
    assert (pdf.groupby("query_id")["rank"].max() <= 5).all()
    for _, r in pdf.iterrows():
        assert labs[r["query_id"]] != labs[r["neighbor_id"]]
    g = pdf.sort_values(["query_id", "rank"]).groupby("query_id")["rank"]
    assert (g.apply(lambda s: list(s) == list(range(1, len(s) + 1)))).all()
    exact1 = {
        r["query_id"]: r["cosine"]
        for r in hard_negative_topk(emb, "vec_id", "embedding", "label", k=1)
        .collect()
    }
    lsh1 = pdf[pdf["rank"] == 1]
    assert all(
        r["cosine"] <= exact1[r["query_id"]] + 1e-9
        for _, r in lsh1.iterrows()
    )


def test_lsh_hard_negative_collapse_equivalence(spark):
    """collapse_exact must be output-identical to the uncollapsed
    pipeline on a corpus with heavy exact duplication (the r9
    second-decade shape: identical vectors share every bucket and
    every cosine)."""
    from feast_hive_spark.operators.simsearch import lsh_hard_negative_topk

    rows = []
    base = [
        ([1.0, 0.0, 0.0, 0.2], 0),
        ([0.9, 0.1, 0.0, 0.2], 1),
        ([0.0, 1.0, 0.0, 0.1], 0),
        ([0.0, 0.9, 0.2, 0.0], 1),
        ([0.5, 0.5, 0.5, 0.5], 2),
    ]
    i = 0
    for vec, lab in base:
        for _ in range(6):  # 6-way duplicate clusters
            rows.append((i, vec, lab))
            i += 1
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label long"
    )
    raw = lsh_hard_negative_topk(
        emb, "vec_id", "embedding", "label", k=5, collapse_exact=False
    )
    col = lsh_hard_negative_topk(
        emb, "vec_id", "embedding", "label", k=5, collapse_exact=True
    )
    assert raw.schema == col.schema
    a = sorted(tuple(r) for r in raw.collect())
    b = sorted(tuple(r) for r in col.collect())
    assert a == b and len(a) == 30 * 5  # every vector gets k rows here


def test_lsh_hard_negative_collapse_tie_interleave(spark):
    """Adversarial boundary ties: two DIFFERENT-label neighbor groups
    with numerically EQUAL cosines to the query — the final top-k
    interleaves their members by id, so the collapse path must keep
    ALL groups at a kept cosine level (dense levels), not just k rows.
    Query group q=[1,0]; groups A=[0.6,0.8] (label 1) and B (label 2)
    share cosine 0.6; member ids alternate A,B,A,B below k."""
    from feast_hive_spark.operators.simsearch import lsh_hard_negative_topk

    rows = [
        (0, [1.0, 0.0], 0),
        (100, [1.0, 0.0], 0),  # duplicate of the query vector
        # group A: two copies, ids 1 and 3
        (1, [0.6, 0.8], 1),
        (3, [0.6, 0.8], 1),
        # group B: same cosine to q (mirror), ids 2 and 4
        (2, [0.6, -0.8], 2),
        (4, [0.6, -0.8], 2),
        # group C: strictly worse cosine, must rank after ties
        (5, [0.0, 1.0], 1),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label long"
    )
    raw = lsh_hard_negative_topk(
        emb, "vec_id", "embedding", "label", k=3, collapse_exact=False
    )
    col = lsh_hard_negative_topk(
        emb, "vec_id", "embedding", "label", k=3, collapse_exact=True
    )
    a = sorted(tuple(r) for r in raw.collect())
    b = sorted(tuple(r) for r in col.collect())
    assert a == b
    got = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in col.collect()}
    # for query 0: rank1=id1 (cos .6), rank2=id2 (cos .6, next id),
    # rank3=id3 — group A and B members INTERLEAVED by id at the tie
    if (0, 1) in got:  # LSH recall permitting (deterministic planes)
        assert [got.get((0, r)) for r in (1, 2, 3)] == [1, 2, 3]


def test_derive_lsh_planes_integer_ladder():
    """r10 (r9 verdict #3): planes = ceil(log2(ceil(n/target))) via
    pure integer arithmetic, floored at 1 — exact at every power-of-2
    boundary (where a float log2 could ride a rounding error onto the
    wrong rung)."""
    from feast_hive_spark.operators.simsearch import derive_lsh_planes

    t = 64
    assert derive_lsh_planes(0, t) == 1
    assert derive_lsh_planes(1, t) == 1
    assert derive_lsh_planes(2 * t, t) == 1        # boundary: stays 1
    assert derive_lsh_planes(2 * t + 1, t) == 2    # next rung
    assert derive_lsh_planes(4 * t, t) == 2
    assert derive_lsh_planes(4 * t + 1, t) == 3
    assert derive_lsh_planes(500, 64) == 3         # sf0.01 embeddings
    assert derive_lsh_planes(2000, 64) == 5        # sf0.1 embeddings
    # bucket population bound: n / 2^planes <= 2 * target, always
    for n in [1, 63, 64, 100, 500, 2000, 10_000, 1_000_000]:
        p = derive_lsh_planes(n, t)
        assert n / (1 << p) <= 2 * t


def test_lsh_hard_negative_string_ids_and_null_labels(spark):
    """r10 (r9 ADVICE #2): the mapInPandas schemas derive from the
    input — string ids and string labels must work end to end — and
    NULL-label rows are dropped up front (SQL ``<>`` semantics: NULL
    matches nothing), where the old NaN round-trip let two null-label
    rows pair with each other."""
    import pandas as pd

    from feast_hive_spark.operators.simsearch import lsh_hard_negative_topk

    rng = np.random.RandomState(7)
    n = 40
    pdf = pd.DataFrame(
        {
            "sid": [f"doc-{i:03d}" for i in range(n)],
            "vec": [rng.randn(8).tolist() for _ in range(n)],
            "lab": [
                None if i % 10 == 0 else f"L{i % 3}" for i in range(n)
            ],
        }
    )
    emb = spark.createDataFrame(pdf)
    out = lsh_hard_negative_topk(
        emb, "sid", "vec", "lab", k=3, n_planes=1, n_tables=4
    ).toPandas()
    assert len(out) > 0
    assert out["query_id"].map(lambda s: isinstance(s, str)).all()
    null_ids = set(pdf[pdf["lab"].isna()]["sid"])
    assert not (set(out["query_id"]) & null_ids)
    assert not (set(out["neighbor_id"]) & null_ids)
    # ranks well-formed per query
    g = out.groupby("query_id")["rank"].agg(["min", "max", "count"])
    assert (g["min"] == 1).all() and (g["max"] <= 3).all()


def test_lsh_hard_negative_target_bucket_rows_derives(spark):
    """target_bucket_rows must produce the SAME result as the
    explicitly-derived plane count (the parameter is sugar for the
    deterministic derivation, nothing else)."""
    import pandas as pd

    from feast_hive_spark.operators.simsearch import (
        derive_lsh_planes,
        lsh_hard_negative_topk,
    )

    rng = np.random.RandomState(11)
    n = 130  # ceil(130/16)=9 -> 4 planes
    pdf = pd.DataFrame(
        {
            "i": list(range(n)),
            "vec": [rng.randn(8).tolist() for _ in range(n)],
            "lab": [i % 4 for i in range(n)],
        }
    )
    emb = spark.createDataFrame(pdf)
    assert derive_lsh_planes(n, 16) == 4
    auto = lsh_hard_negative_topk(
        emb, "i", "vec", "lab", k=3, n_tables=3, target_bucket_rows=16
    ).toPandas()
    manual = lsh_hard_negative_topk(
        emb, "i", "vec", "lab", k=3, n_planes=4, n_tables=3
    ).toPandas()
    key = ["query_id", "neighbor_id", "rank"]
    a = auto.sort_values(key).reset_index(drop=True)
    m = manual.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, m)


def test_spectral_summary_isotropic_vs_rank1(spark):
    """Participation ratio must read ≈dim on isotropic data and ≈1 on
    rank-1 (collapsed) data, with total_var matching numpy's
    population-covariance trace to fixed-point tolerance."""
    import pandas as pd

    from feast_hive_spark.operators.vecstats import spectral_summary

    rng = np.random.RandomState(7)
    X = rng.randn(400, 8)
    iso = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(400), "embedding": [r.tolist() for r in X]})
    ).repartition(5)
    row = spectral_summary(iso, "embedding", 8).first()
    assert row["n_vectors"] == 400 and row["dim"] == 8
    assert row["participation_ratio"] > 6.0
    assert row["top_var_share"] < 0.25
    exp_trace = np.cov(X.T, bias=True).trace()
    assert abs(row["total_var"] - exp_trace) < 1e-2

    v = rng.randn(8)
    a = rng.randn(400)
    R = np.outer(a, v)
    r1 = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(400), "embedding": [r.tolist() for r in R]})
    ).repartition(5)
    row1 = spectral_summary(r1, "embedding", 8).first()
    assert row1["participation_ratio"] < 1.2
    C = np.cov(R.T, bias=True)
    assert abs(row1["top_var_share"] - C.diagonal().max() / C.trace()) < 1e-3


def test_semantic_decontaminate_analytic(spark):
    """2-D unit vectors with hand-computable cosines: only the
    corpus rows within the threshold cone of a benchmark vector get
    flagged, per label."""
    import pandas as pd

    bench = spark.createDataFrame(
        pd.DataFrame({"vec_id": [0], "embedding": [[1.0, 0.0]], "label": [0]})
    )
    corpus = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": [1, 2, 3, 4],
                "embedding": [[1.0, 0.0], [0.0, 1.0], [0.8, 0.6], [-1.0, 0.0]],
                "label": [10, 10, 20, 20],
            }
        )
    )
    out = (
        S.semantic_decontaminate(
            corpus, bench, "vec_id", "embedding", "label", threshold=0.75
        )
        .toPandas()
        .set_index("label")
    )
    # label 10: cosines {1.0, 0.0} -> 1 flagged; label 20: {0.8, -1.0} -> 1
    assert out.loc[10, "n_corpus"] == 2 and out.loc[10, "n_flagged"] == 1
    assert out.loc[20, "n_corpus"] == 2 and out.loc[20, "n_flagged"] == 1
    assert out.loc[10, "max_sim"] == 1.0
    assert abs(out.loc[20, "max_sim"] - 0.8) < 1e-9
    assert out.loc[20, "sum_maxsim_e6"] == 800000 - 1000000


def test_semantic_decontaminate_guard_and_label_types(spark):
    """The benchmark side rides the typed ANN collect guard, and the
    output label column keeps the input's type (string labels legal —
    the r9 ADVICE schema-genericity rule)."""
    import pandas as pd
    import pytest as _pt

    big = spark.range(S.MAX_QUERY_ROWS + 1).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0)).alias("embedding"),
        F.lit(0).alias("label"),
    )
    small = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": [1], "embedding": [[1.0]], "label": ["en"]}
        )
    )
    with _pt.raises(S.AnnQueryGuardError):
        S.semantic_decontaminate(
            small, big, "vec_id", "embedding", "label"
        )
    out = S.semantic_decontaminate(
        small, small, "vec_id", "embedding", "label", threshold=0.5
    )
    assert out.schema["label"].dataType.simpleString() == "string"
    row = out.first()
    assert row["label"] == "en" and row["n_flagged"] == 1


def test_decontaminate_threshold_sweep_monotone_and_consistent(spark):
    """The sweep must be non-increasing in threshold, agree with the
    single-threshold rollup at a shared threshold, and come from ONE
    scored pass (ppm exact against the corpus count)."""
    import pandas as pd

    rng = np.random.RandomState(3)
    pdf = pd.DataFrame(
        {
            "vec_id": range(60),
            "embedding": [rng.randn(6).tolist() for _ in range(60)],
            "label": [i % 3 for i in range(60)],
        }
    )
    emb = spark.createDataFrame(pdf)
    bench = emb.filter(F.col("vec_id") % 10 == 0)
    corpus = emb.filter(F.col("vec_id") % 10 != 0)
    sweep = (
        S.decontaminate_threshold_sweep(
            corpus, bench, "vec_id", "embedding", "label",
            thresholds=(0.1, 0.3, 0.5),
        )
        .toPandas()
        .sort_values("threshold")
        .reset_index(drop=True)
    )
    assert list(sweep["threshold"]) == [0.1, 0.3, 0.5]
    assert (sweep["n_flagged"].diff().dropna() <= 0).all()
    single = S.semantic_decontaminate(
        corpus, bench, "vec_id", "embedding", "label", threshold=0.3
    ).toPandas()
    assert (
        sweep.loc[sweep["threshold"] == 0.3, "n_flagged"].iloc[0]
        == single["n_flagged"].sum()
    )
    n_corpus = single["n_corpus"].sum()
    for r in sweep.itertuples():
        assert r.flagged_ppm == round(r.n_flagged * 1000000 / n_corpus)


def test_semantic_decontaminate_randomized_python_model(spark):
    """Randomized (seeded) cross-check: per-label rollup must equal a
    pure-python model of the same round-before-max kernel across
    several corpus/benchmark shapes, including a label present only
    in the corpus and a benchmark of size 1."""
    import pandas as pd

    for seed, n_corpus, n_bench, dim in [(11, 40, 3, 5), (12, 25, 1, 7), (13, 60, 8, 4)]:
        rng = np.random.RandomState(seed)
        C = rng.randn(n_corpus, dim)
        B = rng.randn(n_bench, dim)
        labs = rng.randint(0, 3, size=n_corpus)
        corpus = spark.createDataFrame(
            pd.DataFrame(
                {
                    "vec_id": range(n_corpus),
                    "embedding": [r.tolist() for r in C],
                    "label": labs,
                }
            )
        ).repartition(3)
        bench = spark.createDataFrame(
            pd.DataFrame(
                {
                    "vec_id": range(1000, 1000 + n_bench),
                    "embedding": [r.tolist() for r in B],
                    "label": [0] * n_bench,
                }
            )
        )
        got = (
            S.semantic_decontaminate(
                corpus, bench, "vec_id", "embedding", "label", threshold=0.4
            )
            .toPandas()
            .set_index("label")
            .sort_index()
        )
        Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
        Bn = B / np.linalg.norm(B, axis=1, keepdims=True)
        mx = np.round(Cn @ Bn.T, 6).max(axis=1)
        for lbl in sorted(set(labs)):
            m = labs == lbl
            assert got.loc[lbl, "n_corpus"] == int(m.sum())
            assert got.loc[lbl, "n_flagged"] == int((mx[m] >= 0.4).sum())
            assert abs(got.loc[lbl, "max_sim"] - mx[m].max()) < 1e-12
            assert got.loc[lbl, "sum_maxsim_e6"] == int(
                sum(round(v * 1e6) for v in mx[m])
            )


def test_lsh_multiprobe_superset_recall(spark):
    """At fixed (planes, tables), probe_bits=1 candidates are a strict
    superset of probe_bits=0 candidates (probe 0 IS the exact bucket),
    so every query's reranked top-k cosine sum must be >= the
    single-probe one, and the result must equal single-probe whenever
    single-probe already found the exact top-k."""
    import numpy as np

    from feast_hive_spark.operators.simsearch import lsh_topk

    rng = np.random.default_rng(7)
    rows = [
        (i, [float(x) for x in rng.normal(size=16)]) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter("vec_id < 6")
    single = lsh_topk(
        df, q, "vec_id", "embedding", k=5, n_planes=4, n_tables=3
    ).toPandas()
    multi = lsh_topk(
        df, q, "vec_id", "embedding", k=5, n_planes=4, n_tables=3,
        probe_bits=1,
    ).toPandas()
    s = single.groupby("query_id")["cosine"].sum()
    m = multi.groupby("query_id")["cosine"].sum()
    assert set(s.index) <= set(m.index)
    for qid in s.index:
        assert m[qid] >= s[qid] - 1e-9
    # and strictly more candidates somewhere on a 3-table index
    assert m.sum() > s.sum()


def test_knn_eval_sample_bp(spark):
    """r14 (r13 verdict #9): the sampled evaluation variant must equal
    the full evaluation run over the pre-filtered slice (same metric,
    smaller corpus), and sample_bp=None must stay the exact full-corpus
    evaluation."""
    import pandas as pd

    from feast_hive_spark.operators.curate import _bucket
    from feast_hive_spark.operators.simsearch import knn_label_accuracy

    rng = __import__("numpy").random.default_rng(5)
    pdf = pd.DataFrame(
        {
            "vec_id": range(60),
            "embedding": [rng.normal(size=4).tolist() for _ in range(60)],
            "label": [i % 3 for i in range(60)],
        }
    )
    df = spark.createDataFrame(pdf)
    sampled = knn_label_accuracy(
        df, "vec_id", "embedding", "label", k=3, sample_bp=5000
    )
    manual = knn_label_accuracy(
        df.filter(_bucket("vec_id", "knneval") < 5000),
        "vec_id", "embedding", "label", k=3,
    )
    assert sorted(map(tuple, sampled.collect())) == sorted(
        map(tuple, manual.collect())
    )
    full = knn_label_accuracy(df, "vec_id", "embedding", "label", k=3)
    n_full = sum(r.n for r in full.collect())
    n_samp = sum(r.n for r in sampled.collect())
    assert n_full == 60 and 0 < n_samp < 60
