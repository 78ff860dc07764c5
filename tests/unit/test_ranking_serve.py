"""Ranking metrics (HR@K/NDCG@K) and top-K serving vs NumPy oracles."""

import numpy as np

from mfx.data import synthetic
from mfx.data.bpr import build_positive_index, sample_negatives
from mfx.data.split import train_test_split
from mfx.eval.ranking import hr_ndcg_at_k
from mfx.models.mf import init_model
from mfx.serve import TopKRecommender


def _model(U, I, rank=8, seed=3):
    m = init_model(seed, U, I, rank, global_mean=3.5)
    return m


def test_hr_ndcg_matches_numpy_oracle():
    U, I, k, n_neg = 60, 40, 5, 20
    coo = synthetic.make_synthetic(U, I, 800, seed=7)
    train, test = train_test_split(coo, 0.25, seed=0)
    model = _model(U, I)
    pos_keys = build_positive_index(coo)
    got = hr_ndcg_at_k(
        model, test, k=k, n_neg=n_neg, seed=11, pos_keys=pos_keys, chunk=128
    )

    # NumPy oracle with the identical deterministic negative draws
    P, Q, bi = map(np.asarray, (model.P, model.Q, model.bi))
    n = test.n_ratings
    negs = np.stack(
        [
            sample_negatives(n, I, 11, epoch=0xC0DE00 + j,
                             users=test.user, pos_keys=pos_keys)
            for j in range(n_neg)
        ],
        axis=1,
    )
    hits = ndcg = mrr = 0.0
    for t in range(n):
        u, p = test.user[t], test.item[t]
        sp = P[u] @ Q[p] + bi[p]
        sn = P[u] @ Q[negs[t]].T + bi[negs[t]]
        rank = 1.0 + np.sum(sn > sp) + 0.5 * np.sum(sn == sp)
        if rank <= k:
            hits += 1.0
            ndcg += 1.0 / np.log2(rank + 1.0)
            mrr += 1.0 / rank
    np.testing.assert_allclose(got["hr"], hits / n, atol=1e-6)
    np.testing.assert_allclose(got["ndcg"], ndcg / n, atol=1e-6)
    np.testing.assert_allclose(got["mrr"], mrr / n, atol=1e-6)
    # negatives never collide with ANY observed positive
    keys = test.user.astype(np.int64)[:, None] * I + negs
    assert not np.isin(keys.reshape(-1), pos_keys).any()


def test_full_ranking_matches_numpy_oracle():
    """Unsampled protocol: rank vs the whole catalog, train-seen items
    excluded from the competitor set, exact oracle parity."""
    from mfx.eval.ranking import full_hr_ndcg_at_k

    U, I, k = 60, 40, 5
    coo = synthetic.make_synthetic(U, I, 800, seed=7)
    train, test = train_test_split(coo, 0.25, seed=0)
    model = _model(U, I)
    got = full_hr_ndcg_at_k(model, test, train=train, k=k, chunk=128)

    P, Q, bi = map(np.asarray, (model.P, model.Q, model.bi))
    full = P @ Q.T + bi[None, :]
    hits = ndcg = mrr = 0.0
    n = test.n_ratings
    for t in range(n):
        u, p = test.user[t], test.item[t]
        s = full[u].copy()
        s[train.item[train.user == u]] = -np.inf  # train-seen excluded
        sp = full[u, p]
        s[p] = -np.inf  # the positive is not its own competitor
        rank = 1.0 + np.sum(s > sp) + 0.5 * np.sum(s == sp)
        if rank <= k:
            hits += 1.0
            ndcg += 1.0 / np.log2(rank + 1.0)
            mrr += 1.0 / rank
    np.testing.assert_allclose(got["hr"], hits / n, atol=1e-6)
    np.testing.assert_allclose(got["ndcg"], ndcg / n, atol=1e-6)
    np.testing.assert_allclose(got["mrr"], mrr / n, atol=1e-6)


def test_full_ranking_no_train_and_validation():
    import pytest

    from mfx.eval.ranking import full_hr_ndcg_at_k

    U, I = 12, 9
    coo = synthetic.make_synthetic(U, I, 90, seed=3)
    model = _model(U, I, rank=4)
    got = full_hr_ndcg_at_k(model, coo, k=I)  # k = full catalog: all hit
    np.testing.assert_allclose(got["hr"], 1.0, atol=1e-6)
    with pytest.raises(ValueError):
        full_hr_ndcg_at_k(model, coo, k=0)
    with pytest.raises(ValueError):
        full_hr_ndcg_at_k(model, coo, k=I + 1)


def test_user_topk_metrics_matches_numpy_oracle():
    """Per-user Recall/Precision/NDCG/MAP@K vs a brute-force oracle that
    re-derives the top-K lists and the textbook metric definitions."""
    from mfx.eval.ranking import user_topk_metrics

    U, I, k = 40, 30, 6
    coo = synthetic.make_synthetic(U, I, 900, seed=2)
    train, test = train_test_split(coo, 0.3, seed=1)
    model = _model(U, I, rank=4, seed=7)
    got = user_topk_metrics(model, test, train=train, k=k, batch=16)

    P, Q = np.asarray(model.P), np.asarray(model.Q)
    bu, bi, mu = np.asarray(model.bu), np.asarray(model.bi), float(model.mu)
    full = P @ Q.T + bi[None, :] + bu[:, None] + mu
    rec = prec = ndcg = ap = 0.0
    users = np.unique(test.user)
    for u in users:
        T = set(np.unique(test.item[test.user == u]).tolist())
        s = full[u].copy()
        s[train.item[train.user == u]] = -np.inf
        top = np.argsort(-s, kind="stable")[:k]
        hits = [1.0 if i in T else 0.0 for i in top]
        rec += sum(hits) / len(T)
        prec += sum(hits) / k
        dcg = sum(h / np.log2(p + 2.0) for p, h in enumerate(hits))
        idcg = sum(1.0 / np.log2(p + 2.0) for p in range(min(k, len(T))))
        ndcg += dcg / idcg
        ap += sum(
            h * sum(hits[: p + 1]) / (p + 1.0) for p, h in enumerate(hits)
        ) / min(k, len(T))
    n = len(users)
    np.testing.assert_allclose(got["recall"], rec / n, atol=1e-6)
    np.testing.assert_allclose(got["precision"], prec / n, atol=1e-6)
    np.testing.assert_allclose(got["ndcg"], ndcg / n, atol=1e-6)
    np.testing.assert_allclose(got["map"], ap / n, atol=1e-6)

    # beyond-accuracy axes off the same lists
    items, _ = TopKRecommender(model, train=train, batch=16).recommend(
        users, k=k
    )
    np.testing.assert_allclose(got["coverage"], np.unique(items).size / I)
    pop = np.bincount(train.item, minlength=I).astype(np.float64)
    p = np.maximum(pop, 1.0) / train.n_ratings
    np.testing.assert_allclose(
        got["novelty"], -np.log2(p[items]).mean(), atol=1e-9
    )


def test_topk_recommender_matches_bruteforce_and_excludes_seen():
    U, I, k = 50, 37, 6
    coo = synthetic.make_synthetic(U, I, 700, seed=5)
    model = _model(U, I, rank=4, seed=9)
    rec = TopKRecommender(model, train=coo, batch=16)  # forces 4 batches
    users = np.arange(U, dtype=np.int32)
    items, scores = rec.recommend(users, k=k)

    P, Q = np.asarray(model.P), np.asarray(model.Q)
    bu, bi, mu = np.asarray(model.bu), np.asarray(model.bi), float(model.mu)
    full = P @ Q.T + bi[None, :] + bu[:, None] + mu
    for u in range(U):
        seen = coo.item[coo.user == u]
        s = full[u].copy()
        s[seen] = -np.inf
        want = np.argsort(-s, kind="stable")[:k]
        # scores must match exactly; items up to equal-score permutation
        np.testing.assert_allclose(scores[u], np.sort(s[want])[::-1], rtol=1e-5)
        assert not np.isin(items[u], seen).any()
        assert set(items[u]) == set(want) or np.allclose(
            s[items[u]], s[want], rtol=1e-5
        )
    # descending order per row
    assert (np.diff(scores, axis=1) <= 1e-6).all()


def test_topk_bf16_tables_preserve_serving_quality():
    """table_dtype='bf16': every served item's TRUE (f32) score must sit
    within bf16 quantization of the f32 serving's kth-best — the lists
    may permute near-ties but never return a materially worse item."""
    import pytest

    U, I, k = 40, 60, 8
    coo = synthetic.make_synthetic(U, I, 700, seed=1)
    model = _model(U, I, rank=8, seed=2)
    users = np.arange(U, dtype=np.int32)
    i32, s32 = TopKRecommender(model, train=coo, batch=16).recommend(
        users, k=k
    )
    i16, s16 = TopKRecommender(
        model, train=coo, batch=16, table_dtype="bf16"
    ).recommend(users, k=k)

    P, Q = np.asarray(model.P, np.float64), np.asarray(model.Q, np.float64)
    bu, bi, mu = np.asarray(model.bu), np.asarray(model.bi), float(model.mu)
    full = P @ Q.T + bi[None, :] + bu[:, None] + mu
    tol = 0.05  # generous vs bf16's ~0.4% relative input rounding
    for u in range(U):
        seen = coo.item[coo.user == u]
        assert not np.isin(i16[u], seen).any()
        assert (full[u][i16[u]] >= s32[u][-1] - tol).all()
        # reported bf16 scores track the true scores
        np.testing.assert_allclose(s16[u], full[u][i16[u]], atol=tol)
    with pytest.raises(ValueError, match="table_dtype"):
        TopKRecommender(model, table_dtype="fp8")


def test_topk_int8_tables_preserve_serving_quality():
    """table_dtype='int8' (per-row symmetric quantization, int32 MXU
    accumulation): every served item's TRUE (f32) score must sit within
    the quantization tolerance of the f32 serving's kth-best, and the
    reported scores must track the true scores."""
    U, I, k = 40, 60, 8
    coo = synthetic.make_synthetic(U, I, 600, seed=11)
    model = _model(U, I, rank=8, seed=6)
    users = np.arange(U, dtype=np.int32)
    _, s32 = TopKRecommender(model, train=coo, batch=16).recommend(
        users, k=k
    )
    i8, s8 = TopKRecommender(
        model, train=coo, batch=16, table_dtype="int8"
    ).recommend(users, k=k)

    P, Q = np.asarray(model.P, np.float64), np.asarray(model.Q, np.float64)
    bu, bi, mu = np.asarray(model.bu), np.asarray(model.bi), float(model.mu)
    full = P @ Q.T + bi[None, :] + bu[:, None] + mu
    # per-row symmetric int8: relative row error <= 0.5/127 per side; on
    # these O(1)-norm factors the dot error stays well under this bound
    tol = 0.05
    for u in range(U):
        seen = coo.item[coo.user == u]
        assert not np.isin(i8[u], seen).any()
        assert (full[u][i8[u]] >= s32[u][-1] - tol).all()
        np.testing.assert_allclose(s8[u], full[u][i8[u]], atol=tol)


def test_topk_recall_target_api():
    """recall_target: approx candidate selection — exact on non-TPU
    backends (approx_max_k lowers to the exact op here), so CPU asserts
    full parity; the recall/latency trade is measured on chip."""
    import pytest

    U, I, k = 30, 50, 7
    coo = synthetic.make_synthetic(U, I, 500, seed=6)
    model = _model(U, I, rank=4, seed=3)
    users = np.arange(U, dtype=np.int32)
    ei, es = TopKRecommender(model, train=coo, batch=16).recommend(users, k)
    ai, as_ = TopKRecommender(
        model, train=coo, batch=16, recall_target=0.95
    ).recommend(users, k)
    np.testing.assert_allclose(as_, es, rtol=1e-6)
    for u in range(U):
        assert set(ai[u]) == set(ei[u])
    with pytest.raises(ValueError, match="recall_target"):
        TopKRecommender(model, recall_target=0.0)


def test_topk_recommender_no_train_and_validation():
    U, I = 10, 12
    model = _model(U, I, rank=4)
    rec = TopKRecommender(model)
    items, scores = rec.recommend([0, 3], k=I)  # full catalog allowed
    assert items.shape == (2, I)
    assert sorted(items[0]) == list(range(I))
    import pytest

    with pytest.raises(ValueError):
        rec.recommend([0], k=0)
    with pytest.raises(ValueError):
        rec.recommend([0], k=I + 1)
    with pytest.raises(ValueError):
        rec.recommend([U], k=1)


def test_similar_items_matches_cosine_oracle():
    import pytest

    from mfx.serve import similar_items

    U, I, k = 20, 31, 5
    model = _model(U, I, rank=6, seed=11)
    queries = np.arange(I, dtype=np.int32)
    nbrs, cos = similar_items(model, queries, k=k, batch=8)  # 4 batches

    Q = np.asarray(model.Q, np.float64)
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    full = Qn @ Qn.T
    for q in range(I):
        s = full[q].copy()
        s[q] = -np.inf  # self excluded
        want = np.argsort(-s, kind="stable")[:k]
        np.testing.assert_allclose(cos[q], np.sort(s[want])[::-1], atol=1e-5)
        assert q not in nbrs[q]
        assert np.allclose(full[q][nbrs[q]], full[q][want], atol=1e-5)
    assert (np.diff(cos, axis=1) <= 1e-6).all()
    assert (cos <= 1.0 + 1e-5).all()

    with pytest.raises(ValueError):
        similar_items(model, [0], k=I)  # self-excluded: max is I-1
    with pytest.raises(ValueError):
        similar_items(model, [I], k=1)
