"""MMR diversity re-ranking (mfx/serve/rerank.py) vs a NumPy greedy
oracle, plus the recommender-wrapper composition."""

import numpy as np
import pytest

import jax.numpy as jnp

from mfx.models.mf import MFModel
from mfx.serve import MMRRecommender, TopKRecommender, rerank_mmr


def _model(Q, mu=3.0):
    I, r = Q.shape
    return MFModel(
        P=jnp.zeros((4, r), jnp.float32), Q=jnp.asarray(Q, jnp.float32),
        bu=jnp.zeros(4, jnp.float32), bi=jnp.zeros(I, jnp.float32),
        mu=jnp.float32(mu),
    )


def _oracle_mmr(Q, items, scores, k, lam):
    """Greedy MMR, float32 like the device path."""
    B, C = items.shape
    out = np.zeros((B, k), np.int64)
    for b in range(B):
        V = Q[items[b]].astype(np.float32)
        V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        valid = np.isfinite(scores[b])
        s = scores[b][valid]
        lo, hi = s.min(), s.max()
        rel = np.where(
            valid, (scores[b] - lo) / max(hi - lo, 1e-12), 0.0
        ).astype(np.float32)
        maxsim = np.zeros(C, np.float32)
        taken = np.zeros(C, bool)
        for t in range(k):
            util = np.float32(lam) * rel - np.float32(1 - lam) * maxsim
            util[~valid | taken] = -np.inf
            j = int(np.argmax(util))
            out[b, t] = j
            taken[j] = True
            maxsim = np.maximum(maxsim, (V @ V[j]).astype(np.float32))
    return out


@pytest.mark.parametrize("lam", [0.0, 0.3, 0.7, 1.0])
def test_rerank_matches_numpy_oracle(lam):
    rng = np.random.default_rng(0)
    I, r, B, C, k = 40, 6, 5, 12, 6
    Q = rng.normal(0, 1, (I, r)).astype(np.float32)
    items = np.stack(
        [rng.permutation(I)[:C] for _ in range(B)]
    ).astype(np.int32)
    scores = rng.normal(3, 1, (B, C)).astype(np.float32)
    scores[0, -2:] = -np.inf  # exclusion pads must be skipped
    got_i, got_s = rerank_mmr(_model(Q), items, scores, k, lam=lam)
    sel = _oracle_mmr(Q, items, scores, k, lam)
    rows = np.arange(B)[:, None]
    np.testing.assert_array_equal(got_i, items[rows, sel])
    np.testing.assert_array_equal(got_s, scores[rows, sel])
    assert np.isfinite(got_s).all()


def test_lam_one_is_pure_relevance_order():
    rng = np.random.default_rng(1)
    Q = rng.normal(0, 1, (30, 4)).astype(np.float32)
    items = np.arange(20, dtype=np.int32)[None, :]
    scores = rng.normal(0, 1, (1, 20)).astype(np.float32)
    got_i, got_s = rerank_mmr(_model(Q), items, scores, 8, lam=1.0)
    order = np.argsort(-scores[0], kind="stable")[:8]
    np.testing.assert_array_equal(got_i[0], items[0][order])
    assert (np.diff(got_s[0]) <= 0).all()


def test_mmr_diversifies_clustered_catalog():
    """Catalog = two tight clusters; relevance slightly favors cluster
    A. lam=1 fills the list from A; lam=0.5 must mix in cluster B and
    cut mean intra-list cosine."""
    rng = np.random.default_rng(2)
    r = 8
    a, b = rng.normal(0, 1, r), rng.normal(0, 1, r)
    a = a / np.linalg.norm(a)
    b = b - a * (a @ b)  # orthogonal to the (normalized) a
    b /= np.linalg.norm(b)
    Q = np.concatenate([
        a[None] + rng.normal(0, 0.02, (15, r)),   # cluster A: items 0-14
        b[None] + rng.normal(0, 0.02, (15, r)),   # cluster B: items 15-29
    ]).astype(np.float32)
    items = np.arange(30, dtype=np.int32)[None, :]
    scores = np.concatenate(
        [np.linspace(5, 4.5, 15), np.linspace(4.4, 4.0, 15)]
    ).astype(np.float32)[None, :]

    def mean_cos(ids):
        V = Q[ids]
        V = V / np.linalg.norm(V, axis=1, keepdims=True)
        S = V @ V.T
        iu = np.triu_indices(len(ids), 1)
        return float(S[iu].mean())

    plain, _ = rerank_mmr(_model(Q), items, scores, 10, lam=1.0)
    assert (plain[0] < 15).all()  # pure relevance stays in cluster A
    mixed, _ = rerank_mmr(_model(Q), items, scores, 10, lam=0.5)
    assert (mixed[0] >= 15).any()  # diversity pulls in cluster B
    # one B pick saturates max-sim for its whole cluster (MMR uses the
    # MAX over selected), so the drop is real but bounded
    assert mean_cos(mixed[0]) < 0.85 * mean_cos(plain[0])
    assert mixed[0, 1] == 15  # the 2nd slot is the cross-cluster jump
    assert mixed[0, 0] == plain[0, 0] == 0  # slot 1 is always top-rel


def test_mmr_recommender_wraps_stock_topk():
    rng = np.random.default_rng(3)
    U, I, r = 6, 40, 4
    model = MFModel(
        P=jnp.asarray(rng.normal(0, 0.5, (U, r)).astype(np.float32)),
        Q=jnp.asarray(rng.normal(0, 0.5, (I, r)).astype(np.float32)),
        bu=jnp.zeros(U, jnp.float32), bi=jnp.zeros(I, jnp.float32),
        mu=jnp.float32(3.0),
    )
    rec = MMRRecommender(TopKRecommender(model, batch=4), lam=0.6, pool=3)
    assert rec.model is model
    items, scores = rec.recommend(np.arange(U, dtype=np.int32), k=5)
    assert items.shape == scores.shape == (U, 5)
    for row in items:
        assert len(set(row.tolist())) == 5
    # the diversified list is a subset of the inner pool
    pool_i, _ = TopKRecommender(model, batch=4).recommend(
        np.arange(U, dtype=np.int32), k=15
    )
    for b in range(U):
        assert set(items[b].tolist()) <= set(pool_i[b].tolist())

    with pytest.raises(ValueError, match="lam"):
        MMRRecommender(rec, model=model, lam=1.5)
    with pytest.raises(ValueError, match="k must"):
        rerank_mmr(model, items, scores, 9)


def test_mmr_overflow_fills_without_duplicates():
    """k beyond the finite pool: remaining slots fill from the -inf
    overflow pads in pool order — unique items, stock semantics."""
    rng = np.random.default_rng(4)
    Q = rng.normal(0, 1, (20, 4)).astype(np.float32)
    items = np.arange(8, dtype=np.int32)[None, :]
    scores = np.array(
        [[4.0, 3.5, 3.0, -np.inf, -np.inf, -np.inf, -np.inf, -np.inf]],
        np.float32,
    )
    got_i, got_s = rerank_mmr(_model(Q), items, scores, 6, lam=0.5)
    assert len(set(got_i[0].tolist())) == 6
    assert set(got_i[0][:3].tolist()) == {0, 1, 2}
    np.testing.assert_array_equal(got_i[0][3:], [3, 4, 5])  # pool order
    assert np.isfinite(got_s[0][:3]).all()
    assert (~np.isfinite(got_s[0][3:])).all()


def test_mmr_clamps_overfetch_to_inner_pool():
    """A fused inner recommender's candidate pool caps the MMR
    over-fetch (regression: pool*k used to exceed the fused pool and
    400 every request on small catalogs)."""
    from mfx.serve import FusedTopKRecommender

    rng = np.random.default_rng(5)
    U, I, r = 4, 1280, 4  # 10 tiles at tile=128 -> fused pool 20
    model = MFModel(
        P=jnp.asarray(rng.normal(0, 0.5, (U, r)).astype(np.float32)),
        Q=jnp.asarray(rng.normal(0, 0.5, (I, r)).astype(np.float32)),
        bu=jnp.zeros(U, jnp.float32), bi=jnp.zeros(I, jnp.float32),
        mu=jnp.float32(3.0),
    )
    inner = FusedTopKRecommender(model, batch=4, tile=128)
    rec = MMRRecommender(inner, lam=0.7, pool=4)  # 4*10 > pool 20
    items, scores = rec.recommend(np.arange(U, dtype=np.int32), k=10)
    assert items.shape == (U, 10)
    with pytest.raises(ValueError, match="exceeds the inner"):
        rec.recommend(np.arange(U, dtype=np.int32), k=21)
