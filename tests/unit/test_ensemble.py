"""Model blending (mfx/models/ensemble.py): ridge oracle, exact
single-model view, complementary-members quality, serving composition."""

import numpy as np
import pytest

from mfx.data.coo import RatingsCOO
from mfx.models.ensemble import blend_as_mf, fit_blend
from mfx.models.mf import MFModel, init_model

import jax.numpy as jnp


def _rand_model(seed, U, I, rank, mu=3.3):
    rng = np.random.default_rng(seed)
    return MFModel(
        P=jnp.asarray(rng.normal(0, 0.3, (U, rank)).astype(np.float32)),
        Q=jnp.asarray(rng.normal(0, 0.3, (I, rank)).astype(np.float32)),
        bu=jnp.asarray(rng.normal(0, 0.1, U).astype(np.float32)),
        bi=jnp.asarray(rng.normal(0, 0.1, I).astype(np.float32)),
        mu=jnp.float32(mu),
    )


def test_blend_as_mf_is_exact():
    """The concatenated-factor view predicts exactly the weighted sum of
    member predictions plus the intercept — ranks may differ."""
    U, I = 17, 23
    models = [_rand_model(0, U, I, 4), _rand_model(1, U, I, 8),
              _rand_model(2, U, I, 2, mu=2.0)]
    w = np.array([0.5, 0.3, -0.1], np.float32)
    c = 0.7
    blend = blend_as_mf(models, w, intercept=c)
    assert blend.rank == 4 + 8 + 2
    rng = np.random.default_rng(3)
    u = rng.integers(0, U, 200).astype(np.int32)
    i = rng.integers(0, I, 200).astype(np.int32)
    want = c + sum(
        float(wm) * np.asarray(m.predict(u, i), np.float64)
        for wm, m in zip(w, models)
    )
    np.testing.assert_allclose(
        np.asarray(blend.predict(u, i), np.float64), want,
        rtol=1e-5, atol=1e-5,
    )


def test_fit_blend_matches_ridge_oracle():
    U, I, n = 30, 40, 500
    models = [_rand_model(4, U, I, 4), _rand_model(5, U, I, 4)]
    rng = np.random.default_rng(6)
    u = rng.integers(0, U, n).astype(np.int32)
    i = rng.integers(0, I, n).astype(np.int32)
    y = rng.normal(3.5, 0.8, n).astype(np.float32)
    val = RatingsCOO(u, i, y, num_users=U, num_items=I)
    reg = 1e-3
    res = fit_blend(models, val, reg=reg)
    # oracle: dense ridge with unregularized intercept
    X = np.stack(
        [np.asarray(m.predict(u, i), np.float64) for m in models], axis=1
    )
    Xa = np.concatenate([X, np.ones((n, 1))], axis=1)
    A = Xa.T @ Xa + np.diag([reg * n, reg * n, 0.0])
    w = np.linalg.solve(A, Xa.T @ y.astype(np.float64))
    np.testing.assert_allclose(res.weights, w[:2], rtol=1e-6)
    np.testing.assert_allclose(res.intercept, w[2], rtol=1e-6)
    # reported rmse is the true residual rmse
    r = Xa @ w - y
    np.testing.assert_allclose(
        res.val_rmse, np.sqrt(np.mean(r**2)), rtol=1e-6
    )


def test_blend_of_complementary_members_beats_each():
    """Truth uses 4 latent dims; member A only knows dims 0-1, member B
    only dims 2-3 — the fitted blend must beat both members on a fresh
    holdout, with weights near (1, 1)."""
    rng = np.random.default_rng(7)
    U, I, r = 60, 80, 4
    P = rng.normal(0, 0.5, (U, r)).astype(np.float32)
    Q = rng.normal(0, 0.5, (I, r)).astype(np.float32)
    mu = 3.5

    def model_knowing(dims):
        Pm, Qm = np.zeros_like(P), np.zeros_like(Q)
        Pm[:, dims], Qm[:, dims] = P[:, dims], Q[:, dims]
        return MFModel(
            P=jnp.asarray(Pm), Q=jnp.asarray(Qm),
            bu=jnp.zeros(U, jnp.float32), bi=jnp.zeros(I, jnp.float32),
            mu=jnp.float32(mu),
        )

    A, B = model_knowing([0, 1]), model_knowing([2, 3])
    u = rng.integers(0, U, 4000).astype(np.int32)
    i = rng.integers(0, I, 4000).astype(np.int32)
    y = (mu + np.einsum("nd,nd->n", P[u], Q[i])
         + rng.normal(0, 0.05, 4000)).astype(np.float32)
    val = RatingsCOO(u[:2000], i[:2000], y[:2000],
                     num_users=U, num_items=I)
    test = RatingsCOO(u[2000:], i[2000:], y[2000:],
                      num_users=U, num_items=I)
    res = fit_blend([A, B], val, reg=1e-6)
    np.testing.assert_allclose(res.weights, [1.0, 1.0], atol=0.05)
    blend = blend_as_mf([A, B], res.weights, res.intercept)

    def rmse(m):
        p = np.asarray(m.predict(test.user, test.item))
        return float(np.sqrt(np.mean((p - test.rating) ** 2)))

    assert rmse(blend) < 0.5 * min(rmse(A), rmse(B))
    assert rmse(blend) < 0.1  # near the injected noise floor


def test_blend_serves_through_stock_recommender():
    from mfx.serve import TopKRecommender

    U, I = 12, 25
    models = [_rand_model(8, U, I, 4), _rand_model(9, U, I, 6)]
    w = np.array([0.6, 0.4], np.float32)
    blend = blend_as_mf(models, w, intercept=0.1)
    rec = TopKRecommender(blend, batch=4)
    items, scores = rec.recommend(np.arange(4, dtype=np.int32), k=3)
    # oracle: argmax of the weighted dense score matrix
    dense = 0.1 + sum(
        float(wm) * (
            np.asarray(m.P) @ np.asarray(m.Q).T
            + np.asarray(m.bu)[:, None] + np.asarray(m.bi)[None, :]
            + float(m.mu)
        ) for wm, m in zip(w, models)
    )
    np.testing.assert_array_equal(
        items, np.argsort(-dense[:4], axis=1, kind="stable")[:, :3]
    )
    np.testing.assert_allclose(
        scores, np.sort(dense[:4], axis=1)[:, ::-1][:, :3], rtol=1e-5
    )


def test_blend_validation():
    with pytest.raises(ValueError, match="at least one"):
        blend_as_mf([], np.zeros(0))
    a = init_model(0, 5, 6, rank=2, global_mean=3.0)
    b = init_model(0, 5, 7, rank=2, global_mean=3.0)
    with pytest.raises(ValueError, match="share"):
        blend_as_mf([a, b], np.ones(2, np.float32))
    with pytest.raises(ValueError, match="weights"):
        blend_as_mf([a], np.ones(2, np.float32))
    empty = RatingsCOO(np.zeros(0, np.int32), np.zeros(0, np.int32),
                       np.zeros(0, np.float32), num_users=5, num_items=6)
    with pytest.raises(ValueError, match="non-empty"):
        fit_blend([a], empty)


def test_blend_as_mf_preserves_bf16_tables():
    """bf16 member tables stay bf16 in the blend (regression: the f32
    weight scalar used to silently promote P)."""
    a = _rand_model(10, 6, 7, 3).astype(jnp.bfloat16)
    b = _rand_model(11, 6, 7, 2).astype(jnp.bfloat16)
    blend = blend_as_mf([a, b], np.array([0.6, 0.4], np.float32))
    assert blend.P.dtype == jnp.bfloat16
    assert blend.Q.dtype == jnp.bfloat16
    assert blend.bu.dtype == jnp.bfloat16
