"""Fold-in (mfx/serve/foldin.py) vs a NumPy normal-equation oracle."""

import numpy as np
import pytest

from mfx.models.mf import init_model
from mfx.serve.foldin import fold_in


def _oracle_row(Q, bi, mu, ids, r, reg, use_bias):
    q = Q[ids]
    if use_bias:
        q = np.concatenate([q, np.ones((len(ids), 1))], axis=1)
    resid = r - mu - bi[ids]
    A = q.T @ q + reg * max(len(ids), 1) * np.eye(q.shape[1])
    return np.linalg.solve(A, q.T @ resid)


def test_fold_in_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    U, I, k, reg = 30, 50, 8, 0.05
    model = init_model(1, U, I, k, global_mean=3.4)
    Q, bi = np.asarray(model.Q, np.float64), np.asarray(model.bi, np.float64)
    mu = float(model.mu)

    hists = []
    for deg in (1, 3, 17, 40):
        ids = rng.choice(I, size=deg, replace=False).astype(np.int32)
        r = rng.uniform(0.5, 5.0, size=deg).astype(np.float32)
        hists.append((ids, r))

    P_new, bu_new = fold_in(model, hists, reg, use_bias=True)
    assert P_new.shape == (4, k) and bu_new.shape == (4,)
    for b, (ids, r) in enumerate(hists):
        sol = _oracle_row(Q, bi, mu, ids, r.astype(np.float64), reg, True)
        np.testing.assert_allclose(np.asarray(P_new[b]), sol[:k], atol=2e-5)
        np.testing.assert_allclose(float(bu_new[b]), sol[k], atol=2e-5)


def test_fold_in_unbiased_and_empty():
    rng = np.random.default_rng(2)
    U, I, k, reg = 10, 24, 4, 0.1
    model = init_model(5, U, I, k, global_mean=3.0)
    Q = np.asarray(model.Q, np.float64)
    ids = rng.choice(I, size=6, replace=False).astype(np.int32)
    r = rng.uniform(1, 5, size=6).astype(np.float32)
    hists = [(ids, r), (np.zeros(0, np.int32), np.zeros(0, np.float32))]
    P_new, bu_new = fold_in(model, hists, reg, use_bias=False)
    sol = _oracle_row(Q, np.zeros(I), float(model.mu), ids,
                      r.astype(np.float64), reg, False)
    np.testing.assert_allclose(np.asarray(P_new[0]), sol, atol=2e-5)
    # empty history -> zero factors (popularity baseline) and no NaNs
    np.testing.assert_array_equal(np.asarray(P_new[1]), 0.0)
    np.testing.assert_array_equal(np.asarray(bu_new), 0.0)


def test_fold_in_items_transpose():
    rng = np.random.default_rng(3)
    U, I, k, reg = 40, 12, 8, 0.02
    model = init_model(7, U, I, k, global_mean=3.6)
    P, bu = np.asarray(model.P, np.float64), np.asarray(model.bu, np.float64)
    ids = rng.choice(U, size=9, replace=False).astype(np.int32)
    r = rng.uniform(0.5, 5.0, size=9).astype(np.float32)
    Q_new, bi_new = fold_in(model, [(ids, r)], reg, transpose=True)
    sol = _oracle_row(P, bu, float(model.mu), ids, r.astype(np.float64),
                      reg, True)
    np.testing.assert_allclose(np.asarray(Q_new[0]), sol[:k], atol=2e-5)
    np.testing.assert_allclose(float(bi_new[0]), sol[k], atol=2e-5)


def test_fold_in_max_deg_keeps_most_recent():
    rng = np.random.default_rng(4)
    U, I, k, reg = 10, 64, 4, 0.05
    model = init_model(9, U, I, k, global_mean=3.2)
    ids = rng.permutation(I)[:20].astype(np.int32)
    r = rng.uniform(1, 5, size=20).astype(np.float32)
    full, _ = fold_in(model, [(ids[-8:], r[-8:])], reg)
    capped, _ = fold_in(model, [(ids, r)], reg, max_deg=8)
    np.testing.assert_allclose(
        np.asarray(capped), np.asarray(full), atol=1e-6
    )


def test_fold_in_implicit_matches_ials_half_sweep():
    """Folding an EXISTING user's implicit history into the frozen item
    table must reproduce that user's iALS half-sweep row exactly (same
    normal equations: G + Σ αr y yᵀ + λI)."""
    import numpy as np

    from mfx.data.coo import RatingsCOO
    from mfx.serve.foldin import fold_in_implicit
    from mfx.solvers.ials import ials_half_sweep

    rng = np.random.default_rng(7)
    U, I, k, alpha, reg = 12, 40, 6, 15.0, 0.4
    u = np.repeat(np.arange(U, dtype=np.int32), 5)
    i = rng.integers(0, I, size=u.shape[0]).astype(np.int32)
    key = u.astype(np.int64) * I + i
    _, first = np.unique(key, return_index=True)
    u, i = u[first], i[first]
    r = rng.integers(1, 4, size=u.shape[0]).astype(np.float32)
    coo = RatingsCOO(u, i, r, U, I, synthetic=True)
    model = init_model(3, U, I, k)

    by_u = np.argsort(coo.user, kind="stable")
    P_sweep = np.asarray(
        ials_half_sweep(
            model.P, model.Q, coo.user[by_u], coo.item[by_u],
            coo.rating[by_u], alpha, reg,
        )
    )
    hists = [
        (coo.item[coo.user == uu], coo.rating[coo.user == uu])
        for uu in range(U)
    ]
    P_fold = np.asarray(fold_in_implicit(model, hists, alpha, reg))
    np.testing.assert_allclose(P_fold, P_sweep, rtol=2e-4, atol=2e-5)


def test_recommend_cold_serves_new_user():
    """Cold-start serving: a constructed history pointing along a known
    factor direction must surface the nearest unseen items, with the
    history's own items excluded and scores matching the fold-in row's
    true scores."""
    import dataclasses

    import jax.numpy as jnp

    from mfx.serve import recommend_cold

    rng = np.random.default_rng(0)
    I, r = 40, 4
    Q = np.zeros((I, r), np.float32)
    Q[:10, 0] = np.linspace(1.0, 0.1, 10)   # a "taste axis": items 0..9
    Q[10:, 1:] = rng.normal(0, 0.1, (30, r - 1))
    model = init_model(0, 5, I, rank=r, global_mean=3.0)
    model = dataclasses.replace(
        model, Q=jnp.asarray(Q), bi=jnp.zeros(I), bu=jnp.zeros(5),
    )
    # history: loves items 1 and 2 (both on the taste axis)
    hist = [(np.array([1, 2], np.int32), np.array([5.0, 5.0], np.float32))]
    items, scores = recommend_cold(model, hist, k=3, reg=0.05)
    # the top recommendation is the strongest unseen item on the axis
    assert items[0, 0] == 0
    assert 1 not in items[0] and 2 not in items[0]
    # scores equal the folded row's true predictions
    from mfx.serve.foldin import fold_in

    P_new, bu_new = fold_in(model, hist, 0.05)
    true = np.asarray(P_new) @ Q.T + np.asarray(bu_new)[:, None] + 3.0
    np.testing.assert_allclose(scores[0], true[0][items[0]], rtol=1e-5)

    # empty history falls back to the popularity/bias baseline, finite
    items2, scores2 = recommend_cold(
        model, [(np.zeros(0, np.int32), np.zeros(0, np.float32))], k=3
    )
    assert np.isfinite(scores2).all()

    with pytest.raises(ValueError, match="out of range"):
        recommend_cold(model, [(np.array([I]), np.array([5.0]))], k=2)
    with pytest.raises(ValueError, match="k must"):
        recommend_cold(model, hist, k=0)
