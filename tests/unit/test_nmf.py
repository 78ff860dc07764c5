"""Weighted NMF (mfx/solvers/nmf.py): NumPy oracle for the multiplicative
half-sweep, non-negativity + objective monotonicity, recovery of a true
non-negative low-rank model, and driver/validation wiring."""

import jax.numpy as jnp
import numpy as np
import pytest

from mfx.config import NMFConfig, TrainConfig, DataConfig, ModelConfig
from mfx.data.coo import RatingsCOO
from mfx.models.mf import MFModel, init_model
from mfx.solvers.nmf import nmf_half_sweep, train_sweeps_nmf

_EPS = 1e-9


def _toy(U=25, I=18, n=300, seed=0):
    rng = np.random.default_rng(seed)
    u = rng.integers(0, U, n).astype(np.int32)
    i = rng.integers(0, I, n).astype(np.int32)
    r = rng.uniform(0.5, 5.0, n).astype(np.float32)
    return RatingsCOO(user=u, item=i, rating=r, num_users=U, num_items=I)


def _mu_oracle(P, Q, u, i, r, reg, inner_iters):
    """Direct per-row multiplicative update in float64 NumPy."""
    U, k = P.shape
    Pn = P.astype(np.float64).copy()
    for _ in range(inner_iters):
        out = Pn.copy()
        for row in range(U):
            m = u == row
            cnt = int(m.sum())
            if cnt == 0:
                continue
            q = Q[i[m]].astype(np.float64)
            A = q.T @ q
            b = (r[m, None] * q).sum(0)
            lam = reg * max(cnt, 1)
            p = Pn[row]
            out[row] = p * b / (A @ p + lam * p + _EPS)
        Pn = out
    return Pn.astype(np.float32)


@pytest.mark.parametrize("inner_iters", [1, 3])
def test_half_sweep_matches_numpy_oracle(inner_iters):
    coo = _toy()
    rng = np.random.default_rng(1)
    k = 5
    P = rng.uniform(0.1, 1.0, (coo.num_users, k)).astype(np.float32)
    Q = rng.uniform(0.1, 1.0, (coo.num_items, k)).astype(np.float32)
    by_u = np.argsort(coo.user, kind="stable")
    got = nmf_half_sweep(
        jnp.asarray(P), jnp.asarray(Q),
        coo.user[by_u], coo.item[by_u], coo.rating[by_u],
        reg=0.05, row_chunk=8, inner_iters=inner_iters,
    )
    want = _mu_oracle(P, Q, coo.user, coo.item, coo.rating, 0.05, inner_iters)
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-5, atol=3e-6)
    assert (np.asarray(got) >= 0).all()


def _objective(model, coo, reg):
    P = np.asarray(model.P, np.float64)
    Q = np.asarray(model.Q, np.float64)
    pred = (P[coo.user] * Q[coo.item]).sum(1)
    e = coo.rating - pred
    deg_u = np.bincount(coo.user, minlength=coo.num_users)
    deg_i = np.bincount(coo.item, minlength=coo.num_items)
    return (
        float((e * e).sum())
        + reg * float((deg_u[:, None] * P * P).sum())
        + reg * float((deg_i[:, None] * Q * Q).sum())
    )


def test_sweeps_monotone_and_nonnegative():
    coo = _toy(U=60, I=40, n=1500, seed=3)
    m0 = init_model(0, coo.num_users, coo.num_items, rank=6, global_mean=2.5)
    cfg = NMFConfig(reg=0.05, sweeps=6, inner_iters=2)
    objs = []
    for _, model in train_sweeps_nmf(m0, coo, cfg):
        assert (np.asarray(model.P) >= 0).all()
        assert (np.asarray(model.Q) >= 0).all()
        objs.append(_objective(model, coo, cfg.reg))
    # multiplicative updates never increase the (regularized) objective
    assert all(b <= a * (1 + 1e-6) for a, b in zip(objs, objs[1:])), objs


def test_recovers_true_nonneg_model():
    rng = np.random.default_rng(7)
    U, I, k, n = 80, 60, 4, 4000
    tp = rng.uniform(0.2, 1.2, (U, k))
    tq = rng.uniform(0.2, 1.2, (I, k))
    u = rng.integers(0, U, n).astype(np.int32)
    i = rng.integers(0, I, n).astype(np.int32)
    r = ((tp[u] * tq[i]).sum(1) + rng.normal(0, 0.05, n)).astype(np.float32)
    r = np.maximum(r, 0.0)
    coo = RatingsCOO(user=u, item=i, rating=r, num_users=U, num_items=I)
    m0 = init_model(1, U, I, rank=6, global_mean=float(r.mean()))
    final = None
    for _, final in train_sweeps_nmf(m0, coo, NMFConfig(reg=0.01, sweeps=15)):
        pass
    pred = (np.asarray(final.P)[u] * np.asarray(final.Q)[i]).sum(1)
    rmse = float(np.sqrt(((r - pred) ** 2).mean()))
    # multiplicative updates converge monotonically but slowly (their
    # classical property) — 15 sweeps lands ~3x the 0.05 noise floor on
    # this problem and keeps descending (~0.11 at 40 sweeps)
    assert rmse < 0.18, rmse


def test_rejects_bias_and_negative_ratings():
    coo = _toy()
    m0 = init_model(0, coo.num_users, coo.num_items, rank=4, global_mean=2.0)
    with pytest.raises(ValueError, match="bias-free"):
        list(train_sweeps_nmf(m0, coo, NMFConfig(sweeps=1), use_bias=True))
    neg = RatingsCOO(
        user=coo.user, item=coo.item,
        rating=(coo.rating - 10).astype(np.float32),
        num_users=coo.num_users, num_items=coo.num_items,
    )
    with pytest.raises(ValueError, match="non-negative"):
        list(train_sweeps_nmf(m0, neg, NMFConfig(sweeps=1)))


def test_driver_nmf_end_to_end(tmp_path):
    from mfx.train.driver import train

    cfg = TrainConfig(
        name="nmf-smoke",
        solver="nmf",
        data=DataConfig(dataset="synthetic-small", root=str(tmp_path)),
        model=ModelConfig(rank=8, use_bias=False),
        nmf=NMFConfig(reg=0.02, sweeps=3),
    )
    res = train(cfg)
    assert res.epochs_run == 3
    assert 0 < res.test_rmse < 1.5
    assert (np.asarray(res.model.P) >= 0).all()
    assert (np.asarray(res.model.Q) >= 0).all()
