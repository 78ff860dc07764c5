import numpy as np
import jax.numpy as jnp

from mfx.config import ALSConfig
from mfx.data import synthetic, train_test_split
from mfx.eval import rmse
from mfx.models import init_model
from mfx.solvers.als import als_half_sweep, train_sweeps_als


def test_als_single_solve_matches_numpy():
    """One user solve vs. dense NumPy normal equations."""
    rng = np.random.default_rng(0)
    U, I, k = 17, 23, 4
    coo = synthetic.make_synthetic(U, I, 500, rank=k, seed=1)
    model = init_model(0, U, I, k, global_mean=0.0)  # mu=0, no bias
    by_u = np.argsort(coo.user, kind="stable")
    P, bu = als_half_sweep(
        model.P, model.bu, model.Q, model.bi, model.mu,
        coo.user[by_u], coo.item[by_u], coo.rating[by_u],
        reg=0.1, use_bias=False, row_chunk=8, rating_chunk=128,
    )
    Q = np.asarray(model.Q, np.float64)
    for u in range(U):
        sel = coo.user == u
        if not sel.any():
            continue
        qi = Q[coo.item[sel]]
        A = qi.T @ qi + 0.1 * np.eye(k)
        b = qi.T @ coo.rating[sel]
        ref = np.linalg.solve(A, b)
        np.testing.assert_allclose(np.asarray(P)[u], ref, rtol=2e-4, atol=2e-4)


def test_als_rows_without_ratings_unchanged():
    U, I, k = 10, 10, 4
    coo = synthetic.make_synthetic(U, I, 60, rank=k, seed=2)
    # remove all ratings of user 3
    keep = coo.user != 3
    coo = coo.select(np.flatnonzero(keep))
    model = init_model(1, U, I, k, global_mean=coo.global_mean)
    by_u = np.argsort(coo.user, kind="stable")
    P, bu = als_half_sweep(
        model.P, model.bu, model.Q, model.bi, model.mu,
        coo.user[by_u], coo.item[by_u], coo.rating[by_u],
        reg=0.1, use_bias=True, row_chunk=4, rating_chunk=64,
    )
    np.testing.assert_array_equal(np.asarray(P)[3], np.asarray(model.P)[3])
    np.testing.assert_array_equal(np.asarray(bu)[3], np.asarray(model.bu)[3])


def test_als_converges_and_beats_init():
    coo = synthetic.make_synthetic(300, 250, 15_000, rank=6, noise=0.25, seed=3)
    train, test = train_test_split(coo, test_frac=0.1, seed=0)
    model = init_model(2, 300, 250, 8, global_mean=train.global_mean)
    r0 = rmse(model, test)
    cfg = ALSConfig(reg=0.5, sweeps=6, user_chunk=128, rating_chunk=4096)
    history = []
    for sweep, model in train_sweeps_als(model, train, cfg, use_bias=True):
        history.append(rmse(model, test))
    assert history[-1] < r0
    assert history[-1] < 0.45  # near noise floor
    # monotone-ish improvement across sweeps
    assert history[-1] <= history[0]


def test_als_deterministic():
    coo = synthetic.make_synthetic(100, 80, 3000, rank=4, seed=4)
    outs = []
    for _ in range(2):
        model = init_model(5, 100, 80, 4, global_mean=coo.global_mean)
        cfg = ALSConfig(reg=0.2, sweeps=2, user_chunk=64, rating_chunk=1024)
        for _, model in train_sweeps_als(model, coo, cfg, use_bias=False):
            pass
        outs.append(model)
    np.testing.assert_array_equal(np.asarray(outs[0].P), np.asarray(outs[1].P))
    np.testing.assert_array_equal(np.asarray(outs[0].Q), np.asarray(outs[1].Q))
