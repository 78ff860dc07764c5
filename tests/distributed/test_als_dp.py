"""Data-parallel ALS (K3 x P1) on the 8-device virtual mesh."""

import numpy as np

from mfx.config import ALSConfig
from mfx.data import synthetic, train_test_split
from mfx.eval import rmse
from mfx.models import init_model
from mfx.runtime.mesh import make_mesh
from mfx.solvers.als import train_sweeps_als
from mfx.parallel.als_dp import train_sweeps_als_dp


def _final(gen):
    for _, model in gen:
        pass
    return model


def test_als_dp_matches_single_device():
    """Sharded Gram accumulation + psum must reproduce the single-device
    half-sweeps (same bucketing, different summation grouping -> f32
    tolerance, not bitwise)."""
    coo = synthetic.make_synthetic(300, 250, 15_000, rank=6, noise=0.25, seed=3)
    train, _ = train_test_split(coo, test_frac=0.1, seed=0)
    cfg = ALSConfig(reg=0.01, sweeps=2, user_chunk=128)
    mesh = make_mesh(data=2, model=4)

    m0 = init_model(2, 300, 250, 8, global_mean=train.global_mean)
    ref = _final(train_sweeps_als(m0, train, cfg, use_bias=True))
    got = _final(train_sweeps_als_dp(m0, train, cfg, mesh, use_bias=True))
    np.testing.assert_allclose(
        np.asarray(got.P), np.asarray(ref.P), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(got.Q), np.asarray(ref.Q), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(got.bu), np.asarray(ref.bu), rtol=2e-4, atol=2e-4
    )


def test_als_dp_deterministic_and_converges():
    coo = synthetic.make_synthetic(200, 160, 8_000, rank=4, noise=0.3, seed=5)
    train, test = train_test_split(coo, test_frac=0.1, seed=0)
    cfg = ALSConfig(reg=0.01, sweeps=3, user_chunk=64)
    mesh = make_mesh(data=8, model=1)
    outs = []
    for _ in range(2):
        m = init_model(4, 200, 160, 8, global_mean=train.global_mean)
        outs.append(_final(train_sweeps_als_dp(m, train, cfg, mesh)))
    np.testing.assert_array_equal(np.asarray(outs[0].P), np.asarray(outs[1].P))
    np.testing.assert_array_equal(np.asarray(outs[0].Q), np.asarray(outs[1].Q))
    m0 = init_model(4, 200, 160, 8, global_mean=train.global_mean)
    assert rmse(outs[0], test) < rmse(m0, test)
