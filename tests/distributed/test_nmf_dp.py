"""Data-parallel NMF (mfx/parallel/nmf_dp.py) vs the single-device
solver — partial Grams psum to the same multiplicative update."""

import jax
import numpy as np
import pytest

from mfx.config import NMFConfig, TrainConfig, DataConfig, ModelConfig, ParallelConfig
from mfx.data.synthetic import make_synthetic
from mfx.models.mf import init_model
from mfx.parallel.nmf_dp import train_sweeps_nmf_dp
from mfx.runtime.mesh import make_mesh
from mfx.solvers.nmf import train_sweeps_nmf

requires_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@requires_8
def test_nmf_dp_matches_single_device():
    coo = make_synthetic(250, 120, 6000, rank=6, noise=0.2, seed=2)
    cfg = NMFConfig(reg=0.05, sweeps=3, inner_iters=2)

    model = init_model(3, coo.num_users, coo.num_items, rank=6,
                      global_mean=2.5)
    for _, single in train_sweeps_nmf(model, coo, cfg):
        pass

    mesh = make_mesh(data=2, model=4)
    model = init_model(3, coo.num_users, coo.num_items, rank=6,
                      global_mean=2.5)
    for _, dp in train_sweeps_nmf_dp(model, coo, cfg, mesh):
        pass

    assert (np.asarray(dp.P) >= 0).all() and (np.asarray(dp.Q) >= 0).all()
    # psum reassociates the piece partial sums -> f32-level tolerance
    np.testing.assert_allclose(
        np.asarray(dp.P), np.asarray(single.P), rtol=5e-4, atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(dp.Q), np.asarray(single.Q), rtol=5e-4, atol=5e-5
    )


@requires_8
def test_driver_routes_nmf_dp(tmp_path):
    from mfx.train.driver import train

    cfg = TrainConfig(
        name="nmf-dp-smoke",
        solver="nmf",
        data=DataConfig(dataset="synthetic-small", root=str(tmp_path)),
        model=ModelConfig(rank=6, use_bias=False),
        nmf=NMFConfig(reg=0.02, sweeps=2),
        parallel=ParallelConfig(mode="dp", data_axis=2, model_axis=4),
    )
    res = train(cfg)
    assert res.epochs_run == 2
    assert 0 < res.test_rmse < 1.5
    assert (np.asarray(res.model.P) >= 0).all()
