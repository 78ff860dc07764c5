"""Data-parallel iALS (mfx/parallel/ials_dp.py) vs the single-device
solver — partial weighted Grams psum to the same normal equations."""

import dataclasses

import jax
import numpy as np
import pytest

from mfx.config import IALSConfig
from mfx.data.synthetic import make_implicit_synthetic
from mfx.models.mf import init_model
from mfx.parallel.ials_dp import train_sweeps_ials_dp
from mfx.runtime.mesh import make_mesh
from mfx.solvers.ials import train_sweeps_ials

requires_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@requires_8
def test_ials_dp_matches_single_device():
    coo = make_implicit_synthetic(300, 150, 7000, rank=8, seed=4)
    cfg = IALSConfig(alpha=12.0, reg=0.3, sweeps=2)

    model = init_model(1, coo.num_users, coo.num_items, rank=8)
    for _, single in train_sweeps_ials(model, coo, cfg):
        pass

    mesh = make_mesh(data=2, model=4)
    model = init_model(1, coo.num_users, coo.num_items, rank=8)
    for _, dp in train_sweeps_ials_dp(model, coo, cfg, mesh):
        pass

    # psum reassociates the piece partial sums -> f32-level tolerance
    np.testing.assert_allclose(
        np.asarray(dp.P), np.asarray(single.P), rtol=3e-4, atol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(dp.Q), np.asarray(single.Q), rtol=3e-4, atol=3e-5
    )


@requires_8
def test_driver_routes_ials_dp(tmp_path):
    from mfx.config import DataConfig, ModelConfig, ParallelConfig, TrainConfig
    from mfx.train.driver import train

    cfg = TrainConfig(
        name="ials_dp_smoke",
        solver="ials",
        data=DataConfig(dataset="synthetic-small-implicit", test_frac=0.1),
        model=ModelConfig(rank=8, use_bias=False),
        ials=IALSConfig(alpha=10.0, reg=0.1, sweeps=2),
        parallel=ParallelConfig(mode="dp", data_axis=8),
        log_path=str(tmp_path / "log.jsonl"),
    )
    res = train(cfg)
    assert res.epochs_run == 2
    assert res.test_auc is not None and 0.0 <= res.test_auc <= 1.0
