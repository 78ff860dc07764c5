"""Ring-sharded NMF (mfx/parallel/nmf_ring.py) vs the single-device
solver — same normal-equation blocks, different grouping/order; the
multiplicative update replaces the Cholesky solve."""

import jax
import numpy as np
import pytest

from mfx.config import (
    DataConfig,
    ModelConfig,
    NMFConfig,
    ParallelConfig,
    TrainConfig,
)
from mfx.data.synthetic import make_synthetic
from mfx.models.mf import init_model
from mfx.parallel.nmf_ring import train_sweeps_nmf_ring
from mfx.runtime.mesh import make_mesh
from mfx.solvers.nmf import train_sweeps_nmf

requires_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _final(gen):
    for _, m in gen:
        pass
    return m


@requires_8
def test_nmf_ring_matches_single_device():
    coo = make_synthetic(250, 120, 6000, rank=6, noise=0.2, seed=2)
    cfg = NMFConfig(reg=0.05, sweeps=3, inner_iters=2, user_chunk=64)

    model = init_model(3, coo.num_users, coo.num_items, rank=6,
                       global_mean=2.5)
    single = _final(train_sweeps_nmf(model, coo, cfg))

    mesh = make_mesh(model=4)
    model = init_model(3, coo.num_users, coo.num_items, rank=6,
                       global_mean=2.5)
    ring = _final(train_sweeps_nmf_ring(model, coo, cfg, mesh, seed=1))

    assert (np.asarray(ring.P) >= 0).all() and (np.asarray(ring.Q) >= 0).all()
    # reassociated partial sums -> f32-level tolerance
    np.testing.assert_allclose(
        np.asarray(ring.P), np.asarray(single.P), rtol=5e-4, atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(ring.Q), np.asarray(single.Q), rtol=5e-4, atol=5e-5
    )


@requires_8
def test_nmf_ring_deterministic_and_rejects_bias():
    coo = make_synthetic(130, 90, 2500, rank=4, noise=0.2, seed=3)
    cfg = NMFConfig(reg=0.05, sweeps=1, inner_iters=2, user_chunk=64)
    mesh = make_mesh(model=8)
    m0 = init_model(5, coo.num_users, coo.num_items, rank=8,
                    global_mean=2.5)
    runs = [
        _final(train_sweeps_nmf_ring(m0, coo, cfg, mesh, seed=4))
        for _ in range(2)
    ]
    np.testing.assert_array_equal(np.asarray(runs[0].P), np.asarray(runs[1].P))
    np.testing.assert_array_equal(np.asarray(runs[0].Q), np.asarray(runs[1].Q))
    with pytest.raises(ValueError, match="bias-free"):
        list(train_sweeps_nmf_ring(m0, coo, cfg, mesh, use_bias=True))


@requires_8
def test_driver_routes_nmf_sharded(tmp_path):
    from mfx.train.driver import train

    cfg = TrainConfig(
        name="nmf-ring-smoke",
        solver="nmf",
        data=DataConfig(dataset="synthetic-small", root=str(tmp_path)),
        model=ModelConfig(rank=6, use_bias=False),
        nmf=NMFConfig(reg=0.02, sweeps=2, user_chunk=256),
        parallel=ParallelConfig(mode="sharded", model_axis=4),
    )
    res = train(cfg)
    assert res.epochs_run == 2
    assert 0 < res.test_rmse < 1.5
    assert (np.asarray(res.model.P) >= 0).all()
