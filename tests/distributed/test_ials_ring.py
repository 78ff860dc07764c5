"""Ring-sharded iALS (mfx/parallel/ials_ring.py) vs the single-device
solver — same weighted normal equations, different grouping/order."""

import jax
import numpy as np
import pytest

from mfx.config import IALSConfig, TrainConfig, DataConfig, ModelConfig, ParallelConfig
from mfx.data.synthetic import make_implicit_synthetic
from mfx.models.mf import init_model
from mfx.parallel.ials_ring import train_sweeps_ials_ring
from mfx.runtime.mesh import make_mesh
from mfx.solvers.ials import train_sweeps_ials

requires_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _final(gen):
    for _, m in gen:
        pass
    return m


@requires_8
def test_ials_ring_matches_single_device():
    coo = make_implicit_synthetic(260, 140, 6000, rank=8, seed=6)
    cfg = IALSConfig(alpha=10.0, reg=0.3, sweeps=2, user_chunk=64)

    model = init_model(2, coo.num_users, coo.num_items, rank=8)
    single = _final(train_sweeps_ials(model, coo, cfg))

    mesh = make_mesh(model=4)
    model = init_model(2, coo.num_users, coo.num_items, rank=8)
    ring = _final(train_sweeps_ials_ring(model, coo, cfg, mesh, seed=1))

    # reassociated partial sums -> f32-level tolerance
    np.testing.assert_allclose(
        np.asarray(ring.P), np.asarray(single.P), rtol=5e-4, atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(ring.Q), np.asarray(single.Q), rtol=5e-4, atol=5e-5
    )


@requires_8
def test_ials_ring_deterministic_and_rejects_bias():
    coo = make_implicit_synthetic(130, 90, 2500, rank=4, seed=3)
    cfg = IALSConfig(alpha=8.0, reg=0.2, sweeps=1, user_chunk=64)
    mesh = make_mesh(model=8)
    m0 = init_model(5, coo.num_users, coo.num_items, rank=8)
    runs = [
        _final(train_sweeps_ials_ring(m0, coo, cfg, mesh, seed=4))
        for _ in range(2)
    ]
    np.testing.assert_array_equal(np.asarray(runs[0].P), np.asarray(runs[1].P))
    np.testing.assert_array_equal(np.asarray(runs[0].Q), np.asarray(runs[1].Q))
    with pytest.raises(ValueError, match="bias-free"):
        list(train_sweeps_ials_ring(m0, coo, cfg, mesh, use_bias=True))


@requires_8
def test_driver_routes_ials_sharded(tmp_path):
    from mfx.train.driver import train

    cfg = TrainConfig(
        name="ials-ring-smoke",
        solver="ials",
        data=DataConfig(dataset="synthetic-small", root=str(tmp_path),
                        test_frac=0.05),
        model=ModelConfig(rank=8, use_bias=False),
        ials=IALSConfig(alpha=10.0, reg=0.3, sweeps=2, user_chunk=256),
        parallel=ParallelConfig(mode="sharded", model_axis=4),
    )
    res = train(cfg)
    assert res.epochs_run == 2
    assert res.test_auc is not None and 0.4 < res.test_auc <= 1.0
