"""Hybrid DP×ring tests on the virtual CPU mesh."""

import jax
import numpy as np
import pytest

from mfx.config import SGDConfig
from mfx.data import synthetic, train_test_split
from mfx.eval import rmse
from mfx.models import init_model
from mfx.parallel.hybrid import train_epochs_hybrid
from mfx.parallel.sharded import train_epochs_ring
from mfx.runtime.mesh import make_mesh

requires_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@requires_8
def test_hybrid_matches_pure_ring():
    """With the same batch size, DP×ring computes the same per-batch
    snapshot deltas as the pure ring, so results agree to f32 tolerance."""
    coo = synthetic.make_synthetic(150, 120, 6_000, seed=6)
    cfg = SGDConfig(lr=0.03, reg=0.02, epochs=2, batch_size=128)

    model0 = init_model(5, 150, 120, 8, global_mean=coo.global_mean)
    ring_mesh = make_mesh(model=4)
    ring = model0
    for _, ring, _ in train_epochs_ring(ring, coo, cfg, use_bias=True,
                                        mesh=ring_mesh, seed=0):
        pass

    hyb_mesh = make_mesh(data=2, model=4)
    hyb = model0
    for _, hyb, _ in train_epochs_hybrid(hyb, coo, cfg, use_bias=True,
                                         mesh=hyb_mesh, seed=0):
        pass
    np.testing.assert_allclose(np.asarray(hyb.P), np.asarray(ring.P), atol=1e-6)
    np.testing.assert_allclose(np.asarray(hyb.Q), np.asarray(ring.Q), atol=1e-6)
    np.testing.assert_allclose(np.asarray(hyb.bu), np.asarray(ring.bu), atol=1e-6)


@requires_8
def test_hybrid_learns_and_deterministic():
    coo = synthetic.make_synthetic(300, 260, 15_000, rank=4, noise=0.3, seed=8)
    train, test = train_test_split(coo, test_frac=0.1, seed=0)
    mesh = make_mesh(data=2, model=4)
    # small batch: hot-row duplicate stability under Zipf skew (STATUS.md)
    cfg = SGDConfig(lr=0.02, reg=0.03, lr_decay=0.9, epochs=5, batch_size=256)
    outs = []
    for _ in range(2):
        model = init_model(6, 300, 260, 8, global_mean=train.global_mean)
        for _, model, _ in train_epochs_hybrid(
            model, train, cfg, use_bias=True, mesh=mesh, seed=0
        ):
            pass
        outs.append(model)
    np.testing.assert_array_equal(np.asarray(outs[0].P), np.asarray(outs[1].P))
    assert rmse(outs[0], test) < 0.7
