"""P1 data-parallel tests on the 8-virtual-device CPU mesh (SURVEY.md §4.2:
the JAX analog of the reference's multi-thread validation)."""

import jax
import numpy as np
import pytest

from mfx.config import SGDConfig
from mfx.data import synthetic, train_test_split
from mfx.eval import rmse
from mfx.models import init_model
from mfx.runtime.mesh import make_mesh
from mfx.parallel.data_parallel import train_epochs_dp
from mfx.solvers.sgd import train_epochs


requires_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@requires_8
def test_dp_bitwise_equals_single_device():
    """DP over 4 devices applies identical gathered deltas on every
    replica, so it must reproduce the single-device run bitwise."""
    coo = synthetic.make_synthetic(200, 150, 8_000, seed=3)
    cfg = SGDConfig(lr=0.02, reg=0.03, epochs=3, batch_size=512,
                    partitioner="fixed")

    model0 = init_model(1, 200, 150, 8, global_mean=coo.global_mean)
    single = model0
    for _, single, _ in train_epochs(single, coo, cfg, use_bias=True, seed=0):
        pass

    mesh = make_mesh(data=4)
    dp = model0
    for _, dp, _ in train_epochs_dp(dp, coo, cfg, use_bias=True, mesh=mesh,
                                    seed=0):
        pass
    np.testing.assert_array_equal(np.asarray(dp.P), np.asarray(single.P))
    np.testing.assert_array_equal(np.asarray(dp.Q), np.asarray(single.Q))
    np.testing.assert_array_equal(np.asarray(dp.bu), np.asarray(single.bu))
    np.testing.assert_array_equal(np.asarray(dp.bi), np.asarray(single.bi))


@requires_8
def test_dp_deterministic_and_learns():
    coo = synthetic.make_synthetic(300, 250, 12_000, rank=4, noise=0.3, seed=7)
    train, test = train_test_split(coo, test_frac=0.1, seed=0)
    mesh = make_mesh(data=8)
    # batch small enough that hot-item duplicate updates stay stable under
    # Zipf skew (lr * max_dup < 2; see STATUS.md known gaps)
    cfg = SGDConfig(lr=0.02, reg=0.03, lr_decay=0.9, epochs=5, batch_size=256)
    outs = []
    for _ in range(2):
        model = init_model(2, 300, 250, 8, global_mean=train.global_mean)
        for _, model, _ in train_epochs_dp(model, train, cfg, use_bias=True,
                                           mesh=mesh, seed=0):
            pass
        outs.append(model)
    np.testing.assert_array_equal(np.asarray(outs[0].P), np.asarray(outs[1].P))
    assert rmse(outs[0], test) < 0.7


@requires_8
def test_dp_dup_trust_bitwise_equals_single_device():
    """dup_trust is applied to the *gathered* global batch, so DP with
    hot-row trust scaling must still reproduce the single-device run
    bitwise (regression: DP used to drop dup_trust silently)."""
    coo = synthetic.make_synthetic(200, 150, 8_000, seed=3)
    cfg = SGDConfig(lr=0.02, reg=0.03, epochs=3, batch_size=512,
                    partitioner="fixed", dup_trust=4.0)

    model0 = init_model(1, 200, 150, 8, global_mean=coo.global_mean)
    single = model0
    for _, single, _ in train_epochs(single, coo, cfg, use_bias=True, seed=0):
        pass

    mesh = make_mesh(data=4)
    dp = model0
    for _, dp, _ in train_epochs_dp(dp, coo, cfg, use_bias=True, mesh=mesh,
                                    seed=0):
        pass
    np.testing.assert_array_equal(np.asarray(dp.P), np.asarray(single.P))
    np.testing.assert_array_equal(np.asarray(dp.Q), np.asarray(single.Q))
    np.testing.assert_array_equal(np.asarray(dp.bu), np.asarray(single.bu))
    np.testing.assert_array_equal(np.asarray(dp.bi), np.asarray(single.bi))
