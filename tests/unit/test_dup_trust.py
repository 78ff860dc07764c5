"""Duplicate trust scaling: hot-row stability under Zipf skew
(the configuration that diverges without it)."""

import numpy as np

from mfx.config import SGDConfig
from mfx.data import synthetic, train_test_split
from mfx.eval import rmse
from mfx.kernels.jnp_ref import sgd_minibatch_update
from mfx.models import init_model
from mfx.solvers.sgd import train_epochs


def test_scaling_matches_numpy():
    model = init_model(0, 10, 10, 4, global_mean=0.0)
    u = np.array([3, 3, 3, 5, 0, 0], np.int32)
    i = np.array([1, 1, 2, 4, 0, 0], np.int32)
    r = np.array([4.0, 4.0, 3.0, 2.0, 0.0, 0.0], np.float32)
    w = np.array([1, 1, 1, 1, 0, 0], np.float32)
    D = 2.0
    got, _ = sgd_minibatch_update(
        model, u, i, r, w, 0.1, 0.0, use_bias=False, dup_trust=D
    )
    P = np.array(model.P, np.float64)
    Q = np.array(model.Q, np.float64)
    e = (r - np.einsum("bk,bk->b", P[u], Q[i])) * w
    cu = np.array([3, 3, 3, 1, 2, 2], float)  # pads count together (id huge)
    ci = np.array([2, 2, 1, 1, 2, 2], float)
    su = np.minimum(1, D / cu)[:, None]
    si = np.minimum(1, D / ci)[:, None]
    Pn, Qn = P.copy(), Q.copy()
    np.add.at(Pn, u, 0.1 * e[:, None] * Q[i] * su)
    np.add.at(Qn, i, 0.1 * e[:, None] * P[u] * si)
    np.testing.assert_allclose(np.asarray(got.P), Pn, atol=2e-6)
    np.testing.assert_allclose(np.asarray(got.Q), Qn, atol=2e-6)


def test_dup_trust_stabilizes_skewed_large_batch():
    """lr=0.03 with batch 2048 on Zipf data diverges without scaling and
    trains with it."""
    coo = synthetic.make_synthetic(300, 250, 12_000, rank=4, noise=0.3, seed=7)
    train, test = train_test_split(coo, test_frac=0.1, seed=0)

    def run(dup_trust):
        model = init_model(2, 300, 250, 8, global_mean=train.global_mean)
        cfg = SGDConfig(
            lr=0.03, reg=0.03, epochs=5, batch_size=2048,
            partitioner="fixed", dup_trust=dup_trust,
        )
        for _, model, _ in train_epochs(model, train, cfg, use_bias=True,
                                        seed=0):
            pass
        return rmse(model, test)

    unstable = run(0.0)
    stable = run(16.0)
    assert not np.isfinite(unstable) or unstable > 1.5  # diverges
    assert np.isfinite(stable) and stable < 0.8  # trains
