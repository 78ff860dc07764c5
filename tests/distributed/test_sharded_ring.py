"""P2 sharded-table (DSGD ring) tests on the virtual CPU mesh."""

import jax
import numpy as np
import pytest

from mfx.config import SGDConfig
from mfx.data import synthetic, train_test_split, epoch_permutation
from mfx.eval import rmse
from mfx.kernels.jnp_ref import sgd_minibatch_update
from mfx.models import init_model
from mfx.parallel.sharded import (
    plan_ring_epoch,
    train_epochs_ring,
    shard_model,
    unshard_model,
)
from mfx.runtime.mesh import make_mesh

requires_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_ring_plan_covers_epoch():
    coo = synthetic.make_synthetic(100, 90, 4_000, seed=1)
    perm = epoch_permutation(4_000, 0, 0)
    S, B = 4, 64
    plan = plan_ring_epoch(coo, S, B, perm)
    assert plan.n_real == 4_000
    assert plan.users.shape[0] == S and plan.users.shape[1] == S
    got = set()
    ublock, iblock = plan.ublock, plan.iblock
    for t in range(S):
        for s in range(S):
            b = (s + t) % S
            w = plan.weights[t, s].astype(bool)
            gu = s * ublock + plan.users[t, s][w]
            gi = b * iblock + plan.items[t, s][w]
            assert np.all(gu // ublock == s)
            assert np.all(gi // iblock == b)
            got.update(
                zip(gu.tolist(), gi.tolist(), plan.ratings[t, s][w].tolist())
            )
    ref = set(zip(coo.user.tolist(), coo.item.tolist(), coo.rating.tolist()))
    assert got == ref


@requires_8
def test_ring_equals_sequential_reference():
    """Strata at each sub-step are disjoint in both tables, so the parallel
    ring epoch must equal a sequential pass over the same batches (up to
    fusion-level f32 rounding between the two compiled programs; run-to-run
    bitwise determinism is asserted separately below)."""
    from mfx.parallel.sharded import make_ring_epoch_fn

    coo = synthetic.make_synthetic(120, 100, 5_000, seed=5)
    S, B = 4, 128
    perm = epoch_permutation(5_000, 0, 0)
    plan = plan_ring_epoch(coo, S, B, perm)
    model0 = init_model(3, 120, 100, 8, global_mean=coo.global_mean)

    # sequential reference: apply every (t, s) batch in order on padded tables
    ref = shard_model(model0, S)
    ublock, iblock = plan.ublock, plan.iblock
    nb = plan.users.shape[2]
    for t in range(S):
        for s in range(S):
            b = (s + t) % S
            for n in range(nb):
                gu = (s * ublock + plan.users[t, s, n]).astype(np.int32)
                gi = (b * iblock + plan.items[t, s, n]).astype(np.int32)
                ref, _ = sgd_minibatch_update(
                    ref, gu, gi, plan.ratings[t, s, n], plan.weights[t, s, n],
                    0.05, 0.02, use_bias=True,
                )
    ref = unshard_model(ref, 120, 100)

    mesh = make_mesh(model=S)
    epoch_fn = make_ring_epoch_fn(mesh, use_bias=True)
    import jax.numpy as jnp

    arrays = {
        "users": jnp.asarray(plan.users),
        "items": jnp.asarray(plan.items),
        "ratings": jnp.asarray(plan.ratings),
        "weights": jnp.asarray(plan.weights),
    }
    got, sse = epoch_fn(shard_model(model0, S), arrays, 0.05, 0.02)
    got = unshard_model(got, 120, 100)
    np.testing.assert_allclose(np.asarray(got.P), np.asarray(ref.P), atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.Q), np.asarray(ref.Q), atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.bu), np.asarray(ref.bu), atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.bi), np.asarray(ref.bi), atol=1e-6)


@requires_8
def test_ring_training_learns_and_deterministic():
    coo = synthetic.make_synthetic(400, 300, 20_000, rank=4, noise=0.3, seed=9)
    train, test = train_test_split(coo, test_frac=0.1, seed=0)
    mesh = make_mesh(model=8)
    cfg = SGDConfig(lr=0.03, reg=0.03, lr_decay=0.9, epochs=5, batch_size=256)
    outs = []
    for _ in range(2):
        model = init_model(4, 400, 300, 8, global_mean=train.global_mean)
        for _, model, _ in train_epochs_ring(
            model, train, cfg, use_bias=True, mesh=mesh, seed=0
        ):
            pass
        outs.append(model)
    np.testing.assert_array_equal(np.asarray(outs[0].P), np.asarray(outs[1].P))
    assert rmse(outs[0], test) < 0.7
