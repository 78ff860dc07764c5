"""Parallel BPR: DP (sparse-delta all-gather) and sharded ring."""

import jax
import numpy as np
import pytest

from mfx.config import BPRConfig
from mfx.data import synthetic, train_test_split
from mfx.eval.metrics import sampled_auc
from mfx.models import init_model
from mfx.parallel.bpr_sharded import (
    item_shuffle,
    plan_bpr_ring_epoch,
    train_epochs_bpr_ring,
)
from mfx.parallel.data_parallel import train_epochs_bpr_dp
from mfx.runtime.mesh import make_mesh
from mfx.solvers.bpr import train_epochs_bpr

requires_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@requires_8
def test_bpr_dp_bitwise_equals_single():
    coo = synthetic.make_implicit_synthetic(150, 200, 8_000, rank=4, seed=2)
    cfg = BPRConfig(lr=0.05, reg=0.01, epochs=3, batch_size=512)
    model0 = init_model(1, 150, 200, 8, global_mean=0.0)
    single = model0
    for _, single, _ in train_epochs_bpr(single, coo, cfg, seed=0):
        pass
    mesh = make_mesh(data=4)
    dp = model0
    for _, dp, _ in train_epochs_bpr_dp(dp, coo, cfg, mesh, seed=0):
        pass
    np.testing.assert_array_equal(np.asarray(dp.P), np.asarray(single.P))
    np.testing.assert_array_equal(np.asarray(dp.Q), np.asarray(single.Q))


def test_bpr_ring_plan_properties():
    coo = synthetic.make_implicit_synthetic(120, 160, 5_000, rank=4, seed=3)
    S = 4
    fwd, inv = item_shuffle(160, seed=7)
    np.testing.assert_array_equal(inv[fwd], np.arange(160))
    plan = plan_bpr_ring_epoch(coo, S, 64, seed=0, epoch=0, item_map=fwd)
    assert plan.n_real == 5_000
    got_pairs = set()
    for t in range(S):
        for s in range(S):
            b = (s + t) % S
            w = plan.weights[t, s].astype(bool)
            gu = s * plan.ublock + plan.users[t, s][w]
            gp = b * plan.iblock + plan.pos[t, s][w]
            gn = b * plan.iblock + plan.neg[t, s]
            # negatives stay within the block AND the real catalog
            assert np.all(gn < min((b + 1) * plan.iblock, 160))
            got_pairs.update(zip(gu.tolist(), inv[gp].tolist()))
    ref = set(zip(coo.user.tolist(), coo.item.tolist()))
    assert got_pairs == ref


@requires_8
def test_bpr_ring_learns_and_deterministic():
    coo = synthetic.make_implicit_synthetic(200, 300, 40_000, rank=2, seed=3)
    train, test = train_test_split(coo, test_frac=0.1, seed=0)
    mesh = make_mesh(model=4)
    cfg = BPRConfig(lr=0.1, reg=0.002, epochs=12, batch_size=2048)
    outs = []
    for _ in range(2):
        model = init_model(1, 200, 300, 8, global_mean=0.0)
        for _, model, loss in train_epochs_bpr_ring(
            model, train, cfg, mesh, seed=0
        ):
            pass
        outs.append(model)
    np.testing.assert_array_equal(np.asarray(outs[0].P), np.asarray(outs[1].P))
    np.testing.assert_array_equal(np.asarray(outs[0].Q), np.asarray(outs[1].Q))
    auc = sampled_auc(outs[0], test, seed=9)
    assert auc > 0.58, auc


def test_bpr_ring_device_plan_covers_pairs_exactly():
    """Device ring prep (directive #8): every (user, pos) pair appears
    exactly once; negatives stay block-local, in-catalog, and are never
    positives."""
    import jax.numpy as jnp

    from mfx.data.bpr import build_positive_index
    from mfx.parallel.bpr_sharded import (
        bpr_ring_epoch_device, build_bpr_ring_skeleton,
    )

    coo = synthetic.make_implicit_synthetic(120, 160, 5_000, rank=4, seed=3)
    S = 4
    fwd, inv = item_shuffle(160, seed=7)
    u_dev = jnp.asarray(coo.user)
    irel = jnp.asarray(fwd)[jnp.asarray(coo.item)]
    skel = build_bpr_ring_skeleton(u_dev, irel, S, 120, 160, 64)
    assert skel.n_real == 5_000
    arrays = bpr_ring_epoch_device(skel, u_dev, irel, seed=0, epoch=0,
                                   batch_size=64)
    users = np.asarray(arrays["users"])
    pos = np.asarray(arrays["pos"])
    neg = np.asarray(arrays["neg"])
    w = np.asarray(arrays["weights"]).astype(bool)
    pos_set = set(zip(coo.user.tolist(), coo.item.tolist()))
    got_pairs = set()
    neg_hits = 0
    for t in range(S):
        for s in range(S):
            b = (s + t) % S
            wm = w[t, s]
            gu = s * skel.ublock + users[t, s][wm]
            gp = b * skel.iblock + pos[t, s][wm]
            gn = b * skel.iblock + neg[t, s]
            assert np.all(gn < min((b + 1) * skel.iblock, 160))
            got_pairs.update(zip(gu.tolist(), inv[gp].tolist()))
            gn_real = gn[wm]
            neg_hits += sum(
                (uu, ii) in pos_set
                for uu, ii in zip(gu.tolist(), inv[gn_real].tolist())
            )
    ref = set(zip(coo.user.tolist(), coo.item.tolist()))
    assert got_pairs == ref
    assert neg_hits == 0  # exact rejection on device


@requires_8
def test_bpr_ring_device_learns_and_deterministic():
    coo = synthetic.make_implicit_synthetic(200, 300, 40_000, rank=2, seed=3)
    train, test = train_test_split(coo, test_frac=0.1, seed=0)
    mesh = make_mesh(model=4)
    cfg = BPRConfig(lr=0.1, reg=0.002, epochs=12, batch_size=2048,
                    sample_device="device")
    outs = []
    for _ in range(2):
        model = init_model(1, 200, 300, 8, global_mean=0.0)
        for _, model, loss in train_epochs_bpr_ring(
            model, train, cfg, mesh, seed=0
        ):
            pass
        outs.append(model)
    np.testing.assert_array_equal(np.asarray(outs[0].P), np.asarray(outs[1].P))
    np.testing.assert_array_equal(np.asarray(outs[0].Q), np.asarray(outs[1].Q))
    auc = sampled_auc(outs[0], test, seed=9)
    assert auc > 0.58, auc


@requires_8
def test_bpr_ring_fused_kernel_learns_and_deterministic():
    """configs[4] on the fused one-hot MXU kernel (bpr.kernel='pallas'):
    trains through the DSGD ring with window-local exact negatives,
    deterministically, to a useful ranking."""
    coo = synthetic.make_implicit_synthetic(400, 512, 60_000, rank=2,
                                            seed=3)
    train, test = train_test_split(coo, test_frac=0.1, seed=0)
    mesh = make_mesh(model=4)
    # 4 epochs: both BPR ring paths peak near epoch 3 on this tiny
    # synthetic and overfit past it (jnp peaks 0.607 -> 0.582 by ep 11)
    cfg = BPRConfig(lr=0.1, reg=0.002, epochs=4, batch_size=2048,
                    kernel="pallas", ublock=128, iblock=128, tile=64)
    outs = []
    for _ in range(2):
        model = init_model(1, 400, 512, 64, global_mean=0.0)
        for _, model, loss in train_epochs_bpr_ring(
            model, train, cfg, mesh, seed=0
        ):
            pass
        outs.append(model)
    np.testing.assert_array_equal(np.asarray(outs[0].P), np.asarray(outs[1].P))
    np.testing.assert_array_equal(np.asarray(outs[0].Q), np.asarray(outs[1].Q))
    assert np.isfinite(loss)
    auc = sampled_auc(outs[0], test, seed=9)
    assert auc > 0.58, auc


def test_bpr_window_negatives_exact_and_local():
    """Device window negatives (one-shot complement draw): same window as
    the positive, never a positive pair, never a pad item — by
    construction, not by rejection residual."""
    import jax
    import jax.numpy as jnp

    from mfx.data.bpr import build_positive_index_device
    from mfx.parallel.bpr_sharded import (
        window_negative_bounds,
        window_negatives,
    )

    # 6k ratings over 100x200 = dense cells (~30% positives per window):
    # exactly the regime where rejection residue would show
    coo = synthetic.make_implicit_synthetic(100, 200, 6_000, rank=4, seed=5)
    si = 64
    u = jnp.asarray(coo.user)
    ir = jnp.asarray(coo.item)  # identity relabel for the property check
    pu, pi = build_positive_index_device(u, ir)
    bounds = window_negative_bounds(u, ir, pu, pi, si=si, num_items=200)
    j = np.asarray(window_negatives(
        jax.random.key(3), ir, pi, *bounds, si=si
    ))
    i_np = np.asarray(coo.item)
    assert (j // si == i_np // si).all()  # window-local
    assert (j < 200).all()  # no pad items
    pos = set(zip(coo.user.tolist(), coo.item.tolist()))
    hits = sum((uu, jj) in pos for uu, jj in zip(coo.user.tolist(),
                                                j.tolist()))
    assert hits == 0
    # order-statistic map vs a NumPy oracle: j must be the x-th
    # non-positive item of the cell for the drawn x
    wstart, start, cnt, navail = (np.asarray(b) for b in bounds)
    x = np.asarray(jax.random.randint(
        jax.random.key(3), ir.shape, 0, np.maximum(navail, 1),
        dtype=jnp.int32,
    ))
    pi_np = np.asarray(pi)
    for r in range(0, len(j), 97):
        cell = pi_np[start[r]: start[r] + cnt[r]] - wstart[r]
        comp = np.setdiff1d(np.arange(min(si, 200 - wstart[r])), cell)
        assert j[r] == wstart[r] + comp[x[r]], r
