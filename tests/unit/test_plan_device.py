"""Device-side epoch planner tests (mfx/kernels/plan_device.py): the tile
stream it emits must reconstruct the epoch's ratings exactly (every rating
once, correct block-local ids, pad sentinels elsewhere) with the same
layout contract as the host planner, seeded-deterministically."""

import numpy as np
import jax
import jax.numpy as jnp

from mfx.data import synthetic
from mfx.kernels.plan_device import build_plan_skeleton, epoch_tiles_device

U, I, N = 300, 500, 7_000
SU = SI = 128
TILE, TPG, NWIN = 32, 4, 2


def _skel_and_tiles(coo, seed=0, epoch=0):
    u = jnp.asarray(coo.user)
    i = jnp.asarray(coo.item)
    r = jnp.asarray(coo.rating)
    skel = build_plan_skeleton(u, i, U, I, SU, SI, TILE, TPG, NWIN)
    tl = epoch_tiles_device(skel, u, i, r, seed, epoch)
    return skel, np.asarray(tl)


def _decode(skel, tl):
    """Reconstruct (u, i, r) triples from the tile stream via the sa/tc
    contract the kernel uses."""
    out_u, out_i, out_r = [], [], []
    for sw in skel.sweeps:
        sa = np.asarray(sw.sa)
        tc = np.asarray(sw.tc)
        for t in range(sw.t0, sw.t1):
            k = t - sw.t0
            a = int(sa[k // TPG])
            w = sw.win0 + int(tc[k])
            lu = tl[t, 0, :]
            li = tl[t, 1, :]
            rr = tl[t, 2, :].view(np.float32)
            real = lu < SU
            # pads carry the exact sentinels
            assert (li[~real] == SI).all() and (rr[~real] == 0).all()
            out_u.append(a * SU + lu[real])
            out_i.append(w * SI + li[real])
            out_r.append(rr[real])
    return (
        np.concatenate(out_u),
        np.concatenate(out_i),
        np.concatenate(out_r),
    )


def test_device_plan_reconstructs_epoch_exactly():
    coo = synthetic.make_synthetic(U, I, N, rank=4, seed=3)
    skel, tl = _skel_and_tiles(coo)
    assert sum(s.n_real for s in skel.sweeps) == N
    du, di, dr = _decode(skel, tl)
    assert len(du) == N
    got = np.lexsort((dr, di, du))
    want = np.lexsort((coo.rating, coo.item, coo.user))
    np.testing.assert_array_equal(du[got], coo.user[want])
    np.testing.assert_array_equal(di[got], coo.item[want])
    np.testing.assert_array_equal(dr[got], coo.rating[want])


def test_device_plan_seeded_deterministic():
    coo = synthetic.make_synthetic(U, I, N, rank=4, seed=4)
    _, tl_a = _skel_and_tiles(coo, seed=1, epoch=2)
    _, tl_b = _skel_and_tiles(coo, seed=1, epoch=2)
    np.testing.assert_array_equal(tl_a, tl_b)
    _, tl_c = _skel_and_tiles(coo, seed=1, epoch=3)
    assert not np.array_equal(tl_a, tl_c)  # new epoch, new within-stratum order


def test_blocked_trainer_with_device_planning():
    """End-to-end: the Pallas trainer driven by the device planner trains
    the same as with the host planner (same strata, different shuffle)."""
    import dataclasses

    from mfx.config import SGDConfig
    from mfx.data import train_test_split
    from mfx.eval import rmse
    from mfx.models import init_model
    from mfx.solvers.blocked import train_epochs_blocked

    coo = synthetic.make_synthetic(600, 600, 25_000, rank=4, noise=0.3, seed=9)
    train, test = train_test_split(coo, test_frac=0.1, seed=0)
    base = SGDConfig(
        lr=0.01, reg=0.03, epochs=3, partitioner="blocked", kernel="pallas",
        ublock=256, iblock=256, tile=64, replan_every=1,
    )
    results = {}
    for mode in ("device", "host"):
        cfg = dataclasses.replace(base, plan_device=mode)
        model = init_model(1, 600, 600, 64, global_mean=train.global_mean)
        hist = []
        for ep, model, tr in train_epochs_blocked(
            model, train, cfg, use_bias=True, seed=0, tpg=4, interpret=True
        ):
            hist.append(tr)
        results[mode] = (hist, rmse(model, test))
    for mode, (hist, test_rmse) in results.items():
        assert hist[-1] < hist[0], (mode, hist)
    # same data, same strata, same hyperparameters: equivalent quality
    assert abs(results["device"][1] - results["host"][1]) < 0.02, results
