import numpy as np
import jax.numpy as jnp
import pytest

from mfx.data import synthetic, epoch_permutation, train_test_split
from mfx.kernels import blocked_host as bh
from mfx.kernels import packing as pk
from mfx.models import init_model
from mfx.config import SGDConfig
from mfx.eval import rmse


def test_sweep_plans_cover_and_pad():
    coo = synthetic.make_synthetic(900, 1300, 25_000, seed=4)
    perm = epoch_permutation(25_000, 0, 0)
    su, si, T, tpg, nwin = 256, 128, 64, 4, 4
    plans = bh.build_sweep_plans(
        coo.user, coo.item, coo.rating, 900, 1300, su, si, T, tpg, nwin, perm
    )
    C = -(-1300 // si)
    assert len(plans) == -(-C // nwin)
    assert sum(p.n_real for p in plans) == 25_000
    triples = set()
    for p in plans:
        assert p.num_tiles % tpg == 0
        assert p.sa.shape[0] * tpg == p.num_tiles
        for t in range(p.num_tiles):
            a = p.sa[t // tpg]
            c = p.win0 + p.tc[t]
            lu = p.tl[t, 0]
            li = p.tl[t, 1]
            r = p.tl[t, 2].view(np.float32)
            real = lu < su
            assert np.all(p.tl[t, 1][~real] == si)
            gu = a * su + lu[real]
            gi = c * si + li[real]
            assert np.all(gu < 900) and np.all(gi < 1300)
            triples.update(zip(gu.tolist(), gi.tolist(), r[real].tolist()))
    ref = set(zip(coo.user.tolist(), coo.item.tolist(), coo.rating.tolist()))
    assert triples == ref


def test_pack_unpack_state_roundtrip():
    model = init_model(1, 300, 200, 32, global_mean=3.3)
    model = model.__class__(
        P=model.P, Q=model.Q,
        bu=model.bu + 0.1, bi=model.bi - 0.2, mu=model.mu,
    )
    Pm, Qm = pk.pack_state(model, 256, 128)
    back = pk.unpack_state(Pm, Qm, model.mu, 300, 200, 32, 256, 128)
    np.testing.assert_array_equal(np.asarray(back.P), np.asarray(model.P))
    np.testing.assert_array_equal(np.asarray(back.Q), np.asarray(model.Q))
    np.testing.assert_array_equal(np.asarray(back.bu), np.asarray(model.bu))
    np.testing.assert_array_equal(np.asarray(back.bi), np.asarray(model.bi))


def test_blocked_jnp_trainer_converges():
    from mfx.solvers.blocked import train_epochs_blocked

    coo = synthetic.make_synthetic(400, 300, 20_000, rank=4, noise=0.3, seed=9)
    train, test = train_test_split(coo, test_frac=0.1, seed=0)
    model = init_model(3, 400, 300, 32, global_mean=train.global_mean)
    cfg = SGDConfig(
        lr=0.03, reg=0.03, lr_decay=0.9, epochs=6,
        partitioner="blocked", kernel="blocked_jnp",
        ublock=256, iblock=128, tile=64,
    )
    first = last = None
    for ep, model, tr in train_epochs_blocked(model, train, cfg, use_bias=True):
        if first is None:
            first = tr
        last = tr
    assert last < first  # learning
    assert rmse(model, test) < 0.75


def test_blocked_trainer_deterministic():
    from mfx.solvers.blocked import train_epochs_blocked

    coo = synthetic.make_synthetic(200, 150, 5_000, seed=2)
    outs = []
    for _ in range(2):
        model = init_model(3, 200, 150, 32, global_mean=coo.global_mean)
        cfg = SGDConfig(
            lr=0.02, reg=0.02, epochs=2,
            partitioner="blocked", kernel="blocked_jnp",
            ublock=128, iblock=128, tile=32,
        )
        for _, model, _ in train_epochs_blocked(model, coo, cfg, use_bias=True):
            pass
        outs.append(model)
    np.testing.assert_array_equal(np.asarray(outs[0].P), np.asarray(outs[1].P))
    np.testing.assert_array_equal(np.asarray(outs[0].Q), np.asarray(outs[1].Q))
