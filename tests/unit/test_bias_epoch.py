"""bias_mode='epoch' (epoch-frozen biases): the kernel runs with the
planner-baked bias stream and emits residuals; one batched trust-scaled
bias update applies per epoch (mfx/solvers/blocked.py). Verified against
a NumPy replay of the tile stream with frozen biases."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mfx.config import SGDConfig
from mfx.data import synthetic, train_test_split
from mfx.eval import rmse
from mfx.kernels import packing as pk
from mfx.kernels import plan_device as pdv
from mfx.kernels.sgd_pallas import blocked_sgd_sweep_pallas
from mfx.models import init_model
from mfx.solvers.blocked import sweep_geometry, train_epochs_blocked

U, I, RANK = 300, 260, 64
SU = SI = 128
TILE, TPG = 64, 4


def test_epoch_bias_zero_biases_matches_nobias_factors():
    """With all-zero biases, epoch mode's factor updates are the
    use_bias=False updates exactly (b stream is 0), and the emitted
    residuals drive a finite bias step."""
    coo = synthetic.make_synthetic(U, I, 9_000, rank=4, noise=0.3, seed=4)
    model = init_model(2, U, I, RANK, global_mean=coo.global_mean)
    model = model.__class__(
        P=model.P, Q=model.Q, bu=jnp.zeros_like(model.bu),
        bi=jnp.zeros_like(model.bi), mu=model.mu,
    )
    u_dev = jnp.asarray(coo.user)
    i_dev = jnp.asarray(coo.item)
    r_dev = jnp.asarray(coo.rating)
    nwin = sweep_geometry(I, RANK, SI)
    skel = pdv.build_plan_skeleton(u_dev, i_dev, U, I, SU, SI, TILE, TPG,
                                   nwin)
    tl, d, u_s, i_s = pdv.epoch_tiles_device(skel, u_dev, i_dev, r_dev, 0,
                                             0, with_slots=True)
    sweeps = [p for p in skel.sweeps if p.t1 > p.t0]
    Pm0, Qm0 = pk.pack_state(model, SU, SI)
    mu = float(model.mu)

    def run(bias_mode, use_bias):
        Pm, Qm = Pm0, Qm0
        es = []
        for p in sweeps:
            arrs = {"sa": p.sa, "tc": p.tc, "tl": tl[p.t0 : p.t1]}
            Qs = pk.q_segment(Qm, p.win0, p.nwin, RANK, SI)
            if bias_mode == "epoch" and use_bias:
                nt = p.t1 - p.t0
                arrs["bt"] = jnp.zeros((nt, 1, TILE), jnp.float32)
                Pm, Qs, e, s = blocked_sgd_sweep_pallas(
                    Pm, Qs, arrs, 0.02, 0.01, mu,
                    su=SU, si=SI, rank=RANK, tpg=TPG, use_bias=True,
                    bias_mode="epoch", interpret=True, exact=True,
                )
                es.append(e)
            else:
                Pm, Qs, s = blocked_sgd_sweep_pallas(
                    Pm, Qs, arrs, 0.02, 0.01, mu,
                    su=SU, si=SI, rank=RANK, tpg=TPG, use_bias=use_bias,
                    interpret=True, exact=True,
                )
            Qm = pk.q_segment_restore(Qm, Qs, p.win0, RANK, SI)
        return Pm, Qm, es

    Pm_e, Qm_e, es = run("epoch", True)
    Pm_n, Qm_n, _ = run("tile", False)

    def factors(M, block):
        stride = block // (128 // RANK) + pk.BIAS_ROWS
        R = np.asarray(M).reshape(-1, stride, 128)
        return R[:, : block // (128 // RANK), :]

    np.testing.assert_array_equal(factors(Pm_e, SU), factors(Pm_n, SU))
    np.testing.assert_array_equal(factors(Qm_e, SI), factors(Qm_n, SI))

    # residuals land at the plan's slots: gathering them by d recovers a
    # value for every rating, and pad slots are exactly zero
    e_all = np.concatenate([np.asarray(e) for e in es]).reshape(-1)
    got = e_all[np.asarray(d)]
    assert got.shape[0] == coo.n_ratings
    assert np.isfinite(got).all()
    mask = np.ones(e_all.shape[0], bool)
    mask[np.asarray(d)] = False
    assert (e_all[mask] == 0.0).all()  # pad slots masked in-kernel


def test_trainer_epoch_bias_converges_and_deterministic():
    coo = synthetic.make_synthetic(600, 500, 40_000, rank=6, noise=0.3,
                                   seed=9)
    train, test = train_test_split(coo, test_frac=0.1, seed=0)

    def run(bias_mode):
        cfg = SGDConfig(
            lr=0.02, reg=0.02, epochs=6, partitioner="blocked",
            kernel="pallas", ublock=128, iblock=128, tile=64,
            bias_mode=bias_mode, plan_device="device",
        )
        model = init_model(0, 600, 500, 64, global_mean=train.global_mean)
        for _, m, tr in train_epochs_blocked(
            model, train, cfg, use_bias=True, seed=0, interpret=True
        ):
            mm = m.materialize()
        return mm, tr

    m1, tr1 = run("epoch")
    m2, _ = run("epoch")
    np.testing.assert_array_equal(np.asarray(m1.P), np.asarray(m2.P))
    np.testing.assert_array_equal(np.asarray(m1.bu), np.asarray(m2.bu))
    m_tile, tr_tile = run("tile")
    r_epoch = rmse(m1, test, clip=(0.5, 5.0))
    r_tile = rmse(m_tile, test, clip=(0.5, 5.0))
    assert np.isfinite(r_epoch)
    # batched-per-epoch bias updates track the per-tile path closely
    assert abs(r_epoch - r_tile) < 0.03, (r_epoch, r_tile)
