"""Multi-strata dense grid steps (sgd.dense_spg — VERDICT r4 #1).

The dense phase is fixed-cost-bound per grid step (~10 µs/stratum vs a
~4 µs MXU floor on the bench chip); spg batches strata per grid
invocation. Correctness contract: the prep pads every (group, user
block) stratum run to a multiple of spg with exact-no-op null strata,
so the training trajectory is spg-INVARIANT (same update order, null
strata contribute +0.0 everywhere).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from mfx.config import SGDConfig
from mfx.data import synthetic
from mfx.models import init_model
from mfx.solvers import dense_prep as dp
from mfx.solvers.blocked import train_epochs_blocked

U0, I0, SU, RANK = 600, 600, 256, 64


def _coo():
    return synthetic.make_synthetic(U0, I0, 40_000, rank=8, seed=3)


def _prep(coo, spg, nwd=1, chi=0.01):
    return dp.prepare_dense_full(
        jnp.asarray(coo.user), jnp.asarray(coo.item),
        jnp.asarray(coo.rating), U0, I0, SU, SU,
        chi_min=chi, nwd=nwd, pack=128 // RANK, spg=spg,
    )


def test_spg_prep_pads_runs_with_noop_strata():
    coo = _coo()
    meta1, g1, (u1, i1, r1), info1 = _prep(coo, 1)
    meta4, g4, (u4, i4, r4), info4 = _prep(coo, 4)
    assert meta1 == meta4
    assert info4["num_strata"] == info1["num_strata"]
    assert info4["strata_padded"] % 4 == 0
    assert info4["strata_padded"] >= info4["num_strata"]
    # sparse remainder identical (padding never moves ratings)
    np.testing.assert_array_equal(np.asarray(u1), np.asarray(u4))
    for t1, t4 in zip(g1, g4):
        sa1, sa4 = np.asarray(t1["sa"]), np.asarray(t4["sa"])
        assert sa4.shape[0] % 4 == 0
        # every grid step's 4 strata share one user block
        assert (sa4.reshape(-1, 4) == sa4.reshape(-1, 4)[:, :1]).all()
        # real strata preserved: total degrees match; null strata are
        # all-zero rows of R and degrees
        for k in ("du_s", "di_s", "R"):
            assert np.asarray(t4[k]).sum(dtype=np.int64) == np.asarray(
                t1[k]
            ).sum(dtype=np.int64), k
        real = np.asarray(t4["du_s"]).sum(axis=(1, 2)) > 0
        null = ~real
        # null slots: zero R image
        R4 = np.asarray(t4["R"])
        assert np.abs(R4[null]).sum() == 0


@pytest.mark.parametrize("bias_mode", ["lane", "tile"])
@pytest.mark.parametrize("spg", [2, 4])
def test_spg_trainer_is_bitwise_invariant(spg, bias_mode):
    """End-to-end blocked trainer: dense_spg in {2,4} must reproduce the
    spg=1 tables exactly (null strata are exact no-ops; real strata run
    in the identical order)."""
    coo = _coo()
    base = dict(
        lr=0.01, reg=0.02, epochs=2, partitioner="blocked",
        kernel="pallas", ublock=SU, iblock=SU, tile=64, dense_chi=0.002,
        dense_span="full", dense_nwd=1, plan_device="device",
        bias_mode=bias_mode,
    )
    tables = {}
    for s in (1, spg):
        model = init_model(0, U0, I0, RANK, global_mean=coo.global_mean)
        cfg = SGDConfig(dense_spg=s, **base)
        for ep, model, tr in train_epochs_blocked(
            model, coo, cfg, use_bias=True, seed=0, tpg=4, interpret=True,
        ):
            pass
        tables[s] = (np.asarray(model.P), np.asarray(model.Q),
                     np.asarray(model.bu), np.asarray(model.bi))
    for a, b in zip(tables[1], tables[spg]):
        np.testing.assert_array_equal(a, b)


def test_spg_validation():
    with pytest.raises(ValueError, match="dense_spg"):
        SGDConfig(dense_spg=0)
    with pytest.raises(ValueError, match="dense_spg"):
        SGDConfig(dense_spg=16)
    with pytest.raises(ValueError, match="full"):
        SGDConfig(dense_spg=2, dense_span="head")
    # kernel-level guard: stratum count not divisible by spg
    from mfx.kernels.dense_pallas import dense_sgd_phase_pallas

    with pytest.raises(ValueError, match="multiple of spg"):
        dense_sgd_phase_pallas(
            jnp.zeros((136, 128)), jnp.zeros((136, 128)),
            {"sa": jnp.zeros((3,), jnp.int32),
             "sc": jnp.zeros((3,), jnp.int32),
             "R": jnp.zeros((3, 256, 128), jnp.int8),
             "aux_u": jnp.zeros((3, 128, 8), jnp.float32)},
            0.01, 0.01, 0.0,
            su=256, si=256, rank=64, nwin=1, use_bias=False,
            interpret=True, spg=2,
        )
