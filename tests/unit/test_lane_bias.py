"""bias_mode='lane' — biases in the factor lanes (augmented-vector MF).

Key identity: with the two reserved factor columns zeroed at init, the
lane-mode trajectory is EXACTLY the standard biased per-occurrence SGD
trajectory (pred carries bu+bi through the factor dot; the bias lane's
SGD step is the bias update rule; const lanes frozen by the delta mask).
So the K4 reference oracle with use_bias=True is an exact oracle for the
lane kernel — no tolerance band needed beyond f32 noise.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mfx.data import synthetic, epoch_permutation
from mfx.kernels import blocked_host as bh
from mfx.kernels import packing as pk
from mfx.kernels.sgd_pallas import blocked_sgd_sweep_pallas
from mfx.models import init_model
from tests.unit.test_pallas_kernel import _reference


def _zero_reserved(model):
    """Zero factor cols rank-2 / rank-1 so to_lane_model discards nothing
    and the biased reference evolves them identically (q/p zero there)."""
    from mfx.models.mf import MFModel

    r = model.rank
    z = jnp.zeros((), model.P.dtype)
    return MFModel(
        P=model.P.at[:, r - 2].set(z).at[:, r - 1].set(z),
        Q=model.Q.at[:, r - 2].set(z).at[:, r - 1].set(z),
        bu=model.bu, bi=model.bi, mu=model.mu,
    )


def _rand_bias(model, seed):
    from mfx.models.mf import MFModel

    rng = np.random.default_rng(seed)
    return MFModel(
        P=model.P, Q=model.Q,
        bu=jnp.asarray(rng.normal(0, 0.1, model.num_users), jnp.float32),
        bi=jnp.asarray(rng.normal(0, 0.1, model.num_items), jnp.float32),
        mu=model.mu,
    )


@pytest.mark.parametrize("rank,pack_path", [(64, "roll"), (64, "select"),
                                            (32, "roll"), (128, "roll")])
def test_lane_kernel_matches_biased_reference(rank, pack_path):
    su, si, T, tpg, nwin = 128, 128, 32, 4, 2
    coo = synthetic.make_synthetic(300, 260, 3000, seed=5)
    perm = epoch_permutation(3000, 0, 0)
    plans = bh.build_sweep_plans(
        coo.user, coo.item, coo.rating, 300, 260, su, si, T, tpg, nwin, perm
    )
    model = _rand_bias(
        _zero_reserved(init_model(2, 300, 260, rank,
                                  global_mean=coo.global_mean)),
        seed=9,
    )
    # exact oracle: standard biased per-occurrence SGD on the same tables
    refu = _reference(model, plans, su, si, tpg, 0.05, 0.02, True)

    lane_model = pk.to_lane_model(model)
    Pm, Qm = pk.pack_state(lane_model, su, si)
    for p in plans:
        Qs = pk.q_segment(Qm, p.win0, p.nwin, rank, si)
        Pm, Qs, _ = blocked_sgd_sweep_pallas(
            Pm, Qs, pk.sweep_arrays(p), 0.05, 0.02, float(model.mu),
            su=su, si=si, rank=rank, tpg=tpg,
            use_bias=True, exact=True, interpret=True,
            bias_mode="lane", pack_path=pack_path,
        )
        Qm = pk.q_segment_restore(Qm, Qs, p.win0, rank, si)
    raw = pk.unpack_state(Pm, Qm, model.mu, 300, 260, rank, su, si)
    # const lanes must not have moved
    np.testing.assert_array_equal(np.asarray(raw.P[:, rank - 2]), 1.0)
    np.testing.assert_array_equal(np.asarray(raw.Q[:, rank - 1]), 1.0)
    got = pk.from_lane_model(raw)
    np.testing.assert_allclose(np.asarray(got.P), np.asarray(refu.P),
                               atol=3e-6)
    np.testing.assert_allclose(np.asarray(got.Q), np.asarray(refu.Q),
                               atol=3e-6)
    np.testing.assert_allclose(np.asarray(got.bu), np.asarray(refu.bu),
                               atol=3e-6)
    np.testing.assert_allclose(np.asarray(got.bi), np.asarray(refu.bi),
                               atol=3e-6)


def test_lane_jnp_mirror_matches_lane_kernel():
    """The pure-XLA mirror's lane path tracks the Pallas lane kernel."""
    from mfx.kernels.blocked_jnp import (
        blocked_epoch_jnp, pad_tables, unpad_tables,
    )

    su, si, T, rank = 128, 128, 32, 64
    coo = synthetic.make_synthetic(250, 200, 2000, seed=3)
    perm = epoch_permutation(2000, 0, 0)
    plan = bh.build_tile_plan(
        coo.user, coo.item, coo.rating, 250, 200, su, si, T, perm
    )
    model = _rand_bias(
        _zero_reserved(init_model(1, 250, 200, rank,
                                  global_mean=coo.global_mean)),
        seed=4,
    )
    lane_model = pk.to_lane_model(model)
    tiles = {
        "ta": jnp.asarray(plan.ta), "tc": jnp.asarray(plan.tc),
        "tu": jnp.asarray(plan.tu), "ti": jnp.asarray(plan.ti),
        "tr": jnp.asarray(plan.tr),
    }
    padded = pad_tables(lane_model, su, si)
    out, _ = blocked_epoch_jnp(
        padded, tiles, 0.05, 0.02, su=su, si=si, use_bias=False,
        exact=True, lane=True,
    )
    got = pk.from_lane_model(unpad_tables(out, 250, 200))
    refu = _reference_tileplan(model, plan, su, si, 0.05, 0.02)
    np.testing.assert_allclose(np.asarray(got.P), np.asarray(refu.P),
                               atol=3e-6)
    np.testing.assert_allclose(np.asarray(got.bu), np.asarray(refu.bu),
                               atol=3e-6)
    np.testing.assert_allclose(np.asarray(got.bi), np.asarray(refu.bi),
                               atol=3e-6)


def _reference_tileplan(model, plan, su, si, lr, reg):
    """Biased K4 replay of a TilePlan (ta/tc/tu/ti/tr layout)."""
    from mfx.kernels.blocked_jnp import pad_tables, unpad_tables
    from mfx.kernels.jnp_ref import sgd_minibatch_update

    ref = pad_tables(model, su, si)
    nt = plan.ta.shape[0]
    for t in range(nt):
        a, c = int(plan.ta[t]), int(plan.tc[t])
        lu, li = plan.tu[t], plan.ti[t]
        r = plan.tr[t]
        real = lu < su
        gu = np.where(real, a * su + lu, 0).astype(np.int32)
        gi = np.where(real, c * si + li, 0).astype(np.int32)
        ref, _ = sgd_minibatch_update(
            ref, gu, gi, r, real.astype(np.float32), lr, reg, use_bias=True
        )
    return unpad_tables(ref, model.num_users, model.num_items)


def test_to_from_lane_roundtrip():
    model = _rand_bias(init_model(0, 40, 30, 64), seed=1)
    m2 = pk.from_lane_model(pk.to_lane_model(model))
    r = model.rank
    # factors match outside the reserved cols; biases round-trip exactly
    np.testing.assert_array_equal(
        np.asarray(m2.P[:, : r - 2]), np.asarray(model.P[:, : r - 2])
    )
    np.testing.assert_array_equal(np.asarray(m2.bu), np.asarray(model.bu))
    np.testing.assert_array_equal(np.asarray(m2.bi), np.asarray(model.bi))
    np.testing.assert_array_equal(np.asarray(m2.P[:, r - 2 :]), 0.0)


def test_lane_config_validation():
    from mfx.config import SGDConfig

    cfg = SGDConfig(kernel="pallas", bias_mode="lane")  # accepted
    assert cfg.bias_mode == "lane"
    with pytest.raises(ValueError, match="lane"):
        SGDConfig(kernel="jnp", bias_mode="lane")
    with pytest.raises(ValueError, match="step_user_batch"):
        SGDConfig(kernel="pallas", bias_mode="lane", step_user_batch=True)


def test_lane_trainer_end_to_end_quality():
    """train_epochs_blocked with bias_mode='lane' converges like 'tile'
    (2 fewer latent dims; band check) and yields canonical MFModels."""
    from mfx.config import SGDConfig
    from mfx.data.split import train_test_split
    from mfx.eval.metrics import rmse_mae
    from mfx.solvers.blocked import train_epochs_blocked

    coo = synthetic.make_synthetic(400, 300, 12000, rank=8, seed=6)
    tr, te = train_test_split(coo, 0.1, seed=0)
    out = {}
    for mode in ("tile", "lane"):
        cfg = SGDConfig(
            lr=0.04, reg=0.03, epochs=4, partitioner="blocked",
            kernel="pallas", ublock=128, iblock=128, tile=64,
            bias_mode=mode, plan_device="host",
        )
        model = init_model(2, coo.num_users, coo.num_items, 16,
                           global_mean=tr.global_mean)
        last = None
        for _, m, _ in train_epochs_blocked(
                model, tr, cfg, use_bias=True, seed=0, interpret=True):
            last = m.materialize()
        rmse, _ = rmse_mae(last, te)
        out[mode] = rmse
        # canonical representation: biases populated, no const column
        assert float(jnp.max(jnp.abs(last.bu))) > 0
        assert not np.allclose(np.asarray(last.P[:, 14]), 1.0)
    assert out["lane"] < out["tile"] * 1.05, out
