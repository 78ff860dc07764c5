"""K1 Pallas kernel vs. the K4 reference oracle (SURVEY.md §4.2).

Runs in Pallas interpreter mode on the CPU test platform; the same kernel
is verified compiled on real TPU hardware by the bench/driver path (see
.claude/skills/verify and bench.py).
"""

import numpy as np
import jax.numpy as jnp

from mfx.data import synthetic, epoch_permutation
from mfx.kernels import blocked_host as bh
from mfx.kernels import packing as pk
from mfx.kernels.blocked_jnp import pad_tables, unpad_tables
from mfx.kernels.jnp_ref import sgd_minibatch_update
from mfx.kernels.sgd_pallas import blocked_sgd_sweep_pallas
from mfx.models import init_model


def _reference(model, plans, su, si, tpg, lr, reg, use_bias):
    ref = pad_tables(model, su, si)
    for p in plans:
        for t in range(p.num_tiles):
            a = p.sa[t // tpg]
            c = p.win0 + p.tc[t]
            lu = p.tl[t, 0]
            li = p.tl[t, 1]
            r = p.tl[t, 2].view(np.float32)
            real = lu < su
            gu = np.where(real, a * su + lu, 0).astype(np.int32)
            gi = np.where(real, c * si + li, 0).astype(np.int32)
            ref, _ = sgd_minibatch_update(
                ref, gu, gi, r, real.astype(np.float32), lr, reg,
                use_bias=use_bias,
            )
    return unpad_tables(ref, model.num_users, model.num_items)


def test_pallas_sweep_kernel_matches_reference_interpret():
    su, si, T, tpg, nwin, rank = 128, 128, 32, 4, 2, 64
    coo = synthetic.make_synthetic(300, 260, 3000, seed=5)
    perm = epoch_permutation(3000, 0, 0)
    plans = bh.build_sweep_plans(
        coo.user, coo.item, coo.rating, 300, 260, su, si, T, tpg, nwin, perm
    )
    for use_bias in (True, False):
        model = init_model(2, 300, 260, rank, global_mean=coo.global_mean)
        refu = _reference(model, plans, su, si, tpg, 0.05, 0.02, use_bias)
        Pm, Qm = pk.pack_state(model, su, si)
        for p in plans:
            Qs = pk.q_segment(Qm, p.win0, p.nwin, rank, si)
            Pm, Qs, _ = blocked_sgd_sweep_pallas(
                Pm, Qs, pk.sweep_arrays(p), 0.05, 0.02, float(model.mu),
                su=su, si=si, rank=rank, tpg=tpg,
                use_bias=use_bias, exact=True, interpret=True,
            )
            Qm = pk.q_segment_restore(Qm, Qs, p.win0, rank, si)
        got = pk.unpack_state(Pm, Qm, model.mu, 300, 260, rank, su, si)
        np.testing.assert_allclose(
            np.asarray(got.P), np.asarray(refu.P), atol=2e-6
        )
        np.testing.assert_allclose(
            np.asarray(got.Q), np.asarray(refu.Q), atol=2e-6
        )
        np.testing.assert_allclose(
            np.asarray(got.bu), np.asarray(refu.bu), atol=2e-6
        )


def test_pallas_rank32_pack4_interpret():
    su, si, T, tpg, nwin, rank = 128, 128, 32, 4, 2, 32
    coo = synthetic.make_synthetic(200, 200, 1500, seed=7)
    perm = epoch_permutation(1500, 0, 0)
    plans = bh.build_sweep_plans(
        coo.user, coo.item, coo.rating, 200, 200, su, si, T, tpg, nwin, perm
    )
    model = init_model(4, 200, 200, rank, global_mean=coo.global_mean)
    refu = _reference(model, plans, su, si, tpg, 0.03, 0.01, True)
    Pm, Qm = pk.pack_state(model, su, si)
    for p in plans:
        Qs = pk.q_segment(Qm, p.win0, p.nwin, rank, si)
        Pm, Qs, _ = blocked_sgd_sweep_pallas(
            Pm, Qs, pk.sweep_arrays(p), 0.03, 0.01, float(model.mu),
            su=su, si=si, rank=rank, tpg=tpg,
            use_bias=True, exact=True, interpret=True,
        )
        Qm = pk.q_segment_restore(Qm, Qs, p.win0, rank, si)
    got = pk.unpack_state(Pm, Qm, model.mu, 200, 200, rank, su, si)
    np.testing.assert_allclose(np.asarray(got.P), np.asarray(refu.P), atol=2e-6)
    np.testing.assert_allclose(np.asarray(got.Q), np.asarray(refu.Q), atol=2e-6)


def test_pallas_rank128_pack1_interpret():
    """rank 128 => pack 1 (the Netflix preset geometry)."""
    su, si, T, tpg, nwin, rank = 128, 128, 32, 4, 2, 128
    coo = synthetic.make_synthetic(300, 260, 3000, seed=5)
    perm = epoch_permutation(3000, 0, 0)
    plans = bh.build_sweep_plans(
        coo.user, coo.item, coo.rating, 300, 260, su, si, T, tpg, nwin, perm
    )
    model = init_model(2, 300, 260, rank, global_mean=coo.global_mean)
    refu = _reference(model, plans, su, si, tpg, 0.05, 0.02, True)
    Pm, Qm = pk.pack_state(model, su, si)
    for p in plans:
        Qs = pk.q_segment(Qm, p.win0, p.nwin, rank, si)
        Pm, Qs, _ = blocked_sgd_sweep_pallas(
            Pm, Qs, pk.sweep_arrays(p), 0.05, 0.02, float(model.mu),
            su=su, si=si, rank=rank, tpg=tpg,
            use_bias=True, exact=True, interpret=True,
        )
        Qm = pk.q_segment_restore(Qm, Qs, p.win0, rank, si)
    got = pk.unpack_state(Pm, Qm, model.mu, 300, 260, rank, su, si)
    np.testing.assert_allclose(np.asarray(got.P), np.asarray(refu.P), atol=2e-6)
    np.testing.assert_allclose(np.asarray(got.Q), np.asarray(refu.Q), atol=2e-6)


def test_pallas_mxu_bf16_close_to_f32_interpret():
    """bf16 MXU inputs round gathers/deltas to 8-bit mantissa; one sweep
    must stay within that rounding envelope of the f32 path (the quality
    gate at scale is the bench convergence trajectory)."""
    su, si, T, tpg, nwin, rank = 128, 128, 32, 4, 2, 64
    coo = synthetic.make_synthetic(300, 260, 3000, seed=5)
    perm = epoch_permutation(3000, 0, 0)
    plans = bh.build_sweep_plans(
        coo.user, coo.item, coo.rating, 300, 260, su, si, T, tpg, nwin, perm
    )
    model = init_model(2, 300, 260, rank, global_mean=coo.global_mean)
    outs = []
    for bf16 in (False, True):
        Pm, Qm = pk.pack_state(model, su, si)
        for p in plans:
            Qs = pk.q_segment(Qm, p.win0, p.nwin, rank, si)
            Pm, Qs, _ = blocked_sgd_sweep_pallas(
                Pm, Qs, pk.sweep_arrays(p), 0.05, 0.02, float(model.mu),
                su=su, si=si, rank=rank, tpg=tpg,
                use_bias=True, interpret=True, mxu_bf16=bf16,
            )
            Qm = pk.q_segment_restore(Qm, Qs, p.win0, rank, si)
        outs.append(pk.unpack_state(Pm, Qm, model.mu, 300, 260, rank, su, si))
    f32m, bf16m = outs
    # tables are O(0.125); per-update rounding is ~2^-9 relative with a
    # few sweeps of accumulation — atol 0.02 catches wiring bugs (wrong
    # operand, swapped cast) while admitting legitimate rounding
    np.testing.assert_allclose(
        np.asarray(bf16m.P), np.asarray(f32m.P), atol=0.02
    )
    np.testing.assert_allclose(
        np.asarray(bf16m.Q), np.asarray(f32m.Q), atol=0.02
    )
    d = np.abs(np.asarray(bf16m.P) - np.asarray(f32m.P)).max()
    assert d > 0  # the bf16 path must actually differ (cast is live)


def test_pallas_step_user_batch_close_to_per_tile_interpret():
    """step_u batches the user side per grid step (step-start snapshot
    reads, step-end segment-sum scatter). One sweep must stay within the
    snapshot-staleness envelope of the per-tile path, and pad slots must
    still be exact no-ops."""
    su, si, T, tpg, nwin, rank = 128, 128, 32, 4, 2, 64
    coo = synthetic.make_synthetic(300, 260, 3000, seed=5)
    perm = epoch_permutation(3000, 0, 0)
    plans = bh.build_sweep_plans(
        coo.user, coo.item, coo.rating, 300, 260, su, si, T, tpg, nwin, perm
    )
    model = init_model(2, 300, 260, rank, global_mean=coo.global_mean)
    outs = []
    for step_u in (False, True):
        Pm, Qm = pk.pack_state(model, su, si)
        for p in plans:
            Qs = pk.q_segment(Qm, p.win0, p.nwin, rank, si)
            Pm, Qs, _ = blocked_sgd_sweep_pallas(
                Pm, Qs, pk.sweep_arrays(p), 0.05, 0.02, float(model.mu),
                su=su, si=si, rank=rank, tpg=tpg,
                use_bias=True, interpret=True, step_u=step_u,
            )
            Qm = pk.q_segment_restore(Qm, Qs, p.win0, rank, si)
        outs.append(pk.unpack_state(Pm, Qm, model.mu, 300, 260, rank, su, si))
    ref, got = outs
    # lr=0.05 on O(0.125) tables: intra-step staleness shifts values by
    # O(lr * delta) — atol 0.05 catches wiring bugs while admitting the
    # documented semantics difference
    np.testing.assert_allclose(np.asarray(got.P), np.asarray(ref.P), atol=0.05)
    np.testing.assert_allclose(np.asarray(got.Q), np.asarray(ref.Q), atol=0.05)
    np.testing.assert_allclose(np.asarray(got.bu), np.asarray(ref.bu), atol=0.05)
    np.testing.assert_allclose(np.asarray(got.bi), np.asarray(ref.bi), atol=0.05)
    d = np.abs(np.asarray(got.P) - np.asarray(ref.P)).max()
    assert d > 0  # the batched path must actually differ


def test_pallas_pack_path_roll_matches_select():
    """pack_path='roll' keeps deltas in packed lane space (masked
    arithmetic + static lane rotations); off-slot lanes are exactly 0.0,
    so the only divergence from the select-merge path is the reduction
    order of the prediction's 128-lane sum (vs select's rank-lane sum):
    bitwise-equal on the compiled TPU path (measured dP=dQ=0 on chip),
    within 1 ULP per step in interpret/CPU mode — at both pack 2
    (rank 64) and pack 4 (rank 32)."""
    su, si, T, tpg, nwin = 128, 128, 32, 4, 2
    coo = synthetic.make_synthetic(300, 260, 3000, seed=11)
    perm = epoch_permutation(3000, 0, 0)
    for rank in (64, 32):
        plans = bh.build_sweep_plans(
            coo.user, coo.item, coo.rating, 300, 260, su, si, T, tpg,
            nwin, perm,
        )
        model = init_model(3, 300, 260, rank, global_mean=coo.global_mean)
        outs = []
        for pack_path in ("select", "roll"):
            Pm, Qm = pk.pack_state(model, su, si)
            for p in plans:
                Qs = pk.q_segment(Qm, p.win0, p.nwin, rank, si)
                Pm, Qs, _ = blocked_sgd_sweep_pallas(
                    Pm, Qs, pk.sweep_arrays(p), 0.05, 0.02,
                    float(model.mu),
                    su=su, si=si, rank=rank, tpg=tpg,
                    use_bias=True, interpret=True, pack_path=pack_path,
                )
                Qm = pk.q_segment_restore(Qm, Qs, p.win0, rank, si)
            outs.append((np.asarray(Pm), np.asarray(Qm)))
        (P_sel, Q_sel), (P_roll, Q_roll) = outs
        # interpret mode: 1-ULP pred differences compound over the epoch;
        # the compiled TPU path is bitwise (asserted on chip, see ledger)
        np.testing.assert_allclose(P_roll, P_sel, rtol=0, atol=1e-6)
        np.testing.assert_allclose(Q_roll, Q_sel, rtol=0, atol=1e-6)
