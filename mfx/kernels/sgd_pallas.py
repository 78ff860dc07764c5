"""K1 — fused blocked SGD Pallas TPU kernel (SURVEY.md §2.2 K1, §3.3).

One kernel invocation executes an item-sweep of minibatch SGD: gather of
user/item factor rows → fused dot-product residual with bias and L2 terms →
rank-1 scatter-add updates — the single-Pallas-kernel pipeline required by
BASELINE.json's north star, replacing the per-rating loop of the reference
Java program (/root/reference/README.md:1-2 — design intent; the snapshot
ships no code).

TPU-native design (tile plan: mfx/kernels/blocked_host.py):

- **Gather/scatter are MXU matmuls.** Arbitrary row gather/scatter does not
  vectorize on TPU (no hardware gather; XLA scatter measured ~0.02e9
  upd/s; per-row DMA is descriptor-bound). Ratings are stratified into
  (user-block × item-window) tiles; row access becomes block-local one-hot
  matmuls: ``pu = onehot @ Pblk``, ``Pblk += onehotᵀ @ delta``. The
  one-hotᵀ matmul performs the segment-sum gradient reduction over
  duplicate rows (K2) *inside* the MXU, deterministically.
- **Rank packing.** Factors are stored ``(rows/pack, 128)`` with
  ``pack = 128 // rank`` so rank-32/64 matmuls use all 128 MXU lanes.
- **Biases ride in the block**: each block's bias vector occupies 8 extra
  128-wide rows of the same buffer (bias of local row x at row ``x//128``,
  lane ``x%128``), so bias gather/scatter is two skinny MXU matmuls and a
  block moves in one DMA.
- **Q is VMEM-resident.** The item table (merged layout) is held entirely
  in VMEM scratch for the duration of a sweep; when it exceeds the VMEM
  budget the epoch runs as several item-sweeps, each re-streaming P
  (measured VMEM capacity: 16 MB). Item windows are addressed by dynamic
  slice — no DMA, no conditionals on the tile path.
- **P streams via the Mosaic pipeline.** The current user block is a
  pipelined, input/output-aliased BlockSpec indexed by a scalar-prefetched
  per-step block id. Each block is visited in one contiguous run (plan is
  user-block-major), so aliased prefetch never races a write-back.
- **Sequential grid = deterministic.** Grid steps run in order; tiles
  apply in plan order, bitwise-reproducibly. A bare grid step costs
  ~1.6 µs, so each step processes ``tpg`` tiles from one packed int32
  stream.

The pure-XLA mirror (blocked_jnp.py) is the numeric oracle for this kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["blocked_sgd_sweep_pallas", "BIAS_ROWS"]

# Bias rows appended to each block buffer (8 = sublane alignment; supports
# block sizes up to 8*128 = 1024 rows).
BIAS_ROWS = 8

# Scalar-prefetch tile arrays live in SMEM (~1 MB budget); cap tiles per
# kernel call so the int32[chunk] window-id array leaves ample headroom.
TILE_CHUNK = 98304


def _kernel_body(
    su: int,
    si: int,
    rank: int,
    pack: int,
    tile: int,
    tpg: int,
    nwin: int,
    use_bias: bool,
    exact: bool,
    mxu_bf16: bool,
    bias_mode: str = "tile",
    pack_path: str = "roll",
    time_mode: bool = False,
    n_bins: int = 0,
):
    # time_mode: the timeSVD temporal terms ride the lane scheme
    # (VERDICT r3 missing #5 — the lane-carry pattern generalized).
    # Slot-lane layout (L = rank - 3 - n_bins latent dims):
    #   P rows: [p(L), 0×n_bins, alpha_u, 1, bu]
    #   Q rows: [q(L), bt_{i,0..n_bins-1}, 0(drift), bi, 1]
    # Per rating the tile stream carries (bin, dev); the kernel injects
    # onehot(bin) into the P-side bin zone and dev into the Q-side drift
    # lane BEFORE the alignment/dot, so the ordinary factor dot yields
    #   p·q + Σ_b onehot_b·bt_{i,b} + alpha·dev + bi + bu
    # and the ordinary lane SGD step IS the temporal update:
    #   bt lane b: lr(e·onehot_b − reg·bt_{i,b})
    #   alpha:     lr(e·dev − reg·alpha)
    # Static freeze masks keep P's injected zones and Q's drift lane at
    # exactly 0. Semantics (documented, oracle = blocked_jnp mirror):
    # one lr/reg for every term, and each occurrence of item i
    # regularizes ALL its bin biases (the gathered row), where the jnp
    # snapshot path regularizes only the active bin.
    # bias_mode='epoch': biases are FROZEN for the epoch — the planner
    # bakes bu[u]+bi[i] into a per-tile bias stream (bt) and the kernel
    # emits per-slot residuals (e·mask) instead of running the per-tile
    # bias gather/scatter machinery (compares + skinny matmuls, measured
    # 26% of the sparse path); the trainer applies ONE batched
    # trust-scaled bias update per epoch from segment-summed residuals
    # (mfx/solvers/blocked.py). The bias rows of the merged blocks stay
    # untouched (they remain the canonical bias storage).
    #
    # bias_mode='lane': biases ride IN the factor lanes (augmented-vector
    # MF) — P rows are [p(rank-2), 1, bu], Q rows [q(rank-2), bi, 1], so
    # the factor dot already yields p·q + bu + bi and the per-occurrence
    # bias update IS the bias lane's SGD update (e·1 − reg·bu — identical
    # rule). The ENTIRE per-tile bias machinery (measured 32% of the
    # sparse path at su=1024) disappears; the only extra work is one
    # static lane mask on each delta so the constant-1 lanes never move.
    # Costs 2 of the rank's latent dims; layout conversion:
    # mfx/kernels/packing.py to_lane_model/from_lane_model.
    sup, sip = su // pack, si // pack
    qstride = sip + BIAS_ROWS
    prec = lax.Precision.HIGHEST if exact else None
    f32 = jnp.float32
    epoch_bias = use_bias and bias_mode == "epoch"
    lane_bias = use_bias and bias_mode == "lane"
    tile_bias = use_bias and bias_mode == "tile"
    # mxu_bf16: feed the one-hot gather/scatter matmuls to the MXU in
    # bfloat16 (f32 accumulate). One-hot matrices are exact in bf16; the
    # gathered factors / scattered deltas round to 8-bit mantissa (~0.4%
    # — SGD-noise-level; quality verified at ML-25M scale). The MXU runs
    # bf16 at a multiple of its f32 rate, and these matmuls are the
    # entire sparse-path cost. `exact` wins when both are set.
    cdt = jnp.bfloat16 if (mxu_bf16 and not exact) else f32
    T = tile
    # pack_path='roll' (pack>1): keep prediction/deltas in the packed
    # 128-lane space — no (T, rank) select-merge, no lane-concat relayouts
    # on the tile path (~2% faster sparse sweeps, measured compiled).
    # Cross-slot alignment uses static lane rotations keyed by the per-row
    # slot difference; off-slot lanes are exactly 0.0, so updates match the
    # 'select' path exactly except for the prediction's 128-lane sum, whose
    # reduction tree may associate the slot's `rank` nonzero lanes
    # differently than select's rank-lane sum: measured BITWISE-equal on
    # the compiled TPU path, and within 1 ULP in interpret/CPU mode.
    # 'select' keeps the original per-slot merge.
    roll = pack > 1 and pack_path == "roll"

    def rot(x, k):
        # static rotation by k*rank lanes; pltpu.roll shifts toward higher
        # lane indices, so reading lane l+k*rank == roll by 128 - k*rank
        s = (k % pack) * rank
        return x if s == 0 else pltpu.roll(x, 128 - s, 1)

    def dot(x, y):
        return jnp.dot(
            x.astype(cdt), y.astype(cdt),
            precision=prec, preferred_element_type=f32,
        )

    def dot_t(x, y):  # xᵀ @ y without materializing the transpose
        return lax.dot_general(
            x.astype(cdt), y.astype(cdt), (((0,), (0,)), ((), ())),
            precision=prec, preferred_element_type=f32,
        )

    def kernel(*refs):
        if epoch_bias:
            (hp_ref, sa_ref, tc_ref, tl_ref, bt_ref, P_in, Q_in,
             P_out, Q_hbm, e_ref, sse_ref, Qseg, acc_ref, sem) = refs
        else:
            (hp_ref, sa_ref, tc_ref, tl_ref, P_in, Q_in,
             P_out, Q_hbm, sse_ref, Qseg, acc_ref, sem) = refs
            bt_ref = e_ref = None
        del Q_in
        g = pl.program_id(0)
        ng = pl.num_programs(0)
        lr = hp_ref[0]
        reg = hp_ref[1]
        mu = hp_ref[2]

        @pl.when(g == 0)
        def _():
            acc_ref[0] = 0.0
            cp = pltpu.make_async_copy(
                Q_hbm.at[pl.ds(0, nwin * qstride), :], Qseg, sem
            )
            cp.start()
            cp.wait()

        # first visit of this user block in the sweep: seed the aliased
        # output block from the pipelined input block
        prev_g = jnp.maximum(g - 1, 0)

        @pl.when(jnp.logical_or(g == 0, sa_ref[g] != sa_ref[prev_g]))
        def _():
            P_out[:, :] = P_in[:, :]

        sse = jnp.zeros((), f32)
        for j in range(tpg):  # static unroll: tpg tiles per grid step
            t = g * tpg + j
            c = tc_ref[t]
            qs = c * qstride

            u = tl_ref[j, 0, :]  # (T,) int32; pad sentinel == su
            i = tl_ref[j, 1, :]  # window-local item ids; pad sentinel == si
            r = pltpu.bitcast(tl_ref[j, 2:3, :], f32)[0, :]
            if time_mode:
                tb = tl_ref[j, 3, :]  # (T,) int32 time-bin ids; pad 0
                dv = pltpu.bitcast(tl_ref[j, 4:5, :], f32)[0, :]  # pad 0.0
                Lb = rank - 3 - n_bins

            up = u // pack  # packed-row index; pad -> sup (out of range)
            ip = i // pack
            ou = (
                up[:, None] == lax.broadcasted_iota(jnp.int32, (T, sup), 1)
            ).astype(f32)
            oi = (
                ip[:, None] == lax.broadcasted_iota(jnp.int32, (T, sip), 1)
            ).astype(f32)

            gu = dot(ou, P_out[:sup, :])  # (T, 128): all `pack` slots
            gi = dot(oi, Qseg[pl.ds(qs, sip), :])
            if roll:
                lane_slot = (
                    lax.broadcasted_iota(jnp.int32, (T, 128), 1) // rank
                )
                su_s = u % pack
                si_s = i % pack
                pu128 = gu * (su_s[:, None] == lane_slot).astype(f32)
                qi128 = gi * (si_s[:, None] == lane_slot).astype(f32)
                if time_mode:
                    # inject per-rating temporal operands into each row's
                    # OWN slot lanes; the roll alignment then carries
                    # them to the partner's slot automatically, so pred
                    # and both deltas see them with no further work
                    lane128 = lax.broadcasted_iota(jnp.int32, (T, 128), 1)
                    pu128 = pu128 + (
                        lane128 == (su_s * rank + Lb + tb)[:, None]
                    ).astype(f32)
                    qi128 = qi128 + dv[:, None] * (
                        lane128 == (si_s * rank + rank - 3)[:, None]
                    ).astype(f32)
                # (T, 1) int32: the minor-dim insert must happen on the
                # 32-bit value (Mosaic rejects i1 vector reshape)
                rel = ((si_s - su_s) % pack)[:, None]
                m0 = (rel == 0).astype(f32)
                qi_al = m0 * qi128  # item factors in the user's slot lanes
                pu_al = m0 * pu128  # user factors in the item's slot lanes
                for d in range(1, pack):
                    m = (rel == d).astype(f32)
                    qi_al = qi_al + m * rot(qi128, d)
                    pu_al = pu_al + m * rot(pu128, pack - d)
                pred = jnp.sum(pu128 * qi_al, axis=-1) + mu
            elif pack > 1:
                sou = (
                    (u % pack)[:, None]
                    == lax.broadcasted_iota(jnp.int32, (T, pack), 1)
                ).astype(f32)
                soi = (
                    (i % pack)[:, None]
                    == lax.broadcasted_iota(jnp.int32, (T, pack), 1)
                ).astype(f32)
                pu = sou[:, 0:1] * gu[:, :rank]
                qi = soi[:, 0:1] * gi[:, :rank]
                for s in range(1, pack):
                    pu = pu + sou[:, s : s + 1] * gu[:, s * rank : (s + 1) * rank]
                    qi = qi + soi[:, s : s + 1] * gi[:, s * rank : (s + 1) * rank]
                pred = jnp.sum(pu * qi, axis=-1) + mu
            else:
                pu, qi = gu, gi
                if time_mode:  # pack == 1: lanes are absolute
                    lane128 = lax.broadcasted_iota(jnp.int32, (T, 128), 1)
                    pu = pu + (lane128 == (Lb + tb)[:, None]).astype(f32)
                    qi = qi + dv[:, None] * (lane128 == rank - 3).astype(
                        f32
                    )
                pred = jnp.sum(pu * qi, axis=-1) + mu
            mask = (u < su).astype(f32)
            if epoch_bias:
                pred = pred + bt_ref[j, 0, :]
            elif tile_bias:
                # bias of local row x lives at block row x//128, lane x%128
                orow_u = (
                    (u // 128)[:, None]
                    == lax.broadcasted_iota(jnp.int32, (T, BIAS_ROWS), 1)
                ).astype(f32)
                orow_i = (
                    (i // 128)[:, None]
                    == lax.broadcasted_iota(jnp.int32, (T, BIAS_ROWS), 1)
                ).astype(f32)
                ocol_u = (
                    (u % 128)[:, None]
                    == lax.broadcasted_iota(jnp.int32, (T, 128), 1)
                ).astype(f32)
                ocol_i = (
                    (i % 128)[:, None]
                    == lax.broadcasted_iota(jnp.int32, (T, 128), 1)
                ).astype(f32)
                bub = jnp.sum(dot(orow_u, P_out[sup:, :]) * ocol_u, axis=1)
                bib = jnp.sum(
                    dot(orow_i, Qseg[pl.ds(qs + sip, BIAS_ROWS), :]) * ocol_i,
                    axis=1,
                )
                pred = pred + bub + bib

            e = r - pred  # garbage in pad slots; killed by zero one-hots

            if roll:
                d_pu128 = lr * (e[:, None] * qi_al - reg * pu128)
                d_qi128 = lr * (e[:, None] * pu_al - reg * qi128)
            elif pack > 1:
                d_pu = lr * (e[:, None] * qi - reg * pu)  # (T, rank)
                d_qi = lr * (e[:, None] * pu - reg * qi)
                d_pu128 = jnp.concatenate(
                    [d_pu * sou[:, s : s + 1] for s in range(pack)], axis=1
                )
                d_qi128 = jnp.concatenate(
                    [d_qi * soi[:, s : s + 1] for s in range(pack)], axis=1
                )
            else:
                d_pu128 = lr * (e[:, None] * qi - reg * pu)
                d_qi128 = lr * (e[:, None] * pu - reg * qi)
            if lane_bias:
                # freeze the constant-1 lanes: P's is slot index rank-2,
                # Q's is rank-1 (static (1, 128) masks; the bias lanes
                # update like any factor lane — that IS the bias update)
                lidx = lax.broadcasted_iota(jnp.int32, (1, 128), 1) % rank
                if time_mode:
                    # + P's injected bin zone and Q's drift lane stay 0
                    p_frozen = (lidx == rank - 2) | (
                        (lidx >= Lb) & (lidx < Lb + n_bins)
                    )
                    q_frozen = (lidx == rank - 1) | (lidx == rank - 3)
                    d_pu128 = d_pu128 * (~p_frozen).astype(f32)
                    d_qi128 = d_qi128 * (~q_frozen).astype(f32)
                else:
                    d_pu128 = d_pu128 * (lidx != rank - 2).astype(f32)
                    d_qi128 = d_qi128 * (lidx != rank - 1).astype(f32)
            P_out[:sup, :] = P_out[:sup, :] + dot_t(ou, d_pu128)
            Qseg[pl.ds(qs, sip), :] = Qseg[pl.ds(qs, sip), :] + dot_t(oi, d_qi128)
            if epoch_bias:
                e_ref[j, 0, :] = e * mask  # per-slot residuals for the
                # post-epoch batched bias update
            elif tile_bias:
                d_bu = lr * (e - reg * bub) * mask  # (T,)
                d_bi = lr * (e - reg * bib) * mask
                P_out[sup:, :] = P_out[sup:, :] + dot_t(
                    orow_u, ocol_u * d_bu[:, None]
                )
                Qseg[pl.ds(qs + sip, BIAS_ROWS), :] = Qseg[
                    pl.ds(qs + sip, BIAS_ROWS), :
                ] + dot_t(orow_i, ocol_i * d_bi[:, None])

            sse = sse + jnp.sum((e * mask) ** 2)

        acc_ref[0] = acc_ref[0] + sse

        @pl.when(g == ng - 1)
        def _():
            cp = pltpu.make_async_copy(
                Qseg, Q_hbm.at[pl.ds(0, nwin * qstride), :], sem
            )
            cp.start()
            cp.wait()
            sse_ref[:, :] = acc_ref[0][None, None]

    return kernel


def _kernel_body_step_u(
    su: int,
    si: int,
    rank: int,
    pack: int,
    tile: int,
    tpg: int,
    nwin: int,
    use_bias: bool,
    exact: bool,
    mxu_bf16: bool,
):
    """Step-batched user-side variant of ``_kernel_body``.

    The ``tpg`` tiles of a grid step share one user block, so their
    user-side one-hot matmuls batch: ONE gather ``(tpg·T, sup) @ (sup,
    128)`` at step start (user factors+biases read from the step-start
    snapshot) and ONE scatter-add of the concatenated deltas at step end
    — 4 user-side matmuls per step instead of 4·tpg, with 4x the rows
    (better MXU pipeline fill). Item-side work stays per-tile sequential
    (tiles target different windows). Semantics: the user side becomes a
    (tpg·T)-minibatch with exact segment-sum accumulation — the same
    snapshot semantics data-parallel SGD uses at far larger batches; the
    per-tile path remains the parity-tested default.
    """
    sup, sip = su // pack, si // pack
    qstride = sip + BIAS_ROWS
    prec = lax.Precision.HIGHEST if exact else None
    f32 = jnp.float32
    cdt = jnp.bfloat16 if (mxu_bf16 and not exact) else f32
    T = tile

    def dot(x, y):
        return jnp.dot(
            x.astype(cdt), y.astype(cdt),
            precision=prec, preferred_element_type=f32,
        )

    def dot_t(x, y):
        return lax.dot_general(
            x.astype(cdt), y.astype(cdt), (((0,), (0,)), ((), ())),
            precision=prec, preferred_element_type=f32,
        )

    def kernel(
        hp_ref, sa_ref, tc_ref,
        tl_ref,
        P_in, Q_in,
        P_out, Q_hbm, sse_ref,
        Qseg, acc_ref, sem,
    ):
        del Q_in
        g = pl.program_id(0)
        ng = pl.num_programs(0)
        lr = hp_ref[0]
        reg = hp_ref[1]
        mu = hp_ref[2]

        @pl.when(g == 0)
        def _():
            acc_ref[0] = 0.0
            cp = pltpu.make_async_copy(
                Q_hbm.at[pl.ds(0, nwin * qstride), :], Qseg, sem
            )
            cp.start()
            cp.wait()

        prev_g = jnp.maximum(g - 1, 0)

        @pl.when(jnp.logical_or(g == 0, sa_ref[g] != sa_ref[prev_g]))
        def _():
            P_out[:, :] = P_in[:, :]

        # pass 1: decode all tiles, build the step's user-side one-hots
        tiles = []
        for j in range(tpg):
            u = tl_ref[j, 0, :]
            i = tl_ref[j, 1, :]
            r = pltpu.bitcast(tl_ref[j, 2:3, :], f32)[0, :]
            up = u // pack
            ip = i // pack
            ou = (
                up[:, None] == lax.broadcasted_iota(jnp.int32, (T, sup), 1)
            ).astype(f32)
            oi = (
                ip[:, None] == lax.broadcasted_iota(jnp.int32, (T, sip), 1)
            ).astype(f32)
            d = {"u": u, "i": i, "r": r, "ou": ou, "oi": oi}
            if pack > 1:
                d["sou"] = (
                    (u % pack)[:, None]
                    == lax.broadcasted_iota(jnp.int32, (T, pack), 1)
                ).astype(f32)
                d["soi"] = (
                    (i % pack)[:, None]
                    == lax.broadcasted_iota(jnp.int32, (T, pack), 1)
                ).astype(f32)
            if use_bias:
                d["orow_u"] = (
                    (u // 128)[:, None]
                    == lax.broadcasted_iota(jnp.int32, (T, BIAS_ROWS), 1)
                ).astype(f32)
                d["ocol_u"] = (
                    (u % 128)[:, None]
                    == lax.broadcasted_iota(jnp.int32, (T, 128), 1)
                ).astype(f32)
            tiles.append(d)

        OU = jnp.concatenate([d["ou"] for d in tiles], axis=0)
        GU = dot(OU, P_out[:sup, :])  # (tpg*T, 128): step-start snapshot
        if use_bias:
            OROW = jnp.concatenate([d["orow_u"] for d in tiles], axis=0)
            GB = dot(OROW, P_out[sup:, :])  # (tpg*T, 128)

        # pass 2: per-tile residuals + item-side updates; user deltas pool
        sse = jnp.zeros((), f32)
        d_pu_parts = []
        x_bias_parts = []
        for j, d in enumerate(tiles):
            t = g * tpg + j
            c = tc_ref[t]
            qs = c * qstride
            u, i, r, oi = d["u"], d["i"], d["r"], d["oi"]
            gu = GU[j * T : (j + 1) * T, :]
            gi = dot(oi, Qseg[pl.ds(qs, sip), :])
            if pack > 1:
                sou, soi = d["sou"], d["soi"]
                pu = sou[:, 0:1] * gu[:, :rank]
                qi = soi[:, 0:1] * gi[:, :rank]
                for s in range(1, pack):
                    pu = pu + sou[:, s : s + 1] * gu[:, s * rank : (s + 1) * rank]
                    qi = qi + soi[:, s : s + 1] * gi[:, s * rank : (s + 1) * rank]
            else:
                pu, qi = gu, gi

            pred = jnp.sum(pu * qi, axis=-1) + mu
            mask = (u < su).astype(f32)
            if use_bias:
                orow_i = (
                    (i // 128)[:, None]
                    == lax.broadcasted_iota(jnp.int32, (T, BIAS_ROWS), 1)
                ).astype(f32)
                ocol_i = (
                    (i % 128)[:, None]
                    == lax.broadcasted_iota(jnp.int32, (T, 128), 1)
                ).astype(f32)
                bub = jnp.sum(GB[j * T : (j + 1) * T, :] * d["ocol_u"], axis=1)
                bib = jnp.sum(
                    dot(orow_i, Qseg[pl.ds(qs + sip, BIAS_ROWS), :]) * ocol_i,
                    axis=1,
                )
                pred = pred + bub + bib

            e = r - pred

            d_pu = lr * (e[:, None] * qi - reg * pu)
            d_qi = lr * (e[:, None] * pu - reg * qi)
            if pack > 1:
                d_pu128 = jnp.concatenate(
                    [d_pu * d["sou"][:, s : s + 1] for s in range(pack)],
                    axis=1,
                )
                d_qi128 = jnp.concatenate(
                    [d_qi * d["soi"][:, s : s + 1] for s in range(pack)],
                    axis=1,
                )
            else:
                d_pu128, d_qi128 = d_pu, d_qi
            d_pu_parts.append(d_pu128)
            Qseg[pl.ds(qs, sip), :] = Qseg[pl.ds(qs, sip), :] + dot_t(
                oi, d_qi128
            )
            if use_bias:
                d_bu = lr * (e - reg * bub) * mask
                d_bi = lr * (e - reg * bib) * mask
                x_bias_parts.append(d["ocol_u"] * d_bu[:, None])
                Qseg[pl.ds(qs + sip, BIAS_ROWS), :] = Qseg[
                    pl.ds(qs + sip, BIAS_ROWS), :
                ] + dot_t(orow_i, ocol_i * d_bi[:, None])

            sse = sse + jnp.sum((e * mask) ** 2)

        # step-end user-side scatter: one matmul per table region
        D = jnp.concatenate(d_pu_parts, axis=0)
        P_out[:sup, :] = P_out[:sup, :] + dot_t(OU, D)
        if use_bias:
            X = jnp.concatenate(x_bias_parts, axis=0)
            P_out[sup:, :] = P_out[sup:, :] + dot_t(OROW, X)

        acc_ref[0] = acc_ref[0] + sse

        @pl.when(g == ng - 1)
        def _():
            cp = pltpu.make_async_copy(
                Qseg, Q_hbm.at[pl.ds(0, nwin * qstride), :], sem
            )
            cp.start()
            cp.wait()
            sse_ref[:, :] = acc_ref[0][None, None]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "su", "si", "rank", "tpg", "use_bias", "exact", "interpret",
        "mxu_bf16", "step_u", "bias_mode", "pack_path", "time_mode",
        "n_bins",
    ),
)
def blocked_sgd_sweep_pallas(
    Pm: jax.Array,  # (A*(su/pack+8), 128) f32 merged user table
    Qs: jax.Array,  # (nwin*(si/pack+8), 128) f32 merged item-sweep segment
    sweep: dict[str, jax.Array],  # sa (NG,) i32; tc (NT,) i32; tl (NT,3,T) i32
    lr,
    reg,
    mu,
    *,
    su: int,
    si: int,
    rank: int,
    tpg: int = 8,
    use_bias: bool = True,
    exact: bool = False,
    interpret: bool = False,
    mxu_bf16: bool = False,
    step_u: bool = False,
    bias_mode: str = "tile",
    pack_path: str = "roll",
    time_mode: bool = False,
    n_bins: int = 0,
):
    """One item-sweep of fused SGD. The sweep's Q segment must fit the VMEM
    budget (epochs over larger item tables run as several sweeps — see
    mfx.solvers.blocked). Tables are donated. Returns (Pm, Qs, sse) — or
    (Pm, Qs, e, sse) with ``bias_mode='epoch'``, where ``sweep['bt']``
    carries the frozen per-slot bias sums and ``e`` the (NT, T) masked
    residuals for the post-epoch batched bias update.

    Chunked into multiple kernel calls only to bound SMEM prefetch size;
    blocks write back at chunk edges, so the result is identical to one
    monolithic call.
    """
    nt = sweep["tc"].shape[0]
    ng = sweep["sa"].shape[0]
    if nt != ng * tpg:
        raise ValueError(f"tc length {nt} != sa length {ng} * tpg {tpg}")
    if time_mode:
        pk_ = 128 // rank
        if bias_mode != "lane" or not use_bias:
            raise ValueError(
                "time_mode (blocked timeSVD) rides the lane scheme; set "
                "bias_mode='lane' with biases on"
            )
        if step_u:
            raise NotImplementedError("time_mode with step_user_batch")
        if pk_ > 1 and pack_path != "roll":
            raise NotImplementedError(
                "time_mode needs pack_path='roll' (or rank 128)"
            )
        if not 1 <= n_bins <= rank - 4:
            raise ValueError(
                f"time_mode needs 1 <= n_bins <= rank-4, got {n_bins}"
            )
        if sweep["tl"].shape[1] != 5:
            raise ValueError(
                "time_mode tile stream must be (NT, 5, T): u, i, r, bin, "
                f"dev — got {sweep['tl'].shape}"
            )
    epoch_bias = use_bias and bias_mode == "epoch"
    if use_bias and bias_mode != "tile" and step_u:
        raise NotImplementedError(
            f"bias_mode={bias_mode!r} with step_user_batch"
        )
    pack = 128 // rank
    nwin = Qs.shape[0] // (si // pack + BIAS_ROWS)
    f32 = jnp.float32
    sse = jnp.zeros((1, 1), f32)
    step = (TILE_CHUNK // tpg) * tpg
    e_parts = []
    for off in range(0, nt, step):
        chunk = {
            "sa": sweep["sa"][off // tpg : (off + step) // tpg],
            "tc": sweep["tc"][off : off + step],
            "tl": sweep["tl"][off : off + step],
        }
        if epoch_bias:
            chunk["bt"] = sweep["bt"][off : off + step]
        out = _sweep_chunk_call(
            Pm, Qs, chunk, lr, reg, mu,
            su=su, si=si, rank=rank, tpg=tpg, nwin=nwin,
            use_bias=use_bias, exact=exact, interpret=interpret,
            mxu_bf16=mxu_bf16, step_u=step_u, bias_mode=bias_mode,
            pack_path=pack_path, time_mode=time_mode, n_bins=n_bins,
        )
        if epoch_bias:
            Pm, Qs, e, s = out
            e_parts.append(e)
        else:
            Pm, Qs, s = out
        sse = sse + s
    if epoch_bias:
        e_all = e_parts[0] if len(e_parts) == 1 else jnp.concatenate(
            e_parts, axis=0
        )
        return Pm, Qs, e_all, sse
    return Pm, Qs, sse


def _sweep_chunk_call(
    Pm, Qs, sweep, lr, reg, mu,
    *, su, si, rank, tpg, nwin, use_bias, exact, interpret, mxu_bf16=False,
    step_u=False, bias_mode="tile", pack_path="roll", time_mode=False,
    n_bins=0,
):
    pack = 128 // rank
    pstride = su // pack + BIAS_ROWS
    ng = sweep["sa"].shape[0]
    tile = sweep["tl"].shape[2]
    nt = ng * tpg
    epoch_bias = use_bias and bias_mode == "epoch"
    f32 = jnp.float32
    hp = jnp.stack(
        [jnp.asarray(lr, f32), jnp.asarray(reg, f32), jnp.asarray(mu, f32)]
    )
    body = _kernel_body_step_u if step_u else _kernel_body
    if step_u:
        kernel = body(
            su, si, rank, pack, tile, tpg, nwin, use_bias, exact, mxu_bf16
        )
    else:
        kernel = body(
            su, si, rank, pack, tile, tpg, nwin, use_bias, exact, mxu_bf16,
            bias_mode=bias_mode, pack_path=pack_path, time_mode=time_mode,
            n_bins=n_bins,
        )
    blk_spec = pl.BlockSpec(
        (pstride, 128),
        lambda g, hp, sa, tc: (sa[g], 0),
        memory_space=pltpu.VMEM,
    )
    tl_rows = 5 if time_mode else 3
    in_specs = [
        pl.BlockSpec(
            (tpg, tl_rows, tile), lambda g, *_: (g, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    if epoch_bias:
        # (NT, 1, T) with a (tpg, 1, T) block: the trailing dims equal the
        # array's, satisfying Mosaic's block-shape rule (tpg < 8 sublanes
        # would otherwise be rejected)
        in_specs.append(
            pl.BlockSpec(
                (tpg, 1, tile), lambda g, *_: (g, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
    in_specs += [blk_spec, pl.BlockSpec(memory_space=pl.ANY)]
    out_specs = [blk_spec, pl.BlockSpec(memory_space=pl.ANY)]
    out_shape = [
        jax.ShapeDtypeStruct(Pm.shape, f32),
        jax.ShapeDtypeStruct(Qs.shape, f32),
    ]
    if epoch_bias:
        out_specs.append(
            pl.BlockSpec(
                (tpg, 1, tile), lambda g, *_: (g, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        out_shape.append(jax.ShapeDtypeStruct((nt, 1, tile), f32))
    out_specs.append(
        pl.BlockSpec((1, 1), lambda g, *_: (0, 0), memory_space=pltpu.VMEM)
    )
    out_shape.append(jax.ShapeDtypeStruct((1, 1), f32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # hp, sa, tc
        grid=(ng,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((nwin * (si // pack + BIAS_ROWS), 128), f32),
            pltpu.SMEM((1,), f32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    # positional indices incl. scalar-prefetch args:
    # tile path: hp=0, sa=1, tc=2, tl=3, P=4, Q=5
    # epoch-bias path: hp=0, sa=1, tc=2, tl=3, bt=4, P=5, Q=6
    aliases = {5: 0, 6: 1} if epoch_bias else {4: 0, 5: 1}
    args = [hp, sweep["sa"], sweep["tc"], sweep["tl"]]
    if epoch_bias:
        args.append(sweep["bt"])
    args += [Pm, Qs]
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            dimension_semantics=("arbitrary",),  # sequential grid, required
        ),
        interpret=interpret,
    )(*args)
