"""Blocked SGD trainer — drives the Pallas K1 kernel (SURVEY.md M2/K1).

Epoch = a sequence of item-sweeps (Q segment VMEM-resident per sweep; see
mfx/kernels/sgd_pallas.py). Model state stays in the packed device layout
across epochs; unpacking for eval/checkpoint is a cheap device reshape.

Host-side planning (mfx/kernels/blocked_host.py) runs once per epoch with
the epoch's permutation; on large datasets the plan can be reused across
epochs (``replan_every``) since stratified order already randomizes within
strata — the determinism guarantees are unaffected (seeded either way).
"""

from __future__ import annotations

import functools
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from mfx.config import SGDConfig
from mfx.data.coo import RatingsCOO
from mfx.data.split import epoch_permutation
from mfx.kernels import blocked_host as bh
from mfx.kernels import packing as pk
from mfx.kernels.blocked_jnp import blocked_epoch_jnp, pad_tables, unpad_tables
from mfx.kernels.sgd_pallas import BIAS_ROWS, blocked_sgd_sweep_pallas

__all__ = ["train_epochs_blocked", "sweep_geometry"]

# Per-sweep VMEM budget for the resident Q segment (measured capacity 16 MB;
# leave room for the P block, tile stream, and pipeline buffers).
VMEM_Q_BUDGET = 11 * 1024 * 1024

# Item span of the dense Zipf-head window set. Measured on the ML-25M
# shape: every stratum with chi >= 0.0025 lies within the first 8192
# items (frequency-relabeled), and the dense kernel's VMEM-resident Q
# head must stay small next to its R-block pipeline buffers — 8192 items
# is ~2-4 MB of head across block sizes 512/1024.
DENSE_HEAD_ITEMS = 8192

# Per-group Q-segment VMEM budget for dense_span='full' (next to the
# dense kernel's ~10-11 MB of R pipeline buffers + accumulators: a
# 43-window segment measured a 21.5 MB scoped-VMEM bust; 16 windows at
# rank 64 / si=1024 = 4.2 MB fits with margin).
DENSE_Q_BUDGET = 4_300_000


def dense_group_windows(rank: int, si: int, budget: int = DENSE_Q_BUDGET):
    """Windows per dense-phase group so the Q segment fits the budget."""
    return max(1, budget // (pk.q_stride(rank, si) * 128 * 4))


def dense_rfmt(cfg: SGDConfig, pack: int, rating) -> str:
    """Pick the dense-phase rating stream format (SGDConfig.dense_int4).
    int4 pairs parity blocks, so it needs pack in (2, 4); 'auto' also
    requires every rating to sit exactly on the half-star grid (then the
    4-bit encoding is lossless — true for all real MovieLens/Netflix
    scales)."""
    if cfg.dense_int4 == "on":
        if pack not in (2, 4):
            raise ValueError(
                "sgd.dense_int4='on' requires rank 64/32 (pack 2/4): int4 "
                f"nibble-packing pairs parity blocks and pack={pack} has "
                "none to pair — use 'auto' or 'off' at this rank"
            )
        return "int4"
    if cfg.dense_int4 == "off" or pack not in (2, 4):
        return "int8"
    r = jnp.asarray(rating)
    half = bool(jnp.all(jnp.round(r * 2.0) == r * 2.0))
    return "int4" if half else "int8"


def sweep_geometry(
    num_items: int, rank: int, si: int, budget: int | None = None
) -> int:
    """Windows per sweep so the merged Q segment fits the VMEM budget."""
    pack = 128 // rank
    qstride = si // pack + BIAS_ROWS
    c = -(-num_items // si)
    nwin = max(1, (budget or VMEM_Q_BUDGET) // (qstride * 128 * 4))
    return min(c, nwin)


def _plan_epoch(train: RatingsCOO, cfg: SGDConfig, tpg: int, nwin: int, seed, epoch):
    perm = epoch_permutation(train.n_ratings, seed, epoch)
    return bh.build_sweep_plans(
        train.user, train.item, train.rating,
        train.num_users, train.num_items,
        cfg.ublock, cfg.iblock, cfg.tile, tpg, nwin, perm,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "su", "si", "rank", "tpg", "use_bias", "exact", "interpret",
        "sweep_meta", "dense_meta", "mxu_bf16", "step_u", "rfmt",
        "bias_mode", "pack_path", "dense_echo", "dense_spg",
    ),
    donate_argnums=(0, 1),
)
def _fused_epoch(
    Pm, Qm, sweeps, dense_groups, lr, reg, mu,
    *, su, si, rank, tpg, use_bias, exact, interpret, sweep_meta,
    dense_meta=(), mxu_bf16=False, step_u=False, rfmt="int8",
    bias_mode="tile", bias_aux=None, pack_path="roll", dense_echo=1,
    dense_spg=1,
):
    """One whole epoch — dense phases + every item-sweep — as a single
    donated XLA program. One dispatch per epoch, no host sync inside, and
    donation lets the compiler alias the packed tables end-to-end (the
    per-sweep jit boundaries of round 1 each copied Pm/Qs to preserve
    non-donated inputs).

    ``sweeps`` is a tuple of {"sa", "tc", "tl"} device dicts;
    ``sweep_meta`` the matching static (win0, nwin) tuple.

    ``dense_groups``/``dense_meta`` mirror that structure for the dense
    phases: one group per dense item-window segment (a single (0, head)
    group for dense_span='head'; prepare_dense_full's grouping for
    'full'), each run on its VMEM-resident Q segment before the sweeps.

    ``bias_mode='epoch'``: the sparse sweeps run with epoch-frozen biases
    baked into a per-slot bias stream (built here from the CURRENT bias
    rows, after the dense phase), emit residuals, and ONE batched
    trust-scaled bias update applies at epoch end — removing the per-tile
    bias machinery from the kernel (measured 26% of the sparse path).
    ``bias_aux`` carries the plan's slot/id streams ({d, u_s, i_s, deg_u,
    deg_i}; mfx/kernels/plan_device.py with_slots).
    """
    sse = jnp.zeros((), jnp.float32)
    lane = use_bias and bias_mode == "lane"
    if dense_groups:
        from mfx.solvers.dense_prep import dense_phase_core

        for (win0, nw), dt in zip(dense_meta, dense_groups):
            Qs = pk.q_segment(Qm, win0, nw, rank, si)
            Pm, Qs, s = dense_phase_core(
                Pm, Qs, dt, lr, reg, mu,
                su=su, si=si, rank=rank, use_bias=use_bias,
                exact=exact, interpret=interpret, rfmt=rfmt, lane=lane,
                echo=dense_echo, spg=dense_spg,
            )
            Qm = pk.q_segment_restore(Qm, Qs, win0, rank, si)
            sse = sse + s
    epoch_bias = use_bias and bias_mode == "epoch"
    if epoch_bias:
        from mfx.solvers.dense_prep import _bias_from_merged, _bias_to_merged

        pack = 128 // rank
        sup_, sip_ = su // pack, si // pack
        pstride, qstride = sup_ + BIAS_ROWS, sip_ + BIAS_ROWS
        T = sweeps[0]["tl"].shape[2]
        nt_total = sum(a["tl"].shape[0] for a in sweeps)
        bu2 = _bias_from_merged(Pm, pstride, sup_, su)  # (A, su)
        bi2 = _bias_from_merged(Qm, qstride, sip_, si)  # (C, si)
        bu_flat = bu2.reshape(-1)
        bi_flat = bi2.reshape(-1)
        d = bias_aux["d"]
        u_s = bias_aux["u_s"]
        i_s = bias_aux["i_s"]
        b_r = bu_flat[u_s] + bi_flat[i_s]
        bt_all = (
            jnp.zeros((nt_total * T,), jnp.float32)
            .at[d]
            .set(b_r, mode="promise_in_bounds", unique_indices=True)
            .reshape(nt_total, 1, T)
        )
        e_parts = []
    off = 0
    for (win0, nwin), arrs in zip(sweep_meta, sweeps):
        Qs = pk.q_segment(Qm, win0, nwin, rank, si)
        if epoch_bias:
            nt_k = arrs["tl"].shape[0]
            arrs = dict(arrs, bt=bt_all[off : off + nt_k])
            off += nt_k
            Pm, Qs, e, s = blocked_sgd_sweep_pallas(
                Pm, Qs, arrs, lr, reg, mu,
                su=su, si=si, rank=rank, tpg=tpg,
                use_bias=use_bias, exact=exact, interpret=interpret,
                mxu_bf16=mxu_bf16, bias_mode="epoch", pack_path=pack_path,
            )
            e_parts.append(e)
        else:
            Pm, Qs, s = blocked_sgd_sweep_pallas(
                Pm, Qs, arrs, lr, reg, mu,
                su=su, si=si, rank=rank, tpg=tpg,
                use_bias=use_bias, exact=exact, interpret=interpret,
                mxu_bf16=mxu_bf16, step_u=step_u, bias_mode=bias_mode,
                pack_path=pack_path,
            )
        Qm = pk.q_segment_restore(Qm, Qs, win0, rank, si)
        sse = sse + s[0, 0]
    if epoch_bias:
        # ONE batched bias update from the epoch's residual sums, with the
        # same per-row trust scaling the dense phase uses (curvature of a
        # d-occurrence batched bias step is lr*d)
        from mfx.kernels.dense_pallas import DSTAR

        e_all = (
            e_parts[0] if len(e_parts) == 1 else jnp.concatenate(e_parts)
        )
        e_r = e_all.reshape(-1)[d]
        esum_u = jax.ops.segment_sum(
            e_r, u_s, num_segments=bu_flat.shape[0]
        )
        esum_i = jax.ops.segment_sum(
            e_r, i_s, num_segments=bi_flat.shape[0]
        )
        deg_u = bias_aux["deg_u"]
        deg_i = bias_aux["deg_i"]
        s_u = jnp.minimum(1.0, DSTAR / jnp.maximum(deg_u, 1.0))
        s_i = jnp.minimum(1.0, DSTAR / jnp.maximum(deg_i, 1.0))
        new_bu = bu_flat + lr * s_u * (esum_u - reg * deg_u * bu_flat)
        new_bi = bi_flat + lr * s_i * (esum_i - reg * deg_i * bi_flat)
        Pm = _bias_to_merged(
            Pm, pstride, sup_, su, new_bu.reshape(bu2.shape)
        )
        Qm = _bias_to_merged(
            Qm, qstride, sip_, si, new_bi.reshape(bi2.shape)
        )
    return Pm, Qm, sse


def train_epochs_blocked(
    model,
    train: RatingsCOO,
    cfg: SGDConfig,
    use_bias: bool,
    seed: int = 0,
    start_epoch: int = 0,
    tpg: int = 4,
    replan_every: int | None = None,
    exact: bool = False,
    interpret: bool | None = None,
    timings: dict | None = None,
    prep_cache: dict | None = None,
) -> Iterator[tuple[int, object, float]]:
    """Yields (epoch, model, train_rmse) like mfx.solvers.sgd.train_epochs,
    running the fused Pallas kernel (cfg.kernel == 'pallas') or the pure-XLA
    blocked mirror ('blocked_jnp').

    ``train_rmse`` is a LAZY 0-d device array (not a float): reading it —
    ``float(tr)``, formatting, comparison — blocks on the epoch. Loops
    that ignore it pipeline epochs without a per-epoch host round trip;
    call ``model.block_until_ready()`` (or read the value) when a real
    synchronization point is needed.

    ``timings``, if given, is filled with {'planner': 'device'|'host',
    'plan_s': cumulative seconds spent building epoch plans (blocking on
    the device pass), 'prep_s': one-time dense-split/skeleton prep} so the
    bench can report plan cost separately from compile cost. Pass
    ``timings={'phase_probe': True, ...}`` to additionally measure the
    epoch's per-phase device time ONCE (before the first epoch): the
    dense phases and the sparse sweeps each run standalone on table
    copies (two dispatches each; the second is the timed one), filling
    'dense_s' and 'sparse_s' — the per-phase attribution VERDICT r4 #7
    asks for in artifacts (not supported for bias_mode='epoch', whose
    phases are not separable).

    ``prep_cache``, if given (a plain dict the caller keeps), reuses the
    one-time device prep (dense split + tensors, plan skeleton) across
    trainer instances over the SAME training data — e.g. the bench's
    fresh-model convergence and replan probes, or epoch-0 restarts. The
    cache is keyed on the prep-relevant config and dataset shape; a key
    mismatch just rebuilds. None of the cached arrays are donated by the
    epoch program, so reuse is safe."""
    import time as _time

    if interpret is None:
        # Mosaic interpret mode off-TPU (the training driver reaches this
        # path without an explicit flag; compiled mode is TPU-only)
        interpret = jax.default_backend() != "tpu"
    su, si = cfg.ublock, cfg.iblock
    U, I, rank = model.num_users, model.num_items, model.rank
    mu = float(model.mu)
    if replan_every is None:
        replan_every = cfg.replan_every

    if cfg.kernel == "pallas":
        budget = VMEM_Q_BUDGET
        if cfg.step_user_batch:
            # the step-batched concats (OU/GU/GB/deltas) live in VMEM
            # alongside the Q segment; shrink the segment budget to fit
            budget -= tpg * cfg.tile * (su // (128 // rank) + 4 * 128) * 4
        nwin = sweep_geometry(I, rank, si, budget=max(1 << 21, budget))
        lane = use_bias and cfg.bias_mode == "lane"
        # lane-bias mode: augment the tables (biases into the reserved
        # factor lanes) before packing; yielded views un-augment on unpack
        Pm, Qm = pk.pack_state(
            pk.to_lane_model(model) if lane else model, su, si
        )
        use_dev_plan = cfg.plan_device == "device" or (
            cfg.plan_device == "auto" and jax.default_backend() == "tpu"
        )
        if timings is not None:
            timings["planner"] = "device" if use_dev_plan else "host"
            timings.setdefault("plan_s", 0.0)
        _t_prep = _time.time()
        want_dense = (
            cfg.dense_chi != 0 and su == si and 128 // rank in (1, 2, 4)
        )
        if (
            want_dense and cfg.dense_echo > 1 and use_bias
            and cfg.bias_mode == "tile"
        ):
            raise ValueError(
                "sgd.dense_echo > 1 with biases requires "
                "sgd.bias_mode='lane' (the frozen-bias dense path consumes "
                "single-pass E sums)"
            )
        nwin_head = min(-(-DENSE_HEAD_ITEMS // si), -(-I // si))
        rfmt = dense_rfmt(cfg, 128 // rank, train.rating) if want_dense else (
            "int8"
        )

        # dense fast path: carve dense strata out of the sparse stream —
        # the Zipf head (dense_span='head') or any eligible stratum in
        # the item span, grouped by window segments ('full')
        dense_groups: tuple = ()
        dense_meta: tuple = ()
        sparse_train = train
        if use_dev_plan:
            # device-resident pipeline: split, degree tables, int8 R
            # build, and per-epoch planning all run on the accelerator
            # (the host variants cost 100-160 s of 1-core time at 25M)
            from mfx.kernels import plan_device as pdv
            from mfx.solvers import dense_prep as dp

            # dataset fingerprint: shape alone is not identity — two
            # different splits of the same corpus share (U, I, n) and a
            # stale hit would silently train on the OTHER split's device
            # arrays. A strided sample pins the actual triples cheaply.
            st = max(1, train.n_ratings // 13)
            fp = (
                tuple(train.user[::st][:16].tolist()),
                tuple(train.item[::st][:16].tolist()),
                tuple(np.float64(train.rating[::st][:16]).tolist()),
            )
            cache_key = (
                "devprep", U, I, train.n_ratings, fp, su, si, rank,
                cfg.tile, tpg, nwin, want_dense, rfmt, cfg.dense_chi,
                cfg.dense_span, cfg.dense_nwd, cfg.dense_spg,
            )
            if prep_cache is not None and prep_cache.get("key") == cache_key:
                (dense_meta, dense_groups, u_dev, i_dev, r_dev, dinfo,
                 skel) = prep_cache["val"]
            else:
                u_dev = jnp.asarray(train.user)
                i_dev = jnp.asarray(train.item)
                r_dev = jnp.asarray(train.rating)
                dinfo = None
                if want_dense and cfg.dense_span == "full":
                    nwd = cfg.dense_nwd or dense_group_windows(rank, si)
                    dense_meta, dense_groups, (u_dev, i_dev, r_dev), dinfo = (
                        dp.prepare_dense_full(
                            u_dev, i_dev, r_dev, U, I, su, si,
                            chi_min=cfg.dense_chi, nwd=nwd,
                            pack=128 // rank, rfmt=rfmt,
                            spg=cfg.dense_spg,
                        )
                    )
                elif want_dense:
                    dense_tensors, (u_dev, i_dev, r_dev), dinfo = (
                        dp.prepare_dense_device(
                            u_dev, i_dev, r_dev, U, I, su, si,
                            chi_min=cfg.dense_chi, nwin_head=nwin_head,
                            pack=128 // rank, rfmt=rfmt,
                        )
                    )
                    if dense_tensors is not None:
                        dense_meta = (
                            (0, dense_tensors["di_tot"].shape[0]),
                        )
                        dense_groups = (dense_tensors,)
                skel = pdv.build_plan_skeleton(
                    u_dev, i_dev, U, I, su, si, cfg.tile, tpg, nwin
                )
                if prep_cache is not None:
                    prep_cache["key"] = cache_key
                    prep_cache["val"] = (
                        dense_meta, dense_groups, u_dev, i_dev, r_dev,
                        dinfo, skel,
                    )
            if timings is not None and dinfo is not None:
                timings["dense_info"] = dinfo
            sweeps = [s for s in skel.sweeps if s.t1 > s.t0]
        elif want_dense and cfg.dense_span == "full":
            # the grouped full-span split has no host mirror, but it is
            # pure jnp and runs on any backend; hand the host planner the
            # materialized sparse remainder
            import numpy as _np

            from mfx.data.coo import RatingsCOO
            from mfx.solvers import dense_prep as dp

            nwd = cfg.dense_nwd or dense_group_windows(rank, si)
            dense_meta, dense_groups, (u_sp, i_sp, r_sp), dinfo = (
                dp.prepare_dense_full(
                    jnp.asarray(train.user), jnp.asarray(train.item),
                    jnp.asarray(train.rating), U, I, su, si,
                    chi_min=cfg.dense_chi, nwd=nwd,
                    pack=128 // rank, rfmt=rfmt, spg=cfg.dense_spg,
                )
            )
            if timings is not None and dinfo is not None:
                timings["dense_info"] = dinfo
            if dense_groups:
                sparse_train = RatingsCOO(
                    _np.asarray(u_sp), _np.asarray(i_sp),
                    _np.asarray(r_sp), U, I,
                )
        elif want_dense:
            from mfx.solvers import dense_prep as dp

            split = dp.split_dense_strata(
                train.user, train.item, U, I, su, si,
                chi_min=cfg.dense_chi, nwin_head=nwin_head,
                pack=128 // rank,
            )
            if split.num_strata:
                dense_tensors = dp.build_dense_tensors(
                    split, train.rating, su, si, 128 // rank, rfmt=rfmt
                )
                dense_meta = ((0, dense_tensors["di_tot"].shape[0]),)
                dense_groups = (dense_tensors,)
                sparse_train = train.select(split.sparse_idx)

        epoch_bias = cfg.bias_mode == "epoch" and use_bias
        if epoch_bias and not use_dev_plan:
            raise ValueError(
                "sgd.bias_mode='epoch' needs the device planner (its "
                "per-slot bias stream and residual slots come from the "
                "device epoch pass); set sgd.plan_device='device'"
            )
        if timings is not None:
            jax.block_until_ready(dense_groups)
            timings["prep_s"] = _time.time() - _t_prep
        bias_aux = None
        sweep_args = None
        sweep_meta = None
        view = None
        for epoch in range(start_epoch, cfg.epochs):
            # resuming donates the packed tables to this epoch's program:
            # flag the previously yielded lazy view so stale access fails
            # loudly instead of reading freed buffers
            if view is not None:
                view.invalidate()
            lr = cfg.lr * (cfg.lr_decay**epoch)
            replan = replan_every and epoch % replan_every == 0
            if sweep_args is None or replan:
                _t_plan = _time.time()
                if use_dev_plan:
                    if epoch_bias:
                        tl_all, d_slots, u_srt, i_srt = (
                            pdv.epoch_tiles_device(
                                skel, u_dev, i_dev, r_dev, seed, epoch,
                                with_slots=True,
                            )
                        )
                        pstride = su // (128 // rank) + BIAS_ROWS
                        qstride = si // (128 // rank) + BIAS_ROWS
                        bias_aux = {
                            "d": d_slots,
                            "u_s": u_srt,
                            "i_s": i_srt,
                            "deg_u": jax.ops.segment_sum(
                                jnp.ones_like(u_srt, jnp.float32), u_srt,
                                num_segments=(Pm.shape[0] // pstride) * su,
                            ),
                            "deg_i": jax.ops.segment_sum(
                                jnp.ones_like(i_srt, jnp.float32), i_srt,
                                num_segments=(Qm.shape[0] // qstride) * si,
                            ),
                        }
                    else:
                        tl_all = pdv.epoch_tiles_device(
                            skel, u_dev, i_dev, r_dev, seed, epoch
                        )
                    sweep_args = tuple(
                        {"sa": p.sa, "tc": p.tc, "tl": tl_all[p.t0 : p.t1]}
                        for p in sweeps
                    )
                    sweep_meta = tuple((p.win0, p.nwin) for p in sweeps)
                else:
                    plans = _plan_epoch(
                        sparse_train, cfg, tpg, nwin, seed, epoch
                    )
                    # device tile streams are cached with the plan:
                    # rebuilding them is a large host copy per epoch
                    sweep_args = tuple(pk.sweep_arrays(p) for p in plans)
                    sweep_meta = tuple((p.win0, p.nwin) for p in plans)
                if timings is not None:
                    jax.block_until_ready(sweep_args)
                    timings["plan_s"] += _time.time() - _t_plan
            if (
                timings is not None
                and timings.get("phase_probe")
                and "dense_s" not in timings
                and cfg.bias_mode != "epoch"
            ):
                # one-time per-phase attribution (VERDICT r4 #7): run the
                # dense phases and the sparse sweeps as STANDALONE
                # programs on table copies — the fused epoch is one XLA
                # program, so the split is only measurable this way. Two
                # dispatches each; the first pays the compile.
                common = dict(
                    su=su, si=si, rank=rank, tpg=tpg, use_bias=use_bias,
                    exact=exact, interpret=interpret,
                    mxu_bf16=cfg.mxu == "bf16", step_u=cfg.step_user_batch,
                    rfmt=rfmt, bias_mode=cfg.bias_mode, bias_aux=bias_aux,
                    pack_path=cfg.pack_path, dense_echo=cfg.dense_echo,
                    dense_spg=cfg.dense_spg,
                )

                def _probe_time(sw, sm, dg, dm, k=4):
                    # chain k phase dispatches between host syncs, like
                    # the pipelined production epochs: a single dispatch
                    # + block pays the full host↔device glue (~20 ms on
                    # the tunneled bench chip), which would overstate
                    # every phase by that constant
                    best = None
                    for it in range(2):  # first pass pays the compile
                        Pc, Qc = Pm + 0.0, Qm + 0.0  # donated copies
                        t0 = _time.time()
                        for _ in range(k):
                            Pc, Qc, _sse = _fused_epoch(
                                Pc, Qc, sw, dg, lr, cfg.reg, mu,
                                sweep_meta=sm, dense_meta=dm, **common,
                            )
                        jax.block_until_ready(Pc)
                        best = (_time.time() - t0) / k
                    return best

                timings["dense_s"] = (
                    _probe_time((), (), dense_groups, dense_meta)
                    if dense_groups else 0.0
                )
                timings["sparse_s"] = (
                    _probe_time(sweep_args, sweep_meta, (), ())
                    if sweep_args else 0.0
                )
            Pm, Qm, sse = _fused_epoch(
                Pm, Qm, sweep_args, dense_groups, lr, cfg.reg, mu,
                su=su, si=si, rank=rank, tpg=tpg, use_bias=use_bias,
                exact=exact, interpret=interpret, sweep_meta=sweep_meta,
                dense_meta=dense_meta,
                mxu_bf16=cfg.mxu == "bf16", step_u=cfg.step_user_batch,
                rfmt=rfmt, bias_mode=cfg.bias_mode, bias_aux=bias_aux,
                pack_path=cfg.pack_path, dense_echo=cfg.dense_echo,
                dense_spg=cfg.dense_spg,
            )
            # the yielded model is a lazy view over the live packed tables:
            # valid until the generator is resumed (the next epoch donates
            # the buffers and invalidates the view — stale access raises).
            view = pk.PackedModel(Pm, Qm, mu, U, I, rank, su, si, lane=lane)
            # the train RMSE is yielded as a LAZY device scalar: float()ing
            # it here would force a device->host sync per epoch, which on
            # a high-latency link costs more than a third of the epoch
            # (measured 60 ms of a 157 ms epoch on the tunneled chip) and
            # blocks the dispatch pipeline. Consumers that want the number
            # call float(tr) and pay the sync; throughput loops that
            # ignore it let epochs queue back-to-back on device.
            yield epoch, view, jnp.sqrt(sse / max(1, train.n_ratings))
    elif cfg.kernel == "blocked_jnp":
        padded = pad_tables(model, su, si)
        plan = None
        for epoch in range(start_epoch, cfg.epochs):
            lr = cfg.lr * (cfg.lr_decay**epoch)
            if plan is None or (replan_every and epoch % replan_every == 0):
                perm = epoch_permutation(train.n_ratings, seed, epoch)
                plan = bh.build_tile_plan(
                    train.user, train.item, train.rating, U, I,
                    su, si, cfg.tile, perm,
                )
            tiles = {
                "ta": jnp.asarray(plan.ta), "tc": jnp.asarray(plan.tc),
                "tu": jnp.asarray(plan.tu), "ti": jnp.asarray(plan.ti),
                "tr": jnp.asarray(plan.tr),
            }
            padded, sse = blocked_epoch_jnp(
                padded, tiles, lr, cfg.reg,
                su=su, si=si, use_bias=use_bias, exact=exact,
            )
            model = unpad_tables(padded, U, I)
            # lazy device scalar — same contract as the fused path above
            yield epoch, model, jnp.sqrt(sse / max(1, train.n_ratings))
    else:
        raise ValueError(f"unknown blocked kernel {cfg.kernel!r}")
