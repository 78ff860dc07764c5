"""Blocked-kernel timeSVD trainer (timesvd.kernel='pallas').

The temporal family previously ran only the jnp snapshot-minibatch scan
(mfx/solvers/timesvd.py) — the XLA-scatter-class path, ~20x below the
fused blocked kernel (VERDICT r3 missing #5). Here the Koren bias-level
temporal terms ride the SAME fused one-hot MXU kernel as biased MF via
the generalized lane scheme (mfx/kernels/sgd_pallas.py time_mode):

  P rows  [p(L), 0×n_bins, alpha_u, 1, bu]
  Q rows  [q(L), bt_{i,·}, 0(drift), bi, 1]      L = rank - 3 - n_bins

with per-rating (bin, dev) streaming in the tile plan (two extra int32
rows) and injected in-kernel, so the ordinary lane SGD step IS the
temporal update. Cost: 3 + n_bins of the storage rank's latent dims.

Semantics (exact, oracle-tested in tests/unit/test_timesvd_blocked.py,
and deliberately simpler than TimeSVDConfig's full schedule):

- ONE lr and ONE reg for every term (config must leave lr_t/lr_alpha/
  reg_t/reg_alpha at None or set them equal — validated loudly). The
  fully general per-term schedule stays on the jnp path.
- each occurrence of item i regularizes ALL of its bin biases (the
  gathered Q row), where the jnp path regularizes only the active bin —
  a slightly stronger, uniform shrinkage of cold bins.
- conflict-free tiles (the blocked plan) instead of iid minibatches.

The epoch runs as ONE donated XLA program per epoch (all sweeps), like
the MF blocked path; planning is the host sweep planner with the
rating payload replaced by the RATING INDEX (bitcast), so the (bin,
dev, rating) rows are assembled by three O(n) gathers without touching
the planner.
"""

from __future__ import annotations

import functools
import time as _time
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from mfx.config import TimeSVDConfig
from mfx.data.coo import RatingsCOO
from mfx.data.split import epoch_permutation
from mfx.kernels import blocked_host as bh
from mfx.kernels import packing as pk
from mfx.kernels.sgd_pallas import blocked_sgd_sweep_pallas
from mfx.models.mf import MFModel
from mfx.models.timesvd import TimeFeatures, fit_time_features, init_timesvd
from mfx.solvers.blocked import sweep_geometry

__all__ = [
    "train_epochs_timesvd_blocked", "plan_temporal_epoch",
    "run_temporal_epoch", "build_temporal_plan_skeleton",
    "plan_temporal_epoch_device",
]


def _require_uniform_schedule(cfg: TimeSVDConfig) -> None:
    # NOTE on None defaults: on the jnp path None means "derived default"
    # (lr for the rates, reg for reg_t, 10*reg for reg_alpha); the lane
    # scheme can only train every term at the ONE lr/reg, so on this
    # path None means exactly that — in particular alpha is regularized
    # at reg, not the jnp default's 10*reg (documented in the module
    # docstring and TimeSVDConfig.kernel; cross-kernel quality A/Bs
    # compare slightly different objectives on the alpha term).
    for name, val, base in (
        ("lr_t", cfg.lr_t, cfg.lr), ("lr_alpha", cfg.lr_alpha, cfg.lr),
        ("reg_t", cfg.reg_t, cfg.reg), ("reg_alpha", cfg.reg_alpha, cfg.reg),
    ):
        if val is not None and val != base:
            raise ValueError(
                f"timesvd.kernel='pallas' trains every term with the one "
                f"lr/reg of the lane scheme; set timesvd.{name} to None "
                f"(or exactly {base}), or use kernel='jnp' for the "
                "per-term schedule"
            )
    if cfg.reg_alpha is None and cfg.reg != 0.0:
        # The jnp path derives reg_alpha = 10*reg when left None; the lane
        # scheme trains alpha at the uniform reg. A silent None default
        # would therefore weaken alpha's regularization 10x on a kernel
        # switch — say so loudly (ADVICE r4).
        import warnings

        warnings.warn(
            "timesvd.kernel='pallas' with reg_alpha=None trains the user "
            f"drift alpha at the uniform reg ({cfg.reg}); the jnp kernel's "
            f"None default is 10*reg ({10 * cfg.reg}). Set "
            f"reg_alpha={cfg.reg} explicitly to silence this, or use "
            "kernel='jnp' to keep the stronger alpha regularization.",
            stacklevel=3,
        )


@functools.partial(
    jax.jit,
    static_argnames=("su", "si", "rank", "tpg", "n_bins", "interpret",
                     "sweep_meta"),
    donate_argnums=(0, 1),
)
def _tsvd_epoch(Pm, Qm, sweeps, lr, reg, mu, *, su, si, rank, tpg, n_bins,
                interpret, sweep_meta):
    sse = jnp.zeros((1, 1), jnp.float32)
    for (win0, nwin), arrs in zip(sweep_meta, sweeps):
        Qs = pk.q_segment(Qm, win0, nwin, rank, si)
        Pm, Qs, s = blocked_sgd_sweep_pallas(
            Pm, Qs, arrs, lr, reg, mu,
            su=su, si=si, rank=rank, tpg=tpg, use_bias=True,
            interpret=interpret, bias_mode="lane", time_mode=True,
            n_bins=n_bins,
        )
        Qm = pk.q_segment_restore(Qm, Qs, win0, rank, si)
        sse = sse + s
    return Pm, Qm, sse[0, 0]


def train_epochs_timesvd_blocked(
    model: MFModel,
    train: RatingsCOO,
    cfg: TimeSVDConfig,
    use_bias: bool = True,
    seed: int = 0,
    start_epoch: int = 0,
    interpret: bool = False,
    feats: TimeFeatures | None = None,
    timings: dict | None = None,
    replan_every: int = 0,
):
    """Generator yielding (epoch, TimeSVDModel, train_rmse) through the
    fused blocked kernel. See module docstring for the (documented)
    semantic differences from the jnp path."""
    if not use_bias:
        raise ValueError("timesvd is the temporal extension of BIASED MF")
    if train.timestamp is None:
        raise ValueError("solver='timesvd' needs dataset timestamps")
    if start_epoch > 0:
        raise ValueError(
            "blocked timesvd cannot resume from an MF-view checkpoint; "
            "persist full state via TimeSVDModel.save_npz"
        )
    _require_uniform_schedule(cfg)
    rank = model.rank
    if 128 % rank:
        raise ValueError(f"blocked timesvd needs rank dividing 128, got {rank}")
    if feats is None:
        feats = fit_time_features(train, n_bins=cfg.n_bins, beta=cfg.beta)
    # validate the OPERATIVE bin count: a caller-supplied featurizer may
    # carry a different n_bins than the config
    if feats.n_bins > rank - 4:
        raise ValueError(
            f"timesvd.kernel='pallas' carries the {feats.n_bins} bin "
            f"biases in the factor lanes: needs n_bins <= rank-4 = "
            f"{rank - 4} (lower n_bins or raise the rank)"
        )
    U, I = model.num_users, model.num_items
    su = si = getattr(cfg, "ublock", 512)
    tile = getattr(cfg, "tile", 256)
    tpg = 4
    tbins, devs = feats.features(train.user, train.timestamp)
    tbins = np.asarray(tbins, np.int32)
    devs = np.asarray(devs, np.float32)

    ts = init_timesvd(0, U, I, rank, feats.n_bins, base=model)
    Pm, Qm = pk.pack_state(pk.to_tlane_model(ts, feats.n_bins), su, si)
    mu = jnp.asarray(ts.mu, jnp.float32)
    nwin = sweep_geometry(I, rank, si)

    # planning: device on TPU backends (seeded sort + scatter per replan,
    # O(strata) host work — the skeleton is built once and reused across
    # replans; VERDICT r4 #9), host elsewhere. Host path plans with the
    # RATING INDEX as the payload: tl row 2 then holds the original
    # rating position, so rating/bin/dev assemble by gathers.
    use_dev_plan = jax.default_backend() == "tpu"
    if use_dev_plan:
        _t0 = _time.time()
        dev_plan = build_temporal_plan_skeleton(
            train, tbins, devs, su=su, si=si, tile=tile, tpg=tpg, nwin=nwin
        )
        if timings is not None:
            jax.block_until_ready(dev_plan[0].strat_start)
            timings["prep_s"] = (
                timings.get("prep_s", 0.0) + _time.time() - _t0
            )
            timings["planner"] = "device"
    elif timings is not None:
        timings["planner"] = "host"
    idx_payload = np.arange(train.n_ratings, dtype=np.int32).view(np.float32)
    rating = np.asarray(train.rating, np.float32)
    f32v = np.float32
    sweep_args: list | None = None
    sweep_meta = None
    for epoch in range(start_epoch, cfg.epochs):
        # plan reuse (replan_every=0, the production default as in the
        # MF blocked path): the host O(n log n) sweep plan + the O(n)
        # tl5 assembly dominate wall on the 1-core host at multi-million
        # rating scale; stratified order re-randomizes within strata
        if sweep_args is not None and not (
            replan_every and epoch % replan_every == 0
        ):
            pass
        else:
            _t0 = _time.time()
            if use_dev_plan:
                sweep_args, sweep_meta = plan_temporal_epoch_device(
                    *dev_plan, seed, epoch
                )
                jax.block_until_ready(sweep_args)
            else:
                sweep_args, sweep_meta = _plan_tsvd_epoch(
                    train, idx_payload, rating, tbins, devs, U, I, su, si,
                    tile, tpg, nwin, seed, epoch,
                )
            if timings is not None:
                timings["plan_s"] = (
                    timings.get("plan_s", 0.0) + _time.time() - _t0
                )
        Pm, Qm, sse = _tsvd_epoch(
            Pm, Qm, tuple(sweep_args),
            jnp.asarray(cfg.lr * (cfg.lr_decay**epoch), f32v),
            jnp.asarray(cfg.reg, f32v), mu,
            su=su, si=si, rank=rank, tpg=tpg, n_bins=feats.n_bins,
            interpret=interpret, sweep_meta=sweep_meta,
        )
        view = pk.unpack_state(Pm, Qm, mu, U, I, rank, su, si)
        out = pk.from_tlane_model(view, feats.n_bins)
        yield epoch, out, jnp.sqrt(sse / max(1, train.n_ratings))


def run_temporal_epoch(
    ts, sweep_args, sweep_meta, lr, reg, n_bins, *, su, si, tpg,
    interpret=False,
):
    """One blocked temporal epoch on a canonical TimeSVDModel: pack to
    the time-lane merged tables, run every sweep as one donated XLA
    program, unpack. The composition hook timeSVD++ uses for its
    temporal epoch over ``X = P + S`` (mfx/solvers/timesvdpp.py)."""
    rank = ts.P.shape[1]
    Pm, Qm = pk.pack_state(pk.to_tlane_model(ts, n_bins), su, si)
    mu = jnp.asarray(ts.mu, jnp.float32)
    Pm, Qm, sse = _tsvd_epoch(
        Pm, Qm, tuple(sweep_args),
        jnp.asarray(lr, jnp.float32), jnp.asarray(reg, jnp.float32), mu,
        su=su, si=si, rank=rank, tpg=tpg, n_bins=n_bins,
        interpret=interpret, sweep_meta=tuple(sweep_meta),
    )
    view = pk.unpack_state(Pm, Qm, mu, ts.P.shape[0], ts.Q.shape[0], rank,
                           su, si)
    return pk.from_tlane_model(view, n_bins), sse


def plan_temporal_epoch(train, tbins, devs, *, su, si, tile, tpg, nwin,
                        seed, epoch, device: bool | None = None):
    """Public planning entry for the blocked temporal epoch (see
    :func:`run_temporal_epoch`). ``device=None`` plans on the
    accelerator on TPU backends (one seeded sort + scatter, O(strata)
    host work — VERDICT r4 #9) and on the host elsewhere."""
    if device is None:
        device = jax.default_backend() == "tpu"
    if device:
        skel, u_dev, i_dev, r_dev, tb_dev, dvb_dev = (
            build_temporal_plan_skeleton(
                train, tbins, devs, su=su, si=si, tile=tile, tpg=tpg,
                nwin=nwin,
            )
        )
        return plan_temporal_epoch_device(
            skel, u_dev, i_dev, r_dev, tb_dev, dvb_dev, seed, epoch
        )
    idx_payload = np.arange(train.n_ratings, dtype=np.int32).view(
        np.float32
    )
    return _plan_tsvd_epoch(
        train, idx_payload, np.asarray(train.rating, np.float32),
        np.asarray(tbins, np.int32), np.asarray(devs, np.float32),
        train.num_users, train.num_items, su, si, tile, tpg, nwin, seed,
        epoch,
    )


def build_temporal_plan_skeleton(train, tbins, devs, *, su, si, tile, tpg,
                                 nwin):
    """Once-per-run device constants for temporal device planning: the MF
    plan skeleton (stratum membership is payload-independent) plus the
    device-resident id/payload streams. Returns
    ``(skel, u_dev, i_dev, r_dev, tb_dev, dvb_dev)``."""
    from mfx.kernels import plan_device as pdv

    u_dev = jnp.asarray(train.user)
    i_dev = jnp.asarray(train.item)
    r_dev = jnp.asarray(train.rating, jnp.float32)
    tb_dev = jnp.asarray(tbins, jnp.int32)
    dvb_dev = jax.lax.bitcast_convert_type(
        jnp.asarray(devs, jnp.float32), jnp.int32
    )
    skel = pdv.build_plan_skeleton(
        u_dev, i_dev, train.num_users, train.num_items, su, si, tile, tpg,
        nwin,
    )
    return skel, u_dev, i_dev, r_dev, tb_dev, dvb_dev


def plan_temporal_epoch_device(skel, u_dev, i_dev, r_dev, tb_dev, dvb_dev,
                               seed, epoch):
    """Per-epoch device pass: the (NT, 5, T) temporal tile stream via the
    generalized payload planner (mfx/kernels/plan_device.py extras).
    Rows 0-2 are bitwise the MF device plan's (slot assignment is
    payload-independent); rows 3-4 carry each rating's (tbin, dev bits).
    O(strata) host work per replan — the round-1 host-planning cost
    class the MF path eliminated (STATUS.md #7)."""
    from mfx.kernels import plan_device as pdv

    tl_all = pdv.epoch_tiles_device(
        skel, u_dev, i_dev, r_dev, seed, epoch, extras=(tb_dev, dvb_dev)
    )
    sweeps = [s for s in skel.sweeps if s.t1 > s.t0]
    sweep_args = [
        {"sa": p.sa, "tc": p.tc, "tl": tl_all[p.t0 : p.t1]} for p in sweeps
    ]
    return sweep_args, tuple((p.win0, p.nwin) for p in sweeps)


def _plan_tsvd_epoch(train, idx_payload, rating, tbins, devs, U, I, su, si,
                     tile, tpg, nwin, seed, epoch):
    perm = epoch_permutation(train.n_ratings, seed, epoch)
    plans = bh.build_sweep_plans(
        train.user, train.item, idx_payload, U, I,
        su, si, tile, tpg, nwin, perm,
    )
    sweep_args = []
    for p in plans:
        tl = np.asarray(p.tl)  # (NT, 3, T) int32
        u_loc = tl[:, 0, :]
        pad = u_loc >= su
        idx = np.where(pad, 0, tl[:, 2, :].view(np.int32))
        tl5 = np.empty(tl.shape[:1] + (5,) + tl.shape[2:], np.int32)
        tl5[:, 0:2] = tl[:, 0:2]
        tl5[:, 2] = np.where(pad, 0, rating[idx].view(np.int32))
        tl5[:, 3] = np.where(pad, 0, tbins[idx])
        tl5[:, 4] = np.where(pad, 0, devs[idx].view(np.int32))
        sweep_args.append({
            "sa": jnp.asarray(p.sa), "tc": jnp.asarray(p.tc),
            "tl": jnp.asarray(tl5),
        })
    return sweep_args, tuple((p.win0, p.nwin) for p in plans)
