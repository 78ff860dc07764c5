"""Temporal-dynamics MF trainer (solver='timesvd').

SGD over the Koren-2009 bias-level temporal model (mfx/models/timesvd.py):
the per-rating time features (bin id, deviation value) are computed once
host-side and ride the padded epoch batches as two extra columns
(mfx.data.partition.pad_to_batches extras), and the device update is the
same fused snapshot-minibatch scan as the jnp SGD path (mfx/solvers/sgd.py)
with two extra bias-like streams:

    b_{i,Bin(t)} += lr_t * (e - reg_t * b_{i,Bin(t)})      [scatter by
                                                   flat (item, bin) key]
    alpha_u      += lr_a * (e * dev - reg_a * alpha_u)     [scatter by user]

With lr_t = lr_a = 0 the trajectory collapses onto plain biased MF
(tested). Eval is time-aware (`rmse_mae_time`): the held-out prediction
uses each test rating's own timestamp — bins beyond the train window
clamp into the boundary bins, the user drift term extrapolates.
"""

from __future__ import annotations

import functools
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from mfx.config import TimeSVDConfig
from mfx.data.coo import RatingsCOO
from mfx.kernels.jnp_ref import _dup_counts
from mfx.models.mf import MFModel
from mfx.models.timesvd import (
    TimeFeatures, TimeSVDModel, fit_time_features, init_timesvd,
)
from mfx.solvers.sgd import EpochPlan, plan_epoch

__all__ = [
    "timesvd_minibatch_update", "train_epochs_timesvd", "rmse_mae_time",
]


def timesvd_minibatch_update(
    model: TimeSVDModel,
    users, items, ratings, weights, tbins, devs,
    lr, lr_t, lr_a, reg, reg_t, reg_a,
    *,
    unique_rows: bool = False,
    dup_trust: float = 0.0,
):
    """One fused snapshot-minibatch update. Returns (model, batch_sq_err).

    Semantics match mfx.kernels.jnp_ref.sgd_minibatch_update: all reads
    come from the batch-entry snapshot; per-key deltas are segment-summed
    by the scatter and applied once. Padded slots carry weight 0 and
    out-of-range sentinel ids (their scatters drop, their gathers clamp
    to garbage that the weight kills)."""
    n_bins = model.n_bins
    pu = jnp.take(model.P, users, axis=0, mode="clip")
    qi = jnp.take(model.Q, items, axis=0, mode="clip")
    bu = jnp.take(model.bu, users, mode="clip")
    bi = jnp.take(model.bi, items, mode="clip")
    flat = items * n_bins + tbins
    bt = jnp.take(model.bt.reshape(-1), flat, mode="clip")
    al = jnp.take(model.alpha, users, mode="clip")
    pred = jnp.sum(pu * qi, axis=-1) + model.mu
    pred = pred + bu + bi + bt + al * devs
    err = (ratings - pred) * weights
    e = err[:, None]
    w = weights[:, None]
    d_pu = lr * (e * qi - reg * w * pu)
    d_qi = lr * (e * pu - reg * w * qi)
    d_bu = lr * (err - reg * weights * bu)
    d_bi = lr * (err - reg * weights * bi)
    d_bt = lr_t * (err - reg_t * weights * bt)
    d_al = lr_a * (err * devs - reg_a * weights * al)

    if dup_trust > 0.0 and not unique_rows:
        # per-key trust scaling as jnp_ref.sgd_apply_deltas: rows (or
        # (item, bin) keys) appearing d times in the batch get their
        # summed delta scaled by min(1, dup_trust/d). Padded slots must
        # not inflate key counts.
        pad = weights <= 0.0
        cu = jnp.where(pad, jnp.int32(0x3FFFFFFF), users)
        ci = jnp.where(pad, jnp.int32(0x3FFFFFFF), items)
        cf = jnp.where(pad, jnp.int32(0x3FFFFFFF), flat)
        su = jnp.minimum(1.0, dup_trust / _dup_counts(cu))
        si = jnp.minimum(1.0, dup_trust / _dup_counts(ci))
        sf = jnp.minimum(1.0, dup_trust / _dup_counts(cf))
        d_pu = d_pu * su[:, None]
        d_qi = d_qi * si[:, None]
        d_bu = d_bu * su
        d_bi = d_bi * si
        d_bt = d_bt * sf
        d_al = d_al * su

    mode = "drop"  # out-of-range sentinel pads vanish in the scatter
    dt = model.P.dtype
    new = TimeSVDModel(
        P=model.P.at[users].add(
            d_pu.astype(dt), unique_indices=unique_rows, mode=mode
        ),
        Q=model.Q.at[items].add(
            d_qi.astype(dt), unique_indices=unique_rows, mode=mode
        ),
        bu=model.bu.at[users].add(
            d_bu.astype(dt), unique_indices=unique_rows, mode=mode
        ),
        bi=model.bi.at[items].add(
            d_bi.astype(dt), unique_indices=unique_rows, mode=mode
        ),
        mu=model.mu,
        # flat (item, bin) scatter: items are unique in a conflict-free
        # batch, so the flat keys are too
        bt=model.bt.reshape(-1).at[flat].add(
            d_bt.astype(dt), unique_indices=unique_rows, mode=mode
        ).reshape(model.bt.shape),
        alpha=model.alpha.at[users].add(
            d_al.astype(dt), unique_indices=unique_rows, mode=mode
        ),
    )
    return new, jnp.sum(err * err)


@functools.partial(
    jax.jit, static_argnames=("unique_rows", "dup_trust")
)
def _epoch_scan(model, batches, lr, lr_t, lr_a, reg, reg_t, reg_a,
                unique_rows, dup_trust):
    def body(m, batch):
        m, sq = timesvd_minibatch_update(
            m,
            batch["users"], batch["items"], batch["ratings"],
            batch["weights"], batch["tbins"], batch["devs"],
            lr, lr_t, lr_a, reg, reg_t, reg_a,
            unique_rows=unique_rows, dup_trust=dup_trust,
        )
        return m, sq

    model, sqs = jax.lax.scan(body, model, batches)
    return model, jnp.sum(sqs)


def train_epochs_timesvd(
    model: MFModel,
    train: RatingsCOO,
    cfg: TimeSVDConfig,
    use_bias: bool = True,
    seed: int = 0,
    start_epoch: int = 0,
    feats: TimeFeatures | None = None,
) -> Iterator[tuple[int, TimeSVDModel, float]]:
    """Generator driving temporal-SGD epochs off a biased-MF warm start;
    yields (epoch, TimeSVDModel, train_rmse)."""
    if not use_bias:
        raise ValueError(
            "solver='timesvd' is the temporal extension of BIASED MF; "
            "set model.use_bias=true"
        )
    if start_epoch > 0:
        raise ValueError(
            "timesvd cannot resume from an MF-view checkpoint (bt/alpha "
            "are not in it); restart, or persist full state via "
            "TimeSVDModel.save_npz"
        )
    if feats is None:
        feats = fit_time_features(train, n_bins=cfg.n_bins, beta=cfg.beta)
    ts_model = init_timesvd(
        0, model.num_users, model.num_items, model.rank, feats.n_bins,
        base=model,
    )
    tbins, devs = feats.features(train.user, train.timestamp)
    extras = {"tbins": tbins, "devs": devs}
    lr_t0 = cfg.lr if cfg.lr_t is None else cfg.lr_t
    lr_a0 = cfg.lr if cfg.lr_alpha is None else cfg.lr_alpha
    reg_t = cfg.reg if cfg.reg_t is None else cfg.reg_t
    reg_a = 10.0 * cfg.reg if cfg.reg_alpha is None else cfg.reg_alpha
    unique_rows = cfg.partitioner == "conflict_free"
    f32 = ts_model.P.dtype
    for epoch in range(start_epoch, cfg.epochs):
        decay = cfg.lr_decay**epoch
        plan: EpochPlan = plan_epoch(train, cfg, seed, epoch, extras=extras)
        ts_model, sse = _epoch_scan(
            ts_model, plan.batches,
            jnp.asarray(cfg.lr * decay, f32),
            jnp.asarray(lr_t0 * decay, f32),
            jnp.asarray(lr_a0 * decay, f32),
            jnp.asarray(cfg.reg, f32),
            jnp.asarray(reg_t, f32),
            jnp.asarray(reg_a, f32),
            unique_rows, cfg.dup_trust,
        )
        train_rmse = float(jnp.sqrt(sse / max(1, plan.n_real)))
        yield epoch, ts_model, train_rmse


@functools.partial(jax.jit, static_argnames=("clip",))
def _chunk_stats_t(model, users, items, ratings, weights, tbins, devs,
                   clip=None):
    pred = model.predict_t(users, items, tbins, devs)
    if clip is not None:
        pred = jnp.clip(pred, clip[0], clip[1])
    err = (ratings - pred) * weights
    return jnp.sum(err * err), jnp.sum(jnp.abs(err)), jnp.sum(weights)


def rmse_mae_time(
    model: TimeSVDModel, feats: TimeFeatures, coo: RatingsCOO,
    chunk: int = 1 << 20, clip=None,
) -> tuple[float, float]:
    """Time-aware (RMSE, MAE): each held-out rating is predicted at its
    OWN timestamp (mfx.eval.metrics.rmse_mae with the temporal terms)."""
    if coo.timestamp is None:
        raise ValueError("rmse_mae_time needs coo.timestamp on the split")
    n = coo.n_ratings
    if n == 0:
        return 0.0, 0.0
    chunk = min(chunk, max(1024, n))
    sse = sae = cnt = 0.0
    u = np.zeros(chunk, np.int32)
    i = np.zeros(chunk, np.int32)
    r = np.zeros(chunk, np.float32)
    w = np.zeros(chunk, np.float32)
    tb = np.zeros(chunk, np.int32)
    dv = np.zeros(chunk, np.float32)
    for start in range(0, n, chunk):
        stop = min(start + chunk, n)
        m = stop - start
        u[:m] = coo.user[start:stop]
        i[:m] = coo.item[start:stop]
        r[:m] = coo.rating[start:stop]
        tb[:m], dv[:m] = feats.features(
            coo.user[start:stop], coo.timestamp[start:stop]
        )
        w[:] = 0.0
        w[:m] = 1.0
        s2, s1, c = _chunk_stats_t(model, u, i, r, w, tb, dv, clip=clip)
        sse += float(s2)
        sae += float(s1)
        cnt += float(c)
    return float(np.sqrt(sse / cnt)), float(sae / cnt)
