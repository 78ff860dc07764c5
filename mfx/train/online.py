"""Online model updates — absorb a delta batch of ratings into a trained
model WITHOUT a full retrain (SURVEY.md T1's production companion; the
reference snapshot ships no code — /root/reference/README.md:1-2 — and
no update story, so this layer is designed from the deployment need).

The production loop this serves: a model trains offline on the full
history (mfx.train.driver); between retrains, new ratings keep arriving
— from existing users, from NEW users, for NEW catalog items. The update
path is three TPU-friendly steps, all batched:

1. **Grow** the factor tables to cover new ids (`grow_model`) — zero
   rows, so existing predictions are bitwise unchanged and a new row
   predicts the global mean until it learns.
2. **Fold in** genuinely-new rows (users first against the frozen item
   table, then new items against the UPDATED user table): the batched
   regularized least-squares solve of mfx.serve.foldin — two einsums +
   one batched Cholesky for the whole cohort, not per-row loops.
3. **Fine-tune** with a few SGD epochs over the delta ratings (plus an
   optional replay sample of old ratings to anchor rows the delta
   touches only obliquely) — the exact `train_epochs` machinery, so
   dup_trust, partitioners, and determinism all carry over.

Everything runs at delta scale: the host work is O(|delta|), device work
a few small SGD epochs. A full retrain stays the quality ceiling; this
is the cheap, frequent step between retrains.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from mfx.config import SGDConfig
from mfx.data.coo import RatingsCOO
from mfx.models.mf import MFModel

__all__ = ["grow_model", "partial_fit"]


def grow_model(
    model: MFModel,
    num_users: int | None = None,
    num_items: int | None = None,
) -> MFModel:
    """Enlarge the factor tables to (num_users, num_items) with zero
    rows. Predictions for existing ids are bitwise unchanged; a new row
    predicts ``mu`` until it is folded in or trained. No-op when the
    model is already large enough."""
    U = model.num_users if num_users is None else int(num_users)
    I = model.num_items if num_items is None else int(num_items)
    if U < model.num_users or I < model.num_items:
        raise ValueError(
            f"grow_model cannot shrink: model is "
            f"({model.num_users}, {model.num_items}), asked ({U}, {I})"
        )
    if U == model.num_users and I == model.num_items:
        return model
    du, di = U - model.num_users, I - model.num_items
    f = model.P.dtype
    pad = lambda a, n: (
        a if n == 0 else jnp.concatenate(
            [a, jnp.zeros((n,) + a.shape[1:], f)]
        )
    )
    return MFModel(
        P=pad(model.P, du), Q=pad(model.Q, di),
        bu=pad(model.bu, du), bi=pad(model.bi, di), mu=model.mu,
    )


def _histories_for_new(
    ids: np.ndarray, other: np.ndarray, vals: np.ndarray, first_new: int
) -> tuple[np.ndarray, list[tuple[np.ndarray, np.ndarray]]]:
    """Group the delta's ratings by the NEW ids (>= first_new) on one
    side; returns (new_ids, histories aligned with them) for fold_in.
    O(|delta| log |delta|) host work — deltas are small by contract."""
    m = ids >= first_new
    if not m.any():
        return np.zeros(0, np.int32), []
    ids, other, vals = ids[m], other[m], vals[m]
    order = np.argsort(ids, kind="stable")
    ids, other, vals = ids[order], other[order], vals[order]
    uniq, starts = np.unique(ids, return_index=True)
    bounds = np.append(starts, len(ids))
    hists = [
        (other[bounds[j]:bounds[j + 1]], vals[bounds[j]:bounds[j + 1]])
        for j in range(len(uniq))
    ]
    return uniq.astype(np.int32), hists


def partial_fit(
    model: MFModel,
    delta: RatingsCOO,
    cfg: SGDConfig,
    *,
    use_bias: bool = True,
    seed: int = 0,
    foldin_new: bool = True,
    foldin_reg: float = 0.05,
    replay: RatingsCOO | None = None,
) -> tuple[MFModel, float]:
    """Absorb ``delta`` (new ratings; ids may exceed the model's current
    table sizes) into a trained model: grow → fold-in new rows →
    ``cfg.epochs`` SGD epochs over delta ∪ replay. Returns
    ``(updated_model, last_train_rmse)``.

    ``replay``: optional sample of older ratings trained alongside the
    delta — anchors the rows the delta touches so a skewed delta doesn't
    drag shared factors (the standard rehearsal trick). Must use the
    same id space; its table sizes may lag the delta's (both are grown
    to the union).

    Deterministic for a fixed (model, delta, replay, cfg, seed).
    """
    from mfx.solvers.sgd import train_epochs

    old_U, old_I = model.num_users, model.num_items
    U = max(old_U, delta.num_users)
    I = max(old_I, delta.num_items)
    if replay is not None:
        U, I = max(U, replay.num_users), max(I, replay.num_items)
    if delta.n_ratings == 0:
        raise ValueError("partial_fit needs a non-empty delta")
    model = grow_model(model, U, I)

    if foldin_new:
        from mfx.serve.foldin import fold_in

        # new users against the (frozen, grown) item table …
        new_u, hists = _histories_for_new(
            delta.user, delta.item, delta.rating, old_U
        )
        if len(new_u):
            P_new, bu_new = fold_in(
                model, hists, foldin_reg, use_bias=use_bias
            )
            model = dataclasses.replace(
                model,
                P=model.P.at[new_u].set(P_new.astype(model.P.dtype)),
                bu=model.bu.at[new_u].set(bu_new.astype(model.bu.dtype)),
            )
        # … then new items against the UPDATED user table, so an item
        # rated only by new users still gets a meaningful row
        new_i, hists = _histories_for_new(
            delta.item, delta.user, delta.rating, old_I
        )
        if len(new_i):
            Q_new, bi_new = fold_in(
                model, hists, foldin_reg, use_bias=use_bias, transpose=True
            )
            model = dataclasses.replace(
                model,
                Q=model.Q.at[new_i].set(Q_new.astype(model.Q.dtype)),
                bi=model.bi.at[new_i].set(bi_new.astype(model.bi.dtype)),
            )

    train = dataclasses.replace(delta, num_users=U, num_items=I)
    if replay is not None:
        train = train.concat(
            dataclasses.replace(replay, num_users=U, num_items=I)
        )
    tr = float("nan")
    if cfg.epochs > 0:
        for _ep, model, tr in train_epochs(
            model, train, cfg, use_bias=use_bias, seed=seed
        ):
            pass
        tr = float(tr)  # blocked path yields a lazy 0-d device array
    return model, tr
