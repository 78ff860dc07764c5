"""Reference (non-Pallas) update path — SURVEY.md K4.

Pure-``jnp`` fused minibatch SGD step: gather factor rows, dot-product
residual with bias and L2 terms, rank-1 scatter-add updates. XLA's
scatter-add performs a deterministic segment-sum over duplicate rows, which
is the K2 "segment-sum gradient reduction" baseline. This function is the
numeric oracle the Pallas kernels (K1) are tested against, and the CPU
fallback path.

Semantics: minibatch SGD — all reads come from the batch-entry snapshot of
(P, Q, biases); per-row deltas are reduced (segment-sum) and applied once.
With batch_size=1 this is exactly the sequential update rule of the
reference Java algorithm (see mfx.oracle.java_oracle).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "sgd_minibatch_update",
    "sgd_compute_deltas",
    "sgd_apply_deltas",
    "batch_sq_error",
]


def sgd_compute_deltas(
    model, users, items, ratings, weights, lr, reg, *, use_bias: bool = True
):
    """Per-rating factor/bias deltas from the batch-entry snapshot.

    Returns (d_pu [B,k], d_qi [B,k], d_bu [B], d_bi [B], sq_err). Split out
    from sgd_minibatch_update so data-parallel training can compute deltas
    locally and exchange only the sparse (ids, deltas) pairs
    (mfx.parallel.data_parallel)."""
    # mode='clip': padded slots may carry out-of-range sentinel ids
    # (mfx.data.partition.pad_to_batches); they clamp to the last row,
    # whose gathered garbage is killed by weight 0 below
    pu = jnp.take(model.P, users, axis=0, mode="clip")
    qi = jnp.take(model.Q, items, axis=0, mode="clip")
    pred = jnp.sum(pu * qi, axis=-1) + model.mu
    if use_bias:
        bu = jnp.take(model.bu, users, mode="clip")
        bi = jnp.take(model.bi, items, mode="clip")
        pred = pred + bu + bi
    err = (ratings - pred) * weights
    e = err[:, None]
    w = weights[:, None]
    d_pu = lr * (e * qi - reg * w * pu)
    d_qi = lr * (e * pu - reg * w * qi)
    if use_bias:
        d_bu = lr * (err - reg * weights * bu)
        d_bi = lr * (err - reg * weights * bi)
    else:
        d_bu = jnp.zeros_like(err)
        d_bi = jnp.zeros_like(err)
    return d_pu, d_qi, d_bu, d_bi, jnp.sum(err * err)


def _dup_counts(ids):
    """Occurrences of each id within the batch (sort + binary search;
    no table-sized temporaries)."""
    s = jnp.sort(ids)
    left = jnp.searchsorted(s, ids, side="left")
    right = jnp.searchsorted(s, ids, side="right")
    return (right - left).astype(jnp.float32)


def sgd_apply_deltas(
    model, users, items, d_pu, d_qi, d_bu, d_bi, *,
    use_bias: bool = True, unique_rows: bool = False,
    dup_trust: float = 0.0, weights=None,
):
    """Scatter-add (segment-sum) deltas into the factor tables.

    ``dup_trust`` > 0 enables per-row trust scaling: when a row appears d
    times in the batch, its summed delta is scaled by min(1, dup_trust/d).
    A batch step on a row with d same-snapshot updates has curvature
    ∝ lr·d, so heavily duplicated rows (hot items under Zipf skew) diverge
    for lr·d ≳ 2; scaling caps the effective step while preserving the
    gradient direction (same device count ⇒ same counts ⇒ deterministic,
    and DP applies it to the gathered global batch, staying bitwise-equal
    to single-device)."""
    from mfx.models.mf import MFModel

    if dup_trust > 0.0 and not unique_rows:
        # padded slots (weight 0) must not inflate the count of row id 0;
        # their own scaled-down deltas are zero anyway
        cu, ci = users, items
        if weights is not None:
            pad = weights <= 0.0
            cu = jnp.where(pad, jnp.int32(0x3FFFFFFF), users)
            ci = jnp.where(pad, jnp.int32(0x3FFFFFFF), items)
        su = jnp.minimum(1.0, dup_trust / _dup_counts(cu))[:, None]
        si = jnp.minimum(1.0, dup_trust / _dup_counts(ci))[:, None]
        d_pu = d_pu * su
        d_qi = d_qi * si
        if use_bias:
            d_bu = d_bu * su[:, 0]
            d_bi = d_bi * si[:, 0]
    # mode='drop': out-of-range sentinel pads (unique per batch slot) are
    # dropped by the scatter, so unique_indices=True is an honest promise
    # even for padded conflict-free batches — id-0 pads would duplicate a
    # real row 0 and make duplicate handling implementation-defined
    mode = "drop"
    dt = model.P.dtype  # deltas may be f32 when batches are (bf16 tables)
    new_p = model.P.at[users].add(
        d_pu.astype(dt), unique_indices=unique_rows, mode=mode
    )
    new_q = model.Q.at[items].add(
        d_qi.astype(dt), unique_indices=unique_rows, mode=mode
    )
    if use_bias:
        new_bu = model.bu.at[users].add(
            d_bu.astype(dt), unique_indices=unique_rows, mode=mode
        )
        new_bi = model.bi.at[items].add(
            d_bi.astype(dt), unique_indices=unique_rows, mode=mode
        )
    else:
        new_bu, new_bi = model.bu, model.bi
    return MFModel(P=new_p, Q=new_q, bu=new_bu, bi=new_bi, mu=model.mu)


def sgd_minibatch_update(
    model,
    users: jax.Array,
    items: jax.Array,
    ratings: jax.Array,
    weights: jax.Array,
    lr: jax.Array,
    reg: jax.Array,
    *,
    use_bias: bool = True,
    unique_rows: bool = False,
    dup_trust: float = 0.0,
):
    """One fused minibatch SGD update. Returns (new_model, batch_sq_err).

    users/items: int32 [B]; ratings/weights: f32 [B]. Padded slots carry
    weight 0.0 and are exact no-ops. ``unique_rows=True`` promises the batch
    is conflict-free (no duplicate user or item row) letting XLA skip the
    duplicate-combining scatter path.
    """
    d_pu, d_qi, d_bu, d_bi, sq_err = sgd_compute_deltas(
        model, users, items, ratings, weights, lr, reg, use_bias=use_bias
    )
    new_model = sgd_apply_deltas(
        model, users, items, d_pu, d_qi, d_bu, d_bi,
        use_bias=use_bias, unique_rows=unique_rows, dup_trust=dup_trust,
        weights=weights,
    )
    return new_model, sq_err


def batch_sq_error(model, users, items, ratings, weights) -> jax.Array:
    """Weighted squared prediction error of a batch (no update)."""
    pred = model.predict(users, items)
    err = (ratings - pred) * weights
    return jnp.sum(err * err)
