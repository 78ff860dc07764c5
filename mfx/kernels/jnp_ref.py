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

__all__ = ["sgd_minibatch_update", "batch_sq_error"]


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
):
    """One fused minibatch SGD update. Returns (new_model, batch_sq_err).

    users/items: int32 [B]; ratings/weights: f32 [B]. Padded slots carry
    weight 0.0 and are exact no-ops. ``unique_rows=True`` promises the batch
    is conflict-free (no duplicate user or item row) letting XLA skip the
    duplicate-combining scatter path.
    """
    from mfx.models.mf import MFModel

    pu = jnp.take(model.P, users, axis=0)
    qi = jnp.take(model.Q, items, axis=0)
    pred = jnp.sum(pu * qi, axis=-1) + model.mu
    if use_bias:
        bu = jnp.take(model.bu, users)
        bi = jnp.take(model.bi, items)
        pred = pred + bu + bi
    err = (ratings - pred) * weights

    e = err[:, None]
    w = weights[:, None]
    d_pu = lr * (e * qi - reg * w * pu)
    d_qi = lr * (e * pu - reg * w * qi)

    mode = "promise_in_bounds"
    new_p = model.P.at[users].add(d_pu, unique_indices=unique_rows, mode=mode)
    new_q = model.Q.at[items].add(d_qi, unique_indices=unique_rows, mode=mode)
    if use_bias:
        d_bu = lr * (err - reg * weights * bu)
        d_bi = lr * (err - reg * weights * bi)
        new_bu = model.bu.at[users].add(d_bu, unique_indices=unique_rows, mode=mode)
        new_bi = model.bi.at[items].add(d_bi, unique_indices=unique_rows, mode=mode)
    else:
        new_bu, new_bi = model.bu, model.bi

    sq_err = jnp.sum(err * err)  # weighted: padding contributes 0
    return (
        MFModel(P=new_p, Q=new_q, bu=new_bu, bi=new_bi, mu=model.mu),
        sq_err,
    )


def batch_sq_error(model, users, items, ratings, weights) -> jax.Array:
    """Weighted squared prediction error of a batch (no update)."""
    pred = model.predict(users, items)
    err = (ratings - pred) * weights
    return jnp.sum(err * err)
