"""Weighted NMF — non-negative MF on the observed ratings only.

The third classic member of the explicit-feedback MF family (after SGD-MF
and ALS): factor tables constrained to the non-negative orthant give
parts-based, directly interpretable factors (Lee & Seung 1999; Zhang et
al. 2006 for the observed-entries-only "weighted" variant used by
recommenders). The reference snapshot ships no code
(/root/reference/README.md:1-2); this extends the BASELINE.json model
ladder on the same sparse pipeline.

Objective (no biases, no mean-centering — NMF models the raw ratings):

    min_{P,Q >= 0}  sum_{(u,i) in Omega} (r_ui - p_u . q_i)^2
                    + reg * sum_u deg_u ||p_u||^2 + reg * sum_i deg_i ||q_i||^2

TPU-native mapping: the multiplicative update for a row needs exactly the
ALS normal-equation blocks — numerator ``b_u = sum r_ui q_i`` and
denominator ``A_u p_u`` with the Gram ``A_u = sum q_i q_i^T`` — so each
half-sweep reuses the degree-bucketed batched-Gram machinery of
mfx/solvers/als.py verbatim (sorted piece runs, MXU einsums, ~100x less
HBM traffic than an outer-product stream) and replaces the Cholesky solve
with

    p  <-  p * b / (A p + lam p + eps)        (elementwise; lam = reg*deg)

— a batched (rows, k, k) x (rows, k) matvec. The update preserves
non-negativity by construction and monotonically decreases the objective
(the classical MU majorize-minimize argument applies per row since A is
PSD and b >= 0 for non-negative ratings); several inner iterations per
half-sweep reuse the same (A, b) at matvec cost.
"""

from __future__ import annotations

import functools
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from mfx.config import NMFConfig
from mfx.data.coo import RatingsCOO
from mfx.models.mf import MFModel
from mfx.solvers.als import (
    accumulate_range,
    build_bucket_plan,
    gram_rowchunk,
)

__all__ = ["nmf_half_sweep", "train_sweeps_nmf", "mu_update", "fold_nonneg"]

_EPS = 1e-9


def mu_update(A, b, cnt, old, reg, *, inner_iters: int):
    """``inner_iters`` multiplicative updates on the fixed (A, b) blocks;
    rows with no ratings keep their factors. Traceable — shared by the
    single-chip jit wrapper and the data-parallel shard_map body
    (mfx/parallel/nmf_dp.py)."""
    lam = reg * jnp.maximum(cnt, 1.0)

    def body(p, _):
        denom = jnp.einsum(
            "rde,re->rd", A, p, preferred_element_type=jnp.float32
        ) + lam[:, None] * p + _EPS
        return p * b / denom, None

    sol, _ = jax.lax.scan(body, old, None, length=inner_iters)
    return jnp.where(cnt[:, None] > 0, sol, old)


_mu_update = jax.jit(mu_update, static_argnames=("inner_iters",))


def check_nmf_inputs(train: RatingsCOO, use_bias: bool) -> None:
    if use_bias:
        raise ValueError(
            "NMF is bias-free (it factorizes the raw non-negative ratings); "
            "set model.use_bias=false or use solver='als'/'sgd'"
        )
    if float(np.min(train.rating)) < 0.0:
        raise ValueError("NMF needs non-negative ratings")


def fold_nonneg(model: MFModel) -> MFModel:
    """Fold an MF init onto the non-negative orthant (floored at a small
    positive value so multiplicative updates can move every coordinate)
    and zero the mean/biases — NMF predicts ``p_u . q_i`` directly."""
    return MFModel(
        P=jnp.maximum(jnp.abs(model.P), 1e-3),
        Q=jnp.maximum(jnp.abs(model.Q), 1e-3),
        bu=jnp.zeros_like(model.bu),
        bi=jnp.zeros_like(model.bi),
        mu=jnp.asarray(0.0, model.P.dtype),
    )


def nmf_half_sweep(
    F_target,
    F_other,
    coo_rows: np.ndarray,  # target-side id per rating (presorted by this)
    coo_cols,  # fixed-side id per rating (device ok)
    coo_vals,  # ratings, must be >= 0 (device ok)
    reg: float,
    row_chunk: int = 8192,
    inner_iters: int = 2,
    plan=None,
):
    """Multiplicatively update one table against the other."""
    num_rows, k = F_target.shape
    row_chunk = gram_rowchunk(k, row_chunk)
    if plan is None:
        plan = build_bucket_plan(coo_rows, num_rows)
    buckets, _ = plan
    cols_dev = jnp.asarray(coo_cols)
    vals_dev = jnp.asarray(coo_vals)
    f = F_target.dtype
    zero_b = jnp.zeros((F_other.shape[0],), f)  # unused bias column
    mu0 = jnp.asarray(0.0, f)

    new = []
    for r0 in range(0, num_rows, row_chunk):
        r1 = min(r0 + row_chunk, num_rows)
        A, b, cnt = accumulate_range(
            F_other, zero_b, mu0, cols_dev, vals_dev, buckets, r0, r1,
            d=k, dtype=f, use_bias=False,
        )
        new.append(
            _mu_update(
                A, b, cnt, F_target[r0:r1], jnp.asarray(reg, f),
                inner_iters=inner_iters,
            )
        )
    return jnp.concatenate(new) if len(new) > 1 else new[0]


def train_sweeps_nmf(
    model: MFModel,
    train: RatingsCOO,
    cfg: NMFConfig,
    use_bias: bool = False,
    row_chunk: int | None = None,
) -> Iterator[tuple[int, MFModel]]:
    """Alternate non-negative P/Q updates; yields (sweep, model).

    The incoming init is folded onto the non-negative orthant
    (``|P|, |Q|``, floored at a small positive value so multiplicative
    updates can move every coordinate), and the model's mean/biases are
    zeroed: NMF predicts ``p_u . q_i`` directly. ``use_bias`` must be
    False — bias terms belong to the unconstrained objectives.
    """
    check_nmf_inputs(train, use_bias)
    row_chunk = row_chunk or cfg.user_chunk
    model = fold_nonneg(model)
    # sort + bucket once per run, as the ALS/iALS solvers do
    by_u = np.argsort(train.user, kind="stable")
    u_rows = train.user[by_u]
    u_cols = jnp.asarray(train.item[by_u])
    u_vals = jnp.asarray(train.rating[by_u])
    by_i = np.argsort(train.item, kind="stable")
    i_rows = train.item[by_i]
    i_cols = jnp.asarray(train.user[by_i])
    i_vals = jnp.asarray(train.rating[by_i])
    u_plan = build_bucket_plan(u_rows, model.num_users)
    i_plan = build_bucket_plan(i_rows, model.num_items)

    for sweep in range(cfg.sweeps):
        P = nmf_half_sweep(
            model.P, model.Q, u_rows, u_cols, u_vals, cfg.reg,
            row_chunk=row_chunk, inner_iters=cfg.inner_iters, plan=u_plan,
        )
        model = MFModel(P=P, Q=model.Q, bu=model.bu, bi=model.bi, mu=model.mu)
        Q = nmf_half_sweep(
            model.Q, model.P, i_rows, i_cols, i_vals, cfg.reg,
            row_chunk=row_chunk, inner_iters=cfg.inner_iters, plan=i_plan,
        )
        model = MFModel(P=model.P, Q=Q, bu=model.bu, bi=model.bi, mu=model.mu)
        yield sweep, model
