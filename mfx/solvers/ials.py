"""iALS — implicit-feedback weighted ALS (Hu/Koren/Volinsky 2008).

The classic solver for implicit data (view/click/play counts), filling the
capability square between the explicit ALS cross-check (mfx/solvers/als.py,
SURVEY.md K3) and pairwise BPR (mfx/solvers/bpr.py, BASELINE configs[4]):
BPR optimizes ranking directly by sampling negatives; iALS treats EVERY
unobserved (u, i) as a weak zero-preference observation and solves the
weighted least-squares problem in closed form — no negative sampling, and
a handful of sweeps converge.

Objective (bias-free, the canonical form):

    min Σ_{u,i} c_ui (p_ui − x_uᵀ y_i)² + λ (Σ‖x_u‖² + Σ‖y_i‖²)

with binary preference ``p_ui = 1`` iff observed and confidence
``c_ui = 1 + alpha·r_ui`` (unobserved cells have c = 1, p = 0). The
per-user normal equations need a sum over ALL items, but the standard
algebraic split keeps the work proportional to the observed entries only:

    A_u = YᵀY + Σ_{i∈Ω(u)} (c_ui − 1) y_i y_iᵀ + λI
    b_u =        Σ_{i∈Ω(u)}  c_ui      y_i

TPU-native mapping: ``YᵀY`` is one (k, k) MXU matmul per half-sweep; the
observed-entry corrections reuse the explicit solver's degree-bucketed
batched-Gram machinery (mfx/solvers/als.py — sorted runs cut into pieces,
``einsum('rmd,rme->rde')`` on the MXU, ~100x less HBM traffic than a
materialized outer-product + segment-sum stream), with the factor rows
pre-scaled by sqrt(c − 1) so the same einsum produces the weighted Gram.
Rows solve in bounded ranges with a batched Cholesky. The item half-sweep
is the same code with roles swapped.

Reference lineage: the reference snapshot ships no code
(/root/reference/README.md:1-2); this component extends the BASELINE.json
capability ladder (configs[4] "implicit feedback") with the standard
non-sampling implicit solver.
"""

from __future__ import annotations

import functools
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from mfx.config import IALSConfig
from mfx.data.coo import RatingsCOO
from mfx.models.mf import MFModel
from mfx.solvers.als import (
    build_bucket_plan,
    gram_rowchunk,
    iter_bucket_chunks,
)

__all__ = ["ials_half_sweep", "train_sweeps_ials", "weighted_gram_accumulate"]


def weighted_gram_accumulate(
    F_other,  # (rows_other, k) fixed factors
    alpha,
    cols_dev,  # (n,) fixed-side id per rating (sorted by target row)
    vals_dev,  # (n,) raw feedback strength r >= 0
    rows_rel,  # (nb,) int32 range-local target row per piece (pad: nseg-1)
    starts,  # (nb,) piece start in the sorted arrays
    lens,  # (nb,) int32 piece length (pad: 0)
    A,  # (nseg, k, k) accumulator of Σ (c-1) y yᵀ
    b,  # (nseg, k) accumulator of Σ c y
    *,
    cap: int,
):
    """Observed-entry corrections for one piece bucket: with confidence
    c = 1 + alpha·v, accumulate A += Σ (c−1) y yᵀ (as a sqrt-scaled
    self-einsum, exact for v ≥ 0) and b += Σ c·y. Traceable; shared by the
    single-chip jit wrapper and the data-parallel shard_map body."""
    nb = rows_rel.shape[0]
    k = F_other.shape[1]
    lane = jnp.arange(cap, dtype=starts.dtype)
    idx = jnp.clip(starts[:, None] + lane[None, :], 0, cols_dev.shape[0] - 1)
    mask = (lane[None, :] < lens[:, None]).astype(F_other.dtype)
    c = jnp.take(cols_dev, idx)  # (nb, cap)
    v = jnp.take(vals_dev, idx)
    y = jnp.take(F_other, c.reshape(-1), axis=0).reshape(nb, cap, k)
    w = alpha * v * mask  # c_ui − 1, masked
    yw = y * jnp.sqrt(w)[:, :, None]
    A_p = jnp.einsum(
        "rmd,rme->rde", yw, yw, preferred_element_type=jnp.float32
    )
    b_p = jnp.einsum(
        "rm,rmd->rd", (1.0 + w) * mask, y * mask[:, :, None],
        preferred_element_type=jnp.float32,
    )
    A = A.at[rows_rel].add(A_p, mode="drop")
    b = b.at[rows_rel].add(b_p, mode="drop")
    return A, b


@functools.partial(jax.jit, static_argnames=("cap",))
def _wgram_bucket(
    F_other, alpha, cols_dev, vals_dev, rows_rel, starts, lens, A, b,
    *, cap: int,
):
    return weighted_gram_accumulate(
        F_other, alpha, cols_dev, vals_dev, rows_rel, starts, lens, A, b,
        cap=cap,
    )


@jax.jit
def _solve_wgram(A, b, G, old, reg):
    """x = (G + A + λI)⁻¹ b per row; untouched rows keep their factors."""
    k = G.shape[0]
    M = G[None, :, :] + A + reg * jnp.eye(k, dtype=A.dtype)
    sol = jax.scipy.linalg.cho_solve(
        (jax.scipy.linalg.cholesky(M, lower=True), True), b[..., None]
    )[..., 0]
    touched = jnp.any(b != 0.0, axis=1)
    return jnp.where(touched[:, None], sol, old)


def ials_half_sweep(
    F_target,  # (rows, k) table being solved
    F_other,  # (rows_other, k) fixed table
    coo_rows: np.ndarray,  # target-side id per rating (presorted by this)
    coo_cols,  # fixed-side id per rating (device ok)
    coo_vals,  # feedback strengths (device ok)
    alpha: float,
    reg: float,
    row_chunk: int = 8192,
    plan=None,
):
    """Solve one table against the other (confidence-weighted). Ratings
    must be sorted by ``coo_rows``; ``plan`` is the matching
    ``build_bucket_plan`` result (built here when absent)."""
    num_rows, k = F_target.shape
    row_chunk = gram_rowchunk(k, row_chunk)
    if plan is None:
        plan = build_bucket_plan(coo_rows, num_rows)
    buckets, _ = plan
    cols_dev = jnp.asarray(coo_cols)
    vals_dev = jnp.asarray(coo_vals)
    f = F_target.dtype
    alpha = jnp.asarray(alpha, f)
    G = jnp.dot(
        F_other.T, F_other, preferred_element_type=jnp.float32
    ).astype(f)

    new = []
    for r0 in range(0, num_rows, row_chunk):
        r1 = min(r0 + row_chunk, num_rows)
        nseg = (r1 - r0) + 1  # +1: pad pieces target the dropped last seg
        A = jnp.zeros((nseg, k, k), f)
        b = jnp.zeros((nseg, k), f)
        for cap, rows_rel, starts, lens in iter_bucket_chunks(
            buckets, r0, r1, nseg
        ):
            A, b = _wgram_bucket(
                F_other, alpha, cols_dev, vals_dev,
                rows_rel, starts, lens, A, b, cap=cap,
            )
        sol = _solve_wgram(
            A[: r1 - r0], b[: r1 - r0], G, F_target[r0:r1],
            jnp.asarray(reg, f),
        )
        new.append(sol)
    return jnp.concatenate(new) if len(new) > 1 else new[0]


def check_ials_inputs(train: RatingsCOO, use_bias: bool) -> None:
    """Shared validation for the single/DP/ring iALS trainers."""
    if use_bias:
        raise ValueError(
            "iALS is bias-free (binary preference target); set "
            "model.use_bias=false or use solver='als' for explicit ratings"
        )
    if float(np.min(train.rating)) < 0.0:
        raise ValueError(
            "iALS needs non-negative feedback strengths (confidence "
            "c = 1 + alpha*r is accumulated via sqrt(alpha*r); a negative "
            "r would silently produce NaN factors) — shift/clip the "
            "ratings or use solver='als'/'sgd' for signed explicit data"
        )


def train_sweeps_ials(
    model: MFModel,
    train: RatingsCOO,
    cfg: IALSConfig,
    use_bias: bool = False,
    row_chunk: int | None = None,
) -> Iterator[tuple[int, MFModel]]:
    """Alternate P/Q confidence-weighted solves; yields (sweep, model).

    ``use_bias`` must be False: iALS's preference target is binary and the
    confidence weighting absorbs feedback strength — bias terms belong to
    the explicit-rating objective (mfx/solvers/als.py handles those).
    """
    check_ials_inputs(train, use_bias)
    row_chunk = row_chunk or cfg.user_chunk
    # sort + bucket once per run (degrees don't change across sweeps);
    # cols/vals go to the device here, once, like the explicit solver
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
        P = ials_half_sweep(
            model.P, model.Q, u_rows, u_cols, u_vals, cfg.alpha, cfg.reg,
            row_chunk=row_chunk, plan=u_plan,
        )
        model = MFModel(P=P, Q=model.Q, bu=model.bu, bi=model.bi, mu=model.mu)
        Q = ials_half_sweep(
            model.Q, model.P, i_rows, i_cols, i_vals, cfg.alpha, cfg.reg,
            row_chunk=row_chunk, plan=i_plan,
        )
        model = MFModel(P=model.P, Q=Q, bu=model.bu, bi=model.bi, mu=model.mu)
        yield sweep, model
