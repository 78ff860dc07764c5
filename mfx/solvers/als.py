"""ALS solver — SURVEY.md K3: the fallback solver sharing the sparse
pipeline (BASELINE.json north star: "plus an ALS fallback solver sharing
the same sparse pipeline"; configs[3] uses it as a cross-check for
data-parallel SGD).

TPU-native formulation: each half-sweep solves one factor table by batched
rank-k normal equations,

    A_u = Σ_{i∈Ω(u)} q_i q_iᵀ + λ I,   b_u = Σ r_ui q_i,   p_u = A_u⁻¹ b_u

accumulated as segment-sums of outer products over fixed-size rating
chunks (bounded device memory regardless of dataset size; users are
processed in row ranges so the (range, k, k) Gram tensor stays small), and
solved with a batched Cholesky (``jax.scipy.linalg.cho_solve``) — all
MXU-batched dense algebra, no per-row Python.

Biases use the augmented-vector trick: solving for [p_u, bu_u] against
q̃_i = [q_i, 1] makes the bias an extra least-squares coordinate with the
same regularizer — the exact biased-MF objective.

The item half-sweep is the same code with roles swapped (via COO
transposition), so both halves share one implementation and one pipeline.
"""

from __future__ import annotations

import functools
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from mfx.config import ALSConfig
from mfx.data.coo import RatingsCOO
from mfx.models.mf import MFModel

__all__ = ["als_half_sweep", "train_sweeps_als"]


@functools.partial(jax.jit, static_argnames=("num_rows", "use_bias"))
def _solve_range(
    F_other,  # (rows_other, k) fixed factors
    b_other,  # (rows_other,) fixed biases
    rows,  # (B,) int32 target row per rating, range-local (pad: num_rows)
    cols,  # (B,) int32 fixed-side row per rating
    vals,  # (B,) f32 residual targets (r - mu - b_fixed handled by caller)
    reg,
    num_rows: int,
    use_bias: bool,
):
    """Accumulate normal equations for one row range and solve.

    Returns (F_new (num_rows, k[+1]), ok_mask (num_rows,)) where the last
    augmented coordinate is the bias when use_bias.
    """
    k = F_other.shape[1]
    q = jnp.take(F_other, cols, axis=0)  # (B, k)
    if use_bias:
        q = jnp.concatenate([q, jnp.ones((q.shape[0], 1), q.dtype)], axis=1)
    d = q.shape[1]
    outer = q[:, :, None] * q[:, None, :]  # (B, d, d)
    A = jax.ops.segment_sum(outer, rows, num_segments=num_rows + 1)[:num_rows]
    b = jax.ops.segment_sum(vals[:, None] * q, rows, num_segments=num_rows + 1)[
        :num_rows
    ]
    counts = jax.ops.segment_sum(
        jnp.ones_like(vals), rows, num_segments=num_rows + 1
    )[:num_rows]
    A = A + reg * jnp.eye(d, dtype=A.dtype)
    F_new = jax.scipy.linalg.cho_solve(
        (jax.scipy.linalg.cholesky(A, lower=True), True), b[..., None]
    )[..., 0]
    ok = counts > 0  # rows with no ratings keep their old factors
    return F_new, ok


def als_half_sweep(
    F_target,  # (rows, k) table being solved
    b_target,  # (rows,)
    F_other,
    b_other,
    mu,
    coo_rows: np.ndarray,  # target-side id per rating (presorted by this)
    coo_cols: np.ndarray,  # fixed-side id per rating
    coo_vals: np.ndarray,
    reg: float,
    use_bias: bool,
    row_chunk: int = 8192,
    rating_chunk: int = 1 << 19,
):
    """Solve one table against the other. Ratings must be sorted by
    ``coo_rows`` (caller sorts once per training run)."""
    num_rows, k = F_target.shape
    # residual targets: subtract mu and the fixed side's bias
    bounds = np.append(np.arange(0, num_rows, row_chunk), num_rows)
    starts = np.searchsorted(coo_rows, bounds)
    new_F = []
    new_b = []
    for ri, r0 in enumerate(range(0, num_rows, row_chunk)):
        r1 = min(r0 + row_chunk, num_rows)
        s, e = int(starts[ri]), int(starts[ri + 1])
        n = e - s
        nr = r1 - r0
        # pad the rating slice to a fixed multiple for stable jit shapes
        m = max(rating_chunk, -(-max(n, 1) // rating_chunk) * rating_chunk)
        rows = np.full(m, nr, np.int32)  # pad -> dropped segment
        cols = np.zeros(m, np.int32)
        vals = np.zeros(m, np.float32)
        rows[:n] = coo_rows[s:e] - r0
        cols[:n] = coo_cols[s:e]
        vals[:n] = coo_vals[s:e]
        vals_dev = jnp.asarray(vals)
        cols_dev = jnp.asarray(cols)
        resid = vals_dev - mu
        if use_bias:
            resid = resid - jnp.take(b_other, cols_dev)
        resid = jnp.where(jnp.asarray(rows) < nr, resid, 0.0)
        sol, ok = _solve_range(
            F_other, b_other, jnp.asarray(rows), cols_dev, resid,
            jnp.asarray(reg, F_target.dtype), num_rows=nr, use_bias=use_bias,
        )
        old = jnp.concatenate(
            [F_target[r0:r1], b_target[r0:r1, None]], axis=1
        ) if use_bias else F_target[r0:r1]
        sol = jnp.where(ok[:, None], sol, old)
        if use_bias:
            new_F.append(sol[:, :k])
            new_b.append(sol[:, k])
        else:
            new_F.append(sol)
            new_b.append(b_target[r0:r1])
    return jnp.concatenate(new_F), jnp.concatenate(new_b)


def train_sweeps_als(
    model: MFModel,
    train: RatingsCOO,
    cfg: ALSConfig,
    use_bias: bool = True,
    row_chunk: int | None = None,
) -> Iterator[tuple[int, MFModel]]:
    """Alternate P/Q solves; yields (sweep, model) after each full sweep."""
    row_chunk = row_chunk or cfg.user_chunk
    # sort once per run: by user for the P-step, by item for the Q-step
    by_u = np.argsort(train.user, kind="stable")
    u_rows, u_cols, u_vals = (
        train.user[by_u], train.item[by_u], train.rating[by_u])
    by_i = np.argsort(train.item, kind="stable")
    i_rows, i_cols, i_vals = (
        train.item[by_i], train.user[by_i], train.rating[by_i])

    for sweep in range(cfg.sweeps):
        P, bu = als_half_sweep(
            model.P, model.bu, model.Q, model.bi, model.mu,
            u_rows, u_cols, u_vals, cfg.reg, use_bias,
            row_chunk=row_chunk, rating_chunk=cfg.rating_chunk,
        )
        model = MFModel(P=P, Q=model.Q, bu=bu, bi=model.bi, mu=model.mu)
        Q, bi = als_half_sweep(
            model.Q, model.bi, model.P, model.bu, model.mu,
            i_rows, i_cols, i_vals, cfg.reg, use_bias,
            row_chunk=row_chunk, rating_chunk=cfg.rating_chunk,
        )
        model = MFModel(P=model.P, Q=Q, bu=model.bu, bi=bi, mu=model.mu)
        yield sweep, model
