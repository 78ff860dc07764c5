"""ALS solver — SURVEY.md K3: the fallback solver sharing the sparse
pipeline (BASELINE.json north star: "plus an ALS fallback solver sharing
the same sparse pipeline"; configs[3] uses it as a cross-check for
data-parallel SGD).

TPU-native formulation: each half-sweep solves one factor table by batched
rank-k normal equations,

    A_u = Σ_{i∈Ω(u)} q_i q_iᵀ + λ I,   b_u = Σ r_ui q_i,   p_u = A_u⁻¹ b_u

accumulated as segment-sums of outer products over fixed-size rating
chunks (bounded device memory regardless of dataset size OR rank: the
per-rating (m, d, d) outer-product intermediate is built for ``m``
ratings at a time inside a ``lax.scan``, with ``m`` and the row-range
size both derived from explicit byte budgets — at rank 128+bias the
netflix-scale sweep peaks well under 300 MB instead of the ~70 GB a
single materialized (2^20, d, d) tensor would need), and solved with a
batched Cholesky (``jax.scipy.linalg.cho_solve``) — all MXU-batched dense
algebra, no per-row Python.

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

# Device-memory budgets for the normal-equation accumulation. The
# per-sub-chunk outer-product intermediate is (m, d, d) and the per-range
# Gram accumulator is (row_chunk+1, d, d); both are sized from these caps
# so a rank-128 (d=129) sweep at 100M ratings stays within a few hundred
# MB of HBM (the round-1 code materialized the full (rating_chunk, d, d)
# tensor — ~70 GB at configs[3] geometry).
GRAM_SUBCHUNK_BUDGET = 256 * 1024 * 1024
GRAM_ROWCHUNK_BUDGET = 128 * 1024 * 1024


def _pow2_at_most(n: int, cap: int) -> int:
    """Largest power of two ≤ min(n, cap), at least 1."""
    n = max(1, min(n, cap))
    return 1 << (n.bit_length() - 1)


def gram_subchunk(d: int, rating_chunk: int) -> int:
    """Ratings per scan step of the Gram accumulation."""
    return _pow2_at_most(GRAM_SUBCHUNK_BUDGET // (d * d * 4), rating_chunk)


def gram_rowchunk(d: int, row_chunk: int) -> int:
    """Rows per batched-Cholesky solve, clamped to the accumulator budget."""
    return _pow2_at_most(GRAM_ROWCHUNK_BUDGET // (d * d * 4), row_chunk)


@functools.partial(
    jax.jit, static_argnames=("num_rows", "use_bias", "sub_chunk")
)
def _solve_range(
    F_other,  # (rows_other, k) fixed factors
    b_other,  # (rows_other,) fixed biases
    rows,  # (B,) int32 target row per rating, range-local (pad: num_rows)
    cols,  # (B,) int32 fixed-side row per rating
    vals,  # (B,) f32 residual targets (r - mu - b_fixed handled by caller)
    reg,
    num_rows: int,
    use_bias: bool,
    sub_chunk: int,
):
    """Accumulate normal equations for one row range and solve.

    Returns (F_new (num_rows, k[+1]), ok_mask (num_rows,)) where the last
    augmented coordinate is the bias when use_bias. The (m, d, d) outer
    products exist only per scan step (B must divide by sub_chunk).
    """
    k = F_other.shape[1]
    d = k + 1 if use_bias else k
    nseg = num_rows + 1  # pad rows target segment num_rows, sliced off
    m = sub_chunk
    f = F_other.dtype

    def body(carry, xs):
        A_acc, b_acc, cnt_acc = carry
        rw, cl, vl = xs  # (m,)
        q = jnp.take(F_other, cl, axis=0)
        if use_bias:
            q = jnp.concatenate([q, jnp.ones((m, 1), q.dtype)], axis=1)
        outer = q[:, :, None] * q[:, None, :]  # (m, d, d): the only big temp
        A_acc = A_acc + jax.ops.segment_sum(outer, rw, num_segments=nseg)
        b_acc = b_acc + jax.ops.segment_sum(
            vl[:, None] * q, rw, num_segments=nseg
        )
        cnt_acc = cnt_acc + jax.ops.segment_sum(
            jnp.ones_like(vl), rw, num_segments=nseg
        )
        return (A_acc, b_acc, cnt_acc), None

    init = (
        jnp.zeros((nseg, d, d), f),
        jnp.zeros((nseg, d), f),
        jnp.zeros((nseg,), f),
    )
    (A, b, counts), _ = jax.lax.scan(
        body,
        init,
        (rows.reshape(-1, m), cols.reshape(-1, m), vals.reshape(-1, m)),
    )
    A = A[:num_rows]
    b = b[:num_rows]
    counts = counts[:num_rows]
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
    d = k + 1 if use_bias else k
    # clamp both chunk sizes to the Gram byte budgets (rank-dependent)
    row_chunk = gram_rowchunk(d, row_chunk)
    sub = gram_subchunk(d, rating_chunk)
    rating_chunk = max(sub, (rating_chunk // sub) * sub)
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
            sub_chunk=sub,
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
