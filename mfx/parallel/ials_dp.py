"""Data-parallel iALS — implicit weighted ALS over the mesh (the P1
pattern of mfx/parallel/als_dp.py applied to mfx/solvers/ials.py).

The confidence-weighted normal-equation accumulation
``A_u = Σ (c−1) y yᵀ``, ``b_u = Σ c y`` is an embarrassingly parallel sum
over observed entries: each shard computes partial weighted Grams from
its contiguous share of the degree-bucketed pieces, one ``psum`` reduces
them, and every shard runs the same replicated batched-Cholesky solve of
``(YᵀY + A_u + λI) x = b_u`` (the global Gram ``YᵀY`` is one replicated
matmul). Factor tables stay replicated; gather bandwidth and MXU Gram
work scale with the chip count.

Determinism: fixed contiguous piece split, deterministic psum tree,
replicated solve — same seed, same result, any mesh shape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from mfx.config import IALSConfig
from mfx.data.coo import RatingsCOO
from mfx.models.mf import MFModel
from mfx.parallel.als_dp import iter_bucket_chunks_dp
from mfx.solvers.als import (
    BUCKET_CAPS,
    BUCKET_CELLS,
    _pow2_at_least,
    build_bucket_plan,
    gram_rowchunk,
)
from mfx.solvers.ials import _solve_wgram, weighted_gram_accumulate

__all__ = ["ials_half_sweep_dp", "train_sweeps_ials_dp"]


@functools.partial(jax.jit, static_argnames=("mesh", "cap"))
def _dp_wgram_chunk(
    F_other, alpha, cols_dev, vals_dev,
    rows_rel, starts, lens,  # (D, nb), leading dim sharded over the mesh
    A, b,  # (D, nseg, k, k) / (D, nseg, k) per-shard partials
    *, mesh: Mesh, cap: int,
):
    axes = tuple(mesh.axis_names)

    def body(F_o, al, cols, vals, rr, st, ln, A_p, b_p):
        A1, b1 = weighted_gram_accumulate(
            F_o, al, cols, vals, rr[0], st[0], ln[0], A_p[0], b_p[0],
            cap=cap,
        )
        return A1[None], b1[None]

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(axes), P(axes), P(axes),
                  P(axes), P(axes)),
        out_specs=(P(axes), P(axes)),
    )(F_other, alpha, cols_dev, vals_dev, rows_rel, starts, lens, A, b)


@functools.partial(jax.jit, static_argnames=("mesh",))
def _dp_wsolve(A, b, G, old, reg, *, mesh: Mesh):
    axes = tuple(mesh.axis_names)

    def body(A_p, b_p, G_r, old_r, reg_r):
        A_t = jax.lax.psum(A_p[0], axes)
        b_t = jax.lax.psum(b_p[0], axes)
        return _solve_wgram(A_t, b_t, G_r, old_r, reg_r)

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axes), P(axes), P(), P(), P()),
        out_specs=P(),
    )(A, b, G, old, reg)


def ials_half_sweep_dp(
    F_target, F_other, coo_rows: np.ndarray, coo_cols, coo_vals,
    alpha: float, reg: float, mesh: Mesh,
    row_chunk: int = 8192, plan=None,
):
    """DP variant of ``ials_half_sweep``: same inputs + a mesh."""
    D = int(np.prod(list(mesh.shape.values())))
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
    nb_cap = {
        cap: _pow2_at_least(max(1, BUCKET_CELLS // cap // D))
        for cap in BUCKET_CAPS
    }

    nseg = row_chunk + 1  # uniform across ranges; tail rows are padding
    new = []
    for r0 in range(0, num_rows, row_chunk):
        r1 = min(r0 + row_chunk, num_rows)
        A = jnp.zeros((D, nseg, k, k), f)
        b = jnp.zeros((D, nseg, k), f)
        for cap, rows_rel, starts, lens in iter_bucket_chunks_dp(
            buckets, r0, r1, nseg, nb_cap, D
        ):
            A, b = _dp_wgram_chunk(
                F_other, alpha, cols_dev, vals_dev,
                rows_rel, starts, lens, A, b, mesh=mesh, cap=cap,
            )
        nr = r1 - r0
        old = jnp.pad(F_target[r0:r1], ((0, nseg - nr), (0, 0)))
        sol = _dp_wsolve(A, b, G, old, jnp.asarray(reg, f), mesh=mesh)[:nr]
        new.append(sol)
    return jnp.concatenate(new) if len(new) > 1 else new[0]


def train_sweeps_ials_dp(
    model: MFModel,
    train: RatingsCOO,
    cfg: IALSConfig,
    mesh: Mesh,
    use_bias: bool = False,
    row_chunk: int | None = None,
):
    """DP mirror of ``train_sweeps_ials``; yields (sweep, model)."""
    from mfx.solvers.ials import check_ials_inputs

    check_ials_inputs(train, use_bias)
    row_chunk = row_chunk or cfg.user_chunk
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
        P_new = ials_half_sweep_dp(
            model.P, model.Q, u_rows, u_cols, u_vals, cfg.alpha, cfg.reg,
            mesh, row_chunk=row_chunk, plan=u_plan,
        )
        model = MFModel(P=P_new, Q=model.Q, bu=model.bu, bi=model.bi,
                        mu=model.mu)
        Q_new = ials_half_sweep_dp(
            model.Q, model.P, i_rows, i_cols, i_vals, cfg.alpha, cfg.reg,
            mesh, row_chunk=row_chunk, plan=i_plan,
        )
        model = MFModel(P=model.P, Q=Q_new, bu=model.bu, bi=model.bi,
                        mu=model.mu)
        yield sweep, model
