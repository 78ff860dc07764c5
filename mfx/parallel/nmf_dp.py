"""Data-parallel weighted NMF (SURVEY.md K3-family x P1).

The multiplicative update needs the same per-row normal-equation blocks
as ALS (A_u = sum q q', b_u = sum r q), so the DP composition is the DP
ALS one (mfx/parallel/als_dp.py): each shard folds its contiguous share
of the degree-bucketed pieces into partial Grams inside ``shard_map``,
one ``psum`` per row range reduces them, and the multiplicative update
(mfx/solvers/nmf.py::mu_update — a batched matvec, replicated) replaces
the batched Cholesky solve. Tables stay replicated; determinism follows
from the fixed piece split + deterministic psum, as for DP ALS.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from mfx.config import NMFConfig
from mfx.data.coo import RatingsCOO
from mfx.models.mf import MFModel
from mfx.parallel.als_dp import dp_accumulate_range, dp_bucket_chunks
from mfx.solvers.als import build_bucket_plan, gram_rowchunk
from mfx.solvers.nmf import check_nmf_inputs, fold_nonneg, mu_update

__all__ = ["nmf_half_sweep_dp", "train_sweeps_nmf_dp"]


@functools.partial(jax.jit, static_argnames=("mesh", "inner_iters"))
def _dp_mu_solve(A, b, cnt, old, reg, *, mesh: Mesh, inner_iters: int):
    axes = tuple(mesh.axis_names)

    def body(A_p, b_p, c_p, old_r, reg_r):
        A_t = jax.lax.psum(A_p[0], axes)
        b_t = jax.lax.psum(b_p[0], axes)
        c_t = jax.lax.psum(c_p[0], axes)
        return mu_update(A_t, b_t, c_t, old_r, reg_r,
                         inner_iters=inner_iters)

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axes), P(axes), P(axes), P(), P()),
        out_specs=P(),
    )(A, b, cnt, old, reg)


def nmf_half_sweep_dp(
    F_target, F_other,
    coo_rows: np.ndarray, coo_cols, coo_vals,
    reg: float, mesh: Mesh,
    row_chunk: int = 8192, inner_iters: int = 2, plan=None,
):
    """DP variant of ``nmf_half_sweep``: same inputs + a mesh."""
    D = int(np.prod(list(mesh.shape.values())))
    num_rows, k = F_target.shape
    row_chunk = gram_rowchunk(k, row_chunk)
    if plan is None:
        plan = build_bucket_plan(coo_rows, num_rows)
    buckets, _ = plan
    cols_dev = jnp.asarray(coo_cols)
    vals_dev = jnp.asarray(coo_vals)
    f = F_target.dtype
    nb_cap = dp_bucket_chunks(D)
    zero_b = jnp.zeros((F_other.shape[0],), f)  # unused bias column
    mu0 = jnp.asarray(0.0, f)

    nseg = row_chunk + 1  # uniform across ranges; tail rows are padding
    new = []
    for r0 in range(0, num_rows, row_chunk):
        r1 = min(r0 + row_chunk, num_rows)
        A, b, cnt = dp_accumulate_range(
            F_other, zero_b, mu0, cols_dev, vals_dev, buckets, r0, r1,
            d=k, dtype=f, nseg=nseg, nb_cap=nb_cap, D=D, mesh=mesh,
            use_bias=False,
        )
        nr = r1 - r0
        old = jnp.pad(F_target[r0:r1], ((0, nseg - nr), (0, 0)))
        new.append(
            _dp_mu_solve(
                A, b, cnt, old, jnp.asarray(reg, f), mesh=mesh,
                inner_iters=inner_iters,
            )[:nr]
        )
    return jnp.concatenate(new) if len(new) > 1 else new[0]


def train_sweeps_nmf_dp(
    model: MFModel,
    train: RatingsCOO,
    cfg: NMFConfig,
    mesh: Mesh,
    use_bias: bool = False,
    row_chunk: int | None = None,
):
    """DP mirror of ``train_sweeps_nmf``; yields (sweep, model)."""
    check_nmf_inputs(train, use_bias)
    row_chunk = row_chunk or cfg.user_chunk
    model = fold_nonneg(model)
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
        Pn = nmf_half_sweep_dp(
            model.P, model.Q, u_rows, u_cols, u_vals, cfg.reg, mesh,
            row_chunk=row_chunk, inner_iters=cfg.inner_iters, plan=u_plan,
        )
        model = MFModel(P=Pn, Q=model.Q, bu=model.bu, bi=model.bi,
                        mu=model.mu)
        Qn = nmf_half_sweep_dp(
            model.Q, model.P, i_rows, i_cols, i_vals, cfg.reg, mesh,
            row_chunk=row_chunk, inner_iters=cfg.inner_iters, plan=i_plan,
        )
        model = MFModel(P=model.P, Q=Qn, bu=model.bu, bi=model.bi,
                        mu=model.mu)
        yield sweep, model
