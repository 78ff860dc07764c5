"""Data-parallel ALS — the configs[3] composition ("Netflix-scale
data-parallel SGD + ALS cross-check on v5p-8"; SURVEY.md §2.2 K3 x P1).

The normal-equation accumulation A_u = Σ q q' + b_u = Σ r q is an
embarrassingly parallel sum over ratings: each shard computes partial
Grams from its share of the degree-bucketed pieces (mfx/solvers/als.py),
one ``psum`` over the mesh reduces them, and every shard runs the same
replicated batched-Cholesky solve. Factor tables stay replicated (the P1
pattern shared with DP SGD); gather bandwidth and MXU Gram work scale
with the chip count, and the (rows, d, d) Gram block crosses ICI once
per row range.

Determinism: piece -> shard assignment is a fixed contiguous split of the
(run-constant) bucket plan, psum is a deterministic tree reduction, and
the solve is replicated — same seed, same result, any mesh shape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from mfx.config import ALSConfig
from mfx.data.coo import RatingsCOO
from mfx.models.mf import MFModel
from mfx.solvers.als import (
    BUCKET_CAPS,
    BUCKET_CELLS,
    _pow2_at_least,
    _solve_gram,
    build_bucket_plan,
    gram_accumulate,
    gram_rowchunk,
)

__all__ = [
    "als_half_sweep_dp",
    "train_sweeps_als_dp",
    "dp_accumulate_range",
    "dp_bucket_chunks",
]


@functools.partial(
    jax.jit, static_argnames=("mesh", "cap", "use_bias")
)
def _dp_gram_chunk(
    F_other, b_other, mu, cols_dev, vals_dev,
    rows_rel,  # (D, nb) piece arrays, leading dim sharded over the mesh
    starts, lens,
    A,  # (D, nseg, d, d) per-shard partial accumulators
    b, cnt,
    *, mesh: Mesh, cap: int, use_bias: bool,
):
    axes = tuple(mesh.axis_names)

    def body(F_o, b_o, cols, vals, rr, st, ln, A_p, b_p, c_p):
        A1, b1, c1 = gram_accumulate(
            F_o, b_o, mu, cols, vals, rr[0], st[0], ln[0],
            A_p[0], b_p[0], c_p[0], cap=cap, use_bias=use_bias,
        )
        return A1[None], b1[None], c1[None]

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(axes), P(axes), P(axes),
                  P(axes), P(axes), P(axes)),
        out_specs=(P(axes), P(axes), P(axes)),
    )(F_other, b_other, cols_dev, vals_dev, rows_rel, starts, lens,
      A, b, cnt)


@functools.partial(jax.jit, static_argnames=("mesh", "use_bias"))
def _dp_solve(A, b, cnt, old, reg, *, mesh: Mesh, use_bias: bool):
    axes = tuple(mesh.axis_names)

    def body(A_p, b_p, c_p, old_r, reg_r):
        A_t = jax.lax.psum(A_p[0], axes)
        b_t = jax.lax.psum(b_p[0], axes)
        c_t = jax.lax.psum(c_p[0], axes)
        return _solve_gram(A_t, b_t, c_t, old_r, reg_r, use_bias=use_bias)

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axes), P(axes), P(axes), P(), P()),
        out_specs=P(),
    )(A, b, cnt, old, reg)


def iter_bucket_chunks_dp(buckets, r0, r1, nseg, nb_cap, D):
    """Yield ``(cap, rows_rel, starts, lens)`` piece chunks for target
    rows [r0, r1) packed as (D, nb) shard slabs — the DP twin of
    ``mfx.solvers.als.iter_bucket_chunks``, shared by the DP ALS/NMF
    accumulators and the DP iALS half-sweep. Pad slots target the
    dropped segment ``nseg - 1`` with zero length."""
    for cap, (prow, pstart, plen) in buckets.items():
        s, e = np.searchsorted(prow, [r0, r1])
        if e == s:
            continue
        nb = nb_cap[cap]
        per_call = D * nb
        for c0 in range(s, e, per_call):
            c1 = min(c0 + per_call, e)
            n = c1 - c0
            rows_rel = np.full((D, nb), nseg - 1, np.int32)
            starts = np.zeros((D, nb), pstart.dtype)
            lens = np.zeros((D, nb), np.int32)
            rows_rel.reshape(-1)[:n] = prow[c0:c1] - r0
            starts.reshape(-1)[:n] = pstart[c0:c1]
            lens.reshape(-1)[:n] = plen[c0:c1]
            yield (
                cap, jnp.asarray(rows_rel), jnp.asarray(starts),
                jnp.asarray(lens),
            )


def dp_accumulate_range(
    F_other, b_other, mu, cols_dev, vals_dev, buckets, r0, r1,
    *, d, dtype, nseg, nb_cap, D, mesh, use_bias,
):
    """Per-shard partial (A, b, cnt) for target rows [r0, r1) — pieces
    split contiguously across all mesh devices. Shared by the DP ALS
    Cholesky solve and the DP NMF multiplicative update
    (mfx/parallel/nmf_dp.py); the caller psums inside its solve."""
    A = jnp.zeros((D, nseg, d, d), dtype)
    b = jnp.zeros((D, nseg, d), dtype)
    cnt = jnp.zeros((D, nseg), dtype)
    for cap, rows_rel, starts, lens in iter_bucket_chunks_dp(
        buckets, r0, r1, nseg, nb_cap, D
    ):
        A, b, cnt = _dp_gram_chunk(
            F_other, b_other, mu, cols_dev, vals_dev,
            rows_rel, starts, lens, A, b, cnt,
            mesh=mesh, cap=cap, use_bias=use_bias,
        )
    return A, b, cnt


def dp_bucket_chunks(D: int) -> dict:
    """Fixed per-cap shard chunk so every range reuses one compiled
    program."""
    return {
        cap: _pow2_at_least(max(1, BUCKET_CELLS // cap // D))
        for cap in BUCKET_CAPS
    }


def als_half_sweep_dp(
    F_target, b_target, F_other, b_other, mu,
    coo_rows: np.ndarray, coo_cols: np.ndarray, coo_vals: np.ndarray,
    reg: float, use_bias: bool, mesh: Mesh,
    row_chunk: int = 8192, plan=None,
):
    """DP variant of ``als_half_sweep``: same inputs + a mesh. Pieces are
    split contiguously across all mesh devices; partial Grams psum."""
    D = int(np.prod(list(mesh.shape.values())))
    num_rows, k = F_target.shape
    d = k + 1 if use_bias else k
    row_chunk = gram_rowchunk(d, row_chunk)
    if plan is None:
        plan = build_bucket_plan(coo_rows, num_rows)
    buckets, _ = plan
    cols_dev = jnp.asarray(coo_cols)
    vals_dev = jnp.asarray(coo_vals)
    f = F_target.dtype
    nb_cap = dp_bucket_chunks(D)

    nseg = row_chunk + 1  # uniform across ranges; tail rows are padding
    new = []
    for r0 in range(0, num_rows, row_chunk):
        r1 = min(r0 + row_chunk, num_rows)
        A, b, cnt = dp_accumulate_range(
            F_other, b_other, mu, cols_dev, vals_dev, buckets, r0, r1,
            d=d, dtype=f, nseg=nseg, nb_cap=nb_cap, D=D, mesh=mesh,
            use_bias=use_bias,
        )
        nr = r1 - r0
        old = jnp.concatenate(
            [F_target[r0:r1], b_target[r0:r1, None]], axis=1
        ) if use_bias else F_target[r0:r1]
        old = jnp.pad(old, ((0, nseg - nr),) + ((0, 0),) * (old.ndim - 1))
        sol = _dp_solve(
            A, b, cnt, old, jnp.asarray(reg, f), mesh=mesh,
            use_bias=use_bias,
        )[:nr]
        new.append(sol)
    out = jnp.concatenate(new) if len(new) > 1 else new[0]
    if use_bias:
        return out[:, :k], out[:, k]
    return out, b_target


def train_sweeps_als_dp(
    model: MFModel,
    train: RatingsCOO,
    cfg: ALSConfig,
    mesh: Mesh,
    use_bias: bool = True,
    row_chunk: int | None = None,
):
    """DP mirror of ``train_sweeps_als``; yields (sweep, model)."""
    row_chunk = row_chunk or cfg.user_chunk
    # device-resident cols/vals built once (see train_sweeps_als)
    by_u = np.argsort(train.user, kind="stable")
    u_rows = train.user[by_u]
    u_cols, u_vals = jnp.asarray(train.item[by_u]), jnp.asarray(
        train.rating[by_u])
    by_i = np.argsort(train.item, kind="stable")
    i_rows = train.item[by_i]
    i_cols, i_vals = jnp.asarray(train.user[by_i]), jnp.asarray(
        train.rating[by_i])
    u_plan = build_bucket_plan(u_rows, model.num_users)
    i_plan = build_bucket_plan(i_rows, model.num_items)

    for sweep in range(cfg.sweeps):
        P_new, bu = als_half_sweep_dp(
            model.P, model.bu, model.Q, model.bi, model.mu,
            u_rows, u_cols, u_vals, cfg.reg, use_bias, mesh,
            row_chunk=row_chunk, plan=u_plan,
        )
        model = MFModel(P=P_new, Q=model.Q, bu=bu, bi=model.bi, mu=model.mu)
        Q_new, bi = als_half_sweep_dp(
            model.Q, model.bi, model.P, model.bu, model.mu,
            i_rows, i_cols, i_vals, cfg.reg, use_bias, mesh,
            row_chunk=row_chunk, plan=i_plan,
        )
        model = MFModel(P=model.P, Q=Q_new, bu=model.bu, bi=bi, mu=model.mu)
        yield sweep, model
