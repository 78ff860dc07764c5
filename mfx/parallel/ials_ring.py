"""Ring-sharded iALS — no-gather implicit weighted ALS over row-sharded
factor tables (K3b x P2; the sharded-catalog counterpart of
mfx/parallel/ials_dp.py, closing the row-sharded-iALS queue item).

Identical ring structure to mfx/parallel/als_ring.py — and it REUSES
that module's run-constant piece plan (host or device-assisted builder)
and block rotation wholesale; only the per-chunk accumulation body and
the solve differ:

- accumulation: the confidence-weighted corrections
  ``A += sum (c-1) y y'``, ``b += sum c y``
  (mfx/solvers/ials.py::weighted_gram_accumulate) against the currently
  held rotating block;
- the dense base Gram ``G = Y'Y`` over the whole fixed table is one
  per-half-sweep psum of shard-local block Grams ((k, k) each — a
  negligible collective);
- solve: ``x = (G + A + reg I)^-1 b`` per row (the iALS closed form),
  shard-local.

Per half-sweep each fixed block crosses ICI S*NR times (the block
itself); the O(rows * k^2) accumulators never leave their shard — the
traffic trade that scales with sharded tables, exactly as for ring ALS.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mfx.config import IALSConfig
from mfx.data.coo import RatingsCOO
from mfx.models.mf import MFModel
from mfx.runtime.mesh import MODEL_AXIS
from mfx.parallel.als_ring import (
    RingAlsPlan,
    _ring_rotate_one,
    _round_up,
    _shuffle,
    build_ring_als_plan,
    build_ring_als_plan_device,
    ring_accumulate_range,
)
from mfx.solvers.als import gram_rowchunk
from mfx.solvers.ials import weighted_gram_accumulate, _solve_wgram

__all__ = ["train_sweeps_ials_ring"]


@functools.partial(jax.jit, static_argnames=("mesh", "cap"))
def _ring_wgram_chunk(rotF, alpha, cols, vals, pc, A, b, *, mesh, cap):
    # rotF (S, fix_block, k); pc (S, 3, nb); A (S, nseg, k, k) — all
    # sharded on the model axis; each shard folds its own pieces into
    # its own accumulators against the block it currently holds
    def body(rF, a_r, c, v, p, A_p, b_p):
        A1, b1 = weighted_gram_accumulate(
            rF[0], a_r, c[0], v[0], p[0, 0], p[0, 1], p[0, 2],
            A_p[0], b_p[0], cap=cap,
        )
        return A1[None], b1[None]

    ax = P(MODEL_AXIS)
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(ax, P(), ax, ax, ax, ax, ax),
        out_specs=(ax, ax),
    )(rotF, alpha, cols, vals, pc, A, b)


@functools.partial(jax.jit, static_argnames=("mesh",))
def _full_gram(rotF, *, mesh: Mesh):
    """G = F'F over the whole row-sharded fixed table (one tiny psum)."""

    def body(rF):
        g = jnp.dot(
            rF[0].reshape(-1, rF.shape[-1]).T,
            rF[0].reshape(-1, rF.shape[-1]),
            preferred_element_type=jnp.float32,
        )
        return lax.psum(g, MODEL_AXIS)

    return jax.shard_map(
        body, mesh=mesh, in_specs=(P(MODEL_AXIS),), out_specs=P()
    )(rotF)


@functools.partial(
    jax.jit, static_argnames=("mesh", "nr"), donate_argnums=(0,)
)
def _ring_wsolve_update(tgtF, A, b, G, reg, r0, *, mesh: Mesh, nr: int):
    def body(tF, A_p, b_p, G_r, reg_r, r0_r):
        old = lax.dynamic_slice_in_dim(tF[0], r0_r, nr)
        sol = _solve_wgram(A_p[0, :nr], b_p[0, :nr], G_r, old, reg_r)
        return lax.dynamic_update_slice_in_dim(tF[0], sol, r0_r, 0)[None]

    ax = P(MODEL_AXIS)
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(ax, ax, ax, P(), P(), P()),
        out_specs=ax,
    )(tgtF, A, b, G, reg, r0)


def _ials_ring_half_sweep(tgtF, rotF, plan: RingAlsPlan, alpha, reg, mesh):
    """Solve the sharded target table against the rotating fixed table;
    returns (tgtF, rotF) with the rotating table back in home alignment."""
    S, k = plan.S, tgtF.shape[-1]
    nseg = plan.row_chunk + 1
    f = tgtF.dtype
    shd = NamedSharding(mesh, P(MODEL_AXIS))
    alphaj = jnp.asarray(alpha, f)
    regj = jnp.asarray(reg, f)
    G = _full_gram(rotF, mesh=mesh).astype(f)
    for ri in range(plan.NR):
        A = jax.device_put(jnp.zeros((S, nseg, k, k), f), shd)
        b = jax.device_put(jnp.zeros((S, nseg, k), f), shd)

        def acc(cap, pc):
            nonlocal A, b
            A, b = _ring_wgram_chunk(
                rotF, alphaj, plan.cols, plan.vals, pc, A, b,
                mesh=mesh, cap=cap,
            )

        def rot():
            nonlocal rotF
            rotF = _ring_rotate_one(rotF, mesh=mesh)

        ring_accumulate_range(plan, ri, acc, rot)
        tgtF = _ring_wsolve_update(
            tgtF, A, b, G, regj,
            jnp.asarray(ri * plan.row_chunk, jnp.int32),
            mesh=mesh, nr=plan.row_chunk,
        )
    return tgtF, rotF


def train_sweeps_ials_ring(
    model: MFModel,
    train: RatingsCOO,
    cfg: IALSConfig,
    mesh: Mesh,
    use_bias: bool = False,
    seed: int = 0,
    row_chunk: int | None = None,
):
    """Ring-sharded mirror of ``train_sweeps_ials``; yields (sweep,
    model) in the original id labeling after each full sweep."""
    from mfx.solvers.ials import check_ials_inputs

    check_ials_inputs(train, use_bias)
    S = mesh.shape[MODEL_AXIS]
    U, I, k = model.num_users, model.num_items, model.rank
    rc = gram_rowchunk(k, row_chunk or cfg.user_chunk)
    ublock = _round_up(_round_up(U, S) // S, rc)
    iblock = _round_up(_round_up(I, S) // S, rc)

    ufwd, uinv = _shuffle(U, seed, 0x1A15)
    ifwd, iinv = _shuffle(I, seed, 0x1A51)
    urel = ufwd[train.user]
    irel = ifwd[train.item]

    pd = getattr(cfg, "plan_device", "auto")
    on_device = pd == "device" or (
        pd == "auto" and jax.default_backend() == "tpu"
    )
    build = build_ring_als_plan_device if on_device else build_ring_als_plan
    u_plan = build(urel, irel, train.rating, S, ublock, iblock, rc, mesh)
    i_plan = build(irel, urel, train.rating, S, iblock, ublock, rc, mesh)

    shd = NamedSharding(mesh, P(MODEL_AXIS))

    def to_dev(x, block):
        x = np.asarray(x)
        pad = np.zeros((S * block,) + x.shape[1:], x.dtype)
        pad[: x.shape[0]] = x
        return jax.device_put(pad.reshape((S, block) + x.shape[1:]), shd)

    Pd = to_dev(np.asarray(model.P)[uinv], ublock)
    Qd = to_dev(np.asarray(model.Q)[iinv], iblock)

    for sweep in range(cfg.sweeps):
        Pd, Qd = _ials_ring_half_sweep(
            Pd, Qd, u_plan, cfg.alpha, cfg.reg, mesh
        )
        Qd, Pd = _ials_ring_half_sweep(
            Qd, Pd, i_plan, cfg.alpha, cfg.reg, mesh
        )
        Ph = jnp.reshape(Pd, (S * ublock, k))[:U][jnp.asarray(ufwd)]
        Qh = jnp.reshape(Qd, (S * iblock, k))[:I][jnp.asarray(ifwd)]
        yield sweep, MFModel(P=Ph, Q=Qh, bu=model.bu, bi=model.bi,
                             mu=model.mu)
