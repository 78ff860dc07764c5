"""Ring-sharded weighted NMF — no-gather multiplicative updates over
row-sharded factor tables (K3c x P2; the sharded-catalog counterpart of
mfx/parallel/nmf_dp.py, completing the solver x parallel-mode matrix:
every Gram-engine solver now runs single / dp / ring-sharded).

Identical ring structure to mfx/parallel/als_ring.py — it REUSES that
module's run-constant piece plan (host or device-assisted builder), the
per-chunk Gram accumulation, and the block rotation wholesale; only the
per-range update differs: the batched Cholesky solve swaps for the
shard-local multiplicative update

    p  <-  p * b / (A p + lam p + eps)      (mfx/solvers/nmf.py::mu_update)

on the accumulated ``A = sum q q^T``, ``b = sum r q`` blocks. NMF is
bias-free (it factorizes the raw non-negative ratings), so the rotating
fixed table travels alone (``_ring_rotate_one``) and the bias column fed
to the Gram accumulator is a constant zero block.

Per half-sweep each fixed block crosses ICI S*NR times (the block
itself); the O(rows * k^2) accumulators never leave their shard — the
traffic trade that scales with sharded tables, exactly as for ring ALS.
The reference snapshot ships no code (/root/reference/README.md:1-2);
this extends the BASELINE.json model ladder at configs[4]-class catalog
scale.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mfx.config import NMFConfig
from mfx.data.coo import RatingsCOO
from mfx.models.mf import MFModel
from mfx.runtime.mesh import MODEL_AXIS
from mfx.parallel.als_ring import (
    RingAlsPlan,
    _ring_gram_chunk,
    _ring_rotate_one,
    _round_up,
    _shuffle,
    build_ring_als_plan,
    build_ring_als_plan_device,
    ring_accumulate_range,
)
from mfx.solvers.als import gram_rowchunk
from mfx.solvers.nmf import check_nmf_inputs, fold_nonneg, mu_update

__all__ = ["train_sweeps_nmf_ring"]


@functools.partial(
    jax.jit, static_argnames=("mesh", "nr", "inner_iters"),
    donate_argnums=(0,),
)
def _ring_mu_update(tgtF, A, b, cnt, reg, r0, *, mesh: Mesh, nr: int,
                    inner_iters: int):
    def body(tF, A_p, b_p, c_p, reg_r, r0_r):
        old = lax.dynamic_slice_in_dim(tF[0], r0_r, nr)
        sol = mu_update(
            A_p[0, :nr], b_p[0, :nr], c_p[0, :nr], old, reg_r,
            inner_iters=inner_iters,
        )
        return lax.dynamic_update_slice_in_dim(tF[0], sol, r0_r, 0)[None]

    ax = P(MODEL_AXIS)
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(ax, ax, ax, ax, P(), P()),
        out_specs=ax,
    )(tgtF, A, b, cnt, reg, r0)


def _nmf_ring_half_sweep(tgtF, rotF, plan: RingAlsPlan, reg, inner_iters,
                         mesh):
    """Multiplicatively update the sharded target table against the
    rotating fixed table; returns (tgtF, rotF) with the rotating table
    back in home alignment."""
    S, k = plan.S, tgtF.shape[-1]
    nseg = plan.row_chunk + 1
    f = tgtF.dtype
    shd = NamedSharding(mesh, P(MODEL_AXIS))
    regj = jnp.asarray(reg, f)
    muj = jnp.asarray(0.0, f)
    # bias-free: the accumulator's bias column is a constant zero block
    rotb = jax.device_put(jnp.zeros(rotF.shape[:2], f), shd)
    for ri in range(plan.NR):
        A = jax.device_put(jnp.zeros((S, nseg, k, k), f), shd)
        b = jax.device_put(jnp.zeros((S, nseg, k), f), shd)
        cnt = jax.device_put(jnp.zeros((S, nseg), f), shd)

        def acc(cap, pc):
            nonlocal A, b, cnt
            A, b, cnt = _ring_gram_chunk(
                rotF, rotb, muj, plan.cols, plan.vals, pc, A, b, cnt,
                mesh=mesh, cap=cap, use_bias=False,
            )

        def rot():
            nonlocal rotF
            rotF = _ring_rotate_one(rotF, mesh=mesh)

        ring_accumulate_range(plan, ri, acc, rot)
        tgtF = _ring_mu_update(
            tgtF, A, b, cnt, regj,
            jnp.asarray(ri * plan.row_chunk, jnp.int32),
            mesh=mesh, nr=plan.row_chunk, inner_iters=inner_iters,
        )
    return tgtF, rotF


def train_sweeps_nmf_ring(
    model: MFModel,
    train: RatingsCOO,
    cfg: NMFConfig,
    mesh: Mesh,
    use_bias: bool = False,
    seed: int = 0,
    row_chunk: int | None = None,
):
    """Ring-sharded mirror of ``train_sweeps_nmf``; yields (sweep,
    model) in the original id labeling after each full sweep."""
    check_nmf_inputs(train, use_bias)
    model = fold_nonneg(model)
    S = mesh.shape[MODEL_AXIS]
    U, I, k = model.num_users, model.num_items, model.rank
    rc = gram_rowchunk(k, row_chunk or cfg.user_chunk)
    ublock = _round_up(_round_up(U, S) // S, rc)
    iblock = _round_up(_round_up(I, S) // S, rc)

    ufwd, uinv = _shuffle(U, seed, 0x1F15)
    ifwd, iinv = _shuffle(I, seed, 0x1F51)
    urel = ufwd[train.user]
    irel = ifwd[train.item]

    on_device = cfg.plan_device == "device" or (
        cfg.plan_device == "auto" and jax.default_backend() == "tpu"
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
        Pd, Qd = _nmf_ring_half_sweep(
            Pd, Qd, u_plan, cfg.reg, cfg.inner_iters, mesh
        )
        Qd, Pd = _nmf_ring_half_sweep(
            Qd, Pd, i_plan, cfg.reg, cfg.inner_iters, mesh
        )
        Ph = jnp.reshape(Pd, (S * ublock, k))[:U][jnp.asarray(ufwd)]
        Qh = jnp.reshape(Qd, (S * iblock, k))[:I][jnp.asarray(ifwd)]
        yield sweep, MFModel(P=Ph, Q=Qh, bu=model.bu, bi=model.bi,
                             mu=model.mu)
