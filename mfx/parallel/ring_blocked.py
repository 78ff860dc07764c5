"""P2 × K1 — the fused Pallas kernel inside the multi-chip DSGD ring
(SURVEY.md §3.2(a): "K1 Pallas kernel inside the shard_map epoch";
VERDICT round-1 item #2 — round 1 ran the XLA scatter path here).

Factor tables live in the SAME merged rank-packed layout the single-chip
kernel uses (mfx/kernels/packing.py), row-sharded over the mesh: shard s
owns a contiguous run of user blocks of P and, at sub-step t, holds item
block (s + t) mod S of Q. Each sub-step runs `blocked_sgd_sweep_pallas`
on the local merged tables — gather/dot/scatter as one-hot MXU matmuls,
biases riding in the block — then the merged Q blocks rotate one ICI hop
(`ppermute`). Strata at a sub-step are pairwise disjoint in both tables,
so shards never conflict and the epoch is deterministic.

The ring runs over the FLATTENED mesh ('data', 'model'): a DSGD schedule
needs user-disjoint × item-disjoint strata per sub-step, which a 2-D
mesh satisfies as one longer ring (an all-to-all lowers onto the torus
the same way). A mesh-of-1 ring is bitwise-identical to the single-chip
blocked path on the same plan (tested).

Host planning mirrors mfx/kernels/blocked_host.py per (sub-step, shard)
stratum, padded to a common grid length so shard_map sees uniform shapes;
padded grid steps repeat the last user block with all-sentinel tiles (an
exact no-op by the kernel's one-hot construction).
"""

from __future__ import annotations

import dataclasses
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from mfx.config import SGDConfig
from mfx.data.coo import RatingsCOO
from mfx.data.split import epoch_permutation
from mfx.kernels import blocked_host as bh
from mfx.kernels import packing as pk
from mfx.kernels.sgd_pallas import BIAS_ROWS, blocked_sgd_sweep_pallas
from mfx.models.mf import MFModel
from mfx.runtime.mesh import DATA_AXIS, MODEL_AXIS

__all__ = [
    "ring_geometry",
    "plan_ring_epoch_blocked",
    "make_ring_blocked_epoch_fn",
    "train_epochs_ring_blocked",
]


@dataclasses.dataclass
class RingGeometry:
    S: int
    su: int
    si: int
    ublock: int  # user rows per shard (multiple of su)
    iblock: int  # item rows per block (multiple of si)
    tile: int
    tpg: int

    @property
    def nwin(self) -> int:  # Q windows per block (whole block VMEM-resident)
        return self.iblock // self.si


def ring_geometry(
    num_users: int, num_items: int, S: int, cfg: SGDConfig, rank: int
) -> RingGeometry:
    su, si = cfg.ublock, cfg.iblock
    ublock = -(-(-(-num_users // S)) // su) * su
    iblock = -(-(-(-num_items // S)) // si) * si
    # the held Q block stays VMEM-resident for the whole sub-step; larger
    # tables need more shards or a smaller item block
    from mfx.solvers.blocked import VMEM_Q_BUDGET

    pack = 128 // rank
    qbytes = (iblock // si) * (si // pack + BIAS_ROWS) * 128 * 4
    if qbytes > VMEM_Q_BUDGET:
        raise ValueError(
            f"per-shard item block ({qbytes/2**20:.1f} MB merged) exceeds "
            f"the VMEM budget ({VMEM_Q_BUDGET/2**20:.1f} MB); raise the "
            "shard count or lower sgd.iblock"
        )
    return RingGeometry(
        S=S, su=su, si=si, ublock=ublock, iblock=iblock,
        tile=cfg.tile, tpg=4,
    )


@dataclasses.dataclass
class RingBlockedPlan:
    """Uniform per-(sub-step, shard) sweep plans.

    sa: int32 [S, S, NG]; tc: int32 [S, S, NT]; tl: int32 [S, S, NT, 3, T]
    (dims: sub-step t, shard s; NT = NG * tpg common across cells).
    """

    sa: np.ndarray
    tc: np.ndarray
    tl: np.ndarray
    n_real: int
    geo: RingGeometry


def plan_ring_epoch_blocked(
    coo: RatingsCOO, geo: RingGeometry, perm: np.ndarray
) -> RingBlockedPlan:
    """Stratify one epoch into the S×S ring schedule, each cell planned as
    one blocked item-sweep over the held block's windows."""
    S = geo.S
    u = coo.user[perm].astype(np.int64)
    i = coo.item[perm].astype(np.int64)
    r = coo.rating[perm]
    s_of = u // geo.ublock
    b_of = i // geo.iblock
    t_of = (b_of - s_of) % S

    cells: list[list[bh.SweepPlan]] = []
    ng_max = 1
    for t in range(S):
        row = []
        for s in range(S):
            sel = (t_of == t) & (s_of == s)
            b = (s + t) % S
            plans = bh.build_sweep_plans(
                (u[sel] - s * geo.ublock).astype(np.int64),
                (i[sel] - b * geo.iblock).astype(np.int64),
                r[sel],
                geo.ublock,
                geo.iblock,
                geo.su,
                geo.si,
                geo.tile,
                geo.tpg,
                geo.nwin,
            )
            assert len(plans) == 1  # whole block = one sweep
            row.append(plans[0])
            ng_max = max(ng_max, plans[0].sa.shape[0])
        cells.append(row)

    nt_max = ng_max * geo.tpg
    sa = np.zeros((S, S, ng_max), np.int32)
    tc = np.zeros((S, S, nt_max), np.int32)
    tl = np.empty((S, S, nt_max, 3, geo.tile), np.int32)
    tl[..., 0, :] = geo.su  # pad sentinels
    tl[..., 1, :] = geo.si
    tl[..., 2, :] = 0
    n_real = 0
    for t in range(S):
        for s in range(S):
            p = cells[t][s]
            ng = p.sa.shape[0]
            sa[t, s, :ng] = p.sa
            # padded grid steps repeat the final block id: the kernel's
            # contiguous-visit invariant holds and sentinel tiles are no-ops
            sa[t, s, ng:] = p.sa[-1] if ng else 0
            tc[t, s, : ng * geo.tpg] = p.tc
            tl[t, s, : ng * geo.tpg] = p.tl
            n_real += p.n_real
    return RingBlockedPlan(sa=sa, tc=tc, tl=tl, n_real=n_real, geo=geo)


def _ring_axes(mesh: Mesh):
    axes = tuple(
        a for a in (DATA_AXIS, MODEL_AXIS) if mesh.shape.get(a, 1) > 1
    )
    return axes if axes else (MODEL_AXIS,)


def make_ring_blocked_epoch_fn(
    mesh: Mesh, geo: RingGeometry, rank: int, use_bias: bool,
    exact: bool = False, interpret: bool = False,
    mxu_bf16: bool = False, step_u: bool = False,
):
    """Jitted blocked-kernel DSGD-ring epoch over the flattened mesh."""
    axes = _ring_axes(mesh)
    S = geo.S
    ring = [(j, (j - 1) % S) for j in range(S)]

    def _epoch(Pm_, Qm_, sa, tc, tl, lr, reg, mu):
        # locals: Pm_ merged P partition; Qm_ the merged block held at t=0
        def substep(carry, xs):
            Pm, Qm = carry
            sweep = {"sa": xs[0][0], "tc": xs[1][0], "tl": xs[2][0]}
            Pm, Qm, sse = blocked_sgd_sweep_pallas(
                Pm, Qm, sweep, lr, reg, mu,
                su=geo.su, si=geo.si, rank=rank, tpg=geo.tpg,
                use_bias=use_bias, exact=exact, interpret=interpret,
                mxu_bf16=mxu_bf16, step_u=step_u,
            )
            Qm = lax.ppermute(Qm, axes, ring)
            return (Pm, Qm), sse[0, 0]

        (Pm_, Qm_), sses = lax.scan(substep, (Pm_, Qm_), (sa, tc, tl))
        return Pm_, Qm_, lax.psum(jnp.sum(sses), axes)

    shard_spec = P(axes)
    plan_spec = P(None, axes)
    sharded = jax.shard_map(
        _epoch,
        mesh=mesh,
        in_specs=(
            shard_spec, shard_spec,
            plan_spec, plan_spec, plan_spec,
            P(), P(), P(),
        ),
        out_specs=(shard_spec, shard_spec, P()),
        check_vma=False,
    )

    @jax.jit
    def epoch(Pm, Qm, plan_arrays, lr, reg, mu):
        return sharded(
            Pm, Qm,
            plan_arrays["sa"], plan_arrays["tc"], plan_arrays["tl"],
            lr, reg, mu,
        )

    return epoch


def train_epochs_ring_blocked(
    model: MFModel,
    train: RatingsCOO,
    cfg: SGDConfig,
    use_bias: bool,
    mesh: Mesh,
    seed: int = 0,
    start_epoch: int = 0,
    exact: bool = False,
    interpret: bool = False,
) -> Iterator[tuple[int, MFModel, float]]:
    """Sharded-table epochs through the fused Pallas kernel. Yields the
    unsharded model each epoch (tables stay in the merged packed layout on
    device between epochs)."""
    axes = _ring_axes(mesh)
    S = int(np.prod([mesh.shape[a] for a in axes]))
    U, I, rank = model.num_users, model.num_items, model.rank
    geo = ring_geometry(train.num_users, train.num_items, S, cfg, rank)
    mu = float(model.mu)

    # pad tables to S equal blocks, then convert to the merged layout
    padded = MFModel(
        P=pk._pad_rows(model.P, S * geo.ublock),
        Q=pk._pad_rows(model.Q, S * geo.iblock),
        bu=pk._pad_rows(model.bu[:, None], S * geo.ublock)[:, 0],
        bi=pk._pad_rows(model.bi[:, None], S * geo.iblock)[:, 0],
        mu=model.mu,
    )
    Pm, Qm = pk.pack_state(padded, geo.su, geo.si)

    epoch_fn = make_ring_blocked_epoch_fn(
        mesh, geo, rank, use_bias, exact=exact, interpret=interpret,
        mxu_bf16=cfg.mxu == "bf16", step_u=cfg.step_user_batch,
    )
    replan_every = cfg.replan_every
    plan = None
    for epoch in range(start_epoch, cfg.epochs):
        lr = cfg.lr * (cfg.lr_decay**epoch)
        if plan is None or (replan_every and epoch % replan_every == 0):
            perm = epoch_permutation(train.n_ratings, seed, epoch)
            plan = plan_ring_epoch_blocked(train, geo, perm)
            arrays = {
                "sa": jnp.asarray(plan.sa),
                "tc": jnp.asarray(plan.tc),
                "tl": jnp.asarray(plan.tl),
            }
        Pm, Qm, sse = epoch_fn(
            Pm, Qm, arrays,
            jnp.asarray(lr, jnp.float32),
            jnp.asarray(cfg.reg, jnp.float32),
            jnp.asarray(mu, jnp.float32),
        )
        out = pk.unpack_state(
            Pm, Qm, mu, S * geo.ublock, S * geo.iblock, rank, geo.su, geo.si
        )
        out = MFModel(
            P=out.P[:U], Q=out.Q[:I], bu=out.bu[:U], bi=out.bi[:I],
            mu=out.mu,
        )
        yield epoch, out, float(jnp.sqrt(sse / max(1, train.n_ratings)))
