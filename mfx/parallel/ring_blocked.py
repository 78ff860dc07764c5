"""P2 × K1 — the fused Pallas kernel inside the multi-chip DSGD ring
(SURVEY.md §3.2(a): "K1 Pallas kernel inside the shard_map epoch").

Factor tables live in the SAME merged rank-packed layout the single-chip
kernel uses (mfx/kernels/packing.py), row-sharded over the mesh: shard s
owns a contiguous run of user blocks of P and, at sub-step t, holds item
block (s + t) mod S of Q. Each sub-step runs `blocked_sgd_sweep_pallas`
on the local merged tables — gather/dot/scatter as one-hot MXU matmuls,
biases riding in the block — then the merged Q blocks rotate one ICI hop
(`ppermute`). Strata at a sub-step are pairwise disjoint in both tables,
so shards never conflict and the epoch is deterministic.

Round-3 design (VERDICT round 2, directives #2/#3 + Missing #2/#3):

- **Planning is device-side and O(strata) on the host.** The ring plan
  skeleton is built once (one segment_sum + host layout arithmetic);
  each replan is a seeded device sort/scatter
  (mfx/kernels/plan_ring_device.py). ``cfg.plan_device`` is irrelevant
  here — the ring ALWAYS plans on device (it runs as plain XLA on CPU
  test platforms too).
- **Held blocks stream through VMEM in segments.** A sub-step runs
  ``nseg`` kernel calls, each over a ``nwin``-window segment of the held
  Q block sliced into VMEM scratch (the single-chip multi-sweep
  machinery, mfx/solvers/blocked.py::sweep_geometry) — so per-shard item
  blocks of any size train through the fused kernel; round 2 raised when
  the whole block didn't fit the VMEM budget.
- **Block-cyclic item placement.** Item ``i`` maps to ring position
  ``(i % S) * iblock + i // S``: with frequency-relabeled catalogs the
  Zipf head spreads round-robin over shards (near-uniform cell loads —
  the padded plan slabs stay tight) and each shard's held block keeps a
  frequency-sorted local head (the hook for per-shard dense strata).
  The mapping is a device gather at pack/unpack time; S=1 degenerates to
  the identity, so a mesh-of-1 ring stays bitwise-identical to the
  single-chip blocked path on the device planner (tested).

The ring runs over the FLATTENED mesh ('data', 'model'): a DSGD schedule
needs user-disjoint × item-disjoint strata per sub-step, which a 2-D
mesh satisfies as one longer ring (an all-to-all lowers onto the torus
the same way).
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
from mfx.kernels import packing as pk
from mfx.kernels import plan_ring_device as prd
from mfx.kernels.sgd_pallas import blocked_sgd_sweep_pallas
from mfx.models.mf import MFModel
from mfx.runtime.mesh import DATA_AXIS, MODEL_AXIS

__all__ = [
    "ring_geometry",
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
    nwin: int  # windows per VMEM segment

    @property
    def nseg(self) -> int:
        return -(-(self.iblock // self.si) // self.nwin)


def ring_geometry(
    num_users: int, num_items: int, S: int, cfg: SGDConfig, rank: int
) -> RingGeometry:
    su, si = cfg.ublock, cfg.iblock
    ublock = -(-(-(-num_users // S)) // su) * su
    iblock = -(-(-(-num_items // S)) // si) * si
    # segments of nwin windows stream the held block through VMEM; the
    # step-batched kernel variant keeps its concat buffers in VMEM too,
    # so its scratch comes out of the segment budget exactly as on the
    # single-chip path (mfx/solvers/blocked.py)
    from mfx.solvers.blocked import VMEM_Q_BUDGET, sweep_geometry

    tpg = 4
    budget = VMEM_Q_BUDGET
    if cfg.step_user_batch:
        # floor only guards the step_u scratch subtraction — it must not
        # override a small configured/test budget on the plain path
        budget = max(
            1 << 21,
            budget - tpg * cfg.tile * (su // (128 // rank) + 4 * 128) * 4,
        )
    nwin = sweep_geometry(iblock, rank, si, budget=budget)
    return RingGeometry(
        S=S, su=su, si=si, ublock=ublock, iblock=iblock,
        tile=cfg.tile, tpg=tpg, nwin=nwin,
    )


def cyclic_map(i, S: int, iblock: int):
    """Item id -> ring position (round-robin over blocks)."""
    return (i % S) * iblock + i // S


def cyclic_unmap(j, S: int, iblock: int):
    return (j % iblock) * S + j // iblock


def _ring_axes(mesh: Mesh):
    axes = tuple(
        a for a in (DATA_AXIS, MODEL_AXIS) if mesh.shape.get(a, 1) > 1
    )
    return axes if axes else (MODEL_AXIS,)


def make_ring_blocked_epoch_fn(
    mesh: Mesh, geo: RingGeometry, rank: int, use_bias: bool,
    seg_meta: tuple,  # ((win0, nwin), ...) static per segment
    exact: bool = False, interpret: bool = False,
    mxu_bf16: bool = False, step_u: bool = False,
    dense_meta: tuple = (),  # ((win0, nwin), ...) static per dense group
    rfmt: str = "int8",
    pack_path: str = "roll", bias_mode: str = "tile",
    dense_echo: int = 1,
):
    """Jitted blocked-kernel DSGD-ring epoch over the flattened mesh.

    With dense groups, each sub-step first runs one dense phase per
    group on the held block's matching Q segment (the head split is the
    single (0, head) group; ``prepare_dense_ring_full`` carves grouped
    strata over the whole block), then the sparse segments — the same
    dense-then-sparse order as the single-chip fused epoch."""
    axes = _ring_axes(mesh)
    S = geo.S
    ring = [(j, (j - 1) % S) for j in range(S)]
    nseg = len(seg_meta)
    # bias_mode='lane': tables arrive lane-augmented (biases in the factor
    # lanes; packing.to_lane_model) — same kernels, no bias machinery
    lane = use_bias and bias_mode == "lane"
    with_dense = bool(dense_meta)

    def _epoch(Pm_, Qm_, sas, tcs, tls, dense, lr, reg, mu):
        # locals: Pm_ merged P partition; Qm_ the merged block held at t=0
        def substep(carry, xs):
            Pm, Qm = carry
            xsa, xtc, xtl, xdense = xs
            sse = jnp.zeros((), jnp.float32)
            if with_dense:
                from mfx.solvers.dense_prep import dense_phase_core

                for k, (win0, nwin) in enumerate(dense_meta):
                    local = {kk: v[0] for kk, v in xdense[k].items()}
                    Qs = pk.q_segment(Qm, win0, nwin, rank, geo.si)
                    Pm, Qs, s = dense_phase_core(
                        Pm, Qs, local, lr, reg, mu,
                        su=geo.su, si=geo.si, rank=rank, use_bias=use_bias,
                        exact=exact, interpret=interpret, rfmt=rfmt,
                        lane=lane, echo=dense_echo,
                    )
                    Qm = pk.q_segment_restore(Qm, Qs, win0, rank, geo.si)
                    sse = sse + s
            for k, (win0, nwin) in enumerate(seg_meta):
                sweep = {
                    "sa": xsa[k][0], "tc": xtc[k][0], "tl": xtl[k][0]
                }
                Qs = pk.q_segment(Qm, win0, nwin, rank, geo.si)
                Pm, Qs, s = blocked_sgd_sweep_pallas(
                    Pm, Qs, sweep, lr, reg, mu,
                    su=geo.su, si=geo.si, rank=rank, tpg=geo.tpg,
                    use_bias=use_bias, exact=exact, interpret=interpret,
                    mxu_bf16=mxu_bf16, step_u=step_u, bias_mode=bias_mode,
                    pack_path=pack_path,
                )
                Qm = pk.q_segment_restore(Qm, Qs, win0, rank, geo.si)
                sse = sse + s[0, 0]
            Qm = lax.ppermute(Qm, axes, ring)
            return (Pm, Qm), sse

        (Pm_, Qm_), sses = lax.scan(
            substep, (Pm_, Qm_), (sas, tcs, tls, dense)
        )
        return Pm_, Qm_, lax.psum(jnp.sum(sses), axes)

    shard_spec = P(axes)
    plan_spec = P(None, axes)
    dense_spec = tuple(
        {
            k: plan_spec
            for k in ("sa", "sc", "R", "du_s", "di_s", "du_tot", "di_tot")
        }
        for _ in dense_meta
    )
    sharded = jax.shard_map(
        _epoch,
        mesh=mesh,
        in_specs=(
            shard_spec, shard_spec,
            (plan_spec,) * nseg, (plan_spec,) * nseg, (plan_spec,) * nseg,
            dense_spec,
            P(), P(), P(),
        ),
        out_specs=(shard_spec, shard_spec, P()),
        check_vma=False,
    )

    @jax.jit
    def epoch(Pm, Qm, sas, tcs, tls, dense, lr, reg, mu):
        return sharded(Pm, Qm, sas, tcs, tls, dense, lr, reg, mu)

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
    I_pad = S * geo.iblock
    U_pad = S * geo.ublock

    # lane-bias mode: augment the tables (biases into the reserved factor
    # lanes) before padding/remapping — both are row-wise, so sharding
    # composes; yielded models un-augment below
    lane = use_bias and cfg.bias_mode == "lane"
    if lane:
        model = pk.to_lane_model(model)

    # pad tables to S equal blocks; item rows take their block-cyclic ring
    # positions (Qring[j] = Q[cyclic_unmap(j)]), then merge-pack
    unmap = cyclic_unmap(np.arange(I_pad, dtype=np.int64), S, geo.iblock)
    remap = jnp.asarray(cyclic_map(np.arange(I_pad, dtype=np.int64), S,
                                   geo.iblock))
    Qpad = pk._pad_rows(model.Q, I_pad)
    bipad = pk._pad_rows(model.bi[:, None], I_pad)[:, 0]
    padded = MFModel(
        P=pk._pad_rows(model.P, U_pad),
        Q=Qpad[jnp.asarray(unmap)],
        bu=pk._pad_rows(model.bu[:, None], U_pad)[:, 0],
        bi=bipad[jnp.asarray(unmap)],
        mu=model.mu,
    )
    Pm, Qm = pk.pack_state(padded, geo.su, geo.si)

    # device-resident COO in ring coordinates
    u_dev = jnp.asarray(train.user)
    ir_dev = cyclic_map(jnp.asarray(train.item, jnp.int32), S, geo.iblock)
    r_dev = jnp.asarray(train.rating)

    # dense strata per (sub-step, shard) cell (directive #5): the head
    # split, or the grouped full-span split (dense_span='full')
    pack = 128 // rank
    want_dense = cfg.dense_chi != 0 and geo.su == geo.si and pack in (1, 2, 4)
    dense_groups: tuple = ()
    dense_meta: tuple = ()
    rfmt = "int8"
    if want_dense:
        from mfx.solvers.blocked import (
            DENSE_HEAD_ITEMS, dense_group_windows, dense_rfmt,
        )
        from mfx.solvers.dense_prep import (
            prepare_dense_ring, prepare_dense_ring_full,
        )

        rfmt = dense_rfmt(cfg, pack, r_dev)
        if cfg.dense_span == "full":
            nwd = cfg.dense_nwd or dense_group_windows(rank, geo.si)
            dense_meta, dense_groups, (u_dev, ir_dev, r_dev), _ = (
                prepare_dense_ring_full(
                    u_dev, ir_dev, r_dev, S, geo.ublock, geo.iblock,
                    geo.su, geo.si, chi_min=cfg.dense_chi, nwd=nwd,
                    pack=pack, rfmt=rfmt,
                )
            )
        else:
            dense_tensors, (u_dev, ir_dev, r_dev), _ = prepare_dense_ring(
                u_dev, ir_dev, r_dev, S, geo.ublock, geo.iblock, geo.su,
                geo.si, chi_min=cfg.dense_chi,
                head_items=DENSE_HEAD_ITEMS, pack=pack, rfmt=rfmt,
            )
            if dense_tensors is not None:
                nwh = dense_tensors["di_tot"].shape[2]
                dense_meta = ((0, nwh),)
                dense_groups = (dense_tensors,)

    # the sparse plan skeleton is built once from the remaining ratings;
    # segments with no tiles (e.g. fully-dense splits) are skipped
    skel = prd.build_ring_skeleton(
        u_dev, ir_dev, S, geo.ublock, geo.iblock, geo.su, geo.si,
        geo.tile, geo.tpg, geo.nwin,
    )
    keep = [k for k, seg in enumerate(skel.segments) if seg.nt > 0]
    seg_meta = tuple(
        (skel.segments[k].win0, skel.segments[k].nwin) for k in keep
    )
    sas = tuple(skel.segments[k].sa for k in keep)
    tcs = tuple(skel.segments[k].tc for k in keep)

    epoch_fn = make_ring_blocked_epoch_fn(
        mesh, geo, rank, use_bias, seg_meta,
        exact=exact, interpret=interpret,
        mxu_bf16=cfg.mxu == "bf16", step_u=cfg.step_user_batch,
        dense_meta=dense_meta, rfmt=rfmt, pack_path=cfg.pack_path,
        bias_mode=cfg.bias_mode, dense_echo=cfg.dense_echo,
    )
    replan_every = cfg.replan_every
    tls = None
    for epoch in range(start_epoch, cfg.epochs):
        lr = cfg.lr * (cfg.lr_decay**epoch)
        if tls is None or (replan_every and epoch % replan_every == 0):
            tl_all = prd.epoch_tiles_ring(
                skel, u_dev, ir_dev, r_dev, seed, epoch
            )
            tls = tuple(tl_all[k] for k in keep)
        Pm, Qm, sse = epoch_fn(
            Pm, Qm, sas, tcs, tls, dense_groups,
            jnp.asarray(lr, jnp.float32),
            jnp.asarray(cfg.reg, jnp.float32),
            jnp.asarray(mu, jnp.float32),
        )
        out = pk.unpack_state(Pm, Qm, mu, U_pad, I_pad, rank, geo.su, geo.si)
        out = MFModel(
            P=out.P[:U], Q=out.Q[remap][:I], bu=out.bu[:U],
            bi=out.bi[remap][:I], mu=out.mu,
        )
        if lane:
            out = pk.from_lane_model(out)  # back to the canonical form
        yield epoch, out, float(jnp.sqrt(sse / max(1, train.n_ratings)))
