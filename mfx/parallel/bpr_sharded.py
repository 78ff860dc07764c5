"""Sharded-table BPR — BASELINE.json configs[4]: billion-rating implicit
feedback with row-sharded factor tables.

BPR triples ride the same DSGD ring as explicit SGD
(mfx.parallel.sharded): P is row-sharded by user; Q blocks rotate over the
'model' axis. Triples are stratified by (user shard, positive-item block);
at sub-step t, shard s trains the (s, (s+t) mod S) stratum on the Q block
it currently holds. Negatives are sampled uniformly from the *currently
held block* — with the item table relabeled by a seeded random permutation
(``item_shuffle``), blocks are uniform random subsets of the catalog, so
over an epoch every user's negatives cover the catalog uniformly. This
realizes the "all-to-all row exchange" of the north star as the ring
schedule a torus all-to-all lowers to, without per-row routing machinery.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from mfx.config import BPRConfig
from mfx.data.coo import RatingsCOO
from mfx.data.split import epoch_permutation
from mfx.models.mf import MFModel
from mfx.parallel.sharded import shard_model, unshard_model
from mfx.runtime.mesh import MODEL_AXIS
from mfx.solvers.bpr import bpr_minibatch_update

__all__ = [
    "item_shuffle",
    "plan_bpr_ring_epoch",
    "build_bpr_ring_skeleton",
    "bpr_ring_epoch_device",
    "train_epochs_bpr_ring",
]


def item_shuffle(num_items: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Seeded random relabeling of item ids (forward, inverse)."""
    rng = np.random.default_rng(np.random.SeedSequence([seed, 0x17E11]))
    fwd = rng.permutation(num_items).astype(np.int32)
    inv = np.empty_like(fwd)
    inv[fwd] = np.arange(num_items, dtype=np.int32)
    return fwd, inv


@dataclasses.dataclass
class BprRingPlan:
    users: np.ndarray  # [S, S, NB, B] local user ids
    pos: np.ndarray  # [S, S, NB, B] block-local positive item ids
    neg: np.ndarray  # [S, S, NB, B] block-local sampled negatives
    weights: np.ndarray  # [S, S, NB, B]
    ublock: int
    iblock: int
    n_real: int


def plan_bpr_ring_epoch(
    coo: RatingsCOO,
    S: int,
    batch_size: int,
    seed: int,
    epoch: int,
    item_map: np.ndarray | None = None,
    pos_keys: np.ndarray | None = None,
) -> BprRingPlan:
    """Stratify one epoch of (user, pos) pairs into the S×S ring schedule
    and sample block-local negatives. ``item_map`` is the forward relabel
    from item_shuffle (identity if None). ``pos_keys`` (sorted
    ``u * num_items + relabeled_i`` keys) makes negatives exact: samples
    colliding with a user's positives are block-locally resampled."""
    perm = epoch_permutation(coo.n_ratings, seed, epoch)
    ublock = -(-coo.num_users // S)
    iblock = -(-coo.num_items // S)
    u = coo.user[perm].astype(np.int64)
    i = coo.item[perm].astype(np.int64)
    if item_map is not None:
        i = item_map[i].astype(np.int64)
    s_of = u // ublock
    b_of = i // iblock
    t_of = (b_of - s_of) % S
    key = t_of * S + s_of
    sorter = np.argsort(key, kind="stable")
    u, i, key, b_of = u[sorter], i[sorter], key[sorter], b_of[sorter]

    counts = np.bincount(key, minlength=S * S)
    nb = max(1, int(-(-counts.max() // batch_size)))
    width = nb * batch_size
    users = np.zeros((S * S, width), np.int32)
    pos = np.zeros((S * S, width), np.int32)
    weights = np.zeros((S * S, width), np.float32)
    offsets = np.zeros(S * S + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    slot = np.arange(len(u), dtype=np.int64) - offsets[key]
    users[key, slot] = (u % ublock).astype(np.int32)
    pos[key, slot] = (i % iblock).astype(np.int32)
    weights[key, slot] = 1.0

    # block-local negatives: uniform over the real rows of the block each
    # (t, s) cell holds; block b may be partial at the catalog tail
    rng = np.random.default_rng(np.random.SeedSequence([seed, 0xBB5D, epoch]))
    neg = rng.integers(0, iblock, size=(S * S, width), dtype=np.int32)
    cell_block = np.empty(S * S, np.int64)
    for t in range(S):
        for s in range(S):
            cell_block[t * S + s] = (s + t) % S
    block_rows = np.minimum(
        coo.num_items - cell_block * iblock, iblock
    ).astype(np.int64)
    block_rows = np.maximum(block_rows, 1)
    neg = (neg % block_rows[:, None]).astype(np.int32)

    if pos_keys is not None:
        from mfx.data.bpr import MAX_REJECTION_ROUNDS, _members

        # global ids per slot: user = s*ublock + local; item (relabeled
        # space) = held_block*iblock + local
        s_of_cell = (np.arange(S * S, dtype=np.int64) % S)[:, None]
        gu = users.astype(np.int64) + s_of_cell * ublock
        gbase = (cell_block * iblock)[:, None]
        qk = (gu * coo.num_items + gbase + neg).reshape(-1)
        real = (weights > 0).reshape(-1)
        idx = np.flatnonzero(real & _members(pos_keys, qk))
        rounds = 0
        while idx.size and rounds < MAX_REJECTION_ROUNDS:
            cells = idx // width
            draw = (
                rng.integers(0, iblock, size=idx.size, dtype=np.int64)
                % block_rows[cells]
            ).astype(np.int32)
            neg.reshape(-1)[idx] = draw
            qk_new = (
                gu.reshape(-1)[idx] * coo.num_items
                + cell_block[cells] * iblock
                + draw
            )
            idx = idx[_members(pos_keys, qk_new)]
            rounds += 1

    shape = (S, S, nb, batch_size)
    return BprRingPlan(
        users=users.reshape(shape),
        pos=pos.reshape(shape),
        neg=neg.reshape(shape),
        weights=weights.reshape(shape),
        ublock=ublock,
        iblock=iblock,
        n_real=len(u),
    )


@dataclasses.dataclass
class BprRingSkeleton:
    """Once-per-run device-prep state (directive #8): cell occupancy is
    permutation-invariant, so the padded batch geometry is fixed and each
    epoch is one seeded device sort/scatter + on-device rejection."""

    S: int
    ublock: int
    iblock: int
    nb: int
    width: int  # nb * per-shard batch size
    n_real: int
    strat_start: "jax.Array"  # (S*S,) exclusive cumsum of cell counts
    cell_block: "jax.Array"  # (S*S,) item block held by each cell
    block_rows: "jax.Array"  # (S*S,) real rows of that block
    s_of_cell: "jax.Array"  # (S*S,) shard of each cell
    pu: "jax.Array"  # lex-sorted positive pairs (relabeled item space)
    pi: "jax.Array"


def build_bpr_ring_skeleton(
    u_dev, irel_dev, S: int, num_users: int, num_items: int,
    batch_size: int,
) -> BprRingSkeleton:
    ublock = -(-num_users // S)
    iblock = -(-num_items // S)
    cell = (
        ((irel_dev // iblock) - (u_dev // ublock)) % S
    ) * S + (u_dev // ublock)
    counts = np.asarray(
        jax.ops.segment_sum(jnp.ones_like(cell), cell, num_segments=S * S)
    ).astype(np.int64)
    nb = max(1, int(-(-counts.max() // batch_size)))
    width = nb * batch_size
    if S * S * width >= 2**31:
        raise NotImplementedError(
            "BPR ring batch slabs exceed int32 addressing at this scale; "
            "raise bpr.batch_size or plan per-host shards (each host "
            "builds only its user shard's cells)"
        )
    strat_start = np.zeros(S * S, np.int64)
    np.cumsum(counts[:-1], out=strat_start[1:])
    cell_block = np.empty(S * S, np.int64)
    for t in range(S):
        for s in range(S):
            cell_block[t * S + s] = (s + t) % S
    block_rows = np.maximum(
        np.minimum(num_items - cell_block * iblock, iblock), 1
    )
    from mfx.data.bpr import build_positive_index_device

    pu, pi = build_positive_index_device(u_dev, irel_dev)
    return BprRingSkeleton(
        S=S, ublock=ublock, iblock=iblock, nb=nb, width=width,
        n_real=int(counts.sum()),
        strat_start=jnp.asarray(strat_start.astype(np.int32)),
        cell_block=jnp.asarray(cell_block.astype(np.int32)),
        block_rows=jnp.asarray(block_rows.astype(np.int32)),
        s_of_cell=jnp.asarray(
            (np.arange(S * S, dtype=np.int64) % S).astype(np.int32)
        ),
        pu=pu,
        pi=pi,
    )


@functools.partial(
    jax.jit,
    static_argnames=("S", "ublock", "iblock", "width"),
)
def _bpr_ring_epoch_device(
    u_dev, irel_dev, key_shuf, key_neg, strat_start, cell_block,
    block_rows, s_of_cell, pu, pi,
    *, S, ublock, iblock, width,
):
    from jax import lax

    from mfx.data.bpr import complement_draw, lowerbound_2key

    n = u_dev.shape[0]
    cell = (
        ((irel_dev // iblock) - (u_dev // ublock)) % S
    ) * S + (u_dev // ublock)
    rand = jax.random.bits(key_shuf, (n,), dtype=jnp.uint32).astype(
        jnp.int32
    )
    ul = (u_dev % ublock).astype(jnp.int32)
    il = (irel_dev % iblock).astype(jnp.int32)
    cell_s, _, ul, il = lax.sort(
        (cell.astype(jnp.int32), rand, ul, il), num_keys=2, is_stable=True
    )
    pos = jnp.arange(n, dtype=jnp.int32) - strat_start[cell_s]
    d = cell_s * width + pos
    st = dict(mode="promise_in_bounds", unique_indices=True)
    users = jnp.zeros((S * S * width,), jnp.int32).at[d].set(ul, **st)
    positems = jnp.zeros((S * S * width,), jnp.int32).at[d].set(il, **st)
    weights = jnp.zeros((S * S * width,), jnp.float32).at[d].set(1.0, **st)
    users = users.reshape(S * S, width)
    positems = positems.reshape(S * S, width)
    weights = weights.reshape(S * S, width)

    # block-local EXACT negatives, entirely on device: one complement
    # draw per slot against the (user, held-block) slice of the sorted
    # positive pairs (see mfx.data.bpr.complement_draw — replaces the
    # rejection loop's rounds x 64 membership gathers with 2 lowerbound
    # passes + 32 search gathers, with no collision residual)
    gu = users + s_of_cell[:, None] * ublock
    gbase = jnp.broadcast_to((cell_block * iblock)[:, None], gu.shape)
    start = lowerbound_2key(pu, pi, gu, gbase)
    end = lowerbound_2key(pu, pi, gu, gbase + block_rows[:, None])
    cnt = end - start
    navail = block_rows[:, None] - cnt
    # navail == 0: the user rated the whole held block; fall back to the
    # positive (loss-neutral). Pad slots (weights == 0) draw a valid
    # in-block id for user 0 of the shard — inert under zero weight.
    jg = complement_draw(
        key_neg, pi, start, cnt, navail, gbase, gbase + positems
    )
    return users, positems, jg - gbase, weights


def bpr_ring_epoch_device(
    skel: BprRingSkeleton, u_dev, irel_dev, seed: int, epoch: int,
    batch_size: int,
) -> dict:
    base = jax.random.key(seed)
    ks = jax.random.fold_in(jax.random.fold_in(base, 0x5F), epoch)
    kn = jax.random.fold_in(jax.random.fold_in(base, 0xBB5D), epoch)
    u, p, negs, w = _bpr_ring_epoch_device(
        u_dev, irel_dev, ks, kn, skel.strat_start, skel.cell_block,
        skel.block_rows, skel.s_of_cell, skel.pu, skel.pi,
        S=skel.S, ublock=skel.ublock, iblock=skel.iblock,
        width=skel.width,
    )
    S, nb = skel.S, skel.nb
    shape = (S, S, nb, batch_size)
    return {
        "users": u.reshape(shape),
        "pos": p.reshape(shape),
        "neg": negs.reshape(shape),
        "weights": w.reshape(shape),
    }


@functools.partial(jax.jit, static_argnames=("si", "num_items"))
def window_negative_bounds(u, irel, pu, pi, *, si, num_items):
    """Run-constant per-rating bounds for the window complement draw:
    (wstart, start, cnt, navail) where [start, start+cnt) slices the
    lex-sorted positive index to the (user, window) cell and navail is
    the number of NON-positive real items in the window. Built once per
    run — the positive set and the window layout are epoch-invariant."""
    from mfx.data.bpr import lowerbound_2key

    wstart = (irel // si) * si
    start = lowerbound_2key(pu, pi, u, wstart)
    end = lowerbound_2key(pu, pi, u, wstart + si)
    cnt = end - start
    span = jnp.minimum(si, num_items - wstart)
    return wstart, start, cnt, span - cnt


@functools.partial(jax.jit, static_argnames=("si",))
def window_negatives(key, irel, pi, wstart, start, cnt, navail, *, si):
    """Device-side EXACT negatives from the positive's item window (the
    fused-kernel path: the window restriction keeps qj's one-hot the same
    (T, sip) shape as qi's; with the per-run item shuffle a window is a
    random ~si-item catalog subset).

    One draw, zero rejection: x ~ U[0, navail) indexes the window's
    complement directly; the order statistic x -> x + m* (m* = smallest m
    with offset(m) - m > x over the cell's sorted positive offsets) maps
    it to the x-th non-positive item. ~log2(si) gathers per epoch vs the
    rejection loop's rounds x 64 — the fused BPR path was 99% negative
    sampling before this (16.7s of a 17s epoch at 800k triples).

    Degenerate cells (every real window item is a positive, navail == 0)
    fall back to j == the positive itself: diff == 0 in the kernel, so
    only the (lr * reg)-scaled decay fires for that triple."""
    from mfx.data.bpr import complement_draw

    return complement_draw(
        key, pi, start, cnt, navail, wstart, irel,
        steps=max(1, si.bit_length()),
    )


def make_bpr_ring_fused_fn(
    mesh: Mesh, S: int, su: int, si: int, rank: int, seg_meta: tuple,
    tpg: int, interpret: bool,
):
    """Jitted fused-Pallas BPR DSGD-ring epoch (mirrors
    mfx/parallel/ring_blocked.py's epoch fn, without dense/bias)."""
    from mfx.kernels import packing as pk
    from mfx.kernels.bpr_pallas import bpr_sweep_pallas

    ring = [(r, (r - 1) % S) for r in range(S)]
    nseg = len(seg_meta)

    def _epoch(Pm_, Qm_, sas, tcs, tls, lr, reg):
        def substep(carry, xs):
            Pm, Qm = carry
            xsa, xtc, xtl = xs
            loss = jnp.zeros((), jnp.float32)
            for k, (win0, nwin) in enumerate(seg_meta):
                sweep = {
                    "sa": xsa[k][0], "tc": xtc[k][0], "tl": xtl[k][0]
                }
                Qs = pk.q_segment(Qm, win0, nwin, rank, si)
                Pm, Qs, l = bpr_sweep_pallas(
                    Pm, Qs, sweep, lr, reg,
                    su=su, si=si, rank=rank, tpg=tpg, interpret=interpret,
                )
                Qm = pk.q_segment_restore(Qm, Qs, win0, rank, si)
                loss = loss + l[0, 0]
            Qm = lax.ppermute(Qm, MODEL_AXIS, ring)
            return (Pm, Qm), loss

        (Pm_, Qm_), losses = lax.scan(substep, (Pm_, Qm_), (sas, tcs, tls))
        return Pm_, Qm_, lax.psum(jnp.sum(losses), MODEL_AXIS)

    shard_spec = P(MODEL_AXIS)
    plan_spec = P(None, MODEL_AXIS)
    sharded = jax.shard_map(
        _epoch,
        mesh=mesh,
        in_specs=(
            shard_spec, shard_spec,
            (plan_spec,) * nseg, (plan_spec,) * nseg, (plan_spec,) * nseg,
            P(), P(),
        ),
        out_specs=(shard_spec, shard_spec, P()),
        check_vma=False,
    )

    @jax.jit
    def epoch(Pm, Qm, sas, tcs, tls, lr, reg):
        return sharded(Pm, Qm, sas, tcs, tls, lr, reg)

    return epoch


def train_epochs_bpr_ring_fused(
    model: MFModel,
    train: RatingsCOO,
    cfg: BPRConfig,
    mesh: Mesh,
    seed: int = 0,
    start_epoch: int = 0,
    interpret: bool = False,
) -> Iterator[tuple[int, MFModel, float]]:
    """Fused-Pallas sharded BPR (BASELINE configs[4] on the K1 scheme):
    triples stratified into the DSGD ring by (user block, positive-item
    window) with the device ring planner, window-local exact negatives
    drawn per epoch on device, and the one-hot MXU kernel inside each
    sub-step. Deterministic; yields the model in the original item
    labeling."""
    from mfx.data.bpr import build_positive_index_device
    from mfx.kernels import packing as pk
    from mfx.kernels import plan_ring_device as prd
    from mfx.solvers.blocked import sweep_geometry

    S = mesh.shape[MODEL_AXIS]
    U, I = train.num_users, train.num_items
    rank = model.rank
    su, si, tile, tpg = cfg.ublock, cfg.iblock, cfg.tile, 4
    ublock = -(-(-(-U // S)) // su) * su
    iblock = -(-(-(-I // S)) // si) * si
    nwin = sweep_geometry(iblock, rank, si)

    # per-run random item relabel: ring blocks (and their windows) become
    # uniform random catalog subsets
    fwd, inv = item_shuffle(I, seed)
    U_pad, I_pad = S * ublock, S * iblock
    shuffled = MFModel(
        P=model.P, Q=jnp.asarray(np.asarray(model.Q)[inv]),
        bu=model.bu, bi=jnp.asarray(np.asarray(model.bi)[inv]), mu=model.mu,
    )
    padded = MFModel(
        P=pk._pad_rows(shuffled.P, U_pad),
        Q=pk._pad_rows(shuffled.Q, I_pad),
        bu=pk._pad_rows(shuffled.bu[:, None], U_pad)[:, 0],
        bi=pk._pad_rows(shuffled.bi[:, None], I_pad)[:, 0],
        mu=model.mu,
    )
    Pm, Qm = pk.pack_state(padded, su, si)

    u_dev = jnp.asarray(train.user, jnp.int32)
    irel = jnp.asarray(fwd)[jnp.asarray(train.item, jnp.int32)]
    pu, pi = build_positive_index_device(u_dev, irel)
    wstart, cstart, ccnt, cavail = window_negative_bounds(
        u_dev, irel, pu, pi, si=si, num_items=I
    )
    skel = prd.build_ring_skeleton(
        u_dev, irel, S, ublock, iblock, su, si, tile, tpg, nwin
    )
    seg_meta = tuple((seg.win0, seg.nwin) for seg in skel.segments)
    sas = tuple(seg.sa for seg in skel.segments)
    tcs = tuple(seg.tc for seg in skel.segments)
    epoch_fn = make_bpr_ring_fused_fn(
        mesh, S, su, si, rank, seg_meta, tpg, interpret
    )
    base = jax.random.key(seed + cfg.neg_seed)
    for epoch in range(start_epoch, cfg.epochs):
        kn = jax.random.fold_in(jax.random.fold_in(base, 0xB9), epoch)
        j = window_negatives(
            kn, irel, pi, wstart, cstart, ccnt, cavail, si=si
        )
        tls = tuple(
            prd.epoch_tiles_ring(
                skel, u_dev, irel, None, seed, epoch, payload2=j % si,
                sent2=si,
            )
        )
        Pm, Qm, loss = epoch_fn(
            Pm, Qm, sas, tcs, tls,
            jnp.asarray(cfg.lr, jnp.float32),
            jnp.asarray(cfg.reg, jnp.float32),
        )
        out = pk.unpack_state(Pm, Qm, float(model.mu), U_pad, I_pad, rank,
                              su, si)
        out = MFModel(
            P=out.P[:U], Q=out.Q[:I_pad][jnp.asarray(fwd)],
            bu=out.bu[:U], bi=out.bi[:I_pad][jnp.asarray(fwd)],
            mu=out.mu,
        )
        yield epoch, out, float(loss) / max(1, train.n_ratings)


def make_bpr_ring_epoch_fn(mesh: Mesh):
    S = mesh.shape[MODEL_AXIS]
    ring = [(j, (j - 1) % S) for j in range(S)]

    def _epoch(P_, Q_, users, pos, neg, weights, lr, reg):
        zero_u = jnp.zeros((P_.shape[0],), P_.dtype)
        zero_i = jnp.zeros((Q_.shape[0],), Q_.dtype)

        def substep(carry, xs):
            Pl, Ql = carry
            us, po, ne, wt = xs  # [NB, B]
            m = MFModel(P=Pl, Q=Ql, bu=zero_u, bi=zero_i,
                        mu=jnp.zeros((), P_.dtype))

            def body(mm, b):
                mm, loss = bpr_minibatch_update(
                    mm, b[0], b[1], b[2], b[3], lr, reg
                )
                return mm, loss

            m, losses = lax.scan(body, m, (us, po, ne, wt))
            Ql = lax.ppermute(m.Q, MODEL_AXIS, ring)
            return (m.P, Ql), jnp.sum(losses)

        (Pl, Ql), losses = lax.scan(
            substep, (P_, Q_),
            (users[:, 0], pos[:, 0], neg[:, 0], weights[:, 0]),
        )
        return Pl, Ql, lax.psum(jnp.sum(losses), MODEL_AXIS)

    sharded = jax.shard_map(
        _epoch,
        mesh=mesh,
        in_specs=(
            P(MODEL_AXIS), P(MODEL_AXIS),
            P(None, MODEL_AXIS), P(None, MODEL_AXIS),
            P(None, MODEL_AXIS), P(None, MODEL_AXIS),
            P(), P(),
        ),
        out_specs=(P(MODEL_AXIS), P(MODEL_AXIS), P()),
        check_vma=False,
    )

    @jax.jit
    def epoch(model: MFModel, arrays, lr, reg):
        Pl, Ql, loss = sharded(
            model.P, model.Q,
            arrays["users"], arrays["pos"], arrays["neg"], arrays["weights"],
            lr, reg,
        )
        return MFModel(P=Pl, Q=Ql, bu=model.bu, bi=model.bi, mu=model.mu), loss

    return epoch


def train_epochs_bpr_ring(
    model: MFModel,
    train: RatingsCOO,
    cfg: BPRConfig,
    mesh: Mesh,
    seed: int = 0,
    start_epoch: int = 0,
) -> Iterator[tuple[int, MFModel, float]]:
    """Sharded-table BPR epochs; yields (epoch, model, mean_loss). The model
    is yielded in the ORIGINAL item labeling (the internal shuffle is
    undone on output)."""
    if getattr(cfg, "neg_weighting", "uniform") != "uniform":
        raise ValueError(
            "the ring's block-stratified samplers are uniform-exact by "
            "construction; bpr.neg_weighting='popularity' runs on the "
            "snapshot-minibatch paths (parallel.mode 'single' or 'dp')"
        )
    if cfg.kernel == "pallas":
        yield from train_epochs_bpr_ring_fused(
            model, train, cfg, mesh, seed=seed, start_epoch=start_epoch,
            interpret=jax.default_backend() != "tpu",
        )
        return
    S = mesh.shape[MODEL_AXIS]
    U, I = train.num_users, train.num_items
    fwd, inv = item_shuffle(I, seed)
    epoch_fn = make_bpr_ring_epoch_fn(mesh)
    use_dev = cfg.sample_device == "device" or (
        cfg.sample_device == "auto" and jax.default_backend() == "tpu"
    )
    per_shard_bs = -(-cfg.batch_size // S)
    if use_dev:
        # device prep (directive #8): skeleton once, then each epoch is a
        # seeded device sort/scatter + in-graph negative rejection —
        # per-epoch host work is O(1)
        u_dev = jnp.asarray(train.user, jnp.int32)
        irel_dev = jnp.asarray(fwd)[jnp.asarray(train.item, jnp.int32)]
        skel = build_bpr_ring_skeleton(
            u_dev, irel_dev, S, U, I, per_shard_bs
        )
        n_real = skel.n_real
    else:
        # exact negatives: positive-key index in the relabeled item space
        pos_keys = np.sort(
            train.user.astype(np.int64) * I + fwd[train.item]
        )
        n_real = train.n_ratings
    # relabel item rows once: internal Q[j] = Q_orig[inv[j]]
    shuffled = MFModel(
        P=model.P, Q=jnp.asarray(np.asarray(model.Q)[inv]),
        bu=model.bu, bi=jnp.asarray(np.asarray(model.bi)[inv]), mu=model.mu,
    )
    padded = shard_model(shuffled, S)
    for epoch in range(start_epoch, cfg.epochs):
        if use_dev:
            arrays = bpr_ring_epoch_device(
                skel, u_dev, irel_dev, seed + cfg.neg_seed, epoch,
                per_shard_bs,
            )
        else:
            plan = plan_bpr_ring_epoch(
                train, S, per_shard_bs, seed + cfg.neg_seed, epoch,
                item_map=fwd, pos_keys=pos_keys,
            )
            arrays = {
                "users": jnp.asarray(plan.users),
                "pos": jnp.asarray(plan.pos),
                "neg": jnp.asarray(plan.neg),
                "weights": jnp.asarray(plan.weights),
            }
        padded, loss = epoch_fn(
            padded, arrays,
            jnp.asarray(cfg.lr, model.P.dtype),
            jnp.asarray(cfg.reg, model.P.dtype),
        )
        out = unshard_model(padded, U, I)
        out = MFModel(
            P=out.P, Q=jnp.asarray(np.asarray(out.Q)[fwd]),
            bu=out.bu, bi=jnp.asarray(np.asarray(out.bi)[fwd]), mu=out.mu,
        )
        yield epoch, out, float(loss) / max(1, n_real)
