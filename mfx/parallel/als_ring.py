"""Ring-sharded ALS — no-gather ALS over row-sharded factor tables
(SURVEY.md K3 x P2; BASELINE.json north star "ALS fallback solver
sharing the same sparse pipeline" at catalog scales where neither table
fits replicated).

``mfx/parallel/als_dp.py`` keeps both tables replicated and psums
partial Grams — the right composition for configs[3] (17k items). At
configs[4]-class catalogs (millions of rows on BOTH sides) replication
is the memory wall, so this variant keeps P and Q row-sharded over the
'model' axis and rotates the FIXED side's blocks around the ICI ring
(the DSGD pattern of mfx/parallel/sharded.py):

    for each local target-row range:
        A, b, cnt = 0
        for t in 0..S-1:                    # ring sub-steps
            accumulate partial Grams from the (my users x held block)
            cell's degree-bucketed pieces   # mfx/solvers/als.py machinery
            held block <- ppermute(ring)    # (k+1) floats/row over ICI
        solve the range with the batched Cholesky, locally

Per half-sweep, each factor block crosses ICI S*ceil(rows/chunk) times
(small: the block itself), while the O(rows * d^2) Gram accumulators
never leave their shard — the opposite traffic trade from the DP psum,
and the one that scales with sharded tables. Both id spaces are
seeded-shuffled so blocks (and their ring cells) are uniform random
subsets — balanced cells keep the padded piece slabs tight under Zipf
skew. Determinism: the piece plan is a run-constant host build, every
accumulation runs in fixed plan order, ppermute and the replicated-free
local solve are deterministic — same seed, same mesh, same tables.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mfx.config import ALSConfig
from mfx.data.coo import RatingsCOO
from mfx.models.mf import MFModel
from mfx.runtime.mesh import MODEL_AXIS
from mfx.solvers.als import (
    BUCKET_CAPS,
    BUCKET_CELLS,
    _pow2_at_least,
    _solve_gram,
    bucket_plan_from_row_starts,
    build_bucket_plan,
    gram_accumulate,
    gram_rowchunk,
)

__all__ = [
    "build_ring_als_plan",
    "build_ring_als_plan_device",
    "ring_accumulate_range",
    "train_sweeps_als_ring",
]


def ring_accumulate_range(plan: "RingAlsPlan", ri: int,
                          accumulate_chunk, rotate) -> None:
    """One row range's (sub-step × bucket × chunk) accumulation schedule —
    the ring scheduling shared by the ALS/iALS/NMF half-sweeps (they
    differ only in what each chunk folds and how the range is solved):
    calls ``accumulate_chunk(cap, pieces_chunk)`` for every planned chunk
    of the cell each shard currently holds, and ``rotate()`` between
    sub-steps to pass the fixed-side blocks around the ICI ring."""
    for t in range(plan.S):
        for cap in BUCKET_CAPS:
            nb = plan.nb_cap[cap]
            for c in range(int(plan.nchunks[cap][ri, t])):
                accumulate_chunk(
                    cap,
                    lax.slice_in_dim(
                        plan.pieces[cap][:, ri, t], c * nb, (c + 1) * nb,
                        axis=2,
                    ),
                )
        rotate()


def _shuffle(n: int, seed: int, tag: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(np.random.SeedSequence([seed, tag]))
    fwd = rng.permutation(n).astype(np.int32)
    inv = np.empty_like(fwd)
    inv[fwd] = np.arange(n, dtype=np.int32)
    return fwd, inv


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


class RingAlsPlan:
    """Run-constant piece plan for one half-sweep side.

    pieces[cap]: device int32 [S, NR, S, NC, 3, nb] sharded on axis 0 —
    (row_rel, start, len) per piece, keyed by (shard, row range,
    sub-step, chunk). ``start`` indexes the shard-local sorted
    cols/vals; ``row_rel`` is range-local (pad: row_chunk, the dropped
    Gram segment). nchunks[cap]: host [NR, S] actual chunk counts (the
    slab is padded to the max; looping to the actual count skips
    all-pad dispatches)."""

    def __init__(self, S, tgt_block, fix_block, row_chunk, cols, vals,
                 pieces, nchunks, nb_cap):
        self.S = S
        self.tgt_block = tgt_block
        self.fix_block = fix_block
        self.row_chunk = row_chunk
        self.NR = tgt_block // row_chunk
        self.cols = cols  # device (S, n_max) int32, block-local
        self.vals = vals  # device (S, n_max) f32
        self.pieces = pieces
        self.nchunks = nchunks
        self.nb_cap = nb_cap  # cap -> pieces per chunk


def build_ring_als_plan(
    rows_rel: np.ndarray,  # (n,) shuffled target-side id per rating
    cols_rel: np.ndarray,  # (n,) shuffled fixed-side id per rating
    vals: np.ndarray,
    S: int,
    tgt_block: int,
    fix_block: int,
    row_chunk: int,
    mesh: Mesh,
) -> RingAlsPlan:
    """Host build, once per run per side (degrees are run-constant)."""
    shard = rows_rel // tgt_block
    blk = cols_rel // fix_block
    order = np.lexsort((rows_rel, blk, shard))
    rs, bs = shard[order], blk[order]
    rloc = (rows_rel[order] % tgt_block).astype(np.int64)
    cloc = (cols_rel[order] % fix_block).astype(np.int32)
    v = np.asarray(vals)[order].astype(np.float32)

    # shard-local sorted cols/vals, padded to the max shard size
    shard_start = np.searchsorted(rs, np.arange(S + 1))
    n_max = int(np.max(np.diff(shard_start))) if len(rs) else 1
    n_max = max(n_max, 1)
    if n_max >= 1 << 31:
        raise NotImplementedError("per-shard ratings exceed int32")
    cols_h = np.zeros((S, n_max), np.int32)
    vals_h = np.zeros((S, n_max), np.float32)
    for s in range(S):
        a, b = shard_start[s], shard_start[s + 1]
        cols_h[s, : b - a] = cloc[a:b]
        vals_h[s, : b - a] = v[a:b]

    NR = tgt_block // row_chunk
    nb_cap = _ring_bucket_chunks(S)
    # per-cell bucket plans, with piece starts made shard-local
    cell = {}  # (s, b) -> {cap: (prow, pstart, plen)} + range cuts
    for s in range(S):
        a = shard_start[s]
        sl_rows = rloc[a : shard_start[s + 1]]
        sl_blk = bs[a : shard_start[s + 1]]
        bcut = np.searchsorted(sl_blk, np.arange(S + 1))
        for b in range(S):
            c0, c1 = int(bcut[b]), int(bcut[b + 1])
            buckets, _ = build_bucket_plan(sl_rows[c0:c1], tgt_block)
            cell[(s, b)] = _cell_entry(buckets, c0, tgt_block, row_chunk)

    return _finish_plan(
        cell, S, tgt_block, fix_block, row_chunk, nb_cap,
        cols_h, vals_h, mesh,
    )


def _ring_bucket_chunks(S: int) -> dict:
    return {
        cap: _pow2_at_least(max(1, BUCKET_CELLS // cap // S), lo=8)
        for cap in BUCKET_CAPS
    }


def _cell_entry(buckets, base, tgt_block, row_chunk):
    """Make one cell's bucket plan shard-local (+ row-range cuts)."""
    ent = {}
    for cap, (prow, pstart, plen) in buckets.items():
        pstart = pstart + base  # shard-local
        cuts = np.searchsorted(prow, np.arange(0, tgt_block + 1, row_chunk))
        ent[cap] = (prow.astype(np.int32), pstart.astype(np.int64),
                    plen, cuts)
    return ent


def _finish_plan(cell, S, tgt_block, fix_block, row_chunk, nb_cap,
                 cols_h, vals_h, mesh) -> RingAlsPlan:
    """Pack the per-cell bucket plans into the padded device slabs."""
    NR = tgt_block // row_chunk
    pieces_h = {}
    nchunks = {}
    for cap in BUCKET_CAPS:
        nb = nb_cap[cap]
        # chunk counts per (ri, t): max over shards
        NC_rt = np.zeros((NR, S), np.int64)
        for ri in range(NR):
            for t in range(S):
                m = 0
                for s in range(S):
                    cuts = cell[(s, (s + t) % S)][cap][3]
                    m = max(m, int(cuts[ri + 1] - cuts[ri]))
                NC_rt[ri, t] = -(-m // nb) if m else 0
        NC = int(NC_rt.max()) if NC_rt.size else 0
        NC = max(NC, 1)
        # layout (S, NR, S, 3, NC*nb): chunk c is the lane slice
        # [c*nb:(c+1)*nb], so a device slice yields (S, 3, nb) directly
        arr = np.zeros((S, NR, S, 3, NC * nb), np.int32)
        arr[:, :, :, 0, :] = row_chunk  # pad rows -> dropped segment
        for s in range(S):
            for t in range(S):
                prow, pstart, plen, cuts = cell[(s, (s + t) % S)][cap]
                if pstart.size and int(pstart.max()) >= 1 << 31:
                    raise NotImplementedError(
                        "piece starts exceed int32 addressing"
                    )
                for ri in range(NR):
                    p0, p1 = int(cuts[ri]), int(cuts[ri + 1])
                    m = p1 - p0
                    if not m:
                        continue
                    arr[s, ri, t, 0, :m] = prow[p0:p1] - ri * row_chunk
                    arr[s, ri, t, 1, :m] = pstart[p0:p1]
                    arr[s, ri, t, 2, :m] = plen[p0:p1]
        pieces_h[cap] = arr
        nchunks[cap] = NC_rt

    shd = NamedSharding(mesh, P(MODEL_AXIS))
    return RingAlsPlan(
        S, tgt_block, fix_block, row_chunk,
        jax.device_put(cols_h, shd), jax.device_put(vals_h, shd),
        {cap: jax.device_put(a, shd) for cap, a in pieces_h.items()},
        nchunks, nb_cap,
    )


@functools.partial(jax.jit, static_argnames=("S", "tgt_block", "fix_block"))
def _device_sort_side(rows_dev, cols_dev, vals_dev, *, S, tgt_block,
                      fix_block):
    """Stable device sort by (shard, fixed-block, local row) — the same
    permutation as the host path's ``np.lexsort`` (both stable, same
    key), so everything derived downstream is bitwise identical."""
    shard = rows_dev // tgt_block
    rloc = rows_dev % tgt_block
    blk = cols_dev // fix_block
    cloc = (cols_dev % fix_block).astype(jnp.int32)
    # int32 key space (jax runs without x64 here) — the caller guards
    # S * S * tgt_block < 2^31
    key = ((shard * S + blk) * tgt_block + rloc).astype(jnp.int32)
    order = jnp.argsort(key, stable=True)
    key_s = jnp.take(key, order)
    # shard boundaries in the sorted order (device; S+1 scalars)
    shard_bounds = jnp.searchsorted(
        key_s, jnp.arange(S + 1, dtype=jnp.int32) * (S * tgt_block)
    )
    return (
        key_s,
        jnp.take(cloc, order),
        jnp.take(vals_dev.astype(jnp.float32), order),
        shard_bounds,
    )


@functools.partial(jax.jit, static_argnames=("S", "n_max"))
def _device_slabs(key_s, cloc_s, vals_s, shard_bounds, *, S, n_max):
    """Scatter the sorted shard streams into (S, n_max) padded slabs."""
    n = key_s.shape[0]
    shard = jnp.searchsorted(shard_bounds, jnp.arange(n), side="right") - 1
    shard = jnp.clip(shard, 0, S - 1).astype(jnp.int32)
    within = jnp.arange(n) - jnp.take(shard_bounds, shard)
    cols = jnp.zeros((S, n_max), jnp.int32).at[shard, within].set(cloc_s)
    vals = jnp.zeros((S, n_max), jnp.float32).at[shard, within].set(vals_s)
    return cols, vals


def build_ring_als_plan_device(
    rows_rel: np.ndarray,
    cols_rel: np.ndarray,
    vals: np.ndarray,
    S: int,
    tgt_block: int,
    fix_block: int,
    row_chunk: int,
    mesh: Mesh,
) -> RingAlsPlan:
    """Device-assisted twin of ``build_ring_als_plan``: the O(n log n)
    sort, the slab scatters and the (shard, block, row) group bounds run
    on the accelerator; the host only touches O(S^2 * tgt_block) degree
    summaries to lay out the piece slabs. Produces bitwise-identical
    plans (same stable sort key as the host ``np.lexsort``), so the two
    paths are interchangeable per run."""
    if len(rows_rel) >= 1 << 31:
        raise NotImplementedError(
            "device ring-ALS planning indexes the sorted stream in int32"
        )
    if S * S * tgt_block >= 1 << 31:
        raise NotImplementedError(
            "device ring-ALS planning keys (shard, block, row) in int32 "
            f"(S^2 * tgt_block = {S * S * tgt_block}); use "
            "als.plan_device='host' at this geometry"
        )
    key_s, cloc_s, vals_s, shard_bounds_d = _device_sort_side(
        jnp.asarray(rows_rel), jnp.asarray(cols_rel), jnp.asarray(vals),
        S=S, tgt_block=tgt_block, fix_block=fix_block,
    )
    shard_bounds = np.asarray(shard_bounds_d)
    n_max = int(np.max(np.diff(shard_bounds))) if len(rows_rel) else 1
    n_max = max(n_max, 1)
    if n_max >= 1 << 31:
        raise NotImplementedError("per-shard ratings exceed int32")
    cols_h, vals_h = _device_slabs(
        key_s, cloc_s, vals_s, shard_bounds_d, S=S, n_max=n_max
    )

    nb_cap = _ring_bucket_chunks(S)
    cell = {}
    # per shard: one device searchsorted gives every (block, row) group's
    # bounds; the host sees only the (S * tgt_block + 1) summary
    for s in range(S):
        base = np.int32(s * S * tgt_block)  # < 2^31 by the guard above
        qs = base + np.arange(S * tgt_block + 1, dtype=np.int32)
        bounds = np.asarray(jnp.searchsorted(key_s, jnp.asarray(qs)))
        bounds = bounds - shard_bounds[s]  # shard-local positions
        for b in range(S):
            row_starts = bounds[b * tgt_block : (b + 1) * tgt_block + 1]
            buckets = bucket_plan_from_row_starts(row_starts)
            # pstart from row_starts is already shard-local: base = 0
            cell[(s, b)] = _cell_entry(buckets, 0, tgt_block, row_chunk)

    return _finish_plan(
        cell, S, tgt_block, fix_block, row_chunk, nb_cap,
        cols_h, vals_h, mesh,
    )


@functools.partial(jax.jit, static_argnames=("mesh", "cap", "use_bias"))
def _ring_gram_chunk(
    rotF, rotb, mu, cols, vals, pc, A, b, cnt,
    *, mesh: Mesh, cap: int, use_bias: bool,
):
    # rotF (S, fix_block, k); pc (S, 3, nb); A (S, nseg, d, d) — all
    # sharded on the model axis; each shard folds its own pieces into
    # its own accumulators against the block it currently holds
    def body(rF, rb, mu_r, c, v, p, A_p, b_p, c_p):
        A1, b1, c1 = gram_accumulate(
            rF[0], rb[0], mu_r, c[0], v[0],
            p[0, 0], p[0, 1], p[0, 2],
            A_p[0], b_p[0], c_p[0], cap=cap, use_bias=use_bias,
        )
        return A1[None], b1[None], c1[None]

    ax = P(MODEL_AXIS)
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(ax, ax, P(), ax, ax, ax, ax, ax, ax),
        out_specs=(ax, ax, ax),
    )(rotF, rotb, mu, cols, vals, pc, A, b, cnt)


@functools.partial(jax.jit, static_argnames=("mesh",))
def _ring_rotate_one(rotF, *, mesh: Mesh):
    """Single-table ring rotation (the bias-free iALS ring uses this)."""
    S = mesh.shape[MODEL_AXIS]
    ring = [(r, (r - 1) % S) for r in range(S)]

    def body(rF):
        return lax.ppermute(rF, MODEL_AXIS, ring)

    ax = P(MODEL_AXIS)
    return jax.shard_map(body, mesh=mesh, in_specs=(ax,), out_specs=ax)(rotF)


@functools.partial(jax.jit, static_argnames=("mesh",))
def _ring_rotate(rotF, rotb, *, mesh: Mesh):
    S = mesh.shape[MODEL_AXIS]
    ring = [(r, (r - 1) % S) for r in range(S)]

    def body(rF, rb):
        return (
            lax.ppermute(rF, MODEL_AXIS, ring),
            lax.ppermute(rb, MODEL_AXIS, ring),
        )

    ax = P(MODEL_AXIS)
    return jax.shard_map(
        body, mesh=mesh, in_specs=(ax, ax), out_specs=(ax, ax)
    )(rotF, rotb)


@functools.partial(
    jax.jit, static_argnames=("mesh", "use_bias", "nr"),
    donate_argnums=(0, 1),
)
def _ring_solve_update(
    tgtF, tgtb, A, b, cnt, reg, r0, *, mesh: Mesh, use_bias: bool, nr: int
):
    k = tgtF.shape[-1]

    def body(tF, tb, A_p, b_p, c_p, reg_r, r0_r):
        old = lax.dynamic_slice_in_dim(tF[0], r0_r, nr)
        if use_bias:
            oldb = lax.dynamic_slice_in_dim(tb[0], r0_r, nr)
            old = jnp.concatenate([old, oldb[:, None]], axis=1)
        sol = _solve_gram(
            A_p[0, :nr], b_p[0, :nr], c_p[0, :nr], old, reg_r,
            use_bias=use_bias,
        )
        tF = lax.dynamic_update_slice_in_dim(tF[0], sol[:, :k], r0_r, 0)
        if use_bias:
            tb = lax.dynamic_update_slice_in_dim(tb[0], sol[:, k], r0_r, 0)
        else:
            tb = tb[0]
        return tF[None], tb[None]

    ax = P(MODEL_AXIS)
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(ax, ax, ax, ax, ax, P(), P()),
        out_specs=(ax, ax),
    )(tgtF, tgtb, A, b, cnt, reg, r0)


def _als_ring_half_sweep(
    tgtF, tgtb, rotF, rotb, mu, plan: RingAlsPlan, reg, use_bias, mesh,
):
    """One half-sweep: solve the sharded target table against the
    rotating fixed table. Returns (tgtF, tgtb, rotF, rotb) with the
    rotating pair back in home alignment (S rotations per range)."""
    S, d = plan.S, tgtF.shape[-1] + (1 if use_bias else 0)
    nseg = plan.row_chunk + 1
    f = tgtF.dtype
    shd = NamedSharding(mesh, P(MODEL_AXIS))
    regj = jnp.asarray(reg, f)
    muj = jnp.asarray(mu, f)
    for ri in range(plan.NR):
        A = jax.device_put(jnp.zeros((S, nseg, d, d), f), shd)
        b = jax.device_put(jnp.zeros((S, nseg, d), f), shd)
        cnt = jax.device_put(jnp.zeros((S, nseg), f), shd)

        def acc(cap, pc):
            nonlocal A, b, cnt
            A, b, cnt = _ring_gram_chunk(
                rotF, rotb, muj, plan.cols, plan.vals, pc, A, b, cnt,
                mesh=mesh, cap=cap, use_bias=use_bias,
            )

        def rot():
            nonlocal rotF, rotb
            rotF, rotb = _ring_rotate(rotF, rotb, mesh=mesh)

        ring_accumulate_range(plan, ri, acc, rot)
        tgtF, tgtb = _ring_solve_update(
            tgtF, tgtb, A, b, cnt, regj,
            jnp.asarray(ri * plan.row_chunk, jnp.int32),
            mesh=mesh, use_bias=use_bias, nr=plan.row_chunk,
        )
    return tgtF, tgtb, rotF, rotb


def train_sweeps_als_ring(
    model: MFModel,
    train: RatingsCOO,
    cfg: ALSConfig,
    mesh: Mesh,
    use_bias: bool = True,
    seed: int = 0,
    row_chunk: int | None = None,
):
    """Ring-sharded mirror of ``train_sweeps_als``; yields (sweep,
    model) in the original id labeling after each full sweep."""
    S = mesh.shape[MODEL_AXIS]
    U, I, k = model.num_users, model.num_items, model.rank
    d = k + 1 if use_bias else k
    rc = gram_rowchunk(d, row_chunk or cfg.user_chunk)
    ublock = _round_up(_round_up(U, S) // S, rc)
    iblock = _round_up(_round_up(I, S) // S, rc)

    ufwd, uinv = _shuffle(U, seed, 0xA15A)
    ifwd, iinv = _shuffle(I, seed, 0xA151)
    urel = ufwd[train.user]
    irel = ifwd[train.item]

    pd = getattr(cfg, "plan_device", "auto")
    on_device = pd == "device" or (
        pd == "auto" and jax.default_backend() == "tpu"
    )
    build = build_ring_als_plan_device if on_device else build_ring_als_plan
    u_plan = build(
        urel, irel, train.rating, S, ublock, iblock, rc, mesh
    )
    i_plan = build(
        irel, urel, train.rating, S, iblock, ublock, rc, mesh
    )

    shd = NamedSharding(mesh, P(MODEL_AXIS))

    def to_dev(x, rows, block):
        x = np.asarray(x)
        pad = np.zeros((S * block,) + x.shape[1:], x.dtype)
        pad[: x.shape[0]] = x
        return jax.device_put(
            pad.reshape((S, block) + x.shape[1:]), shd
        )

    Pd = to_dev(np.asarray(model.P)[uinv], U, ublock)
    bud = to_dev(np.asarray(model.bu)[uinv], U, ublock)
    Qd = to_dev(np.asarray(model.Q)[iinv], I, iblock)
    bid = to_dev(np.asarray(model.bi)[iinv], I, iblock)
    mu = float(model.mu)

    for sweep in range(cfg.sweeps):
        Pd, bud, Qd, bid = _als_ring_half_sweep(
            Pd, bud, Qd, bid, mu, u_plan, cfg.reg, use_bias, mesh
        )
        Qd, bid, Pd, bud = _als_ring_half_sweep(
            Qd, bid, Pd, bud, mu, i_plan, cfg.reg, use_bias, mesh
        )
        Ph = jnp.reshape(Pd, (S * ublock, k))[:U][jnp.asarray(ufwd)]
        Qh = jnp.reshape(Qd, (S * iblock, k))[:I][jnp.asarray(ifwd)]
        buh = jnp.reshape(bud, (S * ublock,))[:U][jnp.asarray(ufwd)]
        bih = jnp.reshape(bid, (S * iblock,))[:I][jnp.asarray(ifwd)]
        yield sweep, MFModel(P=Ph, Q=Qh, bu=buh, bi=bih, mu=model.mu)
