"""Device-side epoch planning for the fused-Pallas DSGD ring
(SURVEY.md §3.3 hot-loop #2; VERDICT round 2, Missing #2 / directive #2).

Round 2 planned every ring epoch on the host (S² ``build_sweep_plans``
calls per replan — the exact 100+s/epoch single-core problem
``plan_device.py`` solved for single-chip, reintroduced where the big
datasets live). This module generalizes the skeleton + seeded-sort
device pass to the ring schedule:

  **Ring stratum membership is permutation-invariant too.** A rating's
  cell is (sub-step t, shard s) with ``s = u // ublock``,
  ``t = (block(i) - s) mod S``; within the cell it stratifies by (local
  user block a, local item window c) exactly like the single-chip plan.
  The stratum id simply gains a (segment, t, s) prefix — everything else
  (counts → fixed tile layout; per-epoch seeded two-key sort + unique
  scatter) is unchanged.

Held item blocks larger than the VMEM budget stream through the kernel
as **segments** of ``nwin`` windows per sub-step (VERDICT directive #3);
the plan is laid out segment-major so each segment's uniform
``[S, S, NT_k]`` slab slices contiguously out of one flat device tile
stream. Per-cell grid lengths are padded to the segment-wide max with
repeated-last-block steps and all-sentinel tiles (exact no-ops by the
kernel's one-hot construction).

Load balance across cells comes from the caller's block-cyclic item
mapping (mfx/parallel/ring_blocked.py) — frequency-relabeled hot items
spread round-robin over shards, so cell sizes are near-uniform and the
padded slabs stay tight.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["RingSkeleton", "build_ring_skeleton", "epoch_tiles_ring"]


@dataclasses.dataclass
class RingSegmentSlice:
    """Static per-segment view: one kernel call per (sub-step, shard)."""

    win0: int  # first window of the segment within the held block
    nwin: int
    nt: int  # padded tiles per cell (uniform across cells)
    sa: jax.Array  # (S, S, ng) int32 user block per grid step
    tc: jax.Array  # (S, S, nt) int32 segment-local window per tile


@dataclasses.dataclass
class RingSkeleton:
    S: int
    ublock: int
    iblock: int
    su: int
    si: int
    tile: int
    tpg: int
    nwin: int  # windows per segment (VMEM budget)
    nt_total: int  # total padded tiles across all slabs
    n_real: int
    segments: list[RingSegmentSlice]
    # device constants for the per-epoch pass
    strat_start: jax.Array  # (NS,) int32 exclusive cumsum of counts
    pos_base: jax.Array  # (NS,) int32 SLAB-RELATIVE first slot per stratum
    seg_off: jax.Array  # (nseg,) int32 sid offset per segment
    nw_arr: jax.Array  # (nseg,) int32 windows per segment
    # per-(segment, sub-step) boundaries into the sorted rating stream —
    # the per-epoch scatter builds one [S, nt, 3, T] slab per (k, t), so
    # int32 indexing bounds apply per slab, not to the whole epoch
    # (billion-rating planning headroom; sid order is (k, t, s, a, cw),
    # making every (k, t) range contiguous in the sorted stream)
    kt_bounds: "np.ndarray"  # (nseg, S+1) int64 host array


def _sid_ring(u, ir, seg_off, nw_arr, *, S, ublock, iblock, su, si, nwin, A):
    i32 = jnp.int32
    s = (u // ublock).astype(i32)
    b = (ir // iblock).astype(i32)
    t = (b - s) % S
    a = ((u % ublock) // su).astype(i32)
    cl = ((ir % iblock) // si).astype(i32)
    k = cl // nwin
    cw = cl - k * nwin
    return seg_off[k] + ((t * S + s) * A + a) * nw_arr[k] + cw


@functools.partial(
    jax.jit,
    static_argnames=("S", "ublock", "iblock", "su", "si", "nwin", "A", "ns"),
)
def _device_counts(u, ir, seg_off, nw_arr, *, S, ublock, iblock, su, si,
                   nwin, A, ns):
    sid = _sid_ring(u, ir, seg_off, nw_arr, S=S, ublock=ublock,
                    iblock=iblock, su=su, si=si, nwin=nwin, A=A)
    return jax.ops.segment_sum(
        jnp.ones_like(sid, jnp.int32), sid, num_segments=ns
    )


def build_ring_skeleton(
    u_dev: jax.Array,
    ir_dev: jax.Array,  # block-cyclic-mapped item ids (see ring_blocked)
    S: int,
    ublock: int,
    iblock: int,
    su: int,
    si: int,
    tile: int,
    tpg: int,
    nwin: int,
) -> RingSkeleton:
    """Once per run: one device segment_sum + O(num_strata) host layout."""
    A = ublock // su
    C = iblock // si
    nseg = -(-C // nwin)
    nw = np.minimum(nwin, C - np.arange(nseg) * nwin).astype(np.int32)
    seg_off = np.zeros(nseg, np.int64)
    np.cumsum(S * S * A * nw[:-1].astype(np.int64), out=seg_off[1:])
    ns = S * S * A * C
    if ns >= 2**31:
        raise NotImplementedError(
            "ring stratum space exceeds int32; raise su/si or shard planning"
        )
    seg_off_dev = jnp.asarray(seg_off.astype(np.int32))
    nw_dev = jnp.asarray(nw)
    counts = np.asarray(
        _device_counts(
            u_dev, ir_dev, seg_off_dev, nw_dev, S=S, ublock=ublock,
            iblock=iblock, su=su, si=si, nwin=nwin, A=A, ns=ns,
        )
    ).astype(np.int64)

    strat_start = np.zeros(ns + 1, np.int64)
    np.cumsum(counts, out=strat_start[1:])

    tiles_per = -(-counts // tile)
    pos_base = np.zeros(ns, np.int64)
    segments: list[RingSegmentSlice] = []
    f_cursor = 0  # flat tile cursor
    off = 0  # sid cursor
    for k in range(nseg):
        nwk = int(nw[k])
        cnt_k = tiles_per[off : off + S * S * A * nwk].reshape(S, S, A, nwk)
        real_per_a = cnt_k.sum(axis=3)  # (S, S, A)
        padded_per_a = -(-real_per_a // tpg) * tpg
        ng_cells = padded_per_a.sum(axis=2) // tpg  # (S, S)
        ng = max(1, int(ng_cells.max()))
        nt = ng * tpg

        sa = np.zeros((S, S, ng), np.int32)
        tc = np.zeros((S, S, nt), np.int32)
        for t in range(S):
            for s in range(S):
                runs = (padded_per_a[t, s] // tpg).astype(np.int64)
                sa_cell = np.repeat(np.arange(A, dtype=np.int32), runs)
                sa[t, s, : sa_cell.shape[0]] = sa_cell
                if sa_cell.shape[0] < ng:  # pad: repeat last visited block
                    sa[t, s, sa_cell.shape[0] :] = (
                        sa_cell[-1] if sa_cell.shape[0] else 0
                    )
                tp = cnt_k[t, s]  # (A, nwk)
                run_base = np.zeros(A + 1, np.int64)
                np.cumsum(padded_per_a[t, s], out=run_base[1:])
                within = np.cumsum(tp, axis=1) - tp
                cell_rel = s * nt  # slot base RELATIVE to the (k,t) slab
                sid_lo = off + (t * S + s) * A * nwk
                pos_base[sid_lo : sid_lo + A * nwk] = (
                    (cell_rel + run_base[:-1, None] + within).reshape(-1)
                    * tile
                )
                # window ids at the real tile slots
                strat_of_tile = np.repeat(
                    np.arange(A * nwk, dtype=np.int64), tp.reshape(-1)
                )
                starts = np.cumsum(tp.reshape(-1)) - tp.reshape(-1)
                within_t = np.arange(
                    strat_of_tile.shape[0], dtype=np.int64
                ) - np.repeat(starts, tp.reshape(-1))
                base_local = (run_base[:-1, None] + within).reshape(-1)
                real_ids = base_local[strat_of_tile] + within_t
                tc[t, s, real_ids] = (strat_of_tile % nwk).astype(np.int32)
        if S * nt * 3 * tile >= 2**31:
            raise NotImplementedError(
                f"a single (segment, sub-step) slab ({S}x{nt} tiles x "
                f"{tile}) exceeds int32 addressing; raise the shard count"
            )
        segments.append(
            RingSegmentSlice(
                win0=k * nwin,
                nwin=nwk,
                nt=nt,
                sa=jnp.asarray(sa),
                tc=jnp.asarray(tc),
            )
        )
        f_cursor += S * S * nt
        off += S * S * A * nwk

    # sorted-stream boundaries per (k, t): sid order is (k, t, s, a, cw)
    kt_bounds = np.zeros((nseg, S + 1), np.int64)
    off2 = 0
    for k in range(nseg):
        nwk = int(nw[k])
        for t in range(S + 1):
            kt_bounds[k, t] = strat_start[off2 + min(t, S) * S * A * nwk]
        off2 += S * S * A * nwk
    return RingSkeleton(
        S=S, ublock=ublock, iblock=iblock, su=su, si=si, tile=tile,
        tpg=tpg, nwin=nwin, nt_total=f_cursor,
        n_real=int(counts.sum()),
        segments=segments,
        strat_start=jnp.asarray(strat_start[:-1].astype(np.int32)),
        pos_base=jnp.asarray(pos_base.astype(np.int32)),
        seg_off=seg_off_dev,
        nw_arr=nw_dev,
        kt_bounds=kt_bounds,
    )


@functools.partial(
    jax.jit,
    static_argnames=("S", "ublock", "iblock", "su", "si", "nwin", "A"),
)
def _sort_stream(u, ir, p2, key, seg_off, nw_arr,
                 *, S, ublock, iblock, su, si, nwin, A):
    # same seeded two-key sort as the single-chip pass
    # (mfx/kernels/plan_device.py) with the ring stratum id. ``p2`` is
    # the third tile row as int32: bitcast ratings for SGD, window-local
    # negative ids for fused BPR.
    n = u.shape[0]
    sid = _sid_ring(u, ir, seg_off, nw_arr, S=S, ublock=ublock,
                    iblock=iblock, su=su, si=si, nwin=nwin, A=A)
    rand = jax.random.bits(key, (n,), dtype=jnp.uint32).astype(jnp.int32)
    ul = (u % su).astype(jnp.int32)
    il = (ir % si).astype(jnp.int32)
    sid_s, _, ul, il, p2 = lax.sort(
        (sid, rand, ul, il, p2.astype(jnp.int32)), num_keys=2,
        is_stable=True,
    )
    return sid_s, ul, il, p2


@functools.partial(
    jax.jit, static_argnames=("mp", "S", "nt", "tile", "su", "si", "sent2")
)
def _scatter_slab(
    sid_s, ul, il, p2, b0, m, strat_start, pos_base,
    *, mp, S, nt, tile, su, si, sent2=0,
):
    """Scatter one (segment, sub-step)'s contiguous sorted-stream slice
    into its [S, nt, 3, T] slab. ``mp`` is the slice length padded to a
    power of two (few jit variants); pad lanes scatter out of bounds and
    drop. All index arithmetic is slab-local, so int32 bounds apply per
    slab rather than per epoch."""
    i32 = jnp.int32
    j = jnp.arange(mp, dtype=i32)
    valid = j < m
    take = jnp.minimum(b0 + j, sid_s.shape[0] - 1)
    sid_c = sid_s[take]
    pos = (b0 + j) - strat_start[sid_c]
    d = pos_base[sid_c] + pos  # slab-relative slot
    size = S * nt * 3 * tile
    o = (d // tile) * (3 * tile) + d % tile
    o = jnp.where(valid, o, size)
    # pad sentinel for row 2: 0 for SGD rating bits (harmless — zero
    # one-hots kill pads), si for BPR negatives (a 0 sentinel would be a
    # VALID item id and decay row 0 on every pad slot)
    flat = jnp.broadcast_to(
        jnp.array([su, si, sent2], i32)[None, :, None], (S * nt, 3, tile)
    ).reshape(-1)
    st = dict(mode="drop", unique_indices=True)
    flat = flat.at[o].set(ul[take], **st)
    flat = flat.at[o + tile].set(il[take], **st)
    flat = flat.at[o + 2 * tile].set(p2[take], **st)
    return flat.reshape(S, nt, 3, tile)


def epoch_tiles_ring(
    skel: RingSkeleton, u_dev, ir_dev, r_dev, seed: int, epoch: int,
    payload2=None, sent2: int = 0,
) -> list[jax.Array]:
    """Per-epoch device pass: one seeded global sort, then per-(segment,
    sub-step) slab scatters, returning one ``(S, S, nt_k, 3, T)`` slab
    per segment (sub-step-major, matching the ring scan).

    Row 2 of the tile stream carries ``payload2`` (int32; with the pad
    sentinel ``sent2``) when given — fused BPR passes window-local
    negative ids — and bitcast ratings (``r_dev``) otherwise."""
    key = jax.random.fold_in(jax.random.key(seed), epoch)
    A = skel.ublock // skel.su
    S = skel.S
    if int(u_dev.shape[0]) == 0:
        # empty sparse stream (e.g. a full-span dense split that carved
        # every rating): all-sentinel slabs — zero one-hots make every
        # pad slot a no-op in the kernels
        out = []
        for seg in skel.segments:
            flat = jnp.broadcast_to(
                jnp.array([skel.su, skel.si, sent2], jnp.int32)[
                    None, None, None, :, None
                ],
                (S, S, seg.nt, 3, skel.tile),
            )
            out.append(flat)
        return out
    if payload2 is None:
        payload2 = lax.bitcast_convert_type(
            jnp.asarray(r_dev, jnp.float32), jnp.int32
        )
    sid_s, ul, il, p2 = _sort_stream(
        u_dev, ir_dev, payload2, key, skel.seg_off, skel.nw_arr,
        S=S, ublock=skel.ublock, iblock=skel.iblock,
        su=skel.su, si=skel.si, nwin=skel.nwin, A=A,
    )
    out = []
    for k, seg in enumerate(skel.segments):
        slabs = []
        for t in range(S):
            b0 = int(skel.kt_bounds[k, t])
            m = int(skel.kt_bounds[k, t + 1]) - b0
            mp = 1 << max(0, (m - 1)).bit_length() if m else 1
            slabs.append(
                _scatter_slab(
                    sid_s, ul, il, p2,
                    jnp.asarray(b0, jnp.int32), jnp.asarray(m, jnp.int32),
                    skel.strat_start, skel.pos_base,
                    mp=mp, S=S, nt=seg.nt, tile=skel.tile,
                    su=skel.su, si=skel.si, sent2=sent2,
                )
            )
        out.append(jnp.stack(slabs, axis=0))
    return out
