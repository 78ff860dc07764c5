"""Device-side epoch tile planning (SURVEY.md C5 / §3.3 hot-loop #2;
VERDICT round-1 item #3).

Round 1 built sweep plans on the host (vectorized NumPy / the C++
planner): ~45-240 s per ML-25M epoch on this 1-core throttled host vs
0.3 s of device time — amortized only by plan reuse. This module moves
per-epoch planning onto the TPU, exploiting one structural fact:

  **Stratum membership is permutation-invariant.** A rating's stratum
  (user block × item window) depends only on its ids, so per-stratum
  counts — and therefore the full tile layout (tile counts, user-block
  runs, tpg padding, the ``sa``/``tc`` scalar-prefetch arrays) — are
  FIXED for a dataset + geometry. An epoch's permutation only shuffles
  which rating lands in which slot *within* its stratum.

So the plan splits into:

  * a **skeleton**, built once per run (counts via one device
    ``segment_sum``, then O(num_strata) host arithmetic — num_strata is
    ~10⁴, not 10⁷): per-sweep ``sa``/``tc`` arrays, per-stratum tile
    bases, sweep tile ranges; and
  * a **per-epoch device pass** (`epoch_tiles_device`): one seeded
    key-sort of (stratum << 32 | random) with the rating payload riding
    along, then a unique-index scatter into the padded (NT, 3, T) tile
    stream. Within-stratum order is uniformly random per (seed, epoch)
    and bitwise-reproducible.

The emitted layout is semantically identical to the host planner's
(same strata, same runs, same padding sentinels); only the within-stratum
shuffle stream differs (jax.random vs numpy.random), which is the same
seeded-determinism contract.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["PlanSkeleton", "build_plan_skeleton", "epoch_tiles_device"]


@dataclasses.dataclass
class SweepSlice:
    """Static per-sweep view into the epoch tile stream."""

    win0: int
    nwin: int
    t0: int  # first tile (global index)
    t1: int  # one past last tile
    n_real: int
    sa: jax.Array  # (ng,) int32 user block per grid step
    tc: jax.Array  # (nt,) int32 sweep-local item window per tile


@dataclasses.dataclass
class PlanSkeleton:
    su: int
    si: int
    tile: int
    tpg: int
    nwin: int
    nt_total: int
    sweeps: list[SweepSlice]
    # device constants for the per-epoch pass (sid = stratum id in
    # (sweep, user block, window-local) order)
    strat_start: jax.Array  # (NS,) int64 exclusive cumsum of counts
    pos_base: jax.Array  # (NS,) int64 first padded slot of each stratum
    offs_sweep: jax.Array  # (n_sweeps,) int64 sid offset per sweep
    nw_arr: jax.Array  # (n_sweeps,) int64 windows per sweep


def _sid_arrays(num_users, num_items, su, si, nwin):
    A = -(-num_users // su)
    C = -(-num_items // si)
    n_sweeps = -(-C // nwin)
    nw = np.minimum(nwin, C - np.arange(n_sweeps) * nwin).astype(np.int32)
    offs = np.zeros(n_sweeps + 1, np.int32)
    np.cumsum(A * nw, out=offs[1:])
    return A, C, n_sweeps, nw, offs


@functools.partial(jax.jit, static_argnames=("su", "si", "nwin", "ns"))
def _device_counts(u, i, offs_sweep, nw_arr, *, su, si, nwin, ns):
    sid = _sid(u, i, offs_sweep, nw_arr, su=su, si=si, nwin=nwin)
    return jax.ops.segment_sum(
        jnp.ones_like(sid, jnp.int32), sid, num_segments=ns
    )


def _sid(u, i, offs_sweep, nw_arr, *, su, si, nwin):
    # int32 throughout: jax runs with 64-bit types disabled by default,
    # and all planner quantities fit 31 bits (guarded in the skeleton)
    a = (u // su).astype(jnp.int32)
    cg = (i // si).astype(jnp.int32)
    s = cg // nwin
    c_local = cg - s * nwin
    return offs_sweep[s] + a * nw_arr[s] + c_local


def build_plan_skeleton(
    u_dev: jax.Array,
    i_dev: jax.Array,
    num_users: int,
    num_items: int,
    su: int,
    si: int,
    tile: int,
    tpg: int,
    nwin: int,
) -> PlanSkeleton:
    """Once per run. ``u_dev``/``i_dev`` are the device-resident COO id
    arrays (they stay resident for the per-epoch passes)."""
    A, C, n_sweeps, nw, offs = _sid_arrays(num_users, num_items, su, si, nwin)
    ns = int(offs[-1])
    offs_dev = jnp.asarray(offs[:-1])
    nw_dev = jnp.asarray(nw)
    counts = np.asarray(
        _device_counts(
            u_dev, i_dev, offs_dev, nw_dev, su=su, si=si, nwin=nwin, ns=ns
        )
    ).astype(np.int64)

    strat_start = np.zeros(ns + 1, np.int64)
    np.cumsum(counts, out=strat_start[1:])

    tiles_per = -(-counts // tile)  # ceil; 0 for empty strata
    tile_base = np.zeros(ns, np.int64)
    sweeps: list[SweepSlice] = []
    t_cursor = 0
    for s in range(n_sweeps):
        nws = int(nw[s])
        lo, hi = int(offs[s]), int(offs[s + 1])
        tp = tiles_per[lo:hi].reshape(A, nws)
        real_per_a = tp.sum(axis=1)
        padded_per_a = -(-real_per_a // tpg) * tpg
        run_base = np.zeros(A + 1, np.int64)
        np.cumsum(padded_per_a, out=run_base[1:])
        nt = int(run_base[-1])
        within = np.cumsum(tp, axis=1) - tp
        tile_base[lo:hi] = (t_cursor + run_base[:-1, None] + within).reshape(-1)

        # sa: one user-block id per grid step; tc: window id per tile
        # (pad tiles sit at the end of each run with tc=0 + sentinel rows)
        sa = np.repeat(
            np.arange(A, dtype=np.int32), (padded_per_a // tpg).astype(np.int64)
        )
        tc = np.zeros(nt, np.int32)
        strat_of_tile = np.repeat(np.arange(A * nws, dtype=np.int64), tp.reshape(-1))
        starts = np.cumsum(tp.reshape(-1)) - tp.reshape(-1)
        within_t = np.arange(strat_of_tile.shape[0], dtype=np.int64) - np.repeat(
            starts, tp.reshape(-1)
        )
        real_ids = (tile_base[lo:hi] - t_cursor)[strat_of_tile] + within_t
        tc[real_ids] = (strat_of_tile % nws).astype(np.int32)

        sweeps.append(
            SweepSlice(
                win0=s * nwin,
                nwin=nws,
                t0=t_cursor,
                t1=t_cursor + nt,
                n_real=int(counts[lo:hi].sum()),
                sa=jnp.asarray(sa),
                tc=jnp.asarray(tc),
            )
        )
        t_cursor += nt

    if t_cursor * tile * 3 >= 2**31:
        raise NotImplementedError(
            f"epoch tile stream ({t_cursor} tiles x {tile}) exceeds int32 "
            "addressing; split the epoch into item-range shards"
        )
    return PlanSkeleton(
        su=su,
        si=si,
        tile=tile,
        tpg=tpg,
        nwin=nwin,
        nt_total=t_cursor,
        sweeps=sweeps,
        strat_start=jnp.asarray(strat_start[:-1].astype(np.int32)),
        pos_base=jnp.asarray((tile_base * tile).astype(np.int32)),
        offs_sweep=offs_dev,
        nw_arr=nw_dev,
    )


@functools.partial(
    jax.jit,
    static_argnames=("su", "si", "tile", "nwin", "nt_total", "with_slots"),
)
def _epoch_tiles(
    u, i, r, key, strat_start, pos_base, offs_sweep, nw_arr,
    *, su, si, tile, nwin, nt_total, with_slots=False, extras=(),
):
    n = u.shape[0]
    sid = _sid(u, i, offs_sweep, nw_arr, su=su, si=si, nwin=nwin)
    # two-key sort: (stratum, seeded random) — the random key realizes the
    # within-stratum shuffle; ties are resolved by lax.sort's stable order
    # on the remaining operands, keeping the pass deterministic either way.
    # ``extras`` are int32 per-rating payload streams that ride the sort
    # and land as tile rows 3.. (the temporal planner passes tbin/dev —
    # slot assignment is payload-independent, so rows 0-2 stay bitwise
    # the MF plan's).
    rand = jax.random.bits(key, (n,), dtype=jnp.uint32).astype(jnp.int32)
    rb = lax.bitcast_convert_type(r.astype(jnp.float32), jnp.int32)
    sorted_ops = lax.sort(
        (sid, rand, u.astype(jnp.int32), i.astype(jnp.int32), rb)
        + tuple(extras),
        num_keys=2, is_stable=True,
    )
    sid_s, _, u_s, i_s, rb = sorted_ops[:5]
    ex_s = sorted_ops[5:]
    nrows = 3 + len(ex_s)
    ul = u_s % su
    il = i_s % si
    pos = jnp.arange(n, dtype=jnp.int32) - strat_start[sid_s]
    d = pos_base[sid_s] + pos  # strictly increasing padded slot per rating
    o = (d // tile) * (nrows * tile) + d % tile
    flat = jnp.broadcast_to(
        jnp.array([su, si] + [0] * (nrows - 2), jnp.int32)[None, :, None],
        (nt_total, nrows, tile),
    ).reshape(-1)
    st = dict(mode="promise_in_bounds", unique_indices=True)
    flat = flat.at[o].set(ul, **st)
    flat = flat.at[o + tile].set(il, **st)
    flat = flat.at[o + 2 * tile].set(rb, **st)
    for k, ex in enumerate(ex_s):
        flat = flat.at[o + (3 + k) * tile].set(ex, **st)
    tiles = flat.reshape(nt_total, nrows, tile)
    if not with_slots:
        # the slot/id streams are only needed by the epoch-frozen bias
        # mode; keeping them out of the jitted outputs lets XLA fuse them
        # away on the default path (~3n int32 of HBM per replan otherwise)
        return tiles, None, None, None
    return tiles, d, u_s, i_s


def epoch_tiles_device(
    skel: PlanSkeleton, u_dev, i_dev, r_dev, seed: int, epoch: int,
    with_slots: bool = False, extras: tuple = (),
):
    """The per-epoch pass: (NT, 3+len(extras), T) tile stream on device,
    within-stratum order seeded by (seed, epoch). With ``with_slots``,
    also returns the per-rating flat slot index ``d`` and the sorted
    global (u, i) id streams — the state the epoch-frozen bias mode needs
    to refresh its per-slot bias stream and segment-sum residuals each
    epoch (mfx/solvers/blocked.py). ``extras`` — int32 per-rating payload
    streams landing as tile rows 3.. (bitcast floats first); slot
    assignment is payload-independent, so rows 0-2 are bitwise the plain
    plan's."""
    if extras and skel.nt_total * skel.tile * (3 + len(extras)) >= 2**31:
        raise NotImplementedError(
            "payload tile stream exceeds int32 addressing; split the "
            "epoch into item-range shards"
        )
    key = jax.random.fold_in(jax.random.key(seed), epoch)
    tiles, d, u_s, i_s = _epoch_tiles(
        u_dev, i_dev, r_dev, key,
        skel.strat_start, skel.pos_base, skel.offs_sweep, skel.nw_arr,
        su=skel.su, si=skel.si, tile=skel.tile, nwin=skel.nwin,
        nt_total=skel.nt_total, with_slots=with_slots,
        extras=tuple(extras),
    )
    if with_slots:
        return tiles, d, u_s, i_s
    return tiles
