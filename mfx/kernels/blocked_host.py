"""Host-side tile planning for the blocked SGD kernels (SURVEY.md C5/K1 prep).

The blocked execution model (DSGD-style, Gemulla et al.) stratifies ratings
by (user-block, item-window) and cuts each stratum into fixed-size tiles of
``T`` ratings. The device kernel (Pallas K1, or its pure-XLA mirror) walks
tiles in order, keeping the current P block and Q window in VMEM, and
performs gather/scatter as block-local one-hot matmuls on the MXU.

Layout notes (TPU-first):
- Factor tables are stored **rank-packed**: ``p = 128 // rank`` consecutive
  rows are packed into one 128-lane row (``(rows/p, 128)`` via a plain
  reshape), so rank<128 matmuls still use the full MXU width.
- Within a tile, padded slots carry local id == block_size (out of range),
  which produces an all-zero one-hot row: padding is an exact no-op for
  gather, scatter, and bias updates by construction.
- Tiles are emitted user-block-major, so the P block changes rarely
  (A times per epoch) and the Q window cycles per stratum.

Everything here is seeded/pure → bitwise-deterministic epochs.
"""

from __future__ import annotations

import dataclasses

import numpy as np

__all__ = [
    "TilePlan",
    "build_tile_plan",
    "SweepPlan",
    "build_sweep_plans",
    "pack_rows",
    "unpack_rows",
    "pack_factor",
]


def pack_factor(rank: int) -> int:
    """Rows packed per 128-lane vector row."""
    if rank > 128:
        raise ValueError(f"rank {rank} > 128 not supported by the packed layout")
    if 128 % rank != 0:
        raise ValueError(f"rank {rank} must divide 128 for the packed layout")
    return 128 // rank


def pack_rows(x: np.ndarray, p: int) -> np.ndarray:
    """(R, K) -> (R/p, p*K) row packing (pure reshape; R must divide by p)."""
    r, k = x.shape
    if r % p:
        raise ValueError(f"rows {r} not divisible by pack factor {p}")
    return x.reshape(r // p, p * k)


def unpack_rows(x: np.ndarray, p: int) -> np.ndarray:
    r2, pk = x.shape
    return x.reshape(r2 * p, pk // p)


@dataclasses.dataclass
class TilePlan:
    """Device-ready epoch tiles for the blocked kernels.

    ta, tc: int32 [NT] — user-block / item-window index per tile.
    tu, ti: int32 [NT, T] — local row ids (tu in [0, SU], ti in [0, SI];
        the value SU / SI marks padding).
    tr: float32 [NT, T] — ratings (0 in padded slots).
    n_real: real rating count; SU/SI/T: geometry.
    """

    ta: np.ndarray
    tc: np.ndarray
    tu: np.ndarray
    ti: np.ndarray
    tr: np.ndarray
    n_real: int
    su: int
    si: int
    tile: int
    num_ublocks: int
    num_iwindows: int

    @property
    def num_tiles(self) -> int:
        return int(self.ta.shape[0])

    @property
    def occupancy(self) -> float:
        return self.n_real / max(1, self.num_tiles * self.tile)


def build_tile_plan(
    user: np.ndarray,
    item: np.ndarray,
    rating: np.ndarray,
    num_users: int,
    num_items: int,
    su: int,
    si: int,
    tile: int,
    perm: np.ndarray | None = None,
) -> TilePlan:
    """Stratify + tile one epoch of ratings. O(n log n) vectorized NumPy."""
    n = len(user)
    if perm is None:
        perm = np.arange(n, dtype=np.int64)
    u = user[perm].astype(np.int64)
    i = item[perm].astype(np.int64)
    r = rating[perm]

    A = -(-num_users // su)
    C = -(-num_items // si)
    a = u // su
    c = i // si
    strat = a * C + c
    sorter = np.argsort(strat, kind="stable")  # keeps perm order within strata
    u, i, r, strat = u[sorter], i[sorter], r[sorter], strat[sorter]

    counts = np.bincount(strat, minlength=A * C)
    tiles_per = -(-counts // tile)  # ceil; 0 for empty strata
    tile_base = np.zeros(A * C + 1, np.int64)
    np.cumsum(tiles_per, out=tile_base[1:])
    nt = int(tile_base[-1])

    # destination (tile, slot) for every rating
    offsets = np.zeros(A * C + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    pos_in_strat = np.arange(n, dtype=np.int64) - offsets[strat]
    dest_tile = tile_base[strat] + pos_in_strat // tile
    dest_slot = pos_in_strat % tile

    tu = np.full((nt, tile), su, np.int32)  # pad sentinel = su
    ti = np.full((nt, tile), si, np.int32)
    tr = np.zeros((nt, tile), np.float32)
    tu[dest_tile, dest_slot] = (u - a[sorter] * su).astype(np.int32)
    ti[dest_tile, dest_slot] = (i - c[sorter] * si).astype(np.int32)
    tr[dest_tile, dest_slot] = r

    # per-tile block ids: the stratum of each tile
    strat_of_tile = np.repeat(np.arange(A * C, dtype=np.int64), tiles_per)
    ta = (strat_of_tile // C).astype(np.int32)
    tc = (strat_of_tile % C).astype(np.int32)
    return TilePlan(
        ta=ta, tc=tc, tu=tu, ti=ti, tr=tr,
        n_real=n, su=su, si=si, tile=tile,
        num_ublocks=A, num_iwindows=C,
    )


@dataclasses.dataclass
class SweepPlan:
    """One item-sweep of tiles for the Pallas kernel (sgd_pallas.py).

    sa: int32 [NG] — user-block id per grid step (NG = NT / tpg); every
        step's tiles share one user block (runs padded to tpg).
    tc: int32 [NT] — sweep-local item-window id per tile.
    tl: int32 [NT, 3, T] — packed tile stream: (u_local, i_windowlocal,
        bitcast(rating)); pad slots carry (su, si, 0).
    win0: first global item window of this sweep; nwin: window count.
    n_real: real ratings in this sweep.
    """

    sa: np.ndarray
    tc: np.ndarray
    tl: np.ndarray
    win0: int
    nwin: int
    n_real: int
    su: int
    si: int
    tile: int
    tpg: int

    @property
    def num_tiles(self) -> int:
        return int(self.tc.shape[0])


def build_sweep_plans(
    user: np.ndarray,
    item: np.ndarray,
    rating: np.ndarray,
    num_users: int,
    num_items: int,
    su: int,
    si: int,
    tile: int,
    tpg: int,
    nwin: int,
    perm: np.ndarray | None = None,
) -> list[SweepPlan]:
    """Plan an epoch as item-sweeps of ``nwin`` windows each.

    Within a sweep, tiles run user-block-major (a asc, window asc, then
    permutation order); each user-block run is padded to a multiple of
    ``tpg`` so every grid step addresses a single P block. O(n log n).
    """
    n = len(user)
    if perm is None:
        perm = np.arange(n, dtype=np.int64)

    # the native O(n) planner builds the identical layout ~30x faster on
    # the single-core host; fall back to vectorized NumPy without it
    try:
        from mfx import native as _native

        dicts = _native.plan_sweeps_native(
            user, item, rating, perm, num_users, num_items,
            su, si, tile, tpg, nwin,
        )
    except Exception:
        dicts = None
    if dicts is not None:
        return [
            SweepPlan(su=su, si=si, tile=tile, tpg=tpg, **d) for d in dicts
        ]

    A = -(-num_users // su)
    C = -(-num_items // si)
    n_sweeps = -(-C // nwin)

    u_all = user[perm].astype(np.int64)
    i_all = item[perm].astype(np.int64)
    r_all = rating[perm]
    c_all = i_all // si
    sweep_of = c_all // nwin

    plans: list[SweepPlan] = []
    for s in range(n_sweeps):
        sel = sweep_of == s
        u = u_all[sel]
        i = i_all[sel]
        r = r_all[sel]
        win0 = s * nwin
        nw = min(nwin, C - win0)
        a = u // su
        c = i // si - win0
        strat = a * nw + c
        sorter = np.argsort(strat, kind="stable")
        u, i, r, strat = u[sorter], i[sorter], r[sorter], strat[sorter]
        a = a[sorter]

        counts = np.bincount(strat, minlength=A * nw)
        tiles_per = -(-counts // tile)
        # pad each user block's tile run to a multiple of tpg
        real_per_a = tiles_per.reshape(A, nw).sum(axis=1)
        padded_per_a = -(-real_per_a // tpg) * tpg
        base_a = np.zeros(A + 1, np.int64)
        np.cumsum(padded_per_a, out=base_a[1:])
        nt = int(base_a[-1])
        # tile base per stratum: a's base + tiles of earlier windows in a
        within_a = np.cumsum(tiles_per.reshape(A, nw), axis=1)
        strat_base = (
            base_a[:-1, None] + within_a - tiles_per.reshape(A, nw)
        ).reshape(-1)

        offsets = np.zeros(A * nw + 1, np.int64)
        np.cumsum(counts, out=offsets[1:])
        pos = np.arange(len(u), dtype=np.int64) - offsets[strat]
        dest_tile = strat_base[strat] + pos // tile
        dest_slot = pos % tile

        tl = np.empty((nt, 3, tile), np.int32)
        tl[:, 0, :] = su  # pad sentinels
        tl[:, 1, :] = si
        tl[:, 2, :] = 0
        tl[dest_tile, 0, dest_slot] = (u - a * su).astype(np.int32)
        tl[dest_tile, 1, dest_slot] = (i - (i // si) * si).astype(np.int32)
        tl[dest_tile, 2, dest_slot] = r.view(np.int32)

        tc = np.zeros(nt, np.int32)
        strat_of_tile = np.repeat(np.arange(A * nw, dtype=np.int64), tiles_per)
        starts = np.cumsum(tiles_per) - tiles_per
        within = np.arange(strat_of_tile.shape[0], dtype=np.int64) - np.repeat(
            starts, tiles_per
        )
        real_tile_ids = strat_base[strat_of_tile] + within
        tc[real_tile_ids] = (strat_of_tile % nw).astype(np.int32)

        sa = np.repeat(np.arange(A, dtype=np.int32), padded_per_a // tpg)
        plans.append(
            SweepPlan(
                sa=sa, tc=tc, tl=tl, win0=win0, nwin=nw, n_real=len(u),
                su=su, si=si, tile=tile, tpg=tpg,
            )
        )
    return plans


def shuffle_tile_plan(plan: TilePlan, seed: int, epoch: int) -> TilePlan:
    """Cheap per-epoch reshuffle of a precomputed plan: permutes the item-
    window order within each user-block run and the user-block run order,
    keeping user-block runs contiguous (so P-block DMA stays rare).

    This is the O(num_tiles) alternative to rebuilding the plan from the COO
    each epoch on the host; sample-to-tile assignment stays fixed across
    epochs (documented determinism/quality tradeoff, SURVEY.md §7.2)."""
    rng = np.random.default_rng(np.random.SeedSequence([seed, 0xB10C, epoch]))
    nt = plan.num_tiles
    # order tiles by (a-run permutation, c permutation within run, tile idx)
    a_rank = rng.permutation(plan.num_ublocks)[plan.ta]
    c_rank = rng.permutation(plan.num_iwindows)[plan.tc]
    order = np.lexsort((np.arange(nt), c_rank, a_rank))
    return TilePlan(
        ta=plan.ta[order], tc=plan.tc[order],
        tu=plan.tu[order], ti=plan.ti[order], tr=plan.tr[order],
        n_real=plan.n_real, su=plan.su, si=plan.si, tile=plan.tile,
        num_ublocks=plan.num_ublocks, num_iwindows=plan.num_iwindows,
    )
