"""Minibatch partitioning (SURVEY.md C4 + C5).

This module replaces the reference's sequential / Hogwild update loop (the
implied design of ``MatrixFactorizationSGD.java``, a concurrent-programming
course assignment — ``/root/reference/README.md:1-2``) with deterministic,
TPU-friendly epoch partitions per BASELINE.json's north star:

- ``partition_fixed``: permutation → fixed-shape ``[num_batches, B]`` padded
  minibatches. Duplicate rows within a batch are allowed; the update kernels
  apply segment-sum gradient reduction, so results are bitwise-deterministic.
- ``partition_conflict_free``: greedy matching-based rounds where no user row
  and no item row repeats within a batch, so rank-1 scatter updates are
  race-free by construction (the deterministic answer to Hogwild).
- ``BlockedPartition``: DSGD-style (Gemulla et al.) block stratification of
  the rating matrix into (user-block, item-block) strata. Strata that share
  no block are trivially conflict-free across parallel workers; this drives
  both the single-chip blocked one-hot Pallas kernel (factor blocks stay
  VMEM-resident) and the multi-chip ring schedule where item blocks rotate
  over ICI (``mfx.parallel.sharded``).

All functions are seeded/pure: same inputs → same partition, a precondition
for bitwise-deterministic training.
"""

from __future__ import annotations

import dataclasses

import numpy as np

__all__ = [
    "pad_to_batches",
    "partition_fixed",
    "partition_conflict_free",
    "BlockedPartition",
    "make_blocked_partition",
]

# Legacy pad id (kept for callers that don't pass table sizes). Padded
# slots always carry weight 0, so their deltas are exactly zero; but id-0
# pads duplicate a *real* row id inside a batch, which breaks the
# ``unique_indices`` promise the conflict-free scatter path makes to XLA.
# ``pad_to_batches`` therefore emits *unique, out-of-range* pad ids
# (``num_rows + slot``) whenever table sizes are provided; the update path
# gathers with mode='clip' and scatters with mode='drop' so out-of-range
# pads are exact no-ops and every in-batch id is genuinely unique.
PAD_ID = 0


def pad_to_batches(
    user: np.ndarray,
    item: np.ndarray,
    rating: np.ndarray,
    order: np.ndarray | list[np.ndarray],
    batch_size: int,
    num_users: int | None = None,
    num_items: int | None = None,
    extras: dict[str, np.ndarray] | None = None,
) -> dict[str, np.ndarray]:
    """Materialize padded ``[num_batches, B]`` epoch tensors.

    ``order`` is either a flat index array (split into consecutive batches)
    or a list of per-batch index arrays (each of length <= batch_size).
    Returns dict with int32 ``users``/``items``, float32 ``ratings``/
    ``weights`` (1.0 real, 0.0 padding). When ``num_users``/``num_items``
    are given, padded slots carry unique out-of-range sentinel ids
    (``num_rows + slot``) instead of 0, keeping batches duplicate-free.
    ``extras`` adds further per-rating columns (same length as ``user``),
    batched in the same order with zero-valued padding and their dtype
    preserved — e.g. the temporal model's per-rating bin/deviation features
    (mfx.solvers.timesvd).
    """
    if isinstance(order, np.ndarray):
        n = len(order)
        nb = max(1, -(-n // batch_size))
        batches = [order[b * batch_size : (b + 1) * batch_size] for b in range(nb)]
    else:
        batches = list(order)
        nb = len(batches)

    slot = np.arange(batch_size, dtype=np.int32)
    if num_users is not None:
        users = np.broadcast_to(np.int32(num_users) + slot, (nb, batch_size)).copy()
    else:
        users = np.full((nb, batch_size), PAD_ID, np.int32)
    if num_items is not None:
        items = np.broadcast_to(np.int32(num_items) + slot, (nb, batch_size)).copy()
    else:
        items = np.full((nb, batch_size), PAD_ID, np.int32)
    ratings = np.zeros((nb, batch_size), np.float32)
    weights = np.zeros((nb, batch_size), np.float32)
    out = {"users": users, "items": items, "ratings": ratings, "weights": weights}
    for name, col in (extras or {}).items():
        if name in out:
            raise ValueError(f"extras key {name!r} collides with a core column")
        if len(col) != len(user):
            raise ValueError(
                f"extras[{name!r}] has length {len(col)} != {len(user)} ratings"
            )
        out[name] = np.zeros((nb, batch_size), col.dtype)
    for b, idx in enumerate(batches):
        m = len(idx)
        if m > batch_size:
            raise ValueError(f"batch {b} has {m} > batch_size={batch_size} entries")
        users[b, :m] = user[idx]
        items[b, :m] = item[idx]
        ratings[b, :m] = rating[idx]
        weights[b, :m] = 1.0
        for name, col in (extras or {}).items():
            out[name][b, :m] = col[idx]
    return out


def partition_fixed(n: int, batch_size: int, perm: np.ndarray) -> np.ndarray:
    """Fixed-size batches in permutation order (flat order array)."""
    if len(perm) != n:
        raise ValueError("perm length mismatch")
    return perm


def partition_conflict_free(
    user: np.ndarray,
    item: np.ndarray,
    batch_size: int,
    perm: np.ndarray,
    max_rounds: int | None = None,
    num_users: int | None = None,
    num_items: int | None = None,
) -> list[np.ndarray]:
    """Greedy conflict-free rounds: within each returned batch no user id
    and no item id repeats (a matching in the bipartite rating graph).

    Prefers the native O(n) greedy (mfx.native: round = max of the user's
    and item's next-free round, ≤ max-degree rounds); falls back to the
    vectorized NumPy multi-pass greedy when no toolchain is available.
    Both are seeded-deterministic; rounds are split into ≤ batch_size
    chunks, which is conflict-free-safe (chunks of a matching are
    matchings).
    """
    try:
        from mfx import native

        if native.available():
            nu = int(num_users if num_users is not None else user.max() + 1)
            ni = int(num_items if num_items is not None else item.max() + 1)
            rounds, n_rounds = native.conflict_free_rounds(
                user, item, np.asarray(perm, np.int64), nu, ni
            )
            out: list[np.ndarray] = []
            order = np.argsort(rounds, kind="stable")
            bounds = np.searchsorted(rounds[order], np.arange(n_rounds + 1))
            for rr in range(n_rounds):
                members = perm[order[bounds[rr] : bounds[rr + 1]]]
                for s in range(0, len(members), batch_size):
                    out.append(members[s : s + batch_size])
            return out
    except Exception:
        pass  # fall through to the NumPy path
    return _partition_conflict_free_numpy(
        user, item, batch_size, perm, max_rounds
    )


def _partition_conflict_free_numpy(
    user: np.ndarray,
    item: np.ndarray,
    batch_size: int,
    perm: np.ndarray,
    max_rounds: int | None = None,
) -> list[np.ndarray]:
    """NumPy fallback: each pass selects, among unassigned ratings in
    permutation order, those that are the first occurrence of BOTH their
    user and their item; that set is conflict-free by construction. Passes
    are bounded by the max node degree."""
    remaining = np.asarray(perm, np.int64)
    out: list[np.ndarray] = []
    rounds = 0
    while remaining.size:
        u = user[remaining]
        i = item[remaining]
        # first-occurrence masks in current order
        _, first_u = np.unique(u, return_index=True)
        _, first_i = np.unique(i, return_index=True)
        mask = np.zeros(remaining.size, bool)
        mask_i = np.zeros(remaining.size, bool)
        mask[first_u] = True
        mask_i[first_i] = True
        mask &= mask_i
        chosen = np.flatnonzero(mask)
        # cap to batch_size per round; the rest go back to the pool
        for s in range(0, chosen.size, batch_size):
            out.append(remaining[chosen[s : s + batch_size]])
        keep = np.ones(remaining.size, bool)
        keep[chosen] = False
        remaining = remaining[keep]
        rounds += 1
        if max_rounds is not None and rounds > max_rounds:
            raise RuntimeError(f"conflict-free partition exceeded {max_rounds} rounds")
    return out


def validate_conflict_free(
    user: np.ndarray, item: np.ndarray, batches: list[np.ndarray]
) -> None:
    """Debug validator: asserts the no-duplicate-row property and coverage."""
    seen = 0
    for b, idx in enumerate(batches):
        if len(np.unique(user[idx])) != len(idx):
            raise AssertionError(f"batch {b}: duplicate user row")
        if len(np.unique(item[idx])) != len(idx):
            raise AssertionError(f"batch {b}: duplicate item row")
        seen += len(idx)
    total = sum(len(b) for b in batches)
    if seen != total:
        raise AssertionError("coverage mismatch")


# ---- DSGD block stratification ------------------------------------------------


@dataclasses.dataclass
class BlockedPartition:
    """Ratings regrouped into (user-block, item-block) strata.

    Attributes:
      order: int64 [n] — index into the epoch's COO arrays, sorted by
        (stratum, original permutation position).
      offsets: int64 [num_ublocks*num_iblocks + 1] — CSR offsets into
        ``order`` for stratum ``a * num_iblocks + b``.
      num_ublocks / num_iblocks: grid shape.
      ublock_size / iblock_size: rows of P / Q per block (last block padded
        conceptually; ids are never out of range).
    """

    order: np.ndarray
    offsets: np.ndarray
    num_ublocks: int
    num_iblocks: int
    ublock_size: int
    iblock_size: int

    def stratum(self, a: int, b: int) -> np.ndarray:
        s = a * self.num_iblocks + b
        return self.order[self.offsets[s] : self.offsets[s + 1]]

    def max_stratum_nnz(self) -> int:
        return int(np.max(np.diff(self.offsets))) if len(self.offsets) > 1 else 0


def make_blocked_partition(
    user: np.ndarray,
    item: np.ndarray,
    num_users: int,
    num_items: int,
    ublock_size: int,
    iblock_size: int,
    perm: np.ndarray,
) -> BlockedPartition:
    """Stratify ``perm``-ordered ratings by (user // ublock_size,
    item // iblock_size). O(n) with two stable counting sorts."""
    perm = np.asarray(perm, np.int64)
    a = user[perm].astype(np.int64) // ublock_size
    b = item[perm].astype(np.int64) // iblock_size
    num_ub = -(-num_users // ublock_size)
    num_ib = -(-num_items // iblock_size)
    strat = a * num_ib + b
    # stable sort keeps permutation order within each stratum (determinism)
    sorter = np.argsort(strat, kind="stable")
    order = perm[sorter]
    counts = np.bincount(strat, minlength=num_ub * num_ib)
    offsets = np.zeros(num_ub * num_ib + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    return BlockedPartition(
        order=order,
        offsets=offsets,
        num_ublocks=num_ub,
        num_iblocks=num_ib,
        ublock_size=ublock_size,
        iblock_size=iblock_size,
    )
