"""BPR negative sampling — SURVEY.md C6 (BASELINE.json configs[4]).

Implicit-feedback training triples (user, positive item, sampled negative
item). Negatives are **exact**: uniform over the item catalog with
rejection of the user's observed positives (round-1 accepted collisions;
VERDICT round 1, item #9). The positive set is a single sorted int64 key
array (``u * num_items + i``) built once per run, so the membership test
per rejection round is one vectorized ``searchsorted`` over all pending
samples — O(n log nnz) host work, no per-user Python.

Determinism: the RNG stream is derived from (seed, epoch) and consumed in
a fixed order (initial draw, then one draw per rejection round), so the
triples are bitwise-reproducible. Degenerate users who have rated the
entire catalog cannot have a valid negative; after ``max_rounds`` their
sample is kept as-is (probability 0 on real data).
"""

from __future__ import annotations

import numpy as np

from mfx.data.coo import RatingsCOO

__all__ = [
    "build_positive_index",
    "build_positive_index_device",
    "lowerbound_2key",
    "members_2key",
    "sample_negatives",
    "sample_negatives_device",
    "bpr_epoch_triples",
]

# Rejection rounds before giving up on a pending sample. Expected pending
# fraction after r rounds is density^r; real datasets (density < 5%) clear
# in 2-3 rounds.
MAX_REJECTION_ROUNDS = 32


def build_positive_index(coo: RatingsCOO) -> np.ndarray:
    """Sorted int64 keys ``u * num_items + i`` of all observed positives.
    Build once per training run and pass to :func:`sample_negatives` /
    :func:`bpr_epoch_triples`."""
    keys = coo.user.astype(np.int64) * coo.num_items + coo.item
    keys.sort()
    return keys


def _members(pos_keys: np.ndarray, queries: np.ndarray) -> np.ndarray:
    """Boolean membership of each query key in the sorted key array."""
    idx = np.searchsorted(pos_keys, queries)
    idx_c = np.minimum(idx, len(pos_keys) - 1)
    return (idx < len(pos_keys)) & (pos_keys[idx_c] == queries)


def sample_negatives(
    n: int,
    num_items: int,
    seed: int,
    epoch: int,
    users: np.ndarray | None = None,
    pos_keys: np.ndarray | None = None,
) -> np.ndarray:
    """Seeded negatives. With ``users`` + ``pos_keys`` the sampling is
    exact (rejection against each user's positive set); without them it is
    plain uniform (used only where positives are acceptable, e.g. sampled
    AUC's ranking noise floor)."""
    rng = np.random.default_rng(np.random.SeedSequence([seed, 0xBB12, epoch]))
    neg = rng.integers(0, num_items, size=n, dtype=np.int32)
    if users is None or pos_keys is None:
        return neg
    ukeys = users.astype(np.int64) * num_items
    pending = np.flatnonzero(_members(pos_keys, ukeys + neg))
    rounds = 0
    while pending.size and rounds < MAX_REJECTION_ROUNDS:
        neg[pending] = rng.integers(
            0, num_items, size=pending.size, dtype=np.int32
        )
        pending = pending[_members(pos_keys, ukeys[pending] + neg[pending])]
        rounds += 1
    return neg


def build_positive_index_device(u_dev, i_dev):
    """Device analog of :func:`build_positive_index`: the positive set as
    a (users, items) pair lexicographically sorted on device. Pairs (not
    ``u * num_items + i`` scalars) because configs[4]-scale key ranges
    (10M users x 1M items) overflow int32 and jax runs 32-bit.

    Duplicate (u, i) pairs are replaced by ``INT32_MAX`` sentinels and
    re-sorted to the tail: the kept region is strictly increasing, which
    the complement-draw sampler (:func:`mfx.parallel.bpr_sharded.
    window_negatives`) relies on — its order-statistic search is wrong on
    runs of equal pairs. Membership queries are unaffected (sentinels
    compare greater than any real pair)."""
    import jax.numpy as jnp
    from jax import lax

    pu, pi = lax.sort(
        (jnp.asarray(u_dev, jnp.int32), jnp.asarray(i_dev, jnp.int32)),
        num_keys=2,
    )
    dup = jnp.zeros(pu.shape, bool).at[1:].set(
        (pu[1:] == pu[:-1]) & (pi[1:] == pi[:-1])
    )
    sent = jnp.iinfo(jnp.int32).max
    pu, pi = lax.sort(
        (jnp.where(dup, sent, pu), jnp.where(dup, sent, pi)), num_keys=2
    )
    return pu, pi


def lowerbound_2key(pu, pi, qu, qi):
    """First index whose (pu, pi) pair is >= each query pair (qu, qi) —
    the same fixed-depth binary search as :func:`members_2key`, returning
    the insertion point instead of a membership bit."""
    import jax.numpy as jnp
    from jax import lax

    n = pu.shape[0]
    lo = jnp.zeros(qu.shape, jnp.int32)
    hi = jnp.full(qu.shape, n, jnp.int32)

    def body(_, lh):
        lo, hi = lh
        active = lo < hi
        mid = jnp.minimum((lo + hi) // 2, n - 1)
        mu = pu[mid]
        mi = pi[mid]
        less = (mu < qu) | ((mu == qu) & (mi < qi))
        lo = jnp.where(active & less, mid + 1, lo)
        hi = jnp.where(active & ~less, mid, hi)
        return lo, hi

    lo, _ = lax.fori_loop(0, 32, body, (lo, hi))
    return lo


def members_2key(pu, pi, qu, qi):
    """Vectorized membership of query pairs (qu, qi) in the lex-sorted
    positive pair arrays — a fixed-depth binary search (32 steps covers
    any int32-indexable set), all device ops."""
    import jax.numpy as jnp
    from jax import lax

    n = pu.shape[0]
    lo = jnp.zeros(qu.shape, jnp.int32)
    hi = jnp.full(qu.shape, n, jnp.int32)

    def body(_, lh):
        lo, hi = lh
        active = lo < hi
        mid = jnp.minimum((lo + hi) // 2, n - 1)
        mu = pu[mid]
        mi = pi[mid]
        less = (mu < qu) | ((mu == qu) & (mi < qi))
        lo = jnp.where(active & less, mid + 1, lo)
        hi = jnp.where(active & ~less, mid, hi)
        return lo, hi

    lo, hi = lax.fori_loop(0, 32, body, (lo, hi))
    safe = jnp.minimum(lo, n - 1)
    return (lo < n) & (pu[safe] == qu) & (pi[safe] == qi)


def sample_negatives_device(
    key, users, pu, pi, num_items: int, rounds: int = MAX_REJECTION_ROUNDS
):
    """Device-side exact negative sampling (VERDICT round 2, directive
    #8): seeded uniform draws with membership rejection against the
    sorted positive pairs — per-epoch host work is O(1). Same contract
    as :func:`sample_negatives` (after ``rounds`` redraws a residual
    collision survives with probability density**rounds); the RNG stream
    is jax.random, so triples differ from the NumPy path but are
    bitwise-reproducible for a given (key, shape)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    n = users.shape[0]

    def draw(k):
        return jax.random.randint(k, (n,), 0, num_items, dtype=jnp.int32)

    neg = draw(jax.random.fold_in(key, 0))

    def body(r, neg):
        pending = members_2key(pu, pi, users, neg)
        fresh = draw(jax.random.fold_in(key, r + 1))
        return jnp.where(pending, fresh, neg)

    return lax.fori_loop(0, rounds, body, neg)


def bpr_epoch_triples(
    coo: RatingsCOO,
    seed: int,
    epoch: int,
    perm: np.ndarray | None = None,
    pos_keys: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(users, pos_items, neg_items) for one epoch, in permuted order.
    Pass ``pos_keys`` (from :func:`build_positive_index`) for exact
    negatives."""
    neg = sample_negatives(
        coo.n_ratings, coo.num_items, seed, epoch,
        users=coo.user if pos_keys is not None else None,
        pos_keys=pos_keys,
    )
    if perm is None:
        return coo.user, coo.item, neg
    return coo.user[perm], coo.item[perm], neg[perm]
