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
    "complement_draw",
    "lowerbound_2key",
    "members_2key",
    "popularity_cdf",
    "split_cdf_f32",
    "sample_negatives",
    "sample_negatives_device",
    "sample_negatives_weighted_device",
    "bpr_epoch_triples",
]

# Rejection rounds before giving up on a pending sample. Expected pending
# fraction after r rounds is density^r under the uniform proposal; real
# datasets (density < 5%) clear in 2-3 rounds. Under a popularity-weighted
# proposal the per-slot bound is the user's share of the sampling MASS
# raised to r — worst realistic case (a user holding half the mass) is
# 2^-32; bpr_epoch_triples additionally falls back to the positive
# (zero-gradient pair) for any slot still colliding.
MAX_REJECTION_ROUNDS = 32


def build_positive_index(coo: RatingsCOO) -> np.ndarray:
    """Sorted int64 keys ``u * num_items + i`` of all observed positives.
    Build once per training run and pass to :func:`sample_negatives` /
    :func:`bpr_epoch_triples`."""
    keys = coo.user.astype(np.int64) * coo.num_items + coo.item
    keys.sort()
    return keys


def popularity_cdf(
    item: np.ndarray, num_items: int, beta: float = 0.75
) -> np.ndarray:
    """Cumulative distribution over items with P(i) ∝ count(i)**beta —
    the standard popularity-weighted ("adaptive") negative-sampling
    measure (word2vec's beta=0.75 default): popular items make harder
    negatives, which sharpens top-of-ranking resolution. Items unseen in
    ``item`` have zero mass (they are never drawn as negatives). Build
    once per run; pass to :func:`sample_negatives` /
    :func:`bpr_epoch_triples` (host) or, as a device array, to
    :func:`sample_negatives_weighted_device`. float64 so the inverse-CDF
    searchsorted stays exact at billion-count scale."""
    counts = np.bincount(item, minlength=num_items).astype(np.float64)
    w = counts**beta
    tot = w.sum()
    if tot <= 0:
        raise ValueError("popularity_cdf needs at least one interaction")
    cdf = np.cumsum(w / tot)
    cdf[-1] = 1.0  # close the rounding gap so every u < 1 maps in-range
    return cdf


def _cdf_draw(rng: np.random.Generator, cdf: np.ndarray, size: int):
    """Inverse-CDF draw: item k with probability cdf[k] - cdf[k-1]."""
    return np.searchsorted(cdf, rng.random(size), side="right").astype(
        np.int32
    )


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
    cdf: np.ndarray | None = None,
) -> np.ndarray:
    """Seeded negatives. With ``users`` + ``pos_keys`` the sampling is
    exact (rejection against each user's positive set); without them it is
    plain uniform (used only where positives are acceptable, e.g. sampled
    AUC's ranking noise floor). ``cdf`` (from :func:`popularity_cdf`)
    switches the proposal measure to popularity-weighted; rejection then
    samples the user-conditional renormalization of that measure."""
    rng = np.random.default_rng(np.random.SeedSequence([seed, 0xBB12, epoch]))

    def draw(size):
        if cdf is not None:
            return _cdf_draw(rng, cdf, size)
        return rng.integers(0, num_items, size=size, dtype=np.int32)

    neg = draw(n)
    if users is None or pos_keys is None:
        return neg
    ukeys = users.astype(np.int64) * num_items
    pending = np.flatnonzero(_members(pos_keys, ukeys + neg))
    rounds = 0
    while pending.size and rounds < MAX_REJECTION_ROUNDS:
        neg[pending] = draw(pending.size)
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


def complement_draw(key, pi, start, cnt, navail, base, fallback, steps=32):
    """EXACT uniform draw from the complement of a sorted positive slice,
    one draw per query slot, zero rejection.

    Per slot: ``pi[start : start + cnt)`` holds the slot's positives as
    strictly increasing ids inside [base, base + span) (strictness is why
    :func:`build_positive_index_device` dedups), and
    ``navail = span - cnt`` is the complement size. Draw x ~ U[0, navail)
    and map it to the x-th NON-positive id by the order statistic: the
    smallest m with pi[start + m] - base - m > x gives j = base + x + m.

    Cost: one randint + ``steps`` binary-search gathers. The rejection
    loop this replaces cost rounds x 64 membership gathers and was 95% of
    the fused-BPR ring's epoch wall time. Slots with navail <= 0 (every
    real id in range is a positive) return ``fallback`` — callers pass
    the positive itself, making the triple a pure-regularization no-op
    (q_i - q_j == 0).

    ``steps`` must be >= ceil(log2(max cnt + 1)); 32 covers any int32
    slice."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    x = jax.random.randint(
        key, navail.shape, 0, jnp.maximum(navail, 1), dtype=jnp.int32
    )
    lo = jnp.zeros_like(cnt)
    hi = cnt
    nmax = pi.shape[0] - 1

    def body(_, lh):
        lo, hi = lh
        active = lo < hi
        mid = (lo + hi) // 2  # < hi <= cnt keeps start + mid in-slice
        off = pi[jnp.minimum(start + mid, nmax)] - base
        gt = off - mid > x
        hi = jnp.where(active & gt, mid, hi)
        lo = jnp.where(active & ~gt, mid + 1, lo)
        return lo, hi

    lo, _ = lax.fori_loop(0, steps, body, (lo, hi))
    return jnp.where(navail > 0, base + x + lo, fallback)


def sample_negatives_device(key, users, pu, pi, num_items: int):
    """Device-side exact negative sampling over the whole catalog
    (VERDICT round 2, directive #8) — per-epoch host work is O(1).
    One complement draw per slot (see :func:`complement_draw`): exact by
    construction, where the earlier rejection loop left a density**rounds
    residual and cost ~20x the gather traffic. The RNG stream is
    jax.random, so triples differ from the NumPy path but are
    bitwise-reproducible for a given (key, shape)."""
    import jax.numpy as jnp

    zeros = jnp.zeros_like(users)
    start = lowerbound_2key(pu, pi, users, zeros)
    end = lowerbound_2key(pu, pi, users, zeros + num_items)
    cnt = end - start
    nmax = pi.shape[0] - 1
    # navail == 0 means the user rated the ENTIRE catalog; no negative
    # exists — fall back to one of their positives (loss-neutral pair)
    fallback = pi[jnp.minimum(start, nmax)]
    return complement_draw(
        key, pi, start, cnt, num_items - cnt, zeros, fallback
    )


def split_cdf_f32(cdf: np.ndarray):
    """Double-single device representation of a float64 CDF: (hi, lo)
    float32 pairs with ``hi + lo == cdf`` to ~2^-48. A plain f32 cast
    quantizes long-tail items to ZERO draw probability at configs[4]
    scale (a count-1 item's mass ~1e-8 is below f32 ulp near 1.0, so
    adjacent CDF entries collapse and searchsorted can never return
    them); the pair keeps every item reachable with its true mass.
    Compare lexicographically — the pairs are normalized (|lo| <=
    ulp(hi)/2) and monotone because the f64 source is."""
    import jax.numpy as jnp

    hi = cdf.astype(np.float32)
    lo = (cdf - hi.astype(np.float64)).astype(np.float32)
    return jnp.asarray(hi), jnp.asarray(lo)


def _upperbound_cdf2(hi, lo, q_hi, q_lo):
    """First index with (hi, lo) > (q_hi, q_lo) lexicographically — the
    side='right' searchsorted over the double-single CDF, as a
    fixed-depth binary search (32 steps cover any int32 length)."""
    import jax.numpy as jnp
    from jax import lax

    n = hi.shape[0]
    lo_i = jnp.zeros(q_hi.shape, jnp.int32)
    hi_i = jnp.full(q_hi.shape, n, jnp.int32)

    def body(_, lh):
        lo_i, hi_i = lh
        active = lo_i < hi_i
        mid = jnp.minimum((lo_i + hi_i) // 2, n - 1)
        mh = hi[mid]
        ml = lo[mid]
        le = (mh < q_hi) | ((mh == q_hi) & (ml <= q_lo))
        lo_i = jnp.where(active & le, mid + 1, lo_i)
        hi_i = jnp.where(active & ~le, mid, hi_i)
        return lo_i, hi_i

    lo_i, _ = lax.fori_loop(0, 32, body, (lo_i, hi_i))
    return lo_i


def sample_negatives_weighted_device(
    key, users, pu, pi, cdf, fallback=None, rounds: int = 16
):
    """Device-side popularity-weighted negatives: inverse-CDF draws from
    ``cdf`` (a :func:`split_cdf_f32` (hi, lo) pair, or a plain device
    array for small catalogs), with ``rounds``
    fixed redraw rounds rejecting the user's observed positives
    (:func:`members_2key`). Unlike the uniform :func:`complement_draw`
    the weighted measure has no order-statistic shortcut, so rejection
    leaves a residual: per slot it is (the user's share of the sampling
    MASS)**(rounds+1) — popularity weighting concentrates mass on head
    items, so a power user holding e.g. half the weighted mass retains
    ~2^-17 residual, NOT the uniform-density bound. Slots still
    colliding after the last round therefore return ``fallback``
    (callers pass the slot's positive item, making the triple a
    zero-gradient no-op exactly like :func:`complement_draw`'s
    catalog-exhausted fallback) instead of leaking an observed positive
    as a "negative". All ops are jit-friendly; the stream is
    bitwise-reproducible per (key, shape)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    if isinstance(cdf, (tuple, list)):
        c_hi, c_lo = cdf
    else:
        c_hi, c_lo = jnp.asarray(cdf, jnp.float32), None

    def draw(k):
        u = jax.random.uniform(k, users.shape, dtype=jnp.float32)
        if c_lo is None:
            return jnp.searchsorted(c_hi, u, side="right").astype(jnp.int32)
        # refine the query below f32 ulp so sub-ulp CDF gaps stay
        # reachable in proportion to their (hi, lo) mass
        u2 = jax.random.uniform(jax.random.fold_in(k, 0x10), users.shape,
                                dtype=jnp.float32)
        return _upperbound_cdf2(c_hi, c_lo, u, (u2 - 0.5) * 2.0**-24)

    neg = draw(jax.random.fold_in(key, 0))

    def body(r, neg):
        coll = members_2key(pu, pi, users, neg)
        fresh = draw(jax.random.fold_in(key, 1 + r))
        return jnp.where(coll, fresh, neg)

    neg = lax.fori_loop(0, rounds, body, neg)
    if fallback is not None:
        neg = jnp.where(members_2key(pu, pi, users, neg), fallback, neg)
    return neg


def bpr_epoch_triples(
    coo: RatingsCOO,
    seed: int,
    epoch: int,
    perm: np.ndarray | None = None,
    pos_keys: np.ndarray | None = None,
    cdf: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(users, pos_items, neg_items) for one epoch, in permuted order.
    Pass ``pos_keys`` (from :func:`build_positive_index`) for exact
    negatives and ``cdf`` (from :func:`popularity_cdf`) for
    popularity-weighted ones."""
    neg = sample_negatives(
        coo.n_ratings, coo.num_items, seed, epoch,
        users=coo.user if pos_keys is not None else None,
        pos_keys=pos_keys,
        cdf=cdf,
    )
    if cdf is not None and pos_keys is not None:
        # weighted rejection has a user-mass residual (see
        # MAX_REJECTION_ROUNDS); make any survivor a zero-gradient pair
        ukeys = coo.user.astype(np.int64) * coo.num_items
        neg = np.where(_members(pos_keys, ukeys + neg), coo.item, neg)
    if perm is None:
        return coo.user, coo.item, neg
    return coo.user[perm], coo.item[perm], neg[perm]
