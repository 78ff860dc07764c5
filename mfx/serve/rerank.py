"""Diversity re-ranking of served top-K lists — greedy maximal
marginal relevance (MMR, Carbonell & Goldstein 1998) over the factor
space. The reference snapshot ships no serving code
(/root/reference/README.md:1-2); this is the standard production knob
between "most accurate list" and "non-redundant list".

MMR picks the next slot greedily:

    argmax_j  lam * rel(j)  -  (1 - lam) * max_{s in selected} cos(q_j, q_s)

with ``rel`` the recommender's score min-max-normalized per user over
the candidate pool, and item similarity the factor cosine (exactly what
``similar_items`` serves). ``lam=1`` reproduces the accuracy ranking;
lower values trade headroom for spread.

TPU shape: the whole user batch re-ranks in ONE jitted program —
candidate vectors gather once into a (B, C, r) block, then ``k`` fori
steps of a batched einsum + masked argmax (no per-user loops, no
data-dependent shapes). Cost is ~k · B·C·r MACs — microseconds next to
the catalog-scoring pass that produced the pool.

Use: over-fetch a pool (C = 3-5×k), then re-rank:

    items, scores = rec.recommend(users, k=50)
    items, scores = rerank_mmr(model, items, scores, k=10, lam=0.7)

Or wrap any recommender with :class:`MMRRecommender` (what
``cli serve --mmr`` does) so the HTTP endpoint serves diversified
lists transparently.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["rerank_mmr", "MMRRecommender"]


@functools.partial(jax.jit, static_argnames=("k",))
def _mmr_batch(V, rel, valid, k: int, lam):
    """V: (B, C, r) candidate factor vectors; rel: (B, C) relevance in
    [0, 1]; valid: (B, C) bool. Returns (B, k) int32 indices INTO the
    candidate axis, in selection order."""
    f = V.dtype
    n = jnp.maximum(
        jnp.linalg.norm(V, axis=-1, keepdims=True), jnp.asarray(1e-12, f)
    )
    Vn = V / n
    B, C, _ = V.shape
    neg = jnp.asarray(-jnp.inf, f)

    def step(t, carry):
        maxsim, taken, out = carry
        util = lam * rel - (1.0 - lam) * maxsim
        util = jnp.where(valid & ~taken, util, neg)
        # a row whose finite candidates ran out (k > unseen pool) fills
        # from the remaining pool slots in order — the same -inf
        # overflow semantics as the stock recommender, never duplicates
        exhausted = ~jnp.any(valid & ~taken, axis=1)
        fallback = jnp.where(
            ~taken, -jnp.arange(C, dtype=f)[None, :], neg
        )
        util = jnp.where(exhausted[:, None], fallback, util)
        j = jnp.argmax(util, axis=1)  # (B,)
        out = out.at[:, t].set(j.astype(jnp.int32))
        taken = taken | (jnp.arange(C)[None, :] == j[:, None])
        vj = jnp.take_along_axis(Vn, j[:, None, None], axis=1)  # (B,1,r)
        sim = jnp.einsum("bcr,br->bc", Vn, vj[:, 0, :],
                         preferred_element_type=f)
        maxsim = jnp.maximum(maxsim, sim)
        return maxsim, taken, out

    maxsim0 = jnp.zeros((B, C), f)
    taken0 = jnp.zeros((B, C), bool)
    out0 = jnp.zeros((B, k), jnp.int32)
    _, _, out = jax.lax.fori_loop(0, k, step, (maxsim0, taken0, out0))
    return out


def rerank_mmr(model, items, scores, k: int, lam: float = 0.7):
    """Re-rank candidate pools ``(items, scores)`` — shape (B, C), as
    returned by any recommender with C >= k — into diversified (B, k)
    lists. Non-finite scores (exclusion overflow pads) are skipped.
    Returns (items (B, k) int32, scores (B, k) f32): each item's
    ORIGINAL relevance score, in MMR selection order."""
    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    items = np.asarray(items, np.int32)
    scores = np.asarray(scores, np.float32)
    if items.ndim != 2 or items.shape != scores.shape:
        raise ValueError("items/scores must be matching (B, C) arrays")
    B, C = items.shape
    if not 1 <= k <= C:
        raise ValueError(f"k must be in [1, {C}], got {k}")
    valid = np.isfinite(scores)
    if not valid.any(axis=1).all():
        raise ValueError("a row has no finite-scored candidates")
    # per-user min-max relevance over the pool (constant rows -> 1.0)
    fin = np.where(valid, scores, np.nan)
    lo = np.nanmin(fin, axis=1, keepdims=True)
    hi = np.nanmax(fin, axis=1, keepdims=True)
    rel = np.where(valid, (scores - lo) / np.maximum(hi - lo, 1e-12), 0.0)
    # pad B to a pow-2 bucket: behind the server's micro-batcher the
    # merged user count varies per dispatch, and an unpadded jit would
    # recompile (seconds) for every new B in the serving hot path
    Bp = max(8, 1 << int(np.ceil(np.log2(max(B, 1)))))
    if Bp != B:
        pad = [(0, Bp - B), (0, 0)]
        items_p = np.pad(items, pad, mode="edge")
        rel = np.pad(rel, pad, mode="edge")
        valid_p = np.pad(valid, pad, mode="edge")
    else:
        items_p, valid_p = items, valid
    Q = model.Q if hasattr(model, "Q") else model
    V = jnp.take(jnp.asarray(Q), jnp.asarray(items_p), axis=0, mode="clip")
    sel = np.asarray(_mmr_batch(
        V, jnp.asarray(rel, V.dtype), jnp.asarray(valid_p), k,
        jnp.asarray(lam, V.dtype),
    ))[:B]
    rows = np.arange(B)[:, None]
    return items[rows, sel], scores[rows, sel]


class MMRRecommender:
    """Wrap any recommender so its lists come back MMR-diversified:
    over-fetches a ``pool``×k candidate pool from the inner recommender
    and re-ranks in one jitted program. Drop-in for the HTTP endpoint
    (same ``recommend(users, k)``/``model`` surface)."""

    def __init__(self, inner, model=None, lam: float = 0.7,
                 pool: int = 4):
        if pool < 1:
            raise ValueError(f"pool must be >= 1, got {pool}")
        if not 0.0 <= lam <= 1.0:
            raise ValueError(f"lam must be in [0, 1], got {lam}")
        self._inner = inner
        self._model = model if model is not None else inner.model
        self.lam = float(lam)
        self.pool = int(pool)

    @property
    def model(self):
        return self._model

    def recommend(self, users, k: int = 10):
        # clamp the over-fetch to what the inner recommender CAN serve
        # (the fused paths are candidate-pool-limited via .max_k) — a
        # diversity wrapper must not turn valid k into a pool error
        cap = getattr(self._inner, "max_k", self._model.num_items)
        c = min(self.pool * k, self._model.num_items, cap)
        if k > c:
            raise ValueError(
                f"k={k} exceeds the inner recommender's pool ({cap})"
            )
        items, scores = self._inner.recommend(users, k=max(c, k))
        return rerank_mmr(self._model, items, scores, k, lam=self.lam)
