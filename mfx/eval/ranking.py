"""Sampled top-K ranking metrics — HR@K and NDCG@K (implicit feedback).

Standard sampled evaluation protocol (NCF-style): each held-out positive
is ranked against ``n_neg`` sampled negatives drawn from the catalog —
uniformly by default, or popularity-weighted when a ``cdf`` is passed —
and rejection-filtered against the user's FULL observed positive set
(train ∪ test via ``pos_keys``), so a "negative" is never actually a
positive. HR@K is the fraction of positives ranked in the top K of their
1 + n_neg candidate list; NDCG@K credits 1/log2(rank + 1); MRR@K credits
1/rank (with a single positive per list this equals MAP@K, and HR@K
equals Recall@K — the sampled protocol's full metric set).

TPU-native shape: evaluation streams fixed-size jitted chunks of
``(chunk, 1 + n_neg)`` score gathers — one batched gather + dot per chunk,
bounded device memory, a single compiled shape regardless of test-set
size. Extends SURVEY.md §2.2 E1 (the reference snapshot ships no code —
/root/reference/README.md:1-2; protocol per BASELINE.json configs[4]'s
implicit-feedback track).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from mfx.data.bpr import build_positive_index, sample_negatives

__all__ = ["hr_ndcg_at_k"]


@functools.partial(jax.jit, static_argnames=("k",))
def _rank_chunk(model, users, pos, negs, weights, k):
    """(hits@k, ndcg@k, count) for one padded chunk.

    negs: (chunk, n_neg) int32. rank = 1 + #negatives scoring STRICTLY
    higher than the positive (+ half-credit on exact ties, matching
    sampled_auc's tie handling).
    """
    pu = jnp.take(model.P, users, axis=0, mode="clip")  # (B, r)
    s_pos = (
        jnp.sum(pu * jnp.take(model.Q, pos, axis=0, mode="clip"), axis=-1)
        + jnp.take(model.bi, pos, mode="clip")
    )
    qn = jnp.take(model.Q, negs.reshape(-1), axis=0, mode="clip")
    qn = qn.reshape(*negs.shape, -1)  # (B, n_neg, r)
    s_neg = (
        jnp.einsum("br,bnr->bn", pu, qn)
        + jnp.take(model.bi, negs, mode="clip")
    )
    # bu/mu are constant within a row: rank-invariant, omitted.
    better = jnp.sum(
        (s_neg > s_pos[:, None]).astype(jnp.float32)
        + 0.5 * (s_neg == s_pos[:, None]).astype(jnp.float32),
        axis=-1,
    )
    rank = 1.0 + better
    hit = (rank <= k).astype(jnp.float32) * weights
    ndcg = jnp.where(rank <= k, 1.0 / jnp.log2(rank + 1.0), 0.0) * weights
    mrr = jnp.where(rank <= k, 1.0 / rank, 0.0) * weights
    return jnp.sum(hit), jnp.sum(ndcg), jnp.sum(mrr), jnp.sum(weights)


def hr_ndcg_at_k(
    model,
    test,
    k: int = 10,
    n_neg: int = 100,
    seed: int = 0,
    chunk: int = 1 << 16,
    pos_keys: np.ndarray | None = None,
    cdf: np.ndarray | None = None,
) -> dict:
    """{'hr': HR@K, 'ndcg': NDCG@K, 'mrr': MRR@K} of ``model`` on a
    held-out split (HR = Recall and MRR = MAP under the one-positive-
    per-list sampled protocol).

    ``pos_keys``: sorted ``u * num_items + i`` keys of ALL observed
    positives (train ∪ test — build with
    ``mfx.data.bpr.build_positive_index``). When omitted, only the eval
    split's own positives filter the negative draws; pass the full index
    for the unbiased protocol.

    ``cdf`` (from ``mfx.data.bpr.popularity_cdf``): draw the negative
    candidates popularity-weighted instead of uniform — the harder
    variant of the sampled protocol (popular unseen items are the
    negatives a production ranker actually competes against).
    """
    n = test.n_ratings
    if n == 0:
        return {"hr": 0.0, "ndcg": 0.0, "mrr": 0.0}
    if pos_keys is None:
        pos_keys = build_positive_index(test)
    # n_neg independent exact draws; distinct eval-only streams per column
    negs = np.stack(
        [
            sample_negatives(
                n, test.num_items, seed, epoch=0xC0DE00 + j,
                users=test.user, pos_keys=pos_keys, cdf=cdf,
            )
            for j in range(n_neg)
        ],
        axis=1,
    )
    chunk = min(chunk, max(1024, n))
    hits = ndcg = mrr = cnt = 0.0
    u = np.zeros(chunk, np.int32)
    p = np.zeros(chunk, np.int32)
    q = np.zeros((chunk, n_neg), np.int32)
    w = np.zeros(chunk, np.float32)
    for start in range(0, n, chunk):
        stop = min(start + chunk, n)
        m = stop - start
        u[:m] = test.user[start:stop]
        p[:m] = test.item[start:stop]
        q[:m] = negs[start:stop]
        w[:] = 0.0
        w[:m] = 1.0
        h, g, r, c = _rank_chunk(model, u, p, q, w, k)
        hits += float(h)
        ndcg += float(g)
        mrr += float(r)
        cnt += float(c)
    return {"hr": hits / cnt, "ndcg": ndcg / cnt, "mrr": mrr / cnt}
