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
from mfx.data.coo import SeenCSR

__all__ = ["hr_ndcg_at_k", "full_hr_ndcg_at_k", "user_topk_metrics"]


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
    # on TPU, draw the candidates on device (exact complement draws per
    # chunk) — the host-side rejection loop is n_neg full passes on this
    # repo's documented 1-core throttled host (minutes at ML-25M scale);
    # the host path stays for CPU runs and for the popularity-cdf
    # protocol, and both streams are seeded/deterministic (they differ
    # from each other: numpy vs jax RNG)
    use_dev = cdf is None and jax.default_backend() == "tpu"
    if use_dev:
        from mfx.data.bpr import sample_negatives_device

        uq = np.unique(pos_keys)  # complement_draw needs strict keys
        pu = jnp.asarray((uq // test.num_items).astype(np.int32))
        pi = jnp.asarray((uq % test.num_items).astype(np.int32))
        base = jax.random.key(seed ^ 0xC0DE)
    else:
        # n_neg independent exact draws; distinct eval streams per column
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
        w[:] = 0.0
        w[:m] = 1.0
        if use_dev:
            qd = sample_negatives_device(
                jax.random.fold_in(base, start),
                jnp.tile(jnp.asarray(u), n_neg), pu, pi, test.num_items,
            ).reshape(n_neg, chunk).T
        else:
            q[:m] = negs[start:stop]
            qd = q
        h, g, r, c = _rank_chunk(model, u, p, qd, w, k)
        hits += float(h)
        ndcg += float(g)
        mrr += float(r)
        cnt += float(c)
    return {"hr": hits / cnt, "ndcg": ndcg / cnt, "mrr": mrr / cnt}


def user_topk_metrics(
    model,
    test,
    train=None,
    k: int = 10,
    batch: int = 256,
) -> dict:
    """Per-USER top-K quality of the model's actual recommendation lists
    — the multi-positive protocol (each user may hold several held-out
    items, e.g. from a uniform split): {'recall', 'precision', 'ndcg',
    'map'}@K, averaged over users with at least one test item.

    Definitions (standard): with T_u the user's distinct test items and
    L_u the served top-K list (train-seen excluded), recall = |hit|/|T_u|,
    precision = |hit|/K, NDCG uses binary gains with the ideal DCG at
    min(K, |T_u|), and MAP is average precision truncated at K.

    Beyond-accuracy axes of the same lists: 'coverage' (fraction of the
    catalog appearing in at least one list — degenerate popularity-only
    recommenders score near K/num_items) and, when ``train`` is given,
    'novelty' (mean self-information −log2 p(i) of recommended items
    under the train interaction distribution — higher = less obvious).

    Runs the SERVING path (mfx.serve.TopKRecommender — one MXU catalog
    matmul + top_k per user batch), so it measures exactly what
    production would return; host work is O(users · K · log n) membership
    searches. Complements :func:`hr_ndcg_at_k` /
    :func:`full_hr_ndcg_at_k`, which rank one positive per interaction.
    """
    from mfx.serve.topk import TopKRecommender

    if test.n_ratings == 0:
        return {"recall": 0.0, "precision": 0.0, "ndcg": 0.0, "map": 0.0}
    I = test.num_items
    # distinct (user, item) test pairs, user-grouped
    keys = np.unique(test.user.astype(np.int64) * I + test.item)
    users = np.unique((keys // I).astype(np.int32))
    counts = np.searchsorted(
        keys, (users.astype(np.int64) + 1) * I
    ) - np.searchsorted(keys, users.astype(np.int64) * I)

    rec = TopKRecommender(model, train=train, batch=batch)
    items, _ = rec.recommend(users, k=k)  # (n_users, k)

    hit = np.zeros(items.shape, bool)
    qk = users.astype(np.int64)[:, None] * I + items
    pos = np.searchsorted(keys, qk.reshape(-1))
    ok = pos < keys.shape[0]
    hit.reshape(-1)[ok] = keys[pos[ok]] == qk.reshape(-1)[ok]

    ranks = np.arange(1, k + 1, dtype=np.float64)
    disc = 1.0 / np.log2(ranks + 1.0)
    nhit = hit.sum(axis=1).astype(np.float64)
    recall = nhit / counts
    precision = nhit / k
    ideal = np.cumsum(disc)[np.minimum(counts, k) - 1]
    ndcg = (hit @ disc) / ideal
    # AP@K: mean over min(K, |T_u|) of precision@p at each hit position
    prec_at = np.cumsum(hit, axis=1) / ranks[None, :]
    ap = (prec_at * hit).sum(axis=1) / np.minimum(counts, k)
    out = {
        "recall": float(recall.mean()),
        "precision": float(precision.mean()),
        "ndcg": float(ndcg.mean()),
        "map": float(ap.mean()),
        "coverage": float(np.unique(items).size / I),
    }
    if train is not None and train.n_ratings:
        pop = np.bincount(train.item, minlength=I).astype(np.float64)
        p = np.maximum(pop, 1.0) / train.n_ratings  # floor: unseen items
        out["novelty"] = float(-np.log2(p[items]).mean())
    return out


@functools.partial(jax.jit, static_argnames=("k",))
def _full_rank_chunk(model, users, pos, excl_rows, excl_items, weights, k):
    """(hits@k, ndcg@k, mrr@k, count) for one padded chunk, ranking each
    positive against the ENTIRE catalog minus the user's train-seen items
    (scattered to -inf via the same padded (row, item) pairs the serving
    path uses). rank = 1 + #items scoring strictly higher (+ half-credit
    on exact ties, matching the sampled protocol's tie handling)."""
    pu = jnp.take(model.P, users, axis=0, mode="clip")  # (B, r)
    scores = pu @ model.Q.T + model.bi[None, :]  # (B, I)
    # bu/mu are constant within a row: rank-invariant, omitted.
    s_pos = jnp.take_along_axis(scores, pos[:, None], axis=1)[:, 0]
    scores = scores.at[excl_rows, excl_items].set(
        -jnp.inf, mode="drop"
    )
    # the positive itself is not its own competitor (it would otherwise
    # contribute a 0.5 self-tie)
    scores = scores.at[jnp.arange(users.shape[0]), pos].set(
        -jnp.inf, mode="drop"
    )
    better = jnp.sum(
        (scores > s_pos[:, None]).astype(jnp.float32)
        + 0.5 * (scores == s_pos[:, None]).astype(jnp.float32),
        axis=-1,
    )
    rank = 1.0 + better
    hit = (rank <= k).astype(jnp.float32) * weights
    ndcg = jnp.where(rank <= k, 1.0 / jnp.log2(rank + 1.0), 0.0) * weights
    mrr = jnp.where(rank <= k, 1.0 / rank, 0.0) * weights
    return jnp.sum(hit), jnp.sum(ndcg), jnp.sum(mrr), jnp.sum(weights)


def full_hr_ndcg_at_k(
    model,
    test,
    train=None,
    k: int = 10,
    chunk: int = 1 << 10,
) -> dict:
    """{'hr', 'ndcg', 'mrr'}@K of ``model`` on a held-out split, ranking
    each positive against the **full catalog** — the unsampled protocol
    (Krichene & Rendle 2020 showed sampled metrics can reorder models;
    this is the bias-free variant for final comparisons, at O(num_items)
    work per positive instead of O(n_neg)).

    ``train`` (optional RatingsCOO): interactions to EXCLUDE from the
    competitor set — the standard "train items are not candidates" rule
    (same exclusion machinery as serving). Other test positives of the
    same user remain competitors, per the standard protocol.

    TPU-native shape: one (chunk × rank)·(rank × num_items) MXU matmul
    per chunk plus a -inf exclusion scatter — no sort: the metric needs
    only the positive's rank, which is a vectorized comparison count.
    The score block is (chunk, num_items) f32 in HBM; ``chunk`` is
    auto-capped to keep it under ~1 GB on very large catalogs.
    """
    n = test.n_ratings
    if n == 0:
        return {"hr": 0.0, "ndcg": 0.0, "mrr": 0.0}
    if k < 1 or k > test.num_items:
        raise ValueError(
            f"k must be in [1, num_items={test.num_items}], got {k}"
        )
    seen = (
        train.seen_csr() if train is not None
        else SeenCSR.empty(test.num_users)
    )
    chunk = max(1, min(chunk, n, (1 << 28) // max(1, test.num_items)))
    hits = ndcg = mrr = cnt = 0.0
    u = np.zeros(chunk, np.int32)
    p = np.zeros(chunk, np.int32)
    w = np.zeros(chunk, np.float32)
    for start in range(0, n, chunk):
        stop = min(start + chunk, n)
        m = stop - start
        u[:m] = test.user[start:stop]
        p[:m] = test.item[start:stop]
        w[:] = 0.0
        w[:m] = 1.0
        rows, items = seen.batch(u[:m], pad_row=chunk)
        h, g, r, c = _full_rank_chunk(
            model, u, p, jnp.asarray(rows), jnp.asarray(items), w, k
        )
        hits += float(h)
        ndcg += float(g)
        mrr += float(r)
        cnt += float(c)
    return {"hr": hits / cnt, "ndcg": ndcg / cnt, "mrr": mrr / cnt}
