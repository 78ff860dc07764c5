"""Held-out evaluation — SURVEY.md E1.

Streaming RMSE/MAE over a test split in fixed-size jitted chunks, so
arbitrarily large test sets evaluate in bounded device memory with a single
compiled shape. The quality gate (BASELINE.json north star) is
|RMSE - java_oracle_RMSE| <= 1e-3; see tests/parity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["rmse_mae", "rmse", "sampled_auc"]


@functools.partial(jax.jit, static_argnames=("clip",))
def _chunk_stats(model, users, items, ratings, weights, clip=None):
    pred = model.predict(users, items)
    if clip is not None:
        pred = jnp.clip(pred, clip[0], clip[1])
    err = (ratings - pred) * weights
    return jnp.sum(err * err), jnp.sum(jnp.abs(err)), jnp.sum(weights)


def rmse_mae(model, coo, chunk: int = 1 << 20, clip=None) -> tuple[float, float]:
    """(RMSE, MAE) of ``model`` on a host RatingsCOO split."""
    n = coo.n_ratings
    if n == 0:
        return 0.0, 0.0
    chunk = min(chunk, max(1024, n))
    sse = sae = cnt = 0.0
    u = np.zeros(chunk, np.int32)
    i = np.zeros(chunk, np.int32)
    r = np.zeros(chunk, np.float32)
    w = np.zeros(chunk, np.float32)
    for start in range(0, n, chunk):
        stop = min(start + chunk, n)
        m = stop - start
        u[:m] = coo.user[start:stop]
        i[:m] = coo.item[start:stop]
        r[:m] = coo.rating[start:stop]
        w[:] = 0.0
        w[:m] = 1.0
        s2, s1, c = _chunk_stats(model, u, i, r, w, clip=clip)
        sse += float(s2)
        sae += float(s1)
        cnt += float(c)
    return float(np.sqrt(sse / cnt)), float(sae / cnt)


def rmse(model, coo, **kw) -> float:
    return rmse_mae(model, coo, **kw)[0]


@jax.jit
def _auc_chunk(model, users, pos, neg, weights):
    pu = jnp.take(model.P, users, axis=0)
    s_pos = jnp.sum(pu * jnp.take(model.Q, pos, axis=0), axis=-1)
    s_neg = jnp.sum(pu * jnp.take(model.Q, neg, axis=0), axis=-1)
    wins = ((s_pos > s_neg) + 0.5 * (s_pos == s_neg)) * weights
    return jnp.sum(wins), jnp.sum(weights)


def sampled_auc(
    model, coo, seed: int = 0, chunk: int = 1 << 20,
    pos_keys: np.ndarray | None = None,
) -> float:
    """Implicit-feedback ranking quality: P(score(pos) > score(neg)) with
    one exact negative per held-out positive (uniform over the catalog,
    rejection-filtered against the positive set — plain uniform sampling
    would let negatives collide with positives and understate AUC).

    ``pos_keys``: sorted ``u * num_items + i`` keys of ALL observed
    positives (train ∪ test; see mfx.data.bpr.build_positive_index). When
    omitted, the eval split's own positives are used — pass the full
    index for an unbiased estimate (the driver does)."""
    from mfx.data.bpr import build_positive_index, sample_negatives

    n = coo.n_ratings
    if n == 0:
        return 0.5
    if pos_keys is None:
        pos_keys = build_positive_index(coo)
    neg = sample_negatives(
        n, coo.num_items, seed, epoch=0xE7A1,  # eval-only stream
        users=coo.user, pos_keys=pos_keys,
    )
    chunk = min(chunk, max(1024, n))
    wins = cnt = 0.0
    u = np.zeros(chunk, np.int32)
    p = np.zeros(chunk, np.int32)
    q = np.zeros(chunk, np.int32)
    w = np.zeros(chunk, np.float32)
    for start in range(0, n, chunk):
        stop = min(start + chunk, n)
        m = stop - start
        u[:m] = coo.user[start:stop]
        p[:m] = coo.item[start:stop]
        q[:m] = neg[start:stop]
        w[:] = 0.0
        w[:m] = 1.0
        a, c = _auc_chunk(model, u, p, q, w)
        wins += float(a)
        cnt += float(c)
    return wins / cnt
