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

__all__ = ["rmse_mae", "rmse"]


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
