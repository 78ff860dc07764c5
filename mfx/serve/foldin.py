"""Fold-in: factors for NEW users (or items) from their ratings, without
retraining — the standard cold-start serving path for an MF deployment.

A new user's factor row is the regularized least-squares solve against
the FROZEN item table — exactly one ALS half-step for that row
(mfx/solvers/als.py):

    p_u = (Q_Ω^T Q_Ω + λ·|Ω|·I)^{-1} Q_Ω^T (r - mu - bi_Ω)

with the bias folded in as an augmented coordinate (q̃ = [q, 1]) when the
model is biased, and the same per-occurrence weighted regularizer the
training objective uses (λ·degree — see _solve_gram's note). Because the
item table is frozen, the solve is embarrassingly batched: the whole
fold-in batch is two einsums (MXU) plus one batched Cholesky.

The reference snapshot ships no code (/root/reference/README.md:1-2);
fold-in is the canonical deployment companion to mfx/serve/topk.py: fold
a session's ratings into a factor row, then recommend with the shared
TopKRecommender machinery.

TPU shapes: ragged per-user histories are padded to a static (B, D)
window (D = next pow2 of the longest history, bounded by ``max_deg``);
pad slots carry item id == num_items and weight 0, so the jitted solve
retraces only on the (B, D) bucket, not per request.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from mfx.models.mf import MFModel

__all__ = ["fold_in", "fold_in_batch", "fold_in_implicit", "recommend_cold"]

from mfx.solvers.als import _pow2_at_least  # shared pow2 bucket helper


@functools.partial(jax.jit, static_argnames=("use_bias", "transpose"))
def _fold_in_solve(model, items, ratings, lengths, reg, *, use_bias,
                   transpose):
    """items/ratings: (B, D) padded; lengths: (B,). Returns (F, b) new
    rows. ``transpose=True`` folds in new ITEMS against the user table."""
    F = model.P if transpose else model.Q
    bias = model.bu if transpose else model.bi
    k = F.shape[1]
    f = F.dtype
    D = items.shape[1]
    lane = jnp.arange(D, dtype=jnp.int32)
    mask = (lane[None, :] < lengths[:, None]).astype(f)  # (B, D)
    q = jnp.take(F, items, axis=0, mode="clip")  # (B, D, k)
    resid = ratings - model.mu - jnp.take(bias, items, mode="clip")
    if use_bias:
        q = jnp.concatenate([q, jnp.ones(q.shape[:2] + (1,), f)], axis=2)
    qm = q * mask[:, :, None]
    A = jnp.einsum("bmd,bme->bde", qm, qm, preferred_element_type=f)
    b = jnp.einsum("bm,bmd->bd", resid * mask, qm,
                   preferred_element_type=f)
    # weighted regularization λ·degree: the stationary point of the
    # trained per-occurrence objective (mfx/solvers/als.py _solve_gram)
    deg = jnp.sum(mask, axis=1)
    d = A.shape[-1]
    lam = reg * jnp.maximum(deg, 1.0)
    A = A + lam[:, None, None] * jnp.eye(d, dtype=f)
    sol = jax.scipy.linalg.cho_solve(
        (jax.scipy.linalg.cholesky(A, lower=True), True), b[..., None]
    )[..., 0]
    sol = jnp.where(deg[:, None] > 0, sol, 0.0)
    if use_bias:
        return sol[:, :k], sol[:, k]
    return sol, jnp.zeros(sol.shape[0], f)


def fold_in_batch(
    model: MFModel,
    items: np.ndarray,  # (B, D) int padded with any out-of-range id
    ratings: np.ndarray,  # (B, D) float
    lengths: np.ndarray,  # (B,) valid prefix per row
    reg: float,
    *,
    use_bias: bool = True,
    transpose: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Pre-padded variant (static shapes supplied by the caller)."""
    return _fold_in_solve(
        model,
        jnp.asarray(items, jnp.int32),
        jnp.asarray(ratings, jnp.float32),
        jnp.asarray(lengths, jnp.int32),
        jnp.asarray(reg, jnp.float32),
        use_bias=use_bias,
        transpose=transpose,
    )


@jax.jit
def _fold_in_implicit_solve(Q, G, items, vals, lengths, alpha, reg):
    k = Q.shape[1]
    f = Q.dtype
    D = items.shape[1]
    lane = jnp.arange(D, dtype=jnp.int32)
    mask = (lane[None, :] < lengths[:, None]).astype(f)  # (B, D)
    y = jnp.take(Q, items, axis=0, mode="clip")  # (B, D, k)
    w = alpha * vals * mask  # confidence − 1
    yw = y * jnp.sqrt(w)[:, :, None]
    A = G[None] + jnp.einsum("bmd,bme->bde", yw, yw,
                             preferred_element_type=f)
    b = jnp.einsum("bm,bmd->bd", (1.0 + w) * mask, y * mask[:, :, None],
                   preferred_element_type=f)
    A = A + reg * jnp.eye(k, dtype=f)
    sol = jax.scipy.linalg.cho_solve(
        (jax.scipy.linalg.cholesky(A, lower=True), True), b[..., None]
    )[..., 0]
    deg = jnp.sum(mask, axis=1)
    return jnp.where(deg[:, None] > 0, sol, 0.0)


def fold_in_implicit(
    model: MFModel,
    histories: list[tuple[np.ndarray, np.ndarray]],  # [(item_ids, strengths)]
    alpha: float,
    reg: float,
    *,
    transpose: bool = False,
    max_deg: int = 4096,
    gram: jax.Array | None = None,
) -> jax.Array:
    """Implicit-feedback fold-in: one iALS half-step for new rows against
    the frozen table (mfx/solvers/ials.py objective —
    x = (QᵀQ + Σ α·r·y yᵀ + λI)⁻¹ Σ (1+α·r) y). Returns the (B, k) factor
    rows. ``gram`` lets a serving process pass a precomputed QᵀQ instead
    of paying a catalog pass per call."""
    B = len(histories)
    if B == 0:
        raise ValueError("fold_in_implicit needs at least one history")
    F = model.P if transpose else model.Q
    n = F.shape[0]
    lens = np.array(
        [min(len(ids), max_deg) for ids, _ in histories], np.int32
    )
    D = _pow2_at_least(int(lens.max()) if B else 1, lo=8)
    items = np.full((B, D), n, np.int32)  # pad: out-of-range id
    vals = np.zeros((B, D), np.float32)
    for b, (ids, r) in enumerate(histories):
        items[b, : lens[b]] = np.asarray(ids)[-max_deg:]
        vals[b, : lens[b]] = np.asarray(r)[-max_deg:]
    if gram is None:
        gram = jnp.dot(F.T, F, preferred_element_type=F.dtype)
    return _fold_in_implicit_solve(
        F, gram, jnp.asarray(items), jnp.asarray(vals), jnp.asarray(lens),
        jnp.asarray(alpha, F.dtype), jnp.asarray(reg, F.dtype),
    )


def fold_in(
    model: MFModel,
    histories: list[tuple[np.ndarray, np.ndarray]],  # [(item_ids, ratings)]
    reg: float,
    *,
    use_bias: bool = True,
    transpose: bool = False,
    max_deg: int = 4096,
) -> tuple[jax.Array, jax.Array]:
    """Fold a batch of new-user histories into factor rows.

    Returns ``(P_new, bu_new)`` with ``P_new[b]`` the solved factor row
    for ``histories[b]`` (or ``(Q_new, bi_new)`` with ``transpose=True``).
    Histories longer than ``max_deg`` keep their ``max_deg`` most recent
    (last) entries. Empty histories get zero factors (score = mu + bi,
    the popularity baseline).
    """
    B = len(histories)
    if B == 0:
        raise ValueError("fold_in needs at least one history")
    n = model.num_users if transpose else model.num_items
    lens = np.array(
        [min(len(ids), max_deg) for ids, _ in histories], np.int32
    )
    D = _pow2_at_least(int(lens.max()) if B else 1, lo=8)
    items = np.full((B, D), n, np.int32)  # pad: out-of-range id
    vals = np.zeros((B, D), np.float32)
    for b, (ids, r) in enumerate(histories):
        ids = np.asarray(ids)[-max_deg:]
        r = np.asarray(r)[-max_deg:]
        items[b, : lens[b]] = ids
        vals[b, : lens[b]] = r
    return fold_in_batch(
        model, items, vals, lens, reg,
        use_bias=use_bias, transpose=transpose,
    )


def recommend_cold(
    model: MFModel,
    histories: list[tuple[np.ndarray, np.ndarray]],
    k: int = 10,
    reg: float = 0.05,
    *,
    use_bias: bool = True,
    exclude_history: bool = True,
) -> tuple[np.ndarray, np.ndarray]:
    """Cold-start top-K: fold each new-user history into a factor row
    (``fold_in`` — the training objective's stationary point against the
    frozen tables) and serve it through the SAME jitted scorer as
    :class:`mfx.serve.TopKRecommender` (one MXU matmul over the catalog,
    the history's own items excluded). The anonymous-session /
    new-account serving path: no table mutation, no retrain.

    Returns (items (B, k) int32, scores (B, k) f32)."""
    from mfx.serve.topk import _topk_batch

    if k < 1 or k > model.num_items:
        raise ValueError(f"k must be in [1, {model.num_items}], got {k}")
    for ids, _ in histories:
        ids = np.asarray(ids)
        if ids.size and (
            (ids < 0).any() or (ids >= model.num_items).any()
        ):
            raise ValueError("history item id out of range")
    P_new, bu_new = fold_in(model, histories, reg, use_bias=use_bias)
    B = len(histories)
    tmp = MFModel(
        P=P_new, Q=jnp.asarray(model.Q),
        bu=bu_new, bi=jnp.asarray(model.bi), mu=jnp.asarray(model.mu),
    )
    # score in fixed-bucket user chunks like TopKRecommender.recommend:
    # the (chunk, num_items) block is capped at ~1 GB (an uncapped
    # (B, catalog) dispatch can OOM — and on this backend an on-device
    # OOM poisons the process), and pow-2 bucketing bounds retraces
    # under varying request sizes
    bsz = max(1, min(256, (1 << 28) // max(1, model.num_items)))
    bsz = min(bsz, _pow2_at_least(B, lo=8))
    out_i = np.empty((B, k), np.int32)
    out_s = np.empty((B, k), np.float32)
    for start in range(0, B, bsz):
        stop = min(start + bsz, B)
        ub = np.minimum(
            np.arange(start, start + bsz, dtype=np.int32), B - 1
        )  # pad rows repeat the last user; their outputs are discarded
        if exclude_history:
            chunk = histories[start:stop]
            total = sum(len(ids) for ids, _ in chunk)
            cap = _pow2_at_least(max(total, 1), lo=8)
            rows = np.full(cap, bsz, np.int32)  # out-of-range sentinel
            excl = np.zeros(cap, np.int32)
            pos = 0
            for b, (ids, _) in enumerate(chunk):
                c = len(ids)
                rows[pos:pos + c] = b
                excl[pos:pos + c] = np.asarray(ids, np.int32)
                pos += c
        else:
            rows = np.full(8, bsz, np.int32)
            excl = np.zeros(8, np.int32)
        s, i = _topk_batch(
            tmp, jnp.asarray(ub), jnp.asarray(rows), jnp.asarray(excl), k,
        )
        out_i[start:stop] = np.asarray(i)[: stop - start]
        out_s[start:stop] = np.asarray(s)[: stop - start]
    return out_i, out_s
