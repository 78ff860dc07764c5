"""Batched top-K recommendation serving — the deployment surface of the
factorizer (BASELINE.json north star trains the model; this serves it).

TPU-native design: a recommendation batch is ONE dense MXU matmul
``P[users] @ Qᵀ`` over the full catalog (rank-k × num_items — exactly the
shape the MXU wants), plus bias broadcast, followed by ``jax.lax.top_k``.
Seen-item exclusion is a single scatter of -inf at the batch's observed
(row, item) pairs: the per-user positives come from a host CSR built once
at construction, padded to power-of-2 buckets so the jitted program is
reused across batches (bounded retraces, static shapes throughout).

The reference snapshot ships no serving code (or any code —
/root/reference/README.md:1-2); this is the canonical MF deployment path.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from mfx.data.coo import SeenCSR

__all__ = ["TopKRecommender", "similar_items"]

_NEG_INF = float("-inf")


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class _Int8Tables:
    """Per-row symmetrically quantized serving tables: ``X ≈ X8 * scale``
    with ``scale = max|row| / 127`` — 4x less serving HBM than f32 (2x vs
    bf16) for both the table footprint and the per-request catalog-row
    stream, and the scoring matmul runs int8×int8→int32 on the MXU."""

    P8: jax.Array       # [U, r] int8
    pscale: jax.Array   # [U] f32
    Q8: jax.Array       # [I, r] int8
    qscale: jax.Array   # [I] f32
    bu: jax.Array
    bi: jax.Array
    mu: jax.Array

    @property
    def num_users(self) -> int:
        return self.P8.shape[0]

    @property
    def num_items(self) -> int:
        return self.Q8.shape[0]

    @property
    def rank(self) -> int:
        return self.P8.shape[-1]


def _quantize_rows(X) -> tuple[jax.Array, jax.Array]:
    """Row-wise symmetric int8: (X8, scale) with X ≈ X8 * scale[:, None]."""
    X = jnp.asarray(X, jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(X), axis=1), 1e-12) / 127.0
    X8 = jnp.clip(jnp.round(X / scale[:, None]), -127, 127).astype(jnp.int8)
    return X8, scale


@functools.partial(jax.jit, static_argnames=("k",))
def _similar_batch(Qn, query, k):
    scores = jnp.take(Qn, query, axis=0, mode="clip") @ Qn.T  # (B, I)
    # exclude the query item itself from its own neighbor list
    scores = scores.at[jnp.arange(query.shape[0]), query].set(
        _NEG_INF, mode="drop"
    )
    return jax.lax.top_k(scores, k)


def similar_items(model, items, k: int = 10, batch: int = 256):
    """Top-``k`` most similar items per query item by factor cosine —
    the standard MF "related items" endpoint (item-item neighbors in the
    learned latent space; biases deliberately excluded so similarity is
    taste-direction, not popularity). One MXU matmul per batch over the
    row-normalized item table; the query item is excluded from its own
    list. Returns (items (n, k) int32, cosines (n, k) f32).

    Each dispatch materializes a (batch, num_items) f32 score block in
    HBM — like :class:`TopKRecommender`, size ``batch`` for the catalog
    (256 × 10M items ≈ 10 GB; the batch size is auto-capped to keep the
    block under ~1 GB on very large catalogs)."""
    items = np.asarray(items, np.int32).reshape(-1)
    num_items = model.num_items
    # cap the score block at ~1 GB so configs[4]-class catalogs don't
    # RESOURCE_EXHAUST the chip with the default batch
    batch = max(1, min(batch, (1 << 28) // max(1, num_items)))
    if k < 1 or k > num_items - 1:
        raise ValueError(
            f"k must be in [1, num_items-1={num_items - 1}], got {k}"
        )
    if np.any((items < 0) | (items >= num_items)):
        raise ValueError("item id out of range")
    norm = jnp.linalg.norm(model.Q, axis=1, keepdims=True)
    Qn = model.Q / jnp.maximum(norm, 1e-12)
    n = items.shape[0]
    out_i = np.empty((n, k), np.int32)
    out_s = np.empty((n, k), np.float32)
    for start in range(0, n, batch):
        stop = min(start + batch, n)
        qb = np.zeros(batch, np.int32)
        qb[: stop - start] = items[start:stop]
        s, i = _similar_batch(Qn, jnp.asarray(qb), k)
        out_i[start:stop] = np.asarray(i)[: stop - start]
        out_s[start:stop] = np.asarray(s)[: stop - start]
    return out_i, out_s


def _select_k(scores, k: int, recall_target: float | None):
    """Exact ``lax.top_k``, or TPU's partial-reduce ``approx_max_k`` when
    a recall target is set (aggregate_to_topk keeps the output exactly
    sorted over the approximate candidate set; non-TPU backends lower it
    to the exact op)."""
    if recall_target is None:
        return jax.lax.top_k(scores, k)
    return jax.lax.approx_max_k(scores, k, recall_target=recall_target)


@functools.partial(jax.jit, static_argnames=("k", "recall_target"))
def _topk_batch_int8(tabs: _Int8Tables, users, excl_rows, excl_items, k,
                     recall_target=None):
    pu8 = jnp.take(tabs.P8, users, axis=0, mode="clip")  # (B, r) int8
    ps = jnp.take(tabs.pscale, users, mode="clip")  # (B,)
    # int8×int8 → int32 on the MXU; only then scale back to f32 — the
    # full-catalog stream is the int8 table, a quarter of f32's bytes
    raw = jnp.matmul(pu8, tabs.Q8.T, preferred_element_type=jnp.int32)
    scores = (
        raw.astype(jnp.float32) * ps[:, None] * tabs.qscale[None, :]
        + tabs.bi[None, :]
        + jnp.take(tabs.bu, users, mode="clip")[:, None]
        + tabs.mu
    )
    scores = scores.at[excl_rows, excl_items].set(_NEG_INF, mode="drop")
    return _select_k(scores, k, recall_target)


@functools.partial(jax.jit, static_argnames=("k", "recall_target"))
def _topk_batch(model, users, excl_rows, excl_items, k, recall_target=None):
    pu = jnp.take(model.P, users, axis=0, mode="clip")  # (B, r)
    # preferred_element_type: f32 MXU accumulation even when the factor
    # tables are stored bf16 (table_dtype='bf16'); no-op for f32 tables.
    # precision HIGHEST: XLA's DEFAULT rounds f32 matmul INPUTS to bf16
    # on TPU (~1e-3 relative score error) — the exact path should be
    # exact over true f32 scores, and the dispatch is score-block-bound
    # so the extra MXU passes are latency-free (chip-measured ~147 ms at
    # every table dtype). The Pallas fused kernel scores in true f32
    # already; this keeps the two exact paths bitwise-comparable.
    scores = (
        jnp.matmul(pu, model.Q.T, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
        + model.bi[None, :]
        + jnp.take(model.bu, users, mode="clip")[:, None]
        + model.mu
    )
    # pad slots carry excl_rows == B (out of range): dropped by the
    # default out-of-bounds scatter semantics under jit
    # duplicate (row, item) pairs are possible (raw COO may repeat a
    # rating); scatter-set to a constant is insensitive to them
    scores = scores.at[excl_rows, excl_items].set(_NEG_INF, mode="drop")
    return _select_k(scores, k, recall_target)


class TopKRecommender:
    """Serve top-K recommendations from a trained :class:`MFModel`.

    >>> rec = TopKRecommender(result.model, train=train_coo)
    >>> items, scores = rec.recommend([3, 17, 940], k=10)

    ``train`` (optional RatingsCOO): interactions to EXCLUDE from results
    (the standard "don't recommend what the user already rated"). Users
    absent from ``train`` simply get unfiltered top-K.

    ``batch``: users per device dispatch. Each dispatch scores the full
    catalog — (batch, num_items) f32 in HBM; 256 × 1M items ≈ 1 GB, size
    accordingly for very large catalogs.

    ``table_dtype``: 'f32' (default), 'bf16', or 'int8'. 'bf16' stores
    the factor tables in bfloat16, halving serving HBM footprint AND the
    per-request catalog-row stream (the serving matmul is HBM-bound on
    big catalogs); scores still accumulate in f32 on the MXU and biases
    stay f32, so only the factor product quantizes (~3 decimal digits).
    'int8' quantizes each factor row symmetrically to int8 with a
    per-row f32 scale (4x less than f32, 2x less than bf16; the scoring
    matmul runs int8×int8→int32 natively on the MXU) — ~0.5% relative
    score error; near-tie orderings inside the top-K can differ from f32
    serving in either mode, and the error-bound contract is pinned by
    tests (every served item's true score within tolerance of the f32
    serving's kth-best).

    ``recall_target``: None (default) serves the exact top-K via
    ``lax.top_k``; a float in (0, 1] switches to TPU's partial-reduce
    ``jax.lax.approx_max_k`` with that per-item recall guarantee — the
    hardware-accelerated MIPS path for very large catalogs, where the
    exact full-sort reduction dominates the scoring matmul. Non-TPU
    backends lower it to the exact op.
    """

    def __init__(
        self, model, train=None, batch: int = 256, table_dtype: str = "f32",
        recall_target: float | None = None,
    ):
        if batch < 1:
            raise ValueError(f"batch must be >= 1, got {batch}")
        if table_dtype not in ("f32", "bf16", "int8"):
            raise ValueError(
                "table_dtype must be 'f32', 'bf16' or 'int8', got "
                f"{table_dtype!r}"
            )
        if recall_target is not None and not 0.0 < recall_target <= 1.0:
            raise ValueError(
                f"recall_target must be in (0, 1], got {recall_target}"
            )
        self.recall_target = recall_target
        self.table_dtype = table_dtype
        if table_dtype != "f32":
            model = self._quantize_tables(model)
        self.model = model
        self.batch = batch
        self._seen = (
            train.seen_csr() if train is not None
            else SeenCSR.empty(model.num_users)
        )

    def _quantize_tables(self, model):
        """Quantize the tables this recommender actually streams (bf16
        cast, or per-row int8 + scales). Hook: the sharded variant
        quantizes its own padded Q copy instead."""
        if self.table_dtype == "int8":
            P8, ps = _quantize_rows(model.P)
            Q8, qs = _quantize_rows(model.Q)
            return _Int8Tables(
                P8=P8, pscale=ps, Q8=Q8, qscale=qs,
                bu=jnp.asarray(model.bu, jnp.float32),
                bi=jnp.asarray(model.bi, jnp.float32),
                mu=jnp.asarray(model.mu, jnp.float32),
            )
        return dataclasses.replace(
            model,
            P=jnp.asarray(model.P, jnp.bfloat16),
            Q=jnp.asarray(model.Q, jnp.bfloat16),
        )

    def _exclusions(self, users: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(rows, items) of the batch's seen pairs, padded to a pow-2
        bucket; pad slots use the out-of-range row sentinel ``batch``."""
        return self._seen.batch(users, pad_row=self.batch)

    def _validate(self, users: np.ndarray, k: int) -> None:
        if k < 1 or k > self.model.num_items:
            raise ValueError(
                f"k must be in [1, num_items={self.model.num_items}], got {k}"
            )
        if np.any((users < 0) | (users >= self.model.num_users)):
            raise ValueError("user id out of range")

    def _score_batch(self, ub, rows, items, k):
        """Score one padded user batch. Hook for subclasses; ALWAYS
        returns (items, scores) in that order."""
        fn = _topk_batch_int8 if self.table_dtype == "int8" else _topk_batch
        s, i = fn(
            self.model, ub, jnp.asarray(rows), jnp.asarray(items), k,
            self.recall_target,
        )
        return i, s

    def _score_cols(self) -> int:
        """Columns of one dispatch's score block (the sharded variant
        scores only its per-shard slice) — sizes the auto batch cap."""
        return self.model.num_items

    @property
    def max_k(self) -> int:
        """Largest ``k`` this recommender can serve (the fused variants
        are pool-limited; wrappers that over-fetch clamp against it)."""
        return self.model.num_items

    def recommend(self, users, k: int = 10) -> tuple[np.ndarray, np.ndarray]:
        """Top-``k`` unseen items per user: (items (n, k) int32,
        scores (n, k) f32), both sorted by descending score."""
        users = np.asarray(users, np.int32).reshape(-1)
        self._validate(users, k)
        # cap each dispatch's (batch, cols) f32 score block at ~1 GB so
        # configs[4]-class catalogs can't RESOURCE_EXHAUST with defaults
        bsz = max(1, min(self.batch, (1 << 28) // max(1, self._score_cols())))
        n = users.shape[0]
        out_i = np.empty((n, k), np.int32)
        out_s = np.empty((n, k), np.float32)
        for start in range(0, n, bsz):
            stop = min(start + bsz, n)
            ub = np.zeros(bsz, np.int32)
            ub[: stop - start] = users[start:stop]
            rows, items = self._exclusions(ub[: stop - start])
            i_, s_ = self._score_batch(ub, rows, items, k)
            out_i[start:stop] = np.asarray(i_)[: stop - start]
            out_s[start:stop] = np.asarray(s_)[: stop - start]
        return out_i, out_s
