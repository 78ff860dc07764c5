"""Fused top-K serving — score-block-free scoring + selection.

``FusedTopKRecommender`` replaces the stock path's materialized
``(batch, catalog)`` score block (the measured latency bound at 1M+ item
catalogs — docs/SERVING.md) with the Pallas per-tile top-2 kernel
(mfx/kernels/serve_pallas.py): only ~``2·catalog/tile`` candidates per
user ever reach HBM, and the finalize stage (the same single jitted
program) applies seen-item exclusion on the CANDIDATES (broadcast
membership), falls back to a tile's runner-up when its winner is
excluded, takes the final exact top-K over the surviving pool, and adds
the per-user constants ``b_u + mu`` back to the reported scores (they
cannot change a within-user ranking, so the kernel never needs them).

Accuracy contract: the result is APPROXIMATE like ``recall_target``
serving — a user's true top-K item is missed only when ≥3 of their
top candidates (or 2 plus a seen tile-winner) land in the same catalog
tile. At the default tile=1024 on a 1M-item catalog that is a ≲1% effect
(bound pinned in tests/unit/test_fused_serve.py and measured on chip).
If exclusions ever EXHAUST the candidate pool (k close to 2·n_tiles with
heavy per-user exclusions), serving raises instead of silently returning
seen/pad items. Use :class:`mfx.serve.TopKRecommender` when exactness
matters more than latency — or ``exact=True`` on the fused recommenders,
which upgrades the approximate contract to CERTIFIED EXACT: the kernel's
per-tile runner-up values bound every non-candidate item, so rescoring
just the batch's union of "suspect" tiles (runner-up beats a user's k-th
candidate) inside the same device program provably recovers the true
top-K, with a transparent stock-path fallback on the rare rescore-budget
overflow (see :func:`_serve_exact`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from mfx.kernels.serve_pallas import AUG_LANES, tile_topk, tile_topk2
from mfx.serve.topk import TopKRecommender

__all__ = [
    "FusedTopKRecommender", "FusedShardedTopKRecommender",
    "similar_items_fused",
]

_PAD_BIAS = -1e30  # catalog pad rows: can never win a tile


def _validate_fused(
    table_dtype: str, tile: int, rank: int, allow_int8: bool = False,
    exact: bool = False,
) -> None:
    """Shared constructor validation of the fused serving family."""
    allowed = ("f32", "bf16", "int8") if allow_int8 else ("f32", "bf16")
    if table_dtype not in allowed:
        raise ValueError(
            f"fused serving supports table_dtype {allowed}, got "
            f"{table_dtype!r}"
        )
    if table_dtype == "int8" and exact:
        raise ValueError(
            "exact=True certifies the TRUE f32 scores; an int8-quantized "
            "catalog cannot be certified against them — use table_dtype "
            "'f32'/'bf16' for exact mode, or exact=False for the int8 "
            "capacity lever (recall parity with the stock int8 scorer)"
        )
    if tile < 128 or tile % 128:
        raise ValueError(f"tile must be a multiple of 128, got {tile}")
    if rank >= AUG_LANES:
        raise ValueError(
            f"fused serving supports rank < {AUG_LANES}, got {rank}"
        )


def _augment_catalog(Q, bias, ipad: int, dt) -> jax.Array:
    """The augmented catalog table [q, bias, 0…] padded to ``ipad`` rows;
    pad rows carry bias ``_PAD_BIAS`` so they can never win a tile."""
    I, r = Q.shape
    Q_aug = jnp.zeros((ipad, AUG_LANES), dt)
    Q_aug = Q_aug.at[:I, :r].set(jnp.asarray(Q, dt))
    bias_lane = jnp.full((ipad,), _PAD_BIAS, dt)
    bias_lane = bias_lane.at[:I].set(jnp.asarray(bias, dt))
    return Q_aug.at[:, r].set(bias_lane)


def _augment_catalog_int8(Q, bias, ipad: int, tile: int):
    """int8 augmented catalog + its (n_tiles, 2, tile) f32 scale/bias
    stream (VERDICT r3 missing #3 — the capacity lever inside the fused
    latency lever). Rows quantize per-row symmetrically like the stock
    int8 scorer (mfx/serve/topk.py _quantize_rows); the bias lane stays
    ZERO in the int8 table (a bias cannot ride an int8 lane) and rides
    the sb stream instead; pad rows get scale 0 / bias ``_PAD_BIAS`` so
    they can never win a tile."""
    from mfx.serve.topk import _quantize_rows

    I, r = Q.shape
    Q8, scale = _quantize_rows(jnp.asarray(Q, jnp.float32))
    Q_aug = jnp.zeros((ipad, AUG_LANES), jnp.int8)
    Q_aug = Q_aug.at[:I, :r].set(Q8)
    sc = jnp.zeros((ipad,), jnp.float32).at[:I].set(scale)
    bl = jnp.full((ipad,), _PAD_BIAS, jnp.float32).at[:I].set(
        jnp.asarray(bias, jnp.float32)
    )
    sb = jnp.stack(
        [sc.reshape(-1, tile), bl.reshape(-1, tile)], axis=1
    )  # (n_tiles, 2, tile)
    return Q_aug, sb


def _augment_rows(pu, dt):
    """The batch's augmented user rows [p, 1, 0…] — built inside the
    jitted program so the full user table is never copied or widened."""
    B, r = pu.shape
    pu_aug = jnp.zeros((B, AUG_LANES), dt)
    pu_aug = pu_aug.at[:, :r].set(jnp.asarray(pu, dt))
    return pu_aug.at[:, r].set(1.0)


def _check_served(items, scores, num_items: int) -> None:
    """Loud failure when exclusions exhausted the fused candidate pool —
    the served slots would otherwise carry seen items (score -inf) or
    catalog pad rows (id >= num_items)."""
    if np.isneginf(scores).any() or (items >= num_items).any():
        raise ValueError(
            "fused serving: the per-tile candidate pool was exhausted by "
            "exclusions for at least one user (k too close to the pool "
            "size) — use a smaller tile (more tiles => more candidates) "
            "or the exact TopKRecommender"
        )


def _member(seenmat, cand):
    """Per-row membership of candidates among the row's seen items:
    broadcast equality + any-reduce, which XLA fuses without
    materializing the (B, E, n) intermediate. Measured 40x faster on TPU
    than binary search (take_along_axis gathers are the slow op there:
    47 ms vs 1.2 ms at B=256, E=256, n=1954); cost grows linearly in E
    (the batch's max seen count) but even E=4k beats the score-block
    path. Rows pad with an out-of-range sentinel."""
    return (seenmat[:, :, None] == cand[:, None, :]).any(axis=1)


@functools.partial(jax.jit, static_argnames=("k", "tile", "interpret"))
def _serve(pu, Q_aug, bu_b, mu, seenmat, k, tile, interpret=False, sb=None):
    """The whole fused dispatch as ONE device program: augment the
    batch's (B, rank) user rows, run the per-tile top-2 kernel, exclude
    seen candidates (runner-up fallback), exact top-K over the pool, add
    the per-user constants back. One round-trip per batch — per-dispatch
    latency is a measured cost on serving paths. ``sb`` is the int8
    catalog's scale/bias stream (None for f32/bf16)."""
    aug_dt = jnp.float32 if Q_aug.dtype == jnp.int8 else Q_aug.dtype
    pu_aug = _augment_rows(pu, aug_dt)
    m1, a1, m2, a2 = tile_topk(pu_aug, Q_aug, tile=tile, depth=2,
                               interpret=interpret, sb=sb)
    tn = m1.shape[1]
    base = (jnp.arange(tn, dtype=jnp.int32) * tile)[None, :]
    g1 = a1 + base
    g2 = a2 + base
    v1 = jnp.where(_member(seenmat, g1), -jnp.inf, m1)
    v2 = jnp.where(_member(seenmat, g2), -jnp.inf, m2)
    vals = jnp.concatenate([v1, v2], axis=1)
    ids = jnp.concatenate([g1, g2], axis=1)
    top, sel = jax.lax.top_k(vals, k)
    items = jnp.take_along_axis(ids, sel, axis=1)
    return items, top + bu_b[:, None] + mu


@functools.partial(
    jax.jit, static_argnames=("k", "tile", "s_max", "depth", "interpret")
)
def _serve_exact(pu, Q_aug, bu_b, mu, seenmat, k, tile, s_max, depth,
                 interpret=False):
    """CERTIFIED-EXACT fused serving. The per-tile top-``depth`` kernel
    runs as in :func:`_serve`; exactness then follows from a bound the
    kernel already computed: an item NOT among its tile's top-``depth``
    scores ≤ that tile's ``depth``-th best ``m_D[t]``. With ``τ`` the
    user's k-th pool candidate, only tiles with ``m_D[t] > τ`` can hide
    a better item — i.e. tiles where >``depth`` of the user's top
    region collide, which ``depth`` makes combinatorially rare — so
    rescore exactly the UNION of such tiles across the batch (one
    shared gather + MXU matmul), mask the pool's copies of union items
    (dedup), and take the final exact top-K over pool ∪ union. Returns
    (items, scores, overflow, n_suspect): ``overflow`` means the union
    exceeded ``s_max`` and the result is NOT certified — the caller
    falls back to the stock exact path. Ties exactly at τ may resolve
    either way (same as ``top_k``)."""
    pu_aug = _augment_rows(pu, Q_aug.dtype)
    ranks = tile_topk(pu_aug, Q_aug, tile=tile, depth=depth,
                      interpret=interpret)
    ms, as_ = ranks[0::2], ranks[1::2]
    B, tn = ms[0].shape
    ipad = Q_aug.shape[0]
    base = (jnp.arange(tn, dtype=jnp.int32) * tile)[None, :]
    gs_ = [a + base for a in as_]
    vs_ = [jnp.where(_member(seenmat, g), -jnp.inf, m)
           for g, m in zip(gs_, ms)]
    vals = jnp.concatenate(vs_, axis=1)
    ids = jnp.concatenate(gs_, axis=1)
    top, sel = jax.lax.top_k(vals, k)
    pool_ids = jnp.take_along_axis(ids, sel, axis=1)
    tau = top[:, k - 1]
    suspect = ms[-1] > tau[:, None]              # (B, tn)
    sus_any = jnp.any(suspect, axis=0)           # (tn,)
    n_sus = jnp.sum(sus_any.astype(jnp.int32))
    overflow = n_sus > s_max
    # suspects first (ascending tile id), then the remaining tiles —
    # extra non-suspect slots only ADD exactly-scored candidates
    sel_tiles = jnp.argsort(~sus_any)[:s_max].astype(jnp.int32)
    cols = (sel_tiles[:, None] * tile
            + jnp.arange(tile, dtype=jnp.int32)[None, :])
    gids = cols.reshape(-1)                      # (s_max*tile,) distinct
    Q_sel = jnp.take(Q_aug, gids, axis=0)
    sub = jax.lax.dot_general(
        pu_aug, Q_sel, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        # HIGHEST: true-f32 like the Pallas kernel — XLA's default would
        # bf16-round the inputs and the rescored copies of pool items
        # would drift ~1e-3 from their kernel scores
        precision=jax.lax.Precision.HIGHEST,
    )                                            # (B, s_max*tile)
    # global->local position of union items (ipad slot = seen sentinel)
    big = jnp.int32(s_max * tile)
    loc = jnp.full((ipad + 1,), big, jnp.int32)
    loc = loc.at[gids].set(jnp.arange(s_max * tile, dtype=jnp.int32))
    # seen exclusion inside the union: scatter -inf at local positions
    seen_loc = jnp.take(loc, jnp.clip(seenmat, 0, ipad), axis=0)
    rows_b = jnp.arange(B, dtype=jnp.int32)[:, None]
    sub = sub.at[
        jnp.broadcast_to(rows_b, seen_loc.shape), seen_loc
    ].set(-jnp.inf, mode="drop")
    # dedup: pool copies of union items yield to their exact rescore
    in_union = jnp.take(loc, pool_ids, axis=0) < big
    allv = jnp.concatenate(
        [jnp.where(in_union, -jnp.inf, top), sub], axis=1
    )
    alli = jnp.concatenate(
        [pool_ids, jnp.broadcast_to(gids[None, :], sub.shape)], axis=1
    )
    fv, fsel = jax.lax.top_k(allv, k)
    fi = jnp.take_along_axis(alli, fsel, axis=1)
    return fi, fv + bu_b[:, None] + mu, overflow, n_sus


class _FusedServingBase(TopKRecommender):
    """Members shared by the single-device and sharded fused
    recommenders: batch-row user gather (the user table is never copied
    or lane-widened), the per-row seen matrix, the disabled score-block
    auto-cap, and the pool-exhaustion check on every served batch."""

    def _score_cols(self) -> int:
        return 1  # no (batch, catalog) score block — no auto batch cap

    def _exclusions(self, users):
        """Per-row seen-item matrix — the fused finalize tests candidate
        membership against it; the stock (rows, items) scatter pairs are
        useless without a score block."""
        return None, _seen_matrix(self._seen, users, self.batch, self._ipad)

    def _user_rows(self, ub):
        if self._host_u:
            return self._P_src[ub], self._bu_src[ub]
        idx = jnp.asarray(ub)
        return (
            jnp.take(self._P_src, idx, axis=0, mode="clip"),
            jnp.take(self._bu_src, idx, mode="clip"),
        )

    def recommend(self, users, k: int = 10):
        items, scores = super().recommend(users, k=k)
        _check_served(items, scores, self.model.num_items)
        return items, scores


class FusedTopKRecommender(_FusedServingBase):
    """Score-block-free top-K serving (see module docstring).

    >>> rec = FusedTopKRecommender(model, train=train_coo)
    >>> items, scores = rec.recommend(users, k=100)

    ``table_dtype``: 'f32', 'bf16' or 'int8'. bf16 halves the augmented
    catalog stream and footprint (item biases ride the bias-carry lane
    in bf16 too, ~0.4% relative rounding). int8 is the CAPACITY lever
    (4x less serving HBM than f32, same per-row symmetric quantization
    as the stock int8 scorer): the catalog is int8 with a small f32
    scale/bias side stream, dequantized per tile in VMEM — combining
    the stock path's capacity with the fused path's latency
    (exact=True is f32/bf16-only: a quantized catalog cannot certify
    the true f32 scores).

    ``tile``: catalog items scored per kernel step (multiple of 128).
    Larger tiles stream faster but raise the chance that several of a
    user's top items share a tile (only the top-2 per tile survive).

    The user table is never copied or lane-widened: it stays wherever it
    lives (host numpy or device) and only the batch's (B, rank) rows
    travel, augmented inside the jitted program.

    ``exact=True`` upgrades the approximate contract to CERTIFIED
    EXACT at nearly fused speed: the kernel's per-tile runner-up values
    bound every hidden item, so only tiles whose runner-up beats a
    user's k-th candidate can hide a miss — the batch's union of such
    tiles (≤ ``exact_tiles``, shared across users because the Zipf-hot
    head tiles are suspect for everyone) is rescored exactly inside the
    same device program and merged. When the union overflows
    ``exact_tiles`` (rare; flagged on-device), the batch transparently
    falls back to the stock exact scorer, so results are ALWAYS exact.
    ``exact_fallbacks`` counts those batches for observability.
    """

    def __init__(
        self, model, train=None, batch: int = 256, table_dtype: str = "f32",
        tile: int = 1024, interpret: bool | None = None,
        exact: bool = False, exact_tiles: int = 64, exact_depth: int = 8,
    ):
        _validate_fused(table_dtype, tile, model.rank, allow_int8=True,
                        exact=exact)
        # base init wires the seen CSR / batch plumbing; table quantization
        # is ours (augmented layout), so the base stays on the f32 path
        super().__init__(model, train=train, batch=batch, table_dtype="f32")
        self.table_dtype = table_dtype
        self.tile = tile
        self.interpret = (
            jax.default_backend() != "tpu" if interpret is None else interpret
        )
        dt = jnp.bfloat16 if table_dtype == "bf16" else jnp.float32
        I = model.num_items
        self._ipad = -(-I // tile) * tile
        self._tn = self._ipad // tile
        if exact_tiles < 1:
            raise ValueError(f"exact_tiles must be >= 1, got {exact_tiles}")
        if not 1 <= exact_depth <= tile:
            raise ValueError(
                f"exact_depth must be in [1, tile], got {exact_depth}"
            )
        self.exact = bool(exact)
        self._s_max = min(exact_tiles, self._tn)
        self.exact_depth = exact_depth
        self.exact_fallbacks = 0  # batches that overflowed to the stock path
        self._exact_rec = None
        if table_dtype == "int8":
            self._Q_aug, self._sb = _augment_catalog_int8(
                model.Q, model.bi, self._ipad, tile
            )
        else:
            self._Q_aug = _augment_catalog(model.Q, model.bi, self._ipad, dt)
            self._sb = None
        self._P_src = model.P
        self._bu_src = model.bu
        self._host_u = isinstance(model.P, np.ndarray)
        self._mu = jnp.asarray(model.mu, jnp.float32)

    @property
    def max_k(self) -> int:
        return min(
            self.model.num_items,
            (self.exact_depth if self.exact else 2) * self._tn,
        )

    def _validate(self, users, k):
        super()._validate(users, k)
        pool = (self.exact_depth if self.exact else 2) * self._tn
        if k > pool:
            raise ValueError(
                f"k={k} exceeds the fused candidate pool depth*n_tiles="
                f"{pool}; lower tile or use TopKRecommender"
            )

    def _score_batch(self, ub, rows, seenmat, k):
        del rows  # fused exclusion uses the per-row seen matrix
        pu, bu_b = self._user_rows(ub)
        if not self.exact:
            return _serve(
                jnp.asarray(pu, jnp.float32), self._Q_aug,
                jnp.asarray(bu_b, jnp.float32), self._mu,
                jnp.asarray(seenmat), k, self.tile, self.interpret,
                sb=self._sb,
            )
        i_, s_, overflow, _n = _serve_exact(
            jnp.asarray(pu, jnp.float32), self._Q_aug,
            jnp.asarray(bu_b, jnp.float32), self._mu,
            jnp.asarray(seenmat), k, self.tile, self._s_max,
            self.exact_depth, self.interpret,
        )
        if bool(np.asarray(overflow)):
            # the suspect-tile union outgrew the rescore budget: this
            # batch is not certified — serve it through the stock exact
            # scorer instead, so 'exact=True' is unconditional
            self.exact_fallbacks += 1
            if self._exact_rec is None:
                self._exact_rec = TopKRecommender(
                    self.model, batch=self.batch
                )
                self._exact_rec._seen = self._seen  # share the CSR
            return self._exact_rec._score_batch(
                ub, *self._exact_rec._exclusions(ub), k
            )
        return i_, s_


class FusedShardedTopKRecommender(_FusedServingBase):
    """Score-block-free serving with the catalog row-sharded over a mesh
    — the configs[4]-scale composition of :class:`FusedTopKRecommender`
    and :class:`mfx.serve.ShardedTopKRecommender`.

    Each shard runs the Pallas per-tile top-2 kernel on its local
    augmented catalog slice, excludes seen candidates, takes a LOCAL
    top-K over its ~2·tiles/shard pool, and the S·K candidates meet in
    one tiny ``all_gather``; the final merge is an exact top-K over the
    union of the per-shard pools, so the result is IDENTICAL to the
    single-device fused recommender (tested — tiles never span shards).
    The user table is never replicated: only the batch's (B, rank) rows
    travel, augmented on device.
    """

    def __init__(
        self, model, mesh, train=None, batch: int = 256,
        table_dtype: str = "f32", tile: int = 1024,
        interpret: bool | None = None,
        exact: bool = False, exact_tiles: int = 64, exact_depth: int = 8,
    ):
        _validate_fused(table_dtype, tile, model.rank, allow_int8=True,
                        exact=exact)
        super().__init__(model, train=train, batch=batch, table_dtype="f32")
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        self.table_dtype = table_dtype
        self.tile = tile
        self.interpret = (
            jax.default_backend() != "tpu" if interpret is None else interpret
        )
        flat = Mesh(np.asarray(mesh.devices).reshape(-1), ("shard",))
        self._flat = flat
        S = flat.devices.size
        self._S = S
        dt = jnp.bfloat16 if table_dtype == "bf16" else jnp.float32
        I = model.num_items
        # catalog pad: a multiple of S*tile so every shard holds whole tiles
        self._ipad = -(-I // (S * tile)) * (S * tile)
        self._tn_loc = self._ipad // S // tile
        rows = NamedSharding(flat, P("shard"))
        if table_dtype == "int8":
            # the scale/bias stream shards with its tiles: sb rows are
            # per-TILE and tiles never span shards
            Q8, sb = _augment_catalog_int8(
                model.Q, model.bi, self._ipad, tile
            )
            self._Q_aug = jax.device_put(Q8, rows)
            self._sb = jax.device_put(sb, rows)
        else:
            self._Q_aug = jax.device_put(
                _augment_catalog(model.Q, model.bi, self._ipad, dt), rows
            )
            self._sb = None
        # user tables stay wherever they live (host numpy or device);
        # only the batch's rows travel, augmented inside the program
        self._P_src = model.P
        self._bu_src = model.bu
        self._host_u = isinstance(model.P, np.ndarray)
        self._mu = jnp.asarray(model.mu, jnp.float32)
        self._dt = dt
        self._kern = {}
        if exact_tiles < 1:
            raise ValueError(f"exact_tiles must be >= 1, got {exact_tiles}")
        # exact mode: each shard upgrades its LOCAL selection with the
        # suspect-tile rescore of _serve_exact — exact local top-K per
        # shard makes the S*K merge exact globally. Overflow on ANY
        # shard fails the certificate for the batch -> stock sharded
        # exact fallback.
        if not 1 <= exact_depth <= tile:
            raise ValueError(
                f"exact_depth must be in [1, tile], got {exact_depth}"
            )
        self.exact = bool(exact)
        self._s_max = min(exact_tiles, self._tn_loc)
        self.exact_depth = exact_depth
        self.exact_fallbacks = 0
        self._exact_rec = None
        self._mesh_src = mesh

    @property
    def max_k(self) -> int:
        return min(
            self.model.num_items,
            (self.exact_depth if self.exact else 2) * self._tn_loc,
        )

    def _validate(self, users, k):
        super()._validate(users, k)
        pool = (self.exact_depth if self.exact else 2) * self._tn_loc
        if k > pool:
            raise ValueError(
                f"k={k} exceeds the per-shard fused pool "
                f"depth*tiles/shard={pool}; lower tile or shard count"
            )

    def _kernel(self, k: int):
        if k in self._kern:
            return self._kern[k]
        from jax.sharding import PartitionSpec as P

        tile, tn_loc = self.tile, self._tn_loc
        iloc = tn_loc * tile
        dt, interpret = self._dt, self.interpret
        exact, s_max = self.exact, self._s_max
        depth = self.exact_depth if self.exact else 2

        def shard_fn(pu, bu_b, mu, seenmat, Q_loc, *sb_loc):
            s = jax.lax.axis_index("shard")
            pu_aug = _augment_rows(pu, dt)
            ranks = tile_topk(
                pu_aug, Q_loc, tile=tile, depth=depth, interpret=interpret,
                sb=sb_loc[0] if sb_loc else None,
            )
            ms, as_ = ranks[0::2], ranks[1::2]
            B = ms[0].shape[0]
            base = (jnp.arange(tn_loc, dtype=jnp.int32) * tile)[None, :]
            gs_ = [a + base + s * iloc for a in as_]
            vs_ = [jnp.where(_member(seenmat, g), -jnp.inf, m)
                   for g, m in zip(gs_, ms)]
            vals = jnp.concatenate(vs_, axis=1)
            ids = jnp.concatenate(gs_, axis=1)
            ls, sel = jax.lax.top_k(vals, k)
            li = jnp.take_along_axis(ids, sel, axis=1)
            n_over = jnp.int32(0)
            if exact:
                # upgrade the LOCAL selection exactly as _serve_exact
                # does single-device, in shard-local coordinates
                tau = ls[:, k - 1]
                sus_any = jnp.any(ms[-1] > tau[:, None], axis=0)
                n_sus = jnp.sum(sus_any.astype(jnp.int32))
                n_over = (n_sus > s_max).astype(jnp.int32)
                sel_tiles = jnp.argsort(~sus_any)[:s_max].astype(jnp.int32)
                cols = (sel_tiles[:, None] * tile
                        + jnp.arange(tile, dtype=jnp.int32)[None, :])
                lids = cols.reshape(-1)
                sub = jax.lax.dot_general(
                    pu_aug, jnp.take(Q_loc, lids, axis=0),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                big = jnp.int32(s_max * tile)
                loc = jnp.full((iloc + 1,), big, jnp.int32)
                loc = loc.at[lids].set(
                    jnp.arange(s_max * tile, dtype=jnp.int32)
                )
                # out-of-shard seen ids must map to the sentinel slot,
                # NOT clip onto local item 0
                g_loc = seenmat - s * iloc
                g_loc = jnp.where(
                    (g_loc >= 0) & (g_loc < iloc), g_loc, iloc
                )
                seen_loc = jnp.take(loc, g_loc, axis=0)
                rows_b = jnp.arange(B, dtype=jnp.int32)[:, None]
                sub = sub.at[
                    jnp.broadcast_to(rows_b, seen_loc.shape), seen_loc
                ].set(-jnp.inf, mode="drop")
                # li is always in-shard, but guard the same way
                l_loc = li - s * iloc
                l_loc = jnp.where(
                    (l_loc >= 0) & (l_loc < iloc), l_loc, iloc
                )
                in_union = jnp.take(loc, l_loc, axis=0) < big
                allv = jnp.concatenate(
                    [jnp.where(in_union, -jnp.inf, ls), sub], axis=1
                )
                gsub = lids + s * iloc
                alli = jnp.concatenate(
                    [li, jnp.broadcast_to(gsub[None, :], sub.shape)],
                    axis=1,
                )
                ls, sel = jax.lax.top_k(allv, k)
                li = jnp.take_along_axis(alli, sel, axis=1)
                n_over = jax.lax.psum(n_over, "shard")
            cs = jax.lax.all_gather(ls, "shard", axis=1, tiled=True)
            ci = jax.lax.all_gather(li, "shard", axis=1, tiled=True)
            gs, sel2 = jax.lax.top_k(cs, k)  # over S*k candidates — exact
            gi = jnp.take_along_axis(ci, sel2, axis=1)
            return gi, gs + bu_b[:, None] + mu, n_over

        quant = self._sb is not None
        fn = jax.shard_map(
            shard_fn,
            mesh=self._flat,
            in_specs=(P(), P(), P(), P(), P("shard"))
            + ((P("shard"),) if quant else ()),
            out_specs=(P(), P(), P()),
            # outputs ARE replicated (all_gather + identical final top_k
            # on every shard) but inference can't prove it
            check_vma=False,
        )
        jitted = jax.jit(fn)
        self._kern[k] = jitted
        return jitted

    def _score_batch(self, ub, rows, seenmat, k):
        del rows
        pu, bu_b = self._user_rows(ub)
        extra = () if self._sb is None else (self._sb,)
        gi, gs, n_over = self._kernel(k)(
            jnp.asarray(pu, jnp.float32), jnp.asarray(bu_b, jnp.float32),
            self._mu, jnp.asarray(seenmat), self._Q_aug, *extra,
        )
        if self.exact and int(np.asarray(n_over)) > 0:
            # a shard's suspect union outgrew its rescore budget: the
            # certificate failed for this batch — serve it through the
            # stock exact sharded scorer instead
            self.exact_fallbacks += 1
            from mfx.serve.sharded import ShardedTopKRecommender

            if self._exact_rec is None:
                self._exact_rec = ShardedTopKRecommender(
                    self.model, self._mesh_src, batch=self.batch
                )
                self._exact_rec._seen = self._seen  # share the CSR
            return self._exact_rec._score_batch(
                ub, *self._exact_rec._exclusions(ub), k
            )
        return gi, gs


def _seen_matrix(csr, users, batch: int, sentinel: int) -> np.ndarray:
    """Per-row seen-item matrix for a user batch (padded to a pow-2
    column bucket with an out-of-range sentinel) — the fused exclusion
    input; order within a row is irrelevant (broadcast membership)."""
    starts = csr.offsets[users]
    stops = csr.offsets[np.asarray(users) + 1]
    counts = (stops - starts).astype(np.int64)
    cmax = int(counts.max()) if counts.size else 0
    emax = max(8, 1 << int(np.ceil(np.log2(max(cmax, 1)))))
    mat = np.full((batch, emax), sentinel, np.int32)
    for b in np.flatnonzero(counts):
        c = int(counts[b])
        mat[b, :c] = csr.items[starts[b]:starts[b] + c]
    return mat


def similar_items_fused(
    model, items, k: int = 10, batch: int = 256, tile: int = 1024,
    table_dtype: str = "f32", interpret: bool | None = None,
    exact: bool = False, exact_tiles: int = 64, exact_depth: int = 8,
):
    """Score-block-free related-items serving: top-``k`` item neighbors
    by factor cosine via the SAME per-tile top-2 kernel and single
    dispatch as :class:`FusedTopKRecommender` — the query rows ride the
    "user" side, the row-normalized catalog rides the augmented table
    with a zero bias lane, and the per-row exclusion matrix holds just
    the query item itself. Approximate like the fused recommender (top-2
    per tile survive) unless ``exact=True`` — the same certified
    suspect-tile rescore as the recommender (here the tile collisions
    are the COMMON case: an item's nearest neighbors cluster in factor
    space, often into its own tile). Returns (items (n, k) int32,
    cosines (n, k) f32).
    """
    if table_dtype == "int8":
        raise ValueError(
            "int8 tables are not supported for cosine similar-items: the "
            "catalog rows must be row-normalized in f32 BEFORE augmenting "
            "(per-row int8 quantization of unit vectors destroys the "
            "cosine semantics the stock path certifies against); use "
            "table_dtype 'f32' or 'bf16'"
        )
    _validate_fused(table_dtype, tile, model.rank, exact=exact)
    items = np.asarray(items, np.int32).reshape(-1)
    I = model.num_items
    ipad = -(-I // tile) * tile
    tn = ipad // tile
    pool = (exact_depth if exact else 2) * tn
    if k < 1 or k > min(I - 1, pool):
        raise ValueError(
            f"k must be in [1, min(num_items-1, depth*n_tiles)="
            f"{min(I - 1, pool)}], got {k}"
        )
    if np.any((items < 0) | (items >= I)):
        raise ValueError("item id out of range")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    dt = jnp.bfloat16 if table_dtype == "bf16" else jnp.float32
    Q = jnp.asarray(model.Q, jnp.float32)
    Qn = Q / jnp.maximum(jnp.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    # catalog side: [q̂, 0, 0…] with pad bias -1e30; query rows gather
    # from Qn per batch and augment inside _serve
    Q_aug = _augment_catalog(Qn, jnp.zeros((I,), jnp.float32), ipad, dt)
    zeros_bu = jnp.zeros((batch,), jnp.float32)
    mu = jnp.asarray(0.0, jnp.float32)

    n = items.shape[0]
    out_i = np.empty((n, k), np.int32)
    out_s = np.empty((n, k), np.float32)
    for start in range(0, n, batch):
        stop = min(start + batch, n)
        qb = np.zeros(batch, np.int32)
        qb[: stop - start] = items[start:stop]
        # exclusion: each row's own query id (padded rows exclude query 0
        # too — their outputs are discarded)
        seen = np.full((batch, 8), ipad, np.int32)
        seen[:, 0] = qb
        pu = jnp.take(Qn, jnp.asarray(qb), axis=0, mode="clip")
        if exact:
            i_, s_, overflow, _n = _serve_exact(
                pu, Q_aug, zeros_bu, mu, jnp.asarray(seen), k, tile,
                min(exact_tiles, tn), exact_depth, interpret,
            )
            if bool(np.asarray(overflow)):
                # certificate failed: exact cosine top-K via the stock
                # per-batch path (self-excluded; (batch, I) block only)
                from mfx.serve.topk import _similar_batch

                s_, i_ = _similar_batch(Qn, jnp.asarray(qb), k)
        else:
            i_, s_ = _serve(
                pu, Q_aug, zeros_bu, mu, jnp.asarray(seen), k, tile,
                interpret,
            )
        m = stop - start
        i_np = np.asarray(i_)[:m]
        s_np = np.asarray(s_)[:m]
        _check_served(i_np, s_np, I)
        out_i[start:stop] = i_np
        out_s[start:stop] = s_np
    return out_i, out_s
