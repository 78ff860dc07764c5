"""Sharded-catalog top-K serving — the deployment path for factor tables
too large for one chip (BASELINE.json configs[4] scale).

Q (and its item biases) shard by contiguous row blocks over the mesh's
flattened device axis; P stays replicated for the request batch (only the
batch's ``(B, rank)`` user rows travel). Each shard scores its local
catalog slice with one MXU matmul, excludes its slice of the batch's seen
pairs, takes a LOCAL top-K, and the ``S·K`` candidates meet in one
``all_gather`` of ``(K items + K scores)`` per shard — K·S values per
user instead of the catalog row, so the collective is tiny and rides ICI.
A final replicated top-K over candidates is exact: the global top-K is a
subset of the per-shard top-Ks.

Tested against the single-device recommender on the virtual CPU mesh
(tests/distributed/test_serve_sharded.py). The reference snapshot ships
no code (/root/reference/README.md:1-2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mfx.serve.topk import TopKRecommender, _select_k

__all__ = ["ShardedTopKRecommender", "similar_items_sharded"]

_NEG_INF = float("-inf")


def similar_items_sharded(
    model, mesh: Mesh, items, k: int = 10, batch: int = 256
):
    """Related-items serving with the item table row-sharded over a mesh
    (the configs[4]-scale variant of ``mfx.serve.similar_items``): each
    shard scores its catalog slice against the query batch (one MXU
    matmul over the row-normalized local block), takes a local top-K,
    and the S·K candidates meet in one tiny ``all_gather`` — catalog
    rows never move. Exact: the global top-K is a subset of the
    per-shard top-Ks. Returns (items (n, k) int32, cosines (n, k) f32).
    """
    items = np.asarray(items, np.int32).reshape(-1)
    I = model.num_items
    if k < 1 or k > I - 1:
        raise ValueError(f"k must be in [1, num_items-1={I - 1}], got {k}")
    if np.any((items < 0) | (items >= I)):
        raise ValueError("item id out of range")
    flat = Mesh(np.asarray(mesh.devices).reshape(-1), ("shard",))
    S = flat.devices.size
    ipad = -(-I // S) * S
    iloc = ipad // S
    if k > iloc:
        raise ValueError(
            f"k={k} exceeds the per-shard catalog slice {iloc}; use "
            "fewer shards or smaller k"
        )
    rows = NamedSharding(flat, P("shard"))
    norm = jnp.linalg.norm(model.Q, axis=1, keepdims=True)
    Qn = jnp.zeros((ipad, model.rank), jnp.float32)
    Qn = Qn.at[:I].set(model.Q / jnp.maximum(norm, 1e-12))
    Qn = jax.device_put(Qn, rows)
    # pad rows (zero vectors) score 0 against any query — mask them (and
    # later the query itself) with a -inf additive bias
    bmask = jnp.where(jnp.arange(ipad) < I, 0.0, _NEG_INF)
    bmask = jax.device_put(bmask.astype(jnp.float32), rows)

    def shard_fn(qrows, qids, Qn_loc, bm_loc):
        s = jax.lax.axis_index("shard")
        scores = (
            jnp.matmul(qrows, Qn_loc.T, preferred_element_type=jnp.float32)
            + bm_loc[None, :]
        )  # (B, iloc)
        # exclude the query from its own list — only on its OWNING shard:
        # a negative li would WRAP (numpy index semantics; mode='drop'
        # only drops true out-of-bounds), so out-of-slice queries must be
        # invalidated through the row index instead
        li = qids - s * iloc
        rowi = jnp.where(
            (li >= 0) & (li < iloc),
            jnp.arange(qids.shape[0]), qids.shape[0],
        )
        scores = scores.at[rowi, li].set(_NEG_INF, mode="drop")
        ls, lidx = jax.lax.top_k(scores, k)
        gidx = lidx + s * iloc
        cs = jax.lax.all_gather(ls, "shard", axis=1, tiled=True)
        ci = jax.lax.all_gather(gidx, "shard", axis=1, tiled=True)
        gs, sel = jax.lax.top_k(cs, k)
        return jnp.take_along_axis(ci, sel, axis=1), gs

    kern = jax.jit(jax.shard_map(
        shard_fn,
        mesh=flat,
        in_specs=(P(), P(), P("shard"), P("shard")),
        out_specs=(P(), P()),
        check_vma=False,  # outputs replicated by construction (see topk)
    ))

    n = items.shape[0]
    out_i = np.empty((n, k), np.int32)
    out_s = np.empty((n, k), np.float32)
    for start in range(0, n, batch):
        stop = min(start + batch, n)
        qb = np.zeros(batch, np.int32)
        qb[: stop - start] = items[start:stop]
        qd = jnp.asarray(qb)
        qrows = jnp.take(Qn, qd, axis=0, mode="clip")  # cross-shard gather
        i_, s_ = kern(qrows, qd, Qn, bmask)
        out_i[start:stop] = np.asarray(i_)[: stop - start]
        out_s[start:stop] = np.asarray(s_)[: stop - start]
    return out_i, out_s


class ShardedTopKRecommender(TopKRecommender):
    """Top-K serving with the item catalog row-sharded over a mesh.

    >>> rec = ShardedTopKRecommender(model, mesh, train=train_coo)
    >>> items, scores = rec.recommend(users, k=10)

    ``model`` is a host/replicated MFModel; Q and bi are device_put
    row-sharded (catalog padded to a multiple of the shard count with
    -inf-bias rows so pads can never be recommended).
    """

    def __init__(
        self, model, mesh: Mesh, train=None, batch: int = 256,
        table_dtype: str = "f32", recall_target: float | None = None,
    ):
        super().__init__(
            model, train=train, batch=batch, table_dtype=table_dtype,
            recall_target=recall_target,
        )
        self.mesh = mesh
        devs = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
        self._S = devs
        I = model.num_items
        self._ipad = -(-I // devs) * devs
        # flat 1-D view of the mesh: serving shards over ALL devices
        flat = Mesh(
            np.asarray(mesh.devices).reshape(-1), ("shard",)
        )
        self._flat = flat
        rows = NamedSharding(flat, P("shard"))
        repl = NamedSharding(flat, P())
        self._qscale = None
        if table_dtype == "int8":
            # per-row symmetric int8 catalog + sharded f32 scales; pad
            # rows quantize to 0 with scale 1 and their -inf bias below
            # keeps them unservable either way
            from mfx.serve.topk import _quantize_rows

            Q8, qs = _quantize_rows(model.Q)
            Qp = jnp.zeros((self._ipad, model.rank), jnp.int8).at[:I].set(Q8)
            qsp = jnp.ones((self._ipad,), jnp.float32).at[:I].set(qs)
            self._qscale = jax.device_put(qsp, rows)
        else:
            qdt = jnp.bfloat16 if table_dtype == "bf16" else model.Q.dtype
            Qp = jnp.zeros((self._ipad, model.rank), qdt)
            Qp = Qp.at[:I].set(jnp.asarray(model.Q, qdt))
        bip = jnp.full((self._ipad,), _NEG_INF, jnp.float32)
        bip = bip.at[:I].set(model.bi)
        self._Q = jax.device_put(Qp, rows)
        self._bi = jax.device_put(bip, rows)
        # the user table is NOT replicated (at configs[4] scale it cannot
        # be): it stays wherever it lives — host numpy or a device-sharded
        # jax.Array — and only the batch's (B, rank) rows travel per call
        self._P_src = model.P
        self._bu_src = model.bu
        self._host_u = isinstance(model.P, np.ndarray)
        self._mu = jax.device_put(jnp.asarray(model.mu, jnp.float32), repl)
        self._kern = {}

    def _user_rows(self, ub: np.ndarray):
        """(B, rank) factor rows + (B,) biases for the padded user batch —
        host fancy-index when the table is host-resident, device gather
        (XLA handles cross-shard rows) when it is a jax Array."""
        if self._host_u:
            return self._P_src[ub], self._bu_src[ub]
        idx = jnp.asarray(ub)
        return (
            jnp.take(self._P_src, idx, axis=0, mode="clip"),
            jnp.take(self._bu_src, idx, mode="clip"),
        )

    def _kernel(self, k: int):
        if k in self._kern:
            return self._kern[k]
        S, iloc = self._S, self._ipad // self._S
        flat = self._flat
        int8 = self.table_dtype == "int8"

        def tail(scores, s, excl_rows, excl_items):
            # keep only this shard's slice of the exclusion pairs; out-of
            # -slice (and pad-sentinel) pairs fall out via mode='drop'
            li = excl_items - s * iloc
            rows = jnp.where(
                (li >= 0) & (li < iloc), excl_rows, scores.shape[0]
            )
            scores = scores.at[rows, li].set(_NEG_INF, mode="drop")
            # local candidate selection honors recall_target (approx on
            # TPU); the final merge over S*k candidates stays exact
            ls, lidx = _select_k(scores, k, self.recall_target)
            gidx = lidx + s * iloc
            cs = jax.lax.all_gather(ls, "shard", axis=1, tiled=True)
            ci = jax.lax.all_gather(gidx, "shard", axis=1, tiled=True)
            gs, sel = jax.lax.top_k(cs, k)  # over S*k candidates — exact
            gi = jnp.take_along_axis(ci, sel, axis=1)
            return gi, gs

        if int8:

            def shard_fn(pu8, ps_b, bu_b, mu, Q_loc, qs_loc, bi_loc,
                         excl_rows, excl_items):
                s = jax.lax.axis_index("shard")
                # int8×int8 → int32 on the MXU; scale back per (user, item)
                raw = jnp.matmul(
                    pu8, Q_loc.T, preferred_element_type=jnp.int32
                )
                scores = (
                    raw.astype(jnp.float32)
                    * ps_b[:, None] * qs_loc[None, :]
                    + bi_loc[None, :] + bu_b[:, None] + mu
                )  # (B, iloc)
                return tail(scores, s, excl_rows, excl_items)

            in_specs = (
                P(), P(), P(), P(), P("shard"), P("shard"), P("shard"),
                P(), P(),
            )
        else:

            def shard_fn(pu, bu_b, mu, Q_loc, bi_loc, excl_rows, excl_items):
                s = jax.lax.axis_index("shard")
                scores = (
                    jnp.matmul(pu, Q_loc.T, preferred_element_type=jnp.float32)
                    + bi_loc[None, :] + bu_b[:, None] + mu
                )  # (B, iloc)
                return tail(scores, s, excl_rows, excl_items)

            in_specs = (P(), P(), P(), P("shard"), P("shard"), P(), P())

        fn = jax.shard_map(
            shard_fn,
            mesh=flat,
            in_specs=in_specs,
            out_specs=(P(), P()),
            # outputs ARE replicated (the all_gather + identical final
            # top_k run on every shard) but inference can't prove it
            check_vma=False,
        )
        jitted = jax.jit(fn)
        self._kern[k] = jitted
        return jitted

    def _validate(self, users: np.ndarray, k: int) -> None:
        super()._validate(users, k)
        if k > self._ipad // self._S:
            raise ValueError(
                f"k={k} exceeds the per-shard catalog slice "
                f"{self._ipad // self._S}; use fewer shards or smaller k"
            )

    def _score_cols(self) -> int:
        return self._ipad // self._S  # per-shard slice per dispatch

    def _quantize_tables(self, model):
        # the sharded variant quantizes its own padded Q copy (and the
        # per-batch pu rows in _score_batch); the source user table is
        # deliberately left alone — at configs[4] scale it may be host-
        # resident or device-sharded, and a cast would relocate it
        return model

    def _score_batch(self, ub, rows, items, k):
        pu, bu_b = self._user_rows(ub)
        if self.table_dtype == "int8":
            from mfx.serve.topk import _quantize_rows

            # the batch's user rows quantize on the fly (B rows — cheap);
            # the catalog side streams the persistent int8 table
            pu8, ps_b = _quantize_rows(jnp.asarray(pu, jnp.float32))
            return self._kernel(k)(
                pu8, ps_b, jnp.asarray(bu_b, jnp.float32), self._mu,
                self._Q, self._qscale, self._bi,
                jnp.asarray(rows), jnp.asarray(items),
            )
        pu = jnp.asarray(pu, self._Q.dtype)
        return self._kernel(k)(
            pu, bu_b, self._mu, self._Q, self._bi,
            jnp.asarray(rows), jnp.asarray(items),
        )
