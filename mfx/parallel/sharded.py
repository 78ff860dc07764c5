"""P2 — row-sharded factor tables with ring row-exchange over ICI
(SURVEY.md §2.2 P2; BASELINE.json north star "factor matrices shard across
a TPU mesh with all-to-all row exchange over ICI for billion-rating scale"
and configs[4]).

DSGD ring (Gemulla et al., mapped to the TPU torus): the user table P is
row-sharded over the 'model' axis (shard s owns user block s); the item
table Q is row-sharded too, but its blocks *rotate around the ring*. An
epoch runs S sub-steps; at sub-step t, shard s trains on stratum
(s, (s+t) mod S) — ratings whose users it owns and whose items live in the
block it currently holds — then the Q blocks ``ppermute`` one hop. Strata
at a given sub-step are pairwise disjoint in both tables, so shards never
conflict: the parallel epoch computes the same result as a sequential pass
over the same batches up to XLA fusion-level f32 rounding (tested to
atol=1e-6 in tests/distributed/test_sharded_ring.py), and is itself
bitwise-deterministic run-to-run — the deterministic replacement for
Hogwild.

Communication = S dense block rotations per epoch over neighboring ICI
links (the all-to-all of rows is realized as a ring schedule, which is how
an all-to-all lowers onto a torus anyway) — no host routing, no NCCL.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from mfx.config import SGDConfig
from mfx.data.coo import RatingsCOO
from mfx.data.split import epoch_permutation
from mfx.kernels.jnp_ref import sgd_minibatch_update
from mfx.models.mf import MFModel
from mfx.runtime.mesh import MODEL_AXIS

__all__ = ["plan_ring_epoch", "make_ring_epoch_fn", "train_epochs_ring"]


@dataclasses.dataclass
class RingPlan:
    """Host-side epoch plan: batches[t][s] padded to a common shape.

    users/items: int32 [S, S, NB, B] — LOCAL row ids (user relative to
    shard s's block; item relative to the block held at sub-step t).
    ratings/weights: f32 [S, S, NB, B]. Dims: (sub-step t, shard s, NB, B).
    """

    users: np.ndarray
    items: np.ndarray
    ratings: np.ndarray
    weights: np.ndarray
    ublock: int
    iblock: int
    n_real: int


def plan_ring_epoch(
    coo: RatingsCOO, S: int, batch_size: int, perm: np.ndarray
) -> RingPlan:
    """Stratify one epoch into the S×S DSGD schedule (O(n) + sort)."""
    ublock = -(-coo.num_users // S)
    iblock = -(-coo.num_items // S)
    u = coo.user[perm].astype(np.int64)
    i = coo.item[perm].astype(np.int64)
    r = coo.rating[perm]
    s_of = u // ublock  # owning shard
    b_of = i // iblock  # item block
    t_of = (b_of - s_of) % S  # sub-step when shard s_of holds block b_of
    key = t_of * S + s_of
    sorter = np.argsort(key, kind="stable")
    u, i, r, key = u[sorter], i[sorter], r[sorter], key[sorter]

    counts = np.bincount(key, minlength=S * S)
    nb = max(1, int(-(-counts.max() // batch_size)))
    users = np.zeros((S * S, nb * batch_size), np.int32)
    items = np.zeros((S * S, nb * batch_size), np.int32)
    ratings = np.zeros((S * S, nb * batch_size), np.float32)
    weights = np.zeros((S * S, nb * batch_size), np.float32)
    offsets = np.zeros(S * S + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    pos = np.arange(len(u), dtype=np.int64) - offsets[key]
    users[key, pos] = (u % ublock).astype(np.int32)
    items[key, pos] = (i % iblock).astype(np.int32)
    ratings[key, pos] = r
    weights[key, pos] = 1.0
    shape = (S, S, nb, batch_size)
    return RingPlan(
        users=users.reshape(shape),
        items=items.reshape(shape),
        ratings=ratings.reshape(shape),
        weights=weights.reshape(shape),
        ublock=ublock,
        iblock=iblock,
        n_real=len(u),
    )


def _pad_rows(x, rows):
    return jnp.pad(x, ((0, rows - x.shape[0]),) + ((0, 0),) * (x.ndim - 1))


def shard_model(model: MFModel, S: int) -> MFModel:
    """Pad tables to S equal row blocks (device layout handled by jit)."""
    ublock = -(-model.num_users // S)
    iblock = -(-model.num_items // S)
    return MFModel(
        P=_pad_rows(model.P, S * ublock),
        Q=_pad_rows(model.Q, S * iblock),
        bu=_pad_rows(model.bu, S * ublock),
        bi=_pad_rows(model.bi, S * iblock),
        mu=model.mu,
    )


def unshard_model(model: MFModel, num_users: int, num_items: int) -> MFModel:
    return MFModel(
        P=model.P[:num_users],
        Q=model.Q[:num_items],
        bu=model.bu[:num_users],
        bi=model.bi[:num_items],
        mu=model.mu,
    )


def make_ring_epoch_fn(mesh: Mesh, use_bias: bool, dup_trust: float = 0.0):
    """Jitted DSGD-ring epoch over the 'model' axis.

    Takes the padded global model (P/bu row-sharded, Q/bi row-sharded) and
    the RingPlan tensors; returns (model, sse)."""
    S = mesh.shape[MODEL_AXIS]
    ring = [(j, (j - 1) % S) for j in range(S)]  # send block to left

    def _epoch(P_, Q_, bu_, bi_, mu, users, items, ratings, weights, lr, reg):
        # locals: P_ (ublock, k), Q_ holds this shard's HOME block at t=0
        def substep(carry, xs):
            Pl, Ql, bul, bil = carry
            us, it, rt, wt = xs  # [NB, B]
            m = MFModel(P=Pl, Q=Ql, bu=bul, bi=bil, mu=mu)

            def body(mm, b):
                mm, sq = sgd_minibatch_update(
                    mm, b[0], b[1], b[2], b[3], lr, reg, use_bias=use_bias,
                    dup_trust=dup_trust,
                )
                return mm, sq

            m, sqs = lax.scan(body, m, (us, it, rt, wt))
            # rotate item blocks one hop around the ring
            Ql = lax.ppermute(m.Q, MODEL_AXIS, ring)
            bil = lax.ppermute(m.bi, MODEL_AXIS, ring)
            return (m.P, Ql, m.bu, bil), jnp.sum(sqs)

        # sub-step t uses plan slice [t]; shard dim is mapped by shard_map
        (Pl, Ql, bul, bil), sqs = lax.scan(
            substep,
            (P_, Q_, bu_, bi_),
            (users[:, 0], items[:, 0], ratings[:, 0], weights[:, 0]),
        )
        sse = lax.psum(jnp.sum(sqs), MODEL_AXIS)
        return Pl, Ql, bul, bil, sse

    sharded = jax.shard_map(
        _epoch,
        mesh=mesh,
        in_specs=(
            P(MODEL_AXIS), P(MODEL_AXIS), P(MODEL_AXIS), P(MODEL_AXIS), P(),
            P(None, MODEL_AXIS), P(None, MODEL_AXIS),
            P(None, MODEL_AXIS), P(None, MODEL_AXIS),
            P(), P(),
        ),
        out_specs=(
            P(MODEL_AXIS), P(MODEL_AXIS), P(MODEL_AXIS), P(MODEL_AXIS), P()
        ),
        check_vma=False,
    )

    @jax.jit
    def epoch(model: MFModel, plan_arrays, lr, reg):
        Pl, Ql, bul, bil, sse = sharded(
            model.P, model.Q, model.bu, model.bi, model.mu,
            plan_arrays["users"], plan_arrays["items"],
            plan_arrays["ratings"], plan_arrays["weights"],
            lr, reg,
        )
        return MFModel(P=Pl, Q=Ql, bu=bul, bi=bil, mu=model.mu), sse

    return epoch


def train_epochs_ring(
    model: MFModel,
    train: RatingsCOO,
    cfg: SGDConfig,
    use_bias: bool,
    mesh: Mesh,
    seed: int = 0,
    start_epoch: int = 0,
    yield_padded: bool = False,
) -> Iterator[tuple[int, MFModel, float]]:
    """Sharded-table (DSGD ring) version of train_epochs. Yields the
    *unsharded* model each epoch (cheap row slice; tables stay sharded on
    device between epochs) — or, with ``yield_padded``, the padded
    row-sharded model itself, so checkpoints can be written without
    gathering (SURVEY.md §5.4); re-feeding a padded model is a no-op pad.
    """
    S = mesh.shape[MODEL_AXIS]
    U, I = train.num_users, train.num_items
    epoch_fn = make_ring_epoch_fn(mesh, use_bias, dup_trust=cfg.dup_trust)
    padded = shard_model(model, S)
    for epoch in range(start_epoch, cfg.epochs):
        lr = cfg.lr * (cfg.lr_decay**epoch)
        perm = epoch_permutation(train.n_ratings, seed, epoch)
        plan = plan_ring_epoch(train, S, cfg.batch_size, perm)
        arrays = {
            "users": jnp.asarray(plan.users),
            "items": jnp.asarray(plan.items),
            "ratings": jnp.asarray(plan.ratings),
            "weights": jnp.asarray(plan.weights),
        }
        padded, sse = epoch_fn(
            padded,
            arrays,
            jnp.asarray(lr, model.P.dtype),
            jnp.asarray(cfg.reg, model.P.dtype),
        )
        out = padded if yield_padded else unshard_model(padded, U, I)
        yield epoch, out, float(jnp.sqrt(sse / max(1, train.n_ratings)))
