"""P1 — data-parallel SGD (SURVEY.md §2.2 P1; BASELINE.json configs[3]).

Factor tables are replicated across the 'data' mesh axis; each minibatch is
sharded over devices. Every device computes its shard's sparse deltas from
the replicated snapshot, the (ids, deltas) pairs are all-gathered over ICI,
and every replica applies the identical full scatter-add — so replicas stay
bitwise-identical and the result equals the single-device run on the same
batches (tested). Exchanging sparse deltas costs O(B·k) per batch instead
of the O(U·k) a dense-gradient psum would, which is what makes DP viable
for embedding-style models.
"""

from __future__ import annotations

import functools
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mfx.config import SGDConfig
from mfx.data.coo import RatingsCOO
from mfx.data import partition as part
from mfx.data.split import epoch_permutation
from mfx.kernels.jnp_ref import sgd_apply_deltas, sgd_compute_deltas
from mfx.runtime.mesh import DATA_AXIS

__all__ = ["make_dp_epoch_fn", "train_epochs_dp", "train_epochs_bpr_dp"]


def make_dp_epoch_fn(mesh: Mesh, use_bias: bool, dup_trust: float = 0.0):
    """Build the jitted data-parallel epoch: scan over [NB, B] batches with
    the B dimension sharded over the 'data' axis. ``dup_trust`` is applied
    to the *gathered* global batch (same counts as the single-device run on
    the same batches, so DP stays bitwise-equal to single-device)."""

    def _epoch(model, batches, lr, reg):
        def body(m, batch):
            d_pu, d_qi, d_bu, d_bi, sq = sgd_compute_deltas(
                m,
                batch["users"],
                batch["items"],
                batch["ratings"],
                batch["weights"],
                lr,
                reg,
                use_bias=use_bias,
            )
            # exchange sparse deltas; tiled=True concatenates in device
            # order, which is the original batch order
            g = lambda x: lax.all_gather(x, DATA_AXIS, axis=0, tiled=True)
            m = sgd_apply_deltas(
                m,
                g(batch["users"]),
                g(batch["items"]),
                g(d_pu),
                g(d_qi),
                g(d_bu),
                g(d_bi),
                use_bias=use_bias,
                dup_trust=dup_trust,
                weights=g(batch["weights"]),
            )
            return m, lax.psum(sq, DATA_AXIS)

        model, sqs = lax.scan(body, model, batches)
        return model, jnp.sum(sqs)

    sharded = jax.shard_map(
        _epoch,
        mesh=mesh,
        in_specs=(P(), {k: P(None, DATA_AXIS) for k in
                        ("users", "items", "ratings", "weights")}, P(), P()),
        out_specs=(P(), P()),
        check_vma=False,  # replicas provably identical (same gathered deltas)
    )
    return jax.jit(sharded)


def make_bpr_dp_epoch_fn(mesh: Mesh):
    """Data-parallel BPR: same sparse-delta all-gather recipe as SGD."""
    from mfx.solvers.bpr import bpr_apply_deltas, bpr_compute_deltas

    def _epoch(model, batches, lr, reg):
        def body(m, b):
            d_pu, d_qi, d_qj, loss = bpr_compute_deltas(
                m, b["users"], b["pos"], b["neg"], b["weights"], lr, reg
            )
            g = lambda x: lax.all_gather(x, DATA_AXIS, axis=0, tiled=True)
            m = bpr_apply_deltas(
                m, g(b["users"]), g(b["pos"]), g(b["neg"]),
                g(d_pu), g(d_qi), g(d_qj),
            )
            return m, lax.psum(loss, DATA_AXIS)

        model, losses = lax.scan(body, model, batches)
        return model, jnp.sum(losses)

    sharded = jax.shard_map(
        _epoch,
        mesh=mesh,
        in_specs=(P(), {k: P(None, DATA_AXIS) for k in
                        ("users", "pos", "neg", "weights")}, P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def train_epochs_bpr_dp(
    model,
    train: RatingsCOO,
    cfg,  # BPRConfig
    mesh: Mesh,
    seed: int = 0,
    start_epoch: int = 0,
) -> Iterator[tuple[int, object, float]]:
    """Data-parallel BPR epochs; bitwise-equal to the single-device run on
    the same triples (tested)."""
    from mfx.data.bpr import bpr_epoch_triples, build_positive_index
    from mfx.solvers.bpr import _pad_triples

    ndata = mesh.shape[DATA_AXIS]
    bsz = -(-cfg.batch_size // ndata) * ndata
    epoch_fn = make_bpr_dp_epoch_fn(mesh)
    sharding = NamedSharding(mesh, P(None, DATA_AXIS))
    pos_keys = build_positive_index(train)
    cdf = None
    if getattr(cfg, "neg_weighting", "uniform") == "popularity":
        from mfx.data.bpr import popularity_cdf

        cdf = popularity_cdf(train.item, train.num_items,
                             getattr(cfg, "neg_beta", 0.75))
    for epoch in range(start_epoch, cfg.epochs):
        perm = epoch_permutation(train.n_ratings, seed, epoch)
        u, i, j = bpr_epoch_triples(
            train, cfg.neg_seed + seed, epoch, perm, pos_keys=pos_keys,
            cdf=cdf,
        )
        batches = {
            k: jax.device_put(v, sharding)
            for k, v in _pad_triples(u, i, j, bsz).items()
        }
        model, loss = epoch_fn(
            model, batches,
            jnp.asarray(cfg.lr, model.P.dtype),
            jnp.asarray(cfg.reg, model.P.dtype),
        )
        yield epoch, model, float(loss) / max(1, train.n_ratings)


def train_epochs_dp(
    model,
    train: RatingsCOO,
    cfg: SGDConfig,
    use_bias: bool,
    mesh: Mesh,
    seed: int = 0,
    start_epoch: int = 0,
) -> Iterator[tuple[int, object, float]]:
    """Data-parallel version of mfx.solvers.sgd.train_epochs."""
    ndata = mesh.shape[DATA_AXIS]
    bsz = -(-cfg.batch_size // ndata) * ndata  # divisible by the data axis
    epoch_fn = make_dp_epoch_fn(mesh, use_bias, dup_trust=cfg.dup_trust)
    batch_sharding = NamedSharding(mesh, P(None, DATA_AXIS))
    for epoch in range(start_epoch, cfg.epochs):
        lr = cfg.lr * (cfg.lr_decay**epoch)
        perm = epoch_permutation(train.n_ratings, seed, epoch)
        arrays = part.pad_to_batches(
            train.user, train.item, train.rating, perm, bsz,
            num_users=train.num_users, num_items=train.num_items,
        )
        batches = {
            k: jax.device_put(v, batch_sharding) for k, v in arrays.items()
        }
        model, sse = epoch_fn(
            model,
            batches,
            jnp.asarray(lr, model.P.dtype),
            jnp.asarray(cfg.reg, model.P.dtype),
        )
        yield epoch, model, float(jnp.sqrt(sse / max(1, train.n_ratings)))
