"""SGD solver — SURVEY.md M2.

Epoch mechanics for minibatch SGD: the per-epoch partition is prepared
host-side (``mfx.data.partition``), uploaded once as fixed-shape
``[num_batches, B]`` tensors, and consumed by a single jitted
``lax.scan`` over batches, so an entire epoch is one device program with no
host round-trips — the TPU-native replacement for the reference's
per-rating Java loop (SURVEY.md §3.3).

Kernel dispatch:
  'jnp'          — K4 XLA gather/scatter path (reference + CPU fallback)
  'blocked_jnp'  — block-stratified one-hot MXU path in pure XLA
  'pallas'       — K1 fused Pallas TPU kernel
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from mfx.config import SGDConfig
from mfx.data import partition as part
from mfx.data.coo import RatingsCOO
from mfx.data.split import epoch_permutation
from mfx.kernels.jnp_ref import sgd_minibatch_update

__all__ = ["EpochPlan", "plan_epoch", "make_epoch_fn", "train_epochs"]


@dataclasses.dataclass
class EpochPlan:
    """Device-ready epoch tensors: dict of [num_batches, B] arrays plus the
    count of real (non-padding) ratings."""

    batches: dict[str, jax.Array]
    n_real: int

    @property
    def num_batches(self) -> int:
        return self.batches["users"].shape[0]

    @property
    def batch_size(self) -> int:
        return self.batches["users"].shape[1]


def _bucket(nb: int) -> int:
    """Round batch-count up to a coarse bucket to bound jit recompiles when
    the conflict-free partitioner yields varying round counts per epoch."""
    b = 16
    while b < nb:
        b *= 2
    return b


def plan_epoch(
    coo: RatingsCOO, cfg, seed: int, epoch: int, bucket: bool = True,
    extras: dict[str, np.ndarray] | None = None,
) -> EpochPlan:
    """Partition one epoch of ratings into padded device batches.

    ``extras``: additional per-rating columns batched in the same order
    (zero-padded) — e.g. the temporal model's bin/deviation features."""
    perm = epoch_permutation(coo.n_ratings, seed, epoch)
    if cfg.partitioner == "fixed":
        order: np.ndarray | list[np.ndarray] = perm
    elif cfg.partitioner == "conflict_free":
        order = part.partition_conflict_free(coo.user, coo.item, cfg.batch_size, perm)
    else:
        raise ValueError(
            f"plan_epoch handles 'fixed'/'conflict_free'; got {cfg.partitioner!r}"
            " (blocked partitions are planned by mfx.kernels.blocked)"
        )
    arrays = part.pad_to_batches(
        coo.user, coo.item, coo.rating, order, cfg.batch_size,
        num_users=coo.num_users, num_items=coo.num_items, extras=extras,
    )
    nb = arrays["users"].shape[0]
    if bucket and cfg.partitioner == "conflict_free":
        nb_pad = _bucket(nb)
        if nb_pad != nb:
            # filler batches replicate the sentinel pad pattern (unique
            # out-of-range ids, weight 0) so unique_indices stays honest;
            # extras fill with zeros (their padded slots carry weight 0)
            slot = np.arange(cfg.batch_size, dtype=np.int32)
            fill = {
                "users": np.int32(coo.num_users) + slot,
                "items": np.int32(coo.num_items) + slot,
                "ratings": np.zeros(cfg.batch_size, np.float32),
                "weights": np.zeros(cfg.batch_size, np.float32),
            }
            for k, a in arrays.items():
                padded = np.broadcast_to(
                    fill.get(k, np.zeros(cfg.batch_size, a.dtype)),
                    (nb_pad,) + a.shape[1:],
                ).astype(a.dtype).copy()
                padded[:nb] = a
                arrays[k] = padded
    return EpochPlan(
        batches={k: jnp.asarray(v) for k, v in arrays.items()},
        n_real=coo.n_ratings,
    )


@functools.partial(
    jax.jit, static_argnames=("use_bias", "unique_rows", "dup_trust")
)
def _epoch_scan(model, batches, lr, reg, use_bias, unique_rows, dup_trust):
    def body(m, batch):
        m, sq = sgd_minibatch_update(
            m,
            batch["users"],
            batch["items"],
            batch["ratings"],
            batch["weights"],
            lr,
            reg,
            use_bias=use_bias,
            unique_rows=unique_rows,
            dup_trust=dup_trust,
        )
        return m, sq

    model, sqs = jax.lax.scan(body, model, batches)
    return model, jnp.sum(sqs)


def make_epoch_fn(cfg: SGDConfig, use_bias: bool):
    """Returns epoch_fn(model, plan, lr) -> (model, train_sse)."""
    unique_rows = cfg.partitioner == "conflict_free"
    if cfg.kernel == "jnp":

        def epoch_fn(model, plan: EpochPlan, lr: float):
            return _epoch_scan(
                model,
                plan.batches,
                jnp.asarray(lr, model.P.dtype),
                jnp.asarray(cfg.reg, model.P.dtype),
                use_bias,
                unique_rows,
                cfg.dup_trust,
            )

        return epoch_fn
    raise ValueError(f"unknown/unwired kernel {cfg.kernel!r} for plan_epoch path")


def train_epochs(
    model,
    train: RatingsCOO,
    cfg: SGDConfig,
    use_bias: bool,
    seed: int = 0,
    start_epoch: int = 0,
    timings: dict | None = None,
) -> Iterator[tuple[int, object, float]]:
    """Generator driving SGD epochs; yields (epoch, model, train_rmse).
    On the blocked path train_rmse is a lazy 0-d device array (reading it
    blocks on the epoch — see train_epochs_blocked); elsewhere a float.

    The training driver (mfx.train.driver) wraps this with eval cadence,
    logging, checkpointing, and throughput metering. The 'blocked'
    partitioner (DSGD strata driving the Pallas K1 kernel or its XLA
    mirror) is delegated to mfx.solvers.blocked.
    """
    if cfg.partitioner == "blocked":
        from mfx.solvers.blocked import train_epochs_blocked

        yield from train_epochs_blocked(
            model, train, cfg, use_bias, seed=seed, start_epoch=start_epoch,
            timings=timings,
        )
        return
    epoch_fn = make_epoch_fn(cfg, use_bias)
    for epoch in range(start_epoch, cfg.epochs):
        lr = cfg.lr * (cfg.lr_decay**epoch)
        plan = plan_epoch(train, cfg, seed, epoch)
        model, sse = epoch_fn(model, plan, lr)
        train_rmse = float(jnp.sqrt(sse / max(1, plan.n_real)))
        yield epoch, model, train_rmse
