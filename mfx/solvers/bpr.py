"""BPR trainer — SURVEY.md M3 (BASELINE.json configs[4]).

Bayesian Personalized Ranking (Rendle et al.): pairwise implicit-feedback
loss ``-ln σ(p_u·(q_i − q_j)) + λ‖·‖²`` over (user, positive, sampled
negative) triples. Minibatch SGD with the same snapshot + segment-sum
scatter-add semantics as the explicit solver; epochs are single jitted
``lax.scan`` programs.
"""

from __future__ import annotations

import functools
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from mfx.config import BPRConfig
from mfx.data.bpr import bpr_epoch_triples, build_positive_index
from mfx.data.coo import RatingsCOO
from mfx.data.split import epoch_permutation
from mfx.models.mf import MFModel

__all__ = [
    "bpr_minibatch_update",
    "bpr_compute_deltas",
    "bpr_apply_deltas",
    "train_epochs_bpr",
]


def bpr_compute_deltas(model, users, pos, neg, weights, lr, reg):
    """Per-triple deltas from the snapshot (for DP delta exchange).
    Returns (d_pu, d_qi, d_qj, loss_sum)."""
    pu = jnp.take(model.P, users, axis=0)
    qi = jnp.take(model.Q, pos, axis=0)
    qj = jnp.take(model.Q, neg, axis=0)
    x = jnp.sum(pu * (qi - qj), axis=-1)
    e = jax.nn.sigmoid(-x) * weights  # d(-ln σ(x))/dx = -σ(-x)
    w = weights[:, None]
    d_pu = lr * (e[:, None] * (qi - qj) - reg * w * pu)
    d_qi = lr * (e[:, None] * pu - reg * w * qi)
    d_qj = lr * (-e[:, None] * pu - reg * w * qj)
    loss = jnp.sum(-jnp.log(jax.nn.sigmoid(x) + 1e-12) * weights)
    return d_pu, d_qi, d_qj, loss


def bpr_apply_deltas(model, users, pos, neg, d_pu, d_qi, d_qj):
    mode = "promise_in_bounds"
    dt = model.P.dtype
    new_p = model.P.at[users].add(d_pu.astype(dt), mode=mode)
    new_q = model.Q.at[pos].add(d_qi.astype(dt), mode=mode)
    new_q = new_q.at[neg].add(d_qj.astype(dt), mode=mode)
    return MFModel(P=new_p, Q=new_q, bu=model.bu, bi=model.bi, mu=model.mu)


def bpr_minibatch_update(model, users, pos, neg, weights, lr, reg):
    """One fused BPR minibatch step. Returns (model, batch_loss_sum)."""
    d_pu, d_qi, d_qj, loss = bpr_compute_deltas(
        model, users, pos, neg, weights, lr, reg
    )
    return bpr_apply_deltas(model, users, pos, neg, d_pu, d_qi, d_qj), loss


@jax.jit
def _epoch_scan(model, batches, lr, reg):
    def body(m, b):
        m, loss = bpr_minibatch_update(
            m, b["users"], b["pos"], b["neg"], b["weights"], lr, reg
        )
        return m, loss

    model, losses = jax.lax.scan(body, model, batches)
    return model, jnp.sum(losses)


def _pad_triples(u, i, j, batch_size):
    n = len(u)
    nb = max(1, -(-n // batch_size))
    users = np.zeros((nb, batch_size), np.int32)
    pos = np.zeros((nb, batch_size), np.int32)
    neg = np.zeros((nb, batch_size), np.int32)
    w = np.zeros((nb, batch_size), np.float32)
    flat = nb * batch_size
    users.reshape(flat)[:n] = u
    pos.reshape(flat)[:n] = i
    neg.reshape(flat)[:n] = j
    w.reshape(flat)[:n] = 1.0
    return {
        "users": jnp.asarray(users),
        "pos": jnp.asarray(pos),
        "neg": jnp.asarray(neg),
        "weights": jnp.asarray(w),
    }


@functools.partial(jax.jit, static_argnames=("batch_size", "num_items"))
def _epoch_triples_device(
    u_dev, i_dev, pu, pi, key_perm, key_neg, *, batch_size, num_items,
    cdf=None,
):
    """One epoch's padded triple batches built entirely on device: seeded
    permutation, exact negatives (sample_negatives_device — or
    popularity-weighted ones when ``cdf`` is given), padding."""
    from mfx.data.bpr import (
        sample_negatives_device,
        sample_negatives_weighted_device,
    )

    n = u_dev.shape[0]
    perm = jax.random.permutation(key_perm, n)
    u = u_dev[perm]
    i = i_dev[perm]
    if cdf is not None:
        # fallback = the positive itself: a residual collision becomes a
        # zero-gradient pair instead of training against a true positive
        j = sample_negatives_weighted_device(key_neg, u, pu, pi, cdf,
                                             fallback=i)
    else:
        j = sample_negatives_device(key_neg, u, pu, pi, num_items)
    nb = max(1, -(-n // batch_size))
    pad = nb * batch_size - n
    w = jnp.pad(jnp.ones((n,), jnp.float32), (0, pad))
    shape = (nb, batch_size)
    return {
        "users": jnp.pad(u, (0, pad)).reshape(shape),
        "pos": jnp.pad(i, (0, pad)).reshape(shape),
        "neg": jnp.pad(j, (0, pad)).reshape(shape),
        "weights": w.reshape(shape),
    }


def train_epochs_bpr(
    model: MFModel,
    train: RatingsCOO,
    cfg: BPRConfig,
    seed: int = 0,
    start_epoch: int = 0,
) -> Iterator[tuple[int, MFModel, float]]:
    """Yields (epoch, model, mean_pairwise_loss).

    With ``cfg.sample_device`` device (or auto on TPU), per-epoch prep —
    permutation, exact negative rejection, batch padding — runs on the
    accelerator (directive #8); host per-epoch work is O(1)."""
    use_dev = cfg.sample_device == "device" or (
        cfg.sample_device == "auto" and jax.default_backend() == "tpu"
    )
    weighting = getattr(cfg, "neg_weighting", "uniform")
    cdf = cdf_dev = None
    if weighting == "popularity":
        from mfx.data.bpr import popularity_cdf

        cdf = popularity_cdf(train.item, train.num_items,
                             getattr(cfg, "neg_beta", 0.75))
    if use_dev:
        from mfx.data.bpr import build_positive_index_device

        u_dev = jnp.asarray(train.user, jnp.int32)
        i_dev = jnp.asarray(train.item, jnp.int32)
        pu, pi = build_positive_index_device(u_dev, i_dev)
        base = jax.random.key(seed + cfg.neg_seed)
        if cdf is not None:
            from mfx.data.bpr import split_cdf_f32

            # double-single pair: a plain f32 cast would zero out
            # long-tail item mass at large-catalog scale
            cdf_dev = split_cdf_f32(cdf)
    else:
        pos_keys = build_positive_index(train)  # exact negatives
    for epoch in range(start_epoch, cfg.epochs):
        if use_dev:
            kp = jax.random.fold_in(jax.random.fold_in(base, 0xBE), epoch)
            kn = jax.random.fold_in(jax.random.fold_in(base, 0xB1), epoch)
            batches = _epoch_triples_device(
                u_dev, i_dev, pu, pi, kp, kn,
                batch_size=cfg.batch_size, num_items=train.num_items,
                cdf=cdf_dev,
            )
        else:
            perm = epoch_permutation(train.n_ratings, seed, epoch)
            u, i, j = bpr_epoch_triples(
                train, cfg.neg_seed + seed, epoch, perm, pos_keys=pos_keys,
                cdf=cdf,
            )
            batches = _pad_triples(u, i, j, cfg.batch_size)
        model, loss = _epoch_scan(
            model,
            batches,
            jnp.asarray(cfg.lr, model.P.dtype),
            jnp.asarray(cfg.reg, model.P.dtype),
        )
        yield epoch, model, float(loss) / max(1, train.n_ratings)
