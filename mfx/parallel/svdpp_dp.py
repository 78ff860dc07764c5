"""Data-parallel SVD++ (SURVEY.md M-family x P1).

The epoch decomposition of mfx/solvers/svdpp.py composes directly with
the P1 sparse-delta exchange:

- the minibatch phase over ``X = P + S`` is EXACTLY the DP-SGD epoch
  (mfx/parallel/data_parallel.py::make_dp_epoch_fn): each replica
  computes its batch shard's deltas from the replicated snapshot, the
  sparse (ids, deltas) pairs all-gather, and every replica applies the
  identical scatter — bitwise-equal to the single-device minibatch
  phase on the same batch stream;
- the implicit-sum refresh and the exact batched Y step are
  deterministic replicated one-table programs on run-constant streams
  (the same jitted functions the single-device trainer runs), so
  replicas stay identical through them.

Hence DP SVD++ is bitwise-equal to single-device SVD++ whenever the
batch stream matches (batch_size divisible by the data-axis size) —
asserted in tests/distributed/test_svdpp_dp.py.
"""

from __future__ import annotations

from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mfx.config import SVDPPConfig
from mfx.data.coo import RatingsCOO
from mfx.data import partition as part
from mfx.data.split import epoch_permutation
from mfx.models.mf import MFModel
from mfx.models.svdpp import SVDppModel, implicit_sums
from mfx.parallel.data_parallel import make_dp_epoch_fn
from mfx.runtime.mesh import DATA_AXIS
from mfx.solvers.svdpp import svdpp_run_constants, y_gradient_step

__all__ = ["train_epochs_svdpp_dp"]


def train_epochs_svdpp_dp(
    model: MFModel,
    train: RatingsCOO,
    cfg: SVDPPConfig,
    use_bias: bool,
    mesh: Mesh,
    seed: int = 0,
    start_epoch: int = 0,
    chunk: int = 1 << 22,
) -> Iterator[tuple[int, MFModel, float]]:
    """DP mirror of ``train_epochs_svdpp``; yields (epoch, mf_view, rmse)."""
    if start_epoch != 0:
        raise ValueError(
            "svdpp cannot resume from an MF-view checkpoint (the implicit "
            "Y table is not in it); save/restore SVDppModel.save_npz for "
            "warm starts, or rerun from epoch 0"
        )
    if cfg.partitioner != "fixed":
        raise ValueError(
            "DP svdpp runs the fixed-partitioner delta-exchange epoch "
            "(as DP SGD does); set svdpp.partitioner='fixed'"
        )
    user_dev, item_dev, nu, deg_i, y_scale, chunks = svdpp_run_constants(
        model, train, cfg, chunk
    )
    state = SVDppModel(
        P=model.P, Q=model.Q, Y=jnp.zeros_like(model.Q),
        bu=model.bu, bi=model.bi, mu=model.mu, nu=nu,
    )
    ndata = mesh.shape[DATA_AXIS]
    bsz = -(-cfg.batch_size // ndata) * ndata
    epoch_fn = make_dp_epoch_fn(mesh, use_bias, dup_trust=cfg.dup_trust)
    batch_sharding = NamedSharding(mesh, P(None, DATA_AXIS))
    lr_y = cfg.lr if cfg.lr_y is None else cfg.lr_y
    reg_y = cfg.reg if cfg.reg_y is None else cfg.reg_y
    dt = model.P.dtype

    S = implicit_sums(state.Y, user_dev, item_dev, state.nu)  # zeros at init
    for epoch in range(cfg.epochs):
        lr = cfg.lr * (cfg.lr_decay ** epoch)
        perm = epoch_permutation(train.n_ratings, seed, epoch)
        arrays = part.pad_to_batches(
            train.user, train.item, train.rating, perm, bsz,
            num_users=train.num_users, num_items=train.num_items,
        )
        batches = {
            k: jax.device_put(v, batch_sharding) for k, v in arrays.items()
        }
        mf = MFModel(P=state.P + S, Q=state.Q, bu=state.bu, bi=state.bi,
                     mu=state.mu)
        mf, sse = epoch_fn(
            mf, batches, jnp.asarray(lr, dt), jnp.asarray(cfg.reg, dt)
        )
        lr_y_t = lr_y * (cfg.lr_decay ** epoch)
        Ynew, _ = y_gradient_step(
            state.Y, mf.P, mf.Q, mf.bu, mf.bi, mf.mu, state.nu, deg_i,
            y_scale, chunks, jnp.asarray(lr_y_t, dt),
            jnp.asarray(reg_y, dt), use_bias=use_bias,
        )
        state = SVDppModel(
            P=mf.P - S, Q=mf.Q, Y=Ynew, bu=mf.bu, bi=mf.bi, mu=mf.mu,
            nu=state.nu,
        )
        S = implicit_sums(state.Y, user_dev, item_dev, state.nu)
        train_rmse = float(jnp.sqrt(sse / max(1, train.n_ratings)))
        yield epoch, state.as_mf(S), train_rmse
