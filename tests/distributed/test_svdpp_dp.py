"""Data-parallel SVD++ (mfx/parallel/svdpp_dp.py) vs single-device —
the minibatch phase rides the P1 delta exchange (bitwise-equal on the
same batch stream) and the Y step is a replicated deterministic
program, so the whole trainer must match bitwise."""

import jax
import numpy as np
import pytest

from mfx.config import (
    DataConfig,
    ModelConfig,
    ParallelConfig,
    SVDPPConfig,
    TrainConfig,
)
from mfx.data.coo import RatingsCOO
from mfx.models.mf import init_model
from mfx.parallel.svdpp_dp import train_epochs_svdpp_dp
from mfx.runtime.mesh import make_mesh
from mfx.solvers.svdpp import train_epochs_svdpp

requires_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _coo(U=80, I=50, n=900, seed=5):
    rng = np.random.default_rng(seed)
    return RatingsCOO(
        user=rng.integers(0, U, n).astype(np.int32),
        item=rng.integers(0, I, n).astype(np.int32),
        rating=rng.uniform(1, 5, n).astype(np.float32),
        num_users=U,
        num_items=I,
    )


@requires_8
def test_svdpp_dp_bitwise_matches_single_device():
    coo = _coo()
    # batch_size divisible by the data axis -> identical batch stream
    cfg = SVDPPConfig(lr=0.02, reg=0.05, lr_decay=0.9, epochs=3,
                      batch_size=128)
    m0 = init_model(2, coo.num_users, coo.num_items, rank=8,
                    global_mean=3.4)

    single = None
    for _, single, _ in train_epochs_svdpp(m0, coo, cfg, True, seed=7):
        pass

    mesh = make_mesh(data=4, model=2)
    dp = None
    for _, dp, _ in train_epochs_svdpp_dp(m0, coo, cfg, True, mesh, seed=7):
        pass

    for f in ("P", "Q", "bu", "bi"):
        np.testing.assert_array_equal(
            np.asarray(getattr(single, f)), np.asarray(getattr(dp, f))
        )


@requires_8
def test_driver_routes_svdpp_dp(tmp_path):
    from mfx.train.driver import train

    cfg = TrainConfig(
        name="svdpp-dp-smoke",
        solver="svdpp",
        data=DataConfig(dataset="synthetic-small", root=str(tmp_path)),
        model=ModelConfig(rank=8, use_bias=True),
        svdpp=SVDPPConfig(lr=0.02, reg=0.04, epochs=2, batch_size=2048,
                          dup_trust=8.0),
        parallel=ParallelConfig(mode="dp", data_axis=2, model_axis=4),
    )
    res = train(cfg)
    assert res.epochs_run == 2
    assert 0 < res.test_rmse < 1.5


def test_dp_svdpp_rejects_conflict_free():
    coo = _coo()
    m0 = init_model(0, coo.num_users, coo.num_items, 4, global_mean=3.0)
    mesh = make_mesh(data=1, model=1)
    with pytest.raises(ValueError, match="fixed"):
        list(train_epochs_svdpp_dp(
            m0, coo, SVDPPConfig(epochs=1, partitioner="conflict_free"),
            True, mesh,
        ))
