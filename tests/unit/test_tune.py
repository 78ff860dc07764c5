"""Batched hyperparameter sweep (mfx.tune) — each vmapped point must equal
its solo train_epochs run, and ranking must pick the held-out winner."""

import numpy as np
import pytest

from mfx.config import SGDConfig
from mfx.data import synthetic
from mfx.data.split import train_test_split
from mfx.models import init_model
from mfx.solvers.sgd import train_epochs
from mfx.tune import sweep_sgd


def _data(seed=0):
    coo = synthetic.make_synthetic(60, 80, 2400, rank=4, seed=seed)
    return train_test_split(coo, test_frac=0.15, seed=0)


def _cfg(**kw):
    base = dict(
        lr=0.0, reg=0.0, epochs=3, batch_size=256,
        partitioner="conflict_free", kernel="jnp", dup_trust=16.0,
        lr_decay=0.9,
    )
    base.update(kw)
    return SGDConfig(**base)


def test_sweep_points_match_solo_runs():
    train, test = _data()
    cfg = _cfg()
    points = [(0.01, 0.02), (0.03, 0.02), (0.03, 0.1), (0.08, 0.05)]
    res = sweep_sgd(train, test, cfg, rank=6, points=points, seed=3)
    assert len(res.points) == 4
    assert res.history.shape == (cfg.epochs, 4)
    for h, (lr, reg) in enumerate(points):
        solo_cfg = _cfg(lr=lr, reg=reg)
        model = init_model(
            3, train.num_users, train.num_items, 6,
            global_mean=train.global_mean,
        )
        for _ep, model, tr in train_epochs(
            model, train, solo_cfg, use_bias=True, seed=3
        ):
            pass
        # identical batch stream + identical update rule -> the vmapped
        # trajectory is the solo trajectory up to vmap'd-op rounding
        np.testing.assert_allclose(
            res.history[-1][h], tr, rtol=1e-5, atol=1e-6
        )
        if h == res.best_index:
            np.testing.assert_allclose(
                np.asarray(res.model.P), np.asarray(model.P),
                rtol=1e-5, atol=1e-6,
            )
            np.testing.assert_allclose(
                np.asarray(res.model.bu), np.asarray(model.bu),
                rtol=1e-5, atol=1e-6,
            )


def test_sweep_grid_and_ranking():
    train, test = _data(seed=1)
    # 2x2 grid, lr-major; include an absurd lr that diverges or fits badly
    res = sweep_sgd(
        train, test, _cfg(epochs=4), rank=6,
        lrs=[0.03, 30.0], regs=[0.02, 0.05], seed=0,
    )
    assert [(p["lr"], p["reg"]) for p in res.points] == [
        (0.03, 0.02), (0.03, 0.05), (30.0, 0.02), (30.0, 0.05),
    ]
    assert res.best["lr"] == 0.03  # the absurd lr must never win
    finite = [p["test_rmse"] for p in res.points if np.isfinite(p["test_rmse"])]
    assert res.best["test_rmse"] == min(finite)
    assert res.model.P.shape == (train.num_users, 6)


def test_sweep_validation():
    train, test = _data()
    with pytest.raises(ValueError, match="points"):
        sweep_sgd(train, test, _cfg(), rank=4)
    with pytest.raises(ValueError, match="partitioner"):
        sweep_sgd(
            train, test, _cfg(partitioner="blocked"), rank=4,
            points=[(0.01, 0.02)],
        )
