"""Driver-level routing of the parallel modes on the virtual CPU mesh."""

import jax
import numpy as np
import pytest

from mfx.config import apply_overrides, preset
from mfx.train.driver import train

requires_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _small(overrides, tmp_path):
    base = [
        "data.dataset=synthetic-small",
        f"data.root={tmp_path}",
        "sgd.epochs=2",
        "sgd.batch_size=2048",
        "sgd.partitioner=fixed",
        "model.rank=8",
    ]
    return apply_overrides(preset("ml100k_rank16"), base + overrides)


@requires_8
@pytest.mark.parametrize(
    "mode,axes",
    [
        ("dp", ["parallel.data_axis=4"]),
        ("sharded", ["parallel.model_axis=4"]),
        ("hybrid", ["parallel.data_axis=2", "parallel.model_axis=4"]),
    ],
)
def test_driver_parallel_modes(tmp_path, mode, axes):
    cfg = _small([f"parallel.mode={mode}"] + axes, tmp_path)
    result = train(cfg, resume=False)
    assert result.epochs_run == 2
    assert 0 < result.test_rmse < 1.5
    assert result.history[0]["updates_per_sec_per_chip"] > 0


@requires_8
def test_driver_hybrid_pallas_routes_to_flattened_fused_ring(tmp_path):
    """VERDICT r3 #6: 2-D meshes with the fused kernel must NOT run the
    scatter-path hybrid — the driver flattens ('data','model') into one
    fused-Pallas DSGD ring, so hybrid+pallas and sharded+pallas train
    identically (same ring over the same 8 devices)."""
    pallas = [
        "sgd.partitioner=blocked", "sgd.kernel=pallas",
        "sgd.ublock=128", "sgd.iblock=128", "sgd.tile=64",
    ]
    cfg_h = _small(
        ["parallel.mode=hybrid", "parallel.data_axis=2",
         "parallel.model_axis=4"] + pallas, tmp_path,
    )
    cfg_s = _small(
        ["parallel.mode=sharded", "parallel.model_axis=8"] + pallas,
        tmp_path,
    )
    res_h = train(cfg_h, resume=False)
    res_s = train(cfg_s, resume=False)
    assert res_h.epochs_run == res_s.epochs_run == 2
    assert res_h.test_rmse == res_s.test_rmse


@requires_8
def test_driver_bpr_sharded(tmp_path):
    cfg = apply_overrides(
        preset("billion_bpr_sharded"),
        [
            "data.dataset=synthetic-small",
            f"data.root={tmp_path}",
            "data.test_frac=0.1",
            "bpr.epochs=2",
            "bpr.batch_size=1024",
            "model.rank=8",
            "parallel.model_axis=4",
        ],
    )
    result = train(cfg, resume=False)
    assert result.epochs_run == 2
    assert result.test_auc is not None and 0.3 < result.test_auc < 1.0


def test_driver_bf16_tables(tmp_path):
    cfg = _small(["model.dtype=bfloat16"], tmp_path)
    result = train(cfg, resume=False)
    import jax.numpy as jnp

    assert result.model.P.dtype == jnp.bfloat16
    assert result.epochs_run == 2


def test_driver_rejects_bf16_pallas(tmp_path):
    cfg = _small(
        ["model.dtype=bfloat16", "sgd.partitioner=blocked", "sgd.kernel=pallas"],
        tmp_path,
    )
    with pytest.raises(ValueError, match="float32"):
        train(cfg, resume=False)


@requires_8
def test_driver_als_dp(tmp_path):
    """solver=als + a parallel mode routes to the sharded-Gram DP sweeps."""
    cfg = _small(
        [
            "solver=als",
            "parallel.mode=dp",
            "parallel.data_axis=8",
            "als.sweeps=2",
            "als.user_chunk=64",
            "als.reg=0.01",
        ],
        tmp_path,
    )
    result = train(cfg, resume=False)
    assert result.epochs_run == 2
    assert 0 < result.test_rmse < 1.0


@requires_8
def test_driver_als_ring(tmp_path):
    """solver=als + parallel.mode=sharded routes to the no-gather ring
    sweeps (mfx/parallel/als_ring.py)."""
    cfg = _small(
        [
            "solver=als",
            "parallel.mode=sharded",
            "parallel.model_axis=4",
            "als.sweeps=2",
            "als.user_chunk=64",
            "als.reg=0.01",
        ],
        tmp_path,
    )
    result = train(cfg, resume=False)
    assert result.epochs_run == 2
    assert 0 < result.test_rmse < 1.0
