"""Parallel-mode config validation: kernel/partitioner fields a parallel
mode would silently ignore must raise (regression: the netflix preset used
to ask for the Pallas kernel under mode='dp' and silently get the scatter
baseline)."""

import dataclasses

import pytest

from mfx.config import PRESETS, SGDConfig, TrainConfig, ParallelConfig
from mfx.train.driver import _validate_parallel_sgd


def _cfg(mode, **sgd_kw):
    return TrainConfig(
        sgd=SGDConfig(**sgd_kw),
        parallel=ParallelConfig(mode=mode, data_axis=2, model_axis=2),
    )


def test_dp_rejects_pallas_kernel():
    with pytest.raises(ValueError, match="ignores"):
        _validate_parallel_sgd(_cfg("dp", kernel="pallas", partitioner="blocked"))


def test_dp_rejects_blocked_partitioner():
    with pytest.raises(ValueError):
        _validate_parallel_sgd(_cfg("dp", kernel="jnp", partitioner="blocked"))


def test_dp_accepts_fixed_jnp():
    _validate_parallel_sgd(_cfg("dp", kernel="jnp", partitioner="fixed"))


def test_all_presets_pass_validation():
    for name, cfg in PRESETS.items():
        if cfg.solver == "sgd" and cfg.parallel.mode != "single":
            _validate_parallel_sgd(cfg)


def test_netflix_preset_runs_fused_ring_and_keeps_dup_trust():
    # round 3 re-pointed configs[3] at the fused Pallas ring; dup_trust
    # stays set for the mode=dp override composition (the divergence
    # guard the DP path needs on Zipf-skewed data)
    cfg = PRESETS["netflix100m_rank128_dp"]
    assert cfg.sgd.partitioner == "blocked" and cfg.sgd.kernel == "pallas"
    assert cfg.parallel.mode == "sharded"
    assert cfg.sgd.dup_trust > 0.0


def test_sharded_accepts_full_dense_span():
    # the ring carves grouped full-span strata per cell
    # (prepare_dense_ring_full), so the single-chip preset's dense_span
    # composes with sharded/hybrid modes
    _validate_parallel_sgd(
        _cfg("sharded", kernel="pallas", partitioner="blocked",
             dense_chi=0.001, dense_span="full")
    )


def test_dense_echo_config_bounds():
    import pytest
    from mfx.config import SGDConfig

    with pytest.raises(ValueError, match="dense_echo"):
        SGDConfig(dense_echo=0)
    with pytest.raises(ValueError, match="dense_echo"):
        SGDConfig(dense_echo=2, bias_mode="epoch", kernel="pallas",
                  plan_device="device")


def test_sharded_dense_echo_needs_lane():
    import dataclasses

    import pytest

    from mfx.config import ModelConfig

    biased = dataclasses.replace(
        _cfg("sharded", kernel="pallas", partitioner="blocked",
             dense_chi=0.001, dense_echo=2),
        model=ModelConfig(rank=64, use_bias=True),
    )
    with pytest.raises(ValueError, match="dense_echo"):
        _validate_parallel_sgd(biased)
    # lane biases (or a bias-free model) make it legal
    _validate_parallel_sgd(
        dataclasses.replace(
            biased,
            sgd=dataclasses.replace(biased.sgd, bias_mode="lane"),
        )
    )
    _validate_parallel_sgd(
        _cfg("sharded", kernel="pallas", partitioner="blocked",
             dense_chi=0.001, dense_echo=2)
    )


def test_sharded_rejects_dense_spg():
    """dense_spg > 1 has no ring prep path — the driver must reject it
    loudly instead of silently training at spg=1."""
    import pytest

    from mfx.config import apply_overrides, preset
    from mfx.train.driver import _validate_parallel_sgd

    cfg = apply_overrides(preset("ml25m_rank64"), [
        "parallel.mode=sharded", "sgd.dense_spg=2",
    ])
    with pytest.raises(ValueError, match="dense_spg"):
        _validate_parallel_sgd(cfg)
