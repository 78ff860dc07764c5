"""dense_chi < 0 ('auto'): cost-model stratum carving from the occupancy
histogram (VERDICT r3 #1/#5 — the dense/sparse boundary adapts to the
data's 2-D skew instead of a hand-swept chi)."""

import dataclasses

import numpy as np
import pytest

from mfx.config import SGDConfig
from mfx.data import synthetic
from mfx.models import init_model
from mfx.solvers import dense_prep as dp
from mfx.solvers.blocked import train_epochs_blocked

CFG = SGDConfig(
    lr=0.02, reg=0.02, epochs=2, partitioner="blocked", kernel="pallas",
    ublock=128, iblock=128, tile=64, dense_span="full", dense_chi=-1.0,
    bias_mode="lane",
)


def test_auto_threshold_uniform_counts_goes_all_dense():
    # every stratum near the mean: nothing below breakeven saves enough
    counts = np.full(64, 500.0)
    t = dp.auto_dense_threshold(counts, 1024, 1024, "int4")
    assert t == 1.0


def _model_breakeven(su, si, slot):
    t_dense = su * si * slot / (dp.AUTO_STREAM_GBPS * 1e9) + (
        dp.AUTO_FIXED_US * 1e-6
    )
    return t_dense / (dp.AUTO_SPARSE_NS * 1e-9)


def test_auto_threshold_skewed_counts_carves():
    # hot corner + long empty-ish tail: the tail goes sparse
    counts = np.concatenate([np.full(8, 50_000.0), np.full(4096, 30.0)])
    t = dp.auto_dense_threshold(counts, 1024, 1024, "int4")
    assert t == pytest.approx(_model_breakeven(1024, 1024, 0.5))
    assert 30.0 < t < 50_000.0
    # calibration pin: the decomposed model must keep the r4-measured
    # optimum boundary at the preset geometry (chi sweep optimum was
    # 1000-1500 ratings/stratum at 1024^2 int4)
    assert 1000.0 < t < 1500.0


def test_auto_threshold_int8_adds_stream_term():
    # int8 doubles the R-STREAM term only; the per-grid-step fixed cost
    # is byte-format-independent
    counts = np.concatenate([np.full(8, 50_000.0), np.full(4096, 30.0)])
    t4 = dp.auto_dense_threshold(counts, 1024, 1024, "int4")
    t8 = dp.auto_dense_threshold(counts, 1024, 1024, "int8")
    extra = 1024 * 1024 * 0.5 / (dp.AUTO_STREAM_GBPS * 1e9) / (
        dp.AUTO_SPARSE_NS * 1e-9
    )
    assert t8 == pytest.approx(t4 + extra)


def test_auto_threshold_is_spg_invariant():
    # MEASURED (r5 su-x-spg sweep): grid-step batching does not amortize
    # the per-stratum fixed cost (it is per-cell VPU work), so spg must
    # NOT move the carving boundary — dividing it by spg over-carved
    # (3,077 strata / 79 ms vs 2,299 / 71.8 ms within-job)
    counts = np.concatenate([np.full(8, 50_000.0), np.full(4096, 30.0)])
    t1 = dp.auto_dense_threshold(counts, 512, 512, "int4", spg=1)
    t4 = dp.auto_dense_threshold(counts, 512, 512, "int4", spg=4)
    assert t4 == t1


def test_auto_chi_trains_bitwise_like_equivalent_explicit_chi():
    """The auto boundary is just a chi value: training with dense_chi=-1
    must be bitwise-identical to the explicit chi it resolves to."""
    coo = synthetic.make_synthetic(
        512, 512, 40_000, rank=4, seed=9, user_zipf_s=0.8
    )

    # resolve what auto picks at this geometry
    import jax.numpy as jnp

    _, _, _, info = dp.prepare_dense_full(
        jnp.asarray(coo.user), jnp.asarray(coo.item),
        jnp.asarray(coo.rating), 512, 512, 128, 128,
        chi_min=-1.0, nwd=2, pack=2, rfmt="int8",
    )
    chi_eff = info["chi_effective"]
    assert info["dense_frac"] > 0

    def run(chi):
        cfg = dataclasses.replace(CFG, dense_chi=chi)
        m = init_model(3, 512, 512, 64, global_mean=coo.global_mean)
        for _, m, _ in train_epochs_blocked(
            m, coo, cfg, use_bias=True, seed=0, interpret=True
        ):
            pass
        return m.materialize()

    auto = run(-1.0)
    explicit = run(chi_eff)
    np.testing.assert_array_equal(np.asarray(auto.P), np.asarray(explicit.P))
    np.testing.assert_array_equal(np.asarray(auto.Q), np.asarray(explicit.Q))
    np.testing.assert_array_equal(np.asarray(auto.bu), np.asarray(explicit.bu))


def test_auto_chi_requires_full_span():
    with pytest.raises(ValueError, match="dense_span='full'"):
        SGDConfig(kernel="pallas", dense_chi=-1.0, dense_span="head")
