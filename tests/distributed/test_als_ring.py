"""Ring-sharded ALS (K3 x P2): no-gather sharded tables, rotating fixed
blocks, local Gram accumulation (mfx/parallel/als_ring.py)."""

import jax
import numpy as np
import pytest

from mfx.config import ALSConfig
from mfx.data import synthetic, train_test_split
from mfx.eval import rmse
from mfx.models import init_model
from mfx.runtime.mesh import make_mesh
from mfx.solvers.als import train_sweeps_als
from mfx.parallel.als_ring import train_sweeps_als_ring

requires_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _final(gen):
    for _, model in gen:
        pass
    return model


@requires_8
def test_als_ring_matches_single_device():
    """S ring sub-steps accumulate exactly the cells the single-device
    sweep folds in one pass — same bucketed pieces, different grouping
    and order, so f32 tolerance rather than bitwise."""
    coo = synthetic.make_synthetic(300, 250, 15_000, rank=6, noise=0.25,
                                   seed=3)
    train, _ = train_test_split(coo, test_frac=0.1, seed=0)
    cfg = ALSConfig(reg=0.01, sweeps=2, user_chunk=128)
    mesh = make_mesh(model=4)

    m0 = init_model(2, 300, 250, 8, global_mean=train.global_mean)
    ref = _final(train_sweeps_als(m0, train, cfg, use_bias=True))
    got = _final(train_sweeps_als_ring(m0, train, cfg, mesh, use_bias=True))
    for a, b in ((got.P, ref.P), (got.Q, ref.Q), (got.bu, ref.bu),
                 (got.bi, ref.bi)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
        )


@requires_8
def test_als_ring_no_bias_and_deterministic():
    coo = synthetic.make_synthetic(200, 160, 9_000, rank=4, noise=0.3,
                                   seed=5)
    train, test = train_test_split(coo, test_frac=0.1, seed=0)
    cfg = ALSConfig(reg=0.02, sweeps=2, user_chunk=64)
    mesh = make_mesh(model=8)
    m0 = init_model(7, 200, 160, 8, global_mean=train.global_mean)

    runs = [
        _final(train_sweeps_als_ring(m0, train, cfg, mesh, use_bias=False,
                                     seed=11))
        for _ in range(2)
    ]
    np.testing.assert_array_equal(np.asarray(runs[0].P),
                                  np.asarray(runs[1].P))
    np.testing.assert_array_equal(np.asarray(runs[0].Q),
                                  np.asarray(runs[1].Q))
    # biases untouched in the no-bias mode
    np.testing.assert_array_equal(np.asarray(runs[0].bu),
                                  np.asarray(m0.bu))
    # and it actually fits the data
    assert rmse(runs[0], train) < 0.45


@requires_8
def test_als_ring_mesh_of_1_matches_single_device():
    """Degenerate ring (S=1): one cell, one sub-step — the plan reduces
    to the single-device bucket plan over shuffled ids."""
    coo = synthetic.make_synthetic(120, 90, 4_000, rank=3, noise=0.2,
                                   seed=9)
    train, _ = train_test_split(coo, test_frac=0.1, seed=0)
    cfg = ALSConfig(reg=0.05, sweeps=1, user_chunk=64)
    m0 = init_model(1, 120, 90, 8, global_mean=train.global_mean)
    ref = _final(train_sweeps_als(m0, train, cfg, use_bias=True))
    got = _final(
        train_sweeps_als_ring(m0, train, cfg, make_mesh(model=1),
                              use_bias=True)
    )
    np.testing.assert_allclose(
        np.asarray(got.P), np.asarray(ref.P), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(got.Q), np.asarray(ref.Q), rtol=2e-4, atol=2e-4
    )


@requires_8
def test_device_plan_bitwise_matches_host_plan():
    """The device-assisted planner (stable device argsort on the same
    composite key as the host np.lexsort) must produce BITWISE the same
    piece slabs, cols/vals slabs, and trained model."""
    from mfx.parallel.als_ring import (
        build_ring_als_plan,
        build_ring_als_plan_device,
    )
    import dataclasses

    coo = synthetic.make_synthetic(220, 180, 11_000, rank=5, noise=0.25,
                                   seed=9)
    train, _ = train_test_split(coo, test_frac=0.1, seed=0)
    mesh = make_mesh(model=4)

    rng = np.random.default_rng(3)
    # shuffled relabelings as the trainer produces
    ufwd = rng.permutation(220).astype(np.int32)
    ifwd = rng.permutation(180).astype(np.int32)
    urel, irel = ufwd[train.user], ifwd[train.item]
    S, ub, ib, rc = 4, 64, 48, 32
    host = build_ring_als_plan(urel, irel, train.rating, S, ub * S // S,
                               ib, rc, mesh)
    dev = build_ring_als_plan_device(urel, irel, train.rating, S, ub,
                                     ib, rc, mesh)
    np.testing.assert_array_equal(np.asarray(host.cols), np.asarray(dev.cols))
    np.testing.assert_array_equal(np.asarray(host.vals), np.asarray(dev.vals))
    assert set(host.pieces) == set(dev.pieces)
    for cap in host.pieces:
        np.testing.assert_array_equal(
            np.asarray(host.pieces[cap]), np.asarray(dev.pieces[cap])
        )
        np.testing.assert_array_equal(host.nchunks[cap], dev.nchunks[cap])

    # end-to-end: trained tables bitwise-equal across planner choices
    cfg_h = ALSConfig(reg=0.02, sweeps=1, user_chunk=64, plan_device="host")
    cfg_d = dataclasses.replace(cfg_h, plan_device="device")
    m0 = init_model(4, 220, 180, 8, global_mean=train.global_mean)
    mh = _final(train_sweeps_als_ring(m0, train, cfg_h, mesh, use_bias=True,
                                      seed=2))
    md = _final(train_sweeps_als_ring(m0, train, cfg_d, mesh, use_bias=True,
                                      seed=2))
    for f in ("P", "Q", "bu", "bi"):
        np.testing.assert_array_equal(
            np.asarray(getattr(mh, f)), np.asarray(getattr(md, f))
        )
