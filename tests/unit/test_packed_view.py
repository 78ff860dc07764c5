"""Lazy PackedModel view contract: a view from a previous epoch is
invalidated when the blocked generator advances (the trainer donates its
backing buffers) — stale access must fail loudly, not read garbage
(VERDICT round 2, Weak #5)."""

import numpy as np
import pytest

from mfx.config import SGDConfig
from mfx.data import synthetic, train_test_split
from mfx.models import init_model
from mfx.solvers.blocked import train_epochs_blocked


def _gen(epochs=3):
    coo = synthetic.make_synthetic(300, 260, 4_000, rank=4, seed=0)
    train, _ = train_test_split(coo, test_frac=0.1, seed=0)
    model = init_model(0, coo.num_users, coo.num_items, rank=64,
                       global_mean=train.global_mean)
    cfg = SGDConfig(
        lr=0.01, reg=0.02, epochs=epochs, partitioner="blocked",
        kernel="pallas", ublock=128, iblock=128, tile=64,
    )
    return train_epochs_blocked(
        model, train, cfg, use_bias=True, seed=0, interpret=True
    )


def test_stale_view_raises():
    gen = _gen()
    _, view0, _ = next(gen)
    next(gen)  # advancing donates view0's buffers
    with pytest.raises(RuntimeError, match="stale"):
        view0.materialize()
    with pytest.raises(RuntimeError, match="stale"):
        _ = view0.P  # attribute forwarding also fails loudly


def test_materialized_before_advance_stays_valid():
    gen = _gen()
    _, view0, _ = next(gen)
    m0 = view0.materialize()  # consume BEFORE advancing: the contract
    p0 = np.asarray(m0.P).copy()
    next(gen)
    # the materialized copy survives the invalidation
    np.testing.assert_array_equal(np.asarray(view0.materialize().P), p0)
    assert np.isfinite(p0).all()
