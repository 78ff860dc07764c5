"""Bitwise-determinism guarantees (BASELINE.json north star; SURVEY.md §4.2)."""

import numpy as np

from mfx.config import SGDConfig
from mfx.data import synthetic
from mfx.models import init_model
from mfx.solvers.sgd import train_epochs


def _run(partitioner: str, seed: int = 0):
    coo = synthetic.make_synthetic(120, 150, 6000, rank=4, seed=5)
    model = init_model(4, 120, 150, 4, global_mean=coo.global_mean)
    cfg = SGDConfig(
        lr=0.02, reg=0.03, epochs=3, batch_size=128, partitioner=partitioner
    )
    for _, model, _ in train_epochs(model, coo, cfg, use_bias=True, seed=seed):
        pass
    return model


def test_bitwise_deterministic_fixed_partitioner():
    a, b = _run("fixed"), _run("fixed")
    np.testing.assert_array_equal(np.asarray(a.P), np.asarray(b.P))
    np.testing.assert_array_equal(np.asarray(a.Q), np.asarray(b.Q))
    np.testing.assert_array_equal(np.asarray(a.bu), np.asarray(b.bu))
    np.testing.assert_array_equal(np.asarray(a.bi), np.asarray(b.bi))


def test_bitwise_deterministic_conflict_free():
    a, b = _run("conflict_free"), _run("conflict_free")
    np.testing.assert_array_equal(np.asarray(a.P), np.asarray(b.P))
    np.testing.assert_array_equal(np.asarray(a.Q), np.asarray(b.Q))


def test_seed_changes_result():
    a, b = _run("fixed", seed=0), _run("fixed", seed=1)
    assert not np.array_equal(np.asarray(a.P), np.asarray(b.P))
