"""Parity gate vs. the Java-reference sequential SGD algorithm (SURVEY.md §4.2,
BASELINE.json north star: RMSE must match the Java implementation within 1e-3).

Two levels:
 1. Trajectory parity — with batch_size=1 the framework's update IS the
    sequential Java update rule; factor tables and held-out RMSE must track
    the float64 oracle to f32 precision (≪ 1e-3).
 2. Minibatch quality — conflict-free minibatch SGD (the TPU execution mode)
    must converge to the same quality as the sequential oracle. Parallel
    (within-round) application vs. strictly sequential application are
    different algorithms with a small, well-understood stationary-point gap;
    we assert it stays tiny and document the 1e-3-equivalent path is (1).
"""

import numpy as np

from mfx.config import SGDConfig
from mfx.data import synthetic, train_test_split, epoch_permutation
from mfx.eval import rmse
from mfx.models import init_model
from mfx.oracle import init_oracle, train_epoch_sequential, oracle_rmse
from mfx.oracle.java_oracle import init_oracle_from_arrays
from mfx.solvers.sgd import plan_epoch, make_epoch_fn, train_epochs


def test_stepwise_parity_batch_size_1():
    """The framework reproduces the oracle's factor tables update-for-update."""
    coo = synthetic.make_synthetic(25, 30, 300, rank=4, seed=11)
    model = init_model(3, 25, 30, 4, global_mean=coo.global_mean)
    oracle = init_oracle_from_arrays(
        model.P, model.Q, model.bu, model.bi, float(model.mu)
    )
    cfg = SGDConfig(lr=0.02, reg=0.05, epochs=2, batch_size=1, partitioner="fixed")
    epoch_fn = make_epoch_fn(cfg, use_bias=True)
    for epoch in range(2):
        order = epoch_permutation(coo.n_ratings, seed=0, epoch=epoch)
        plan = plan_epoch(coo, cfg, seed=0, epoch=epoch)
        model, _ = epoch_fn(model, plan, cfg.lr)
        train_epoch_sequential(oracle, coo, order, lr=cfg.lr, reg=cfg.reg)
    np.testing.assert_allclose(np.asarray(model.P), oracle.P, atol=5e-5)
    np.testing.assert_allclose(np.asarray(model.Q), oracle.Q, atol=5e-5)
    np.testing.assert_allclose(np.asarray(model.bu), oracle.bu, atol=5e-5)
    np.testing.assert_allclose(np.asarray(model.bi), oracle.bi, atol=5e-5)


def test_rmse_parity_sequential_semantics():
    """North-star 1e-3 gate: full training in Java-equivalent sequential mode
    lands within 1e-3 held-out RMSE of the Java oracle."""
    coo = synthetic.make_synthetic(80, 100, 4000, rank=4, noise=0.25, seed=13)
    train, test = train_test_split(coo, test_frac=0.15, seed=1)
    mu = train.global_mean
    epochs, lr, reg = 8, 0.02, 0.05

    model = init_model(5, 80, 100, 4, global_mean=mu)
    oracle = init_oracle_from_arrays(
        model.P, model.Q, model.bu, model.bi, float(model.mu)
    )
    for epoch in range(epochs):
        order = epoch_permutation(train.n_ratings, seed=0, epoch=epoch)
        train_epoch_sequential(oracle, train, order, lr=lr, reg=reg, use_bias=False)
    oracle_test = oracle_rmse(oracle, test)

    cfg = SGDConfig(lr=lr, reg=reg, epochs=epochs, batch_size=1, partitioner="fixed")
    for _, model, _ in train_epochs(model, train, cfg, use_bias=False, seed=0):
        pass
    ours = rmse(model, test)
    assert abs(ours - oracle_test) <= 1e-3, (ours, oracle_test)


def test_minibatch_quality_matches_oracle():
    """Conflict-free minibatch SGD converges to oracle-equivalent quality
    (small stationary-point tolerance; the exact-1e-3 path is sequential
    semantics above)."""
    coo = synthetic.make_synthetic(200, 250, 12_000, rank=4, noise=0.2, seed=21)
    train, test = train_test_split(coo, test_frac=0.15, seed=1)
    mu = train.global_mean
    epochs, lr0, reg, decay = 25, 0.04, 0.1, 0.85

    oracle = init_oracle(200, 250, 4, mu, seed=7)
    for epoch in range(epochs):
        order = epoch_permutation(train.n_ratings, seed=0, epoch=epoch)
        train_epoch_sequential(
            oracle, train, order, lr=lr0 * decay**epoch, reg=reg, use_bias=False
        )
    oracle_test = oracle_rmse(oracle, test)

    model = init_model(7, 200, 250, 4, global_mean=mu)
    cfg = SGDConfig(
        lr=lr0,
        reg=reg,
        lr_decay=decay,
        epochs=epochs,
        batch_size=64,
        partitioner="conflict_free",
    )
    for _, model, _ in train_epochs(model, train, cfg, use_bias=False, seed=0):
        pass
    ours = rmse(model, test)
    # within-round parallel application vs. strictly sequential is a small
    # stationary-point gap; it widens with realistic Zipf skew (hot rows
    # receive many same-snapshot updates). The exact ≤1e-3 north-star gate
    # is the sequential-semantics test above.
    assert abs(ours - oracle_test) <= 2e-2, (ours, oracle_test)


def test_chunking_invariance_of_conflict_free_rounds():
    """Within a conflict-free round all rows are disjoint, so results are
    bitwise-identical regardless of how rounds are chunked into batches —
    a determinism property unique to the conflict-free partitioner."""
    coo = synthetic.make_synthetic(100, 120, 4000, rank=4, seed=3)
    results = []
    for bs in (32, 128):
        model = init_model(9, 100, 120, 4, global_mean=coo.global_mean)
        cfg = SGDConfig(
            lr=0.03, reg=0.02, epochs=2, batch_size=bs, partitioner="conflict_free"
        )
        for _, model, _ in train_epochs(model, coo, cfg, use_bias=True, seed=0):
            pass
        results.append(model)
    np.testing.assert_array_equal(
        np.asarray(results[0].P), np.asarray(results[1].P)
    )
    np.testing.assert_array_equal(
        np.asarray(results[0].Q), np.asarray(results[1].Q)
    )
