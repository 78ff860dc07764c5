import numpy as np
import jax.numpy as jnp

from mfx.config import BPRConfig
from mfx.data import synthetic, train_test_split
from mfx.data.bpr import (
    bpr_epoch_triples,
    build_positive_index,
    sample_negatives,
)
from mfx.eval.metrics import sampled_auc
from mfx.models import init_model
from mfx.solvers.bpr import bpr_minibatch_update, train_epochs_bpr


def test_sampler_seeded_and_in_range():
    a = sample_negatives(1000, 50, seed=1, epoch=0)
    b = sample_negatives(1000, 50, seed=1, epoch=0)
    np.testing.assert_array_equal(a, b)
    assert a.min() >= 0 and a.max() < 50
    c = sample_negatives(1000, 50, seed=1, epoch=1)
    assert not np.array_equal(a, c)


def test_exact_negatives_never_positive():
    """VERDICT round-1 #9: with the positive index, no sampled negative is
    an observed positive — even on a dense dataset where uniform sampling
    would collide constantly."""
    coo = synthetic.make_implicit_synthetic(50, 40, 900, rank=2, seed=5)
    pos_keys = build_positive_index(coo)
    u, i, j = bpr_epoch_triples(coo, seed=3, epoch=0, pos_keys=pos_keys)
    collisions = np.isin(
        u.astype(np.int64) * coo.num_items + j, pos_keys
    )
    assert not collisions.any()
    # deterministic: same (seed, epoch) => same triples
    _, _, j2 = bpr_epoch_triples(coo, seed=3, epoch=0, pos_keys=pos_keys)
    np.testing.assert_array_equal(j, j2)
    # different epoch => different stream
    _, _, j3 = bpr_epoch_triples(coo, seed=3, epoch=1, pos_keys=pos_keys)
    assert not np.array_equal(j, j3)


def test_ring_plan_exact_negatives():
    """Sharded-ring planner rejects block-local negatives that are
    positives (in the relabeled item space)."""
    from mfx.parallel.bpr_sharded import item_shuffle, plan_bpr_ring_epoch

    coo = synthetic.make_implicit_synthetic(60, 48, 1200, rank=2, seed=6)
    S = 4
    fwd, _ = item_shuffle(coo.num_items, seed=0)
    pos_keys = np.sort(
        coo.user.astype(np.int64) * coo.num_items + fwd[coo.item]
    )
    plan = plan_bpr_ring_epoch(
        coo, S, 64, seed=0, epoch=0, item_map=fwd, pos_keys=pos_keys
    )
    iblock = plan.iblock
    ublock = plan.ublock
    S2 = S * S
    width = plan.users.reshape(S2, -1).shape[1]
    users = plan.users.reshape(S2, width)
    neg = plan.neg.reshape(S2, width)
    w = plan.weights.reshape(S2, width)
    cell_block = np.array([(s + t) % S for t in range(S) for s in range(S)])
    s_of = np.arange(S2) % S
    gu = users.astype(np.int64) + s_of[:, None] * ublock
    gneg = cell_block[:, None] * iblock + neg.astype(np.int64)
    qk = (gu * coo.num_items + gneg)[w > 0]
    assert not np.isin(qk, pos_keys).any()


def test_bpr_update_matches_numpy():
    rng = np.random.default_rng(0)
    model = init_model(0, 15, 20, 4, global_mean=0.0)
    B = 8
    u = rng.integers(0, 15, B).astype(np.int32)
    i = rng.integers(0, 20, B).astype(np.int32)
    j = rng.integers(0, 20, B).astype(np.int32)
    w = np.ones(B, np.float32)
    w[-2:] = 0.0
    lr, reg = 0.1, 0.01
    new, loss = bpr_minibatch_update(model, u, i, j, w, lr, reg)

    P = np.array(model.P, np.float64)
    Q = np.array(model.Q, np.float64)
    x = np.einsum("bk,bk->b", P[u], Q[i] - Q[j])
    sig = 1 / (1 + np.exp(-x))
    e = (1 - sig) * w
    Pn, Qn = P.copy(), Q.copy()
    np.add.at(Pn, u, lr * (e[:, None] * (Q[i] - Q[j]) - reg * w[:, None] * P[u]))
    np.add.at(Qn, i, lr * (e[:, None] * P[u] - reg * w[:, None] * Q[i]))
    np.add.at(Qn, j, lr * (-e[:, None] * P[u] - reg * w[:, None] * Q[j]))
    np.testing.assert_allclose(np.asarray(new.P), Pn, atol=2e-6)
    np.testing.assert_allclose(np.asarray(new.Q), Qn, atol=2e-6)
    ref_loss = np.sum(-np.log(sig + 1e-12) * w)
    np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-4)


def test_bpr_training_improves_auc():
    coo = synthetic.make_implicit_synthetic(200, 300, 40_000, rank=2, seed=3)
    train, test = train_test_split(coo, test_frac=0.1, seed=0)
    model = init_model(1, 200, 300, 8, global_mean=0.0)
    auc0 = sampled_auc(model, test, seed=9)
    cfg = BPRConfig(lr=0.1, reg=0.002, epochs=15, batch_size=2048)
    for ep, model, loss in train_epochs_bpr(model, train, cfg, seed=0):
        pass
    auc1 = sampled_auc(model, test, seed=9)
    assert 0.45 < auc0 < 0.55  # untrained ≈ random
    assert auc1 > 0.6, (auc0, auc1)


def test_bpr_deterministic():
    coo = synthetic.make_implicit_synthetic(100, 120, 5_000, rank=4, seed=1)
    outs = []
    for _ in range(2):
        model = init_model(2, 100, 120, 8, global_mean=0.0)
        cfg = BPRConfig(lr=0.05, reg=0.01, epochs=2, batch_size=512)
        for _, model, _ in train_epochs_bpr(model, coo, cfg, seed=4):
            pass
        outs.append(model)
    np.testing.assert_array_equal(np.asarray(outs[0].P), np.asarray(outs[1].P))
    np.testing.assert_array_equal(np.asarray(outs[0].Q), np.asarray(outs[1].Q))
