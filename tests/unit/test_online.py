"""Online updates (mfx/train/online.py): grow_model + partial_fit vs
ground-truth low-rank structure and the mu baseline."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfx.config import SGDConfig
from mfx.data.coo import RatingsCOO
from mfx.models.mf import MFModel, init_model
from mfx.train.online import grow_model, partial_fit


def _true_world(seed, U, I, rank=4, mu=3.5):
    rng = np.random.default_rng(seed)
    P = rng.normal(0, 1 / np.sqrt(rank), (U, rank)).astype(np.float32)
    Q = rng.normal(0, 1 / np.sqrt(rank), (I, rank)).astype(np.float32)
    return P, Q, mu


def _ratings(P, Q, mu, users, items):
    return (mu + np.einsum("nd,nd->n", P[users], Q[items])).astype(
        np.float32
    )


def _model_from(P, Q, mu, U, I):
    """A 'converged' model over the first (U, I) rows of the truth."""
    return MFModel(
        P=jnp.asarray(P[:U]), Q=jnp.asarray(Q[:I]),
        bu=jnp.zeros(U, jnp.float32), bi=jnp.zeros(I, jnp.float32),
        mu=jnp.float32(mu),
    )


def test_grow_model_preserves_predictions():
    model = init_model(0, 6, 9, rank=4, global_mean=3.0)
    model = dataclasses.replace(
        model, bu=jnp.arange(6, dtype=jnp.float32) * 0.1
    )
    grown = grow_model(model, 10, 12)
    assert (grown.num_users, grown.num_items) == (10, 12)
    u = np.repeat(np.arange(6), 9)
    i = np.tile(np.arange(9), 6)
    np.testing.assert_array_equal(
        np.asarray(model.predict(u, i)), np.asarray(grown.predict(u, i))
    )
    # new rows predict exactly mu
    np.testing.assert_array_equal(
        np.asarray(grown.predict(np.array([7, 9]), np.array([10, 11]))),
        np.full(2, 3.0, np.float32),
    )
    assert grow_model(model) is model  # no-op stays the same object
    with pytest.raises(ValueError, match="shrink"):
        grow_model(model, 4, 9)


def test_partial_fit_new_users_beats_baseline():
    """Fold-in init alone (epochs=0) must recover most of a new user's
    signal; a couple of SGD epochs keep or improve it."""
    rng = np.random.default_rng(1)
    U, new, I = 50, 10, 80
    P, Q, mu = _true_world(1, U + new, I)
    model = _model_from(P, Q, mu, U, I)

    du, di, dtu, dti = [], [], [], []
    for n in range(new):
        perm = rng.permutation(I)
        tr_i, te_i = perm[:20], perm[20:30]
        du += [U + n] * 20
        di += list(tr_i)
        dtu += [U + n] * 10
        dti += list(te_i)
    du, di = np.array(du, np.int32), np.array(di, np.int32)
    dtu, dti = np.array(dtu, np.int32), np.array(dti, np.int32)
    delta = RatingsCOO(du, di, _ratings(P, Q, mu, du, di),
                       num_users=U + new, num_items=I)
    truth = _ratings(P, Q, mu, dtu, dti)

    def rmse(m):
        pred = np.asarray(m.predict(dtu, dti))
        return float(np.sqrt(np.mean((pred - truth) ** 2)))

    base = rmse(grow_model(model, U + new, I))  # mu baseline for new rows
    cfg0 = SGDConfig(lr=0.05, reg=0.01, epochs=0, batch_size=256,
                     partitioner="fixed", dup_trust=16.0)
    folded, _ = partial_fit(model, delta, cfg0, foldin_reg=0.01)
    assert rmse(folded) < 0.5 * base
    cfg2 = dataclasses.replace(cfg0, epochs=3)
    tuned, tr = partial_fit(model, delta, cfg2, foldin_reg=0.01)
    assert np.isfinite(tr)
    assert rmse(tuned) < 0.6 * base
    # existing rows unharmed: predictions for old users stay near-true
    ou = rng.integers(0, U, 200).astype(np.int32)
    oi = rng.integers(0, I, 200).astype(np.int32)
    old_rmse = float(np.sqrt(np.mean(
        (np.asarray(tuned.predict(ou, oi))
         - _ratings(P, Q, mu, ou, oi)) ** 2)))
    assert old_rmse < 0.15


def test_partial_fit_new_items_via_transpose_foldin():
    rng = np.random.default_rng(2)
    U, I, new = 60, 40, 8
    P, Q, mu = _true_world(2, U, I + new)
    model = _model_from(P, Q, mu, U, I)
    du, di = [], []
    for n in range(new):
        raters = rng.permutation(U)[:25]
        du += list(raters)
        di += [I + n] * 25
    du, di = np.array(du, np.int32), np.array(di, np.int32)
    delta = RatingsCOO(du, di, _ratings(P, Q, mu, du, di),
                       num_users=U, num_items=I + new)
    cfg = SGDConfig(lr=0.05, reg=0.01, epochs=0, batch_size=256,
                    partitioner="fixed", dup_trust=16.0)
    out, _ = partial_fit(model, delta, cfg, foldin_reg=0.01)
    # held-out predictions on the new items beat the mu baseline
    tu = rng.integers(0, U, 30 * new).astype(np.int32)
    ti = np.repeat(np.arange(I, I + new, dtype=np.int32), 30)
    truth = _ratings(P, Q, mu, tu, ti)
    pred = np.asarray(out.predict(tu, ti))
    base = float(np.sqrt(np.mean((mu - truth) ** 2)))
    assert float(np.sqrt(np.mean((pred - truth) ** 2))) < 0.5 * base


def test_partial_fit_existing_users_and_replay_determinism():
    """Delta on EXISTING rows fine-tunes them; replay rides along; the
    whole update is deterministic."""
    rng = np.random.default_rng(3)
    U, I = 40, 50
    P, Q, mu = _true_world(3, U, I)
    # a deliberately-off model: true factors shrunk 50%
    model = _model_from(P * 0.5, Q, mu, U, I)
    u = rng.integers(0, U, 600).astype(np.int32)
    i = rng.integers(0, I, 600).astype(np.int32)
    delta = RatingsCOO(u[:400], i[:400],
                       _ratings(P, Q, mu, u[:400], i[:400]),
                       num_users=U, num_items=I)
    replay = RatingsCOO(u[400:], i[400:],
                        _ratings(P, Q, mu, u[400:], i[400:]),
                        num_users=U, num_items=I)

    def delta_rmse(m):
        pred = np.asarray(m.predict(delta.user, delta.item))
        return float(np.sqrt(np.mean((pred - delta.rating) ** 2)))

    cfg = SGDConfig(lr=0.05, reg=0.005, epochs=4, batch_size=256,
                    partitioner="fixed", dup_trust=16.0)
    before = delta_rmse(model)
    a, tra = partial_fit(model, delta, cfg, replay=replay, seed=7)
    b, trb = partial_fit(model, delta, cfg, replay=replay, seed=7)
    assert delta_rmse(a) < 0.7 * before
    assert tra == trb
    for xa, xb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))


def test_partial_fit_validation():
    model = init_model(0, 5, 5, rank=2, global_mean=3.0)
    cfg = SGDConfig(lr=0.01, reg=0.01, epochs=1, batch_size=64,
                    partitioner="fixed")
    empty = RatingsCOO(np.zeros(0, np.int32), np.zeros(0, np.int32),
                       np.zeros(0, np.float32), num_users=5, num_items=5)
    with pytest.raises(ValueError, match="non-empty"):
        partial_fit(model, empty, cfg)
