"""Device-side BPR prep (VERDICT round 2, directive #8): exact negative
rejection via sorted-pair binary search + seeded permutation, all on
device — per-epoch host work is O(1)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfx.config import BPRConfig
from mfx.data import synthetic, train_test_split
from mfx.data.bpr import (
    build_positive_index_device,
    members_2key,
    sample_negatives_device,
)
from mfx.eval.metrics import sampled_auc
from mfx.models import init_model
from mfx.solvers.bpr import train_epochs_bpr


def test_members_2key_matches_numpy():
    rng = np.random.default_rng(0)
    pu = rng.integers(0, 50, 400).astype(np.int32)
    pi = rng.integers(0, 60, 400).astype(np.int32)
    qs_u = rng.integers(0, 50, 1000).astype(np.int32)
    qs_i = rng.integers(0, 60, 1000).astype(np.int32)
    spu, spi = build_positive_index_device(jnp.asarray(pu), jnp.asarray(pi))
    got = np.asarray(members_2key(spu, spi, jnp.asarray(qs_u),
                                  jnp.asarray(qs_i)))
    ref_set = set(zip(pu.tolist(), pi.tolist()))
    ref = np.array([(u, i) in ref_set for u, i in zip(qs_u, qs_i)])
    np.testing.assert_array_equal(got, ref)


def test_device_negatives_exact_and_seeded():
    coo = synthetic.make_implicit_synthetic(100, 120, 6_000, rank=4, seed=1)
    u = jnp.asarray(coo.user)
    i = jnp.asarray(coo.item)
    pu, pi = build_positive_index_device(u, i)
    key = jax.random.key(7)
    neg1 = np.asarray(sample_negatives_device(key, u, pu, pi, 120))
    neg2 = np.asarray(sample_negatives_device(key, u, pu, pi, 120))
    np.testing.assert_array_equal(neg1, neg2)  # bitwise-seeded
    assert neg1.min() >= 0 and neg1.max() < 120
    pos_set = set(zip(coo.user.tolist(), coo.item.tolist()))
    hits = sum((uu, nn) in pos_set for uu, nn in zip(coo.user.tolist(),
                                                     neg1.tolist()))
    assert hits == 0  # exact rejection (density far below residual bound)


def test_bpr_device_pipeline_learns_and_deterministic():
    coo = synthetic.make_implicit_synthetic(150, 200, 20_000, rank=2, seed=3)
    train, test = train_test_split(coo, test_frac=0.1, seed=0)
    cfg = BPRConfig(lr=0.1, reg=0.002, epochs=8, batch_size=2048,
                    sample_device="device")
    outs = []
    for _ in range(2):
        model = init_model(1, 150, 200, 8, global_mean=0.0)
        for _, model, loss in train_epochs_bpr(model, train, cfg, seed=0):
            pass
        outs.append(model)
    np.testing.assert_array_equal(np.asarray(outs[0].P), np.asarray(outs[1].P))
    np.testing.assert_array_equal(np.asarray(outs[0].Q), np.asarray(outs[1].Q))
    auc = sampled_auc(outs[0], test, seed=9)
    assert auc > 0.6, auc


def test_catalog_complement_draw_oracle():
    """sample_negatives_device is an EXACT order-statistic draw: for the
    drawn x, j must be the x-th non-positive item of the user's catalog
    complement — including duplicate training pairs (deduped index) and
    a degenerate user who rated everything (positive fallback)."""
    rng = np.random.default_rng(4)
    I = 37
    u = rng.integers(0, 20, 900).astype(np.int32)
    i = rng.integers(0, I, 900).astype(np.int32)  # plenty of duplicates
    u = np.concatenate([u, np.full(I, 20, np.int32)])  # user 20: all items
    i = np.concatenate([i, np.arange(I, dtype=np.int32)])
    pu, pi = build_positive_index_device(jnp.asarray(u), jnp.asarray(i))
    key = jax.random.key(11)
    j = np.asarray(sample_negatives_device(key, jnp.asarray(u), pu, pi, I))
    # reproduce the internal draw to check the order statistic exactly
    from mfx.data.bpr import lowerbound_2key

    zeros = jnp.zeros_like(jnp.asarray(u))
    start = np.asarray(lowerbound_2key(pu, pi, jnp.asarray(u), zeros))
    end = np.asarray(lowerbound_2key(pu, pi, jnp.asarray(u), zeros + I))
    cnt = end - start
    navail = I - cnt
    x = np.asarray(jax.random.randint(
        key, u.shape, 0, np.maximum(navail, 1), dtype=jnp.int32))
    pos_by_user = {}
    for uu, ii in zip(u.tolist(), i.tolist()):
        pos_by_user.setdefault(uu, set()).add(ii)
    for r in range(0, len(u), 41):
        comp = sorted(set(range(I)) - pos_by_user[u[r]])
        if comp:
            assert j[r] == comp[x[r]], r
        else:
            assert j[r] in pos_by_user[u[r]], r  # fallback: a positive
