"""Popularity-weighted BPR negative sampling (mfx/data/bpr.py
popularity_cdf / weighted draws) — distribution, exactness, wiring."""

import jax
import numpy as np
import pytest

from mfx.config import BPRConfig
from mfx.data import synthetic
from mfx.data.bpr import (
    build_positive_index,
    build_positive_index_device,
    popularity_cdf,
    sample_negatives,
    sample_negatives_weighted_device,
)


def test_popularity_cdf_matches_counts():
    item = np.array([0, 0, 0, 0, 1, 1, 2], np.int32)
    cdf = popularity_cdf(item, num_items=4, beta=1.0)
    w = np.array([4.0, 2.0, 1.0, 0.0])
    np.testing.assert_allclose(cdf, np.cumsum(w / w.sum()), atol=1e-12)
    assert cdf[-1] == 1.0
    with pytest.raises(ValueError, match="at least one interaction"):
        popularity_cdf(np.array([], np.int32), num_items=4)


def test_weighted_host_draws_track_popularity_and_reject_positives():
    coo = synthetic.make_implicit_synthetic(300, 150, 4000, rank=4, seed=0)
    counts = np.bincount(coo.item, minlength=coo.num_items)
    pos_keys = build_positive_index(coo)
    cdf = popularity_cdf(coo.item, coo.num_items, beta=1.0)

    n = coo.n_ratings
    reps = 20
    draws = np.concatenate(
        [
            sample_negatives(n, coo.num_items, 7, epoch=e,
                             users=coo.user, pos_keys=pos_keys, cdf=cdf)
            for e in range(reps)
        ]
    )
    # never an observed positive (exactness survives the weighted redraw)
    users_r = np.tile(coo.user, reps)
    keys = users_r.astype(np.int64) * coo.num_items + draws
    assert not np.isin(keys, pos_keys).any()
    # exact rejection-aware expectation: per draw slot with user u,
    # P(i) = w_i * (1 - pos[u,i]) / sum_j w_j * (1 - pos[u,j])
    w = counts.astype(np.float64)  # beta = 1
    pos = np.zeros((coo.num_users, coo.num_items), bool)
    pos[coo.user, coo.item] = True
    per_user = w[None, :] * ~pos
    per_user /= per_user.sum(axis=1, keepdims=True)
    expect = per_user[coo.user].mean(axis=0)
    freq = np.bincount(draws, minlength=coo.num_items) / draws.size
    assert np.abs(freq - expect).sum() < 0.05  # pure sampling noise
    # an unseen item is never drawn
    assert freq[counts == 0].sum() == 0.0


def test_weighted_device_matches_protocol_and_is_deterministic():
    coo = synthetic.make_implicit_synthetic(200, 40, 3000, rank=4, seed=1)
    u = np.asarray(coo.user, np.int32)
    pu, pi = build_positive_index_device(u, np.asarray(coo.item, np.int32))
    cdf = popularity_cdf(coo.item, coo.num_items, beta=0.75)
    import jax.numpy as jnp

    key = jax.random.key(3)
    a = sample_negatives_weighted_device(
        key, jnp.asarray(u), pu, pi, jnp.asarray(cdf, jnp.float32)
    )
    b = sample_negatives_weighted_device(
        key, jnp.asarray(u), pu, pi, jnp.asarray(cdf, jnp.float32)
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    pos_keys = build_positive_index(coo)
    keys = u.astype(np.int64) * coo.num_items + np.asarray(a)
    assert not np.isin(keys, pos_keys).any()
    counts = np.bincount(coo.item, minlength=coo.num_items)
    assert np.asarray(a)[counts[np.asarray(a)] == 0].size == 0


def test_bpr_trains_with_popularity_negatives():
    from mfx.models.mf import init_model
    from mfx.solvers.bpr import train_epochs_bpr

    coo = synthetic.make_implicit_synthetic(150, 60, 4000, rank=4, seed=2)
    model = init_model(0, coo.num_users, coo.num_items, rank=8,
                       global_mean=0.0)
    cfg = BPRConfig(lr=0.05, reg=0.002, epochs=3, batch_size=1024,
                    neg_weighting="popularity", neg_beta=0.75,
                    sample_device="host")
    losses = [loss for _, _, loss in train_epochs_bpr(model, coo, cfg)]
    assert losses[-1] < losses[0] < 0.75


def test_config_rejects_bad_weighting_combos():
    with pytest.raises(ValueError, match="neg_weighting"):
        BPRConfig(neg_weighting="zipf")
    with pytest.raises(ValueError, match="window-local exact negatives"):
        BPRConfig(neg_weighting="popularity", kernel="pallas")


def test_ranking_eval_with_popularity_candidates():
    from mfx.eval.ranking import hr_ndcg_at_k
    from mfx.models.mf import init_model

    coo = synthetic.make_implicit_synthetic(120, 80, 2500, rank=4, seed=5)
    model = init_model(2, coo.num_users, coo.num_items, rank=8,
                       global_mean=0.0)
    cdf = popularity_cdf(coo.item, coo.num_items, beta=0.75)
    pos_keys = build_positive_index(coo)
    got = hr_ndcg_at_k(model, coo, k=10, n_neg=20, seed=1,
                       pos_keys=pos_keys, cdf=cdf)
    again = hr_ndcg_at_k(model, coo, k=10, n_neg=20, seed=1,
                         pos_keys=pos_keys, cdf=cdf)
    assert set(got) == {"hr", "ndcg", "mrr"}
    assert all(0.0 <= got[m] <= 1.0 for m in got)
    assert got == again  # seeded protocol is deterministic
    # weighted candidates change the measured difficulty vs uniform
    uni = hr_ndcg_at_k(model, coo, k=10, n_neg=20, seed=1,
                       pos_keys=pos_keys)
    assert uni != got


def test_split_cdf_reaches_sub_ulp_tail_items():
    """A plain f32 CDF cast zeroes items whose mass is below the f32 ulp
    near 1.0; the (hi, lo) double-single pair must keep them reachable."""
    import jax.numpy as jnp

    from mfx.data.bpr import _upperbound_cdf2, split_cdf_f32

    # one mega-hit + 1000 count-1 items: tail masses ~1e-9 each
    w = np.concatenate([[1e9], np.ones(1000)])
    cdf = np.cumsum(w / w.sum())
    cdf[-1] = 1.0
    hi, lo = split_cdf_f32(cdf)
    # f32 collapse: most tail entries are indistinguishable in hi alone
    assert np.unique(np.asarray(hi)[1:]).size < 100
    # query the exact f64 midpoint of several tail items' mass intervals:
    # the compound search must land on them; plain f32 searchsorted can't
    for j in [5, 400, 999]:
        u = (cdf[j - 1] + cdf[j]) / 2.0
        q_hi = np.float32(u)
        q_lo = np.float32(u - np.float64(q_hi))
        got = _upperbound_cdf2(
            hi, lo, jnp.asarray([q_hi]), jnp.asarray([q_lo])
        )
        assert int(got[0]) == j, (j, int(got[0]))


def test_weighted_device_split_pair_matches_plain_on_small_catalog():
    """On a small catalog (no sub-ulp gaps) the pair path must agree with
    the legacy single-array path in distribution and stay positive-free."""
    import jax.numpy as jnp

    from mfx.data.bpr import split_cdf_f32

    coo = synthetic.make_implicit_synthetic(150, 60, 2500, rank=4, seed=9)
    u = np.asarray(coo.user, np.int32)
    pu, pi = build_positive_index_device(u, np.asarray(coo.item, np.int32))
    cdf = popularity_cdf(coo.item, coo.num_items, beta=0.75)
    key = jax.random.key(11)
    pair = sample_negatives_weighted_device(
        key, jnp.asarray(u), pu, pi, split_cdf_f32(cdf),
        fallback=jnp.asarray(coo.item),
    )
    pos_keys = build_positive_index(coo)
    keys = u.astype(np.int64) * coo.num_items + np.asarray(pair)
    # either a valid non-positive or the loss-neutral fallback (the
    # slot's own positive)
    coll = np.isin(keys, pos_keys)
    assert (np.asarray(pair)[coll] == coo.item[coll]).all()
    counts = np.bincount(coo.item, minlength=coo.num_items)
    drawn = np.asarray(pair)[~coll]
    assert (counts[drawn] > 0).all()  # zero-mass items never drawn
