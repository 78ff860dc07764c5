"""Sharded top-K serving == single-device serving (virtual CPU mesh)."""

import numpy as np
import pytest

from mfx.data import synthetic
from mfx.models.mf import init_model
from mfx.runtime.mesh import make_mesh
from mfx.serve import TopKRecommender
from mfx.serve.sharded import ShardedTopKRecommender


def test_sharded_topk_matches_single_device():
    U, I, k = 40, 101, 7  # I deliberately not a multiple of 8 shards
    coo = synthetic.make_synthetic(U, I, 900, seed=2)
    model = init_model(4, U, I, rank=8, global_mean=3.5)
    mesh = make_mesh(2, 4)  # serving flattens to 8 shards

    ref = TopKRecommender(model, train=coo, batch=16)
    got = ShardedTopKRecommender(model, mesh, train=coo, batch=16)
    users = np.arange(U, dtype=np.int32)
    ri, rs = ref.recommend(users, k=k)
    gi, gs = got.recommend(users, k=k)

    np.testing.assert_allclose(gs, rs, rtol=1e-5, atol=1e-6)
    # items equal up to equal-score permutation
    for u in range(U):
        if (gi[u] != ri[u]).any():
            np.testing.assert_allclose(gs[u], rs[u], rtol=1e-6)
            assert set(gi[u]) == set(ri[u])
        seen = coo.item[coo.user == u]
        assert not np.isin(gi[u], seen).any()
    # catalog pad rows (101 -> 104) must never surface
    assert (gi < I).all()


def test_sharded_topk_host_resident_user_table():
    """The user table may stay host-resident (numpy): only the batch's
    rows travel — results must match the device-array path."""
    import dataclasses

    U, I, k = 24, 33, 5
    coo = synthetic.make_synthetic(U, I, 400, seed=7)
    model = init_model(1, U, I, rank=8, global_mean=3.4)
    host_model = dataclasses.replace(
        model, P=np.asarray(model.P), bu=np.asarray(model.bu)
    )
    mesh = make_mesh(2, 4)
    users = np.arange(U, dtype=np.int32)
    di, ds = ShardedTopKRecommender(model, mesh, train=coo).recommend(
        users, k=k
    )
    hi, hs = ShardedTopKRecommender(host_model, mesh, train=coo).recommend(
        users, k=k
    )
    np.testing.assert_allclose(hs, ds, rtol=1e-6)
    assert (hi == di).all() or all(set(hi[u]) == set(di[u]) for u in range(U))


def test_sharded_topk_bf16_matches_single_device_bf16():
    """table_dtype='bf16': the per-shard bf16 matmul accumulates f32, so
    sharded scores equal the single-device bf16 scores exactly."""
    U, I, k = 30, 77, 6
    coo = synthetic.make_synthetic(U, I, 600, seed=3)
    model = init_model(2, U, I, rank=8, global_mean=3.5)
    mesh = make_mesh(2, 4)
    users = np.arange(U, dtype=np.int32)
    ri, rs = TopKRecommender(
        model, train=coo, batch=16, table_dtype="bf16"
    ).recommend(users, k=k)
    gi, gs = ShardedTopKRecommender(
        model, mesh, train=coo, batch=16, table_dtype="bf16"
    ).recommend(users, k=k)
    np.testing.assert_allclose(gs, rs, rtol=1e-6, atol=1e-6)
    for u in range(U):
        if (gi[u] != ri[u]).any():
            assert set(gi[u]) == set(ri[u])
    assert (gi < I).all()


def test_sharded_topk_int8_matches_single_device_int8():
    """table_dtype='int8': both variants quantize Q per row with the same
    formula and accumulate int32 on the matmul, so sharded int8 scores
    equal single-device int8 scores exactly."""
    U, I, k = 30, 77, 6
    coo = synthetic.make_synthetic(U, I, 600, seed=5)
    model = init_model(3, U, I, rank=8, global_mean=3.5)
    mesh = make_mesh(2, 4)
    users = np.arange(U, dtype=np.int32)
    ri, rs = TopKRecommender(
        model, train=coo, batch=16, table_dtype="int8"
    ).recommend(users, k=k)
    gi, gs = ShardedTopKRecommender(
        model, mesh, train=coo, batch=16, table_dtype="int8"
    ).recommend(users, k=k)
    np.testing.assert_allclose(gs, rs, rtol=1e-6, atol=1e-6)
    for u in range(U):
        if (gi[u] != ri[u]).any():
            assert set(gi[u]) == set(ri[u])
        seen = coo.item[coo.user == u]
        assert not np.isin(gi[u], seen).any()
    assert (gi < I).all()  # pad rows (77 -> 80) never surface


def test_fused_sharded_matches_single_device_fused():
    """FusedShardedTopKRecommender == FusedTopKRecommender exactly: the
    per-tile top-2 pools are identical (tiles never span shards) and the
    S·K merge is exact over the union of per-shard top-Ks."""
    from mfx.serve import FusedShardedTopKRecommender, FusedTopKRecommender

    U, I, k = 30, 3000, 6  # 24 tiles at tile=128, 3 per shard on 8 shards
    coo = synthetic.make_synthetic(U, I, 800, seed=9)
    model = init_model(7, U, I, rank=8, global_mean=3.5)
    mesh = make_mesh(2, 4)
    users = np.arange(U, dtype=np.int32)
    ri, rs = FusedTopKRecommender(
        model, train=coo, batch=16, tile=128
    ).recommend(users, k=k)
    gi, gs = FusedShardedTopKRecommender(
        model, mesh, train=coo, batch=16, tile=128
    ).recommend(users, k=k)
    np.testing.assert_allclose(gs, rs, rtol=1e-6, atol=1e-6)
    for u in range(U):
        if (gi[u] != ri[u]).any():
            assert set(gi[u]) == set(ri[u])  # equal-score permutation
        seen = coo.item[coo.user == u]
        assert not np.isin(gi[u], seen).any()
    assert (gi < I).all()

    # per-shard pool cap validated
    import pytest as _pytest

    small = FusedShardedTopKRecommender(model, mesh, tile=128)
    with _pytest.raises(ValueError, match="per-shard"):
        small.recommend([0], k=2 * small._tn_loc + 1)


def test_sharded_similar_items_matches_single_device():
    """Row-sharded related-items == the single-device cosine path; pad
    rows and the query itself never surface."""
    from mfx.serve import similar_items
    from mfx.serve.sharded import similar_items_sharded

    I, k = 93, 6  # not a multiple of 8 shards
    model = init_model(5, 20, I, rank=8, global_mean=3.5)
    mesh = make_mesh(2, 4)
    queries = np.arange(I, dtype=np.int32)
    ri, rs = similar_items(model, queries, k=k, batch=16)
    gi, gs = similar_items_sharded(model, mesh, queries, k=k, batch=16)
    np.testing.assert_allclose(gs, rs, rtol=1e-5, atol=1e-6)
    for q in range(I):
        assert q not in gi[q]
        if (gi[q] != ri[q]).any():
            assert set(gi[q]) == set(ri[q])
    assert (gi < I).all()

    with pytest.raises(ValueError, match="per-shard"):
        similar_items_sharded(model, make_mesh(1, 8), [0], k=13)
    with pytest.raises(ValueError, match="out of range"):
        similar_items_sharded(model, mesh, [I], k=2)


def test_sharded_topk_k_exceeding_shard_slice_raises():
    model = init_model(0, 10, 16, rank=4, global_mean=3.0)
    mesh = make_mesh(1, 8)  # 2 items/shard
    rec = ShardedTopKRecommender(model, mesh)
    with pytest.raises(ValueError, match="per-shard"):
        rec.recommend([0], k=3)
    items, _ = rec.recommend([1], k=2)
    assert items.shape == (1, 2)


def test_fused_sharded_exact_matches_stock_exact():
    """exact=True on the sharded fused path: per-shard certified local
    top-K makes the S*K merge globally exact. Adversarial catalog — a
    user's whole true top-K inside ONE tile — where the plain fused
    path provably misses; and an under-budgeted rescore falls back to
    the stock sharded scorer (still exact)."""
    import dataclasses

    import jax.numpy as jnp

    from mfx.data.coo import RatingsCOO
    from mfx.serve import (
        FusedShardedTopKRecommender, FusedTopKRecommender, TopKRecommender,
    )

    rng = np.random.default_rng(12)
    U, I, r, tile, k = 8, 3072, 4, 128, 4  # 24 tiles, 3/shard, pool 6
    Q = rng.normal(0, 0.05, (I, r)).astype(np.float32)
    taste = rng.normal(0, 1, r).astype(np.float32)
    hot = np.arange(256, 264)  # 8 best items, all inside tile 2 (shard 0)
    Q[hot] = taste[None, :] * np.linspace(2.0, 1.3, 8)[:, None]
    model = init_model(9, U, I, rank=r, global_mean=3.0)
    P = np.broadcast_to(taste, (U, r)).copy()
    model = dataclasses.replace(
        model, P=jnp.asarray(P), Q=jnp.asarray(Q),
        bu=jnp.zeros(U), bi=jnp.zeros(I),
    )
    mesh = make_mesh(2, 4)
    users = np.arange(U, dtype=np.int32)
    ri, rs = TopKRecommender(model, batch=8).recommend(users, k=k)
    pi, _ = FusedTopKRecommender(model, batch=8, tile=tile).recommend(
        users, k=k
    )
    assert np.isin(pi[0], hot).sum() == 2  # plain: only the tile's top-2
    rec = FusedShardedTopKRecommender(
        model, mesh, batch=8, tile=tile, exact=True, exact_tiles=3,
        exact_depth=2,
    )
    gi, gs = rec.recommend(users, k=k)
    np.testing.assert_array_equal(gi, ri)
    np.testing.assert_allclose(gs, rs, rtol=1e-5, atol=1e-5)
    assert np.isin(gi[0], hot).sum() == k
    assert rec.exact_fallbacks == 0

    # overflow: a user whose seen list blankets shard 0 leaves its local
    # pool -inf => tau=-inf => all 3 local tiles suspect > budget 1 =>
    # certified-exactness fails for the batch => stock sharded fallback
    su = np.zeros(380, np.int32)
    si = np.arange(380, dtype=np.int32)  # most of shard 0's 384 items
    coo = RatingsCOO(su, si, np.ones(380, np.float32),
                     num_users=U, num_items=I)
    rec2 = FusedShardedTopKRecommender(
        model, mesh, train=coo, batch=8, tile=tile, exact=True,
        exact_tiles=1, exact_depth=2,
    )
    ri2, rs2 = TopKRecommender(model, train=coo, batch=8).recommend(
        users, k=5
    )
    gi2, gs2 = rec2.recommend(users, k=5)
    np.testing.assert_allclose(gs2, rs2, rtol=1e-5, atol=1e-5)
    assert rec2.exact_fallbacks >= 1


def test_fused_sharded_int8_matches_single_device_int8():
    """int8 sharded fused == int8 single-device fused exactly: shards
    quantize the same rows to the same int8 values, tiles never span
    shards, and the S·K merge is exact (VERDICT r3 #3 composition)."""
    from mfx.serve import FusedShardedTopKRecommender, FusedTopKRecommender

    U, I, k = 30, 3000, 6
    coo = synthetic.make_synthetic(U, I, 800, seed=9)
    model = init_model(7, U, I, rank=8, global_mean=3.5)
    mesh = make_mesh(2, 4)
    users = np.arange(U, dtype=np.int32)
    ri, rs = FusedTopKRecommender(
        model, train=coo, batch=16, tile=128, table_dtype="int8"
    ).recommend(users, k=k)
    gi, gs = FusedShardedTopKRecommender(
        model, mesh, train=coo, batch=16, tile=128, table_dtype="int8"
    ).recommend(users, k=k)
    np.testing.assert_allclose(gs, rs, rtol=1e-6, atol=1e-6)
    for u in range(U):
        if (gi[u] != ri[u]).any():
            assert set(gi[u]) == set(ri[u])  # equal-score permutation
        seen = coo.item[coo.user == u]
        assert not np.isin(gi[u], seen).any()
    assert (gi < I).all()
