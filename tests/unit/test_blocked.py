import numpy as np
import jax.numpy as jnp

from mfx.data import synthetic, epoch_permutation
from mfx.kernels import blocked_host as bh
from mfx.kernels.blocked_jnp import blocked_epoch_jnp, pad_tables, unpad_tables
from mfx.kernels.jnp_ref import sgd_minibatch_update
from mfx.models import init_model


def test_tile_plan_properties():
    coo = synthetic.make_synthetic(200, 170, 8000, seed=3)
    perm = epoch_permutation(8000, 0, 0)
    plan = bh.build_tile_plan(
        coo.user, coo.item, coo.rating, 200, 170, su=64, si=32, tile=16, perm=perm
    )
    assert plan.num_ublocks == 4 and plan.num_iwindows == 6
    # every tile's entries belong to the declared stratum
    real = plan.tu < plan.su
    assert int(real.sum()) == 8000
    gu = plan.ta[:, None] * plan.su + plan.tu  # global ids where real
    gi = plan.tc[:, None] * plan.si + plan.ti
    # reconstruct the multiset of (u, i, r) triples
    triples = set(
        zip(gu[real].tolist(), gi[real].tolist(), plan.tr[real].tolist())
    )
    ref = set(zip(coo.user.tolist(), coo.item.tolist(), coo.rating.tolist()))
    assert triples == ref
    assert np.all(plan.tu[~real] == plan.su)
    assert np.all(plan.tr[~real] == 0.0)
    # tiles are user-block-major: ta is non-decreasing run-wise
    assert np.all(np.diff(plan.ta) >= 0)
    assert 0.2 < plan.occupancy <= 1.0


def test_tile_plan_deterministic_and_shuffle():
    coo = synthetic.make_synthetic(100, 100, 3000, seed=1)
    perm = epoch_permutation(3000, 1, 0)
    p1 = bh.build_tile_plan(coo.user, coo.item, coo.rating, 100, 100, 32, 32, 8, perm)
    p2 = bh.build_tile_plan(coo.user, coo.item, coo.rating, 100, 100, 32, 32, 8, perm)
    np.testing.assert_array_equal(p1.tu, p2.tu)
    s1 = bh.shuffle_tile_plan(p1, seed=0, epoch=1)
    s2 = bh.shuffle_tile_plan(p1, seed=0, epoch=1)
    np.testing.assert_array_equal(s1.tu, s2.tu)
    assert s1.n_real == p1.n_real
    # shuffle preserves the tile multiset (rows are permuted, not altered)
    key = lambda p: sorted(map(tuple, np.c_[p.ta, p.tc, p.tu[:, 0], p.tr[:, 0]].tolist()))
    assert key(s1) == key(p1)


def test_pack_unpack_roundtrip():
    x = np.arange(12 * 64, dtype=np.float32).reshape(12, 64)
    p = bh.pack_factor(64)
    assert p == 2
    packed = bh.pack_rows(x, p)
    assert packed.shape == (6, 128)
    np.testing.assert_array_equal(bh.unpack_rows(packed, p), x)
    # packing is row-pair concatenation
    np.testing.assert_array_equal(packed[0, :64], x[0])
    np.testing.assert_array_equal(packed[0, 64:], x[1])


def test_blocked_epoch_matches_per_tile_reference():
    """blocked_epoch_jnp must equal applying the K4 reference update
    tile-by-tile with global ids (same snapshot semantics, segment-sum)."""
    coo = synthetic.make_synthetic(96, 80, 2500, seed=5)
    perm = epoch_permutation(2500, 0, 0)
    su, si, T = 32, 16, 8
    plan = bh.build_tile_plan(
        coo.user, coo.item, coo.rating, 96, 80, su, si, T, perm
    )
    for use_bias in (True, False):
        model = init_model(2, 96, 80, 8, global_mean=coo.global_mean)

        # reference: per-tile jnp_ref updates with global ids
        ref = pad_tables(model, su, si)
        for t in range(plan.num_tiles):
            real = plan.tu[t] < su
            gu = (plan.ta[t] * su + plan.tu[t]).astype(np.int32)
            gi = (plan.tc[t] * si + plan.ti[t]).astype(np.int32)
            gu = np.where(real, gu, 0)
            gi = np.where(real, gi, 0)
            w = real.astype(np.float32)
            ref, _ = sgd_minibatch_update(
                ref, gu, gi, plan.tr[t], w, 0.05, 0.02, use_bias=use_bias
            )

        tiles = {
            "ta": jnp.asarray(plan.ta), "tc": jnp.asarray(plan.tc),
            "tu": jnp.asarray(plan.tu), "ti": jnp.asarray(plan.ti),
            "tr": jnp.asarray(plan.tr),
        }
        got, sse = blocked_epoch_jnp(
            pad_tables(model, su, si), tiles, 0.05, 0.02,
            su=su, si=si, use_bias=use_bias, exact=True,
        )
        got = unpad_tables(got, 96, 80)
        refu = unpad_tables(ref, 96, 80)
        np.testing.assert_allclose(np.asarray(got.P), np.asarray(refu.P), atol=1e-5)
        np.testing.assert_allclose(np.asarray(got.Q), np.asarray(refu.Q), atol=1e-5)
        np.testing.assert_allclose(np.asarray(got.bu), np.asarray(refu.bu), atol=1e-5)
        np.testing.assert_allclose(np.asarray(got.bi), np.asarray(refu.bi), atol=1e-5)
        assert float(sse) > 0
