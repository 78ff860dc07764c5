import numpy as np
import pytest

from mfx.data import RatingsCOO, synthetic, train_test_split, epoch_permutation
from mfx.data import partition as part


def test_coo_basic(tmp_path):
    coo = synthetic.make_synthetic(50, 80, 1000, rank=4, seed=1)
    assert coo.n_ratings == 1000
    assert coo.user.dtype == np.int32 and coo.rating.dtype == np.float32
    coo.validate()
    assert 0.5 <= coo.global_mean <= 5.0
    p = tmp_path / "c.npz"
    coo.save_npz(p)
    back = RatingsCOO.load_npz(p)
    np.testing.assert_array_equal(back.user, coo.user)
    np.testing.assert_array_equal(back.rating, coo.rating)
    assert back.num_users == 50 and back.num_items == 80


def test_synthetic_deterministic():
    a = synthetic.make_synthetic(100, 100, 5000, seed=3)
    b = synthetic.make_synthetic(100, 100, 5000, seed=3)
    np.testing.assert_array_equal(a.user, b.user)
    np.testing.assert_array_equal(a.rating, b.rating)
    c = synthetic.make_synthetic(100, 100, 5000, seed=4)
    assert not np.array_equal(a.user, c.user)


def test_split_disjoint_and_seeded():
    coo = synthetic.make_synthetic(100, 200, 10_000, seed=0)
    tr, te = train_test_split(coo, test_frac=0.2, seed=5)
    assert tr.n_ratings + te.n_ratings == coo.n_ratings
    assert te.n_ratings == 2000
    tr2, te2 = train_test_split(coo, test_frac=0.2, seed=5)
    np.testing.assert_array_equal(te.user, te2.user)
    perm1 = epoch_permutation(1000, seed=1, epoch=0)
    perm2 = epoch_permutation(1000, seed=1, epoch=0)
    np.testing.assert_array_equal(perm1, perm2)
    assert not np.array_equal(perm1, epoch_permutation(1000, seed=1, epoch=1))


def test_pad_to_batches_flat():
    coo = synthetic.make_synthetic(30, 40, 100, seed=0)
    perm = epoch_permutation(100, 0, 0)
    arrays = part.pad_to_batches(coo.user, coo.item, coo.rating, perm, 32)
    assert arrays["users"].shape == (4, 32)
    assert arrays["weights"].sum() == 100
    # reconstruct: every rating appears exactly once among weighted slots
    w = arrays["weights"].astype(bool)
    pairs = set(zip(arrays["users"][w].tolist(), arrays["items"][w].tolist(),
                    arrays["ratings"][w].tolist()))
    ref = set(zip(coo.user.tolist(), coo.item.tolist(), coo.rating.tolist()))
    assert pairs == ref


def test_conflict_free_partition_property():
    coo = synthetic.make_synthetic(60, 50, 3000, seed=2)
    perm = epoch_permutation(3000, 0, 0)
    batches = part.partition_conflict_free(coo.user, coo.item, 64, perm)
    # coverage: each rating exactly once
    allidx = np.concatenate(batches)
    assert sorted(allidx.tolist()) == list(range(3000))
    # property: no duplicate user or item row within any batch
    for idx in batches:
        assert len(idx) <= 64
        assert len(np.unique(coo.user[idx])) == len(idx)
        assert len(np.unique(coo.item[idx])) == len(idx)


def test_conflict_free_deterministic():
    coo = synthetic.make_synthetic(40, 40, 1000, seed=9)
    perm = epoch_permutation(1000, 3, 1)
    b1 = part.partition_conflict_free(coo.user, coo.item, 32, perm)
    b2 = part.partition_conflict_free(coo.user, coo.item, 32, perm)
    assert len(b1) == len(b2)
    for x, y in zip(b1, b2):
        np.testing.assert_array_equal(x, y)


def test_blocked_partition():
    coo = synthetic.make_synthetic(100, 90, 5000, seed=1)
    perm = epoch_permutation(5000, 0, 0)
    bp = part.make_blocked_partition(coo.user, coo.item, 100, 90, 32, 32, perm)
    assert bp.num_ublocks == 4 and bp.num_iblocks == 3
    # CSR covers everything exactly once
    assert bp.offsets[-1] == 5000
    assert sorted(bp.order.tolist()) == list(range(5000))
    # every rating lands in its stratum
    for a in range(bp.num_ublocks):
        for b in range(bp.num_iblocks):
            idx = bp.stratum(a, b)
            assert np.all(coo.user[idx] // 32 == a)
            assert np.all(coo.item[idx] // 32 == b)


def test_loaders_parse_formats(tmp_path):
    from mfx.data.loaders import parse_ml100k, parse_ml1m, parse_ml25m

    d = tmp_path / "ml-100k"
    d.mkdir()
    (d / "u.data").write_text("1\t10\t4.0\t881250949\n2\t10\t3.0\t0\n1\t20\t5.0\t0\n")
    coo = parse_ml100k(d)
    assert coo.n_ratings == 3 and coo.num_users == 2 and coo.num_items == 2

    d1 = tmp_path / "ml-1m"
    d1.mkdir()
    (d1 / "ratings.dat").write_text("1::1193::5::978300760\n2::661::3::978302109\n")
    coo = parse_ml1m(d1)
    assert coo.n_ratings == 2 and coo.num_users == 2

    d2 = tmp_path / "ml-25m"
    d2.mkdir()
    (d2 / "ratings.csv").write_text(
        "userId,movieId,rating,timestamp\n1,296,5.0,1147880044\n1,306,3.5,1\n"
    )
    coo = parse_ml25m(d2)
    assert coo.n_ratings == 2 and coo.num_items == 2
    np.testing.assert_allclose(sorted(coo.rating), [3.5, 5.0])


def test_load_dataset_synthetic_fallback(tmp_path):
    from mfx.data.loaders import load_dataset

    coo = load_dataset("synthetic-small", root=tmp_path, cache=True)
    assert coo.n_ratings == 20_000
    # second load hits the npz cache
    coo2 = load_dataset("synthetic-small", root=tmp_path, cache=True)
    np.testing.assert_array_equal(coo.user, coo2.user)
    with pytest.raises(KeyError):
        load_dataset("nope")


def test_leave_one_out_split():
    from mfx.data.split import leave_one_out_split

    coo = synthetic.make_synthetic(80, 40, 900, seed=4)  # duplicates likely
    train, test = leave_one_out_split(coo, seed=1)
    # held-out pairs (ALL their duplicate copies) are gone from train
    assert test.n_ratings <= coo.n_ratings - train.n_ratings
    tr_keys = train.user.astype(np.int64) * coo.num_items + train.item
    te_keys = test.user.astype(np.int64) * coo.num_items + test.item
    assert not np.isin(tr_keys, te_keys).any()  # no leakage
    # exactly one held-out item per user with >= 2 UNIQUE items
    keys = coo.user.astype(np.int64) * coo.num_items + coo.item
    uq_users = (np.unique(keys) // coo.num_items).astype(np.int64)
    uniq_counts = np.bincount(uq_users, minlength=coo.num_users)
    test_counts = np.bincount(test.user, minlength=coo.num_users)
    assert (test_counts[uniq_counts >= 2] == 1).all()
    assert (test_counts[uniq_counts < 2] == 0).all()
    # every user keeps >= 1 training interaction
    train_counts = np.bincount(train.user, minlength=coo.num_users)
    raw_counts = np.bincount(coo.user, minlength=coo.num_users)
    assert (train_counts[raw_counts >= 1] >= 1).all()
    # reproducible; different seed picks differently
    t2 = leave_one_out_split(coo, seed=1)[1]
    np.testing.assert_array_equal(test.item, t2.item)
    t3 = leave_one_out_split(coo, seed=2)[1]
    assert not np.array_equal(test.item, t3.item)
    # explicit duplicate construction: the duplicated pair, when picked,
    # must not survive in train
    from mfx.data.coo import RatingsCOO

    dup = RatingsCOO(
        user=np.array([0, 0, 0, 1, 1], np.int32),
        item=np.array([2, 2, 3, 1, 4], np.int32),
        rating=np.ones(5, np.float32),
        num_users=2, num_items=5,
    )
    for s in range(6):
        tr, te = leave_one_out_split(dup, seed=s)
        assert te.n_ratings == 2  # both users have 2 unique items
        k_tr = tr.user.astype(np.int64) * 5 + tr.item
        k_te = te.user.astype(np.int64) * 5 + te.item
        assert not np.isin(k_tr, k_te).any()
        assert set(np.bincount(tr.user, minlength=2)) <= {1, 2}
