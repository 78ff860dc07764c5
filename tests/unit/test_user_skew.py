"""Generator v6: user-activity skew + the 2-D relabel contract
(VERDICT r3 #1/#5 — the occupancy lever needs BOTH axes heavy-tailed
and popularity-sorted; iid-uniform users hid it)."""

import numpy as np

from mfx.data import loaders, synthetic


def test_user_zipf_skews_activity_and_sorts_users():
    coo = synthetic.make_synthetic(
        2_000, 500, 100_000, rank=4, seed=3, user_zipf_s=0.6
    )
    deg = np.bincount(coo.user, minlength=2_000)
    # popularity-sorted by construction: the first users are the hottest
    assert deg[:20].mean() > 10 * deg[-1000:].mean()
    # top 1% of users carry several times their uniform share
    top = int(0.01 * 2_000)
    share = deg[:top].sum() / coo.n_ratings
    assert 0.05 < share < 0.5  # uniform would give ~0.01
    # deterministic
    again = synthetic.make_synthetic(
        2_000, 500, 100_000, rank=4, seed=3, user_zipf_s=0.6
    )
    np.testing.assert_array_equal(coo.user, again.user)
    np.testing.assert_array_equal(coo.rating, again.rating)


def test_user_zipf_zero_is_legacy_uniform():
    coo = synthetic.make_synthetic(512, 64, 20_000, rank=4, seed=5)
    skew = synthetic.make_synthetic(
        512, 64, 20_000, rank=4, seed=5, user_zipf_s=0.6
    )
    deg = np.bincount(coo.user, minlength=512)
    # uniform users: max degree within ~3x of mean (multinomial)
    assert deg.max() < 3 * deg.mean()
    assert np.bincount(skew.user, minlength=512).max() > deg.max()


def test_benchmark_fallbacks_carry_user_skew(tmp_path):
    """The registry's benchmark-shape synthetics are heavy-tailed on the
    user axis too (ml-25m shown here at reduced cost via the small proxy:
    assert the registry wires user_zipf_s through)."""
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        coo = loaders.load_dataset("ml-100k", root=tmp_path)
    assert coo.synthetic
    deg = np.bincount(coo.user, minlength=coo.num_users)
    # user 0 is the hottest; the head carries a multiple of uniform share
    top = max(1, coo.num_users // 100)
    assert deg[:top].sum() / coo.n_ratings > 0.03
    assert deg[0] >= deg[coo.num_users // 2]


def test_densify_relabels_users_by_activity():
    raw_u = np.array([7, 7, 7, 3, 3, 9], np.int64)
    raw_i = np.array([1, 2, 3, 1, 2, 1], np.int64)
    r = np.ones(6, np.float32)
    coo = loaders._densify(raw_u, raw_i, r)
    # user 7 (3 ratings) -> 0, user 3 (2) -> 1, user 9 (1) -> 2
    assert coo.user.tolist() == [0, 0, 0, 1, 1, 2]
    assert coo.user_raw_ids.tolist() == [7, 3, 9]
    # round-trips through npz with the user map
    import io

    buf = io.BytesIO()
    coo.save_npz(buf)
    buf.seek(0)
    back = type(coo).load_npz(buf)
    assert back.user_raw_ids.tolist() == [7, 3, 9]
