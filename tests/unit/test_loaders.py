"""Dataset loader tests with tiny checked-in-style fixtures (SURVEY.md C2):
every real-file parser is exercised on a hand-written fixture, and the
cache provenance rules (synthetic caches must never shadow real data) are
verified end-to-end."""

import numpy as np
import pytest

from mfx.data import loaders
from mfx.data.coo import RatingsCOO


def _write(path, text):
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(text)


def test_parse_ml100k(tmp_path):
    _write(
        tmp_path / "u.data",
        "196\t242\t3.0\t881250949\n"
        "186\t302\t3.0\t891717742\n"
        "22\t377\t1.0\t878887116\n"
        "196\t377\t2.0\t880606923\n",
    )
    coo = loaders.parse_ml100k(tmp_path)
    assert coo.n_ratings == 4
    assert coo.num_users == 3 and coo.num_items == 3
    # users relabel by descending activity (generator v6): 196 (2
    # ratings) -> id 0, then 22, 186 (1 each, raw-id order)
    assert coo.user.tolist() == [0, 2, 1, 0]
    assert coo.user_raw_ids.tolist() == [196, 22, 186]
    assert coo.rating.tolist() == [3.0, 3.0, 1.0, 2.0]
    assert not coo.synthetic
    # items relabel by descending frequency: 377 (2 ratings) -> id 0,
    # then 242, 302 (1 each, raw-id order); raw-id map rides along
    assert coo.item.tolist() == [1, 2, 0, 0]
    assert coo.item_raw_ids.tolist() == [377, 242, 302]


def test_parse_ml1m(tmp_path):
    _write(
        tmp_path / "ratings.dat",
        "1::1193::5::978300760\n1::661::3::978302109\n2::1193::4::978298413\n",
    )
    coo = loaders.parse_ml1m(tmp_path)
    assert coo.n_ratings == 3
    assert coo.num_users == 2 and coo.num_items == 2
    assert coo.rating.tolist() == [5.0, 3.0, 4.0]


def test_parse_ml25m(tmp_path):
    _write(
        tmp_path / "ratings.csv",
        "userId,movieId,rating,timestamp\n"
        "1,296,5.0,1147880044\n"
        "1,306,3.5,1147868817\n"
        "7,296,4.0,1147880044\n",
    )
    coo = loaders.parse_ml25m(tmp_path)
    assert coo.n_ratings == 3
    assert coo.num_users == 2 and coo.num_items == 2
    assert coo.rating.tolist() == [5.0, 3.5, 4.0]
    # movie 296 (2 ratings) relabels to item 0; 306 to item 1
    assert coo.item.tolist() == [0, 1, 0]
    assert coo.item_raw_ids.tolist() == [296, 306]
    # the relabel + raw-id map round-trips the npz cache
    coo.save_npz(tmp_path / "c.npz")
    back = RatingsCOO.load_npz(tmp_path / "c.npz")
    assert back.item_raw_ids.tolist() == [296, 306]


def test_parse_netflix(tmp_path):
    _write(tmp_path / "training_set" / "mv_0000001.txt",
           "1:\n1488844,3,2005-09-06\n822109,5,2005-05-13\n")
    _write(tmp_path / "training_set" / "mv_0000002.txt",
           "2:\n822109,1,2005-05-18\n")
    coo = loaders.parse_netflix(tmp_path)
    assert coo.n_ratings == 3
    assert coo.num_users == 2 and coo.num_items == 2
    assert sorted(coo.rating.tolist()) == [1.0, 3.0, 5.0]


def test_synthetic_fallback_is_flagged_and_cached_separately(tmp_path):
    with pytest.warns(UserWarning, match="SYNTHETIC"):
        coo = loaders.load_dataset("ml-100k", root=tmp_path)
    assert coo.synthetic
    syn_cache = tmp_path / f"ml-100k.v{loaders.GENERATOR_VERSION}.synthetic.npz"
    real_cache = tmp_path / f"ml-100k.v{loaders.GENERATOR_VERSION}.npz"
    assert syn_cache.exists() and not real_cache.exists()
    # second load comes from the synthetic cache, still flagged
    coo2 = loaders.load_dataset("ml-100k", root=tmp_path)
    assert coo2.synthetic and coo2.n_ratings == coo.n_ratings


def test_real_data_added_later_beats_synthetic_cache(tmp_path):
    with pytest.warns(UserWarning):
        syn = loaders.load_dataset("ml-100k", root=tmp_path)
    assert syn.synthetic
    # drop real raw files in afterwards — they must win over the cache
    _write(tmp_path / "ml-100k" / "u.data", "1\t10\t4.0\t0\n2\t20\t3.0\t0\n")
    coo = loaders.load_dataset("ml-100k", root=tmp_path)
    assert not coo.synthetic
    assert coo.n_ratings == 2
    # and the real parse is now cached under the real name
    assert (tmp_path / f"ml-100k.v{loaders.GENERATOR_VERSION}.npz").exists()
    again = loaders.load_dataset("ml-100k", root=tmp_path)
    assert not again.synthetic and again.n_ratings == 2


def test_legacy_synthetic_cache_under_real_name_is_migrated(tmp_path):
    """A pre-provenance cache written from a synthetic fallback under the
    real dataset's name is detected via its flag and renamed aside."""
    coo = RatingsCOO(
        user=np.zeros(3, np.int32), item=np.arange(3, dtype=np.int32),
        rating=np.ones(3, np.float32), num_users=1, num_items=3,
        synthetic=True,
    )
    real_cache = tmp_path / f"ml-100k.v{loaders.GENERATOR_VERSION}.npz"
    tmp_path.mkdir(exist_ok=True)
    coo.save_npz(real_cache)
    _write(tmp_path / "ml-100k" / "u.data", "1\t10\t4.0\t0\n")
    loaded = loaders.load_dataset("ml-100k", root=tmp_path)
    assert not loaded.synthetic and loaded.n_ratings == 1
