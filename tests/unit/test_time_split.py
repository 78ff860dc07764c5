"""Timestamp plumbing + chronological evaluation protocols (SURVEY.md C2/C3).

The reference's implied data format carries a timestamp column
(``/root/reference/README.md:1-2`` implies MovieLens-style
``user \t item \t rating \t ts`` triples, SURVEY.md §0.1); chronological
splits are the standard leakage-free RecSys protocol, so the loaders keep
the column and the splitters can cut on it:

- ``chronological_split``: global time cut — train on the past, test on
  the future.
- ``leave_one_out_split(by='time')``: each user's LATEST unique item is
  held out (the NCF paper's actual protocol; the seeded-random pick
  remains the timestamp-free fallback).
"""

import numpy as np
import pytest

from mfx.data.coo import RatingsCOO
from mfx.data import loaders
from mfx.data.split import chronological_split, leave_one_out_split


def _coo(users, items, ratings, ts=None, num_users=None, num_items=None):
    users = np.asarray(users, np.int32)
    items = np.asarray(items, np.int32)
    return RatingsCOO(
        users,
        items,
        np.asarray(ratings, np.float32),
        num_users=num_users or int(users.max()) + 1,
        num_items=num_items or int(items.max()) + 1,
        timestamp=None if ts is None else np.asarray(ts, np.int64),
    )


# ---- container plumbing -----------------------------------------------------


def test_timestamp_threads_through_select_concat_npz(tmp_path):
    coo = _coo([0, 1, 2, 0], [1, 0, 2, 2], [1, 2, 3, 4], ts=[40, 10, 30, 20])
    sel = coo.select(np.array([2, 0]))
    assert sel.timestamp.tolist() == [30, 40]
    both = sel.concat(coo.select(np.array([1])))
    assert both.timestamp.tolist() == [30, 40, 10]

    path = tmp_path / "c.npz"
    coo.save_npz(path)
    back = RatingsCOO.load_npz(path)
    assert back.timestamp.dtype == np.int64
    assert back.timestamp.tolist() == [40, 10, 30, 20]

    # timestamp-free COOs round-trip as timestamp-free
    bare = _coo([0], [0], [1.0])
    bare.save_npz(tmp_path / "b.npz")
    assert RatingsCOO.load_npz(tmp_path / "b.npz").timestamp is None


def test_timestamp_shape_validated():
    with pytest.raises(ValueError, match="timestamp"):
        _coo([0, 1], [0, 1], [1, 2], ts=[5])


def test_concat_mixed_timestamp_presence_drops_timestamps():
    a = _coo([0], [0], [1.0], ts=[7], num_users=2, num_items=2)
    b = _coo([1], [1], [2.0], num_users=2, num_items=2)
    assert a.concat(b).timestamp is None
    assert b.concat(a).timestamp is None


# ---- parsers keep the column ------------------------------------------------


def test_parse_ml100k_keeps_timestamps(tmp_path):
    (tmp_path / "u.data").write_text(
        "196\t242\t3.0\t881250949\n"
        "186\t302\t3.0\t891717742\n"
        "22\t377\t1.0\t878887116\n"
    )
    coo = loaders.parse_ml100k(tmp_path)
    assert coo.timestamp.tolist() == [881250949, 891717742, 878887116]


def test_parse_ml25m_keeps_timestamps(tmp_path):
    (tmp_path / "ratings.csv").write_text(
        "userId,movieId,rating,timestamp\n"
        "1,296,5.0,1147880044\n"
        "7,306,3.5,1147868817\n"
    )
    coo = loaders.parse_ml25m(tmp_path)
    assert coo.timestamp.tolist() == [1147880044, 1147868817]


def test_parse_netflix_dates_to_days(tmp_path):
    d = tmp_path / "training_set"
    d.mkdir()
    (d / "mv_0000001.txt").write_text(
        "1:\n1488844,3,2005-09-06\n822109,5,2005-05-13\n"
    )
    coo = loaders.parse_netflix(tmp_path)
    # days since unix epoch; only the ORDER is contractual
    expect = [
        int(np.datetime64("2005-09-06", "D").astype(np.int64)),
        int(np.datetime64("2005-05-13", "D").astype(np.int64)),
    ]
    assert coo.timestamp.tolist() == expect


def test_parse_triples_without_time_column(tmp_path):
    (tmp_path / "t.tsv").write_text("0\t0\t1.0\n1\t1\t2.0\n")
    coo = loaders.parse_triples(tmp_path / "t.tsv", sep="\t")
    assert coo.timestamp is None


# ---- chronological split ----------------------------------------------------


def test_chronological_split_cuts_on_time():
    ts = [50, 10, 40, 30, 20, 60, 0, 70, 35, 45]
    coo = _coo(
        np.arange(10) % 3, np.arange(10) % 4, np.ones(10), ts=ts
    )
    train, test = chronological_split(coo, test_frac=0.3)
    assert train.n_ratings == 7 and test.n_ratings == 3
    assert max(train.timestamp) <= min(test.timestamp)
    assert sorted(test.timestamp.tolist()) == [50, 60, 70]
    # every rating lands on exactly one side
    assert sorted(train.timestamp.tolist() + test.timestamp.tolist()) == sorted(ts)


def test_chronological_split_stable_on_ties():
    # equal timestamps: the cut is by (ts, original position) — deterministic
    coo = _coo([0, 1, 2, 3], [0, 1, 2, 3], [1, 2, 3, 4], ts=[5, 5, 5, 5])
    train, test = chronological_split(coo, test_frac=0.5)
    assert train.user.tolist() == [0, 1]
    assert test.user.tolist() == [2, 3]


def test_chronological_split_requires_timestamps():
    coo = _coo([0, 1], [0, 1], [1, 2])
    with pytest.raises(ValueError, match="timestamp"):
        chronological_split(coo, test_frac=0.5)


# ---- per-user timeline split -------------------------------------------


def test_user_chronological_split_holds_out_each_users_tail():
    from mfx.data.split import user_chronological_split

    # user 0: 5 events, frac 0.4 -> last 2 held out
    # user 1: 2 events, frac 0.4 -> floor(0.8) = 0 -> all in train
    # user 2: 3 events, frac 0.4 -> last 1 held out
    users = [0, 0, 0, 0, 0, 1, 1, 2, 2, 2]
    items = [0, 1, 2, 3, 4, 0, 1, 2, 3, 4]
    ts = [50, 10, 40, 30, 20, 9, 5, 7, 3, 1]
    coo = _coo(users, items, np.arange(10) + 1.0, ts=ts)
    train, test = user_chronological_split(coo, test_frac=0.4)
    assert test.n_ratings == 3
    # user 0's two latest events are t=40,50; user 2's latest is t=7
    held = sorted(zip(test.user.tolist(), test.timestamp.tolist()))
    assert held == [(0, 40), (0, 50), (2, 7)]
    # per-user: every train event precedes every test event
    for u in (0, 2):
        assert max(train.timestamp[train.user == u]) <= min(
            test.timestamp[test.user == u]
        )
    assert (train.user == 1).sum() == 2  # small user untouched
    # partition: nothing lost or duplicated
    assert train.n_ratings + test.n_ratings == coo.n_ratings


def test_user_chronological_split_tie_break_deterministic():
    from mfx.data.split import user_chronological_split

    # all-equal timestamps: the cut falls on original row order
    coo = _coo([0, 0, 0, 0], [0, 1, 2, 3], [1, 2, 3, 4], ts=[5, 5, 5, 5])
    train, test = user_chronological_split(coo, test_frac=0.5)
    assert train.item.tolist() == [0, 1]
    assert test.item.tolist() == [2, 3]


def test_user_chronological_split_requires_timestamps():
    from mfx.data.split import user_chronological_split

    coo = RatingsCOO(np.zeros(2, np.int32), np.arange(2, dtype=np.int32),
                     np.ones(2, np.float32), 1, 2)
    with pytest.raises(ValueError, match="timestamp"):
        user_chronological_split(coo, test_frac=0.5)


def test_driver_user_time_split(tmp_path):
    from mfx.config import TrainConfig, DataConfig, ModelConfig, SGDConfig
    from mfx.train.driver import train

    rng = np.random.default_rng(2)
    n = 3000
    coo = RatingsCOO(
        rng.integers(0, 48, n).astype(np.int32),
        rng.integers(0, 24, n).astype(np.int32),
        rng.uniform(1, 5, n).astype(np.float32),
        48, 24, timestamp=rng.permutation(n).astype(np.int64),
    )
    root = tmp_path / "data"
    root.mkdir()
    coo.save_npz(root / f"synthetic-small.v{loaders.GENERATOR_VERSION}.npz")
    cfg = TrainConfig(
        data=DataConfig(dataset="synthetic-small", root=str(root),
                        test_frac=0.25, split="user-time"),
        model=ModelConfig(rank=4),
        sgd=SGDConfig(lr=0.05, reg=0.02, epochs=1, batch_size=256),
    )
    result = train(cfg, resume=False)
    assert np.isfinite(result.test_rmse)


# ---- time-aware leave-one-out ----------------------------------------------


def test_loo_time_holds_out_latest_unique_item():
    # user 0: items 0@t=10, 1@t=50, 2@t=30 -> holds out item 1
    # user 1: items 3@t=5, 0@t=9           -> holds out item 0
    # user 2: single item -> stays in train entirely
    coo = _coo(
        [0, 0, 0, 1, 1, 2],
        [0, 1, 2, 3, 0, 4],
        [1, 2, 3, 4, 5, 6],
        ts=[10, 50, 30, 5, 9, 99],
    )
    train, test = leave_one_out_split(coo, by="time")
    assert test.user.tolist() == [0, 1]
    assert test.item.tolist() == [1, 0]
    assert train.n_ratings == 4
    assert 4 in train.item.tolist()  # user 2 untouched


def test_loo_time_pair_max_ts_and_dup_drop():
    # duplicate copies of a pair: its recency is the MAX over copies, and
    # ALL copies of the held-out pair leave train. user 0: pair (0,1) has
    # copies at t=1 and t=100 (latest overall); pair (0,2) at t=50.
    coo = _coo(
        [0, 0, 0, 0],
        [1, 2, 1, 3],
        [1, 2, 3, 4],
        ts=[1, 50, 100, 20],
    )
    train, test = leave_one_out_split(coo, by="time")
    assert test.item.tolist() == [1]
    assert train.item.tolist() == [2, 3]  # both copies of item 1 dropped


def test_loo_time_requires_timestamps():
    coo = _coo([0, 0], [0, 1], [1, 2])
    with pytest.raises(ValueError, match="timestamp"):
        leave_one_out_split(coo, by="time")


def test_loo_random_unchanged_by_default():
    coo = _coo([0, 0, 1, 1], [0, 1, 0, 1], [1, 2, 3, 4], ts=[1, 2, 3, 4])
    a_train, a_test = leave_one_out_split(coo, seed=3)
    b_train, b_test = leave_one_out_split(coo, seed=3, by="random")
    assert a_test.item.tolist() == b_test.item.tolist()
    assert a_train.item.tolist() == b_train.item.tolist()


def test_loo_invalid_by():
    coo = _coo([0], [0], [1.0], ts=[1])
    with pytest.raises(ValueError, match="by"):
        leave_one_out_split(coo, by="latest")


# ---- driver + CLI integration ----------------------------------------------


def test_driver_time_split(tmp_path):
    """data.split='time' trains on the past and evaluates on the future,
    end-to-end through mfx.train.driver.train (the dataset comes from a
    real-provenance npz cache carrying timestamps)."""
    from mfx.config import TrainConfig, DataConfig, ModelConfig, SGDConfig
    from mfx.train.driver import train

    rng = np.random.default_rng(0)
    n = 4000
    users = rng.integers(0, 64, n).astype(np.int32)
    items = rng.integers(0, 32, n).astype(np.int32)
    ratings = rng.uniform(1, 5, n).astype(np.float32)
    ts = rng.permutation(n).astype(np.int64)
    coo = RatingsCOO(users, items, ratings, 64, 32, timestamp=ts)
    root = tmp_path / "data"
    root.mkdir()
    coo.save_npz(root / f"synthetic-small.v{loaders.GENERATOR_VERSION}.npz")

    cfg = TrainConfig(
        data=DataConfig(dataset="synthetic-small", root=str(root),
                        test_frac=0.25, split="time"),
        model=ModelConfig(rank=4),
        sgd=SGDConfig(lr=0.05, reg=0.02, epochs=1, batch_size=256),
        solver="sgd",
    )
    result = train(cfg, resume=False)
    assert result.test_rmse is not None and np.isfinite(result.test_rmse)


def test_driver_time_split_without_timestamps_errors(tmp_path):
    from mfx.config import TrainConfig, DataConfig, ModelConfig, SGDConfig
    from mfx.train.driver import train

    cfg = TrainConfig(
        data=DataConfig(dataset="synthetic-small", root=str(tmp_path),
                        split="time"),
        model=ModelConfig(rank=4),
        sgd=SGDConfig(lr=0.05, reg=0.02, epochs=1, batch_size=256),
        solver="sgd",
    )
    with pytest.raises(ValueError, match="timestamp"):
        train(cfg, resume=False)


def test_data_config_split_validated():
    from mfx.config import DataConfig

    with pytest.raises(ValueError, match="split"):
        DataConfig(split="chrono")


def test_cli_eval_time_splits(tmp_path):
    """`mfx eval --split time|loo-time` run the chronological protocols
    off a checkpoint, end to end through the CLI."""
    import contextlib
    import io
    import json

    import mfx.cli
    from mfx.config import TrainConfig, DataConfig, ModelConfig, SGDConfig
    from mfx.train.driver import train

    rng = np.random.default_rng(1)
    n = 3000
    coo = RatingsCOO(
        rng.integers(0, 48, n).astype(np.int32),
        rng.integers(0, 24, n).astype(np.int32),
        rng.uniform(1, 5, n).astype(np.float32),
        48, 24,
        timestamp=rng.permutation(n).astype(np.int64),
    )
    root = tmp_path / "data"
    root.mkdir()
    coo.save_npz(root / f"synthetic-small.v{loaders.GENERATOR_VERSION}.npz")

    ckpt = tmp_path / "ckpt"
    cfg = TrainConfig(
        data=DataConfig(dataset="synthetic-small", root=str(root),
                        test_frac=0.2, split="time"),
        model=ModelConfig(rank=4),
        sgd=SGDConfig(lr=0.05, reg=0.02, epochs=1, batch_size=256),
        solver="sgd",
        checkpoint_dir=str(ckpt),
        checkpoint_every=1,
    )
    train(cfg, resume=False)

    for split in ("time", "loo-time"):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = mfx.cli.main([
                "eval", "--checkpoint", str(ckpt),
                "--dataset", "synthetic-small", "--root", str(root),
                "--test-frac", "0.2", "--split", split,
            ])
        assert rc == 0
        ev = json.loads(buf.getvalue())
        assert np.isfinite(ev["rmse"])
