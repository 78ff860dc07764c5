"""Temporal-dynamics MF (solver='timesvd') — mfx/models/timesvd.py +
mfx/solvers/timesvd.py.

Oracle strategy (SURVEY.md §4): NumPy featurizer checks, jax.grad
exactness of the fused update on a conflict-free batch, bitwise collapse
onto plain biased MF when the temporal rates are zero, a
quality-improvement test on synthetic data with injected temporal
structure, and the driver/validation end-to-end paths.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mfx.config import (
    DataConfig, ModelConfig, SGDConfig, TimeSVDConfig, TrainConfig,
)
from mfx.data.coo import RatingsCOO
from mfx.models.mf import init_model
from mfx.models.timesvd import (
    TimeSVDModel, fit_time_features, init_timesvd,
)
from mfx.solvers.timesvd import (
    rmse_mae_time, timesvd_minibatch_update, train_epochs_timesvd,
)


def _coo(users, items, ratings, ts, num_users=None, num_items=None):
    users = np.asarray(users, np.int32)
    items = np.asarray(items, np.int32)
    return RatingsCOO(
        users, items, np.asarray(ratings, np.float32),
        num_users=num_users or int(users.max()) + 1,
        num_items=num_items or int(items.max()) + 1,
        timestamp=np.asarray(ts, np.int64),
    )


def _synth(n=6000, nu=80, ni=40, seed=0, temporal=True):
    """Rank-2 synthetic with injected temporal structure: item biases
    drift across 3 eras, users drift linearly at per-user rates."""
    rng = np.random.default_rng(seed)
    P = rng.normal(0, 0.4, (nu, 2))
    Q = rng.normal(0, 0.4, (ni, 2))
    bu = rng.normal(0, 0.2, nu)
    bi = rng.normal(0, 0.2, ni)
    users = rng.integers(0, nu, n).astype(np.int32)
    items = rng.integers(0, ni, n).astype(np.int32)
    ts = rng.integers(0, 3_000_000, n).astype(np.int64)
    r = 3.5 + bu[users] + bi[items] + np.sum(P[users] * Q[items], axis=1)
    if temporal:
        era = (ts * 3 // 3_000_000).astype(np.int64)  # 3 calendar eras
        bi_era = rng.normal(0, 0.35, (ni, 3))
        alpha = rng.normal(0, 0.5, nu)
        tn = ts / 3_000_000.0
        r = r + bi_era[items, era] + alpha[users] * (tn - 0.5)
    r = r + rng.normal(0, 0.1, n)
    return _coo(users, items, np.clip(r, 0.5, 5.0).astype(np.float32), ts,
                num_users=nu, num_items=ni)


# ---- featurizer -------------------------------------------------------------


def test_fit_time_features_oracle():
    coo = _coo([0, 0, 1, 1, 1], [0, 1, 0, 1, 2], [1, 2, 3, 4, 5],
               ts=[100, 200, 300, 400, 500])
    f = fit_time_features(coo, n_bins=2, beta=0.4)
    assert f.t0 == 100 and f.t1 == 500 and f.span == 400.0
    assert f.n_bins == 2
    # equal-count edge = the median train time
    assert f.edges.tolist() == [300]
    # side='right': a time equal to the edge opens the NEXT bin
    assert f.bins(np.array([100, 299, 300, 999])).tolist() == [0, 0, 1, 1]
    # per-user mean times
    np.testing.assert_allclose(f.tu, [150.0, 400.0])
    # dev: sign(Δ) * |Δ/span|^0.4, float64 internally
    d = f.dev(np.array([0, 1]), np.array([550, 200], np.int64))
    np.testing.assert_allclose(
        d, [np.sign(400) * (400 / 400) ** 0.4,
            -((200 / 400) ** 0.4)], rtol=1e-6,
    )
    # a user outside train falls back to the global mean time: covered by
    # construction (all users present here); unseen-user default checked
    # via a user with no ratings
    coo2 = _coo([0, 0], [0, 1], [1, 2], ts=[10, 30], num_users=3)
    f2 = fit_time_features(coo2, n_bins=1)
    assert f2.tu[2] == pytest.approx(20.0)
    assert f2.edges.size == 0  # n_bins=1 -> everything bin 0


def test_fit_time_features_requires_timestamps():
    coo = RatingsCOO(np.zeros(2, np.int32), np.arange(2, dtype=np.int32),
                     np.ones(2, np.float32), 1, 2)
    with pytest.raises(ValueError, match="timestamp"):
        fit_time_features(coo)


# ---- update exactness -------------------------------------------------------


def test_update_matches_jax_grad():
    """On a conflict-free batch the fused update equals one explicit
    gradient step of the per-example objective
    0.5*e^2 + 0.5*reg_x*||x||^2 per touched parameter."""
    rng = np.random.default_rng(1)
    nu, ni, nb, k = 7, 9, 3, 4
    model = init_timesvd(0, nu, ni, k, nb, global_mean=3.3)
    model = dataclasses.replace(
        model,
        bu=jnp.asarray(rng.normal(0, 0.1, nu), jnp.float32),
        bi=jnp.asarray(rng.normal(0, 0.1, ni), jnp.float32),
        bt=jnp.asarray(rng.normal(0, 0.1, (ni, nb)), jnp.float32),
        alpha=jnp.asarray(rng.normal(0, 0.1, nu), jnp.float32),
    )
    B = 5
    users = jnp.asarray(rng.permutation(nu)[:B].astype(np.int32))
    items = jnp.asarray(rng.permutation(ni)[:B].astype(np.int32))
    ratings = jnp.asarray(rng.uniform(1, 5, B), jnp.float32)
    weights = jnp.ones(B, jnp.float32)
    tbins = jnp.asarray(rng.integers(0, nb, B), jnp.int32)
    devs = jnp.asarray(rng.normal(0, 0.5, B), jnp.float32)
    lr, lr_t, lr_a = 0.03, 0.02, 0.01
    reg, reg_t, reg_a = 0.05, 0.04, 0.2

    new, sq = timesvd_minibatch_update(
        model, users, items, ratings, weights, tbins, devs,
        lr, lr_t, lr_a, reg, reg_t, reg_a, unique_rows=True,
    )

    def loss(params):
        m = dataclasses.replace(
            model, P=params["P"], Q=params["Q"], bu=params["bu"],
            bi=params["bi"], bt=params["bt"], alpha=params["alpha"],
        )
        pred = m.predict_t(users, items, tbins, devs)
        err = ratings - pred
        # per-occurrence L2, matching the SGD update's -reg*x term
        reg_term = 0.0
        for nm, rg in (("P", reg), ("Q", reg), ("bu", reg), ("bi", reg)):
            x = params[nm]
            sel = jnp.take(x, users if nm in ("P", "bu") else items, axis=0)
            reg_term = reg_term + 0.5 * rg * jnp.sum(sel * sel)
        bt_sel = jnp.take(params["bt"].reshape(-1), items * nb + tbins)
        reg_term = reg_term + 0.5 * reg_t * jnp.sum(bt_sel * bt_sel)
        al_sel = jnp.take(params["alpha"], users)
        reg_term = reg_term + 0.5 * reg_a * jnp.sum(al_sel * al_sel)
        return 0.5 * jnp.sum(err * err) + reg_term

    params = {"P": model.P, "Q": model.Q, "bu": model.bu, "bi": model.bi,
              "bt": model.bt, "alpha": model.alpha}
    g = jax.grad(loss)(params)
    np.testing.assert_allclose(new.P, model.P - lr * g["P"], rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(new.Q, model.Q - lr * g["Q"], rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(new.bu, model.bu - lr * g["bu"], rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(new.bi, model.bi - lr * g["bi"], rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(new.bt, model.bt - lr_t * g["bt"], rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(
        new.alpha, model.alpha - lr_a * g["alpha"], rtol=2e-5, atol=2e-6
    )


def test_collapses_to_biased_mf_when_temporal_rates_zero():
    """lr_t = lr_alpha = 0 freezes bt/alpha at zero; the P/Q/bu/bi
    trajectory must equal the plain jnp SGD path's exactly (same seed,
    same partitioner => identical batches)."""
    from mfx.solvers.sgd import train_epochs

    coo = _synth(n=2500, nu=50, ni=30, temporal=False)
    base = init_model(0, coo.num_users, coo.num_items, rank=4,
                      global_mean=coo.global_mean)
    tcfg = TimeSVDConfig(lr=0.05, reg=0.02, lr_decay=0.9, epochs=3,
                         batch_size=512, lr_t=0.0, lr_alpha=0.0,
                         partitioner="conflict_free")
    scfg = SGDConfig(lr=0.05, reg=0.02, lr_decay=0.9, epochs=3,
                     batch_size=512, partitioner="conflict_free")
    ts_final = mf_final = None
    for _, m, _ in train_epochs_timesvd(base, coo, tcfg, use_bias=True, seed=7):
        ts_final = m
    for _, m, _ in train_epochs(base, coo, scfg, use_bias=True, seed=7):
        mf_final = m
    assert float(jnp.max(jnp.abs(ts_final.bt))) == 0.0
    assert float(jnp.max(jnp.abs(ts_final.alpha))) == 0.0
    np.testing.assert_array_equal(np.asarray(ts_final.P), np.asarray(mf_final.P))
    np.testing.assert_array_equal(np.asarray(ts_final.Q), np.asarray(mf_final.Q))
    np.testing.assert_array_equal(np.asarray(ts_final.bu), np.asarray(mf_final.bu))
    np.testing.assert_array_equal(np.asarray(ts_final.bi), np.asarray(mf_final.bi))


# ---- quality ----------------------------------------------------------------


def test_temporal_model_beats_plain_mf_on_temporal_data():
    """On data with injected era/drift structure, time-aware held-out
    RMSE (chronological split) must beat plain biased MF trained the
    same way."""
    from mfx.data.split import chronological_split
    from mfx.eval.metrics import rmse_mae
    from mfx.solvers.sgd import train_epochs

    coo = _synth(n=9000, nu=100, ni=50, seed=3, temporal=True)
    train, test = chronological_split(coo, test_frac=0.15)
    base = init_model(0, coo.num_users, coo.num_items, rank=4,
                      global_mean=train.global_mean)
    tcfg = TimeSVDConfig(lr=0.05, reg=0.02, lr_decay=0.95, epochs=12,
                         batch_size=1024, n_bins=8,
                         partitioner="conflict_free")
    scfg = SGDConfig(lr=0.05, reg=0.02, lr_decay=0.95, epochs=12,
                     batch_size=1024, partitioner="conflict_free")
    feats = fit_time_features(train, n_bins=8)
    ts_final = mf_final = None
    for _, m, _ in train_epochs_timesvd(
        base, train, tcfg, use_bias=True, seed=1, feats=feats
    ):
        ts_final = m
    for _, m, _ in train_epochs(base, train, scfg, use_bias=True, seed=1):
        mf_final = m
    r_time, _ = rmse_mae_time(ts_final, feats, test)
    r_plain, _ = rmse_mae(mf_final, test)
    assert np.isfinite(r_time) and np.isfinite(r_plain)
    assert r_time < r_plain - 0.01, (r_time, r_plain)


# ---- model plumbing ---------------------------------------------------------


def test_as_mf_folds_at_reference_time():
    coo = _synth(n=1200, nu=30, ni=20, seed=5)
    feats = fit_time_features(coo, n_bins=4)
    rng = np.random.default_rng(2)
    m = init_timesvd(0, 30, 20, 4, 4, global_mean=3.0)
    m = dataclasses.replace(
        m,
        bt=jnp.asarray(rng.normal(0, 0.2, (20, 4)), jnp.float32),
        alpha=jnp.asarray(rng.normal(0, 0.3, 30), jnp.float32),
    )
    t_ref = feats.t1
    view = m.as_mf(feats)  # default: end of the train window
    u = np.arange(30, dtype=np.int32) % 30
    i = np.arange(30, dtype=np.int32) % 20
    tb, dv = feats.features(u, np.full(30, t_ref, np.int64))
    np.testing.assert_allclose(
        np.asarray(view.predict(u, i)),
        np.asarray(m.predict_t(u, i, jnp.asarray(tb), jnp.asarray(dv))),
        rtol=1e-6, atol=1e-6,
    )
    # the feats-free view is the static-bias projection
    bare = m.as_mf()
    np.testing.assert_array_equal(np.asarray(bare.bu), np.asarray(m.bu))


def test_npz_roundtrip(tmp_path):
    m = init_timesvd(3, 11, 7, 4, 5, global_mean=3.1)
    m = dataclasses.replace(m, alpha=m.alpha.at[2].set(0.5))
    p = tmp_path / "ts.npz"
    m.save_npz(p)
    back = TimeSVDModel.load_npz(p)
    for f in ("P", "Q", "bu", "bi", "mu", "bt", "alpha"):
        np.testing.assert_array_equal(
            np.asarray(getattr(m, f)), np.asarray(getattr(back, f))
        )


def test_dup_trust_guards_hot_rows():
    """fixed partitioner + a pathologically hot user/item: dup_trust
    keeps the trajectory finite (same guard class as SGDConfig)."""
    n = 2000
    rng = np.random.default_rng(0)
    users = np.where(rng.random(n) < 0.5, 0, rng.integers(0, 40, n)).astype(np.int32)
    items = np.where(rng.random(n) < 0.5, 0, rng.integers(0, 30, n)).astype(np.int32)
    coo = _coo(users, items, rng.uniform(1, 5, n).astype(np.float32),
               rng.integers(0, 1000, n), num_users=40, num_items=30)
    base = init_model(0, 40, 30, 4, global_mean=coo.global_mean)
    tcfg = TimeSVDConfig(lr=0.08, reg=0.02, epochs=3, batch_size=1024,
                         partitioner="fixed", dup_trust=8.0, n_bins=4)
    final = None
    for _, m, tr in train_epochs_timesvd(base, coo, tcfg, use_bias=True, seed=0):
        final = m
        assert np.isfinite(tr)
    assert np.isfinite(float(jnp.sum(final.P)))


def test_requires_bias_and_fresh_start():
    coo = _synth(n=500, nu=10, ni=8)
    base = init_model(0, 10, 8, 2, global_mean=3.0)
    with pytest.raises(ValueError, match="use_bias"):
        next(iter(train_epochs_timesvd(base, coo, TimeSVDConfig(), False)))
    with pytest.raises(ValueError, match="resume"):
        next(iter(train_epochs_timesvd(
            base, coo, TimeSVDConfig(), True, start_epoch=2
        )))


# ---- driver + config --------------------------------------------------------


def _save_dataset(tmp_path, coo):
    from mfx.data import loaders

    root = tmp_path / "data"
    root.mkdir(exist_ok=True)
    coo.save_npz(root / f"synthetic-small.v{loaders.GENERATOR_VERSION}.npz")
    return root


def test_driver_timesvd_end_to_end(tmp_path):
    from mfx.train.driver import train

    coo = _synth(n=4000, nu=64, ni=32, seed=9)
    root = _save_dataset(tmp_path, coo)
    cfg = TrainConfig(
        solver="timesvd",
        data=DataConfig(dataset="synthetic-small", root=str(root),
                        test_frac=0.2, split="time"),
        model=ModelConfig(rank=4, use_bias=True),
        timesvd=TimeSVDConfig(lr=0.05, reg=0.02, epochs=2, batch_size=512,
                              n_bins=6),
        checkpoint_dir=str(tmp_path / "ckpt"),
        checkpoint_every=1,
        ranking_k=5,
    )
    res = train(cfg, resume=False)
    assert res.epochs_run == 2
    assert np.isfinite(res.test_rmse)
    assert res.test_ranking is not None
    # the result model is the MF view (serving-ready)
    from mfx.models.mf import MFModel

    assert isinstance(res.model, MFModel)
    # checkpoint holds the MF view and reloads
    from mfx.train.checkpoint import load_checkpoint

    m, epoch, _ = load_checkpoint(str(tmp_path / "ckpt"))
    assert epoch == 1 and m.P.shape == (64, 4)


def test_driver_timesvd_validation(tmp_path):
    from mfx.train.driver import train
    from mfx.config import ParallelConfig

    coo = _synth(n=500, nu=16, ni=8)
    root = _save_dataset(tmp_path, coo)
    base = dict(
        solver="timesvd",
        data=DataConfig(dataset="synthetic-small", root=str(root)),
        model=ModelConfig(rank=2, use_bias=True),
        timesvd=TimeSVDConfig(epochs=1, batch_size=256),
    )
    with pytest.raises(ValueError, match="single-device"):
        train(TrainConfig(**{**base, "parallel": ParallelConfig(
            mode="dp", data_axis=2)}), resume=False)
    with pytest.raises(ValueError, match="use_bias"):
        train(TrainConfig(**{**base, "model": ModelConfig(
            rank=2, use_bias=False)}), resume=False)


def test_timesvd_config_validation():
    with pytest.raises(ValueError, match="partitioner"):
        TimeSVDConfig(partitioner="blocked")
    with pytest.raises(ValueError, match="n_bins"):
        TimeSVDConfig(n_bins=0)
