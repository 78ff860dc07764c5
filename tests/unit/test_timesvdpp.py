"""timeSVD++ (solver='timesvdpp') — mfx/solvers/timesvdpp.py.

Oracle strategy: the family strictly contains BOTH parents — bitwise
collapse onto timesvd (lr_y=0) and onto svdpp (lr_t=lr_alpha=0, constant
timestamps make the temporal features inert) — plus jax.grad exactness
of the time-aware Y step, a quality run, full-state npz, and the driver
path.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mfx.config import (
    DataConfig, ModelConfig, SVDPPConfig, TimeSVDConfig, TimeSVDPPConfig,
    TrainConfig,
)
from mfx.data.coo import RatingsCOO
from mfx.models.mf import init_model
from mfx.models.timesvd import fit_time_features
from mfx.solvers.timesvdpp import (
    TimeSVDppState, train_epochs_timesvdpp, y_gradient_step_t,
)


def _coo(n=3000, nu=60, ni=30, seed=0, const_ts=False):
    rng = np.random.default_rng(seed)
    users = rng.integers(0, nu, n).astype(np.int32)
    items = rng.integers(0, ni, n).astype(np.int32)
    ratings = rng.uniform(1, 5, n).astype(np.float32)
    ts = (np.full(n, 7, np.int64) if const_ts
          else rng.integers(0, 100000, n).astype(np.int64))
    return RatingsCOO(users, items, ratings, nu, ni, timestamp=ts)


def test_collapses_to_timesvd_when_lr_y_zero():
    from mfx.solvers.timesvd import train_epochs_timesvd

    coo = _coo(seed=1)
    base = init_model(0, coo.num_users, coo.num_items, rank=4,
                      global_mean=coo.global_mean)
    kw = dict(lr=0.05, reg=0.02, lr_decay=0.9, epochs=3, batch_size=512,
              n_bins=6, partitioner="conflict_free")
    a = b = None
    for _, m, _ in train_epochs_timesvdpp(
        base, coo, TimeSVDPPConfig(lr_y=0.0, **kw), use_bias=True, seed=5
    ):
        a = m
    for _, m, _ in train_epochs_timesvd(
        base, coo, TimeSVDConfig(**kw), use_bias=True, seed=5
    ):
        b = m
    # with Y frozen at 0, S == 0 and X == P: identical trajectories
    for f in ("P", "Q", "bu", "bi", "bt", "alpha"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, f)), np.asarray(getattr(b, f))
        )


def test_collapses_to_svdpp_when_temporal_rates_zero():
    """With lr_t = lr_alpha = 0 the temporal tables stay zero and every
    prediction adds exact zeros — the trajectory must equal svdpp's
    (same seed/partitioner => identical batches and Y steps)."""
    from mfx.solvers.svdpp import train_epochs_svdpp

    coo = _coo(seed=2)
    base = init_model(0, coo.num_users, coo.num_items, rank=4,
                      global_mean=coo.global_mean)
    common = dict(lr=0.05, reg=0.02, lr_decay=0.9, epochs=3,
                  batch_size=512, partitioner="conflict_free",
                  lr_y=0.01, reg_y=0.02, y_trust=16.0)
    a = b = None
    for _, m, _ in train_epochs_timesvdpp(
        base, coo,
        TimeSVDPPConfig(lr_t=0.0, lr_alpha=0.0, n_bins=4, **common),
        use_bias=True, seed=9,
    ):
        a = m
    for _, m, _ in train_epochs_svdpp(
        base, coo, SVDPPConfig(**common), use_bias=True, seed=9
    ):
        b = m
    assert float(jnp.max(jnp.abs(a.bt))) == 0.0
    assert float(jnp.max(jnp.abs(a.alpha))) == 0.0
    for f in ("P", "Q", "bu", "bi"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, f)), np.asarray(getattr(b, f))
        )


def test_y_step_matches_jax_grad():
    """y_gradient_step_t with all-ones y_scale is the exact gradient of
    the time-aware SVD++ objective in Y at frozen everything-else."""
    rng = np.random.default_rng(3)
    nu_, ni, k, nb = 6, 8, 3, 4
    coo = _coo(n=60, nu=nu_, ni=ni, seed=3)
    from mfx.models.svdpp import implicit_scale
    from mfx.solvers.timesvdpp import _coo_chunks_t

    feats = fit_time_features(coo, n_bins=nb)
    tbins, devs = feats.features(coo.user, coo.timestamp)
    chunks = _coo_chunks_t(coo, 32, tbins, devs)
    nu_u = implicit_scale(jnp.asarray(coo.user), nu_)
    X = jnp.asarray(rng.normal(0, 0.4, (nu_, k)), jnp.float32)
    Q = jnp.asarray(rng.normal(0, 0.4, (ni, k)), jnp.float32)
    Y = jnp.asarray(rng.normal(0, 0.2, (ni, k)), jnp.float32)
    bu = jnp.asarray(rng.normal(0, 0.1, nu_), jnp.float32)
    bi = jnp.asarray(rng.normal(0, 0.1, ni), jnp.float32)
    bt = jnp.asarray(rng.normal(0, 0.1, (ni, nb)), jnp.float32)
    al = jnp.asarray(rng.normal(0, 0.1, nu_), jnp.float32)
    mu = jnp.asarray(3.3, jnp.float32)
    deg_i = jax.ops.segment_sum(
        jnp.ones(coo.n_ratings), jnp.asarray(coo.item), num_segments=ni
    )
    lr_y, reg_y = 0.01, 0.05
    ones = jnp.ones((ni,), jnp.float32)

    Ynew, _ = y_gradient_step_t(
        Y, X + nu_u[:, None] * jax.ops.segment_sum(
            jnp.take(Y, jnp.asarray(coo.item), axis=0),
            jnp.asarray(coo.user), num_segments=nu_,
        ), Q, bu, bi, mu, bt, al, nu_u, deg_i, ones, chunks,
        jnp.asarray(lr_y), jnp.asarray(reg_y), tr_eta=0.0,
    )

    u_d, i_d = jnp.asarray(coo.user), jnp.asarray(coo.item)
    tb_d, dv_d = jnp.asarray(tbins), jnp.asarray(devs)
    r_d = jnp.asarray(coo.rating)

    def loss(Yp):
        S = nu_u[:, None] * jax.ops.segment_sum(
            jnp.take(Yp, i_d, axis=0), u_d, num_segments=nu_
        )
        x = jnp.take(X + S, u_d, axis=0)
        q = jnp.take(Q, i_d, axis=0)
        pred = (jnp.sum(x * q, axis=-1) + mu + jnp.take(bu, u_d)
                + jnp.take(bi, i_d)
                + jnp.take(bt.reshape(-1), i_d * nb + tb_d)
                + jnp.take(al, u_d) * dv_d)
        e = r_d - pred
        # deg-scaled per-occurrence L2, matching the -reg*deg_j*y term
        return 0.5 * jnp.sum(e * e) + 0.5 * reg_y * jnp.sum(
            deg_i[:, None] * Yp * Yp
        )

    g = jax.grad(loss)(Y)
    np.testing.assert_allclose(
        np.asarray(Ynew), np.asarray(Y - lr_y * g), rtol=3e-4, atol=3e-5
    )


def _structured(n=8000, nu=100, ni=50, seed=4):
    """Rank-2 synthetic with temporal era/drift structure (learnable)."""
    rng = np.random.default_rng(seed)
    P = rng.normal(0, 0.4, (nu, 2))
    Q = rng.normal(0, 0.4, (ni, 2))
    users = rng.integers(0, nu, n).astype(np.int32)
    items = rng.integers(0, ni, n).astype(np.int32)
    ts = rng.integers(0, 3_000_000, n).astype(np.int64)
    era = (ts * 3 // 3_000_000).astype(np.int64)
    bi_era = rng.normal(0, 0.35, (ni, 3))
    alpha = rng.normal(0, 0.5, nu)
    r = (3.5 + np.sum(P[users] * Q[items], axis=1) + bi_era[items, era]
         + alpha[users] * (ts / 3_000_000.0 - 0.5)
         + rng.normal(0, 0.1, n))
    return RatingsCOO(users, items,
                      np.clip(r, 0.5, 5.0).astype(np.float32),
                      nu, ni, timestamp=ts)


def test_quality_improves_and_view_consistent():
    from mfx.solvers.timesvd import rmse_mae_time
    from mfx.data.split import chronological_split

    coo = _structured()
    train, test = chronological_split(coo, test_frac=0.15)
    base = init_model(0, coo.num_users, coo.num_items, rank=4,
                      global_mean=train.global_mean)
    feats = fit_time_features(train, n_bins=6)
    cfg = TimeSVDPPConfig(lr=0.05, reg=0.02, epochs=8, batch_size=1024,
                          n_bins=6, partitioner="conflict_free")
    rmses = []
    final = None
    for _, m, tr in train_epochs_timesvdpp(
        base, train, cfg, use_bias=True, seed=2, feats=feats
    ):
        final = m
        rmses.append(rmse_mae_time(m, feats, test)[0])
        assert np.isfinite(tr)
    assert rmses[-1] < rmses[0]
    # the as_mf serving view agrees with predict_t at the fold time
    view = final.as_mf(feats)
    u = np.arange(20, dtype=np.int32)
    i = np.arange(20, dtype=np.int32) % 50
    tb, dv = feats.features(u, np.full(20, feats.t1, np.int64))
    np.testing.assert_allclose(
        np.asarray(view.predict(u, i)),
        np.asarray(final.predict_t(u, i, jnp.asarray(tb), jnp.asarray(dv))),
        rtol=1e-5, atol=1e-5,
    )


def test_capture_and_warm_start_continue_exact_trajectory(tmp_path):
    """capture -> save_npz -> load_npz -> init_state resumes the EXACT
    run: 2 epochs + 2 resumed epochs == 4 straight epochs, bitwise."""
    coo = _coo(n=2500, nu=50, ni=25, seed=6)
    base = init_model(0, coo.num_users, coo.num_items, rank=4,
                      global_mean=coo.global_mean)
    kw = dict(lr=0.05, reg=0.02, lr_decay=0.9, batch_size=512, n_bins=5,
              partitioner="conflict_free")
    # straight 4-epoch run
    ref = None
    for _, m, _ in train_epochs_timesvdpp(
        base, coo, TimeSVDPPConfig(epochs=4, **kw), use_bias=True, seed=3
    ):
        ref = m
    # 2 epochs with capture, persist, resume for 2 more
    cap: dict = {}
    for _, m, _ in train_epochs_timesvdpp(
        base, coo, TimeSVDPPConfig(epochs=2, **kw), use_bias=True, seed=3,
        capture=cap,
    ):
        pass
    cap["state"].save_npz(tmp_path / "st.npz")
    st = TimeSVDppState.load_npz(tmp_path / "st.npz")
    got = None
    for _, m, _ in train_epochs_timesvdpp(
        base, coo, TimeSVDPPConfig(epochs=4, **kw), use_bias=True, seed=3,
        start_epoch=2, init_state=st,
    ):
        got = m
    for f in ("P", "Q", "bu", "bi", "bt", "alpha"):
        np.testing.assert_array_equal(
            np.asarray(getattr(got, f)), np.asarray(getattr(ref, f))
        )
    # bin-count mismatch is rejected
    with pytest.raises(ValueError, match="bins"):
        next(iter(train_epochs_timesvdpp(
            base, coo, TimeSVDPPConfig(epochs=4, n_bins=7, **{
                k: v for k, v in kw.items() if k != "n_bins"}),
            use_bias=True, seed=3, start_epoch=2, init_state=st,
        )))


def test_state_npz_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    fields = dict(
        P=rng.normal(0, 1, (5, 3)), Q=rng.normal(0, 1, (4, 3)),
        Y=rng.normal(0, 1, (4, 3)), bu=rng.normal(0, 1, 5),
        bi=rng.normal(0, 1, 4), mu=np.float32(3.2),
        bt=rng.normal(0, 1, (4, 2)), alpha=rng.normal(0, 1, 5),
        nu=rng.normal(0, 1, 5),
    )
    st = TimeSVDppState(**{k: np.asarray(v, np.float32)
                           for k, v in fields.items()})
    st.save_npz(tmp_path / "s.npz")
    back = TimeSVDppState.load_npz(tmp_path / "s.npz")
    for k in fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(st, k)), np.asarray(getattr(back, k))
        )


def test_driver_timesvdpp_end_to_end(tmp_path):
    from mfx.data import loaders
    from mfx.train.driver import train as drv_train

    coo = _coo(n=4000, nu=64, ni=32, seed=7)
    root = tmp_path / "data"
    root.mkdir()
    coo.save_npz(root / f"synthetic-small.v{loaders.GENERATOR_VERSION}.npz")
    cfg = TrainConfig(
        solver="timesvdpp",
        data=DataConfig(dataset="synthetic-small", root=str(root),
                        test_frac=0.2, split="time"),
        model=ModelConfig(rank=4, use_bias=True),
        timesvdpp=TimeSVDPPConfig(lr=0.05, reg=0.02, epochs=2,
                                  batch_size=512, n_bins=5),
    )
    res = drv_train(cfg, resume=False)
    assert res.epochs_run == 2 and np.isfinite(res.test_rmse)
    from mfx.models.mf import MFModel

    assert isinstance(res.model, MFModel)  # serving-ready view

    with pytest.raises(ValueError, match="single-device"):
        from mfx.config import ParallelConfig

        drv_train(dataclasses.replace(
            cfg, parallel=ParallelConfig(mode="dp", data_axis=2)
        ), resume=False)


def test_timesvdpp_validation():
    coo = _coo(n=200, nu=10, ni=8)
    base = init_model(0, 10, 8, 2, global_mean=3.0)
    with pytest.raises(ValueError, match="use_bias"):
        next(iter(train_epochs_timesvdpp(
            base, coo, TimeSVDPPConfig(), False
        )))
    with pytest.raises(ValueError, match="epoch 0"):
        next(iter(train_epochs_timesvdpp(
            base, coo, TimeSVDPPConfig(), True, start_epoch=1
        )))
    with pytest.raises(ValueError, match="partitioner"):
        TimeSVDPPConfig(partitioner="blocked")


def test_y_gradient_step_tiles_matches_chunked_form():
    """The tile-plan one-hot Y step must equal the chunked streaming
    form up to f32 summation order — same residuals, same per-item
    pulls, same trust-capped application (both production eta and the
    exact-gradient tr_eta=0 contract)."""
    import jax.numpy as jnp

    from mfx.solvers.timesvd_blocked import plan_temporal_epoch
    from mfx.solvers.timesvdpp import (
        _coo_chunks_t, y_gradient_step_t, y_gradient_step_tiles,
    )

    coo = _coo(n=6000, nu=300, ni=200, seed=2)
    feats = fit_time_features(coo, n_bins=8)
    tbins, devs = feats.features(coo.user, coo.timestamp)
    rng = np.random.default_rng(0)
    U_, I_, K_ = coo.num_users, coo.num_items, 16
    X = jnp.asarray(rng.standard_normal((U_, K_)).astype(np.float32) * 0.3)
    Q = jnp.asarray(rng.standard_normal((I_, K_)).astype(np.float32) * 0.3)
    Y = jnp.asarray(rng.standard_normal((I_, K_)).astype(np.float32) * 0.05)
    bu = jnp.asarray(rng.standard_normal(U_).astype(np.float32) * 0.1)
    bi = jnp.asarray(rng.standard_normal(I_).astype(np.float32) * 0.1)
    bt = jnp.asarray(rng.standard_normal((I_, 8)).astype(np.float32) * 0.05)
    alpha = jnp.asarray(rng.standard_normal(U_).astype(np.float32) * 0.02)
    nu = jnp.asarray(rng.uniform(0.1, 1.0, U_).astype(np.float32))
    deg_i = jnp.asarray(
        np.bincount(coo.item, minlength=I_).astype(np.float32)
    )
    y_scale = jnp.asarray(rng.uniform(0.3, 1.0, I_).astype(np.float32))
    mu = jnp.asarray(3.5, jnp.float32)

    su = si = 128
    sweep_args, sweep_meta = plan_temporal_epoch(
        coo, tbins, devs, su=su, si=si, tile=64, tpg=4, nwin=2,
        seed=0, epoch=0, device=False,
    )
    chunks = _coo_chunks_t(coo, 64, tbins, devs)
    for eta in (None, 0):
        want, sse_w = y_gradient_step_t(
            Y, X, Q, bu, bi, mu, bt, alpha, nu, deg_i, y_scale, chunks,
            0.01, 0.02, tr_eta=eta,
        )
        got, sse_g = y_gradient_step_tiles(
            Y, X, Q, bu, bi, mu, bt, alpha, nu, deg_i, y_scale,
            tuple(sweep_args), 0.01, 0.02,
            su=su, si=si, tpg=4, n_bins=8, sweep_meta=tuple(sweep_meta),
            tr_eta=eta,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
        )
        np.testing.assert_allclose(
            float(sse_g), float(sse_w), rtol=1e-4
        )
