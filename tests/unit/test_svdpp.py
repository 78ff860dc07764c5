"""SVD++ (mfx/models/svdpp.py, mfx/solvers/svdpp.py).

- the Y step is the exact full-batch gradient of the SVD++ objective in Y
  at the frozen epoch-end snapshot (checked against jax.grad);
- with lr_y = 0 (Y pinned at its zero init) the trainer is bitwise the
  plain biased-MF minibatch trainer — the family strictly contains MF;
- end-to-end convergence on synthetic data, at or above MF quality;
- full-state npz round-trip and the MF-view prediction identity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfx.config import SGDConfig, SVDPPConfig, TrainConfig, DataConfig, ModelConfig
from mfx.data.coo import RatingsCOO
from mfx.models.mf import init_model
from mfx.models.svdpp import (
    SVDppModel,
    implicit_scale,
    implicit_sums,
    init_svdpp,
)
from mfx.solvers.svdpp import _coo_chunks, train_epochs_svdpp, y_gradient_step


def _toy_coo(U=20, I=15, n=120, seed=0):
    rng = np.random.default_rng(seed)
    return RatingsCOO(
        user=rng.integers(0, U, n).astype(np.int32),
        item=rng.integers(0, I, n).astype(np.int32),
        rating=rng.uniform(1, 5, n).astype(np.float32),
        num_users=U,
        num_items=I,
    )


def test_y_step_matches_autodiff():
    coo = _toy_coo()
    rng = np.random.default_rng(1)
    k = 6
    P = jnp.asarray(rng.normal(0, 0.3, (coo.num_users, k)), jnp.float32)
    Q = jnp.asarray(rng.normal(0, 0.3, (coo.num_items, k)), jnp.float32)
    Y0 = jnp.asarray(rng.normal(0, 0.2, (coo.num_items, k)), jnp.float32)
    bu = jnp.asarray(rng.normal(0, 0.1, coo.num_users), jnp.float32)
    bi = jnp.asarray(rng.normal(0, 0.1, coo.num_items), jnp.float32)
    mu = jnp.asarray(3.4, jnp.float32)
    u = jnp.asarray(coo.user)
    i = jnp.asarray(coo.item)
    r = jnp.asarray(coo.rating)
    nu = implicit_scale(u, coo.num_users)
    deg_i = jax.ops.segment_sum(
        jnp.ones_like(i, jnp.float32), i, num_segments=coo.num_items
    )
    lr, reg = 0.05, 0.3

    # chunked into several padded chunks: exercises the scan + pad masking
    chunks = _coo_chunks(coo, 32)
    S0 = implicit_sums(Y0, u, i, nu)
    X = P + S0  # the frozen epoch-end snapshot
    ones = jnp.ones((coo.num_items,), jnp.float32)
    Ynew, _ = y_gradient_step(
        Y0, X, Q, bu, bi, mu, nu, deg_i, ones, chunks,
        jnp.float32(lr), jnp.float32(reg), tr_eta=0.0, use_bias=True,
    )

    def loss(Y):
        # prediction with S recomputed FROM Y (P explicit, not X):
        # at Y = Y0 the residuals equal the frozen-X residuals, so the
        # analytic step must equal -lr/2 times this gradient there
        S = implicit_sums(Y, u, i, nu)
        xg = jnp.take(P + S, u, axis=0)
        qg = jnp.take(Q, i, axis=0)
        pred = jnp.sum(xg * qg, axis=-1) + mu + jnp.take(bu, u) + jnp.take(bi, i)
        e = r - pred
        return jnp.sum(e * e) + reg * jnp.sum(deg_i[:, None] * Y * Y)

    g = jax.grad(loss)(Y0)
    expect = Y0 - (lr / 2.0) * g
    np.testing.assert_allclose(
        np.asarray(Ynew), np.asarray(expect), rtol=2e-4, atol=2e-5
    )


def test_lr_y_zero_is_plain_biased_mf():
    """With the Y step disabled, every epoch is bitwise the plain MF epoch."""
    from mfx.solvers.sgd import train_epochs

    coo = _toy_coo(U=40, I=30, n=400, seed=3)
    cfg_mf = SGDConfig(lr=0.02, reg=0.05, lr_decay=0.9, epochs=3,
                       batch_size=64, partitioner="fixed")
    cfg_pp = SVDPPConfig(lr=0.02, reg=0.05, lr_decay=0.9, epochs=3,
                         batch_size=64, lr_y=0.0, partitioner="fixed")
    m0 = init_model(7, coo.num_users, coo.num_items, rank=8, global_mean=3.5)

    mf_final = None
    for _, mf_final, _ in train_epochs(m0, coo, cfg_mf, True, seed=5):
        pass
    pp_final = None
    for _, pp_final, _ in train_epochs_svdpp(m0, coo, cfg_pp, True, seed=5):
        pass
    for f in ("P", "Q", "bu", "bi"):
        np.testing.assert_array_equal(
            np.asarray(getattr(mf_final, f)), np.asarray(getattr(pp_final, f))
        )


def test_svdpp_converges_and_matches_mf_quality():
    from mfx.data.split import train_test_split
    from mfx.data.synthetic import make_synthetic
    from mfx.eval.metrics import rmse_mae
    from mfx.solvers.sgd import train_epochs

    coo = make_synthetic(300, 200, 8000, rank=6, noise=0.3, seed=11)
    tr, te = train_test_split(coo, 0.1, seed=1)
    m0 = init_model(2, coo.num_users, coo.num_items, rank=8,
                    global_mean=tr.global_mean)

    cfg_pp = SVDPPConfig(lr=0.02, reg=0.04, lr_decay=0.95, epochs=8,
                         batch_size=512)
    rmses = []
    model_pp = None
    for _, model_pp, train_rmse in train_epochs_svdpp(m0, tr, cfg_pp, True, seed=2):
        rmses.append(train_rmse)
    assert rmses[-1] < rmses[0]  # train error decreases
    pp_rmse, _ = rmse_mae(model_pp, te, clip=(0.5, 5.0))

    cfg_mf = SGDConfig(lr=0.02, reg=0.04, lr_decay=0.95, epochs=8,
                       batch_size=512, partitioner="fixed")
    model_mf = None
    for _, model_mf, _ in train_epochs(m0, tr, cfg_mf, True, seed=2):
        pass
    mf_rmse, _ = rmse_mae(model_mf, te, clip=(0.5, 5.0))
    # the implicit term must never hurt materially, and usually helps
    assert pp_rmse <= mf_rmse + 0.01, (pp_rmse, mf_rmse)
    assert np.isfinite(pp_rmse)


def test_as_mf_prediction_identity():
    coo = _toy_coo(seed=9)
    state = init_svdpp(
        4, coo.num_users, coo.num_items, 5,
        train_user=coo.user, train_item=coo.item, global_mean=3.1,
    )
    rng = np.random.default_rng(5)
    state = SVDppModel(
        P=state.P, Q=state.Q,
        Y=jnp.asarray(rng.normal(0, 0.2, state.Y.shape), jnp.float32),
        bu=state.bu, bi=state.bi, mu=state.mu, nu=state.nu,
    )
    u = jnp.asarray(coo.user[:7])
    i = jnp.asarray(coo.item[:7])
    view = state.as_mf(user=jnp.asarray(coo.user), item=jnp.asarray(coo.item))
    got = view.predict(u, i)
    S = implicit_sums(state.Y, jnp.asarray(coo.user), jnp.asarray(coo.item),
                      state.nu)
    x = jnp.take(state.P + S, u, axis=0)
    q = jnp.take(state.Q, i, axis=0)
    want = (jnp.sum(x * q, -1) + state.mu + jnp.take(state.bu, u)
            + jnp.take(state.bi, i))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_svdpp_npz_roundtrip(tmp_path):
    coo = _toy_coo()
    state = init_svdpp(
        1, coo.num_users, coo.num_items, 4,
        train_user=coo.user, train_item=coo.item, global_mean=3.0,
    )
    p = tmp_path / "svdpp.npz"
    state.save_npz(p)
    back = SVDppModel.load_npz(p)
    for f in ("P", "Q", "Y", "bu", "bi", "mu", "nu"):
        np.testing.assert_array_equal(
            np.asarray(getattr(back, f)), np.asarray(getattr(state, f))
        )


def test_driver_svdpp_end_to_end(tmp_path):
    from mfx.train.driver import train

    cfg = TrainConfig(
        name="svdpp-smoke",
        solver="svdpp",
        data=DataConfig(dataset="synthetic-small", root=str(tmp_path)),
        model=ModelConfig(rank=8, use_bias=True),
        # dup_trust guards the Zipf hot rows at this batch size, exactly
        # as on the plain-MF path (same divergence without it)
        svdpp=SVDPPConfig(lr=0.02, reg=0.04, epochs=2, batch_size=2048,
                          dup_trust=8.0),
    )
    res = train(cfg)
    assert res.epochs_run == 2
    assert 0 < res.test_rmse < 1.5


def test_driver_svdpp_rejects_parallel_and_resume():
    from mfx.train.driver import _make_epoch_iter
    from mfx.config import ParallelConfig

    coo = _toy_coo()
    m0 = init_model(0, coo.num_users, coo.num_items, 4, global_mean=3.0)
    cfg = TrainConfig(solver="svdpp",
                      parallel=ParallelConfig(mode="sharded", model_axis=8))
    with pytest.raises(ValueError, match="single-device or data-parallel"):
        _make_epoch_iter(cfg, m0, coo, 0, 0, None)
    with pytest.raises(ValueError, match="resume"):
        list(train_epochs_svdpp(m0, coo, SVDPPConfig(epochs=1), True,
                                start_epoch=1))
