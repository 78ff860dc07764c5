"""iALS (implicit weighted ALS) vs a NumPy normal-equation oracle, plus a
ranking-quality smoke and the driver path (SURVEY.md K3 extension —
mfx/solvers/ials.py)."""

import numpy as np
import pytest

from mfx.config import IALSConfig, TrainConfig, ModelConfig, DataConfig
from mfx.data.coo import RatingsCOO
from mfx.data.synthetic import make_implicit_synthetic
from mfx.eval.metrics import sampled_auc
from mfx.models.mf import init_model
from mfx.solvers.ials import ials_half_sweep, train_sweeps_ials


def _implicit_coo(U=48, I=36, n=400, seed=3, hot_user=None):
    rng = np.random.default_rng(seed)
    u = rng.integers(0, U, size=n).astype(np.int32)
    i = rng.integers(0, I, size=n).astype(np.int32)
    if hot_user is not None:
        # one user observes (almost) the whole catalog: exercises the
        # hot-row piece splitting of the bucket plan
        uu, ii = hot_user
        u = np.concatenate([u, np.full(ii, uu, np.int32)])
        i = np.concatenate([i, np.arange(ii, dtype=np.int32)])
    # de-dup (u, i); strengths = small positive counts
    key = u.astype(np.int64) * I + i
    _, first = np.unique(key, return_index=True)
    u, i = u[first], i[first]
    r = rng.integers(1, 6, size=u.shape[0]).astype(np.float32)
    return RatingsCOO(u, i, r, U, I, synthetic=True)


def _oracle_user_solve(P, Q, coo, alpha, reg):
    """Direct per-user normal equations: x_u = (QᵀQ + Σ αr y yᵀ + λI)⁻¹
    Σ (1+αr) y. Users with no observations keep their factors."""
    U, k = P.shape
    G = Q.T @ Q
    out = P.copy()
    for u in range(U):
        m = coo.user == u
        if not m.any():
            continue
        Y = Q[coo.item[m]]
        w = alpha * coo.rating[m]
        A = G + (Y * w[:, None]).T @ Y + reg * np.eye(k, dtype=P.dtype)
        b = ((1.0 + w)[:, None] * Y).sum(axis=0)
        out[u] = np.linalg.solve(A, b)
    return out


@pytest.mark.parametrize("hot", [None, "hot"])
def test_half_sweep_matches_oracle(hot):
    if hot:
        # degree 2200 > BUCKET_CAPS[-1] = 2048: the hot row splits into
        # multiple pieces whose partial weighted Grams must add exactly
        coo = _implicit_coo(U=24, I=2200, n=300, hot_user=(0, 2200))
    else:
        coo = _implicit_coo()
    model = init_model(0, coo.num_users, coo.num_items, rank=6)
    P0 = np.asarray(model.P)
    Q0 = np.asarray(model.Q)
    alpha, reg = 12.0, 0.3

    by_u = np.argsort(coo.user, kind="stable")
    got = np.asarray(
        ials_half_sweep(
            model.P, model.Q, coo.user[by_u], coo.item[by_u],
            coo.rating[by_u], alpha, reg,
        )
    )
    want = _oracle_user_solve(P0, Q0, coo, alpha, reg)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_row_chunking_is_invariant():
    coo = _implicit_coo()
    model = init_model(1, coo.num_users, coo.num_items, rank=4)
    by_u = np.argsort(coo.user, kind="stable")
    args = (model.P, model.Q, coo.user[by_u], coo.item[by_u],
            coo.rating[by_u], 8.0, 0.2)
    a = np.asarray(ials_half_sweep(*args, row_chunk=8192))
    b = np.asarray(ials_half_sweep(*args, row_chunk=16))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_sweeps_improve_ranking():
    coo = make_implicit_synthetic(300, 120, 6000, rank=8, seed=5)
    model = init_model(2, coo.num_users, coo.num_items, rank=16)
    auc0 = sampled_auc(model, coo, seed=0)
    cfg = IALSConfig(alpha=30.0, reg=0.5, sweeps=4)
    for _, model in train_sweeps_ials(model, coo, cfg):
        pass
    auc1 = sampled_auc(model, coo, seed=0)
    assert auc1 > max(0.70, auc0 + 0.1), (auc0, auc1)


def test_bias_rejected():
    coo = _implicit_coo()
    model = init_model(0, coo.num_users, coo.num_items, rank=4)
    with pytest.raises(ValueError, match="bias-free"):
        next(iter(train_sweeps_ials(model, coo, IALSConfig(), use_bias=True)))


def test_driver_ials_path(tmp_path):
    from mfx.train.driver import train

    cfg = TrainConfig(
        name="ials_smoke",
        solver="ials",
        data=DataConfig(dataset="synthetic-small-implicit", test_frac=0.1),
        model=ModelConfig(rank=8, use_bias=False),
        ials=IALSConfig(alpha=20.0, reg=0.5, sweeps=2),
        log_path=str(tmp_path / "log.jsonl"),
    )
    res = train(cfg)
    assert res.epochs_run == 2
    assert res.test_auc is not None and 0.0 <= res.test_auc <= 1.0


def test_ials_rejects_negative_feedback():
    import pytest

    from mfx.data.coo import RatingsCOO
    from mfx.solvers.ials import train_sweeps_ials

    coo = RatingsCOO(
        user=np.array([0, 1, 2], np.int32),
        item=np.array([0, 1, 0], np.int32),
        rating=np.array([1.0, -1.0, 2.0], np.float32),  # thumbs-down
        num_users=3, num_items=2,
    )
    model = init_model(0, 3, 2, 4)
    cfg = IALSConfig(alpha=10.0, reg=0.1, sweeps=1)
    with pytest.raises(ValueError, match="non-negative feedback"):
        list(train_sweeps_ials(model, coo, cfg))
