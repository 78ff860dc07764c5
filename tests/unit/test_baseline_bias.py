"""Baseline-predictor bias init (Koren damped means) vs NumPy oracle +
its quality effect through the driver."""

import numpy as np
import pytest

from mfx.config import ModelConfig, apply_overrides, preset
from mfx.data import synthetic
from mfx.models.mf import baseline_biases


def test_baseline_biases_match_numpy_oracle():
    coo = synthetic.make_synthetic(50, 40, 600, seed=4)
    lam = 7.5
    bu, bi = baseline_biases(coo, damping=lam)
    mu = coo.global_mean
    bi_ref = np.zeros(40)
    for it in range(40):
        m = coo.item == it
        bi_ref[it] = (coo.rating[m] - mu).sum() / (lam + m.sum())
    bu_ref = np.zeros(50)
    for u in range(50):
        m = coo.user == u
        bu_ref[u] = (coo.rating[m] - mu - bi_ref[coo.item[m]]).sum() / (
            lam + m.sum()
        )
    np.testing.assert_allclose(np.asarray(bi), bi_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(bu), bu_ref, rtol=1e-5, atol=1e-6)
    # unrated rows stay exactly 0 (damping shrinks absent evidence)
    unrated = ~np.isin(np.arange(50), coo.user)
    assert (np.asarray(bu)[unrated] == 0.0).all()


def _biased_synthetic(U=400, I=300, n=20_000, seed=9):
    """Synthetic data WITH real bias structure (the default generator is
    pure low-rank — real MovieLens/Netflix data has strong per-user/item
    offsets, which is what baseline init exploits)."""
    from mfx.data.coo import RatingsCOO

    coo = synthetic.make_synthetic(U, I, n, rank=4, noise=0.3, seed=seed)
    rng = np.random.default_rng(seed + 1)
    bu = rng.normal(0.0, 0.5, U).astype(np.float32)
    bi = rng.normal(0.0, 0.5, I).astype(np.float32)
    r = np.clip(coo.rating + bu[coo.user] + bi[coo.item], 0.5, 5.0)
    return RatingsCOO(coo.user, coo.item, r, U, I, synthetic=True)


def test_baseline_init_improves_early_rmse():
    """On bias-structured data, starting from the damped-mean baseline
    beats zero-initialized biases after the first epoch."""
    from mfx.config import SGDConfig
    from mfx.data.split import train_test_split
    from mfx.eval.metrics import rmse_mae
    from mfx.models.mf import init_model
    from mfx.solvers.sgd import train_epochs

    import dataclasses

    coo = _biased_synthetic()
    train, test = train_test_split(coo, 0.2, seed=0)
    cfg = SGDConfig(lr=0.02, reg=0.05, epochs=1, batch_size=4096,
                    partitioner="fixed", dup_trust=16.0)

    def run(baseline: bool) -> float:
        m = init_model(0, coo.num_users, coo.num_items, 8,
                       global_mean=train.global_mean)
        if baseline:
            bu0, bi0 = baseline_biases(train)
            m = dataclasses.replace(m, bu=bu0, bi=bi0)
        for _, m, _ in train_epochs(m, train, cfg, use_bias=True, seed=0):
            pass
        return rmse_mae(m, test, clip=(0.5, 5.0))[0]

    assert run(True) < run(False) - 0.01


def test_driver_baseline_bias_init_path(tmp_path):
    """The driver wires model.bias_init='baseline' (fresh runs only):
    the trained model must start from nonzero biases and finish fine."""
    from mfx.train.driver import train

    cfg = apply_overrides(preset("ml1m_rank32_biased"), [
        "sgd.epochs=1", "data.dataset=synthetic-small",
        f"data.root={tmp_path}", "sgd.partitioner=fixed",
        "sgd.kernel=jnp", "sgd.batch_size=4096", "sgd.dup_trust=16",
        "model.bias_init=baseline",
    ])
    res = train(cfg)
    assert res.test_rmse is not None and res.test_rmse < 1.0
    assert np.abs(np.asarray(res.model.bi)).max() > 0.0


def test_bias_init_validation():
    with pytest.raises(ValueError, match="bias_init"):
        ModelConfig(bias_init="warm")
