"""Rank compression (mfx/models/compress.py) vs the dense-SVD oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from mfx.models.compress import compress_model
from mfx.models.mf import MFModel


def _rand_model(seed, U, I, rank, mu=3.4):
    rng = np.random.default_rng(seed)
    # a decaying spectrum so truncation is meaningful
    scale = (0.9 ** np.arange(rank)).astype(np.float32)
    return MFModel(
        P=jnp.asarray(rng.normal(0, 0.4, (U, rank)).astype(np.float32)
                      * scale),
        Q=jnp.asarray(rng.normal(0, 0.4, (I, rank)).astype(np.float32)),
        bu=jnp.asarray(rng.normal(0, 0.1, U).astype(np.float32)),
        bi=jnp.asarray(rng.normal(0, 0.1, I).astype(np.float32)),
        mu=jnp.float32(mu),
    )


def test_compress_matches_dense_svd_oracle():
    U, I, r, k = 40, 60, 8, 3
    m = _rand_model(0, U, I, r)
    res = compress_model(m, k)
    assert res.model.rank == k
    M = np.asarray(m.P, np.float64) @ np.asarray(m.Q, np.float64).T
    Uo, So, Vto = np.linalg.svd(M, full_matrices=False)
    # spectrum matches the dense SVD of P·Qᵀ
    np.testing.assert_allclose(
        res.singular_values, So[:r], rtol=1e-4, atol=1e-5
    )
    # the truncated product IS the Eckart-Young optimum
    want = (Uo[:, :k] * So[:k]) @ Vto[:k]
    got = np.asarray(res.model.P, np.float64) @ np.asarray(
        res.model.Q, np.float64).T
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # energy bookkeeping
    np.testing.assert_allclose(
        res.energy, (So[:k] ** 2).sum() / (So**2).sum(), rtol=1e-5
    )
    # biases untouched
    np.testing.assert_array_equal(np.asarray(res.model.bu),
                                  np.asarray(m.bu))


def test_full_rank_compress_is_lossless():
    m = _rand_model(1, 25, 30, 6)
    res = compress_model(m, 6)
    rng = np.random.default_rng(2)
    u = rng.integers(0, 25, 300).astype(np.int32)
    i = rng.integers(0, 30, 300).astype(np.int32)
    np.testing.assert_allclose(
        np.asarray(res.model.predict(u, i)), np.asarray(m.predict(u, i)),
        rtol=2e-5, atol=2e-5,
    )
    assert res.energy == pytest.approx(1.0)


def test_compress_preserves_topk_at_modest_truncation():
    """A model with a decaying spectrum keeps most of its top-K lists
    at half rank — and the compressed model serves through the stock
    recommender."""
    from mfx.serve import TopKRecommender

    m = _rand_model(3, 50, 200, 16)
    res = compress_model(m, 8)
    assert res.energy > 0.8
    users = np.arange(50, dtype=np.int32)
    full_i, _ = TopKRecommender(m, batch=16).recommend(users, k=10)
    half_i, _ = TopKRecommender(res.model, batch=16).recommend(users, k=10)
    overlap = np.mean([
        len(set(a.tolist()) & set(b.tolist())) / 10
        for a, b in zip(full_i, half_i)
    ])
    assert overlap > 0.7


def test_compress_validation():
    m = _rand_model(4, 10, 10, 4)
    with pytest.raises(ValueError, match="rank must"):
        compress_model(m, 0)
    with pytest.raises(ValueError, match="rank must"):
        compress_model(m, 5)
