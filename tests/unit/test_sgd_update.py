import jax
import jax.numpy as jnp
import numpy as np

from mfx.kernels.jnp_ref import sgd_minibatch_update
from mfx.models import init_model


def _numpy_minibatch_ref(P, Q, bu, bi, mu, u, i, r, w, lr, reg, use_bias):
    """Independent NumPy oracle for the minibatch (snapshot) update."""
    P, Q, bu, bi = (np.array(x, np.float64) for x in (P, Q, bu, bi))
    pu, qi = P[u], Q[i]
    pred = (pu * qi).sum(-1) + mu
    if use_bias:
        pred = pred + bu[u] + bi[i]
    e = (r - pred) * w
    dP = lr * (e[:, None] * qi - reg * w[:, None] * pu)
    dQ = lr * (e[:, None] * pu - reg * w[:, None] * qi)
    np.add.at(P, u, dP)
    np.add.at(Q, i, dQ)
    if use_bias:
        np.add.at(bu, u, lr * (e - reg * w * bu[u]))
        np.add.at(bi, i, lr * (e - reg * w * bi[i]))
    return P, Q, bu, bi, float((e * e).sum())


def test_update_matches_numpy_with_duplicates_and_padding():
    rng = np.random.default_rng(0)
    model = init_model(0, 20, 30, 8, global_mean=3.5)
    B = 16
    u = rng.integers(0, 20, B).astype(np.int32)
    i = rng.integers(0, 30, B).astype(np.int32)
    u[3] = u[7]  # force duplicate user rows -> segment-sum path
    i[2] = i[9]
    r = rng.uniform(1, 5, B).astype(np.float32)
    w = np.ones(B, np.float32)
    w[-4:] = 0.0  # padding
    for use_bias in (True, False):
        new_model, sq = sgd_minibatch_update(
            model, u, i, r, w, 0.05, 0.02, use_bias=use_bias, unique_rows=False
        )
        P, Q, bu, bi, sq_ref = _numpy_minibatch_ref(
            model.P, model.Q, model.bu, model.bi, float(model.mu),
            u, i, r, w, 0.05, 0.02, use_bias,
        )
        np.testing.assert_allclose(new_model.P, P, rtol=2e-6, atol=2e-6)
        np.testing.assert_allclose(new_model.Q, Q, rtol=2e-6, atol=2e-6)
        np.testing.assert_allclose(new_model.bu, bu, rtol=2e-6, atol=2e-6)
        np.testing.assert_allclose(new_model.bi, bi, rtol=2e-6, atol=2e-6)
        np.testing.assert_allclose(float(sq), sq_ref, rtol=1e-5)


def test_padding_is_exact_noop():
    model = init_model(1, 10, 10, 4, global_mean=3.0)
    u = np.array([5, 2, 0, 0], np.int32)
    i = np.array([1, 3, 0, 0], np.int32)
    r = np.array([4.0, 2.0, 99.0, -5.0], np.float32)
    w = np.array([1.0, 1.0, 0.0, 0.0], np.float32)
    m_pad, _ = sgd_minibatch_update(model, u, i, r, w, 0.1, 0.01)
    m_ref, _ = sgd_minibatch_update(model, u[:2], i[:2], r[:2], w[:2], 0.1, 0.01)
    np.testing.assert_array_equal(np.asarray(m_pad.P), np.asarray(m_ref.P))
    np.testing.assert_array_equal(np.asarray(m_pad.Q), np.asarray(m_ref.Q))
    np.testing.assert_array_equal(np.asarray(m_pad.bu), np.asarray(m_ref.bu))


def test_predict_and_update_jit():
    model = init_model(2, 10, 12, 4, global_mean=3.0)
    u = jnp.array([1, 2], jnp.int32)
    i = jnp.array([3, 4], jnp.int32)
    pred = jax.jit(lambda m, u, i: m.predict(u, i))(model, u, i)
    assert pred.shape == (2,)
    fn = jax.jit(
        lambda m, u, i, r, w: sgd_minibatch_update(m, u, i, r, w, 0.1, 0.01)
    )
    m2, sq = fn(model, u, i, jnp.array([4.0, 3.0]), jnp.array([1.0, 1.0]))
    assert m2.P.shape == model.P.shape
    assert float(sq) > 0
