"""Sentinel padding: padded batch slots must never alias a real row id.

Regression tests for the unique_indices contract — id-0 padding plus a
real row 0 (or two pad slots) used to put duplicate indices in a scatter
that promised uniqueness, making duplicate handling implementation-defined
(ADVICE round 1)."""

import numpy as np

from mfx.config import SGDConfig
from mfx.data import partition as part
from mfx.data.coo import RatingsCOO
from mfx.kernels.jnp_ref import sgd_minibatch_update
from mfx.models import init_model
from mfx.solvers.sgd import plan_epoch


def test_pad_to_batches_sentinel_ids_unique_and_out_of_range():
    user = np.array([0, 1, 2], np.int32)
    item = np.array([5, 6, 7], np.int32)
    rating = np.array([1.0, 2.0, 3.0], np.float32)
    arrays = part.pad_to_batches(
        user, item, rating, np.arange(3, dtype=np.int64), batch_size=8,
        num_users=10, num_items=20,
    )
    u, i, w = arrays["users"][0], arrays["items"][0], arrays["weights"][0]
    assert (w[:3] == 1.0).all() and (w[3:] == 0.0).all()
    # pads are out of range and unique within the batch
    assert (u[3:] >= 10).all() and (i[3:] >= 20).all()
    assert len(np.unique(u)) == 8 and len(np.unique(i)) == 8


def test_conflict_free_batch_with_real_row_zero_updates_row_zero():
    """A conflict-free (unique_rows=True) padded batch containing the real
    user/item 0 must apply row 0's update exactly (id-0 pads used to make
    row 0's handling implementation-defined)."""
    U, I, K = 4, 5, 3
    model = init_model(0, U, I, K, global_mean=0.0)
    # one real rating on (0, 0) plus 7 pad slots
    arrays = part.pad_to_batches(
        np.array([0], np.int32), np.array([0], np.int32),
        np.array([4.0], np.float32), np.arange(1, dtype=np.int64),
        batch_size=8, num_users=U, num_items=I,
    )
    lr, reg = 0.1, 0.0
    got, _ = sgd_minibatch_update(
        model,
        arrays["users"][0], arrays["items"][0],
        arrays["ratings"][0], arrays["weights"][0],
        lr, reg, use_bias=False, unique_rows=True,
    )
    P = np.asarray(model.P, np.float64)
    Q = np.asarray(model.Q, np.float64)
    e = 4.0 - float(P[0] @ Q[0])
    exp_p0 = P[0] + lr * e * Q[0]
    exp_q0 = Q[0] + lr * e * P[0]
    np.testing.assert_allclose(np.asarray(got.P)[0], exp_p0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.Q)[0], exp_q0, atol=1e-6)
    # all other rows untouched
    np.testing.assert_array_equal(np.asarray(got.P)[1:], np.asarray(model.P)[1:])
    np.testing.assert_array_equal(np.asarray(got.Q)[1:], np.asarray(model.Q)[1:])


def test_plan_epoch_bucket_filler_batches_are_sentinel_padded():
    coo = RatingsCOO(
        user=np.arange(40, dtype=np.int32) % 7,
        item=np.arange(40, dtype=np.int32) % 9,
        rating=np.ones(40, np.float32),
        num_users=7,
        num_items=9,
    )
    cfg = SGDConfig(partitioner="conflict_free", batch_size=4, epochs=1)
    plan = plan_epoch(coo, cfg, seed=0, epoch=0)
    users = np.asarray(plan.batches["users"])
    items = np.asarray(plan.batches["items"])
    weights = np.asarray(plan.batches["weights"])
    for b in range(users.shape[0]):
        w = weights[b]
        # pads out of range; every id unique within its batch
        assert (users[b][w == 0.0] >= 7).all()
        assert (items[b][w == 0.0] >= 9).all()
        assert len(np.unique(users[b])) == len(users[b])
        assert len(np.unique(items[b])) == len(items[b])
