"""Dense-stratum fast path vs. a NumPy mirror (interpret mode on CPU;
compiled-TPU correctness verified in the bench/driver flow)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mfx.data import synthetic
from mfx.kernels import packing as pk
from mfx.kernels.dense_pallas import DSTAR, R_SCALE
from mfx.models import init_model
from mfx.solvers import dense_prep as dp


def _mirror(model, split, coo, lr, reg, mu, U0, I0, su, si,
            rscale=R_SCALE, rmax=127.0):
    """Dense-matrix mirror: duplicate (u, i) pairs merge by averaging,
    R travels int8-quantized (dense_pallas.R_SCALE), degrees count raw
    ratings (matching the kernel's aux arrays)."""
    P = np.array(model.P, np.float64)
    Q = np.array(model.Q, np.float64)
    bu0 = np.array(model.bu, np.float64)
    bi0 = np.array(model.bi, np.float64)
    ebu = np.zeros(U0)
    ebi = np.zeros(I0)
    degu = np.zeros(U0)
    degi = np.zeros(I0)
    C = -(-I0 // si)
    strat_all = (coo.user // su).astype(np.int64) * C + (coo.item // si)
    for k in range(split.num_strata):
        a, c = int(split.sa[k]), int(split.sc[k])
        sel = split.dense_idx[strat_all[split.dense_idx] == a * C + c]
        u, i = coo.user[sel], coo.item[sel]
        r = coo.rating[sel].astype(np.float64)
        lu, li = u - a * su, i - c * si
        rsum = np.zeros((su, si))
        cnt = np.zeros((su, si))
        np.add.at(rsum, (lu, li), r)
        np.add.at(cnt, (lu, li), 1.0)
        Ravg = np.where(cnt > 0, rsum / np.maximum(cnt, 1.0), 0.0)
        q = np.clip(np.round(Ravg * rscale), 0.0, rmax).astype(np.float32)
        W = q > 0
        Ravg = (q * np.float32(1.0 / rscale)).astype(np.float64)
        rows = slice(a * su, min((a + 1) * su, U0))
        cols = slice(c * si, min((c + 1) * si, I0))
        # .copy(): snapshot semantics — P[rows] is a view, and the in-place
        # update below would otherwise leak into the Q update
        Pb, Qb = P[rows].copy(), Q[cols].copy()
        nu, ni = Pb.shape[0], Qb.shape[0]
        W = W[:nu, :ni]
        Ravg = Ravg[:nu, :ni]
        S = Pb @ Qb.T + bu0[rows][:, None] + bi0[cols][None, :] + mu
        E = np.where(W, Ravg - S, 0.0)
        deg_u = np.zeros(su)
        np.add.at(deg_u, lu, 1.0)
        deg_i = np.zeros(si)
        np.add.at(deg_i, li, 1.0)
        deg_u, deg_i = deg_u[:nu], deg_i[:ni]
        s_u = np.minimum(1.0, DSTAR / np.maximum(deg_u, 1.0))[:, None]
        s_i = np.minimum(1.0, DSTAR / np.maximum(deg_i, 1.0))[:, None]
        P[rows] = Pb + lr * s_u * (E @ Qb - reg * deg_u[:, None] * Pb)
        Q[cols] = Qb + lr * s_i * (E.T @ Pb - reg * deg_i[:, None] * Qb)
        ebu[rows] += E.sum(1)
        ebi[cols] += E.sum(0)
        degu[rows] += deg_u
        degi[cols] += deg_i
    su_b = np.minimum(1.0, DSTAR / np.maximum(degu, 1.0))
    si_b = np.minimum(1.0, DSTAR / np.maximum(degi, 1.0))
    bu = bu0 + lr * su_b * (ebu - reg * degu * bu0)
    bi = bi0 + lr * si_b * (ebi - reg * degi * bi0)
    return P, Q, bu, bi


@pytest.mark.parametrize(
    "rank,su",
    [(128, 256), (64, 256), (32, 512)],  # pack 1 / 2 / 4
)
def test_dense_phase_matches_mirror_interpret(rank, su):
    U0, I0, si = 600, 600, su
    pack = 128 // rank
    coo = synthetic.make_synthetic(U0, I0, 25_000, rank=8, seed=3)
    split = dp.split_dense_strata(
        coo.user, coo.item, U0, I0, su, si,
        chi_min=0.01, nwin_head=3, pack=pack,
    )
    assert split.num_strata > 0
    assert len(split.dense_idx) + len(split.sparse_idx) == coo.n_ratings

    model = init_model(2, U0, I0, rank, global_mean=coo.global_mean)
    model = model.__class__(
        P=model.P, Q=model.Q,
        bu=model.bu + 0.05, bi=model.bi - 0.03, mu=model.mu,
    )
    tensors = dp.build_dense_tensors(split, coo.rating, su, si, pack)
    Pm, Qm = pk.pack_state(model, su, si)
    lr, reg, mu = 0.008, 0.02, float(model.mu)
    Pm2, Qm2, sse = dp.run_dense_phase(
        Pm, Qm, tensors, lr, reg, mu,
        su=su, si=si, rank=rank, use_bias=True, exact=True, interpret=True,
    )
    got = pk.unpack_state(Pm2, Qm2, model.mu, U0, I0, rank, su, si)
    P, Q, bu, bi = _mirror(model, split, coo, lr, reg, mu, U0, I0, su, si)
    np.testing.assert_allclose(np.asarray(got.P), P, atol=5e-6)
    np.testing.assert_allclose(np.asarray(got.Q), Q, atol=5e-6)
    np.testing.assert_allclose(np.asarray(got.bu), bu, atol=5e-6)
    np.testing.assert_allclose(np.asarray(got.bi), bi, atol=5e-6)
    assert float(sse) > 0


def test_relabel_recovers_dense_coverage_on_raw_ids():
    """Real files carry arbitrary item ids (popularity scattered across the
    id space); the loaders' frequency relabel must cluster the Zipf head
    back into the first windows so the dense split captures a substantial
    rating share (VERDICT round-1 item #8: >= 30% on MovieLens-like ids)."""
    from mfx.data.loaders import _densify

    U0, I0, su = 600, 600, 256
    coo = synthetic.make_synthetic(U0, I0, 60_000, rank=8, seed=11)
    # scramble items into a fake raw-id space (like real catalog ids)
    rng = np.random.default_rng(0)
    scramble = rng.permutation(100_000)[:I0]
    raw = _densify(coo.user, scramble[coo.item], coo.rating)

    def captured(c):
        split = dp.split_dense_strata(
            c.user, c.item, U0, I0, su, su, chi_min=0.01, nwin_head=3, pack=2
        )
        return len(split.dense_idx) / c.n_ratings

    frac = captured(raw)
    assert frac >= 0.30, frac
    # and it matches the popularity-sorted synthetic's own coverage
    frac_sorted = captured(coo)
    assert abs(frac - frac_sorted) < 0.05, (frac, frac_sorted)


def test_blocked_trainer_with_dense_path_interpret():
    """End-to-end hybrid epoch (dense phase + sparse sweeps) on CPU."""
    import dataclasses

    from mfx.config import SGDConfig
    from mfx.data import train_test_split
    from mfx.eval import rmse
    from mfx.solvers.blocked import train_epochs_blocked

    coo = synthetic.make_synthetic(600, 600, 25_000, rank=4, noise=0.3, seed=9)
    train, test = train_test_split(coo, test_frac=0.1, seed=0)
    model = init_model(1, 600, 600, 64, global_mean=train.global_mean)
    cfg = SGDConfig(
        lr=0.01, reg=0.03, epochs=3, partitioner="blocked", kernel="pallas",
        ublock=256, iblock=256, tile=64, dense_chi=0.01,
    )
    first = last = None
    for ep, model, tr in train_epochs_blocked(
        model, train, cfg, use_bias=True, seed=0, tpg=4, interpret=True
    ):
        first = tr if first is None else first
        last = tr
    assert last < first
    assert rmse(model, test) < 1.0


def test_prepare_dense_device_matches_host_split():
    """The device-side split/build pipeline must produce exactly the host
    planner's tensors (same strata, same int8 R, same degree tables) and
    the same sparse remainder."""
    import jax.numpy as jnp

    U0, I0, su = 600, 600, 256
    coo = synthetic.make_synthetic(U0, I0, 60_000, rank=8, seed=11)
    split = dp.split_dense_strata(
        coo.user, coo.item, U0, I0, su, su, chi_min=0.01, nwin_head=3, pack=2
    )
    host_t = dp.build_dense_tensors(split, coo.rating, su, su, 2)
    dev_t, (u_sp, i_sp, r_sp), info = dp.prepare_dense_device(
        jnp.asarray(coo.user), jnp.asarray(coo.item),
        jnp.asarray(coo.rating), U0, I0, su, su,
        chi_min=0.01, nwin_head=3, pack=2,
    )
    assert info["num_strata"] == split.num_strata
    for k in ("sa", "sc", "R", "du_s", "di_s", "du_tot", "di_tot"):
        np.testing.assert_array_equal(
            np.asarray(dev_t[k]), np.asarray(host_t[k]), err_msg=k
        )
    sp_host = np.sort(split.sparse_idx)
    got = np.stack([np.asarray(u_sp), np.asarray(i_sp)], axis=1)
    want = np.stack([coo.user[sp_host], coo.item[sp_host]], axis=1)
    np.testing.assert_array_equal(
        got[np.lexsort(got.T[::-1])], want[np.lexsort(want.T[::-1])]
    )


def test_blocked_trainer_device_pipeline_interpret():
    """plan_device='device' forced on CPU: the fully device-resident
    split+plan pipeline trains end-to-end."""
    import dataclasses

    from mfx.config import SGDConfig
    from mfx.data import train_test_split
    from mfx.eval import rmse
    from mfx.solvers.blocked import train_epochs_blocked

    coo = synthetic.make_synthetic(600, 600, 25_000, rank=4, noise=0.3, seed=9)
    train, test = train_test_split(coo, test_frac=0.1, seed=0)
    model = init_model(1, 600, 600, 64, global_mean=train.global_mean)
    cfg = SGDConfig(
        lr=0.01, reg=0.03, epochs=3, partitioner="blocked", kernel="pallas",
        ublock=256, iblock=256, tile=64, dense_chi=0.01,
        plan_device="device",
    )
    first = last = None
    for ep, model, tr in train_epochs_blocked(
        model, train, cfg, use_bias=True, seed=0, tpg=4, interpret=True
    ):
        first = tr if first is None else first
        last = tr
    assert last < first
    assert rmse(model, test) < 1.0


@pytest.mark.parametrize("rank,su", [(64, 256), (32, 512)])  # pack 2 / 4
def test_dense_phase_int4_matches_mirror_interpret(rank, su):
    """int4 nibble stream (directive #10) vs the mirror on the r*2 grid;
    half-star data makes the encoding lossless."""
    U0, I0, si = 600, 600, su
    pack = 128 // rank
    coo = synthetic.make_synthetic(U0, I0, 25_000, rank=8, seed=3,
                                   star_step=0.5)
    split = dp.split_dense_strata(
        coo.user, coo.item, U0, I0, su, si,
        chi_min=0.01, nwin_head=3, pack=pack,
    )
    assert split.num_strata > 0
    model = init_model(2, U0, I0, rank, global_mean=coo.global_mean)
    model = model.__class__(
        P=model.P, Q=model.Q,
        bu=model.bu + 0.05, bi=model.bi - 0.03, mu=model.mu,
    )
    tensors = dp.build_dense_tensors(split, coo.rating, su, si, pack,
                                     rfmt="int4")
    Pm, Qm = pk.pack_state(model, su, si)
    lr, reg, mu = 0.008, 0.02, float(model.mu)
    Pm2, Qm2, sse = dp.run_dense_phase(
        Pm, Qm, tensors, lr, reg, mu,
        su=su, si=si, rank=rank, use_bias=True, exact=True, interpret=True,
        rfmt="int4",
    )
    got = pk.unpack_state(Pm2, Qm2, model.mu, U0, I0, rank, su, si)
    P, Q, bu, bi = _mirror(model, split, coo, lr, reg, mu, U0, I0, su, si,
                           rscale=2.0, rmax=15.0)
    np.testing.assert_allclose(np.asarray(got.P), P, atol=5e-6)
    np.testing.assert_allclose(np.asarray(got.Q), Q, atol=5e-6)
    np.testing.assert_allclose(np.asarray(got.bu), bu, atol=5e-6)
    np.testing.assert_allclose(np.asarray(got.bi), bi, atol=5e-6)
    assert float(sse) > 0


def test_blocked_trainer_int4_auto_on_half_stars():
    """dense_int4='auto' engages on half-star data and the hybrid epoch
    trains; continuous data falls back to int8."""
    import dataclasses

    from mfx.config import SGDConfig
    from mfx.solvers.blocked import dense_rfmt, train_epochs_blocked

    cfg = SGDConfig(
        lr=0.01, reg=0.02, epochs=2, partitioner="blocked", kernel="pallas",
        ublock=256, iblock=256, tile=64, dense_chi=0.02,
    )
    coo_h = synthetic.make_synthetic(500, 500, 30_000, rank=6, seed=5,
                                     star_step=0.5)
    coo_c = synthetic.make_synthetic(500, 500, 30_000, rank=6, seed=5)
    assert dense_rfmt(cfg, 2, coo_h.rating) == "int4"
    assert dense_rfmt(cfg, 2, coo_c.rating) == "int8"
    assert dense_rfmt(cfg, 1, coo_h.rating) == "int8"  # rank 128 regime
    # forcing 'on' outside the nibble-pair regime must raise, not
    # silently downgrade (code-review round 3, finding 2)
    import pytest

    cfg_on = dataclasses.replace(cfg, dense_int4="on")
    assert dense_rfmt(cfg_on, 2, coo_c.rating) == "int4"  # forced
    with pytest.raises(ValueError, match="dense_int4"):
        dense_rfmt(cfg_on, 1, coo_h.rating)

    model = init_model(0, 500, 500, 64, global_mean=coo_h.global_mean)
    hist = []
    for _, m, tr in train_epochs_blocked(
        model, coo_h, cfg, use_bias=True, seed=0, interpret=True
    ):
        hist.append(tr)
    assert np.isfinite(hist).all() and hist[-1] < hist[0]


def _mirror_lane(modelL, split, coo, lr, reg, mu, U0, I0, su, si,
                 rscale=R_SCALE, rmax=127.0):
    """Lane-bias dense mirror: tables already augmented
    (packing.to_lane_model); S carries bu+bi through the factor product,
    const lanes frozen, no post-phase bias update."""
    P = np.array(modelL.P, np.float64)
    Q = np.array(modelL.Q, np.float64)
    k = P.shape[1]
    mP = np.ones(k)
    mP[k - 2] = 0.0
    mQ = np.ones(k)
    mQ[k - 1] = 0.0
    C = -(-I0 // si)
    strat_all = (coo.user // su).astype(np.int64) * C + (coo.item // si)
    for j in range(split.num_strata):
        a, c = int(split.sa[j]), int(split.sc[j])
        sel = split.dense_idx[strat_all[split.dense_idx] == a * C + c]
        u, i = coo.user[sel], coo.item[sel]
        r = coo.rating[sel].astype(np.float64)
        lu, li = u - a * su, i - c * si
        rsum = np.zeros((su, si))
        cnt = np.zeros((su, si))
        np.add.at(rsum, (lu, li), r)
        np.add.at(cnt, (lu, li), 1.0)
        Ravg = np.where(cnt > 0, rsum / np.maximum(cnt, 1.0), 0.0)
        q = np.clip(np.round(Ravg * rscale), 0.0, rmax).astype(np.float32)
        W = q > 0
        Ravg = (q * np.float32(1.0 / rscale)).astype(np.float64)
        rows = slice(a * su, min((a + 1) * su, U0))
        cols = slice(c * si, min((c + 1) * si, I0))
        Pb, Qb = P[rows].copy(), Q[cols].copy()
        nu, ni = Pb.shape[0], Qb.shape[0]
        W = W[:nu, :ni]
        Ravg = Ravg[:nu, :ni]
        S = Pb @ Qb.T + mu  # biases ride in the factor product
        E = np.where(W, Ravg - S, 0.0)
        deg_u = np.zeros(su)
        np.add.at(deg_u, lu, 1.0)
        deg_i = np.zeros(si)
        np.add.at(deg_i, li, 1.0)
        deg_u, deg_i = deg_u[:nu], deg_i[:ni]
        s_u = np.minimum(1.0, DSTAR / np.maximum(deg_u, 1.0))[:, None]
        s_i = np.minimum(1.0, DSTAR / np.maximum(deg_i, 1.0))[:, None]
        P[rows] = Pb + lr * s_u * (
            (E @ Qb - reg * deg_u[:, None] * Pb) * mP[None, :]
        )
        Q[cols] = Qb + lr * s_i * (
            (E.T @ Pb - reg * deg_i[:, None] * Qb) * mQ[None, :]
        )
    return P, Q


def test_dense_phase_lane_matches_mirror_interpret():
    """bias_mode='lane' dense phase (biases in the factor lanes, const
    lanes masked, per-stratum bias batching) vs its NumPy mirror."""
    U0, I0, su, si, rank = 600, 600, 256, 256, 64
    pack = 128 // rank
    coo = synthetic.make_synthetic(U0, I0, 25_000, rank=8, seed=3)
    split = dp.split_dense_strata(
        coo.user, coo.item, U0, I0, su, si,
        chi_min=0.01, nwin_head=3, pack=pack,
    )
    assert split.num_strata > 0
    model = init_model(2, U0, I0, rank, global_mean=coo.global_mean)
    model = model.__class__(
        P=model.P, Q=model.Q,
        bu=model.bu + 0.05, bi=model.bi - 0.03, mu=model.mu,
    )
    laneM = pk.to_lane_model(model)
    tensors = dp.build_dense_tensors(split, coo.rating, su, si, pack)
    Pm, Qm = pk.pack_state(laneM, su, si)
    lr, reg, mu = 0.008, 0.02, float(model.mu)
    Pm2, Qm2, sse = dp.run_dense_phase(
        Pm, Qm, tensors, lr, reg, mu,
        su=su, si=si, rank=rank, use_bias=True, exact=True, interpret=True,
        lane=True,
    )
    got = pk.unpack_state(Pm2, Qm2, model.mu, U0, I0, rank, su, si)
    P, Q = _mirror_lane(laneM, split, coo, lr, reg, mu, U0, I0, su, si)
    np.testing.assert_allclose(np.asarray(got.P), P, atol=5e-6)
    np.testing.assert_allclose(np.asarray(got.Q), Q, atol=5e-6)
    # const lanes frozen; bias lanes moved
    np.testing.assert_array_equal(np.asarray(got.P[:, rank - 2]), 1.0)
    np.testing.assert_array_equal(np.asarray(got.Q[:, rank - 1]), 1.0)
    assert not np.allclose(np.asarray(got.P[:, rank - 1]),
                           np.asarray(laneM.P[:, rank - 1]))


@pytest.mark.parametrize("lane", [False, True])
def test_dense_echo_equals_sequential_passes(lane):
    """dense_echo semantics: with DIAGONAL strata (disjoint user blocks x
    item windows) the per-stratum in-VMEM repeat order coincides with the
    whole-phase order, so one echo=2 phase must equal two echo=1 phases
    exactly. (With shared blocks the orders differ by design — echo is
    per-stratum Jacobi repeats, not extra epochs.)"""
    from mfx.data.coo import RatingsCOO

    U0 = I0 = 512
    su = si = 256
    rank = 64
    pack = 128 // rank
    rng = np.random.default_rng(7)
    us, its, rs = [], [], []
    for k in range(2):  # stratum (k, k) only
        n = 3000
        us.append(rng.integers(k * su, (k + 1) * su, n, dtype=np.int64))
        its.append(rng.integers(k * si, (k + 1) * si, n, dtype=np.int64))
        rs.append(rng.uniform(0.5, 5.0, n).astype(np.float32))
    coo = RatingsCOO(
        np.concatenate(us).astype(np.int32),
        np.concatenate(its).astype(np.int32),
        np.concatenate(rs), U0, I0,
    )
    split = dp.split_dense_strata(
        coo.user, coo.item, U0, I0, su, si,
        chi_min=0.01, nwin_head=2, pack=pack,
    )
    assert split.num_strata == 2
    assert len(split.sparse_idx) == 0
    tensors = dp.build_dense_tensors(split, coo.rating, su, si, pack)

    model = init_model(4, U0, I0, rank, global_mean=float(coo.rating.mean()))
    if lane:
        model = pk.to_lane_model(model)
    lr, reg, mu = 0.01, 0.02, float(model.mu)
    kw = dict(su=su, si=si, rank=rank, use_bias=lane, exact=True,
              interpret=True, lane=lane)

    Pm, Qm = pk.pack_state(model, su, si)
    Pe, Qe, sse_e = dp.run_dense_phase(Pm, Qm, tensors, lr, reg, mu,
                                       echo=2, **kw)

    Pm, Qm = pk.pack_state(model, su, si)
    P1, Q1, sse_1 = dp.run_dense_phase(Pm, Qm, tensors, lr, reg, mu, **kw)
    P1_snap = np.asarray(P1)  # P1 is donated into the second pass below
    P2, Q2, _ = dp.run_dense_phase(P1, Q1, tensors, lr, reg, mu, **kw)

    np.testing.assert_array_equal(np.asarray(Pe), np.asarray(P2))
    np.testing.assert_array_equal(np.asarray(Qe), np.asarray(Q2))
    # sse keeps first-pass semantics: echo-invariant
    np.testing.assert_allclose(float(sse_e), float(sse_1), rtol=1e-6)
    # and the echoed tables really took a second step
    assert not np.allclose(np.asarray(Pe), P1_snap)


def test_dense_echo_rejects_frozen_bias():
    with pytest.raises(NotImplementedError, match="echo"):
        from mfx.kernels.dense_pallas import dense_sgd_phase_pallas

        dense_sgd_phase_pallas(
            jnp.zeros((264, 128)), jnp.zeros((264, 128)),
            {"sa": jnp.zeros((1,), jnp.int32)},
            0.01, 0.02, 0.0,
            su=256, si=256, rank=64, nwin=1, use_bias=True,
            interpret=True, echo=2,
        )
