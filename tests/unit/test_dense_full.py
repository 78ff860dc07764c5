"""Full-item-span dense phase (sgd.dense_span='full') — grouped window
segments vs the NumPy mirror, equivalence with the head path when the
head covers everything, and the end-to-end trainer composition."""

import dataclasses
import types

import jax.numpy as jnp
import numpy as np
import pytest

from mfx.config import SGDConfig
from mfx.data import synthetic, train_test_split
from mfx.eval import rmse
from mfx.kernels import packing as pk
from mfx.models import init_model
from mfx.solvers import dense_prep as dp
from mfx.solvers.blocked import train_epochs_blocked
from tests.unit.test_dense_path import _mirror, _mirror_lane


def _reverse_items(coo):
    """Scatter the Zipf head to the END of the item span (the synthetic
    is popularity-sorted, so reversing moves every hot stratum outside
    any head window prefix)."""
    from mfx.data.coo import RatingsCOO

    return RatingsCOO(
        user=coo.user, item=coo.num_items - 1 - coo.item,
        rating=coo.rating, num_users=coo.num_users,
        num_items=coo.num_items,
    )


def _full_split_host(coo, su, si, chi_min, nwd):
    """Host analog of prepare_dense_full's selection, as per-group
    DenseSplit-like objects for the mirror (absolute sc windows)."""
    U0, I0 = coo.num_users, coo.num_items
    A, C = -(-U0 // su), -(-I0 // si)
    strat = (coo.user // su).astype(np.int64) * C + (coo.item // si)
    counts = np.bincount(strat, minlength=A * C)
    thresh = max(1.0, chi_min * su * si)
    idx = np.flatnonzero(counts >= thresh)
    a_s, c_s, g_s = idx // C, idx % C, (idx % C) // nwd
    order = np.lexsort((c_s, a_s, g_s))
    idx, a_s, c_s, g_s = idx[order], a_s[order], c_s[order], g_s[order]
    groups = []
    for g in np.unique(g_s):
        sel = g_s == g
        members = idx[sel]
        dmask = np.isin(strat, members)
        groups.append(types.SimpleNamespace(
            num_strata=int(sel.sum()), sa=a_s[sel], sc=c_s[sel],
            dense_idx=np.flatnonzero(dmask),
        ))
    all_dense = np.isin(strat, idx)
    return groups, np.flatnonzero(all_dense), np.flatnonzero(~all_dense)


def test_prepare_dense_full_single_group_matches_device_head():
    """With one group spanning every window, prepare_dense_full must
    reproduce prepare_dense_device's tensors exactly (same strata order,
    same R, same degrees) — the head prep is the nwd >= C special case."""
    U0, I0, su = 600, 600, 256
    coo = synthetic.make_synthetic(U0, I0, 60_000, rank=8, seed=11)
    C = -(-I0 // su)
    args = (jnp.asarray(coo.user), jnp.asarray(coo.item),
            jnp.asarray(coo.rating), U0, I0, su, su)
    head_t, (u_h, i_h, r_h), info_h = dp.prepare_dense_device(
        *args, chi_min=0.01, nwin_head=C, pack=2
    )
    meta, groups, (u_f, i_f, r_f), info_f = dp.prepare_dense_full(
        *args, chi_min=0.01, nwd=C, pack=2
    )
    assert meta == ((0, C),)
    assert info_f["num_strata"] == info_h["num_strata"]
    for k in ("sa", "sc", "R", "du_s", "di_s", "du_tot", "di_tot"):
        np.testing.assert_array_equal(
            np.asarray(groups[0][k]), np.asarray(head_t[k]), err_msg=k
        )
    np.testing.assert_array_equal(np.asarray(u_f), np.asarray(u_h))
    np.testing.assert_array_equal(np.asarray(i_f), np.asarray(i_h))


@pytest.mark.parametrize("lane", [False, True])
def test_full_span_groups_match_mirror_interpret(lane):
    """Multi-group full-span phases (nwd=1 forces one group per window,
    with hot strata scattered across the whole span) vs the per-group
    NumPy mirror — per-group frozen-bias semantics for bias_mode='tile',
    pure sequential semantics for 'lane'."""
    U0, I0, su, si, rank = 600, 600, 256, 256, 64
    pack, nwd = 2, 1
    coo = _reverse_items(
        synthetic.make_synthetic(U0, I0, 40_000, rank=8, seed=3)
    )
    meta, dgroups, (u_sp, i_sp, r_sp), info = dp.prepare_dense_full(
        jnp.asarray(coo.user), jnp.asarray(coo.item),
        jnp.asarray(coo.rating), U0, I0, su, si,
        chi_min=0.01, nwd=nwd, pack=pack,
    )
    host_groups, dense_idx, sparse_idx = _full_split_host(
        coo, su, si, 0.01, nwd
    )
    assert len(meta) == len(host_groups) >= 2  # really multi-group
    assert info["num_strata"] == sum(g.num_strata for g in host_groups)
    assert len(dense_idx) + int(u_sp.shape[0]) == coo.n_ratings

    model = init_model(2, U0, I0, rank, global_mean=coo.global_mean)
    model = model.__class__(
        P=model.P, Q=model.Q,
        bu=model.bu + 0.05, bi=model.bi - 0.03, mu=model.mu,
    )
    lr, reg, mu = 0.008, 0.02, float(model.mu)
    runM = pk.to_lane_model(model) if lane else model
    Pm, Qm = pk.pack_state(runM, su, si)
    for (win0, nw), dt in zip(meta, dgroups):
        Qs = pk.q_segment(Qm, win0, nw, rank, si)
        Pm, Qs, sse = dp.run_dense_phase(
            Pm, Qs, dt, lr, reg, mu,
            su=su, si=si, rank=rank, use_bias=True, exact=True,
            interpret=True, lane=lane,
        )
        Qm = pk.q_segment_restore(Qm, Qs, win0, rank, si)
    got = pk.unpack_state(Pm, Qm, model.mu, U0, I0, rank, su, si)

    if lane:
        P, Q = np.array(runM.P, np.float64), np.array(runM.Q, np.float64)
        for g in host_groups:
            P, Q = _mirror_lane(
                types.SimpleNamespace(P=P, Q=Q), g, coo, lr, reg, mu,
                U0, I0, su, si,
            )
        np.testing.assert_allclose(np.asarray(got.P), P, atol=5e-6)
        np.testing.assert_allclose(np.asarray(got.Q), Q, atol=5e-6)
    else:
        cur = types.SimpleNamespace(
            P=np.array(model.P, np.float64), Q=np.array(model.Q, np.float64),
            bu=np.array(model.bu, np.float64),
            bi=np.array(model.bi, np.float64),
        )
        for g in host_groups:  # bias update applies after EACH group
            P, Q, bu, bi = _mirror(
                cur, g, coo, lr, reg, mu, U0, I0, su, si
            )
            cur = types.SimpleNamespace(P=P, Q=Q, bu=bu, bi=bi)
        np.testing.assert_allclose(np.asarray(got.P), cur.P, atol=5e-6)
        np.testing.assert_allclose(np.asarray(got.Q), cur.Q, atol=5e-6)
        np.testing.assert_allclose(np.asarray(got.bu), cur.bu, atol=5e-6)
        np.testing.assert_allclose(np.asarray(got.bi), cur.bi, atol=5e-6)


def test_trainer_full_span_captures_off_head_strata(monkeypatch):
    """With the head limited to one window and the Zipf head reversed to
    the far end of the span, dense_span='head' captures nothing while
    'full' carves the hot strata anywhere — and still trains to the same
    quality as head-covered data."""
    import mfx.solvers.blocked as blocked_mod

    monkeypatch.setattr(blocked_mod, "DENSE_HEAD_ITEMS", 256)
    coo = _reverse_items(
        synthetic.make_synthetic(600, 600, 25_000, rank=4, noise=0.3,
                                 seed=9)
    )
    train, test = train_test_split(coo, test_frac=0.1, seed=0)
    base = dict(
        lr=0.01, reg=0.03, epochs=3, partitioner="blocked",
        kernel="pallas", ublock=256, iblock=256, tile=64, dense_chi=0.01,
        plan_device="device",
    )
    results = {}
    for span in ("head", "full"):
        model = init_model(1, 600, 600, 64, global_mean=train.global_mean)
        cfg = SGDConfig(dense_span=span, **base)
        first = last = None
        for ep, model, tr in train_epochs_blocked(
            model, train, cfg, use_bias=True, seed=0, tpg=4,
            interpret=True,
        ):
            first = float(tr) if first is None else first
            last = float(tr)
        assert last < first
        results[span] = rmse(model, test)
    # same quality class whether the hot mass ran densely or sparsely
    assert abs(results["full"] - results["head"]) < 0.02, results
    assert results["full"] < 1.0


def test_trainer_full_equals_head_when_head_covers_span():
    """Small spans: the head covers every window, so 'full' with one
    group must produce bitwise-identical tables to 'head'."""
    coo = synthetic.make_synthetic(500, 500, 30_000, rank=6, seed=5)
    base = dict(
        lr=0.01, reg=0.02, epochs=2, partitioner="blocked",
        kernel="pallas", ublock=256, iblock=256, tile=64, dense_chi=0.01,
        plan_device="device",
    )
    tables = {}
    for span in ("head", "full"):
        model = init_model(0, 500, 500, 64, global_mean=coo.global_mean)
        cfg = SGDConfig(dense_span=span, **base)
        for _, m, _ in train_epochs_blocked(
            model, coo, cfg, use_bias=True, seed=0, tpg=4, interpret=True
        ):
            pass
        tables[span] = (np.asarray(m.P), np.asarray(m.Q),
                        np.asarray(m.bu), np.asarray(m.bi))
    for a, b in zip(tables["head"], tables["full"]):
        np.testing.assert_array_equal(a, b)


def test_prep_cache_reuse_is_bitwise():
    """A second trainer over the same data with a shared prep_cache must
    reuse the device prep (same key) and produce bitwise-identical
    tables; a config change must miss and rebuild."""
    coo = synthetic.make_synthetic(500, 500, 30_000, rank=6, seed=5)
    cfg = SGDConfig(
        lr=0.01, reg=0.02, epochs=2, partitioner="blocked",
        kernel="pallas", ublock=256, iblock=256, tile=64, dense_chi=0.01,
        dense_span="full", plan_device="device",
    )

    def run(cache):
        model = init_model(0, 500, 500, 64, global_mean=coo.global_mean)
        for _, m, _ in train_epochs_blocked(
            model, coo, cfg, use_bias=True, seed=0, tpg=4,
            interpret=True, prep_cache=cache,
        ):
            pass
        return np.asarray(m.P), np.asarray(m.Q)

    cache: dict = {}
    P1, Q1 = run(cache)
    key1 = cache["key"]
    P2, Q2 = run(cache)  # hit
    assert cache["key"] is key1
    np.testing.assert_array_equal(P1, P2)
    np.testing.assert_array_equal(Q1, Q2)
    # different chi -> miss -> rebuilt key, still trains
    cfg = dataclasses.replace(cfg, dense_chi=0.02)
    run(cache)
    assert cache["key"] != key1


def test_prep_cache_keys_dataset_identity_not_just_shape():
    """Two different datasets of IDENTICAL shape must not share a cache
    entry — a stale hit would silently train on the other dataset's
    device arrays (e.g. two split seeds of the same corpus)."""
    cfg = SGDConfig(
        lr=0.01, reg=0.02, epochs=1, partitioner="blocked",
        kernel="pallas", ublock=256, iblock=256, tile=64, dense_chi=0.01,
        dense_span="full", plan_device="device",
    )

    def run(coo, cache):
        model = init_model(0, 500, 500, 64, global_mean=coo.global_mean)
        for _, m, _ in train_epochs_blocked(
            model, coo, cfg, use_bias=True, seed=0, tpg=4,
            interpret=True, prep_cache=cache,
        ):
            pass
        return np.asarray(m.P)

    coo_a = synthetic.make_synthetic(500, 500, 30_000, rank=6, seed=5)
    coo_b = synthetic.make_synthetic(500, 500, 30_000, rank=6, seed=6)
    shared: dict = {}
    run(coo_a, shared)
    key_a = shared["key"]
    P_shared = run(coo_b, shared)  # must MISS (different triples)
    assert shared["key"] != key_a
    P_fresh = run(coo_b, {})
    np.testing.assert_array_equal(P_shared, P_fresh)


def test_full_span_with_host_planner():
    """dense_span='full' under plan_device='host': the grouped split is
    pure jnp (runs on any backend); the host planner gets the sparse
    remainder and the hybrid epoch still trains."""
    cfg = SGDConfig(
        lr=0.01, reg=0.03, epochs=3, partitioner="blocked",
        kernel="pallas", dense_chi=0.01, dense_span="full",
        plan_device="host", ublock=256, iblock=256, tile=64,
    )
    coo = synthetic.make_synthetic(600, 600, 25_000, rank=4, noise=0.3,
                                   seed=9)
    model = init_model(0, 600, 600, 64, global_mean=coo.global_mean)
    timings: dict = {}
    hist = []
    for _, m, tr in train_epochs_blocked(
        model, coo, cfg, use_bias=True, seed=0, tpg=4, interpret=True,
        timings=timings,
    ):
        hist.append(float(tr))
    assert timings["planner"] == "host"
    assert timings["dense_info"]["dense_frac"] > 0.3
    assert hist[-1] < hist[0]


def test_dense_span_validation():
    with pytest.raises(ValueError, match="dense_span"):
        SGDConfig(dense_span="everything")
