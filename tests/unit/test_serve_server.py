"""HTTP serving endpoint (mfx/serve/server.py) — request/response
contract over a live in-process server."""

import json
import urllib.error
import urllib.request

import numpy as np
import pytest

from mfx.data import synthetic
from mfx.models.mf import init_model
from mfx.serve import TopKRecommender, similar_items
from mfx.serve.server import RecServer


@pytest.fixture(scope="module")
def server():
    U, I = 20, 40
    coo = synthetic.make_synthetic(U, I, 300, seed=1)
    model = init_model(0, U, I, rank=4, global_mean=3.5)
    rec = TopKRecommender(model, train=coo, batch=8)
    raw = np.arange(I, dtype=np.int64) * 100  # fake raw-id map
    srv = RecServer(
        rec, similar=lambda q, k: similar_items(model, q, k=k),
        raw_item_ids=raw, port=0,  # OS-assigned free port
    )
    srv.start()
    yield srv, coo, model
    srv.stop()


def _post(srv, path, body):
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}{path}",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=30) as r:
        return json.loads(r.read())


def test_healthz(server):
    srv, _, model = server
    with urllib.request.urlopen(
        f"http://127.0.0.1:{srv.port}/healthz", timeout=30
    ) as r:
        h = json.loads(r.read())
    assert h["status"] == "ok"
    assert h["num_users"] == model.num_users
    assert h["rank"] == model.rank


def test_recommend_endpoint(server):
    srv, coo, model = server
    out = _post(srv, "/recommend", {"users": [0, 3], "k": 5})
    assert out["users"] == [0, 3]
    assert len(out["items"]) == 2 and len(out["items"][0]) == 5
    # scores descending, seen excluded, raw-id map applied
    for row, u in zip(out["scores"], (0, 3)):
        assert all(a >= b - 1e-6 for a, b in zip(row, row[1:]))
    seen0 = set(coo.item[coo.user == 0].tolist())
    assert not (set(out["items"][0]) & seen0)
    assert out["raw_items"][0] == [i * 100 for i in out["items"][0]]


def test_similar_endpoint(server):
    srv, _, _ = server
    out = _post(srv, "/similar", {"items": [2], "k": 3})
    assert out["items"] == [2]
    assert 2 not in out["similar"][0]
    assert len(out["cosine"][0]) == 3


def test_concurrent_requests_micro_batch(server):
    """Concurrent /recommend requests merge into fewer device dispatches
    than requests, and each gets its own correct slice."""
    import threading

    srv, _, _ = server
    calls = []
    orig = srv._rec.recommend

    def counting(users, k=10):
        calls.append(len(users))
        return orig(users, k=k)

    srv._rec.recommend = counting
    srv._window = 0.2  # widen the window so the test is deterministic
    try:
        results = {}

        def go(u):
            results[u] = _post(srv, "/recommend", {"users": [u], "k": 4})

        threads = [threading.Thread(target=go, args=(u,)) for u in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        # every request answered with its own user's list
        solo = {u: _post(srv, "/recommend", {"users": [u], "k": 4})
                for u in range(8)}
        for u in range(8):
            assert results[u]["users"] == [u]
            assert results[u]["items"][0] == solo[u]["items"][0]
        # batched: strictly fewer dispatches than requests (8 concurrent
        # + 8 solo probes; the concurrent ones must have merged)
        assert len(calls) < 8 + 8
        assert max(calls) > 1
    finally:
        srv._rec.recommend = orig
        srv._window = 2e-3


def test_batched_error_isolated(server):
    """An out-of-range request merged with a good one must 400 alone."""
    import threading

    srv, _, _ = server
    srv._window = 0.2
    try:
        out = {}

        def good():
            out["good"] = _post(srv, "/recommend", {"users": [1], "k": 3})

        def bad():
            try:
                _post(srv, "/recommend", {"users": [9999], "k": 3})
                out["bad"] = "no-error"
            except urllib.error.HTTPError as e:
                out["bad"] = e.code

        ts = [threading.Thread(target=good), threading.Thread(target=bad)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert out["bad"] == 400
        assert out["good"]["users"] == [1]
    finally:
        srv._window = 2e-3


def test_error_paths(server):
    srv, _, _ = server
    # bad k
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(srv, "/recommend", {"users": [0], "k": 0})
    assert e.value.code == 400
    # out-of-range user id surfaces as a 400 with the message
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(srv, "/recommend", {"users": [9999], "k": 2})
    assert e.value.code == 400
    assert "out of range" in json.loads(e.value.read())["error"]
    # missing users list
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(srv, "/recommend", {"k": 2})
    assert e.value.code == 400
    # unknown path
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(srv, "/nope", {})
    assert e.value.code == 404
    # malformed body
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}/recommend", data=b"{not json",
        headers={"Content-Type": "application/json"},
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400


def test_recommend_cold_endpoint():
    """POST /recommend_cold folds histories and serves — and a server
    without the callable 404s."""
    from mfx.serve import recommend_cold

    U, I = 10, 30
    model = init_model(2, U, I, rank=4, global_mean=3.2)
    rec = TopKRecommender(model, batch=4)
    srv = RecServer(
        rec, cold=lambda hs, k: recommend_cold(model, hs, k=k), port=0,
    )
    srv.start()
    try:
        out = _post(srv, "/recommend_cold",
                    {"histories": [[[1, 5.0], [2, 4.0]], []], "k": 4})
        assert len(out["items"]) == 2 and len(out["items"][0]) == 4
        assert 1 not in out["items"][0] and 2 not in out["items"][0]
        # malformed history -> 400
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(srv, "/recommend_cold", {"histories": [[[999, 5.0]]],
                                           "k": 2})
        assert e.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(srv, "/recommend_cold", {"histories": "nope", "k": 2})
        assert e.value.code == 400
    finally:
        srv.stop()

    srv2 = RecServer(rec, port=0)
    srv2.start()
    try:
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(srv2, "/recommend_cold", {"histories": [[[1, 5.0]]]})
        assert e.value.code == 404
    finally:
        srv2.stop()


def test_metrics_endpoint(server):
    """GET /metrics renders Prometheus text: per-path request counters,
    latency quantiles over the recent window, and the micro-batcher's
    dispatch efficiency counters."""
    srv, coo, model = server
    _post(srv, "/recommend", {"users": [0, 1], "k": 3})
    _post(srv, "/similar", {"items": [2], "k": 3})
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(srv, "/recommend", {"users": [], "k": 3})
    assert e.value.code == 400
    with urllib.request.urlopen(
        f"http://127.0.0.1:{srv.port}/metrics", timeout=30
    ) as r:
        assert r.headers["Content-Type"].startswith("text/plain")
        text = r.read().decode()

    def counter(name: str) -> int:
        for ln in text.splitlines():
            if ln.startswith(name + " ") or ln.startswith(name + "{"):
                return int(float(ln.rsplit(" ", 1)[1]))
        raise AssertionError(f"{name} not in /metrics:\n{text}")

    # counters present and >= what this test just issued (the module
    # fixture is shared, so earlier tests may have added more)
    assert counter('mfx_requests_total{path="/recommend",code="200"}') >= 1
    assert counter('mfx_requests_total{path="/recommend",code="400"}') >= 1
    assert counter('mfx_requests_total{path="/similar",code="200"}') >= 1
    # latency summary: quantiles are ordered, count matches the counter
    import re

    q = {
        m.group(1): float(m.group(2))
        for m in re.finditer(
            r'mfx_request_latency_seconds\{path="/recommend",'
            r'quantile="([\d.]+)"\} (\S+)', text)
    }
    assert set(q) == {"0.5", "0.9", "0.99"}
    assert 0 <= q["0.5"] <= q["0.9"] <= q["0.99"]
    # batcher efficiency: every merged /recommend rode a dispatch
    assert counter("mfx_batch_dispatches_total") >= 1
    assert (counter("mfx_batch_requests_total")
            >= counter("mfx_batch_dispatches_total"))
    assert counter("mfx_batch_users_total") >= 2


def test_reload_endpoint_hot_swaps_model():
    """POST /reload swaps in the factory's new recommender without a
    restart; a server without the factory 404s."""
    U, I = 8, 20
    m1 = init_model(0, U, I, rank=4, global_mean=3.0)
    m2 = init_model(1, U + 2, I + 5, rank=4, global_mean=3.0)
    state = {"n": 0}

    def build():
        state["n"] += 1
        model = m2 if state["n"] > 1 else m1
        return {
            "recommender": TopKRecommender(model, batch=4),
            "info": {"build": state["n"]},
        }

    srv = RecServer(build()["recommender"], reload=build, port=0)
    srv.start()
    try:
        out = _post(srv, "/recommend", {"users": [0], "k": 3})
        assert len(out["items"][0]) == 3
        out = _post(srv, "/reload", {})
        assert out["status"] == "reloaded"
        assert out["num_users"] == U + 2 and out["num_items"] == I + 5
        assert out["build"] == 2
        # the swapped model answers — a user id only valid post-swap
        out = _post(srv, "/recommend", {"users": [U + 1], "k": 3})
        assert len(out["items"][0]) == 3
        with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/healthz", timeout=30
        ) as r:
            hz = json.loads(r.read())
        assert hz["num_users"] == U + 2
    finally:
        srv.stop()

    srv2 = RecServer(TopKRecommender(m1, batch=4), port=0)
    srv2.start()
    try:
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(srv2, "/reload", {})
        assert e.value.code == 404
    finally:
        srv2.stop()


def test_recommend_per_request_exclusions(server):
    """'exclude' id lists drop those items exactly, k results survive
    (over-fetch guarantees it), and malformed lists 400."""
    srv, coo, model = server
    base = _post(srv, "/recommend", {"users": [0, 1], "k": 5})
    ex = [base["items"][0][:3], []]
    out = _post(srv, "/recommend",
                {"users": [0, 1], "k": 5, "exclude": ex})
    assert len(out["items"][0]) == 5
    assert not set(ex[0]) & set(out["items"][0])
    # the un-excluded user's list is unchanged
    assert out["items"][1] == base["items"][1]
    # excluded user's survivors keep their relative order from the pool
    assert out["items"][0][0] == [
        i for i in base["items"][0] if i not in ex[0]
    ][0]
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(srv, "/recommend",
              {"users": [0, 1], "k": 5, "exclude": [[1]]})  # wrong len
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(srv, "/recommend",
              {"users": [0], "k": 5, "exclude": "nope"})
    assert e.value.code == 400


def test_exclude_exhausting_catalog_pads_with_valid_ids():
    """When 'exclude' knocks out more than the catalog can replace, pad
    slots carry VALID item ids with null scores (regression: np.empty
    garbage)."""
    U, I = 4, 6
    model = init_model(3, U, I, rank=2, global_mean=3.0)
    srv = RecServer(TopKRecommender(model, batch=4), port=0)
    srv.start()
    try:
        out = _post(srv, "/recommend",
                    {"users": [0], "k": 6,
                     "exclude": [[0, 1, 2, 3, 4, 5]]})
        assert sorted(out["items"][0]) == [0, 1, 2, 3, 4, 5]
        assert all(s is None for s in out["scores"][0])
        # malformed cold pair -> 400, not 500
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(srv, "/recommend_cold", {"histories": [[[12]]], "k": 2})
        assert e.value.code == 404  # cold disabled on this server
        # unknown paths fold into one 'other' metrics label
        urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/healthz", timeout=30)
        with pytest.raises(urllib.error.HTTPError):
            _post(srv, '/recommend"x', {"users": [0]})
        with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/metrics", timeout=30
        ) as r:
            text = r.read().decode()
        assert '"x' not in text
        assert 'path="other"' in text
    finally:
        srv.stop()


def test_recommend_cold_malformed_pair_is_400():
    from mfx.serve import recommend_cold

    model = init_model(4, 6, 12, rank=2, global_mean=3.0)
    rec = TopKRecommender(model, batch=4)
    srv = RecServer(
        rec, cold=lambda hs, k: recommend_cold(model, hs, k=k), port=0,
    )
    srv.start()
    try:
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(srv, "/recommend_cold", {"histories": [[[3]]], "k": 2})
        assert e.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(srv, "/recommend_cold",
                  {"histories": [[[3, 4.0, 9]]], "k": 2})
        assert e.value.code == 400
    finally:
        srv.stop()
