"""Minimal production-style serving endpoint — stdlib HTTP around the
recommenders (no framework dependencies; the deployment shape described
in docs/SERVING.md).

    POST /recommend       {"users": [3, 17], "k": 10}
    POST /similar         {"items": [1, 7], "k": 10}
    POST /recommend_cold  {"histories": [[[12, 4.5], [7, 3.0]]], "k": 10}
    GET  /healthz

Responses are JSON: ``items``/``scores`` per user (plus ``raw_items``
when the loader relabeled the catalog), or ``similar``/``cosine`` per
query item. Concurrent /recommend requests are MICRO-BATCHED: requests
arriving within ``batch_window_ms`` (or queued while the device is
busy) merge into one device dispatch — the scoring program is batched
over users anyway, so QPS scales with device batch capacity instead of
per-dispatch latency; a request that poisons a merged dispatch (id
range, fused pool exhaustion) is isolated by solo retry so the others
still answer. One process serves one chip; load-balance above. Start
from the CLI:

    python -m mfx.cli serve --checkpoint ckpt/ --port 8080 \
        --dataset ml-25m --fused

The reference snapshot ships no serving code (/root/reference/
README.md:1-2); this is the canonical deployment surface of the model
family.
"""

from __future__ import annotations

import json
import queue
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

__all__ = ["RecServer"]


class RecServer:
    """HTTP wrapper over a recommender (TopK/Fused/Sharded — anything
    with ``recommend(users, k)``) and optionally a related-items
    function ``similar(items, k)``.

    >>> srv = RecServer(rec, port=8080)
    >>> srv.start()            # serves in a background thread
    >>> srv.stop()
    """

    def __init__(
        self, recommender, similar=None, cold=None, raw_item_ids=None,
        host: str = "127.0.0.1", port: int = 8080, max_k: int = 1000,
        max_batch: int = 4096, batch_window_ms: float = 2.0,
    ):
        self._rec = recommender
        self._sim = similar
        self._cold = cold
        self._raw = raw_item_ids
        self._lock = threading.Lock()
        self._max_k = max_k
        self._max_batch = max_batch
        # cross-request micro-batching: concurrent /recommend requests
        # that arrive within the window ride ONE device dispatch (the
        # scoring matmul is batched over users anyway — QPS then scales
        # with device batch capacity, not per-dispatch latency)
        self._window = max(0.0, batch_window_ms) / 1e3
        self._q: "queue.SimpleQueue" = queue.SimpleQueue()
        self._batcher: threading.Thread | None = None
        self._closed = False
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet by default
                pass

            def _reply(self, code: int, obj) -> None:
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path != "/healthz":
                    return self._reply(404, {"error": "unknown path"})
                m = outer._rec.model
                self._reply(200, {
                    "status": "ok",
                    "num_users": int(m.num_users),
                    "num_items": int(m.num_items),
                    "rank": int(m.rank),
                    "recommender": type(outer._rec).__name__,
                })

            def do_POST(self):
                # every malformed input must come back as HTTP 400, never
                # a connection reset from an escaped exception
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(n) or b"{}")
                    if not isinstance(req, dict):
                        raise ValueError("body must be a JSON object")
                    k = int(req.get("k", 10))
                except (ValueError, TypeError, json.JSONDecodeError) as e:
                    return self._reply(400, {"error": f"bad request: {e}"})
                if not 1 <= k <= outer._max_k:
                    return self._reply(
                        400, {"error": f"k must be in [1, {outer._max_k}]"}
                    )
                try:
                    if self.path == "/recommend":
                        return self._reply(200, outer._recommend(req, k))
                    if self.path == "/similar":
                        if outer._sim is None:
                            return self._reply(
                                404, {"error": "similar endpoint disabled"}
                            )
                        return self._reply(200, outer._similar(req, k))
                    if self.path == "/recommend_cold":
                        if outer._cold is None:
                            return self._reply(
                                404,
                                {"error": "cold-start endpoint disabled"},
                            )
                        return self._reply(
                            200, outer._recommend_cold(req, k)
                        )
                except (ValueError, TypeError) as e:
                    # id range / pool exhaustion / malformed lists
                    return self._reply(400, {"error": str(e)})
                except Exception as e:  # device failure etc. — still reply
                    return self._reply(
                        500, {"error": f"{type(e).__name__}: {e}"}
                    )
                return self._reply(404, {"error": "unknown path"})

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread: threading.Thread | None = None

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    def _ids(self, req, key):
        ids = req.get(key)
        if (not isinstance(ids, list) or not ids
                or len(ids) > self._max_batch):
            raise ValueError(
                f"'{key}' must be a non-empty list (<= {self._max_batch})"
            )
        return np.asarray(ids, np.int32)

    @staticmethod
    def _json_scores(scores):
        # -inf (a seen item overflowing k on the stock path) is not valid
        # JSON (RFC 8259 has no Infinity) — serialize as null
        return [
            [float(s) if np.isfinite(s) else None for s in row]
            for row in scores
        ]

    def _recommend(self, req, k: int) -> dict:
        users = self._ids(req, "users")
        items, scores = self._submit(users, k)
        out = {
            "users": [int(u) for u in users],
            "items": items.tolist(),
            "scores": self._json_scores(scores),
        }
        if self._raw is not None:
            out["raw_items"] = [
                [int(self._raw[i]) for i in row] for row in items
            ]
        return out

    # ---- cross-request micro-batching --------------------------------

    def _submit(self, users: np.ndarray, k: int):
        """Enqueue a request for the batcher and wait for its slice."""
        if self._closed:
            raise RuntimeError("server is shutting down")
        box: dict = {}
        done = threading.Event()
        self._q.put((users, k, box, done))
        done.wait()
        if "error" in box:
            raise box["error"]
        return box["items"], box["scores"]

    def _drain(self) -> None:
        import time

        while True:
            first = self._q.get()
            if first is None:
                return
            batch = [first]
            # collect whatever else arrives within the window (or is
            # already queued because the device was busy). The window is
            # a TOTAL deadline from the first request, not an idle-gap
            # timer — steady sub-window arrivals must not starve it.
            if self._window > 0:
                deadline = time.monotonic() + self._window
                while len(batch) < 64:
                    left = deadline - time.monotonic()
                    if left <= 0:
                        break
                    try:
                        nxt = self._q.get(timeout=left)
                    except queue.Empty:
                        break
                    if nxt is None:
                        self._q.put(None)  # re-arm shutdown
                        break
                    batch.append(nxt)
            # group by k (one compiled program per k)
            groups: dict[int, list] = {}
            for item in batch:
                groups.setdefault(item[1], []).append(item)
            for k, grp in groups.items():
                users_cat = np.concatenate([g[0] for g in grp])
                try:
                    with self._lock:
                        items, scores = self._rec.recommend(users_cat, k=k)
                    off = 0
                    for users, _, box, done in grp:
                        n = len(users)
                        box["items"] = items[off:off + n]
                        box["scores"] = scores[off:off + n]
                        off += n
                        done.set()
                except Exception:
                    # one request's data can poison a merged dispatch
                    # (e.g. fused pool exhaustion) — isolate by retrying
                    # each request alone so innocents still get results.
                    # EVERY box gets an answer or an error and EVERY done
                    # fires: an escaped exception here would kill the
                    # batcher thread and hang all future requests.
                    for users, _, box, done in grp:
                        try:
                            with self._lock:
                                box["items"], box["scores"] = (
                                    self._rec.recommend(users, k=k)
                                )
                        except Exception as e:
                            box["error"] = e
                        done.set()

    def _recommend_cold(self, req, k: int) -> dict:
        """Anonymous/new-user serving: the body carries histories of
        [item_id, rating] pairs; each folds into a factor row
        (mfx.serve.foldin.recommend_cold) — no table mutation."""
        hs = req.get("histories")
        if (not isinstance(hs, list) or not hs
                or len(hs) > self._max_batch):
            raise ValueError(
                f"'histories' must be a non-empty list (<= {self._max_batch})"
            )
        histories = []
        for h in hs:
            if not isinstance(h, list):
                raise ValueError(
                    "each history must be a list of [item_id, rating] pairs"
                )
            ids = np.asarray([p[0] for p in h], np.int32)
            rs = np.asarray([p[1] for p in h], np.float32)
            histories.append((ids, rs))
        with self._lock:
            items, scores = self._cold(histories, k)
        out = {
            "items": items.tolist(),
            "scores": self._json_scores(scores),
        }
        if self._raw is not None:
            out["raw_items"] = [
                [int(self._raw[i]) for i in row] for row in items
            ]
        return out

    def _similar(self, req, k: int) -> dict:
        queries = self._ids(req, "items")
        with self._lock:
            nbrs, cos = self._sim(queries, k)
        return {
            "items": [int(q) for q in queries],
            "similar": nbrs.tolist(),
            "cosine": self._json_scores(cos),
        }

    def _start_batcher(self) -> None:
        if self._batcher is None:
            self._batcher = threading.Thread(target=self._drain, daemon=True)
            self._batcher.start()

    def start(self) -> None:
        self._start_batcher()
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()

    def serve_forever(self) -> None:
        self._start_batcher()
        self._httpd.serve_forever()

    def stop(self) -> None:
        self._closed = True  # new submissions fail fast from here on
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)
        if self._batcher is not None:
            self._q.put(None)
            self._batcher.join(timeout=5)
            self._batcher = None
        # a handler that slipped its request in after the sentinel must
        # not block forever on done.wait()
        while not self._q.empty():
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                break
            if item is not None:
                _, _, box, done = item
                box["error"] = RuntimeError("server is shutting down")
                done.set()
