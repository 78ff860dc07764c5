"""Minimal production-style serving endpoint — stdlib HTTP around the
recommenders (no framework dependencies; the deployment shape described
in docs/SERVING.md).

    POST /recommend  {"users": [3, 17], "k": 10}
    POST /similar    {"items": [1, 7], "k": 10}
    GET  /healthz

Responses are JSON: ``items``/``scores`` per user (plus ``raw_items``
when the loader relabeled the catalog), or ``similar``/``cosine`` per
query item. One request at a time hits the device (a lock serializes
scoring — a single chip is a serial resource; run one process per chip
and load-balance above). Start from the CLI:

    python -m mfx.cli serve --checkpoint ckpt/ --port 8080 \
        --dataset ml-25m --fused

The reference snapshot ships no serving code (/root/reference/
README.md:1-2); this is the canonical deployment surface of the model
family.
"""

from __future__ import annotations

import json
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
        self, recommender, similar=None, raw_item_ids=None,
        host: str = "127.0.0.1", port: int = 8080, max_k: int = 1000,
        max_batch: int = 4096,
    ):
        self._rec = recommender
        self._sim = similar
        self._raw = raw_item_ids
        self._lock = threading.Lock()
        self._max_k = max_k
        self._max_batch = max_batch
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
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(n) or b"{}")
                except (ValueError, json.JSONDecodeError):
                    return self._reply(400, {"error": "bad JSON body"})
                k = int(req.get("k", 10))
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
                except ValueError as e:  # id range / pool exhaustion etc.
                    return self._reply(400, {"error": str(e)})
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

    def _recommend(self, req, k: int) -> dict:
        users = self._ids(req, "users")
        with self._lock:
            items, scores = self._rec.recommend(users, k=k)
        out = {
            "users": [int(u) for u in users],
            "items": items.tolist(),
            "scores": [[float(s) for s in row] for row in scores],
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
            "cosine": [[float(s) for s in row] for row in cos],
        }

    def start(self) -> None:
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()

    def serve_forever(self) -> None:
        self._httpd.serve_forever()

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)
