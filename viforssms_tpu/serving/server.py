"""Stdlib-only HTTP server over a loaded posterior artifact bundle.

Serves a trained, frozen posterior (``serving/export.py``) as JSON over HTTP
— no framework code, no model code, no training state needed at serve time.

Endpoints:
  GET  /healthz                     -> artifact metadata
  POST /sample_theta {"seed": int}  -> {"theta": [[...], ...]}  (n_theta, D)
  POST /sample_paths {"seed": int}  -> {"paths": [[[...]]]}     (p, dims, T)
                                       (series bundles: (num_series, dims, T))
  POST /forecast     {"seed": int}  -> {"forecast": [[[...]]]}  (p, [dims,] H)
                                       (bundles exported with forecast_horizon)
  POST /batch {"endpoint": "...", "seeds": [ints]}
                                    -> {"results": [resp, ...]} executed
                                       back-to-back on device (one queue pass)

Request options (any POST):
  "format": "b64"  -> arrays returned as {"b64": ..., "shape": ..., "dtype":
  ...} (base64 of the raw little-endian buffer) instead of nested JSON lists —
  ~20x smaller encode cost for large path tensors.

Exported artifacts are pure functions of the seed, so responses are memoised
in a small LRU keyed by (endpoint, seed) — repeat seeds never touch the
device (``cache_size`` entries, 0 disables).

Usage:
  srv = PosteriorServer(load_artifacts("out/artifacts"), port=0)
  srv.start()            # background thread; srv.port is the bound port
  ...
  srv.stop()

CLI: ``python -m viforssms_tpu.serving.server <artifact_dir> [port]``.
"""

from __future__ import annotations

import base64
import json
import threading
from collections import OrderedDict
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from viforssms_tpu.serving.export import PosteriorArtifacts, load_artifacts

_ENDPOINTS = ("sample_theta", "sample_paths", "forecast")


def _encode(name: str, arr: np.ndarray, fmt: str):
    if fmt == "b64":
        a = np.ascontiguousarray(arr)
        return {name: {
            "b64": base64.b64encode(a.astype("<" + a.dtype.str[1:]).tobytes()).decode(),
            "shape": list(a.shape),
            "dtype": str(a.dtype),
        }}
    return {name: arr.tolist()}


def decode_array(obj) -> np.ndarray:
    """Client-side helper: decode a "b64"-format array field back to numpy."""
    if isinstance(obj, dict) and "b64" in obj:
        buf = base64.b64decode(obj["b64"])
        return np.frombuffer(buf, dtype=obj["dtype"]).reshape(obj["shape"]).copy()
    return np.asarray(obj)


class PosteriorServer:
    def __init__(self, artifacts: PosteriorArtifacts, host: str = "127.0.0.1",
                 port: int = 0, cache_size: int = 64):
        self.artifacts = artifacts
        arts = artifacts
        # one device execution at a time: exported calls are cheap to queue
        # and the single-chip backend must not be hit concurrently
        lock = threading.Lock()
        cache: "OrderedDict[tuple, np.ndarray]" = OrderedDict()
        cache_lock = threading.Lock()

        def run_endpoint(kind: str, seed: int) -> np.ndarray:
            """Device execution with seed-keyed memoisation (artifacts are
            deterministic in the seed, so this is exact)."""
            key = (kind, seed)
            if cache_size > 0:
                with cache_lock:
                    if key in cache:
                        cache.move_to_end(key)
                        return cache[key]
            if kind == "sample_theta":
                with lock:
                    out = arts.sample_theta(seed)
            elif kind == "sample_paths":
                with lock:
                    out = arts.sample_paths(seed)
            elif kind == "forecast":
                if arts.forecast_exp is None:
                    raise KeyError("no forecast artifact "
                                   "(export with forecast_horizon>0)")
                with lock:
                    out = arts.sample_forecast(seed)
            else:
                raise KeyError(f"unknown endpoint {kind!r}")
            if cache_size > 0:
                with cache_lock:
                    cache[key] = out
                    while len(cache) > cache_size:
                        cache.popitem(last=False)
            return out

        _FIELD = {"sample_theta": "theta", "sample_paths": "paths",
                  "forecast": "forecast"}

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # silent by default
                pass

            def _json(self, code, obj):
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    self._json(200, {"status": "ok", "meta": arts.meta})
                else:
                    self._json(404, {"error": "unknown path"})

            def do_POST(self):
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(n) or b"{}")
                    seed = int(req.get("seed", 0))
                    fmt = str(req.get("format", "json"))
                except Exception as e:  # malformed request
                    self._json(400, {"error": str(e)})
                    return
                kind = self.path.lstrip("/")
                try:
                    if kind in _ENDPOINTS:
                        out = run_endpoint(kind, seed)
                        self._json(200, _encode(_FIELD[kind], out, fmt))
                    elif kind == "batch":
                        sub = str(req.get("endpoint", ""))
                        seeds = [int(s) for s in req.get("seeds", [])]
                        if sub not in _ENDPOINTS:
                            self._json(400, {"error": f"unknown endpoint {sub!r}"})
                            return
                        results = [
                            _encode(_FIELD[sub], run_endpoint(sub, s), fmt)
                            for s in seeds
                        ]
                        self._json(200, {"results": results})
                    else:
                        self._json(404, {"error": "unknown path"})
                except KeyError as e:  # missing artifact / endpoint
                    self._json(404, {"error": str(e.args[0])})
                except Exception as e:  # execution failure
                    self._json(500, {"error": str(e)})

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.host = host
        self.port = self._httpd.server_address[1]
        self._thread = None

    def start(self):
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self):
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)


def main(argv=None):
    import sys

    argv = sys.argv[1:] if argv is None else argv
    if not argv:
        print("usage: python -m viforssms_tpu.serving.server <artifact_dir> [port]")
        return 2
    port = int(argv[1]) if len(argv) > 1 else 8000
    srv = PosteriorServer(load_artifacts(argv[0]), host="0.0.0.0", port=port)
    print(f"serving posterior artifacts from {argv[0]} on :{srv.port}")
    srv.start()
    try:
        threading.Event().wait()
    except KeyboardInterrupt:
        srv.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
