"""Minimal HTTP posterior server over exported artifacts (stdlib only).

The reference's only "serving" story was re-running a training script to dump
txt files (``AR.py:323-362``); this serves frozen posterior artifacts
(serving/export.py) over JSON — one bundle or MANY (multi-model routing).

Endpoints (single-model form; every POST body is JSON):
  GET  /healthz                     -> artifact metadata
  GET  /metrics                     -> Prometheus text: request counts by
                                       endpoint/code, cache hits, device
                                       execution seconds
  POST /sample_theta {"seed": int}  -> {"theta": [[...], ...]}  (n_theta, D)
  POST /sample_paths {"seed": int}  -> {"paths": [[[...]]]}     (p, dims, T)
                                       (series bundles: (num_series, dims, T))
  POST /forecast     {"seed": int}  -> {"forecast": [[[...]]]}  (p, [dims,] H)
                                       (bundles exported with forecast_horizon)
  POST /batch {"endpoint": "...", "seeds": [ints]}
                                    -> {"results": [resp, ...]} executed
                                       back-to-back on device (one queue pass)

Multi-model: construct with a dict ``{name: artifacts}`` (or pass several
``name=dir`` args on the CLI). Adds:
  GET  /models                       -> {"models": {name: meta, ...}}
  GET  /models/<name>/healthz        and
  POST /models/<name>/<endpoint>     -> as above, routed to that bundle
The bare single-model routes keep working when exactly one model is loaded.

Request options (any POST):
  "format": "b64"  -> arrays returned as {"b64": ..., "shape": ..., "dtype":
  ...} (base64 of the raw little-endian buffer) instead of nested JSON lists —
  ~20x smaller encode cost for large path tensors.

Exported artifacts are pure functions of the seed, so responses are memoised
in a small LRU keyed by (model, endpoint, seed) — repeat seeds never touch
the device (``cache_size`` entries, 0 disables).

Usage:
  srv = PosteriorServer(load_artifacts("out/artifacts"), port=0)
  srv = PosteriorServer({"ar1": arts_a, "lv": arts_b}, port=0)
  srv.start()
  POST http://127.0.0.1:{srv.port}/sample_theta {"seed": 0}
  srv.stop()

CLI: ``python -m viforssms_tpu.serving.server <dir> [port]`` or
``python -m viforssms_tpu.serving.server name1=dir1 name2=dir2 [port]``.
"""

from __future__ import annotations

import base64
import json
import threading
import time
from collections import OrderedDict
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from viforssms_tpu.serving.export import PosteriorArtifacts, load_artifacts

_ENDPOINTS = ("sample_theta", "sample_paths", "forecast")
_FIELD = {"sample_theta": "theta", "sample_paths": "paths",
          "forecast": "forecast"}


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


class _Metrics:
    """Tiny lock-protected counters, rendered in Prometheus text format."""

    def __init__(self):
        self._lock = threading.Lock()
        self.requests = {}       # (endpoint, code) -> count
        self.cache_hits = {}     # endpoint -> count
        self.device_calls = {}   # endpoint -> count
        self.device_seconds = {}  # endpoint -> total seconds

    def count_request(self, endpoint: str, code: int):
        with self._lock:
            k = (endpoint, code)
            self.requests[k] = self.requests.get(k, 0) + 1

    def count_cache_hit(self, endpoint: str):
        with self._lock:
            self.cache_hits[endpoint] = self.cache_hits.get(endpoint, 0) + 1

    def count_device(self, endpoint: str, seconds: float):
        with self._lock:
            self.device_calls[endpoint] = self.device_calls.get(endpoint, 0) + 1
            self.device_seconds[endpoint] = (
                self.device_seconds.get(endpoint, 0.0) + seconds)

    def render(self) -> str:
        with self._lock:
            lines = ["# TYPE viforssms_requests_total counter"]
            for (ep, code), v in sorted(self.requests.items()):
                lines.append(
                    f'viforssms_requests_total{{endpoint="{ep}",code="{code}"}} {v}')
            lines.append("# TYPE viforssms_cache_hits_total counter")
            for ep, v in sorted(self.cache_hits.items()):
                lines.append(f'viforssms_cache_hits_total{{endpoint="{ep}"}} {v}')
            lines.append("# TYPE viforssms_device_executions_total counter")
            for ep, v in sorted(self.device_calls.items()):
                lines.append(
                    f'viforssms_device_executions_total{{endpoint="{ep}"}} {v}')
            lines.append("# TYPE viforssms_device_seconds_total counter")
            for ep, v in sorted(self.device_seconds.items()):
                lines.append(
                    f'viforssms_device_seconds_total{{endpoint="{ep}"}} {v:.6f}')
            return "\n".join(lines) + "\n"


class PosteriorServer:
    def __init__(self, artifacts, host: str = "127.0.0.1",
                 port: int = 0, cache_size: int = 64):
        if isinstance(artifacts, PosteriorArtifacts):
            models = {"default": artifacts}
        else:
            models = dict(artifacts)
            if not models:
                raise ValueError("no artifacts given")
        self.models = models
        # the bare (single-model) routes resolve only when unambiguous
        sole = next(iter(models)) if len(models) == 1 else None
        # one device execution at a time: exported calls are cheap to queue
        # and the single-chip backend must not be hit concurrently
        lock = threading.Lock()
        cache: "OrderedDict[tuple, np.ndarray]" = OrderedDict()
        cache_lock = threading.Lock()
        metrics = _Metrics()
        self.metrics = metrics

        def run_endpoint(name: str, kind: str, seed: int) -> np.ndarray:
            """Device execution with seed-keyed memoisation (artifacts are
            deterministic in the seed, so this is exact)."""
            arts = models.get(name)
            if arts is None:
                raise KeyError(f"unknown model {name!r}")
            key = (name, kind, seed)
            if cache_size > 0:
                with cache_lock:
                    if key in cache:
                        cache.move_to_end(key)
                        metrics.count_cache_hit(kind)
                        return cache[key]
            t0 = time.perf_counter()
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
            metrics.count_device(kind, time.perf_counter() - t0)
            if cache_size > 0:
                with cache_lock:
                    cache[key] = out
                    while len(cache) > cache_size:
                        cache.popitem(last=False)
            return out

        def route(path: str):
            """-> (model_name or None, tail) — resolves /models/<name>/..."""
            parts = [s for s in path.split("/") if s]
            if len(parts) >= 2 and parts[0] == "models":
                return parts[1], "/".join(parts[2:])
            return sole, "/".join(parts)

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # silent by default
                pass

            def _json(self, code, obj, endpoint="other"):
                metrics.count_request(endpoint, code)
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/metrics":
                    body = metrics.render().encode()
                    metrics.count_request("metrics", 200)
                    self.send_response(200)
                    self.send_header("Content-Type",
                                     "text/plain; version=0.0.4")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                    return
                if self.path == "/models":
                    self._json(200, {"models": {n: a.meta
                                                for n, a in models.items()}},
                               "models")
                    return
                name, tail = route(self.path)
                if tail == "healthz":
                    arts = models.get(name)
                    if arts is None:
                        self._json(404, {"error": f"unknown model {name!r}"},
                                   "healthz")
                    else:
                        self._json(200, {"status": "ok", "meta": arts.meta},
                                   "healthz")
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
                name, kind = route(self.path)
                try:
                    if kind in _ENDPOINTS:
                        out = run_endpoint(name, kind, seed)
                        self._json(200, _encode(_FIELD[kind], out, fmt), kind)
                    elif kind == "batch":
                        sub = str(req.get("endpoint", ""))
                        seeds = [int(s) for s in req.get("seeds", [])]
                        if sub not in _ENDPOINTS:
                            self._json(400,
                                       {"error": f"unknown endpoint {sub!r}"},
                                       "batch")
                            return
                        results = [
                            _encode(_FIELD[sub], run_endpoint(name, sub, s), fmt)
                            for s in seeds
                        ]
                        self._json(200, {"results": results}, "batch")
                    else:
                        self._json(404, {"error": "unknown path"})
                except KeyError as e:  # missing model / artifact / endpoint
                    self._json(404, {"error": str(e.args[0])}, kind or "other")
                except Exception as e:  # execution failure
                    self._json(500, {"error": str(e)}, kind or "other")

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.host = host
        self.port = self._httpd.server_address[1]
        self._thread = None

    @property
    def artifacts(self):
        """The sole bundle (single-model servers), for back-compat."""
        if len(self.models) == 1:
            return next(iter(self.models.values()))
        raise AttributeError("multi-model server: use .models[name]")

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

    from viforssms_tpu.core.platform import apply_platform_env

    apply_platform_env()
    argv = sys.argv[1:] if argv is None else argv
    if not argv:
        print("usage: python -m viforssms_tpu.serving.server "
              "<artifact_dir>|name=dir [name2=dir2 ...] [port]")
        return 2
    port = 8000
    if len(argv) > 1 and argv[-1].isdigit():
        port = int(argv[-1])
        argv = argv[:-1]
    if len(argv) == 1 and "=" not in argv[0]:
        arts = load_artifacts(argv[0])
    else:
        arts = {}
        for spec in argv:
            name, sep, d = spec.partition("=")
            if not sep:  # bare dir: use its basename as the model name
                d = spec
                name = spec.rstrip("/").rsplit("/", 1)[-1]
            arts[name] = load_artifacts(d)
    srv = PosteriorServer(arts, host="0.0.0.0", port=port)
    names = list(srv.models)
    print(f"serving posterior artifacts ({', '.join(names)}) on :{srv.port}")
    srv.start()
    try:
        threading.Event().wait()
    except KeyboardInterrupt:
        srv.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
