"""Stdlib-only HTTP server over a loaded posterior artifact bundle.

Serves a trained, frozen posterior (``serving/export.py``) as JSON over HTTP
— no framework code, no model code, no training state needed at serve time.

Endpoints:
  GET  /healthz                     -> artifact metadata
  POST /sample_theta {"seed": int}  -> {"theta": [[...], ...]}  (n_theta, D)
  POST /sample_paths {"seed": int}  -> {"paths": [[[...]]]}     (p, dims, T)
  POST /forecast     {"seed": int}  -> {"forecast": [[[...]]]}  (p, [dims,] H)
                                       (bundles exported with forecast_horizon)

Usage:
  srv = PosteriorServer(load_artifacts("out/artifacts"), port=0)
  srv.start()            # background thread; srv.port is the bound port
  ...
  srv.stop()

CLI: ``python -m viforssms_tpu.serving.server <artifact_dir> [port]``.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from viforssms_tpu.serving.export import PosteriorArtifacts, load_artifacts


class PosteriorServer:
    def __init__(self, artifacts: PosteriorArtifacts, host: str = "127.0.0.1",
                 port: int = 0):
        self.artifacts = artifacts
        arts = artifacts
        # one device execution at a time: exported calls are cheap to queue
        # and the single-chip backend must not be hit concurrently
        lock = threading.Lock()

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
                except Exception as e:  # malformed request
                    self._json(400, {"error": str(e)})
                    return
                try:
                    if self.path == "/sample_theta":
                        with lock:
                            th = arts.sample_theta(seed)
                        self._json(200, {"theta": th.tolist()})
                    elif self.path == "/sample_paths":
                        with lock:
                            x = arts.sample_paths(seed)
                        self._json(200, {"paths": x.tolist()})
                    elif self.path == "/forecast":
                        if arts.forecast_exp is None:
                            self._json(404, {"error": "no forecast artifact "
                                             "(export with forecast_horizon>0)"})
                            return
                        with lock:
                            x = arts.sample_forecast(seed)
                        self._json(200, {"forecast": x.tolist()})
                    else:
                        self._json(404, {"error": "unknown path"})
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
