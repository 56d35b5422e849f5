"""Serving: AOT artifact export/load parity + HTTP server round-trip."""

import json
import urllib.request

import jax
import numpy as np
import pytest

from viforssms_tpu.serving import (
    PosteriorServer,
    export_posterior,
    load_artifacts,
    save_artifacts,
)


@pytest.fixture(scope="module")
def trained():
    from __graft_entry__ import _lv_engine

    eng = _lv_engine(target=40, batch_dims=10, p=4, kernel_len=4, no_flows=2,
                     net=(8, 8, 8), feat_window=3, aligned=True)
    state = eng.init(jax.random.key(0))
    state, _ = eng.train_many(state, 5)  # a few steps; serving needs no convergence
    return eng, state.params


@pytest.fixture(scope="module")
def artifacts(trained, tmp_path_factory):
    eng, params = trained
    arts = export_posterior(eng, params, n_theta=64, forecast_horizon=12)
    d = tmp_path_factory.mktemp("artifacts")
    save_artifacts(arts, str(d))
    return load_artifacts(str(d)), eng, params


def test_theta_artifact_matches_live_engine(artifacts):
    arts, eng, params = artifacts
    th = arts.sample_theta(seed=7)
    assert th.shape == (64, eng.model.theta_dim)
    live, _ = eng.theta_flow.apply(
        params["theta"], jax.random.key(7), 64,
        method=type(eng.theta_flow).sample_and_log_prob,
    )
    np.testing.assert_allclose(th, np.asarray(live), rtol=1e-5, atol=1e-5)


def test_path_artifact_matches_live_engine(artifacts):
    arts, eng, params = artifacts
    rows = arts.meta["path_rows"]
    ws = np.asarray(arts.meta["window_starts"], np.int64)
    starts = np.resize(np.repeat(ws, eng.cfg.p), rows).astype(np.int32)
    x = arts.sample_path_windows(seed=3, starts=starts)
    t = eng.eval_terms(params, jax.random.key(3), starts)
    np.testing.assert_allclose(x, np.asarray(t.x), rtol=1e-4, atol=1e-4)


def test_stitched_paths_full_length(artifacts):
    arts, eng, _ = artifacts
    paths = arts.sample_paths(seed=11)
    assert paths.shape == (eng.cfg.p, eng.cfg.flow.flow_dims, eng.spec.target_dims)
    assert np.all(np.isfinite(paths))


def test_forecast_artifact(artifacts):
    arts, eng, _ = artifacts
    fan = arts.sample_forecast(seed=5)
    assert fan.shape == (eng.cfg.p, eng.cfg.flow.flow_dims, 12)
    assert np.all(np.isfinite(fan)) and np.all(fan > 0)  # LV stays positive


def test_http_server_roundtrip(artifacts):
    arts, eng, _ = artifacts
    srv = PosteriorServer(arts, port=0).start()
    try:
        base = f"http://127.0.0.1:{srv.port}"
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok"
        assert health["meta"]["model"] == "LotkaVolterra"

        req = urllib.request.Request(
            f"{base}/sample_theta", data=json.dumps({"seed": 7}).encode(),
            headers={"Content-Type": "application/json"}, method="POST",
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            th = np.asarray(json.loads(r.read())["theta"])
        assert th.shape == (64, eng.model.theta_dim)
        np.testing.assert_allclose(th, arts.sample_theta(7), rtol=1e-6)

        req = urllib.request.Request(
            f"{base}/sample_paths", data=json.dumps({"seed": 2}).encode(),
            headers={"Content-Type": "application/json"}, method="POST",
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            paths = np.asarray(json.loads(r.read())["paths"])
        assert paths.shape == (eng.cfg.p, eng.cfg.flow.flow_dims, eng.spec.target_dims)

        req = urllib.request.Request(
            f"{base}/forecast", data=json.dumps({"seed": 5}).encode(),
            headers={"Content-Type": "application/json"}, method="POST",
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            fan = np.asarray(json.loads(r.read())["forecast"])
        assert fan.shape == (eng.cfg.p, eng.cfg.flow.flow_dims, 12)

        # malformed request -> 400, unknown path -> 404 (clean errors, not crashes)
        req = urllib.request.Request(
            f"{base}/sample_theta", data=b"not json",
            headers={"Content-Type": "application/json"}, method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(f"{base}/nope", timeout=30)
        assert ei.value.code == 404
    finally:
        srv.stop()
