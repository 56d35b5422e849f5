"""CLI, metrics writer, checkpoint round-trip, and txt IO tests."""

import json
import os

import jax
import numpy as np
import pytest

from viforssms_tpu.cli.main import DEFAULT_HYPERPARAMETERS, parseparams, run_ar1
from viforssms_tpu.data.generate import generate_ar1
from viforssms_tpu.data.io import load_series, save_series
from viforssms_tpu.utils.checkpoint import Checkpointer
from viforssms_tpu.utils.debug import nonfinite_counts
from viforssms_tpu.utils.metrics import MetricWriter, read_metrics


def test_parseparams_roundtrip(tmp_path):
    f = tmp_path / "hp.txt"
    f.write_text(DEFAULT_HYPERPARAMETERS)
    p = parseparams(str(f))
    assert p["T"] == 5000 and p["impute"] == 1 and p["x0"] == 10.0
    assert p["theta"] == [5.0, 0.5, 3.0]
    assert p["network_dims"] == [50, 50, 50]
    assert p["priors"] == [(0.0, 10.0)] * 3
    assert p["grad_clip"] == 2.5e8


def test_repair_stdout_roundtrips_clean(tmp_path, capsys):
    """`main.py -repair > h.txt` must be directly consumable — the human
    hint goes to stderr and the exit code is 0 (no hand-trimming)."""
    from viforssms_tpu.cli.main import main

    main(["-repair"])  # must not raise SystemExit
    captured = capsys.readouterr()
    assert "Copy the above" not in captured.out
    assert "Copy the above" in captured.err
    f = tmp_path / "hp.txt"
    f.write_text(captured.out)
    p = parseparams(str(f))
    assert p["T"] == 5000 and p["grad_clip"] == 2.5e8


def test_series_io_roundtrip(tmp_path):
    s = generate_ar1(T=50, impute=2, x0=1.0, theta=(1.0, 0.5, 1.0), obs_std=0.5)
    save_series(str(tmp_path), "AR", s)
    obs, obs_bin, tt = load_series(str(tmp_path), "AR")
    np.testing.assert_allclose(obs, s.obs, rtol=1e-5)
    np.testing.assert_allclose(obs_bin, s.obs_bin)
    np.testing.assert_allclose(tt, s.time_till)


def test_metric_writer(tmp_path):
    path = str(tmp_path / "m.jsonl")
    with MetricWriter(path) as w:
        w.write(1, {"ELBO": -10.5})
        w.write(2, {"ELBO": -9.0, "global_norm": 3.0})
    recs = read_metrics(path)
    assert len(recs) == 2 and recs[1]["ELBO"] == -9.0
    assert "elapsed_s" in recs[0]


def test_nonfinite_counts():
    import jax.numpy as jnp

    t = {"a": jnp.array([1.0, jnp.nan]), "b": jnp.array([jnp.inf, 2.0, 3.0])}
    c = nonfinite_counts(t)
    assert c == {"nan": 1, "inf": 1, "total": 5}


@pytest.mark.slow
def test_cli_run_ar1_small(tmp_path):
    params = {
        "T": 100, "impute": 2, "x0": 5.0, "theta": [1.0, 0.8, 1.0], "obs_std": 0.7,
        "p": 8, "kernel_len": 6, "batch_dims": 20, "network_dims": [12, 12, 12],
        "no_flows": 2, "priors": [(0.0, 10.0)] * 3, "feat_window": 3,
        "learn_rate": 1e-3, "grad_clip": 1e4,
    }
    out = str(tmp_path / "out")
    state = run_ar1(params, num_steps=30, out_dir=out)
    assert os.path.exists(os.path.join(out, "metrics.jsonl"))
    assert os.path.exists(os.path.join(out, "AR_obs_paths.txt"))
    theta = np.loadtxt(os.path.join(out, "theta_posterior.txt"))
    assert theta.shape == (100_000, 3)
    recs = read_metrics(os.path.join(out, "metrics.jsonl"))
    assert any("ELBO" in r for r in recs)

    # checkpoint restore round-trips the params
    ckpt = Checkpointer(os.path.join(out, "ckpt"))
    restored = ckpt.restore(state)
    a = jax.tree.leaves(restored.params)
    b = jax.tree.leaves(state.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y, rtol=1e-6)


@pytest.mark.slow
def test_series_sweep_warm_start(tmp_path):
    """Warm-started sweep (each series initialized from the previous one's
    trained params, pre-training only on series 0) completes and writes
    per-series outputs; measured speedup study in docs/RESULTS.md."""
    from viforssms_tpu.cli.experiments import run_series_sweep

    out = tmp_path / "sweep"
    run_series_sweep(out_dir=str(out), num_series=2, target=21, steps=8,
                     pre_train=4, synthetic=True, p=4, warm_start=True,
                     kernel_len=4, no_flows=2, net=(8, 8, 8), feat_window=3)
    for j in range(2):
        assert (out / f"series_{j:04d}" / "paths.txt").exists()
    assert not (out / "failures.txt").exists()


def test_series_sweep_replicated(tmp_path):
    """Replica-packed sweep (round 5): groups of R series train in one
    compiled program; per-series outputs still land in per-series dirs,
    including the padded last group."""
    import json

    from viforssms_tpu.cli.experiments import run_series_sweep

    out = tmp_path / "sweep_rep"
    run_series_sweep(out_dir=str(out), num_series=3, target=21, steps=8,
                     pre_train=4, synthetic=True, p=4,
                     kernel_len=4, no_flows=2, net=(8, 8, 8), feat_window=3,
                     replicas=2)
    import numpy as np
    for j in range(3):
        assert (out / f"series_{j:04d}" / "paths.txt").exists()
        with open(out / f"series_{j:04d}" / "metrics.jsonl") as f:
            rec = json.loads(f.readline())
        assert np.isfinite(rec["ELBO"])
    assert not (out / "failures.txt").exists()
