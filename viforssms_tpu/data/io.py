"""Reference-format dataset IO.

Reads/writes the txt triplets the reference trains from: per-series
``*_obs_partial.txt`` (forward-filled observations), ``*_obs_binary.txt``
(indicators), ``*_time_till.txt`` (steps/time until next observation) —
written by ``AR_dat_gen.py:33-43`` and ``save_obs_files.ipynb`` cell 2 — plus
the path/theta sample dumps (``AR.py:323-362``, ``..._learn_theta.py:745-775``).

All matrix txt IO goes through the native C++ reader/writer
(``viforssms_tpu/native``) — byte-identical to ``np.savetxt``'s default
format and thread-parallel, which matters at the FHN long-series export
scale (~2.5 GB txt); it falls back to NumPy when no compiler is available.
"""

from __future__ import annotations

import os

import numpy as np

from viforssms_tpu.data.generate import ObservedSeries
from viforssms_tpu.native import loadtxt as _loadtxt
from viforssms_tpu.native import savetxt as _savetxt


def save_series(dat_dir: str, prefix: str, series: ObservedSeries):
    os.makedirs(dat_dir, exist_ok=True)
    _savetxt(os.path.join(dat_dir, f"{prefix}_obs_partial.txt"), series.obs)
    _savetxt(os.path.join(dat_dir, f"{prefix}_obs_binary.txt"), series.obs_bin)
    _savetxt(os.path.join(dat_dir, f"{prefix}_time_till.txt"), series.time_till)


def load_series(dat_dir: str, prefix: str):
    obs = _loadtxt(os.path.join(dat_dir, f"{prefix}_obs_partial.txt")).astype(np.float32)
    obs_bin = _loadtxt(os.path.join(dat_dir, f"{prefix}_obs_binary.txt")).astype(np.float32)
    time_till = _loadtxt(os.path.join(dat_dir, f"{prefix}_time_till.txt")).astype(np.float32)
    return obs, obs_bin, time_till


def load_series_2d(dat_dir: str, prefix: str, unobserved_fill=None):
    """2-row layout (2, N) for LV/FHN; ``unobserved_fill`` replaces -1 markers
    (``..._learn_theta.py:810-812``)."""
    obs, obs_bin, time_till = load_series(dat_dir, prefix)
    if unobserved_fill is not None:
        obs = np.where(obs == -1, unobserved_fill, obs)
    return obs, obs_bin, time_till


def convert_pt_dataset(pt_path: str, out_dir: str, prefix: str = "LV", dt: float = 0.2):
    """Convert a torch ``.pt`` dataset ``(theta, x, y, y_idx)`` into the txt
    triplet layout — the semantics of ``save_obs_files.ipynb`` cell 2:
    observations flattened to (2, N*T) with -1 at unobserved steps, binary
    indicators, and time-till-next-observation in TIME units (* dt)."""
    import torch  # cpu build available in the image

    theta, x, y, y_idx = torch.load(pt_path, map_location="cpu", weights_only=False)
    y = np.asarray(y)          # (N, T_obs, 2) observed values
    y_idx = np.asarray(y_idx)  # (N, T_obs) observed step indices
    n_series = y.shape[0]
    T = int(np.asarray(x).shape[1]) - 1 if np.asarray(x).ndim >= 2 else int(y_idx.max()) + 1

    obs = -np.ones((2, n_series * T), np.float32)
    obs_bin = np.zeros((2, n_series * T), np.float32)
    time_till = np.zeros((2, n_series * T), np.float32)
    for j in range(n_series):
        base = j * T
        for k, t_idx in enumerate(np.asarray(y_idx[j], np.int64)):
            if 0 <= t_idx < T:
                obs[:, base + t_idx] = y[j, k]
                obs_bin[:, base + t_idx] = 1.0
        nxt = 0
        for t in range(T - 1, -1, -1):
            nxt = 0 if obs_bin[0, base + t] == 1.0 else nxt + 1
            time_till[:, base + t] = nxt * dt
    os.makedirs(out_dir, exist_ok=True)
    _savetxt(os.path.join(out_dir, f"{prefix}_obs_partial.txt"), obs)
    _savetxt(os.path.join(out_dir, f"{prefix}_obs_binary.txt"), obs_bin)
    _savetxt(os.path.join(out_dir, f"{prefix}_time_till.txt"), time_till)
    _savetxt(os.path.join(out_dir, f"{prefix}_theta.txt"), np.asarray(theta).reshape(n_series, -1))
    return obs, obs_bin, time_till


def save_paths_txt(path: str, paths: np.ndarray):
    """(p, ...) posterior paths -> one flattened row per particle (AR.py:360-362)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    _savetxt(path, paths.reshape(paths.shape[0], -1))


def save_theta_txt(path: str, theta: np.ndarray):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    _savetxt(path, theta)
