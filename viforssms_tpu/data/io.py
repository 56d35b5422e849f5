"""Reference-format dataset IO.

Reads/writes the txt triplets the reference trains from: per-series
``*_obs_partial.txt`` (forward-filled observations), ``*_obs_binary.txt``
(indicators), ``*_time_till.txt`` (steps/time until next observation) —
written by ``AR_dat_gen.py:33-43`` and ``save_obs_files.ipynb`` cell 2 — plus
the path/theta sample dumps (``AR.py:323-362``, ``..._learn_theta.py:745-775``).
"""

from __future__ import annotations

import os

import numpy as np

from viforssms_tpu.data.generate import ObservedSeries


def save_series(dat_dir: str, prefix: str, series: ObservedSeries):
    os.makedirs(dat_dir, exist_ok=True)
    np.savetxt(os.path.join(dat_dir, f"{prefix}_obs_partial.txt"), series.obs)
    np.savetxt(os.path.join(dat_dir, f"{prefix}_obs_binary.txt"), series.obs_bin)
    np.savetxt(os.path.join(dat_dir, f"{prefix}_time_till.txt"), series.time_till)


def load_series(dat_dir: str, prefix: str):
    obs = np.loadtxt(os.path.join(dat_dir, f"{prefix}_obs_partial.txt"), np.float32)
    obs_bin = np.loadtxt(os.path.join(dat_dir, f"{prefix}_obs_binary.txt"), np.float32)
    time_till = np.loadtxt(os.path.join(dat_dir, f"{prefix}_time_till.txt"), np.float32)
    return obs, obs_bin, time_till


def load_series_2d(dat_dir: str, prefix: str, unobserved_fill=None):
    """2-row layout (2, N) for LV/FHN; ``unobserved_fill`` replaces -1 markers
    (``..._learn_theta.py:810-812``)."""
    obs, obs_bin, time_till = load_series(dat_dir, prefix)
    if unobserved_fill is not None:
        obs = np.where(obs == -1, unobserved_fill, obs)
    return obs, obs_bin, time_till


def save_paths_txt(path: str, paths: np.ndarray):
    """(p, ...) posterior paths -> one flattened row per particle (AR.py:360-362)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savetxt(path, paths.reshape(paths.shape[0], -1))


def save_theta_txt(path: str, theta: np.ndarray):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savetxt(path, theta)
