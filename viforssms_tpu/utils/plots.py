"""Post-hoc plotting: the reference's notebook/TensorBoard visual checks as
library functions.

The reference validated runs visually — theta histograms in TensorBoard
(``AR.py:217-224``), posterior-path overlays in the notebooks
(``save_samples_fixed_theta.ipynb``) and offline ELBO aggregates
(``vis.py:57-122``). These helpers produce the same three figures from this
framework's artifacts (posterior path arrays, theta sample arrays, JSONL
metric runs). Matplotlib only; the Agg backend is forced so they run headless.
"""

from __future__ import annotations

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_posterior_paths(paths, obs=None, obs_bin=None, dt: float = 1.0,
                         truth=None, out_path: str = "paths.png",
                         quantiles=(0.05, 0.95)):
    """Fan chart of posterior path draws.

    ``paths``: (p, d, T) or (p, T) array of posterior draws
    (``VIEngine.sample_posterior_paths``). ``obs``: (d, T')/(T',) observations
    overlaid at steps where ``obs_bin`` > 0 (all steps if None). ``truth``:
    optional latent trajectory of the same layout as obs.
    """
    plt = _plt()
    paths = np.asarray(paths)
    if paths.ndim == 2:
        paths = paths[:, None, :]
    d = paths.shape[1]
    lo, hi = quantiles
    fig, axes = plt.subplots(d, 1, figsize=(10, 3 * d), squeeze=False)
    t = np.arange(paths.shape[2]) * dt
    for j in range(d):
        ax = axes[j, 0]
        med = np.median(paths[:, j, :], axis=0)
        ql = np.quantile(paths[:, j, :], lo, axis=0)
        qh = np.quantile(paths[:, j, :], hi, axis=0)
        ax.fill_between(t, ql, qh, alpha=0.3, label=f"{int((hi-lo)*100)}% band")
        ax.plot(t, med, lw=1.2, label="posterior median")
        if truth is not None:
            tr = np.asarray(truth)
            tr_j = tr[j] if tr.ndim == 2 else tr
            ax.plot(t[: len(tr_j)], tr_j[: len(t)], "k--", lw=0.8, label="truth")
        if obs is not None:
            ob = np.asarray(obs)
            ob_j = ob[j] if ob.ndim == 2 else ob
            n = min(len(ob_j), len(t))
            if obs_bin is not None:
                bb = np.asarray(obs_bin)
                bb_j = (bb[j] if bb.ndim == 2 else bb)[:n] > 0
            else:
                bb_j = np.ones(n, bool)
            ax.plot(t[:n][bb_j], ob_j[:n][bb_j], ".", ms=3, label="observations")
        ax.set_xlabel("time")
        ax.set_ylabel(f"dim {j}")
        ax.legend(loc="best", fontsize=8)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def plot_theta_posterior(theta, truth=None, names=None,
                         out_path: str = "theta.png", bins: int = 60):
    """Per-coordinate histograms of q(theta) samples (AR.py:217-224's
    TensorBoard histograms, offline). ``theta``: (n, D)."""
    plt = _plt()
    theta = np.asarray(theta)
    D = theta.shape[1]
    fig, axes = plt.subplots(1, D, figsize=(3.2 * D, 3), squeeze=False)
    for i in range(D):
        ax = axes[0, i]
        ax.hist(theta[:, i], bins=bins, density=True, alpha=0.8)
        if truth is not None and i < len(truth):
            ax.axvline(float(truth[i]), color="k", ls="--", lw=1)
        ax.set_title(names[i] if names else f"theta{i}", fontsize=9)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def plot_metric_curves(run_glob: str, metric: str = "ELBO",
                       out_path: str = "elbo.png", logy_neg: bool = False):
    """ELBO/metric curves across runs (the reference's vis.py aggregation,
    plotted). ``run_glob`` matches metrics.jsonl files."""
    plt = _plt()
    from viforssms_tpu.utils.vis import aggregate_runs

    steps, vals = aggregate_runs(run_glob, metric=metric)
    fig, ax = plt.subplots(figsize=(8, 4))
    for i in range(vals.shape[0]):
        v = -vals[i] if logy_neg else vals[i]
        ax.plot(steps, v, lw=0.9, alpha=0.8, label=f"run {i}")
    if logy_neg:
        ax.set_yscale("log")
        ax.set_ylabel(f"-{metric} (log)")
    else:
        ax.set_ylabel(metric)
    ax.set_xlabel("step")
    if vals.shape[0] <= 12:
        ax.legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path
