"""Offline run aggregation — replaces the reference's TensorBoard scraper.

``vis.py`` in the reference walks ~150 per-series TensorBoard event dirs with
``EventAccumulator``, aligns ELBO/elapsed-time curves, and exports ``.npy``
aggregates (``vis.py:9-30,57-140``). Our runs emit JSONL (utils/metrics.py),
so aggregation is a few array ops; runs that also wrote TensorBoard event
files (``MetricWriter(tensorboard=True)``) are scraped with the
dependency-free parser in utils/tensorboard.py — glob either
``**/metrics.jsonl`` or ``**/events.out.tfevents.*``.
"""

from __future__ import annotations

import glob
import os

import numpy as np

from viforssms_tpu.utils.metrics import read_metrics


def _load_curve(path: str, metric: str):
    """(steps, values) for one run file — JSONL or TB event file."""
    if os.path.basename(path).startswith("events.out.tfevents"):
        from viforssms_tpu.utils.tensorboard import read_events

        recs = [(e["step"], e["scalars"][metric]) for e in read_events(path)
                if metric in e.get("scalars", {})]
    else:
        recs = [(r["step"], r[metric]) for r in read_metrics(path)
                if metric in r]
    return recs


def aggregate_runs(run_glob: str, metric: str = "ELBO"):
    """Collect ``metric`` curves from every run file matching ``run_glob``
    (metrics.jsonl or events.out.tfevents.*).

    Returns (steps (T,), values (num_runs, T)) truncated to the shortest run —
    the alignment behavior of ``vis.py:85-122``.
    """
    curves = []
    steps = []
    for path in sorted(glob.glob(run_glob)):
        recs = _load_curve(path, metric)
        if not recs:
            continue
        steps.append(np.array([s for s, _ in recs]))
        curves.append(np.array([v for _, v in recs]))
    if not curves:
        return np.zeros(0), np.zeros((0, 0))
    T = min(len(c) for c in curves)
    return steps[0][:T], np.stack([c[:T] for c in curves])


def export_npy(run_glob: str, out_path: str, metric: str = "ELBO"):
    """Aggregate and save to .npy (vis.py:120-140)."""
    steps, values = aggregate_runs(run_glob, metric)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    np.save(out_path, {"steps": steps, "values": values, "metric": metric},
            allow_pickle=True)
    return steps, values
