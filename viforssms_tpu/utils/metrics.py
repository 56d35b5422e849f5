"""Metric writer: JSONL stream with the reference's TensorBoard scalar names.

The reference logs ELBO and its decomposition (SDE/obs/path/theta/prior
log-probs, gradient global-norm) plus wall-clock per batch/epoch
(``AR.py:206-215``, ``..._learn_theta.py:492-597,704-727``). We keep the same
metric names so runs can be compared 1:1, written as line-delimited JSON that
``vis``-style offline tooling (utils/vis.py) aggregates — replacing the
reference's TensorBoard-scraping ``vis.py``.
"""

from __future__ import annotations

import json
import os
import time
from typing import Mapping


class MetricWriter:
    """JSONL metric stream, optionally teed to a TensorBoard event file.

    With ``tensorboard=True`` every scalar also lands in an
    ``events.out.tfevents.*`` file next to the JSONL (utils/tensorboard.py),
    so runs can be compared against the reference's TensorBoard logs in the
    same UI.
    """

    def __init__(self, path: str, tensorboard: bool | None = None):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._f = open(path, "a", buffering=1)
        self._t0 = time.time()
        self._tb = None
        if tensorboard is None:  # drivers enable globally via the env knob
            tensorboard = os.environ.get("VIFORSSMS_TENSORBOARD", "") == "1"
        if tensorboard:
            from viforssms_tpu.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(os.path.dirname(path) or ".")

    def write(self, step: int, metrics: Mapping[str, float]):
        rec = {"step": int(step), "elapsed_s": round(time.time() - self._t0, 4)}
        for k, v in metrics.items():
            rec[k] = float(v)
        self._f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            self._tb.add_scalars({k: float(v) for k, v in metrics.items()}, step)

    def write_histogram(self, step: int, tag: str, values):
        """Per-coordinate theta histograms (AR.py:217-224); TB sink only."""
        if self._tb is not None:
            self._tb.add_histogram(tag, values, step)

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_metrics(path: str):
    """Load a JSONL metrics file into a list of dicts (vis.py replacement)."""
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(json.loads(line))
    return out
