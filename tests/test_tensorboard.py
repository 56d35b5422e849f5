"""Tests for the dependency-free TensorBoard event writer.

Validates the wire format three ways: CRC32C against the known check vector,
round-trip through our own parser, and (when the tensorboard package is
importable) through TensorBoard's real EventAccumulator — the same reader the
reference's ``vis.py:9-30`` scrapes runs with.
"""

import glob
import os

import numpy as np
import pytest

from viforssms_tpu.utils.tensorboard import (
    SummaryWriter,
    crc32c,
    read_events,
)


def test_crc32c_check_vector():
    # RFC 3720 / Castagnoli standard check value.
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0


def _write_sample_run(logdir):
    with SummaryWriter(logdir) as w:
        w.add_scalar("ELBO", -123.5, step=0)
        w.add_scalars({"ELBO": -100.0, "SDE Log Prob": -40.25}, step=1)
        w.add_histogram("theta_0", np.array([1.0, 2.0, 3.0, -1.0]), step=1)
    files = glob.glob(os.path.join(logdir, "events.out.tfevents.*"))
    assert len(files) == 1
    return files[0]


def test_roundtrip_own_reader(tmp_path):
    path = _write_sample_run(str(tmp_path))
    events = read_events(path)  # verifies CRCs
    assert events[0]["file_version"] == "brain.Event:2"
    scalars = [e for e in events if "scalars" in e]
    assert scalars[0]["scalars"]["ELBO"] == pytest.approx(-123.5)
    assert scalars[0]["step"] == 0
    assert scalars[1]["scalars"]["SDE Log Prob"] == pytest.approx(-40.25)
    assert scalars[1]["step"] == 1
    hists = [e for e in events if "histograms" in e]
    num, total = hists[0]["histograms"]["theta_0"]
    assert num == 4.0
    assert total == pytest.approx(5.0)


def test_real_event_accumulator(tmp_path):
    ea_mod = pytest.importorskip(
        "tensorboard.backend.event_processing.event_accumulator")
    path = _write_sample_run(str(tmp_path))
    acc = ea_mod.EventAccumulator(path)
    acc.Reload()
    assert "ELBO" in acc.Tags()["scalars"]
    elbo = acc.Scalars("ELBO")
    assert [e.step for e in elbo] == [0, 1]
    assert elbo[0].value == pytest.approx(-123.5)
    assert "theta_0" in acc.Tags()["histograms"]
    h = acc.Histograms("theta_0")[0].histogram_value
    assert h.num == 4.0
    assert h.sum == pytest.approx(5.0)
    assert h.min == -1.0 and h.max == 3.0
    # bucket counts must cover all 4 values
    assert sum(h.bucket) == 4.0
