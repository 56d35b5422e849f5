"""Genuine multi-process (DCN-analog) execution: two OS processes, each with
4 virtual devices, form one 8-device global mesh and train the sequence-
sharded step with collectives crossing the process boundary."""

import socket
import subprocess
import sys
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "scripts", "multihost_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_sequence_sharded_training():
    port = str(_free_port())
    env = dict(os.environ)
    # workers pin their own platform/device-count env (setdefault), but a
    # pytest-inherited 8-device XLA_FLAGS would double the per-process farm
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen([sys.executable, WORKER, str(i), "2", port, "30"],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env, cwd=REPO)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=500)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert "8 global devices (4 local)" in out, out[-2000:]
        assert "losses agree across processes: True" in out, out[-2000:]
    # both processes must report bit-identical loss trajectories
    lines = [
        [l for l in out.splitlines() if l.startswith("LOSSES")][0]
        for out in outs
    ]
    assert lines[0] == lines[1], lines


@pytest.mark.slow
def test_two_process_series_epoch_training():
    """Series-DP fit_epochs across processes: the particle axis of every
    epoch batch spans the process boundary; gradient means psum over DCN
    (VERDICT round-1 item 4)."""
    port = str(_free_port())
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_PLATFORMS"] = "cpu"
    worker = os.path.join(REPO, "scripts", "multihost_epoch_worker.py")
    procs = [
        subprocess.Popen([sys.executable, worker, str(i), "2", port, "3"],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env, cwd=REPO)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=500)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert "8 global devices (4 local)" in out, out[-2000:]
        assert "losses agree across processes: True" in out, out[-2000:]
    lines = [
        [l for l in out.splitlines() if l.startswith("EPOCH_ELBOS")][0]
        for out in outs
    ]
    assert lines[0] == lines[1], lines
