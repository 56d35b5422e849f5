"""Preemption: SIGTERM sets the guard flag; fit exits at a dispatch boundary."""

import signal

import jax
import numpy as np

from viforssms_tpu.utils.preemption import PreemptionGuard
from tests.test_train_ar1 import _make_engine


def test_guard_sets_flag_on_sigterm_and_restores_handler():
    before = signal.getsignal(signal.SIGTERM)
    with PreemptionGuard(signals=(signal.SIGTERM,)) as guard:
        assert not guard()
        signal.raise_signal(signal.SIGTERM)
        assert guard()
        assert guard.triggered
    assert signal.getsignal(signal.SIGTERM) is before


def test_fit_stops_at_dispatch_boundary():
    eng, _ = _make_engine(fix_theta=True)
    state = eng.init(jax.random.key(0))

    calls = {"n": 0}

    def stop_after_two():
        calls["n"] += 1
        return calls["n"] > 2

    state, last = eng.fit(state, num_steps=1000, scan_chunk=5,
                          should_stop=stop_after_two)
    # two chunks of 5 ran before the flag tripped
    assert int(state.step) == 10
    assert last is not None and np.isfinite(float(last.elbo))

    # python-loop path (scan_chunk=0)
    calls["n"] = 0
    state2 = eng.init(jax.random.key(1))
    state2, _ = eng.fit(state2, num_steps=1000, should_stop=stop_after_two)
    assert int(state2.step) == 2
