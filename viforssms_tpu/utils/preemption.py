"""Preemption handling: turn SIGTERM/SIGINT into a clean training stop.

The reference's only fault tolerance is try/except-continue around whole
series (``lotka_volterra_latest.py:708-715``). For production TPU jobs the
failure that actually matters is preemption: the scheduler sends SIGTERM and
the job has seconds to leave a resumable checkpoint. ``PreemptionGuard`` is a
zero-arg callable suitable for ``VIEngine.fit(..., should_stop=guard)``: the
loop exits at the next dispatch boundary and the driver checkpoints the
returned state, which ``--resume`` then restores.
"""

from __future__ import annotations

import signal


class PreemptionGuard:
    """Context manager installing signal handlers that set a stop flag.

    Usage::

        with PreemptionGuard() as guard:
            state, last = eng.fit(state, steps, should_stop=guard)
        if guard.triggered:
            ...  # checkpoint + exit

    A second signal while the flag is already set re-raises the default
    behavior (so a stuck job can still be killed with a repeated Ctrl-C).
    """

    def __init__(self, signals=(signal.SIGTERM, signal.SIGINT)):
        self._signals = signals
        self._previous = {}
        self.triggered = False

    def _handler(self, signum, frame):
        if self.triggered:  # second signal: defer to the previous handler
            prev = self._previous.get(signum)
            if callable(prev):
                prev(signum, frame)
            else:
                signal.signal(signum, signal.SIG_DFL)
                signal.raise_signal(signum)
            return
        self.triggered = True

    def __call__(self) -> bool:
        return self.triggered

    def __enter__(self):
        for s in self._signals:
            self._previous[s] = signal.signal(s, self._handler)
        return self

    def __exit__(self, *exc):
        for s, prev in self._previous.items():
            signal.signal(s, prev)
        return False
