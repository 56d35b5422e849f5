"""Checkpoint/resume via Orbax — sharded-aware params + optimizer + PRNG + step.

Replaces ``tf.train.Saver`` periodic saves (``AR.py:307-315``); restoring
skips pre-training exactly like the reference's ``load()`` (``AR.py:317-321``)
because the full optimizer state and step counter round-trip.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


class Checkpointer:
    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir, options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep)
        )

    @staticmethod
    def _unwrap_keys(tree):
        """Typed PRNG keys -> raw uint32 data (checkpointable)."""
        return jax.tree.map(
            lambda x: jax.random.key_data(x)
            if hasattr(x, "dtype") and jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key)
            else x,
            tree,
        )

    @staticmethod
    def _rewrap_like(tree, like):
        return jax.tree.map(
            lambda x, l: jax.random.wrap_key_data(x)
            if hasattr(l, "dtype") and jax.dtypes.issubdtype(l.dtype, jax.dtypes.prng_key)
            else x,
            tree,
            like,
        )

    def save(self, state, step: Optional[int] = None):
        import orbax.checkpoint as ocp

        step = int(state.step) if step is None else int(step)
        self._mgr.save(step, args=ocp.args.StandardSave(self._unwrap_keys(state)))
        self._mgr.wait_until_finished()

    def restore(self, abstract_state) -> Any:
        """Restore the latest checkpoint into the structure of ``abstract_state``."""
        import orbax.checkpoint as ocp

        step = self._mgr.latest_step()
        if step is None:
            return None
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(self._unwrap_keys(abstract_state))
        )
        return self._rewrap_like(restored, abstract_state)

    @property
    def latest_step(self):
        return self._mgr.latest_step()
