"""PRNG-key discipline.

The reference seeds two global RNGs once (``AR.py:18-19``) and relies on
session-level statefulness. Here every stochastic function takes an explicit
``jax.random`` key; these helpers keep call-sites tidy.
"""

from __future__ import annotations

import jax


def key_seq(key, n: int):
    """Split ``key`` into ``n`` independent keys (as a list)."""
    return list(jax.random.split(key, n))


def split_like(key, tree):
    """Split ``key`` into one key per leaf of ``tree`` (same treedef)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    keys = jax.random.split(key, len(leaves))
    return jax.tree_util.tree_unflatten(treedef, list(keys))
