"""Adamax as an optax gradient transformation.

Re-implements the update rule of the reference's custom optimizer
(``optimisers/adamax.py:42-58``, itself from the OpenAI IAF repo):

    v <- beta1 * v + (1 - beta1) * g
    m <- max(beta2 * m + eps, |g|)
    param <- param - lr * v / m

Note this differs from ``optax.adamax`` (no bias correction; eps enters
through the max), so we port the exact rule for training-dynamics parity.
The update is invariant to loss scaling (v and m scale together), so using
the particle-MEAN loss where the reference differentiates the particle SUM
changes nothing except the operating point of the (huge, rarely-binding)
global-norm clip thresholds.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class AdamaxState(NamedTuple):
    v: optax.Updates  # first moment (EMA of gradients)
    m: optax.Updates  # exponentially-decayed infinity norm


def adamax(
    learning_rate: float = 1e-3,
    beta1: float = 0.9,
    beta2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    def init_fn(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return AdamaxState(v=zeros, m=jax.tree.map(jnp.zeros_like, params))

    def update_fn(updates, state, params=None):
        del params
        v = jax.tree.map(lambda v_, g: beta1 * v_ + (1.0 - beta1) * g, state.v, updates)
        m = jax.tree.map(
            lambda m_, g: jnp.maximum(beta2 * m_ + eps, jnp.abs(g)), state.m, updates
        )
        new_updates = jax.tree.map(lambda v_, m_: -learning_rate * v_ / m_, v, m)
        return new_updates, AdamaxState(v=v, m=m)

    return optax.GradientTransformation(init_fn, update_fn)


def clipped_adamax(
    learning_rate: float = 1e-3,
    beta1: float = 0.95,
    beta2: float = 0.999,
    grad_clip: float = 2.5e8,
    flat: bool = True,
) -> optax.GradientTransformation:
    """Global-norm clip then Adamax — the reference training op
    (``AR.py:226-236``: clip_by_global_norm at grad_clip, Adamax beta1=0.95).

    ``flat=True`` (default) runs the chain on a single raveled parameter
    vector (``optax.flatten``). Identical math, but the per-leaf formulation
    costs ~300 tiny device ops per step on a ~100-leaf flow pytree (norm
    reduce + clip scale + 4 Adamax elementwise ops per leaf), which at
    LV-partial scale was ~20% of the whole train step on v5e (profiled in
    docs/RESULTS.md); the flat form is ~10 fused ops total.
    """
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        adamax(learning_rate=learning_rate, beta1=beta1, beta2=beta2),
    )
    return optax.flatten(tx) if flat else tx
