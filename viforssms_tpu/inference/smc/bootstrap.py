"""Bootstrap sequential Monte Carlo — unbiased evidence estimates + filtering.

The second gold-standard validator (BASELINE.json; absent from the reference).
One ``lax.scan`` over time; particles are a leading batch axis that shards
across the mesh like the VI particle axis. Systematic resampling is a sorted
inverse-CDF lookup (``searchsorted``), fully vectorized.

For AR(1) the log-evidence estimate is validated against the exact Kalman
evidence in tests/test_smc.py.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


def systematic_resample(key, log_weights):
    """Systematic resampling: returns ancestor indices (N,)."""
    n = log_weights.shape[0]
    w = jax.nn.softmax(log_weights)
    cum = jnp.cumsum(w)
    u = (jax.random.uniform(key, ()) + jnp.arange(n)) / n
    return jnp.clip(jnp.searchsorted(cum, u), 0, n - 1)


class SMCResult(NamedTuple):
    log_evidence: jax.Array
    filter_means: jax.Array   # (T, state_dim) or (T,) for scalar states
    ess: jax.Array            # (T,) effective sample size per step


def bootstrap_filter(
    init_particles,                 # (N, ...) samples from p(x_1 | x_0)? no — x_0 replicated
    transition_sample: Callable,    # (key, x) -> x'
    obs_log_prob: Callable,         # (y, x) -> (N,) log p(y | x)
    ys,                             # (T, ...) observations
    obs_mask,                       # (T,) 1.0 where observed
    key,
) -> SMCResult:
    """Standard bootstrap PF: propagate through the transition prior, weight by
    the observation density on observed steps, systematic-resample each
    weighted step."""
    n = init_particles.shape[0]

    def step(carry, inp):
        particles, log_z, k = carry
        y, m = inp
        k, k_prop, k_res = jax.random.split(k, 3)
        particles = transition_sample(k_prop, particles)
        lw = jnp.where(m > 0, obs_log_prob(y, particles), jnp.zeros(n))
        # evidence increment: log mean weight (0 on unobserved steps)
        log_z = log_z + jnp.where(
            m > 0, jax.nn.logsumexp(lw) - jnp.log(n), 0.0
        )
        w = jax.nn.softmax(lw)
        ess = 1.0 / jnp.sum(w * w)
        mean = jnp.tensordot(w, particles, axes=(0, 0))
        idx = systematic_resample(k_res, lw)
        resampled = jnp.take(particles, idx, axis=0)
        particles = jnp.where(m > 0, resampled, particles)
        return (particles, log_z, k), (mean, ess)

    (particles, log_z, _), (means, ess) = jax.lax.scan(
        step, (init_particles, 0.0, key), (ys, obs_mask)
    )
    return SMCResult(log_evidence=log_z, filter_means=means, ess=ess)
