"""Mesh-sharded bootstrap SMC.

Particles shard across a mesh axis (the ``particles``/``chains`` DP axis,
BASELINE.json: "SMC resampling weights ... reduced by jax.lax.psum"):

  * propagation and weighting are purely local;
  * the evidence increment is a numerically-stable global logsumexp
    (``pmax`` + ``psum``);
  * systematic resampling is GLOBAL and exact: the weight vector and particle
    block are all-gathered (cheap for SSM state dims at ICI bandwidth), each
    device materializes its own slice of the resampled population. A
    redistribution scheme that avoids the particle all-gather (ring exchange
    of surplus/deficit) is future work.

Matches the single-device ``bootstrap_filter`` bit-for-bit in expectation;
tests check evidence agreement against the exact Kalman filter.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from viforssms_tpu.inference.smc.bootstrap import SMCResult


def sharded_bootstrap_filter(
    init_particles,                # (N, ...) — leading axis divides the mesh axis
    transition_sample: Callable,   # (key, x) -> x'
    obs_log_prob: Callable,        # (y, x) -> (n_local,)
    ys,
    obs_mask,
    key,
    mesh,
    axis: str = "particles",
) -> SMCResult:
    n_total = init_particles.shape[0]
    n_dev = mesh.shape[axis]
    assert n_total % n_dev == 0
    n_local = n_total // n_dev

    def local_filter(particles, key):
        my = jax.lax.axis_index(axis)

        def step(carry, inp):
            parts, log_z, k = carry
            y, m = inp
            k, k_prop, k_res = jax.random.split(k, 3)
            # decorrelate proposal keys across devices
            k_prop = jax.random.fold_in(k_prop, my)
            parts = transition_sample(k_prop, parts)
            lw = jnp.where(m > 0, obs_log_prob(y, parts), jnp.zeros(n_local))
            # global logsumexp via pmax + psum
            gmax = jax.lax.pmax(jnp.max(lw), axis)
            ssum = jax.lax.psum(jnp.sum(jnp.exp(lw - gmax)), axis)
            log_norm = gmax + jnp.log(ssum)
            log_z = log_z + jnp.where(m > 0, log_norm - jnp.log(n_total), 0.0)
            w_local = jnp.exp(lw - log_norm)  # globally normalized
            ess = 1.0 / jax.lax.psum(jnp.sum(w_local * w_local), axis)
            mean = jax.lax.psum(jnp.tensordot(w_local, parts, axes=(0, 0)), axis)
            # exact global systematic resampling
            w_all = jax.lax.all_gather(w_local, axis).reshape(-1)
            parts_all = jax.lax.all_gather(parts, axis).reshape(
                (n_total,) + parts.shape[1:]
            )
            cum = jnp.cumsum(w_all)
            u = jax.random.uniform(k_res, ())  # same on all devices
            pos = (u + my * n_local + jnp.arange(n_local)) / n_total
            idx = jnp.clip(jnp.searchsorted(cum, pos), 0, n_total - 1)
            resampled = jnp.take(parts_all, idx, axis=0)
            parts = jnp.where(m > 0, resampled, parts)
            return (parts, log_z, k), (mean, ess)

        (parts, log_z, _), (means, ess) = jax.lax.scan(
            step, (particles, 0.0, key), (ys, obs_mask)
        )
        return log_z, means, ess

    f = jax.shard_map(
        local_filter,
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=(P(), P(None), P(None)),
    )
    log_z, means, ess = f(init_particles, key)
    return SMCResult(log_evidence=log_z, filter_means=means, ess=ess)
