"""Mesh-sharded bootstrap SMC.

Particles shard across a mesh axis (the ``particles``/``chains`` DP axis,
BASELINE.json: "SMC resampling weights ... reduced by jax.lax.psum"):

  * propagation and weighting are purely local;
  * the evidence increment is a numerically-stable global logsumexp
    (``pmax`` + ``psum``);
  * systematic resampling is GLOBAL and exact, with two interchangeable
    communication schemes (same inverse CDF; outputs can differ by float
    ties at block boundaries):

    - ``resampling="gather"``: all-gather the weight vector and particle
      block; each device materializes its slice of the resampled population.
      Simple; per-device memory is O(N_total · state).
    - ``resampling="ring"``: gather-free. Only the n_dev per-device weight
      *sums* are exchanged; each device derives the global inverse-CDF
      positions it owns, then particle blocks circulate around the ICI ring
      (``ppermute`` with their local weight cumsums) for n_dev-1 hops and
      each device picks out the ancestors that live in the passing block.
      Per-device memory stays O(N_local · state) — the scheme for very large
      particle counts or state dims.

Matches the single-device ``bootstrap_filter`` bit-for-bit in expectation;
tests check evidence agreement against the exact Kalman filter, ring-vs-gather
statistical agreement, and ring exactness against the global inverse CDF.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from viforssms_tpu.inference.smc.bootstrap import SMCResult


def _ring_resample(parts, w_local, pos, axis, n_dev, n_local):
    """Gather-free systematic resampling on a ring.

    ``w_local`` is globally normalized; ``pos`` are this device's global
    inverse-CDF positions in (0, 1]. Returns the resampled local block.
    """
    my = jax.lax.axis_index(axis)
    # per-device weight sums -> global block boundaries (n_dev scalars only)
    s_dev = jax.lax.all_gather(jnp.sum(w_local), axis)          # (n_dev,)
    cum_dev = jnp.cumsum(s_dev)                                  # inclusive
    # which block owns each of my positions (same semantics as global
    # searchsorted over the full cumsum: first d with cum_dev[d] >= pos)
    block_of_pos = jnp.clip(jnp.searchsorted(cum_dev, pos), 0, n_dev - 1)
    base_dev = cum_dev - s_dev                                   # exclusive

    cum_local = jnp.cumsum(w_local)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    def hop(s, carry):
        parts_h, cum_h, out = carry
        d = (my - s) % n_dev        # owner of the block currently held
        pos_rel = pos - base_dev[d]
        idx = jnp.clip(jnp.searchsorted(cum_h, pos_rel), 0, n_local - 1)
        take = jnp.take(parts_h, idx, axis=0)
        mask = (block_of_pos == d)
        out = jnp.where(
            mask.reshape((-1,) + (1,) * (parts_h.ndim - 1)), take, out)
        parts_h = jax.lax.ppermute(parts_h, axis, perm)
        cum_h = jax.lax.ppermute(cum_h, axis, perm)
        return parts_h, cum_h, out

    _, _, out = jax.lax.fori_loop(
        0, n_dev, hop, (parts, cum_local, jnp.zeros_like(parts)))
    return out


def sharded_bootstrap_filter(
    init_particles,                # (N, ...) — leading axis divides the mesh axis
    transition_sample: Callable,   # (key, x) -> x'
    obs_log_prob: Callable,        # (y, x) -> (n_local,)
    ys,
    obs_mask,
    key,
    mesh,
    axis: str = "particles",
    resampling: str = "gather",    # "gather" | "ring"
) -> SMCResult:
    n_total = init_particles.shape[0]
    n_dev = mesh.shape[axis]
    assert n_total % n_dev == 0
    assert resampling in ("gather", "ring")
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
            u = jax.random.uniform(k_res, ())  # same on all devices
            pos = (u + my * n_local + jnp.arange(n_local)) / n_total
            if resampling == "ring":
                resampled = _ring_resample(
                    parts, w_local, pos, axis, n_dev, n_local)
            else:
                w_all = jax.lax.all_gather(w_local, axis).reshape(-1)
                parts_all = jax.lax.all_gather(parts, axis).reshape(
                    (n_total,) + parts.shape[1:]
                )
                cum = jnp.cumsum(w_all)
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
