"""Minibatch ELBO assembly — the shared L4 of every model family.

Implements the reference's estimator (``AR.py:168-187``,
``..._learn_theta.py:355-444``):

    ELBO = (T / batch_dims) * ( SDE_lp - log q(x) + obs_lp )
           + prior_lp - log q(theta)

over p simultaneous (theta, path-window) particles, with the window's
``T/batch_dims`` rescaling that makes random sub-windows an unbiased
path-term estimator. Everything here traces into ONE jitted function:
theta sampling, window gather, base noise, flow, transforms, densities.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from viforssms_tpu.data.features import WindowBatch, WindowSpec, WindowTables, gather_windows


class ELBOTerms(NamedTuple):
    elbo: jax.Array          # (p,)
    sde_lp: jax.Array        # (p,)
    obs_lp: jax.Array        # (p,)
    path_lq: jax.Array       # (p,) log q(x)
    theta_lq: jax.Array      # (p,) log q(theta)
    prior_lp: jax.Array      # (p,)
    theta: jax.Array         # (p, D)
    x: jax.Array             # transformed path window


def reshape_interleaved(x_raw, flow_dims):
    """(p, d*(W+1)) interleaved -> (p, d, W+1) (lotka_volterra_partial.py:290-291)."""
    if flow_dims == 1:
        return x_raw
    p = x_raw.shape[0]
    return jnp.transpose(x_raw.reshape(p, -1, flow_dims), (0, 2, 1))


def assemble_path(model, x_raw, batch: WindowBatch):
    """Apply the model's path transform; returns (x, log_q_correction, raw)."""
    raw = reshape_interleaved(x_raw, model.flow_dims)
    if getattr(model, "observed_dim", False):
        # SV: latent dim only; observed dim is injected (SV_dense.py:245-246)
        latent = raw * batch.mask[:, 0, :] + batch.shift[:, 0, :]
        x = model.assemble_path(latent, batch.dim_one)
        return x, jnp.zeros(x.shape[0], x.dtype), raw
    if model.uses_mask_shift:
        x, log_det = model.transform_path(raw, batch.mask, batch.shift)
        return x, log_det, raw
    return raw, jnp.zeros(raw.shape[0], raw.dtype), raw


def obs_from_features(model, batch: WindowBatch, spec: WindowSpec):
    """Extract (y, obs_mask) over the window from the gathered features —
    channel 0 is the lag-0 observation (AR.py:155, lotka_volterra_partial.py:218-219)."""
    b = spec.batch_dims
    if model.flow_dims == 1:
        y = batch.feats[:, -b:, 0]
        obs_mask = batch.feats[:, -b:, -1]  # obs-indicator channel (AR.py:169-170)
        return y, obs_mask
    p = batch.feats.shape[0]
    y = jnp.transpose(batch.feats[:, -2 * b :, 0].reshape(p, b, 2), (0, 2, 1))
    return y, batch.bin_feed


def compute_elbo(
    model,
    flow_apply,
    theta_sample,
    key,
    tables: WindowTables,
    spec: WindowSpec,
    starts,
    elbo_scale: float,
    fix_theta_value=None,
    shard_fn=None,
    gather_fn=None,
) -> ELBOTerms:
    """One reparameterized ELBO evaluation for p particles at window ``starts``.

    ``flow_apply(z, feats, theta) -> (x_raw, log_q_x)``;
    ``theta_sample(key) -> (theta (p,D), log_q_theta (p,))``.
    ``fix_theta_value``: (D,) array pins theta and zeroes its terms
    (``lotka_volterra_latest.py:197-203``).
    """
    k_theta, k_z = jax.random.split(key)
    batch = (gather_fn or gather_windows)(tables, spec, starts)
    if shard_fn is not None:
        # particle-axis DP: constrain per-particle tensors so XLA partitions
        # the whole pipeline and reduces gradients with psum over the mesh
        batch = WindowBatch(*shard_fn(tuple(batch)))
    p = batch.feats.shape[0]

    if fix_theta_value is not None:
        theta = jnp.tile(jnp.asarray(fix_theta_value)[None, :], (p, 1))
        theta_lq = jnp.zeros(p, theta.dtype)
        prior_lp = jnp.zeros(p, theta.dtype)
    else:
        theta, theta_lq = theta_sample(k_theta)
        prior_lp = model.log_prior(theta)

    z = jax.random.normal(k_z, (p, spec.kernel_ext))
    if shard_fn is not None:
        z, theta = shard_fn((z, theta))
    x_raw, path_lq = flow_apply(z, batch.feats, theta)
    x, lq_corr, raw = assemble_path(model, x_raw, batch)
    path_lq = path_lq + lq_corr

    y, obs_mask = obs_from_features(model, batch, spec)
    sde_lp = model.transition_log_prob(x, theta, x_raw=raw)
    obs_lp = model.observation_log_prob(x, y, obs_mask, theta)

    elbo = elbo_scale * (sde_lp - path_lq + obs_lp) + prior_lp - theta_lq
    return ELBOTerms(elbo, sde_lp, obs_lp, path_lq, theta_lq, prior_lp, theta, x)
