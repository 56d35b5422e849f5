"""Cross-validation harness: run HMC/NUTS/SMC on the SAME model densities VI uses.

BASELINE.json's acceptance bar is posterior-moment agreement between the VI
stack and gold-standard samplers sharing one set of log-probs. This module
builds joint log-densities over (theta, latent path) directly from the model
classes in ``models/`` — no separate model math to drift out of sync — and
packages moment comparison utilities.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def ssm_log_joint(model, obs, obs_bin, x0, T: int):
    """log p(theta, x_{1:T} | y) up to a constant, for scalar-path models.

    ``q`` packs [theta (model.theta_dim), x_{1:T}]. Uses the model's own
    transition/observation/prior terms by lifting the single sample to a
    batch of one (the model interface is (p, ...)-shaped).
    """
    D = model.theta_dim
    obs = jnp.asarray(obs)
    obs_bin = jnp.asarray(obs_bin)

    def log_joint(q):
        theta = q[:D][None, :]
        x = jnp.concatenate([jnp.asarray([x0], q.dtype), q[D:]])[None, :]
        sde = model.transition_log_prob(x, theta)
        obs_lp = model.observation_log_prob(x, obs[None, :], obs_bin[None, :], theta)
        prior = model.log_prior(theta)
        return (sde + obs_lp + prior)[0]

    return log_joint


def path_log_posterior(model, obs, obs_bin, x0, theta_fixed, T: int):
    """log p(x_{1:T} | y, theta) for fixed theta (path-only validation)."""
    D = model.theta_dim
    theta = jnp.asarray(theta_fixed)[None, :]

    def log_post(x_flat):
        x = jnp.concatenate([jnp.asarray([x0], x_flat.dtype), x_flat])[None, :]
        sde = model.transition_log_prob(x, theta)
        obs_lp = model.observation_log_prob(
            x, jnp.asarray(obs)[None, :], jnp.asarray(obs_bin)[None, :], theta
        )
        return (sde + obs_lp)[0]

    return log_post


class MomentComparison(NamedTuple):
    mean_a: np.ndarray
    mean_b: np.ndarray
    se: np.ndarray         # MC standard errors of a (per coordinate)
    z: np.ndarray          # |mean_a - mean_b| / se


def compare_moments(draws_a, draws_b, ess_factor: float = 0.1) -> MomentComparison:
    """Per-coordinate mean comparison in MC-standard-error units.

    ``ess_factor`` discounts the nominal sample count for autocorrelation
    (BASELINE target: agreement within 2 MC-SE)."""
    a = np.asarray(draws_a).reshape(-1, np.asarray(draws_a).shape[-1])
    b = np.asarray(draws_b).reshape(-1, np.asarray(draws_b).shape[-1])
    mean_a, mean_b = a.mean(0), b.mean(0)
    ess = max(a.shape[0] * ess_factor, 1.0)
    se = a.std(0) / np.sqrt(ess) + 1e-12
    return MomentComparison(mean_a, mean_b, se, np.abs(mean_a - mean_b) / se)


def smc_evidence_for_model(model, obs, obs_bin, x0, theta, n_particles, key):
    """Bootstrap-SMC evidence log p(y | theta) using the model's own
    ``transition_sample`` and observation density."""
    from viforssms_tpu.inference.smc import bootstrap_filter

    theta = jnp.asarray(theta)

    def transition(k, particles):
        return model.transition_sample(k, particles, theta)

    def obs_lp(y, particles):
        # reuse the model's masked obs term with a single-step window
        x = jnp.stack([particles, particles], axis=-1)  # (N, 2): [head, tail]
        ym = jnp.full((particles.shape[0], 1), y)
        mask = jnp.ones((particles.shape[0], 1))
        return model.observation_log_prob(
            x, ym, mask, jnp.tile(theta[None, :], (particles.shape[0], 1))
        )

    init = jnp.full((n_particles,), jnp.asarray(x0, jnp.float32))
    return bootstrap_filter(
        init, transition, obs_lp, jnp.asarray(obs), jnp.asarray(obs_bin), key
    )
