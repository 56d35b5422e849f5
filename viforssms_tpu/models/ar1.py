"""AR(1) state-space model — the reference's canonical 1-D stack (``AR.py``).

Latent:  x_t ~ N(theta1 * x_{t-1} + theta0,  exp(theta2))   (AR.py:175-176;
         note exp(theta2) is the *scale*, not the variance)
Obs:     y_t ~ N(x_t, obs_std), observed where obs_bin == 1  (AR.py:169-170)
Prior:   theta ~ N(prior_mean, prior_scale) diagonal          (AR.py:181-182)

This model admits an exact Gaussian-smoother oracle (conditional on theta),
which the tests use as the integration ground truth (SURVEY.md §4).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp

from viforssms_tpu.distributions.normal import normal_logpdf
from viforssms_tpu.models.base import SSM


@dataclasses.dataclass(frozen=True)
class AR1(SSM):
    obs_std: float = 1.0
    prior_mean: Tuple[float, ...] = (0.0, 0.0, 0.0)
    prior_scale: Tuple[float, ...] = (10.0, 10.0, 10.0)

    flow_dims = 1
    theta_dim = 3
    uses_mask_shift = False

    def transition_log_prob(self, x, theta, x_raw=None):
        # x: (p, W+1); theta: (p, 3)
        del x_raw
        head, tail = x[:, :-1], x[:, 1:]
        loc = theta[:, 1:2] * head + theta[:, 0:1]
        scale = jnp.exp(theta[:, 2:3])
        return jnp.sum(normal_logpdf(tail, loc, scale), axis=1)

    def observation_log_prob(self, x, y, obs_mask, theta):
        # y, obs_mask: (p, W); mask picks the observed steps (AR.py:169-170)
        del theta
        lp = jnp.where(obs_mask > 0, normal_logpdf(y, x[:, 1:], self.obs_std), 0.0)
        return jnp.sum(lp, axis=1)

    def log_prior(self, theta):
        mean = jnp.asarray(self.prior_mean, theta.dtype)
        scale = jnp.asarray(self.prior_scale, theta.dtype)
        return jnp.sum(normal_logpdf(theta, mean, scale), axis=-1)

    def observation_sample(self, key, x_steps, theta):
        """y ~ N(x, obs_std) per step (AR.py:169-170); x_steps: (p, T)."""
        import jax

        del theta
        return x_steps + self.obs_std * jax.random.normal(key, x_steps.shape)

    def transition_sample(self, key, x, theta):
        """One-step ancestral draw x' ~ N(theta1 x + theta0, exp(theta2)) for SMC."""
        import jax

        loc = theta[1] * x + theta[0]
        return loc + jnp.exp(theta[2]) * jax.random.normal(key, x.shape)

    def predictive_step(self, key, x, theta):
        """x: (p,), theta: (p, 3) -> x' ~ N(theta1 x + theta0, exp(theta2))."""
        import jax

        loc = theta[:, 1] * x + theta[:, 0]
        return loc + jnp.exp(theta[:, 2]) * jax.random.normal(key, x.shape)

    def pretrain_loss(self, x, theta, y, obs_mask):
        # AR pre-trains on the observation likelihood alone (AR.py:201-202)
        del theta
        return -jnp.mean(
            jnp.sum(normal_logpdf(y, x[:, 1:], self.obs_std) * obs_mask, axis=1)
        )
