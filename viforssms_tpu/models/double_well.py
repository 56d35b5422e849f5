"""Double-well diffusion — the worked example of a USER-DEFINED model family.

This model does not exist in the reference; it is the tutorial model for
``docs/EXTENDING.md``, showing that the four reference families (AR/LV/SV/FHN)
are instances of one small interface (``models/base.py``) rather than
hand-built stacks (the reference re-implements its model math inline in every
script, e.g. ``AR.py:113-238``, ``SV_dense.py:203-234``).

SDE:   dx = a * x * (b - x^2) dt + s dW      (bimodal: wells at +-sqrt(b))
Obs:   y_t ~ N(x_t, obs_std) on observed steps
Theta: (log a, b, log s) — positives in log space, like FHN's t0/t3/t4
       (``fitz_nag_NVP.py:243-255``).

Everything downstream — the NMA variational flow, the minibatch ELBO, NUTS/
HMC/SMC validators, forecasting, serving export — works off this class
unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp

from viforssms_tpu.distributions.normal import normal_logpdf
from viforssms_tpu.models.base import SSM


@dataclasses.dataclass(frozen=True)
class DoubleWell(SSM):
    dt: float = 0.1
    obs_std: float = 0.5
    prior_mean: Tuple[float, ...] = (0.0, 0.0, 0.0)
    prior_scale: Tuple[float, ...] = (10.0, 10.0, 10.0)

    flow_dims = 1
    theta_dim = 3
    uses_mask_shift = False

    def _drift(self, x, log_a, b):
        return jnp.exp(log_a) * x * (b - x * x)

    def transition_log_prob(self, x, theta, x_raw=None):
        # Euler-Maruyama one-step density over the window: x (p, W+1)
        del x_raw
        head, tail = x[:, :-1], x[:, 1:]
        loc = head + self.dt * self._drift(head, theta[:, 0:1], theta[:, 1:2])
        scale = jnp.sqrt(self.dt) * jnp.exp(theta[:, 2:3])
        return jnp.sum(normal_logpdf(tail, loc, scale), axis=1)

    def observation_log_prob(self, x, y, obs_mask, theta):
        del theta
        lp = jnp.where(obs_mask > 0, normal_logpdf(y, x[:, 1:], self.obs_std), 0.0)
        return jnp.sum(lp, axis=1)

    def log_prior(self, theta):
        mean = jnp.asarray(self.prior_mean, theta.dtype)
        scale = jnp.asarray(self.prior_scale, theta.dtype)
        return jnp.sum(normal_logpdf(theta, mean, scale), axis=-1)

    def observation_sample(self, key, x_steps, theta):
        import jax

        del theta
        return x_steps + self.obs_std * jax.random.normal(key, x_steps.shape)

    def transition_sample(self, key, x, theta):
        """One ancestral EM step with a SINGLE theta vector (3,), for SMC."""
        import jax

        loc = x + self.dt * self._drift(x, theta[0], theta[1])
        return loc + jnp.sqrt(self.dt) * jnp.exp(theta[2]) * jax.random.normal(
            key, x.shape)

    def predictive_step(self, key, x, theta):
        """x: (p,), theta: (p, 3) -> one EM step per particle (forecasting)."""
        import jax

        loc = x + self.dt * self._drift(x, theta[:, 0], theta[:, 1])
        return loc + jnp.sqrt(self.dt) * jnp.exp(theta[:, 2]) * jax.random.normal(
            key, x.shape)

    def pretrain_loss(self, x, theta, y, obs_mask):
        # observation likelihood alone, the AR recipe (AR.py:201-202)
        del theta
        return -jnp.mean(
            jnp.sum(normal_logpdf(y, x[:, 1:], self.obs_std) * obs_mask, axis=1)
        )
