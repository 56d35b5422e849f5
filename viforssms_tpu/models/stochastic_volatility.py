"""Stochastic-volatility model on real return data (``SV_dense.py``).

Dim 1 is the OBSERVED log-price (fed into the path, never sampled —
``SV_dense.py:193-194,245-246``); dim 2 is the latent log-volatility sampled
by a 1-D NMA flow. The likelihood enters entirely through the dim-1
transition density (there is no separate observation term,
``SV_dense.py:203-234``).

Drift:     ( t0 * x1,  t1 - exp(t2) * x2 )
Diffusion: diagonal scale ( x1 * exp(x2 / 2),  exp(t3) )    (SV_dense.py:211-223)
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp

from viforssms_tpu.distributions.bivariate import diag_normal_logpdf
from viforssms_tpu.models.base import SSM


@dataclasses.dataclass(frozen=True)
class StochasticVolatility(SSM):
    dt: float = 1.0
    prior_mean: Tuple[float, ...] = (0.0,) * 4
    prior_scale: Tuple[float, ...] = (10.0,) * 4
    pretrain_target: float = -7.0
    # theta anchor the reference's param_init op regresses q(theta) toward
    # during pre-train (SV_dense.py:253-254, run at :333)
    pretrain_theta_anchor: Tuple[float, ...] = (
        0.001, -0.6, -2.5257286443082556, -0.6931471805599453)  # (.001, -.6, log .08, log .5)

    flow_dims = 1  # only the latent log-vol is sampled
    theta_dim = 4
    uses_mask_shift = True
    observed_dim = True  # ELBO must supply the dim-1 window

    def assemble_path(self, latent, dim_one):
        """x = [observed log-price; latent log-vol] (SV_dense.py:245-246)."""
        return jnp.stack([dim_one, latent], axis=1)  # (p, 2, W+1)

    def transition_log_prob(self, x, theta, x_raw=None):
        del x_raw
        t0, t1 = theta[:, 0:1], theta[:, 1:2]
        t2, t3 = theta[:, 2:3], theta[:, 3:4]
        x1, x2 = x[:, 0, :-1], x[:, 1, :-1]
        d1, d2 = x[:, 0, 1:] - x1, x[:, 1, 1:] - x2
        a1 = t0 * x1
        a2 = t1 - jnp.exp(t2) * x2
        sdt = jnp.sqrt(self.dt)
        s1 = sdt * x1 * jnp.exp(0.5 * x2)
        s2 = sdt * jnp.exp(t3) * jnp.ones_like(x2)
        lp = diag_normal_logpdf(d1, d2, self.dt * a1, self.dt * a2, s1, s2)
        return jnp.sum(lp, axis=1)

    def observation_log_prob(self, x, y, obs_mask, theta):
        # no separate observation term (SV_dense.py:203-234)
        del y, obs_mask, theta
        return jnp.zeros(x.shape[0], x.dtype)

    def log_prior(self, theta):
        from viforssms_tpu.distributions.normal import normal_logpdf

        mean = jnp.asarray(self.prior_mean, theta.dtype)
        scale = jnp.asarray(self.prior_scale, theta.dtype)
        return jnp.sum(normal_logpdf(theta, mean, scale), axis=-1)

    def predictive_step(self, key, x, theta):
        """x: (p, 2) = (log-price, log-vol), theta: (p, 4) -> one EM step."""
        import jax

        t0, t1 = theta[:, 0], theta[:, 1]
        t2, t3 = theta[:, 2], theta[:, 3]
        x1, x2 = x[:, 0], x[:, 1]
        a1 = t0 * x1
        a2 = t1 - jnp.exp(t2) * x2
        sdt = jnp.sqrt(self.dt)
        z = jax.random.normal(key, x.shape)
        d1 = self.dt * a1 + sdt * x1 * jnp.exp(0.5 * x2) * z[:, 0]
        d2 = self.dt * a2 + sdt * jnp.exp(t3) * z[:, 1]
        return jnp.stack([x1 + d1, x2 + d2], axis=1)

    def pretrain_loss(self, x, theta, y, obs_mask):
        # (x + 7)^2 pulls log-vol into a sane region (SV_dense.py:251-252);
        # theta is simultaneously regressed to the reference's anchor values
        # (param_init, SV_dense.py:253-254, run alongside at :333)
        del y, obs_mask
        anchor = jnp.asarray(self.pretrain_theta_anchor, theta.dtype)
        return (jnp.mean((x - self.pretrain_target) ** 2)
                + jnp.mean((theta - anchor) ** 2))
