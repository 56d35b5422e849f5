"""FitzHugh-Nagumo SDE model (``fitz_nag_NVP.py``).

Drift:     ( exp(t0) * (x1 - x1^3 - x2 + t1),  t2*x1 - x2 + 1.4 )
Diffusion: diagonal, scale ( sqrt(exp(t3)), sqrt(exp(t4)) )      (fitz_nag_NVP.py:243-255)
Obs:       y ~ N(x, 0.1) on observed steps                        (fitz_nag_NVP.py:233-234)
Paths are unconstrained (no positivity transform; the flow output is used
directly, ``fitz_nag_NVP.py:281-283``).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp

from viforssms_tpu.distributions.bivariate import diag_normal_logpdf
from viforssms_tpu.distributions.normal import normal_logpdf
from viforssms_tpu.models.base import SSM


@dataclasses.dataclass(frozen=True)
class FitzHughNagumo(SSM):
    dt: float = 0.1
    obs_std: float = 0.1
    prior_mean: Tuple[float, ...] = (0.0,) * 5
    prior_scale: Tuple[float, ...] = (10.0,) * 5
    pretrain_target: float = 0.0
    # theta anchor the reference's t2 op regresses q(theta) toward during
    # pre-train (fitz_nag_NVP.py:291-292, run at :373)
    pretrain_theta_anchor: Tuple[float, ...] = (
        0.6931471805599453, 1.0, 1.5, -0.6931471805599453,
        -1.2039728043259361)  # (log 2, 1, 1.5, log .5, log .3)

    flow_dims = 2
    theta_dim = 5
    uses_mask_shift = False

    def transition_log_prob(self, x, theta, x_raw=None):
        del x_raw
        t0, t1, t2 = theta[:, 0:1], theta[:, 1:2], theta[:, 2:3]
        t3, t4 = theta[:, 3:4], theta[:, 4:5]
        x1, x2 = x[:, 0, :-1], x[:, 1, :-1]
        d1, d2 = x[:, 0, 1:] - x1, x[:, 1, 1:] - x2
        a1 = jnp.exp(t0) * (x1 - x1**3 - x2 + t1)
        a2 = t2 * x1 - x2 + 1.4
        sdt = jnp.sqrt(self.dt)
        s1 = sdt * jnp.sqrt(jnp.exp(t3)) * jnp.ones_like(x1)
        s2 = sdt * jnp.sqrt(jnp.exp(t4)) * jnp.ones_like(x2)
        lp = diag_normal_logpdf(d1, d2, self.dt * a1, self.dt * a2, s1, s2)
        return jnp.sum(lp, axis=1)

    def observation_log_prob(self, x, y, obs_mask, theta):
        del theta
        lp = jnp.where(obs_mask > 0, normal_logpdf(y, x[:, :, 1:], self.obs_std), 0.0)
        return jnp.sum(lp.reshape(lp.shape[0], -1), axis=1)

    def log_prior(self, theta):
        mean = jnp.asarray(self.prior_mean, theta.dtype)
        scale = jnp.asarray(self.prior_scale, theta.dtype)
        return jnp.sum(normal_logpdf(theta, mean, scale), axis=-1)

    def observation_sample(self, key, x_steps, theta):
        """y ~ N(x, obs_std) per step (fitz_nag_NVP.py:233-234)."""
        import jax

        del theta
        return x_steps + self.obs_std * jax.random.normal(key, x_steps.shape)

    def predictive_step(self, key, x, theta):
        """x: (p, 2), theta: (p, 5) -> one EM step per particle."""
        import jax

        t0, t1, t2 = theta[:, 0], theta[:, 1], theta[:, 2]
        t3, t4 = theta[:, 3], theta[:, 4]
        x1, x2 = x[:, 0], x[:, 1]
        a1 = jnp.exp(t0) * (x1 - x1**3 - x2 + t1)
        a2 = t2 * x1 - x2 + 1.4
        sdt = jnp.sqrt(self.dt)
        z = jax.random.normal(key, x.shape)
        d1 = self.dt * a1 + sdt * jnp.sqrt(jnp.exp(t3)) * z[:, 0]
        d2 = self.dt * a2 + sdt * jnp.sqrt(jnp.exp(t4)) * z[:, 1]
        return jnp.stack([x1 + d1, x2 + d2], axis=1)

    def pretrain_loss(self, x, theta, y, obs_mask):
        # path regression to 0 (t1) + theta regression to the reference's
        # anchor (t2) — both ops run each pre-train step (fitz_nag_NVP.py:373)
        del y, obs_mask
        anchor = jnp.asarray(self.pretrain_theta_anchor, theta.dtype)
        return (jnp.mean((x - self.pretrain_target) ** 2)
                + jnp.mean((theta - anchor) ** 2))
