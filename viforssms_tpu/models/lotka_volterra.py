"""Lotka-Volterra stochastic-kinetic SDE models.

Two variants, matching the two generations in the reference:

* :class:`LotkaVolterra` — the original fixed-data, log-theta model
  (``lotka_volterra_partial.py``): rates are ``exp(theta)``, paths are made
  positive by a plain Softplus, observations are ``N(x, 1)`` on observed steps.

* :class:`LotkaVolterraLearnTheta` — the terminal batched variant
  (``lotka_volterra_latest_batch_gpt_64_mu1_cov_learn_theta.py``): theta is
  positive (softplus'd posterior), paths go through ``softplus(.)+1``, the SDE
  density is evaluated in pre-transform space with the bijector's inverse
  log-det (``..._learn_theta.py:399-409``), observations have multiplicative
  noise through a ``1+softplus(x-1)`` transform (``..._learn_theta.py:355-361``),
  and the window's first column carries an x0 prior (``..._learn_theta.py:413-425``).

Euler-Maruyama transition: dx ~ N(dt * alpha(x), dt * beta(x)) with
  alpha = (t0*x1 - t1*x1*x2,  t1*x1*x2 - t2*x2)
  beta  = [[t0*x1 + t1*x1*x2, -t1*x1*x2], [-t1*x1*x2, t1*x1*x2 + t2*x2]]
whose Cholesky factor is built analytically (``lotka_volterra_partial.py:244-257``)
and evaluated by closed-form back-substitution (``distributions/bivariate.py``).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp

from viforssms_tpu.distributions.bijectors import Chain, Affine, Softplus, sum_event
from viforssms_tpu.distributions.bivariate import bivariate_tril_logpdf
from viforssms_tpu.distributions.normal import normal_logpdf
from viforssms_tpu.models.base import SSM


def lv_drift(x1, x2, t0, t1, t2):
    return t0 * x1 - t1 * x1 * x2, t1 * x1 * x2 - t2 * x2


def lv_chol(x1, x2, t0, t1, t2, floor: float = 1e-10):
    """Analytic Cholesky of the LV reaction covariance (lotka_volterra_partial.py:249-257).

    The sqrt arguments are clamped at ``floor``: for degenerate states (x -> 0,
    reachable from an untrained flow) the exact arguments hit 0, where sqrt has
    an infinite gradient that poisons the whole backward pass — the failure
    the reference fought with jitter/SVD/pseudo-inverse rewrites (SURVEY.md
    §7.3 item 1). Clamping keeps value AND gradient finite.
    """
    cross = t1 * x1 * x2
    a = jnp.sqrt(jnp.maximum(t0 * x1 + cross, floor))
    b = -cross / a
    c = jnp.sqrt(jnp.maximum(cross + t2 * x2 - b * b, floor))
    return a, b, c


@dataclasses.dataclass(frozen=True)
class LotkaVolterra(SSM):
    """Original fixed-data LV, theta in log space."""

    dt: float = 0.1
    obs_scale: float = 1.0
    prior_mean: Tuple[float, ...] = (-0.8147, -5.843, -1.2185)  # log(rates/10), lotka_volterra_partial.py:476
    prior_scale: Tuple[float, ...] = (1e-4, 1e-4, 1e-4)
    jitter: float = 0.0
    pretrain_target: float = 75.0
    # Theta anchor for pre-training, in log-rate space. The reference BUILDS
    # this op (t2 -> log([.5, .0025, .3]), lotka_volterra_partial.py:304-305,
    # and RUNS the analogous anchor in SV_dense.py:253-254) though its LV
    # loop only runs t1. Anchoring pins q(theta) near the anchor during
    # pre-train, which rescues runs whose loose-prior ELBO otherwise
    # converges to a rates-inflated local mode — the seeds 2-5 study
    # (docs/RESULTS.md) measured it fixing 8/8 runs, so it is ON by default
    # ("prior" = anchor at ``prior_mean``, matching SV/FHN); set None for a
    # strict-parity pre-train, or an explicit tuple of log-rates.
    pretrain_theta_anchor: Tuple[float, ...] | str | None = "prior"

    flow_dims = 2
    theta_dim = 3
    uses_mask_shift = True

    def _rates(self, theta):
        r = jnp.exp(theta)  # theta_eval applies exp (lotka_volterra_partial.py:231)
        return r[:, 0:1], r[:, 1:2], r[:, 2:3]

    def transition_log_prob(self, x, theta, x_raw=None):
        del x_raw
        t0, t1, t2 = self._rates(theta)
        x1, x2 = x[:, 0, :-1], x[:, 1, :-1]
        d1, d2 = x[:, 0, 1:] - x1, x[:, 1, 1:] - x2
        a1, a2 = lv_drift(x1, x2, t0, t1, t2)
        ca, cb, cc = lv_chol(x1, x2, t0, t1, t2)
        sdt = jnp.sqrt(self.dt)
        lp = bivariate_tril_logpdf(
            d1, d2, self.dt * a1, self.dt * a2, sdt * ca, sdt * cb, sdt * cc,
            jitter=self.jitter,
        )
        return jnp.sum(lp, axis=1)

    def observation_log_prob(self, x, y, obs_mask, theta):
        del theta
        # y, obs_mask: (p, 2, W); N(x, obs_scale) on observed steps
        lp = jnp.where(obs_mask > 0, normal_logpdf(y, x[:, :, 1:], self.obs_scale), 0.0)
        return jnp.sum(lp.reshape(lp.shape[0], -1), axis=1)

    def log_prior(self, theta):
        mean = jnp.asarray(self.prior_mean, theta.dtype)
        scale = jnp.asarray(self.prior_scale, theta.dtype)
        return jnp.sum(normal_logpdf(theta, mean, scale), axis=-1)

    def observation_sample(self, key, x_steps, theta):
        """y ~ N(x, obs_scale) per step (lotka_volterra_partial.py:235)."""
        import jax

        del theta
        return x_steps + self.obs_scale * jax.random.normal(key, x_steps.shape)

    def transition_sample(self, key, x, theta_rates):
        """One Euler-Maruyama step for SMC: x (N, 2), theta_rates (3,) positive."""
        import jax

        t0, t1, t2 = theta_rates
        x1, x2 = x[:, 0], x[:, 1]
        a1, a2 = lv_drift(x1, x2, t0, t1, t2)
        ca, cb, cc = lv_chol(x1, x2, t0, t1, t2)
        z = jax.random.normal(key, x.shape)
        sdt = jnp.sqrt(self.dt)
        d1 = self.dt * a1 + sdt * ca * z[:, 0]
        d2 = self.dt * a2 + sdt * (cb * z[:, 0] + cc * z[:, 1])
        return jnp.maximum(jnp.stack([x1 + d1, x2 + d2], axis=1), 1e-3)

    def predictive_step(self, key, x, theta):
        """x: (p, 2), theta: (p, 3) log-rates -> one EM step per particle."""
        import jax

        t0, t1, t2 = self._rates(theta)
        t0, t1, t2 = t0[:, 0], t1[:, 0], t2[:, 0]
        x1, x2 = x[:, 0], x[:, 1]
        a1, a2 = lv_drift(x1, x2, t0, t1, t2)
        ca, cb, cc = lv_chol(x1, x2, t0, t1, t2)
        z = jax.random.normal(key, x.shape)
        sdt = jnp.sqrt(self.dt)
        d1 = self.dt * a1 + sdt * ca * z[:, 0]
        d2 = self.dt * a2 + sdt * (cb * z[:, 0] + cc * z[:, 1])
        return jnp.maximum(jnp.stack([x1 + d1, x2 + d2], axis=1), 1e-3)

    def transform_path(self, x_raw, mask, shift):
        # softplus positivity + pin first column to x0 (lotka_volterra_partial.py:292-297)
        sp = Softplus()
        x = sp.forward(x_raw) * mask + shift
        # The reference evaluates the softplus ILDJ on the transformed window,
        # which underflows to -inf in f32 once softplus(u) rounds to 0. The
        # identical quantity from the pre-transform sample is
        # -log sigmoid(u) = softplus(-u) — exact and underflow-proof.
        log_det = sum_event(jnp.logaddexp(-x_raw[:, :, 1:], 0.0), 2)
        return x, log_det

    def pretrain_loss(self, x, theta, y, obs_mask):
        del y, obs_mask
        loss = jnp.mean((x - self.pretrain_target) ** 2)
        anchor = self.pretrain_theta_anchor
        if anchor is not None:
            if anchor == "prior":
                anchor = self.prior_mean
            anchor = jnp.asarray(anchor, theta.dtype)
            loss = loss + jnp.mean((theta - anchor) ** 2)
        return loss


# the positive-path transform f(u) = softplus(u - 1) + 1 (..._learn_theta.py:405-408)
_SDE_CHAIN = Chain((Affine(shift=1.0), Softplus(), Affine(shift=-1.0)))


@dataclasses.dataclass(frozen=True)
class LotkaVolterraLearnTheta(SSM):
    """Terminal batched learn-theta LV (positive theta, transformed densities)."""

    dt: float = 0.2
    obs_noise_factor: float = 0.2  # y_scale = 0.2 * x (..._learn_theta.py:358)
    prior_mean: Tuple[float, ...] = (0.31326169, 0.00247875, 0.31326169)  # softplus([-1,-6,-1])
    prior_sigma: Tuple[float, ...] = (0.31622777, 0.31622777, 0.31622777)  # sqrt(0.1)
    x0_mean: Tuple[float, float] = (91.0, 99.0)
    x0_std: Tuple[float, float] = (1.0, 1.0)
    jitter: float = 1e-3  # chol diagonal jitter (..._learn_theta.py:52-53)
    pretrain_target: float = 75.0
    # Optional pre-train anchor in POSITIVE rate space (the terminal variant's
    # t2 op is commented out, ..._learn_theta.py:488-489, so None is parity)
    pretrain_theta_anchor: Tuple[float, ...] | None = None

    flow_dims = 2
    theta_dim = 3
    uses_mask_shift = True

    def transition_log_prob(self, x, theta, x_raw=None):
        # Density of x_{t+1} evaluated in pre-transform space u = f^{-1}(x) with
        # the chain's inverse log-det (..._learn_theta.py:399-409). The window's
        # first column (x0) is excluded — it gets its own prior below.
        t0, t1, t2 = theta[:, 0:1], theta[:, 1:2], theta[:, 2:3]
        head1, head2 = x[:, 0, 1:-1], x[:, 1, 1:-1]
        tail1, tail2 = x[:, 0, 2:], x[:, 1, 2:]
        a1, a2 = lv_drift(head1, head2, t0, t1, t2)
        mu1 = head1 + self.dt * a1
        mu2 = head2 + self.dt * a2
        ca, cb, cc = lv_chol(head1, head2, t0, t1, t2)
        sdt = jnp.sqrt(self.dt)
        u1 = _SDE_CHAIN.inverse(tail1)
        u2 = _SDE_CHAIN.inverse(tail2)
        lp = bivariate_tril_logpdf(
            u1, u2, mu1, mu2, sdt * ca, sdt * cb, sdt * cc, jitter=self.jitter
        )
        ildj = _SDE_CHAIN.inverse_log_det(tail1) + _SDE_CHAIN.inverse_log_det(tail2)
        sde = jnp.sum(lp + ildj, axis=1)
        return sde + self.x0_log_prob(x)

    def x0_log_prob(self, x):
        # p(x0) = TransformedDistribution(MVNDiag(x0_mean, x0_std), chain) (..._learn_theta.py:413-425)
        x0 = x[:, :, 1]  # (p, 2)
        mean = jnp.asarray(self.x0_mean, x.dtype)
        std = jnp.asarray(self.x0_std, x.dtype)
        u = _SDE_CHAIN.inverse(x0)
        ildj = jnp.sum(_SDE_CHAIN.inverse_log_det(x0), axis=-1)
        return jnp.sum(normal_logpdf(u, mean, std), axis=-1) + ildj

    def observation_log_prob(self, x, y, obs_mask, theta):
        del theta
        loc = x[:, :, 1:]
        scale = self.obs_noise_factor * loc
        # guard the inverse against unobserved fill values <= 1 (the reference
        # instead replaces them with 2.0 host-side, ..._learn_theta.py:810-812);
        # the where-select keeps both value and gradient NaN-free.
        y_safe = jnp.where(obs_mask > 0, jnp.maximum(y, 1.0 + 1e-6), 2.0)
        u = _SDE_CHAIN.inverse(y_safe)
        lp = normal_logpdf(u, loc, scale) + _SDE_CHAIN.inverse_log_det(y_safe)
        lp = jnp.where(obs_mask > 0, lp, 0.0)
        return jnp.sum(lp.reshape(lp.shape[0], -1), axis=1)

    def log_prior(self, theta):
        # Softplus-transformed MVNDiag (..._learn_theta.py:430-437)
        sp = Softplus()
        u = sp.inverse(theta)
        mean = jnp.asarray(self.prior_mean, theta.dtype)
        sigma = jnp.asarray(self.prior_sigma, theta.dtype)
        ildj = jnp.sum(sp.inverse_log_det(theta), axis=-1)
        return jnp.sum(normal_logpdf(u, mean, sigma), axis=-1) + ildj

    def observation_sample(self, key, x_steps, theta):
        """y = f(u), u ~ N(x, factor*x) with f the SDE softplus chain — the
        exact inverse of ``observation_log_prob``'s change of variables.
        ``theta`` supplies the factor only in the learned-obs-scale subclass."""
        import jax

        loc = x_steps
        scale = self._obs_scale_factor(theta)[:, None, None] * loc
        u = loc + scale * jax.random.normal(key, x_steps.shape)
        return _SDE_CHAIN.forward(u)

    def _obs_scale_factor(self, theta):
        return jnp.full((theta.shape[0],), self.obs_noise_factor)

    def predictive_step(self, key, x, theta):
        """x: (p, 2), theta: (p, >=3) POSITIVE rates in its first 3 columns."""
        import jax

        t0, t1, t2 = theta[:, 0], theta[:, 1], theta[:, 2]
        x1, x2 = x[:, 0], x[:, 1]
        a1, a2 = lv_drift(x1, x2, t0, t1, t2)
        ca, cb, cc = lv_chol(x1, x2, t0, t1, t2)
        z = jax.random.normal(key, x.shape)
        sdt = jnp.sqrt(self.dt)
        d1 = self.dt * a1 + sdt * ca * z[:, 0]
        d2 = self.dt * a2 + sdt * (cb * z[:, 0] + cc * z[:, 1])
        return jnp.maximum(jnp.stack([x1 + d1, x2 + d2], axis=1), 1e-3)

    def transform_path(self, x_raw, mask, shift):
        # x = (softplus(raw) + 1) * mask + shift + 1e-6 (..._learn_theta.py:465-478)
        x = (jnp.logaddexp(x_raw, 0.0) + 1.0) * mask + shift + 1e-6
        # ILDJ of v -> softplus^{-1}(v - 1) on the window (..._learn_theta.py:479)
        v = x[:, :, 1:] - 1.0
        log_det = sum_event(-jnp.log(-jnp.expm1(-v)), 2)
        return x, log_det

    def pretrain_loss(self, x, theta, y, obs_mask):
        del y, obs_mask
        loss = jnp.mean((x - self.pretrain_target) ** 2)
        if self.pretrain_theta_anchor is not None:
            anchor = jnp.asarray(self.pretrain_theta_anchor, theta.dtype)
            loss = loss + jnp.mean((theta - anchor) ** 2)
        return loss


@dataclasses.dataclass(frozen=True)
class LotkaVolterraLearnObsScale(LotkaVolterraLearnTheta):
    """4-parameter LV: rates + LEARNED observation-noise factor.

    ``lotka_volterra_latest.py``: y_scale = theta[:, -1] * x
    (``lotka_volterra_latest.py:277-280``); the prior is a plain MVNDiag over
    POSITIVE theta (``lotka_volterra_latest.py:342-346``) — unlike the
    terminal variant's softplus-transformed prior — with mean
    softplus([-1, -6, -1, log(e^0.2 - 1)]) (``lotka_volterra_latest.py:604``).
    Drift/diffusion/x0/path-transform are inherited (theta[:, :3] slices in
    ``transition_log_prob`` ignore the extra column).
    """

    prior_mean: Tuple[float, ...] = (0.31326169, 0.00247875, 0.31326169, 0.2)
    prior_sigma: Tuple[float, ...] = (0.31622777,) * 4

    theta_dim = 4

    def observation_log_prob(self, x, y, obs_mask, theta):
        loc = x[:, :, 1:]
        scale = theta[:, -1][:, None, None] * loc  # learned factor
        y_safe = jnp.where(obs_mask > 0, jnp.maximum(y, 1.0 + 1e-6), 2.0)
        u = _SDE_CHAIN.inverse(y_safe)
        lp = normal_logpdf(u, loc, scale) + _SDE_CHAIN.inverse_log_det(y_safe)
        lp = jnp.where(obs_mask > 0, lp, 0.0)
        return jnp.sum(lp.reshape(lp.shape[0], -1), axis=1)

    def log_prior(self, theta):
        # plain Gaussian prior in positive space (lotka_volterra_latest.py:342-346)
        mean = jnp.asarray(self.prior_mean, theta.dtype)
        sigma = jnp.asarray(self.prior_sigma, theta.dtype)
        return jnp.sum(normal_logpdf(theta, mean, sigma), axis=-1)

    def _obs_scale_factor(self, theta):
        return theta[:, -1]  # learned factor (lotka_volterra_latest.py:277-280)
