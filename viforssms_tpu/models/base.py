"""The SSM model interface.

The reference re-implements its model math inline in each script's ``VI_SSM``
(`AR.py:113-238`, ``lotka_volterra_partial.py:162-342``, ``SV_dense.py``,
``fitz_nag_NVP.py``). Here each model family implements one small interface
consumed by the shared ELBO assembly (``inference/vi/elbo.py``), by NUTS/HMC
and by SMC (they all share the same log-densities — BASELINE.json north star).

Shapes: ``x`` is the transformed path window, shape (p, W+1) for scalar
models or (p, 2, W+1) for bivariate ones, where W = batch_dims and column 0
is the window's left-edge state. ``theta`` is (p, D) in the model's working
parameterization. All log-prob methods return per-particle vectors (p,).
"""

from __future__ import annotations

import jax.numpy as jnp


class SSM:
    # Number of interleaved state dims sampled by the flow (1 or 2).
    flow_dims: int = 1
    theta_dim: int = 0
    # Does this model pin the window's first column via mask/shift?
    uses_mask_shift: bool = False

    def transition_log_prob(self, x, theta):
        """Sum over window steps of the (Euler-Maruyama) transition density."""
        raise NotImplementedError

    def observation_log_prob(self, x, y, obs_mask, theta):
        """Masked observation log-likelihood over the window."""
        raise NotImplementedError

    def log_prior(self, theta):
        raise NotImplementedError

    def transform_path(self, x_raw, mask, shift):
        """Map raw flow output to path space; return (x, log_det_q_correction).

        ``log_det_q_correction`` is ADDED to log q(x) (the reference adds the
        inverse-log-det of the positivity bijector to ``lf_log_prob``,
        ``lotka_volterra_partial.py:295-297``). Identity by default.
        """
        del mask, shift
        return x_raw, jnp.zeros(x_raw.shape[0], x_raw.dtype)

    def x0_log_prob(self, x):
        """Optional initial-state prior term added to the SDE term
        (``lotka_volterra_latest.py:327-337``). Zero by default."""
        return jnp.zeros(x.shape[0], x.dtype)

    def pretrain_loss(self, x, theta, y, obs_mask):
        """Path/parameter initialization objective (``AR.py:201-202``,
        ``lotka_volterra_partial.py:301-305``)."""
        raise NotImplementedError

    def observation_sample(self, key, x_steps, theta):
        """Sample y ~ p(y | x) for each step, for posterior-predictive checks
        (``inference/ppc.py``; no reference counterpart). ``x_steps`` is the
        path over steps 1..T WITHOUT the x0 column — (p, T) scalar models,
        (p, 2, T) bivariate — matching the observation columns; returns y of
        the same shape. Must agree with ``observation_log_prob``'s density.
        Models without a separate observation density (SV: the observed dim
        enters through the transition) keep the default."""
        raise NotImplementedError(
            f"{type(self).__name__} has no separate observation model")

    def predictive_step(self, key, x, theta):
        """One ancestral (Euler-Maruyama) step with PER-PARTICLE theta, for
        posterior-predictive forecasting (``inference/forecast.py``; no
        reference counterpart). ``x``: (p,) for scalar models, (p, 2) for
        bivariate; ``theta``: (p, D) in the model's working parameterization
        (the same space the ELBO's theta samples live in). Must match the
        model's ``transition_log_prob`` density."""
        raise NotImplementedError
