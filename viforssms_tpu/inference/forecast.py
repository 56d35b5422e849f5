"""Posterior-predictive forecasting (no reference counterpart).

Rolls the SSM dynamics forward from the end of the inferred latent path,
jointly over the particle axis: each particle carries its OWN theta draw and
its own terminal state from one posterior path sample, so the forecast fan
integrates both parameter and path uncertainty. The dynamics come from each
model's ``predictive_step`` (one Euler-Maruyama step matched to its
``transition_log_prob`` density).

    paths, thetas = posterior_predictive(engine, state.params, key, horizon=100)
    # paths: (p, horizon) scalar models / (p, 2, horizon) bivariate
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def forecast(model, key, x_last, theta, horizon: int):
    """Roll ``horizon`` ancestral steps from ``x_last`` with per-particle theta.

    ``x_last``: (p,) or (p, 2); ``theta``: (p, D). Returns (p, horizon) or
    (p, 2, horizon). Jit-compatible (horizon must be static under jit).
    """
    def body(carry, k):
        x = model.predictive_step(k, carry, theta)
        return x, x

    _, xs = jax.lax.scan(body, x_last, jax.random.split(key, horizon))
    # scan stacks on axis 0 -> move time to the trailing axis
    return jnp.moveaxis(xs, 0, -1)


def posterior_predictive(engine, params, key, horizon: int, starts=None):
    """Forecast from the posterior of a trained ``VIEngine``.

    Samples one (theta, path-window) pair per particle from the variational
    posterior at the LAST window of the series (or at ``starts``), takes each
    particle's terminal state, and rolls the SDE forward ``horizon`` steps.
    Returns ``(paths, theta)`` with paths (p, [2,] horizon).
    """
    k_post, k_fwd = jax.random.split(key)
    if starts is None:
        if engine.series_mode:
            starts = jnp.arange(engine.cfg.p, dtype=jnp.int32) % engine.num_series
        else:
            last = int(engine.spec.window_starts()[-1])
            starts = jnp.full((engine.cfg.p,), last, jnp.int32)
    t = engine.eval_terms(params, k_post, starts)
    x_last = t.x[..., -1]  # (p,) or (p, 2): terminal state of each sampled path
    return forecast(engine.model, k_fwd, x_last, t.theta, horizon), t.theta
