"""Posterior-predictive checks (PPC) — model-criticism validator.

No reference counterpart (the reference's only model criticism was eyeballing
TensorBoard path plots). Given posterior draws of (theta, latent path), each
model's ``observation_sample`` replays the observation process to produce
replicated datasets y_rep; test statistics T(y_rep) are compared with the
observed T(y) via Bayesian p-values P(T(y_rep) >= T(y_obs)). Extreme p-values
(near 0 or 1) flag misspecification of the observation model or an
uncalibrated posterior.

The observation mask is identical for the real and every replicated dataset,
so the observed indices are extracted host-side ONCE and the statistics
become static-shape gathers — the whole replay + statistics pass is one
jitted/vmapped program over the draw axis. Defaults: mean, spread, lag-1
autocorrelation of consecutive OBSERVED values (robust to sparse regular
masks, where adjacent time steps are never jointly observed), and max.

Usage (array-level; engine-level wrapper below):

    res = posterior_predictive_check(
        model, paths, theta, y_obs, obs_bin, jax.random.key(0))
    res.p_values   # {"mean": 0.41, "std": 0.66, "lag1": ..., "max": ...}
"""

from __future__ import annotations

from typing import Callable, Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def make_masked_stats(obs_bin) -> Callable:
    """Build the default statistics closure for a CONCRETE observation mask:
    returns ``stats(y) -> dict`` computing mean/std/lag1/max over the
    observed entries ((T,) or (2, T) layouts)."""
    ob = np.asarray(obs_bin)
    rows = ob.reshape(-1, ob.shape[-1])
    idxs = [np.flatnonzero(r > 0) for r in rows]
    if all(len(i) == 0 for i in idxs):
        raise ValueError("observation mask selects nothing")

    def stats(y):
        y2 = y.reshape(-1, y.shape[-1])
        vals = jnp.concatenate([y2[d, i] for d, i in enumerate(idxs) if len(i)])
        mean = jnp.mean(vals)
        std = jnp.std(vals)
        lag = []
        for d, i in enumerate(idxs):
            if len(i) < 3:
                continue
            a, b = y2[d, i[:-1]], y2[d, i[1:]]
            mu = jnp.mean(y2[d, i])
            var = jnp.maximum(jnp.mean((y2[d, i] - mu) ** 2), 1e-30)
            lag.append(jnp.mean((a - mu) * (b - mu)) / var)
        lag1 = jnp.mean(jnp.stack(lag)) if lag else jnp.zeros((), y.dtype)
        return {"mean": mean, "std": std, "lag1": lag1, "max": jnp.max(vals)}

    return stats


class PPCResult(NamedTuple):
    p_values: Dict[str, float]     # P(T(y_rep) >= T(y_obs)) per statistic
    observed: Dict[str, float]     # T(y_obs)
    replicated: Dict[str, np.ndarray]  # T(y_rep) per posterior draw

    def extreme(self, alpha: float = 0.01):
        """Statistics whose p-value flags misspecification at level alpha."""
        return {k: v for k, v in self.p_values.items()
                if v < alpha or v > 1.0 - alpha}


def posterior_predictive_check(
    model, paths, theta, y_obs, obs_bin, key,
    stats_factory: Callable = make_masked_stats,
) -> PPCResult:
    """paths: (n, T) or (n, 2, T) posterior path draws over steps 1..T;
    theta: (n, D) matching draws; y_obs/obs_bin: (T,) or (2, T)."""
    paths = jnp.asarray(paths)
    theta = jnp.asarray(theta)
    y_obs = jnp.asarray(y_obs, paths.dtype)
    n = paths.shape[0]
    stats_fn = stats_factory(obs_bin)

    @jax.jit
    def run(key):
        keys = jax.random.split(key, n)
        # one vmapped obs replay: observation_sample is (batch, ...)-shaped,
        # so lift each draw to a batch of one
        def rep_one(k, x, th):
            y = model.observation_sample(k, x[None, ...], th[None, ...])[0]
            return stats_fn(y)

        rep = jax.vmap(rep_one)(keys, paths, theta)
        return rep, stats_fn(y_obs)

    rep, obs = run(key)
    rep = {k: np.asarray(v) for k, v in rep.items()}
    obs = {k: float(v) for k, v in obs.items()}
    p = {k: float(np.mean(rep[k] >= obs[k])) for k in rep}
    return PPCResult(p_values=p, observed=obs, replicated=rep)


def engine_ppc(engine, params, key, y_obs, obs_bin,
               stats_factory: Callable = make_masked_stats) -> PPCResult:
    """Convenience wrapper: draw stitched posterior paths + matching-count
    theta draws from a trained ``VIEngine`` and run the check. ``y_obs`` /
    ``obs_bin`` are the same arrays the feature tables were built from
    ((T,) scalar models, (2, T) bivariate)."""
    k1, k2, k3 = jax.random.split(key, 3)
    paths = jnp.asarray(engine.sample_posterior_paths(params, k1))
    theta = jnp.asarray(engine.sample_theta(params, k2, paths.shape[0]))
    return posterior_predictive_check(
        engine.model, paths, theta, y_obs, obs_bin, k3, stats_factory)
