"""Synthetic data generators (host-side NumPy, run once).

``generate_ar1`` ports the semantics of the reference's ``AR_dat_gen.py:6-43``
(AR(1) simulation + partial-observation masking + time-till-next-observation
features); the SDE simulators produce Euler-Maruyama paths for LV/FHN used by
tests and demos (the reference ships only pre-generated txt files for these).
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class ObservedSeries:
    """The reference's on-disk triplet: filled obs, indicator, time-till."""

    obs: np.ndarray       # observations, forward-filled over unobserved steps
    obs_bin: np.ndarray   # 1.0 where observed
    time_till: np.ndarray  # steps until next observation
    latent: np.ndarray    # true latent path (for oracles)


def generate_ar1(T, impute, x0, theta, obs_std, seed=1) -> ObservedSeries:
    """AR(1): X_i ~ N(theta1*X_{i-1} + theta0, theta2); y = X + noise.

    Every ``impute``-th step is observed (AR_dat_gen.py:17-31).
    """
    rng = np.random.RandomState(seed)
    X = np.zeros(int(T + 1))
    X[0] = x0
    for i in range(1, X.shape[0]):
        X[i] = rng.normal(X[i - 1] * theta[1] + theta[0], theta[2])
    obs = rng.normal(loc=X, scale=obs_std)

    kept = obs[impute:][0::impute]
    obs_partial = np.concatenate(
        [np.concatenate((np.zeros(impute - 1), [item])) for item in kept]
    )
    obs_fill = np.concatenate([np.tile(item, impute) for item in kept])
    obs_binary = np.array([0.0 if item == 0 else 1.0 for item in obs_partial])

    count = 1
    time_till = np.zeros(len(obs_binary))
    for i in range(len(obs_binary)):
        if obs_binary[i] == 1.0:
            count = 1
        else:
            time_till[i] = count
            count += 1
    time_till_out = -(time_till - impute)
    return ObservedSeries(
        obs=obs_fill.astype(np.float32),
        obs_bin=obs_binary.astype(np.float32),
        time_till=time_till_out.astype(np.float32),
        latent=X.astype(np.float32),
    )


def _em_path(drift, chol, x0, dt, n_steps, rng):
    d = len(x0)
    x = np.zeros((d, n_steps + 1))
    x[:, 0] = x0
    for t in range(n_steps):
        mu = drift(x[:, t])
        L = chol(x[:, t])
        z = rng.normal(size=d)
        x[:, t + 1] = x[:, t] + dt * mu + np.sqrt(dt) * (L @ z)
    return x


def simulate_lv(theta, x0=(100.0, 100.0), dt=0.1, T=50.0, seed=1, clip=1e-4):
    """LV SDE path with the reaction-covariance Cholesky
    (``lotka_volterra_partial.py:244-257``); theta are the positive rates."""
    rng = np.random.RandomState(seed)
    t0, t1, t2 = theta

    def drift(x):
        u, v = max(x[0], clip), max(x[1], clip)
        return np.array([t0 * u - t1 * u * v, t1 * u * v - t2 * v])

    def chol(x):
        u, v = max(x[0], clip), max(x[1], clip)
        cross = t1 * u * v
        a = np.sqrt(t0 * u + cross)
        b = -cross / a
        c = np.sqrt(max(cross + t2 * v - b * b, clip**2))
        return np.array([[a, 0.0], [b, c]])

    n = int(round(T / dt))
    x = _em_path(drift, chol, np.asarray(x0, float), dt, n, rng)
    return np.maximum(x, clip).astype(np.float32)


def simulate_fhn(theta, x0=(-1.0, 1.0), dt=0.1, T=100.0, seed=1):
    """FHN SDE path (``fitz_nag_NVP.py:243-255`` dynamics); theta in the
    model's working parameterization (t0, t3, t4 in log space)."""
    rng = np.random.RandomState(seed)
    t0, t1, t2, t3, t4 = theta

    def drift(x):
        return np.array(
            [np.exp(t0) * (x[0] - x[0] ** 3 - x[1] + t1), t2 * x[0] - x[1] + 1.4]
        )

    def chol(x):
        return np.diag([np.sqrt(np.exp(t3)), np.sqrt(np.exp(t4))])

    n = int(round(T / dt))
    return _em_path(drift, chol, np.asarray(x0, float), dt, n, rng).astype(np.float32)


def simulate_double_well(theta, x0=1.0, dt=0.1, T=50.0, seed=1):
    """Double-well diffusion dx = a*x*(b - x^2) dt + s dW (the EXTENDING.md
    tutorial model; not in the reference). theta = (log a, b, log s)."""
    rng = np.random.RandomState(seed)
    log_a, b, log_s = theta
    a, s = np.exp(log_a), np.exp(log_s)
    n = int(round(T / dt))
    x = np.zeros(n + 1)
    x[0] = x0
    for t in range(n):
        x[t + 1] = (x[t] + dt * a * x[t] * (b - x[t] ** 2)
                    + np.sqrt(dt) * s * rng.normal())
    return x.astype(np.float32)


def partial_observe_1d(x, every=10, obs_std=1.0, seed=2):
    """Observe a scalar path every ``every`` steps with Gaussian noise;
    returns (obs_filled (T,), obs_bin (T,), time_till (T,)) — the 1-D layout
    ``ar1_tables`` consumes (columns are latent steps 1..T). Unobserved steps
    carry the NEXT observation's value (the reference's backward fill,
    ``AR_dat_gen.py:21-23``)."""
    rng = np.random.RandomState(seed)
    T = len(x) - 1
    obs = np.zeros(T, np.float32)
    obs_bin = np.zeros(T, np.float32)
    idx = np.arange(every - 1, T, every)
    obs[idx] = x[idx + 1] + rng.normal(0.0, obs_std, size=len(idx))
    obs_bin[idx] = 1.0
    t_arange = np.arange(T)
    pos = np.searchsorted(idx, t_arange)
    nxt = np.where(pos < len(idx), idx[np.minimum(pos, len(idx) - 1)], T - 1)
    obs_fill = obs[nxt]
    dist = np.where(pos < len(idx), nxt - t_arange, T - t_arange)
    time_till = np.where(obs_bin > 0, 0, dist).astype(np.float32)
    return obs_fill.astype(np.float32), obs_bin, time_till


def partial_observe_2d(x, every=10, obs_std=1.0, seed=2, observed_dims=(0, 1)):
    """Observe a 2-D path every ``every`` steps with Gaussian noise; returns
    (obs_filled (2,T), obs_bin (2,T), time_till (2,T)) in the reference's txt
    layout (columns are latent steps 1..T). Vectorized (1e6-step series)."""
    rng = np.random.RandomState(seed)
    T = x.shape[1] - 1
    obs = np.zeros((2, T), np.float32)
    obs_bin = np.zeros((2, T), np.float32)
    time_till = np.zeros((2, T), np.float32)
    idx = np.arange(every - 1, T, every)
    for d in range(2):
        if d not in observed_dims:
            time_till[d] = np.arange(T, 0, -1)
            continue
        obs[d, idx] = x[d, idx + 1] + rng.normal(0.0, obs_std, size=len(idx))
        obs_bin[d, idx] = 1.0
        # steps until next observation: distance to the next index in `idx`
        # (past the last observation: distance to the series end, matching the
        # backward-counting loop this replaces)
        t_arange = np.arange(T)
        pos = np.searchsorted(idx, t_arange)
        dist = np.where(
            pos < len(idx), idx[np.minimum(pos, len(idx) - 1)] - t_arange, T - t_arange
        )
        time_till[d] = np.where(obs_bin[d] > 0, 0, dist)
    return obs, obs_bin, time_till
