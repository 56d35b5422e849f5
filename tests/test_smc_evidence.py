"""Oracle tests for the particle-filter evidence functions (round 4).

These estimates drive the production forward-KL theta refit
(``scripts/theta_smc_refit.py``), so they get exact oracles:

  * ``ssm2d_smc_evidence`` on a LINEAR-Gaussian 2-D SSM vs a hand-rolled
    Kalman filter's exact marginal likelihood;
  * ``sv_smc_evidence`` on a short series vs brute-force marginalization
    (the same estimator with no resampling and a huge particle count is
    plain prior importance sampling, which converges for tiny T);
  * unbiasedness-style sanity: the estimate concentrates as N grows.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from viforssms_tpu.inference.validate import ssm2d_smc_evidence, sv_smc_evidence
from viforssms_tpu.models.stochastic_volatility import StochasticVolatility


@dataclasses.dataclass(frozen=True)
class _Linear2D:
    """x' = A x + b + eps, eps ~ N(0, Q diag); y ~ N(x, obs_std)."""

    A: tuple = ((0.9, 0.05), (-0.05, 0.9))
    b: tuple = (0.1, -0.1)
    q: tuple = (0.3, 0.2)
    obs_std: float = 0.5

    def predictive_step(self, key, x, theta):
        del theta
        A = jnp.asarray(self.A)
        z = jax.random.normal(key, x.shape)
        return x @ A.T + jnp.asarray(self.b) + z * jnp.asarray(self.q)


def _kalman_evidence_2d(model, obs, obs_bin, x0):
    """Exact log p(y) for the linear model: standard KF over 2-D state."""
    A = np.asarray(model.A)
    b = np.asarray(model.b)
    Q = np.diag(np.asarray(model.q, np.float64) ** 2)
    R = np.eye(2) * model.obs_std ** 2
    m = np.asarray(x0, np.float64)
    P = np.zeros((2, 2))
    log_z = 0.0
    T = obs.shape[1]
    for t in range(T):
        m = A @ m + b
        P = A @ P @ A.T + Q
        mask = obs_bin[:, t] > 0
        if mask.any():
            idx = np.where(mask)[0]
            H = np.eye(2)[idx]
            y = obs[idx, t]
            S = H @ P @ H.T + R[np.ix_(idx, idx)]
            resid = y - H @ m
            log_z += (-0.5 * (resid @ np.linalg.solve(S, resid))
                      - 0.5 * np.linalg.slogdet(2 * np.pi * S)[1])
            K = P @ H.T @ np.linalg.inv(S)
            m = m + K @ resid
            P = (np.eye(2) - K @ H) @ P
    return log_z


def _simulate_linear(model, x0, T, seed):
    rng = np.random.RandomState(seed)
    A, b, q = np.asarray(model.A), np.asarray(model.b), np.asarray(model.q)
    x = np.asarray(x0, np.float64)
    xs = []
    for _ in range(T):
        x = A @ x + b + q * rng.normal(size=2)
        xs.append(x.copy())
    xs = np.stack(xs, axis=1)                       # (2, T)
    obs = xs + model.obs_std * rng.normal(size=xs.shape)
    obs_bin = (rng.rand(2, T) < 0.6).astype(np.float32)
    return obs.astype(np.float32), obs_bin


def test_ssm2d_evidence_matches_kalman():
    model = _Linear2D()
    x0 = np.asarray([0.5, -0.5], np.float32)
    obs, obs_bin = _simulate_linear(model, x0, T=40, seed=0)
    exact = _kalman_evidence_2d(model, obs.astype(np.float64), obs_bin, x0)
    theta = jnp.zeros(1)
    ev = jax.jit(lambda k: ssm2d_smc_evidence(model, obs, obs_bin, x0,
                                              theta, 4096, k))
    ests = np.asarray([float(ev(jax.random.key(s))) for s in range(8)])
    # PF evidence is unbiased for p(y); in log space it is biased low by
    # ~var/2 — compare the log-mean-exp of replicates to the exact value
    lme = float(jax.nn.logsumexp(jnp.asarray(ests)) - np.log(len(ests)))
    assert abs(lme - exact) < 1.0, (lme, exact, ests)
    assert ests.std() < 1.0                          # concentrated at N=4096


def test_ssm2d_evidence_concentrates_with_particles():
    model = _Linear2D()
    x0 = np.asarray([0.0, 0.0], np.float32)
    obs, obs_bin = _simulate_linear(model, x0, T=30, seed=1)
    theta = jnp.zeros(1)

    def sd_at(n):
        ev = jax.jit(lambda k: ssm2d_smc_evidence(model, obs, obs_bin, x0,
                                                  theta, n, k))
        return np.asarray([float(ev(jax.random.key(s)))
                           for s in range(8)]).std()

    assert sd_at(2048) < sd_at(64)


def test_sv_evidence_matches_bruteforce_marginal():
    model = StochasticVolatility(dt=1.0)
    rng = np.random.RandomState(2)
    T = 8
    theta = jnp.asarray([0.001, -0.6, -2.5, -0.7], jnp.float32)
    # simulate a short price series under the model
    y = [1.0]
    v = -7.0
    for _ in range(T):
        y.append(y[-1] + 0.001 * y[-1]
                 + abs(y[-1]) * np.exp(0.5 * v) * rng.normal())
        v = v + (-0.6 - np.exp(-2.5) * v) + np.exp(-0.7) * rng.normal()
    obs = np.asarray(y, np.float32)
    x0 = -7.0

    ev = jax.jit(lambda k: sv_smc_evidence(model, obs, x0, theta, 2048, k))
    pf = np.asarray([float(ev(jax.random.key(s))) for s in range(8)])
    pf_lme = float(jax.nn.logsumexp(jnp.asarray(pf)) - np.log(len(pf)))

    # brute force: v-paths from the prior transition, weight by the price
    # transitions — plain importance sampling, convergent at T=8
    M = 400_000
    rngb = np.random.RandomState(3)
    v = np.full(M, x0)
    lw = np.zeros(M)
    for t in range(T):
        yp, yn = obs[t], obs[t + 1]
        s = np.abs(yp) * np.exp(0.5 * v)
        lw += (-0.5 * ((yn - yp - 0.001 * yp) / s) ** 2
               - np.log(s) - 0.5 * np.log(2 * np.pi))
        v = v + (-0.6 - np.exp(-2.5) * v) + np.exp(-0.7) * rngb.normal(size=M)
    from scipy.special import logsumexp

    brute = float(logsumexp(lw) - np.log(M))
    assert abs(pf_lme - brute) < 0.15, (pf_lme, brute)
