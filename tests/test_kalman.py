"""Kalman filter/smoother oracle vs a brute-force joint-Gaussian computation."""

import numpy as np
from scipy import stats

from viforssms_tpu.inference.kalman import kalman_ar1


def _brute_force(obs, obs_bin, theta, x0, obs_std):
    theta0, theta1, log_sigma = theta
    q = np.exp(log_sigma) ** 2
    T = len(obs)
    # joint distribution of x_{1:T} given x_0
    m = np.zeros(T)
    prev = x0
    for t in range(T):
        m[t] = theta1 * prev + theta0
        prev = m[t]
    P = np.zeros((T, T))
    # cov recursion: P[t,t] = theta1^2 P[t-1,t-1] + q; P[s,t] = theta1^{t-s} P[s,s]
    P[0, 0] = q
    for t in range(1, T):
        P[t, t] = theta1**2 * P[t - 1, t - 1] + q
    for s in range(T):
        for t in range(s + 1, T):
            P[s, t] = P[t, s] = theta1 ** (t - s) * P[s, s]
    idx = np.where(obs_bin > 0)[0]
    H = np.eye(T)[idx]
    S = H @ P @ H.T + obs_std**2 * np.eye(len(idx))
    ll = stats.multivariate_normal.logpdf(obs[idx], H @ m, S)
    # smoother moments by conditioning
    K = P @ H.T @ np.linalg.inv(S)
    m_s = m + K @ (obs[idx] - H @ m)
    P_s = P - K @ H @ P
    return ll, m_s, np.diag(P_s)


def test_kalman_matches_brute_force():
    rng = np.random.default_rng(0)
    T = 12
    theta = (0.7, 0.85, np.log(1.3))
    x0 = 2.0
    obs = rng.normal(size=T).astype(np.float32) + 1.5
    obs_bin = np.array([1, 0, 1, 1, 0, 0, 1, 1, 1, 0, 1, 1], np.float32)
    ll, m_s, P_s = kalman_ar1(obs, obs_bin, theta, x0, obs_std=0.9)
    ll_b, m_b, P_b = _brute_force(
        np.asarray(obs, float), np.asarray(obs_bin, float), theta, x0, 0.9
    )
    np.testing.assert_allclose(float(ll), ll_b, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(m_s), m_b, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(P_s), P_b, rtol=1e-3, atol=1e-3)


def test_ffbs_matches_smoother_moments():
    """FFBS draws are exact joint posterior samples: their per-step means and
    variances must match the RTS smoother, and lag-1 autocovariance must be
    positive (a property marginal-moment comparison cannot see)."""
    import jax

    from viforssms_tpu.data.generate import generate_ar1
    from viforssms_tpu.inference.kalman import ffbs_ar1, kalman_ar1

    theta = (1.0, 0.8, 0.0)
    s = generate_ar1(T=40, impute=2, x0=5.0, theta=(1.0, 0.8, 1.0), obs_std=0.7, seed=3)
    _, m_s, P_s = kalman_ar1(s.obs, s.obs_bin, theta, 5.0, 0.7)
    draws = np.asarray(ffbs_ar1(jax.random.key(0), s.obs, s.obs_bin, theta,
                                5.0, 0.7, num_draws=4000))
    se = np.sqrt(np.asarray(P_s) / draws.shape[0])
    assert np.max(np.abs(draws.mean(0) - np.asarray(m_s)) / (se + 1e-9)) < 4.5
    np.testing.assert_allclose(draws.var(0), np.asarray(P_s), rtol=0.2, atol=5e-3)
    c = draws - draws.mean(0)
    lag1 = np.mean(c[:, 1:] * c[:, :-1], axis=0)
    assert np.mean(lag1 > 0) > 0.9
