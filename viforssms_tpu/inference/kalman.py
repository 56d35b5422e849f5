"""Exact Kalman filter/smoother for the AR(1) SSM — the integration oracle.

The reference validated itself only by eyeballing TensorBoard histograms
(SURVEY.md §4). For AR(1) with fixed theta the posterior is exactly Gaussian:
this module computes the marginal evidence log p(y | theta) and the smoothing
moments, giving hard targets for the VI stack (ELBO <= evidence, tight at
convergence; posterior path means must match the smoother).

Model (AR.py:175-176, 169-170):
    x_t = theta1 * x_{t-1} + theta0 + eps,  eps ~ N(0, exp(theta2)^2)
    y_t = x_t + nu,                          nu ~ N(0, obs_std^2), observed steps only
    x_0 = x0 (known).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def kalman_ar1(obs, obs_bin, theta, x0, obs_std):
    """Returns (log_evidence, smoothed_means, smoothed_vars) for steps 1..T."""
    theta0, theta1, log_sigma = theta
    q = jnp.exp(log_sigma) ** 2  # transition variance
    r = obs_std**2

    def filter_step(carry, inp):
        m, P, ll = carry
        y, b = inp
        # predict
        m_pred = theta1 * m + theta0
        P_pred = theta1**2 * P + q
        # update (only on observed steps)
        S = P_pred + r
        K = P_pred / S
        innov = y - m_pred
        m_upd = m_pred + K * innov
        P_upd = (1.0 - K) * P_pred
        ll_step = -0.5 * (jnp.log(2 * jnp.pi * S) + innov**2 / S)
        m_new = jnp.where(b > 0, m_upd, m_pred)
        P_new = jnp.where(b > 0, P_upd, P_pred)
        ll = ll + jnp.where(b > 0, ll_step, 0.0)
        return (m_new, P_new, ll), (m_pred, P_pred, m_new, P_new)

    init = (jnp.asarray(x0, jnp.float32), jnp.asarray(0.0, jnp.float32), 0.0)
    (mT, PT, ll), (m_pred, P_pred, m_filt, P_filt) = jax.lax.scan(
        filter_step, init, (jnp.asarray(obs), jnp.asarray(obs_bin))
    )

    # RTS smoother
    def smooth_step(carry, inp):
        m_next_s, P_next_s = carry
        m_f, P_f, m_p, P_p = inp
        C = P_f * theta1 / P_p
        m_s = m_f + C * (m_next_s - m_p)
        P_s = P_f + C**2 * (P_next_s - P_p)
        return (m_s, P_s), (m_s, P_s)

    # iterate backwards over t = T-1 .. 1 (inputs at t pair with t+1 predictions)
    inputs = (m_filt[:-1], P_filt[:-1], m_pred[1:], P_pred[1:])
    (_, _), (m_s_rev, P_s_rev) = jax.lax.scan(
        smooth_step, (mT, PT), jax.tree.map(lambda a: a[::-1], inputs)
    )
    m_s = jnp.concatenate([m_s_rev[::-1], jnp.array([mT])])
    P_s = jnp.concatenate([P_s_rev[::-1], jnp.array([PT])])
    return ll, m_s, P_s


def ffbs_ar1(key, obs, obs_bin, theta, x0, obs_std, num_draws: int = 1):
    """Forward-filter backward-sampling: EXACT joint posterior path draws.

    Returns (num_draws, T) samples from p(x_{1:T} | y, theta) — the
    simulation smoother (Carter & Kohn 1994). Together with exact-evidence
    MH over theta this yields draws from the exact JOINT posterior for the
    BASELINE 2-MC-SE bar, not just marginal smoother moments. No reference
    counterpart (SURVEY.md §4).
    """
    theta0, theta1, log_sigma = theta
    q = jnp.exp(log_sigma) ** 2
    r = obs_std**2

    def filter_step(carry, inp):
        m, P = carry
        y, b = inp
        m_pred = theta1 * m + theta0
        P_pred = theta1**2 * P + q
        S = P_pred + r
        K = P_pred / S
        m_upd = m_pred + K * (y - m_pred)
        P_upd = (1.0 - K) * P_pred
        m_new = jnp.where(b > 0, m_upd, m_pred)
        P_new = jnp.where(b > 0, P_upd, P_pred)
        return (m_new, P_new), (m_new, P_new)

    init = (jnp.asarray(x0, jnp.float32), jnp.asarray(0.0, jnp.float32))
    (mT, PT), (m_f, P_f) = jax.lax.scan(
        filter_step, init, (jnp.asarray(obs), jnp.asarray(obs_bin))
    )

    def one_draw(k):
        kT, kb = jax.random.split(k)
        xT = mT + jnp.sqrt(PT) * jax.random.normal(kT, ())

        def back_step(x_next, inp):
            m, P, kk = inp
            # p(x_t | x_{t+1}, y_{1:t}) ~ N(m + C (x_{t+1} - a m - c), P - C^2 S)
            P_pred = theta1**2 * P + q
            C = P * theta1 / P_pred
            mean = m + C * (x_next - (theta1 * m + theta0))
            var = jnp.maximum(P - C * theta1 * P, 0.0)  # = P - (P a)^2 / P_pred
            x = mean + jnp.sqrt(var) * jax.random.normal(kk, ())
            return x, x

        ks = jax.random.split(kb, m_f.shape[0] - 1)
        inputs = (m_f[:-1][::-1], P_f[:-1][::-1], ks)
        _, xs_rev = jax.lax.scan(back_step, xT, inputs)
        return jnp.concatenate([xs_rev[::-1], jnp.array([xT])])

    return jax.vmap(one_draw)(jax.random.split(key, num_draws))
