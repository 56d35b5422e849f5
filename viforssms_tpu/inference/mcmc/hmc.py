"""Hamiltonian Monte Carlo with dual-averaging and mass-matrix adaptation.

Gold-standard validator for the VI posteriors (BASELINE.json north star; the
reference has no MCMC at all — SURVEY.md §4). Chains are vectorized with
``vmap`` and shard across the mesh's ``chains``/``particles`` axis like any
leading-axis batch; the dual-averaging statistic is a mean over chains, which
XLA lowers to a psum when the chain axis is sharded.

Dual averaging follows Hoffman & Gelman (2014), Algorithm 5 defaults:
gamma=0.05, t0=10, kappa=0.75, target acceptance delta=0.8.

Mass-matrix adaptation (``adapt_mass=True``) uses a two-phase warmup:
phase 1 adapts the step size under a unit metric while accumulating
chain-pooled Welford statistics of the position (skipping the first quarter
of the phase as burn-in); the regularized posterior (co)variance then becomes
the inverse mass for phase 2, which re-runs dual averaging under the new
metric. This is the single-window simplification of Stan's windowed scheme —
two compiled scans, no dynamic window bookkeeping inside the trace.
``dense_mass=True`` estimates the full covariance (inverse metric
M^{-1} = Σ, momenta p ~ N(0, Σ^{-1}) drawn through the Cholesky factor of Σ),
which additionally removes posterior CORRELATIONS from the conditioning —
right for small-dimension strongly-correlated targets like theta posteriors;
diagonal is the default for high-dimensional path targets.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class DualAveragingState(NamedTuple):
    log_step: jax.Array
    log_step_avg: jax.Array
    h_avg: jax.Array
    mu: jax.Array
    t: jax.Array


def da_init(step_size: float) -> DualAveragingState:
    ls = jnp.log(step_size)
    return DualAveragingState(
        log_step=ls, log_step_avg=ls, h_avg=jnp.zeros(()), mu=jnp.log(10.0) + ls,
        t=jnp.zeros(()),
    )


def da_update(state: DualAveragingState, accept_prob, target=0.8,
              gamma=0.05, t0=10.0, kappa=0.75) -> DualAveragingState:
    # A NaN Hamiltonian (f32 overflow on a too-large step) yields a NaN
    # accept statistic; un-guarded it poisons h_avg -> log_step = NaN for
    # every subsequent iteration and the sampler never recovers. Treat
    # non-finite acceptance as 0 (maximal "too big" signal): the step
    # shrinks and adaptation proceeds.
    accept_prob = jnp.where(jnp.isfinite(accept_prob), accept_prob, 0.0)
    t = state.t + 1.0
    h_avg = (1.0 - 1.0 / (t + t0)) * state.h_avg + (target - accept_prob) / (t + t0)
    log_step = state.mu - jnp.sqrt(t) / gamma * h_avg
    eta = t ** (-kappa)
    log_step_avg = eta * log_step + (1.0 - eta) * state.log_step_avg
    return DualAveragingState(log_step, log_step_avg, h_avg, state.mu, t)


# ---------------------------------------------------------------------------
# Chain-pooled Welford accumulation (for the diagonal metric)
# ---------------------------------------------------------------------------


class WelfordState(NamedTuple):
    count: jax.Array  # scalar
    mean: jax.Array   # (dim,)
    m2: jax.Array     # (dim,)


def welford_init(dim: int) -> WelfordState:
    return WelfordState(jnp.zeros(()), jnp.zeros((dim,)), jnp.zeros((dim,)))


def welford_update_batch(w: WelfordState, x) -> WelfordState:
    """Merge a (chains, dim) batch into the running stats (Chan et al.)."""
    nb = jnp.asarray(x.shape[0], x.dtype)
    mean_b = jnp.mean(x, axis=0)
    m2_b = jnp.sum((x - mean_b) ** 2, axis=0)
    n_new = w.count + nb
    delta = mean_b - w.mean
    mean_new = w.mean + delta * nb / n_new
    m2_new = w.m2 + m2_b + delta * delta * w.count * nb / n_new
    return WelfordState(n_new, mean_new, m2_new)


def welford_variance(w: WelfordState, regularize: bool = True):
    """Sample variance, Stan-regularized toward 1e-3 for small counts."""
    var = w.m2 / jnp.maximum(w.count - 1.0, 1.0)
    if regularize:
        n = w.count
        var = (n / (n + 5.0)) * var + 1e-3 * (5.0 / (n + 5.0))
    return var


class WelfordCovState(NamedTuple):
    count: jax.Array  # scalar
    mean: jax.Array   # (dim,)
    m2: jax.Array     # (dim, dim) sum of outer products of residuals


def welford_cov_init(dim: int) -> WelfordCovState:
    return WelfordCovState(jnp.zeros(()), jnp.zeros((dim,)),
                           jnp.zeros((dim, dim)))


def welford_cov_update_batch(w: WelfordCovState, x) -> WelfordCovState:
    """Merge a (chains, dim) batch into running covariance stats."""
    nb = jnp.asarray(x.shape[0], x.dtype)
    mean_b = jnp.mean(x, axis=0)
    r = x - mean_b
    m2_b = r.T @ r
    n_new = w.count + nb
    delta = mean_b - w.mean
    mean_new = w.mean + delta * nb / n_new
    m2_new = w.m2 + m2_b + jnp.outer(delta, delta) * w.count * nb / n_new
    return WelfordCovState(n_new, mean_new, m2_new)


def welford_covariance(w: WelfordCovState, regularize: bool = True):
    """Sample covariance, Stan-regularized toward 1e-3 * I."""
    cov = w.m2 / jnp.maximum(w.count - 1.0, 1.0)
    if regularize:
        n = w.count
        dim = cov.shape[0]
        cov = (n / (n + 5.0)) * cov + 1e-3 * (5.0 / (n + 5.0)) * jnp.eye(dim)
    return cov


def _metric_fns(inv_mass):
    """(sample_momentum, kinetic, velocity) for a diagonal (1-D array) or
    dense (2-D array = Cholesky of the inverse metric Σ) mass matrix."""
    if inv_mass.ndim == 1:
        def sample_p(key, shape):
            return jax.random.normal(key, shape) * jax.lax.rsqrt(inv_mass)

        return (sample_p,
                lambda p: 0.5 * jnp.sum(p * p * inv_mass),
                lambda p: p * inv_mass)
    chol = inv_mass  # lower Cholesky: Σ = chol @ chol.T

    def sample_p(key, shape):
        # p ~ N(0, Σ^{-1}): solve cholᵀ p = ξ
        xi = jax.random.normal(key, shape)
        return jax.scipy.linalg.solve_triangular(chol.T, xi, lower=False)

    def velocity(p):
        return chol @ (chol.T @ p)

    return sample_p, lambda p: 0.5 * jnp.dot(p, velocity(p)), velocity


# ---------------------------------------------------------------------------
# HMC
# ---------------------------------------------------------------------------


def _leapfrog(grad_fn, q, p, step_size, num_steps, velocity):
    def body(_, qp):
        q, p = qp
        p = p + 0.5 * step_size * grad_fn(q)
        q = q + step_size * velocity(p)
        p = p + 0.5 * step_size * grad_fn(q)
        return q, p

    return jax.lax.fori_loop(0, num_steps, body, (q, p))


def hmc_sample(
    log_prob_fn: Callable,
    init_q,
    key,
    num_samples: int,
    num_warmup: int = 500,
    step_size: float = 0.1,
    num_leapfrog: int = 32,
    target_accept: float = 0.8,
    adapt_mass: bool = False,
    dense_mass: bool = False,
):
    """Run HMC chains. ``init_q``: (chains, dim). Returns (samples
    (num_samples, chains, dim), diagnostics dict). ``dense_mass`` implies
    mass adaptation with the full covariance metric (see module docstring)."""
    value_and_grad = jax.value_and_grad(log_prob_fn)
    grad_fn = jax.grad(log_prob_fn)
    n_chains, dim = init_q.shape
    adapt_mass = adapt_mass or dense_mass

    def one_transition(q, key, eps, inv_mass):
        sample_p, kinetic, velocity = _metric_fns(inv_mass)
        k_mom, k_acc = jax.random.split(key)
        p0 = sample_p(k_mom, q.shape)
        logp0, _ = value_and_grad(q)
        h0 = logp0 - kinetic(p0)
        q1, p1 = _leapfrog(grad_fn, q, p0, eps, num_leapfrog, velocity)
        logp1 = log_prob_fn(q1)
        h1 = logp1 - kinetic(p1)
        log_accept = jnp.minimum(0.0, h1 - h0)
        # guard divergences
        log_accept = jnp.where(jnp.isfinite(log_accept), log_accept, -jnp.inf)
        accept = jnp.log(jax.random.uniform(k_acc, ())) < log_accept
        q_new = jnp.where(accept, q1, q)
        return q_new, jnp.exp(log_accept)

    v_transition = jax.vmap(one_transition, in_axes=(0, 0, None, None))

    if dense_mass:
        w_init = lambda: welford_cov_init(dim)
        w_update = welford_cov_update_batch
    else:
        w_init = lambda: welford_init(dim)
        w_update = welford_update_batch

    def warmup_phase(key, q, da, inv_mass, num_steps, collect_from):
        """Scan of adaptation steps; Welford-pools q for t >= collect_from."""

        def step(carry, inp):
            t, key = inp
            q, da, w = carry
            keys = jax.random.split(key, n_chains)
            q, acc = v_transition(q, keys, jnp.exp(da.log_step), inv_mass)
            da = da_update(da, jnp.mean(acc), target=target_accept)
            w_new = w_update(w, q)
            w = jax.tree.map(
                lambda a, b: jnp.where(t >= collect_from, a, b), w_new, w)
            return (q, da, w), jnp.mean(acc)

        keys = jax.random.split(key, num_steps)
        (q, da, w), acc = jax.lax.scan(
            step, (q, da, w_init()), (jnp.arange(num_steps), keys))
        return q, da, w, acc

    k_warm, k_warm2, k_samp = jax.random.split(key, 3)
    inv_mass = jnp.ones((dim,), init_q.dtype)
    if adapt_mass:
        n1 = num_warmup // 2
        q, da, w, acc1 = warmup_phase(
            k_warm, init_q, da_init(step_size), inv_mass, n1, n1 // 4)
        if dense_mass:
            cov = welford_covariance(w).astype(init_q.dtype)
            inv_mass = jnp.linalg.cholesky(cov)  # Σ = L Lᵀ (inverse metric)
        else:
            inv_mass = welford_variance(w).astype(init_q.dtype)
        q, da, _, acc2 = warmup_phase(
            k_warm2, q, da_init(float(step_size)), inv_mass,
            num_warmup - n1, num_warmup)  # no collection in phase 2
        warm_acc = jnp.concatenate([acc1, acc2])
    else:
        q, da, _, warm_acc = warmup_phase(
            k_warm, init_q, da_init(step_size), inv_mass, num_warmup, num_warmup)

    eps = jnp.exp(da.log_step_avg)

    def sample_step(carry, key):
        q, eps = carry
        keys = jax.random.split(key, n_chains)
        q, acc = v_transition(q, keys, eps, inv_mass)
        return (q, eps), (q, jnp.mean(acc))

    (_, _), (samples, acc) = jax.lax.scan(
        sample_step, (q, eps), jax.random.split(k_samp, num_samples)
    )
    return samples, {
        "step_size": eps,
        "warmup_accept": warm_acc,
        "accept": acc,
        # diagonal: the adapted variances; dense: Cholesky of the inverse metric
        "inv_mass": inv_mass,
    }
