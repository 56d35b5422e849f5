"""Hamiltonian Monte Carlo with dual-averaging step-size adaptation.

Gold-standard validator for the VI posteriors (BASELINE.json north star; the
reference has no MCMC at all — SURVEY.md §4). Chains are vectorized with
``vmap`` and shard across the mesh's ``chains``/``particles`` axis like any
leading-axis batch; the dual-averaging statistic is a mean over chains, which
XLA lowers to a psum when the chain axis is sharded.

Dual averaging follows Hoffman & Gelman (2014), Algorithm 5 defaults:
gamma=0.05, t0=10, kappa=0.75, target acceptance delta=0.8.
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
    t = state.t + 1.0
    h_avg = (1.0 - 1.0 / (t + t0)) * state.h_avg + (target - accept_prob) / (t + t0)
    log_step = state.mu - jnp.sqrt(t) / gamma * h_avg
    eta = t ** (-kappa)
    log_step_avg = eta * log_step + (1.0 - eta) * state.log_step_avg
    return DualAveragingState(log_step, log_step_avg, h_avg, state.mu, t)


def _leapfrog(grad_fn, q, p, step_size, num_steps):
    def body(_, qp):
        q, p = qp
        p = p + 0.5 * step_size * grad_fn(q)
        q = q + step_size * p
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
):
    """Run HMC chains. ``init_q``: (chains, dim). Returns (samples
    (num_samples, chains, dim), diagnostics dict)."""
    value_and_grad = jax.value_and_grad(log_prob_fn)
    grad_fn = jax.grad(log_prob_fn)

    def one_transition(q, key, eps):
        k_mom, k_acc = jax.random.split(key)
        p0 = jax.random.normal(k_mom, q.shape)
        logp0, _ = value_and_grad(q)
        h0 = logp0 - 0.5 * jnp.sum(p0 * p0)
        q1, p1 = _leapfrog(grad_fn, q, p0, eps, num_leapfrog)
        logp1 = log_prob_fn(q1)
        h1 = logp1 - 0.5 * jnp.sum(p1 * p1)
        log_accept = jnp.minimum(0.0, h1 - h0)
        # guard divergences
        log_accept = jnp.where(jnp.isfinite(log_accept), log_accept, -jnp.inf)
        accept = jnp.log(jax.random.uniform(k_acc, ())) < log_accept
        q_new = jnp.where(accept, q1, q)
        return q_new, jnp.exp(log_accept)

    v_transition = jax.vmap(one_transition, in_axes=(0, 0, None))
    n_chains = init_q.shape[0]

    def warmup_step(carry, key):
        q, da = carry
        keys = jax.random.split(key, n_chains)
        q, acc = v_transition(q, keys, jnp.exp(da.log_step))
        da = da_update(da, jnp.mean(acc), target=target_accept)
        return (q, da), jnp.mean(acc)

    def sample_step(carry, key):
        q, eps = carry
        keys = jax.random.split(key, n_chains)
        q, acc = v_transition(q, keys, eps)
        return (q, eps), (q, jnp.mean(acc))

    k_warm, k_samp = jax.random.split(key)
    (q, da), warm_acc = jax.lax.scan(
        warmup_step, (init_q, da_init(step_size)), jax.random.split(k_warm, num_warmup)
    )
    eps = jnp.exp(da.log_step_avg)
    (_, _), (samples, acc) = jax.lax.scan(
        sample_step, (q, eps), jax.random.split(k_samp, num_samples)
    )
    return samples, {
        "step_size": eps,
        "warmup_accept": warm_acc,
        "accept": acc,
    }
