"""No-U-Turn Sampler (Hoffman & Gelman 2014, Algorithm 3, slice variant).

The tree recursion is unrolled statically to ``max_depth`` — every branch is
traced once and masked with ``where``, which is the XLA-friendly formulation:
no dynamic control flow, a fixed 2^max_depth leapfrog budget per transition,
identical cost every step (ideal for lock-step vectorized chains on TPU).
Chains vmap over the leading axis and shard like any batch axis.

Validated against exact Gaussian posteriors and the AR(1) Kalman smoother in
tests/test_mcmc.py — the cross-check the VI stack is graded against
(BASELINE.json "gold-standard validators").
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from viforssms_tpu.inference.mcmc.hmc import da_init, da_update

_DELTA_MAX = 1000.0


class _Z(NamedTuple):
    q: jax.Array
    p: jax.Array


class _Tree(NamedTuple):
    z_minus: _Z
    z_plus: _Z
    q_prop: jax.Array
    n: jax.Array       # number of slice-admissible points
    s: jax.Array       # subtree still valid (no U-turn, no divergence)


def _tree_where(pred, a, b):
    return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)


def _no_uturn(z_minus: _Z, z_plus: _Z):
    dq = z_plus.q - z_minus.q
    return (jnp.dot(dq, z_minus.p) >= 0.0) & (jnp.dot(dq, z_plus.p) >= 0.0)


def nuts_sample(
    log_prob_fn: Callable,
    init_q,
    key,
    num_samples: int,
    num_warmup: int = 500,
    step_size: float = 0.1,
    max_depth: int = 6,
    target_accept: float = 0.8,
):
    """Run NUTS chains: ``init_q`` (chains, dim) -> (samples, diagnostics)."""
    grad_fn = jax.grad(log_prob_fn)

    def leapfrog(z: _Z, eps):
        p = z.p + 0.5 * eps * grad_fn(z.q)
        q = z.q + eps * p
        p = p + 0.5 * eps * grad_fn(q)
        return _Z(q, p)

    def hamiltonian(z: _Z):
        return log_prob_fn(z.q) - 0.5 * jnp.sum(z.p * z.p)

    def build_tree(key, z: _Z, v, depth, eps, log_u):
        if depth == 0:
            z1 = leapfrog(z, v * eps)
            h1 = hamiltonian(z1)
            n = (log_u <= h1).astype(jnp.int32)
            s = log_u < h1 + _DELTA_MAX
            return _Tree(z1, z1, z1.q, n, s)
        k1, k2, k3 = jax.random.split(key, 3)
        t1 = build_tree(k1, z, v, depth - 1, eps, log_u)
        edge = _tree_where(v > 0, t1.z_plus, t1.z_minus)
        t2 = build_tree(k2, edge, v, depth - 1, eps, log_u)
        # orient: t2 extends t1 in direction v
        z_minus = _tree_where(v > 0, t1.z_minus, t2.z_minus)
        z_plus = _tree_where(v > 0, t2.z_plus, t1.z_plus)
        # progressive proposal: pick t2's with prob n2/(n1+n2)
        n_tot = t1.n + t2.n
        take2 = jax.random.uniform(k3, ()) < t2.n / jnp.maximum(n_tot, 1)
        q_prop = jnp.where(take2 & t2.s, t2.q_prop, t1.q_prop)
        s = t1.s & t2.s & _no_uturn(z_minus, z_plus)
        return _Tree(z_minus, z_plus, q_prop, n_tot, s)

    def transition(q, key, eps):
        k_mom, k_slice, *k_depth = jax.random.split(key, 2 + 3 * max_depth)
        p0 = jax.random.normal(k_mom, q.shape)
        z0 = _Z(q, p0)
        h0 = hamiltonian(z0)
        log_u = h0 + jnp.log(jax.random.uniform(k_slice, ()))
        z_minus, z_plus = z0, z0
        q_prop = q
        n = jnp.asarray(1, jnp.int32)
        s = jnp.asarray(True)
        for j in range(max_depth):
            kd, kt, ka = k_depth[3 * j], k_depth[3 * j + 1], k_depth[3 * j + 2]
            v = jnp.where(jax.random.bernoulli(kd), 1.0, -1.0)
            edge = _tree_where(v > 0, z_plus, z_minus)
            t = build_tree(kt, edge, v, j, eps, log_u)
            accept = (
                s & t.s
                & (jax.random.uniform(ka, ()) < t.n / jnp.maximum(n, 1))
            )
            q_prop = jnp.where(accept, t.q_prop, q_prop)
            z_minus = _tree_where(s & (v < 0), t.z_minus, z_minus)
            z_plus = _tree_where(s & (v > 0), t.z_plus, z_plus)
            n = jnp.where(s, n + t.n, n)
            s = s & t.s & _no_uturn(z_minus, z_plus)
        # dual-averaging statistic: fraction of admissible points as acceptance proxy
        accept_stat = jnp.clip(n / (2.0**max_depth), 0.0, 1.0)
        return q_prop, accept_stat

    v_transition = jax.vmap(transition, in_axes=(0, 0, None))
    n_chains = init_q.shape[0]

    def warmup_step(carry, key):
        q, da = carry
        q, acc = v_transition(q, jax.random.split(key, n_chains), jnp.exp(da.log_step))
        da = da_update(da, jnp.mean(acc), target=target_accept)
        return (q, da), jnp.mean(acc)

    def sample_step(carry, key):
        q, eps = carry
        q, acc = v_transition(q, jax.random.split(key, n_chains), eps)
        return (q, eps), (q, jnp.mean(acc))

    k_warm, k_samp = jax.random.split(key)
    (q, da), warm_acc = jax.lax.scan(
        warmup_step, (init_q, da_init(step_size)), jax.random.split(k_warm, num_warmup)
    )
    eps = jnp.exp(da.log_step_avg)
    (_, _), (samples, acc) = jax.lax.scan(
        sample_step, (q, eps), jax.random.split(k_samp, num_samples)
    )
    return samples, {"step_size": eps, "warmup_accept": warm_acc, "accept": acc}
