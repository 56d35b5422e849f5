"""Particle marginal Metropolis–Hastings (PMMH) — exact theta inference.

The third gold-standard validator (after HMC/NUTS on the joint and bootstrap
SMC for fixed-theta evidence; neither exists in the reference, SURVEY.md §4).
PMMH (Andrieu, Doucet, Holenstein 2010) targets the EXACT marginal posterior
p(theta | y): a random-walk Metropolis chain over theta whose likelihood is
the unbiased bootstrap-SMC evidence estimate — the pseudo-marginal property
makes the chain exact despite the noisy likelihood, so it validates the VI
theta posterior directly, without flow or joint-path approximations.

TPU shape: the chain is a ``lax.scan`` (the SMC filter is itself a scan
nested inside), compiled once; independent chains vmap over a leading axis
and shard across the mesh like every other sampler here (``parallel/mesh.py``).
``dispatch_chunk`` splits the scan into several device dispatches while
carrying the FULL pseudo-marginal state (current theta, RETAINED evidence
estimate, adapted proposal scale, PRNG key) across chunk boundaries — the
chain is bitwise the single-dispatch chain. This matters on remote/tunneled
accelerators whose workers kill executions that run for many minutes (one
16k-step chain with a nested T=5000 filter is such an execution).

Proposal step size adapts toward the 0.234 random-walk optimum during warmup
by Robbins–Monro on the acceptance probability, frozen afterwards (adaptation
during sampling would break detailed balance).

Pinned in tests/test_pmmh.py against an "ideal MH" chain that swaps the SMC
estimate for the exact Kalman evidence on AR(1): the two posteriors must
agree in their moments; chunked and single-dispatch runs must agree exactly.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class PMMHResult(NamedTuple):
    """All fields are host NumPy arrays: ``pmmh``/``pmmh_chains`` run a
    host-side dispatch loop (chunked scans) and are NOT jit/vmap-composable —
    wrap ``_pmmh_segment`` yourself if you need a pure traced chain."""

    thetas: np.ndarray       # (num_steps, D) chain states (includes warmup)
    log_posts: np.ndarray    # (num_steps,) retained log(Z_hat * prior)
    accepts: np.ndarray      # (num_steps,) 0/1 acceptance indicators
    accept_rate: np.ndarray  # mean acceptance over post-warmup steps
    step_scale: np.ndarray   # final adapted global proposal scale


def _pmmh_segment(carry, idxs, scales, log_evidence_fn, log_prior_fn,
                  warmup, target_accept):
    """Scan ``len(idxs)`` MH steps from ``carry`` = (theta, lp, log_s, key);
    ``idxs`` are GLOBAL step indices (Robbins–Monro gain continuity)."""

    def step(c, i):
        theta, lp, log_s, k = c
        k, k_prop, k_ev, k_acc = jax.random.split(k, 4)
        prop = theta + jnp.exp(log_s) * scales * jax.random.normal(
            k_prop, theta.shape, theta.dtype
        )
        lp_prop = log_evidence_fn(k_ev, prop) + log_prior_fn(prop)
        # Guard on the PROPOSAL only: -inf/NaN proposals (prior support
        # edges) are always rejected, but a finite proposal must always
        # escape a non-finite CURRENT state — guarding the difference would
        # map (finite - (-inf)) = +inf to reject and freeze the chain
        # forever when theta0 starts outside support.
        log_alpha = jnp.where(
            jnp.isfinite(lp_prop),
            jnp.where(jnp.isfinite(lp), lp_prop - lp, jnp.inf),
            -jnp.inf,
        )
        accept = jnp.log(jax.random.uniform(k_acc, ())) < log_alpha
        theta = jnp.where(accept, prop, theta)
        lp = jnp.where(accept, lp_prop, lp)
        # Robbins–Monro toward target_accept, warmup only
        p_acc = jnp.minimum(jnp.exp(log_alpha), 1.0)
        gain = jnp.where(i < warmup, (i.astype(log_s.dtype) + 10.0) ** -0.6, 0.0)
        log_s = log_s + gain * (p_acc - target_accept)
        return (theta, lp, log_s, k), (theta, lp, accept)

    return jax.lax.scan(step, carry, idxs)


def _chunk_bounds(num_steps: int, chunk: int):
    if chunk <= 0 or chunk >= num_steps:
        return [(0, num_steps)]
    bounds = [(s, min(s + chunk, num_steps)) for s in range(0, num_steps, chunk)]
    return bounds


def pmmh(
    key,
    log_evidence_fn: Callable,   # (key, theta) -> scalar log p_hat(y | theta)
    log_prior_fn: Callable,      # (theta,) -> scalar log p(theta)
    theta0,
    num_steps: int,
    warmup: int = 0,
    init_scale: float = 0.1,
    proposal_scales: Optional[jax.Array] = None,  # (D,) per-coordinate scales
    target_accept: float = 0.234,
    dispatch_chunk: int = 0,
) -> PMMHResult:
    """Run one PMMH chain of ``num_steps`` from ``theta0``.

    The current state's evidence estimate is RETAINED across iterations (never
    refreshed) — required for the pseudo-marginal chain to target the exact
    posterior; the retained estimate also carries across ``dispatch_chunk``
    boundaries. ``proposal_scales`` shapes the random walk per coordinate; the
    global multiplier ``exp(s)`` starts at ``init_scale`` and adapts during
    the first ``warmup`` steps only.

    NOT jit/vmap-composable (host-side chunked dispatch loop; see
    :class:`PMMHResult`) — compose over chains with :func:`pmmh_chains`.
    """
    theta0 = jnp.asarray(theta0)
    d = theta0.shape[0]
    scales = (jnp.ones(d, theta0.dtype) if proposal_scales is None
              else jnp.asarray(proposal_scales, theta0.dtype))

    key, k0 = jax.random.split(key)
    lp0 = log_evidence_fn(k0, theta0) + log_prior_fn(theta0)

    @jax.jit
    def seg(carry, idxs):
        return _pmmh_segment(carry, idxs, scales, log_evidence_fn,
                             log_prior_fn, warmup, target_accept)

    carry = (theta0, lp0, jnp.log(jnp.asarray(init_scale, theta0.dtype)), key)
    outs = []
    for s, e in _chunk_bounds(num_steps, dispatch_chunk):
        carry, out = seg(carry, jnp.arange(s, e))
        outs.append(jax.tree.map(np.asarray, out))
    thetas, lps, accepts = (np.concatenate([o[i] for o in outs]) for i in range(3))
    post = accepts[warmup:].astype(np.float32)
    return PMMHResult(
        thetas=thetas,
        log_posts=lps,
        accepts=accepts,
        accept_rate=np.asarray(post.mean() if num_steps > warmup else 0.0,
                               np.float32),
        step_scale=np.asarray(np.exp(np.asarray(carry[2]))),
    )


def pmmh_chains(key, log_evidence_fn, log_prior_fn, theta0s, num_steps: int,
                warmup: int = 0, init_scale: float = 0.1,
                proposal_scales=None, target_accept: float = 0.234,
                dispatch_chunk: int = 0) -> PMMHResult:
    """Independent PMMH chains vmapped over a leading chain axis.

    ``theta0s``: (C, D) initial states. Returns a PMMHResult whose fields all
    carry the leading chain axis; feed ``thetas`` (post-warmup, pooled) to
    ``mcmc.diagnostics`` for split R-hat / ESS like the other samplers.
    ``dispatch_chunk`` bounds the per-dispatch scan length (see module
    docstring); all chains advance together chunk by chunk."""
    theta0s = jnp.asarray(theta0s)
    C, d = theta0s.shape
    scales = (jnp.ones(d, theta0s.dtype) if proposal_scales is None
              else jnp.asarray(proposal_scales, theta0s.dtype))
    keys = jax.random.split(key, C)
    k0s = jax.vmap(lambda k: jax.random.split(k)[1])(keys)
    keys = jax.vmap(lambda k: jax.random.split(k)[0])(keys)
    lp0 = jax.vmap(lambda k, t: log_evidence_fn(k, t) + log_prior_fn(t))(
        k0s, theta0s)
    log_s0 = jnp.full((C,), jnp.log(jnp.asarray(init_scale, theta0s.dtype)))

    @jax.jit
    def seg(carry, idxs):
        return jax.vmap(
            lambda c: _pmmh_segment(c, idxs, scales, log_evidence_fn,
                                    log_prior_fn, warmup, target_accept)
        )(carry)

    carry = (theta0s, lp0, log_s0, keys)
    outs = []
    for s, e in _chunk_bounds(num_steps, dispatch_chunk):
        carry, out = seg(carry, jnp.arange(s, e))
        outs.append(jax.tree.map(np.asarray, out))
    # per-chunk outputs are (C, chunk, ...) — concatenate on the step axis
    thetas, lps, accepts = (
        np.concatenate([o[i] for o in outs], axis=1) for i in range(3))
    post = accepts[:, warmup:].astype(np.float32)
    return PMMHResult(
        thetas=thetas,
        log_posts=lps,
        accepts=accepts,
        accept_rate=np.asarray(
            post.mean(axis=1) if num_steps > warmup else np.zeros(C, np.float32)),
        step_scale=np.asarray(np.exp(np.asarray(carry[2]))),
    )


def pmmh_for_model(model, obs, obs_bin, x0, theta0, key, num_steps: int,
                   n_particles: int = 256, warmup: int = 0, **kwargs
                   ) -> PMMHResult:
    """PMMH over a scalar-path SSM using its own bootstrap-SMC evidence
    (``validate.smc_evidence_for_model``) and ``model.log_prior``."""
    from viforssms_tpu.inference.validate import smc_evidence_for_model

    obs = jnp.asarray(obs)
    obs_bin = jnp.asarray(obs_bin)

    def log_ev(k, theta):
        return smc_evidence_for_model(
            model, obs, obs_bin, x0, theta, n_particles, k
        ).log_evidence

    def log_prior(theta):
        return model.log_prior(theta[None, :])[0]

    return pmmh(key, log_ev, log_prior, jnp.asarray(theta0), num_steps,
                warmup=warmup, **kwargs)
