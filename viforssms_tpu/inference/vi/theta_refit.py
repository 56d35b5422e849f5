"""Forward-KL theta-posterior refit on particle-filter evidence weights.

The round-4 escape from the certified reverse-KL floor
(``validation/floor_*.json``; ``docs/KNOWN_GAPS.md``). Two measured dead
ends motivated it:

  * IWAE bound-tightening saturates — k=25 -> 50 with DReG gradients moved
    SV theta bias not at all (``validation/sv_fullpath_dreg.json``): with
    PSIS k_hat ~ 2 full-path weights, the bound tightens like
    k^(1/k_hat - 1);
  * VI-importance wake weights point the WRONG way — the path flow fits
    some thetas better than others, so marginalized importance estimates of
    p(y | theta) are systematically inflated exactly at the already-biased
    thetas and the wake update amplifies the bias
    (``validation/sv_fullpath_rws_negative.json``).

The fix is the weight SOURCE: a bootstrap particle filter's unbiased
``log p_hat(y | theta)`` (``inference/validate.sv_smc_evidence`` /
``ssm2d_smc_evidence``) does not involve the variational path family at
all, and its noise is a theta-independent ~1 nat at moderate particle
counts (measured: sd 1.33 nats at N=512 on SV). Self-normalized weights
over thetas drawn from a WIDENED copy of the current flow then have
k_hat ~ 0.7 — usable — and each refit round improves the proposal, so
iterating is adaptive importance sampling:

    round r:  theta_i ~ q_widened,  log w_i = log p_hat(y|theta_i)
              + log p(theta_i) - log q_widened(theta_i)
              fit phi by weighted MLE  max_phi sum_i w_tilde_i log
              q_phi(theta_i)   (the RWS wake update on exact weights)

The fixed point is q = p(theta | y) restricted to the flow family; the
judged theta marginal comes straight from ``sample_theta``.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


class RefitRound(NamedTuple):
    ess: float
    k_hat: float
    nll_start: float
    nll_end: float
    snis_mean: np.ndarray
    snis_sd: np.ndarray


def refit_theta_forward_kl(theta_flow, params_theta, log_joint_fn: Callable,
                           key, *, rounds: int = 3, draws_per_round: int = 2048,
                           proposal_batch: int = 256, widen: float = 2.0,
                           learning_rate: float = 3e-3, fit_steps: int = 400,
                           truncate: bool = True, crn: bool = False,
                           verbose: bool = True):
    """Iteratively refit ``theta_flow`` params by SNIS-weighted MLE.

    ``log_joint_fn(key, theta (n, D)) -> (n,)`` must return
    ``log p_hat(y | theta) + log p(theta)`` with theta-INDEPENDENT noise
    (particle-filter evidence; VI-importance estimates are exactly what
    this function exists to avoid — see module docstring).

    ``truncate`` caps raw weights at ``mean * sqrt(n)`` (Ionides 2008) so a
    single lucky draw cannot dominate a round's MLE target.

    ``crn`` shares ONE evidence PRNG key across every theta of a round
    (common random numbers): the filter's resampling/propagation noise is
    then correlated across thetas, so RELATIVE weights — all SNIS needs —
    carry far less noise than the absolute evidence sd suggests. The right
    setting for noisy-evidence configs (FHN's sparse tight observations).

    Returns ``(params_theta, [RefitRound, ...])``.
    """
    from viforssms_tpu.inference.quality import psis

    flow_t = type(theta_flow)

    def draw(params, k):
        return theta_flow.apply(params, k, proposal_batch, widen,
                                method=flow_t.sample_and_log_prob)

    draw = jax.jit(draw)

    opt = optax.adamax(learning_rate)

    @jax.jit
    def mle_steps(params, opt_state, theta, w):
        def loss_fn(p):
            lq = theta_flow.apply(p, theta, method=flow_t.log_prob)
            lq = jnp.where(jnp.isfinite(lq), lq, 0.0)
            return -jnp.sum(w * lq)

        def body(carry, _):
            p, s = carry
            loss, g = jax.value_and_grad(loss_fn)(p)
            up, s = opt.update(g, s, p)
            return (optax.apply_updates(p, up), s), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), None, length=fit_steps)
        return params, opt_state, losses

    history = []
    for r in range(rounds):
        thetas, lws = [], []
        n_batches = max(1, draws_per_round // proposal_batch)
        key, k_round = jax.random.split(key)
        for b in range(n_batches):
            key, k1, k2 = jax.random.split(key, 3)
            th, lq = draw(params_theta, k1)
            lj = log_joint_fn(k_round if crn else k2, th)
            thetas.append(np.asarray(th))
            lws.append(np.asarray(lj, np.float64) - np.asarray(lq, np.float64))
        th = np.concatenate(thetas)
        lw = np.concatenate(lws)
        fin = np.isfinite(lw)
        th, lw = th[fin], lw[fin]
        k_hat = float(psis(lw).k_hat)
        if truncate:
            # cap at mean * sqrt(n) (log space: logmeanexp + 0.5 log n)
            lme = float(jax.nn.logsumexp(jnp.asarray(lw))) - np.log(len(lw))
            lw = np.minimum(lw, lme + 0.5 * np.log(len(lw)))
        w = np.exp(lw - lw.max())
        w /= w.sum()
        ess = float(1.0 / np.sum(w ** 2))
        snis_mean = w @ th.astype(np.float64)
        snis_sd = np.sqrt(np.maximum(
            w @ (th.astype(np.float64) - snis_mean) ** 2, 0.0))
        params_theta, opt_state, losses = mle_steps(
            params_theta, opt.init(params_theta),
            jnp.asarray(th), jnp.asarray(w, jnp.float32))
        history.append(RefitRound(
            ess=ess, k_hat=k_hat,
            nll_start=float(losses[0]), nll_end=float(losses[-1]),
            snis_mean=snis_mean, snis_sd=snis_sd))
        if verbose:
            print(f"  refit round {r + 1}/{rounds}: k_hat {k_hat:.3f}, "
                  f"ess {ess:.0f}/{len(lw)}, wNLL {float(losses[0]):.3f} -> "
                  f"{float(losses[-1]):.3f}", flush=True)
    return params_theta, history
