"""Cross-validation harness: run HMC/NUTS/SMC on the SAME model densities VI uses.

BASELINE.json's acceptance bar is posterior-moment agreement between the VI
stack and gold-standard samplers sharing one set of log-probs. This module
builds joint log-densities over (theta, latent path) directly from the model
classes in ``models/`` — no separate model math to drift out of sync — and
packages moment comparison utilities.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def ssm_log_joint(model, obs, obs_bin, x0, T: int):
    """log p(theta, x_{1:T} | y) up to a constant, for scalar-path models.

    ``q`` packs [theta (model.theta_dim), x_{1:T}]. Uses the model's own
    transition/observation/prior terms by lifting the single sample to a
    batch of one (the model interface is (p, ...)-shaped).
    """
    D = model.theta_dim
    obs = jnp.asarray(obs)
    obs_bin = jnp.asarray(obs_bin)

    def log_joint(q):
        theta = q[:D][None, :]
        x = jnp.concatenate([jnp.asarray([x0], q.dtype), q[D:]])[None, :]
        sde = model.transition_log_prob(x, theta)
        obs_lp = model.observation_log_prob(x, obs[None, :], obs_bin[None, :], theta)
        prior = model.log_prior(theta)
        return (sde + obs_lp + prior)[0]

    return log_joint


def path_log_posterior(model, obs, obs_bin, x0, theta_fixed, T: int):
    """log p(x_{1:T} | y, theta) for fixed theta (path-only validation)."""
    D = model.theta_dim
    theta = jnp.asarray(theta_fixed)[None, :]

    def log_post(x_flat):
        x = jnp.concatenate([jnp.asarray([x0], x_flat.dtype), x_flat])[None, :]
        sde = model.transition_log_prob(x, theta)
        obs_lp = model.observation_log_prob(
            x, jnp.asarray(obs)[None, :], jnp.asarray(obs_bin)[None, :], theta
        )
        return (sde + obs_lp)[0]

    return log_post


def ssm2d_path_log_posterior(model, obs, obs_bin, x0, theta_fixed,
                             path_transform=None):
    """log p(x_{1:T} | y, theta) for 2-D SSMs (LV/FHN), theta fixed.

    ``q`` is the flat (2*T,) UNCONSTRAINED path [dim1_{1:T}, dim2_{1:T}];
    ``path_transform`` (a Bijector) maps it elementwise into state space
    (e.g. ``Softplus()`` for positive LV paths) with its forward log-det
    added, so HMC/NUTS runs in an unconstrained geometry. ``x0`` (2,) is the
    fixed initial state (pinned, as the VI mask/shift pins it —
    lotka_volterra_partial.py:292-297)."""
    obs = jnp.asarray(obs)
    obs_bin = jnp.asarray(obs_bin)
    x0 = jnp.asarray(x0, jnp.float32)

    def log_post(q):
        u = q.reshape(2, -1)
        if path_transform is not None:
            xs = path_transform.forward(u)
            ldj = jnp.sum(path_transform.forward_log_det(u))
        else:
            xs, ldj = u, 0.0
        x = jnp.concatenate([x0[:, None], xs], axis=1)[None]
        theta = jnp.asarray(theta_fixed)[None, :]
        sde = model.transition_log_prob(x, theta)
        obs_lp = model.observation_log_prob(x, obs[None], obs_bin[None], theta)
        return (sde + obs_lp)[0] + ldj

    return log_post


def ssm2d_log_joint(model, obs, obs_bin, x0, path_transform=None,
                    theta_transform=None):
    """log p(theta, x_{1:T} | y) up to a constant, for 2-D SSMs.

    ``q`` packs [theta_u (model.theta_dim), path_u (2*T)] — both
    unconstrained; optional bijectors map them to their native spaces with
    log-dets added (theta_transform e.g. ``Softplus()`` for positive-rate
    models)."""
    D = model.theta_dim
    obs = jnp.asarray(obs)
    obs_bin = jnp.asarray(obs_bin)
    x0 = jnp.asarray(x0, jnp.float32)

    def log_joint(q):
        tu = q[:D]
        if theta_transform is not None:
            theta = theta_transform.forward(tu)
            t_ldj = jnp.sum(theta_transform.forward_log_det(tu))
        else:
            theta, t_ldj = tu, 0.0
        theta = theta[None, :]
        u = q[D:].reshape(2, -1)
        if path_transform is not None:
            xs = path_transform.forward(u)
            p_ldj = jnp.sum(path_transform.forward_log_det(u))
        else:
            xs, p_ldj = u, 0.0
        x = jnp.concatenate([x0[:, None], xs], axis=1)[None]
        sde = model.transition_log_prob(x, theta)
        obs_lp = model.observation_log_prob(x, obs[None], obs_bin[None], theta)
        prior = model.log_prior(theta)
        return (sde + obs_lp + prior)[0] + t_ldj + p_ldj

    return log_joint


class MomentComparison(NamedTuple):
    mean_a: np.ndarray
    mean_b: np.ndarray
    se: np.ndarray         # combined MC standard error (per coordinate)
    z: np.ndarray          # |mean_a - mean_b| / se
    ess_a: np.ndarray      # real autocorrelation ESS of draws_a (per coord)
    ess_b: np.ndarray      # real autocorrelation ESS of draws_b (per coord)


def _real_ess(draws) -> np.ndarray:
    """Geyer autocorrelation ESS per coordinate (diagnostics.ess).

    Accepts (num_samples, num_chains, dim) MCMC draws or (S, dim) flat
    draws (treated as one chain — iid VI draws recover ESS ~ S). A single
    row has no autocorrelation structure; its ESS is its nominal count."""
    from viforssms_tpu.inference.mcmc.diagnostics import ess

    x = np.asarray(draws, np.float64)
    if x.ndim == 2:
        x = x[:, None, :]
    if x.shape[0] < 4:  # too short for an autocovariance estimate
        return np.full(x.shape[-1], float(x.shape[0] * x.shape[1]))
    return np.maximum(ess(x), 1.0)


def compare_moments(draws_a, draws_b, ess_a=None, ess_b=None) -> MomentComparison:
    """Per-coordinate mean comparison in MC-standard-error units.

    The SE is the combined two-sample error ``sqrt(sd_a^2/ess_a +
    sd_b^2/ess_b)`` where each ESS is the REAL Geyer autocorrelation
    effective sample size (``mcmc.diagnostics.ess``) computed from the
    draws — no nominal discount factor (BASELINE target: agreement within
    2 MC-SE demands a defensible ESS). Pass ``ess_a``/``ess_b`` (scalar or
    per-coordinate) only to override with an externally computed value.

    ``draws_a``/``draws_b``: (num_samples, num_chains, dim) or (S, dim)."""
    a = np.asarray(draws_a, np.float64)
    b = np.asarray(draws_b, np.float64)
    e_a = _real_ess(a) if ess_a is None else np.broadcast_to(
        np.asarray(ess_a, np.float64), (a.shape[-1],)
    )
    e_b = _real_ess(b) if ess_b is None else np.broadcast_to(
        np.asarray(ess_b, np.float64), (b.shape[-1],)
    )
    a = a.reshape(-1, a.shape[-1])
    b = b.reshape(-1, b.shape[-1])
    mean_a, mean_b = a.mean(0), b.mean(0)
    se = np.sqrt(a.var(0) / e_a + b.var(0) / e_b) + 1e-12
    return MomentComparison(mean_a, mean_b, se, np.abs(mean_a - mean_b) / se,
                            e_a, e_b)


def sv_smc_evidence(model, obs, x0_lat, theta, n_particles, key):
    """Bootstrap-PF marginal likelihood ``log p_hat(y_{1:T} | theta)`` for
    the SV model (``SV_dense.py:203-234`` semantics: the likelihood lives
    entirely in the observed dim-1 price-transition density; there is no
    separate observation term).

    Particles are the latent log-vol path; at step t the particle weight is
    the exactly-observed price transition N(y_t; y_{t-1} + dt*t0*y_{t-1},
    dt*(y_{t-1} e^{v_{t-1}/2})^2), then particles resample and propagate
    through the vol transition. The estimate is unbiased for p(y | theta)
    and — unlike the VI-importance estimates — INDEPENDENT of the
    variational path family, which makes it the right weight source for
    forward-KL theta training: the path-flow's theta-dependent fit quality
    cannot leak into the theta ranking (measured round 4: VI-importance
    wake weights amplified the reverse-KL bias instead of correcting it).

    ``theta``: (4,) one parameter draw; vmap over a leading axis for
    batches. Matches the joint the NUTS gold samples (x0_lat fixed,
    ``scripts/objective_floor.py::_log_joint_fn``)."""
    import jax

    from viforssms_tpu.distributions.normal import normal_logpdf
    from viforssms_tpu.inference.smc.bootstrap import systematic_resample

    obs = jnp.asarray(obs, jnp.float32)          # (T+1,) incl. the x0 price
    t0, t1, t2, t3 = theta[0], theta[1], theta[2], theta[3]
    dt = model.dt
    sdt = jnp.sqrt(jnp.asarray(dt, jnp.float32))
    n = n_particles

    def step(carry, inp):
        v, log_z, k = carry
        yp, yn = inp
        k, k_res, k_prop = jax.random.split(k, 3)
        m = yp + dt * t0 * yp
        s = sdt * jnp.abs(yp) * jnp.exp(0.5 * v)
        lw = normal_logpdf(jnp.full((n,), yn), m, s)
        log_z = log_z + jax.nn.logsumexp(lw) - jnp.log(float(n))
        v = jnp.take(v, systematic_resample(k_res, lw))
        v = (v + dt * (t1 - jnp.exp(t2) * v)
             + sdt * jnp.exp(t3) * jax.random.normal(k_prop, (n,)))
        return (v, log_z, k), None

    v0 = jnp.full((n,), jnp.asarray(x0_lat, jnp.float32))
    (_, log_z, _), _ = jax.lax.scan(
        step, (v0, jnp.zeros(()), key), (obs[:-1], obs[1:]))
    return log_z


def ssm2d_smc_evidence(model, obs, obs_bin, x0, theta, n_particles, key):
    """Bootstrap-PF marginal likelihood ``log p_hat(y | theta)`` for a 2-D
    partially-observed SSM (FHN: masked N(x, obs_std) observations,
    ``fitz_nag_NVP.py:233-234``): particles propagate through the model's
    own ``predictive_step`` Euler-Maruyama kernel and reweight/resample on
    steps where either dim is observed. Independent of the variational path
    family — the forward-KL theta weight source (see
    :func:`sv_smc_evidence`). ``theta``: one (D,) draw; vmap for batches."""
    import jax

    from viforssms_tpu.distributions.normal import normal_logpdf
    from viforssms_tpu.inference.smc.bootstrap import systematic_resample

    obs = jnp.asarray(obs, jnp.float32)           # (2, T)
    obs_bin = jnp.asarray(obs_bin, jnp.float32)   # (2, T)
    n = n_particles
    theta_tile = jnp.tile(theta[None, :], (n, 1))
    # FHN names its observation sd obs_std, LV obs_scale (both are the
    # constant-sd masked-Normal models this filter covers)
    obs_sd = getattr(model, "obs_std", None)
    if obs_sd is None:
        obs_sd = model.obs_scale

    def step(carry, inp):
        x, log_z, k = carry                       # x: (n, 2)
        y, m = inp                                # (2,), (2,)
        k, k_prop, k_res = jax.random.split(k, 3)
        x = model.predictive_step(k_prop, x, theta_tile)
        lp = jnp.where(m[None, :] > 0,
                       normal_logpdf(y[None, :], x, obs_sd), 0.0)
        lw = jnp.sum(lp, axis=1)
        any_obs = jnp.max(m) > 0
        log_z = log_z + jnp.where(
            any_obs, jax.nn.logsumexp(lw) - jnp.log(float(n)), 0.0)
        resampled = jnp.take(x, systematic_resample(k_res, lw), axis=0)
        x = jnp.where(any_obs, resampled, x)
        return (x, log_z, k), None

    x0v = jnp.broadcast_to(jnp.asarray(x0, jnp.float32)[None, :], (n, 2))
    (_, log_z, _), _ = jax.lax.scan(
        step, (x0v, jnp.zeros(()), key), (obs.T, obs_bin.T))
    return log_z


def smc_evidence_for_model(model, obs, obs_bin, x0, theta, n_particles, key):
    """Bootstrap-SMC evidence log p(y | theta) using the model's own
    ``transition_sample`` and observation density."""
    from viforssms_tpu.inference.smc import bootstrap_filter

    theta = jnp.asarray(theta)

    def transition(k, particles):
        return model.transition_sample(k, particles, theta)

    def obs_lp(y, particles):
        # reuse the model's masked obs term with a single-step window
        x = jnp.stack([particles, particles], axis=-1)  # (N, 2): [head, tail]
        ym = jnp.full((particles.shape[0], 1), y)
        mask = jnp.ones((particles.shape[0], 1))
        return model.observation_log_prob(
            x, ym, mask, jnp.tile(theta[None, :], (particles.shape[0], 1))
        )

    init = jnp.full((n_particles,), jnp.asarray(x0, jnp.float32))
    return bootstrap_filter(
        init, transition, obs_lp, jnp.asarray(obs), jnp.asarray(obs_bin), key
    )
