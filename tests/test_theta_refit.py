"""Forward-KL theta refit on exact-evidence weights (round 4).

The refit loop is validated end-to-end on a closed-form target: with
``log_joint_fn`` an exact (noisy) Gaussian log-density, iterated
SNIS-weighted MLE must move the MAF flow onto that Gaussian — the same
mechanics that move q(theta) onto the PF-evidence posterior in
``scripts/theta_smc_refit.py``.
"""

import jax
import jax.numpy as jnp
import numpy as np

from viforssms_tpu.inference.vi.theta_flow import ThetaPosterior
from viforssms_tpu.inference.vi.theta_refit import refit_theta_forward_kl


def test_refit_moves_flow_onto_gaussian_target():
    dim = 2
    mu = jnp.asarray([1.5, -0.8])
    sd = jnp.asarray([0.4, 0.6])
    tf = ThetaPosterior(dim=dim, num_bijectors=3)
    params = tf.init(jax.random.key(0), jax.random.key(1), 8)

    th0 = tf.apply(params, jax.random.key(2), 4000,
                   method=ThetaPosterior.sample_and_log_prob)[0]
    m0 = np.asarray(th0).mean(0)

    def log_joint_fn(key, th):
        # exact target density + ~1 nat of evidence-style noise
        noise = 1.0 * jax.random.normal(key, (th.shape[0],))
        return (-0.5 * jnp.sum(((th - mu) / sd) ** 2, axis=1)
                - jnp.sum(jnp.log(sd)) + noise)

    params2, hist = refit_theta_forward_kl(
        tf, params, log_joint_fn, jax.random.key(3), rounds=4,
        draws_per_round=1024, proposal_batch=256, widen=2.0,
        fit_steps=300, verbose=False)
    th1 = tf.apply(params2, jax.random.key(4), 4000,
                   method=ThetaPosterior.sample_and_log_prob)[0]
    m1 = np.asarray(th1).mean(0)
    s1 = np.asarray(th1).std(0)
    # mean lands within 0.35 target-sd per coordinate (from a generic init
    # typically ~2+ sd away); spread matches within 40%
    assert np.all(np.abs(m1 - np.asarray(mu)) / np.asarray(sd) < 0.35), (
        m0, m1)
    assert np.all(np.abs(s1 / np.asarray(sd) - 1.0) < 0.4), s1
    # rounds improve: k_hat must not blow up and ESS should grow
    assert hist[-1].ess > hist[0].ess * 0.8
    assert np.isfinite(hist[-1].k_hat)


def test_freeze_theta_masks_updates():
    import sys
    sys.path.insert(0, "tests")
    from test_sequence_objectives import _ar_engine

    eng = _ar_engine(iw_k=4, objective="iwae", freeze_theta=True)
    state = eng.init(jax.random.key(0))
    # the jitted fit donates its input state: snapshot to host first
    t0 = np.asarray(jax.flatten_util.ravel_pytree(state.params["theta"])[0])
    f0 = np.asarray(jax.flatten_util.ravel_pytree(state.params["flow"])[0])
    state2, _ = eng.fit(state, num_steps=5, scan_chunk=5)
    t1 = np.asarray(jax.flatten_util.ravel_pytree(state2.params["theta"])[0])
    f1 = np.asarray(jax.flatten_util.ravel_pytree(state2.params["flow"])[0])
    np.testing.assert_array_equal(t0, t1)
    assert float(np.abs(f1 - f0).max()) > 0


def test_freeze_theta_masks_at_gradient_level():
    """Frozen theta grads must not leak into the path update: huge (or
    non-finite) theta gradients may neither shrink the flow update through
    the global-norm clip nor trip apply_if_finite (ADVICE r4)."""
    import sys
    sys.path.insert(0, "tests")
    from test_sequence_objectives import _ar_engine

    eng = _ar_engine(iw_k=1, objective="elbo", freeze_theta=True)
    state = eng.init(jax.random.key(0))
    opt_state = eng.opt.init(state.params)
    grads = jax.tree.map(jnp.ones_like, state.params)
    upd_ref, _ = eng.opt.update(grads, opt_state, state.params)
    # same flow grads, pathological theta grads
    bad = dict(grads)
    bad["theta"] = jax.tree.map(lambda a: jnp.full_like(a, jnp.nan),
                                grads["theta"])
    upd_bad, _ = eng.opt.update(bad, opt_state, state.params)
    f_ref = np.asarray(jax.flatten_util.ravel_pytree(upd_ref["flow"])[0])
    f_bad = np.asarray(jax.flatten_util.ravel_pytree(upd_bad["flow"])[0])
    np.testing.assert_allclose(f_bad, f_ref)
    t_bad = np.asarray(jax.flatten_util.ravel_pytree(upd_bad["theta"])[0])
    np.testing.assert_array_equal(t_bad, 0.0)
