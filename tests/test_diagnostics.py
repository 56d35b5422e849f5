"""R-hat / ESS diagnostics: analytic cases and a real NUTS run."""

import jax
import jax.numpy as jnp
import numpy as np

from viforssms_tpu.inference.mcmc import nuts_sample
from viforssms_tpu.inference.mcmc.diagnostics import ess, split_rhat, summarize


def test_rhat_near_one_for_iid_chains():
    rng = np.random.default_rng(0)
    draws = rng.normal(size=(2000, 4, 3))
    r = split_rhat(draws)
    assert np.all(r < 1.01), r


def test_rhat_detects_displaced_chain():
    rng = np.random.default_rng(1)
    draws = rng.normal(size=(1000, 4, 1))
    draws[:, 0, 0] += 5.0  # one chain stuck elsewhere
    assert split_rhat(draws)[0] > 1.5


def test_ess_iid_close_to_nominal():
    rng = np.random.default_rng(2)
    draws = rng.normal(size=(2000, 4, 2))
    e = ess(draws)
    nominal = 2000 * 4
    assert np.all(e > 0.6 * nominal) and np.all(e < 1.5 * nominal), e


def test_ess_ar1_matches_theory():
    # AR(1) with coefficient a has tau = (1+a)/(1-a) -> ESS = N / tau
    rng = np.random.default_rng(3)
    a = 0.9
    n, m = 20000, 4
    x = np.zeros((n, m, 1))
    eps = rng.normal(size=(n, m, 1)) * np.sqrt(1 - a * a)
    for t in range(1, n):
        x[t] = a * x[t - 1] + eps[t]
    e = ess(x)[0]
    expected = n * m * (1 - a) / (1 + a)
    assert 0.5 * expected < e < 2.0 * expected, (e, expected)


def test_summarize_on_real_nuts_run():
    sd = jnp.array([2.0, 0.5])
    logp = lambda q: -0.5 * jnp.sum((q / sd) ** 2)
    samples, _ = nuts_sample(
        logp, jax.random.normal(jax.random.key(0), (4, 2)), jax.random.key(1),
        num_samples=500, num_warmup=300, step_size=0.2, max_depth=6,
    )
    s = summarize(np.asarray(samples))
    assert np.all(s["rhat"] < 1.1), s["rhat"]
    assert np.all(s["ess"] > 100), s["ess"]
    # mean within 4 MCSE of zero
    assert np.all(np.abs(s["mean"]) < 4 * s["mcse_mean"] + 0.05), s
