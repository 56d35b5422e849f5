"""Gather-free ring resampling: exactness against the global inverse CDF,
and full-filter agreement with the gather scheme and the Kalman oracle."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from viforssms_tpu.data.generate import generate_ar1
from viforssms_tpu.inference.kalman import kalman_ar1
from viforssms_tpu.inference.smc.sharded import (
    _ring_resample,
    sharded_bootstrap_filter,
)
from viforssms_tpu.parallel.mesh import make_mesh

THETA = (1.0, 0.8, 0.0)


def test_ring_resample_matches_global_inverse_cdf():
    n_dev, n_local = 8, 4
    n = n_dev * n_local
    rng = np.random.default_rng(7)
    w = rng.gamma(2.0, size=n).astype(np.float32)
    w /= w.sum()
    u = 0.37
    pos = (u + np.arange(n)) / n
    # reference: global systematic resample
    expected = np.clip(np.searchsorted(np.cumsum(w), pos), 0, n - 1)

    mesh = make_mesh((n_dev,), ("particles",))
    parts = jnp.arange(n, dtype=jnp.float32)  # identity payload

    def body(parts_local, w_local):
        my = jax.lax.axis_index("particles")
        my_pos = (u + my * n_local + jnp.arange(n_local)) / n
        return _ring_resample(parts_local, w_local, my_pos, "particles",
                              n_dev, n_local)

    out = jax.shard_map(
        body, mesh=mesh, in_specs=(P("particles"), P("particles")),
        out_specs=P("particles"),
    )(parts, jnp.asarray(w))
    np.testing.assert_array_equal(np.asarray(out).astype(int), expected)


def test_ring_filter_agrees_with_gather_and_kalman():
    T = 60
    series = generate_ar1(T=T, impute=2, x0=5.0, theta=(1.0, 0.8, 1.0),
                          obs_std=0.7, seed=3)
    t0, t1, ls = THETA
    sig = float(np.exp(ls))

    def transition_sample(key, x):
        return t1 * x + t0 + sig * jax.random.normal(key, x.shape)

    def obs_log_prob(y, x):
        return -0.5 * ((y - x) / 0.7) ** 2 - jnp.log(0.7) - 0.5 * jnp.log(2 * jnp.pi)

    mesh = make_mesh((8,), ("particles",))
    n = 4096
    results = {}
    for scheme in ("gather", "ring"):
        results[scheme] = sharded_bootstrap_filter(
            jnp.full((n,), 5.0), transition_sample, obs_log_prob,
            jnp.asarray(series.obs), jnp.asarray(series.obs_bin),
            jax.random.key(0), mesh, resampling=scheme,
        )
    g, r = results["gather"], results["ring"]
    # The two schemes follow the same inverse CDF, but a single float tie at a
    # block boundary swaps one ancestor and the trajectories then diverge
    # chaotically — so agreement is statistical, not bitwise.
    assert abs(float(g.log_evidence) - float(r.log_evidence)) < 1.0
    np.testing.assert_allclose(np.asarray(g.filter_means),
                               np.asarray(r.filter_means), atol=0.5)
    ll_exact, _, _ = kalman_ar1(series.obs, series.obs_bin, THETA, 5.0, 0.7)
    assert abs(float(r.log_evidence) - float(ll_exact)) < 2.0
    assert abs(float(g.log_evidence) - float(ll_exact)) < 2.0
