"""The consolidated (iterative) NUTS: exact Gaussian moments at depth 8.

Round 1 carried a second, statically-unrolled NUTS; it was removed (it
adapted step size on an admissible-leaf proxy with a unit metric). This file
now pins the single sampler at a depth the unrolled variant could not
compile (2^8 traced leapfrogs), plus the back-compat alias.
"""

import jax
import jax.numpy as jnp
import numpy as np

from viforssms_tpu.inference.mcmc.nuts import nuts_sample


def _target():
    cov = np.array([[2.0, 0.8, 0.1], [0.8, 1.0, -0.2], [0.1, -0.2, 0.5]])
    prec = jnp.asarray(np.linalg.inv(cov))
    mu = jnp.asarray([1.0, -0.5, 0.3])

    def logp(q):
        d = q - mu
        return -0.5 * d @ prec @ d

    return logp, np.asarray(mu), cov


def test_iterative_nuts_recovers_gaussian_moments():
    logp, mu, cov = _target()
    init = jax.random.normal(jax.random.key(0), (8, 3))
    samples, diag = nuts_sample(
        logp, init, jax.random.key(1), num_samples=700, num_warmup=400,
        step_size=0.3, max_depth=8,
    )
    draws = np.asarray(samples).reshape(-1, 3)
    np.testing.assert_allclose(draws.mean(0), mu, atol=0.12)
    np.testing.assert_allclose(np.cov(draws.T), cov, atol=0.4)
    # dual averaging on the real per-leaf Metropolis statistic lands near the
    # 0.8 target
    assert 0.5 < float(np.mean(np.asarray(diag["accept"]))) <= 1.0


def test_nuts_alias_points_at_single_sampler():
    import viforssms_tpu
    from viforssms_tpu.inference import mcmc

    assert mcmc.nuts_sample_iterative is mcmc.nuts_sample
    assert viforssms_tpu.nuts_sample_iterative is mcmc.nuts_sample


def test_nuts_dispatch_chunking_is_exact():
    """dispatch_chunk splits warmup/sampling scans across host dispatches
    with exact state carry — draws must be bitwise the unchunked draws."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from viforssms_tpu.inference.mcmc.nuts import nuts_sample

    def logp(q):
        return -0.5 * jnp.sum(q**2)

    init = jax.random.normal(jax.random.key(0), (3, 4))
    a, da = nuts_sample(logp, init, jax.random.key(1), num_samples=60,
                        num_warmup=40, step_size=0.4, max_depth=5,
                        adapt_mass=True)
    b, db = nuts_sample(logp, init, jax.random.key(1), num_samples=60,
                        num_warmup=40, step_size=0.4, max_depth=5,
                        adapt_mass=True, dispatch_chunk=16)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(float(da["step_size"]), float(db["step_size"]))
