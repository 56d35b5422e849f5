"""HMC with the chain axis sharded over the mesh.

The dual-averaging statistic is a mean over chains; with chains sharded,
XLA lowers it to a psum — no sampler code changes needed (the named-mesh
design goal for chain DP)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from viforssms_tpu.inference.mcmc import hmc_sample
from viforssms_tpu.parallel.mesh import make_mesh


def test_hmc_chains_sharded_over_mesh():
    cov = np.array([[2.0, 0.8], [0.8, 1.0]])
    prec = jnp.asarray(np.linalg.inv(cov))
    mu = jnp.asarray([1.0, -0.5])

    def logp(q):
        d = q - mu
        return -0.5 * d @ prec @ d

    mesh = make_mesh((8,), ("chains",))
    init = jax.random.normal(jax.random.key(0), (16, 2))
    init = jax.device_put(init, NamedSharding(mesh, P("chains", None)))

    run = jax.jit(
        functools.partial(
            hmc_sample, logp, num_samples=400, num_warmup=300, step_size=0.3
        )
    )
    samples, diag = run(init, jax.random.key(1))
    draws = np.asarray(samples).reshape(-1, 2)
    np.testing.assert_allclose(draws.mean(0), np.asarray(mu), atol=0.12)
    assert float(jnp.mean(diag["accept"])) > 0.3
    # the chain axis stays sharded through the scan
    assert "chains" in str(samples.sharding)
