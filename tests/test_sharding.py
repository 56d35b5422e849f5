"""Multi-device tests on the virtual 8-CPU mesh: particle DP + sequence halo."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viforssms_tpu.parallel.halo import sharded_causal_conv1d
from viforssms_tpu.parallel.mesh import make_mesh, particle_sharding


def test_mesh_construction():
    mesh = make_mesh((8,), ("particles",))
    assert mesh.shape == {"particles": 8}
    mesh2 = make_mesh((4, 2), ("particles", "sequence"))
    assert mesh2.shape == {"particles": 4, "sequence": 2}


def test_sharded_causal_conv_matches_unsharded():
    mesh = make_mesh((8,), ("sequence",))
    L, K = 128, 9
    x = jax.random.normal(jax.random.key(0), (L,))
    kernel = jax.random.normal(jax.random.key(1), (K,))
    got = sharded_causal_conv1d(x, kernel, mesh)
    # unsharded: valid conv over zero-left-padded input
    xp = jnp.concatenate([jnp.zeros(K - 1), x])
    dn = jax.lax.conv_dimension_numbers((1, 1, L + K - 1), (1, 1, K), ("NCW", "OIW", "NCW"))
    want = jax.lax.conv_general_dilated(
        xp[None, None, :], kernel[None, None, :], (1,), "VALID", dimension_numbers=dn
    )[0, 0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_particle_sharded_training_runs_and_improves():
    from tests.test_train_ar1 import _make_engine

    eng, _ = _make_engine(fix_theta=True, T=200, p=32)
    eng.mesh = make_mesh((8,), ("particles",))
    eng._build_steps()  # rebuild jitted steps with the mesh
    state = eng.init(jax.random.key(0))
    state = eng.pretrain(state, num_steps=20)
    state, m0 = eng.fit(state, num_steps=1)
    state, m1 = eng.fit(state, num_steps=60)
    assert np.isfinite(float(m1.elbo))
    assert float(m1.elbo) > float(m0.elbo)


def test_particle_sharding_spec():
    mesh = make_mesh((8,), ("particles",))
    s = particle_sharding(mesh, 3)
    x = jax.device_put(jnp.zeros((16, 4, 4)), s)
    assert x.sharding.spec == jax.sharding.PartitionSpec("particles", None, None)
