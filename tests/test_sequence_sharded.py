"""Sequence-sharded full-path sampling must equal the unsharded computation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viforssms_tpu.flows.nma import NMAFlowStack
from viforssms_tpu.flows.sharded import sequence_sharded_sample, unsharded_reference
from viforssms_tpu.parallel.mesh import make_mesh


@pytest.mark.parametrize("flow_dims", [1, 2])
def test_sequence_sharded_matches_unsharded(flow_dims):
    K, nf = 4, 2
    L_total = 64  # flow_dims*T
    p, F = 3, 5
    flow = NMAFlowStack(
        network_dims=(8, 8, 8), kernel_len=K, no_flows=nf,
        batch_dims=L_total // flow_dims, flow_dims=flow_dims,
        use_norm=(flow_dims == 2), aligned_feats=True,
    )
    z = jax.random.normal(jax.random.key(0), (p, L_total))
    feats = jax.random.normal(jax.random.key(1), (p, L_total, F))
    theta = jax.random.normal(jax.random.key(2), (p, 3))
    # init with the padded shapes used by the unsharded reference
    context = nf * K
    params = flow.init(
        jax.random.key(3),
        jnp.zeros((p, L_total + context)),
        jnp.zeros((p, L_total + context, F)),
        theta,
    )

    x_ref, lq_ref = unsharded_reference(flow, params, z, feats, theta)

    mesh = make_mesh((4,), ("sequence",))
    x_sh, lq_sh = sequence_sharded_sample(flow, params, z, feats, theta, mesh)

    np.testing.assert_allclose(np.asarray(x_sh), np.asarray(x_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(lq_sh), np.asarray(lq_ref), rtol=2e-4, atol=2e-3)


def test_sequence_sharded_rejects_transposed_features():
    flow = NMAFlowStack(network_dims=(8, 8, 8), kernel_len=4, no_flows=2,
                        batch_dims=16, flow_dims=2, aligned_feats=False)
    mesh = make_mesh((4,), ("sequence",))
    with pytest.raises(AssertionError):
        sequence_sharded_sample(flow, None, jnp.zeros((1, 64)),
                                jnp.zeros((1, 64, 5)), jnp.zeros((1, 3)), mesh)
