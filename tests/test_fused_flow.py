"""Pallas fused flow-tail kernel: numerical parity with the XLA path.

Runs through the Pallas interpreter (CPU-safe); the same kernels compile on
real TPU (docs/RESULTS.md records the measured perf comparison there).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viforssms_tpu.ops.fused_flow import (
    flow_tail_reference,
    fused_flow_tail,
    tail_params_from_xla,
)


def _random_tail(rng, P, L, w0, K, nt, use_norm):
    z = jnp.asarray(rng.normal(size=(P, L)), jnp.float32)
    feats = jnp.asarray(rng.normal(size=(P, L - 1, w0)), jnp.float32)
    tb = jnp.asarray(rng.normal(size=(P, w0)), jnp.float32)
    Cin = 1 + w0
    wc = jnp.asarray(rng.normal(size=(K * Cin, w0)) * 0.2, jnp.float32)
    bc = jnp.asarray(rng.normal(size=(w0,)) * 0.1, jnp.float32)
    tower = []
    for _ in range(nt):
        tp = [jnp.asarray(rng.normal(size=(w0, w0)) * 0.2, jnp.float32),
              jnp.asarray(rng.normal(size=(w0,)) * 0.1, jnp.float32)]
        if use_norm:
            tp += [jnp.asarray(1 + 0.1 * rng.normal(size=(w0,)), jnp.float32),
                   jnp.asarray(0.1 * rng.normal(size=(w0,)), jnp.float32)]
        tower.append(tuple(tp))
    wo = jnp.asarray(rng.normal(size=(w0, 2)) * 0.2, jnp.float32)
    bo = jnp.asarray(rng.normal(size=(2,)) * 0.1, jnp.float32)
    return z, feats, tb, wc, bc, tuple(tower), wo, bo


@pytest.mark.parametrize("flow_dims,use_norm,mu_sp", [
    (1, False, False), (2, True, False), (2, True, True)])
def test_fused_tail_matches_xla_values_and_grads(flow_dims, use_norm, mu_sp):
    rng = np.random.default_rng(0)
    P, L, w0, K, nt = 6, 34, 16, 4, 3
    args = _random_tail(rng, P, L, w0, K, nt, use_norm)
    Lout = L - K
    cx = jnp.asarray(rng.normal(size=(P, Lout)), jnp.float32)
    cl = jnp.asarray(rng.normal(size=(P, Lout)), jnp.float32)
    static = (K, use_norm, flow_dims, mu_sp, 1e-10, "float32", True)

    x1, ls1 = flow_tail_reference(*args, static)
    x2, ls2 = fused_flow_tail(*args, static)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x1), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ls2), np.asarray(ls1), rtol=2e-5, atol=2e-5)

    def loss(fn):
        def f(*a):
            x, ls = fn(*a, static)
            return jnp.sum(x * cx) + jnp.sum(ls * cl)
        return f

    want = jax.grad(loss(flow_tail_reference), argnums=tuple(range(8)))(*args)
    got = jax.grad(loss(fused_flow_tail), argnums=tuple(range(8)))(*args)
    for g, w in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        scale = max(float(jnp.max(jnp.abs(w))), 1.0)
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=0, atol=2e-4 * scale)


def test_fused_module_matches_xla_module():
    """NMAFlowStack(fused_tail="interpret") == NMAFlowStack XLA path when the
    XLA params are converted with tail_params_from_xla."""
    from viforssms_tpu.flows.nma import NMAFlowStack

    P, K, b, w0, nf = 4, 4, 8, 16, 2
    flow_x = NMAFlowStack(network_dims=(w0,) * 5, kernel_len=K, no_flows=nf,
                          batch_dims=b, flow_dims=2, use_norm=True,
                          aligned_feats=True)
    flow_f = NMAFlowStack(network_dims=(w0,) * 5, kernel_len=K, no_flows=nf,
                          batch_dims=b, flow_dims=2, use_norm=True,
                          aligned_feats=True, fused_tail="interpret")
    kext = K * nf + 2 * b + 2
    z = jax.random.normal(jax.random.key(0), (P, kext))
    feats = jax.random.normal(jax.random.key(1), (P, kext, 5))
    th = jax.random.normal(jax.random.key(2), (P, 3))
    px = flow_x.init(jax.random.key(3), z, feats, th)
    pf = jax.tree.map(lambda a: a, flow_f.init(jax.random.key(3), z, feats, th))
    # graft the XLA params into the fused layout
    pf = jax.device_get(pf)
    for i in range(nf):
        src = px["params"][f"flow_{i}"]
        dst = pf["params"][f"flow_{i}"]
        conv = tail_params_from_xla(src, n_tower=3, use_norm=True)
        for name in list(dst.keys()):
            if name in conv:
                dst[name] = jnp.asarray(conv[name])
            else:  # feature/theta MLPs share names across paths
                dst[name] = src[name]
    x1, lq1 = flow_x.apply(px, z, feats, th)
    x2, lq2 = flow_f.apply(pf, z, feats, th)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x1), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(lq2), np.asarray(lq1), rtol=2e-5, atol=2e-5)
