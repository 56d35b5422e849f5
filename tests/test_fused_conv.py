"""Fused conv kernel: pallas (interpret mode on CPU) vs XLA reference + VJP check."""

import jax
import jax.numpy as jnp
import numpy as np

from viforssms_tpu.ops.fused_conv import _pallas_forward, _xla_reference, causal_conv_theta_elu


def _inputs(P=3, L=33, Cin=7, Cout=5, K=4, seed=0):
    ks = jax.random.split(jax.random.key(seed), 4)
    x = jax.random.normal(ks[0], (P, L, Cin))
    w = jax.random.normal(ks[1], (K, Cin, Cout)) * 0.2
    b = jax.random.normal(ks[2], (Cout,)) * 0.1
    t = jax.random.normal(ks[3], (P, Cout)) * 0.1
    return x, w, b, t


def test_pallas_kernel_matches_xla_interpret():
    x, w, b, t = _inputs()
    want = _xla_reference(x, w, b, t)
    got = _pallas_forward(x, w, b, t, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_custom_vjp_matches_autodiff():
    x, w, b, t = _inputs(P=2, L=17, Cin=4, Cout=3, K=3)

    def loss_fused(args):
        return jnp.sum(jnp.sin(causal_conv_theta_elu(*args, False)))

    def loss_ref(args):
        return jnp.sum(jnp.sin(_xla_reference(*args)))

    g_fused = jax.grad(loss_fused)((x, w, b, t))
    g_ref = jax.grad(loss_ref)((x, w, b, t))
    for a, b_ in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-5)


def test_fallback_path_off_tpu():
    x, w, b, t = _inputs()
    y = causal_conv_theta_elu(x, w, b, t)  # CPU -> XLA fallback
    np.testing.assert_allclose(np.asarray(y), np.asarray(_xla_reference(x, w, b, t)),
                               rtol=1e-6)
