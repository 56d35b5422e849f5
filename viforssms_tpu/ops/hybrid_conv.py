"""Causal conv with an XLA-conv forward and an im2col (dot_general) backward.

Hypothesis (from the full-step decomposition, docs/RESULTS.md "hybrid conv
study"): at LV-partial shapes the conv emitter's FORWARD beats the explicit
im2col matmul (0.226 vs 0.433 ms/step forward) while its BACKWARD loses
(0.552 vs 0.467 ms/step backward), so combining them via ``jax.custom_vjp``
should win. MEASURED VERDICT: it does NOT — isolated-op timing shows the
emitter's autodiff is fastest in BOTH directions (82 us vs 160 im2col /
282 hybrid per fwd+bwd); the full-step fwd/bwd split was a fusion artifact,
and the custom_vjp boundary (which pins residuals and blocks cross-op
fusion) costs far more than the dense-layout backward saves. Ships OFF by
default (``FlowConfig.conv_mode = "hybrid"`` to enable), parity-pinned by
tests, as the starting point for large-shape regimes where conv-emitter
relayout copies dominate.

The construction:

  forward:  ``lax.conv_general_dilated`` (NWC/WIO), VALID padding — identical
            to ``flax.linen.Conv(features, (K,), padding="VALID")``;
  backward: wgrad as one stacked-slice contraction
            ``dw = einsum('ptA,pto->Ao', concat_K_slices(x), g)`` and dgrad as
            the full-correlation matmul
            ``dx = concat_K_slices(pad(g)) @ rev(w)^T`` — both stay in the
            dense (p, L, C) layout, no conv-emitter relayouts.

The function computed is exactly the reference's causal conv (``AR.py:61-62``);
only the backward op schedule differs. Parameter layout (kernel (K, Cin, Cout),
bias (Cout,)) matches ``nn.Conv``/``CausalConvMM`` so checkpoints interchange
across all three ``conv_mode`` settings.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _conv_nwc(x, kernel):
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
    )


@jax.custom_vjp
def causal_conv_hybrid(x, kernel, bias):
    """x: (p, L, Cin), kernel: (K, Cin, Cout), bias: (Cout,) ->
    (p, L-K+1, Cout). Same math as nn.Conv VALID; custom backward."""
    return _conv_nwc(x, kernel) + bias


def _fwd(x, kernel, bias):
    return causal_conv_hybrid(x, kernel, bias), (x, kernel)


def _slices(a, K, l_out):
    return jnp.concatenate([a[:, k:k + l_out, :] for k in range(K)], axis=-1)


def _bwd(res, g):
    x, kernel = res
    K, cin, cout = kernel.shape
    l_out = x.shape[1] - K + 1
    # wgrad: (p, l_out, K*cin) x (p, l_out, cout) -> (K*cin, cout)
    cols = _slices(x, K, l_out)
    dw = jnp.einsum("pta,pto->ao", cols, g).reshape(K, cin, cout)
    # dgrad: dx[s] = sum_k g[s-k] @ w[k]^T == full correlation of g with rev(w)
    gp = jnp.pad(g, ((0, 0), (K - 1, K - 1), (0, 0)))
    w_rev_t = kernel[::-1].transpose(0, 2, 1).reshape(K * cout, cin)
    dx = _slices(gp, K, x.shape[1]) @ w_rev_t
    db = jnp.sum(g, axis=(0, 1))
    return dx.astype(x.dtype), dw.astype(kernel.dtype), db.astype(kernel.dtype)


causal_conv_hybrid.defvjp(_fwd, _bwd)
