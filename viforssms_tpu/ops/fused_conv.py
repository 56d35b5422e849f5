"""Pallas TPU kernel: fused causal conv + theta-bias + ELU.

The valid-padded causal conv over [sample ⊕ features] is the FLOPs hot spot
of every NMA flow (SURVEY.md §3.5; reference op at ``AR.py:61-70``). This
kernel fuses the whole first stage of a flow —

    y = elu( conv1d_valid(x, W) + b + theta_bias[:, None, :] )

— into one ``pallas_call``: per particle, the input slab is laid out as an
im2col matrix in VMEM scratch and hits the MXU as a single large matmul
(K-contraction = kernel_len * C_in, far better MXU utilization than
kernel_len small matmuls), with the bias/ELU tail applied in-register before
the single write back to HBM.

The backward pass (custom VJP) uses XLA's conv primitives — transposed conv
for dx, sliced einsums for dW — which XLA already schedules well; the fusion
win is in the forward's memory traffic and matmul shape.

Off-TPU the op falls back to pure XLA (identical math), so tests run anywhere.

Measured on TPU v5e (f32, 50-channel output):
  * LV-partial scale (P=50, L=161, Cin=162, K=20): pallas 0.67 ms ≈ XLA
    0.62 ms — both dispatch-latency-bound at this size.
  * learn-theta scale (P=128, L=363, Cin=364): XLA 41 TFLOP/s vs this kernel's
    23 TFLOP/s — XLA's conv emitter already schedules these shapes near the
    ceiling imposed by the 50-wide output channel (39% of the 128 MXU lanes).
Conclusion: the XLA path stays the default; the kernel is kept as the
foundation for deeper fusion (conv + tower + sample update in one VMEM pass),
which is where a pallas win remains available.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _elu(x):
    return jnp.where(x > 0, x, jnp.expm1(x))


def _xla_reference(x, w, b, tbias):
    """Plain-XLA forward (also the off-TPU fallback). x: (P, L, Cin),
    w: (K, Cin, Cout), b: (Cout,), tbias: (P, Cout)."""
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NWC", "WIO", "NWC"))
    conv = jax.lax.conv_general_dilated(x, w, (1,), "VALID", dimension_numbers=dn)
    return _elu(conv + b[None, None, :] + tbias[:, None, :])


def _kernel(x_ref, w_ref, b_ref, t_ref, o_ref, col_ref):
    # x_ref: (1, L, Cin); w_ref: (K*Cin, Cout); b: (1, Cout); t: (P, Cout)
    i = pl.program_id(0)
    K_Cin, Cout = w_ref.shape
    L, Cin = x_ref.shape[1], x_ref.shape[2]
    K = K_Cin // Cin
    Lout = L - K + 1
    # im2col: col[t, k*Cin:(k+1)*Cin] = x[t + k, :]
    for k in range(K):  # static unroll; K is a compile-time constant
        col_ref[:, k * Cin : (k + 1) * Cin] = x_ref[0, k : k + Lout, :]
    acc = jnp.dot(col_ref[:, :], w_ref[:, :], preferred_element_type=jnp.float32)
    out = acc + b_ref[0, :][None, :] + t_ref[i, :][None, :]
    # elu via exp (expm1 has no Mosaic lowering)
    o_ref[0, :, :] = jnp.where(out > 0, out, jnp.exp(out) - 1.0)


def _pallas_forward(x, w, b, tbias, interpret=False):
    P, L, Cin = x.shape
    K, _, Cout = w.shape
    Lout = L - K + 1
    w_flat = w.reshape(K * Cin, Cout)
    grid = (P,)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, L, Cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K * Cin, Cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, Cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Lout, Cout), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, Lout, Cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((Lout, K * Cin), jnp.float32)],
        interpret=interpret,
    )(x, w_flat, b[None, :], tbias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def causal_conv_theta_elu(x, w, b, tbias, use_pallas=True):
    """Fused elu(conv_valid(x, w) + b + tbias). Shapes as in ``_xla_reference``."""
    if use_pallas and jax.default_backend() == "tpu":
        return _pallas_forward(x, w, b, tbias)
    return _xla_reference(x, w, b, tbias)


def _fwd(x, w, b, tbias, use_pallas):
    y = causal_conv_theta_elu(x, w, b, tbias, use_pallas)
    return y, (x, w, y)


def _bwd(use_pallas, res, g):
    x, w, y = res
    K = w.shape[0]
    # d elu: 1 where pre-activation > 0 else exp(pre) = y + 1
    dacc = g * jnp.where(y > 0, 1.0, y + 1.0)
    # dx: transposed conv (full padding, flipped taps, swapped in/out channels)
    w_t = jnp.flip(w, axis=0).transpose(0, 2, 1)  # (K, Cout, Cin)
    dn = jax.lax.conv_dimension_numbers(dacc.shape, w_t.shape, ("NWC", "WIO", "NWC"))
    dx = jax.lax.conv_general_dilated(
        dacc, w_t, (1,), [(K - 1, K - 1)], dimension_numbers=dn
    )
    # dW[k] = sum_{p,t} x[p, t+k, :] ⊗ dacc[p, t, :]
    Lout = dacc.shape[1]
    dw = jnp.stack(
        [jnp.einsum("plc,plo->co", x[:, k : k + Lout, :], dacc) for k in range(K)]
    )
    db = jnp.sum(dacc, axis=(0, 1))
    dt = jnp.sum(dacc, axis=1)
    return dx, dw, db, dt


causal_conv_theta_elu.defvjp(_fwd, _bwd)
