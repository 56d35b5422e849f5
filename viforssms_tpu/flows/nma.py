"""The neural-moving-average (NMA) variational sampler.

A stack of local inverse-autoregressive flows built from valid-padded causal
1-D convolutions with feature and theta injection — the TPU-native
re-expression of the reference's ``IAF`` / ``Flow_Stack`` / ``Permute``
classes (1-D: ``AR.py:38-110``; interleaved 2-D: ``lotka_volterra_partial.py:
55-159``; "mu1" stability variant: ``lotka_volterra_latest_batch_gpt_64_mu1_
cov.py:153-162``).

Design notes (TPU-first):
  * Everything is a static-shape tensor program: one compiled step serves all
    window positions (the reference re-fed placeholders per step).
  * The causal conv is ``lax.conv_general_dilated`` via ``flax.linen.Conv``
    with VALID padding — XLA lowers it to MXU matmuls; the 1x1-conv towers are
    plain matmuls that XLA fuses with the ELU/softplus elementwise tails.
  * The 2-D "pairwise permute" between flows — a ``tf.scatter_nd`` with a
    precomputed (p, L, 2) index tensor in the reference
    (``lotka_volterra_partial.py:137-159``) — is a static reshape/flip here:
    zero data movement beyond a relayout, no gather/scatter.
  * Log-density bookkeeping follows the windowed-base contract
    (``AR.py:31-35``): base log-prob and per-flow ``-sum(log sigma)`` are
    accumulated over only the last ``flow_dims * batch_dims`` positions (the
    target window); the left ``no_flows * kernel_len`` context positions are
    free, which is what makes the ELBO minibatchable over time and the time
    axis shardable with halo exchange (SURVEY.md §5).

Reference quirk preserved on purpose: the 2-D variants call
``tf.layers.batch_normalization`` without ever running the update ops and
with ``training=False`` defaults, so moving statistics stay at (0, 1) forever
and the layer degenerates to a learnable elementwise affine. ``ScaleOffset``
implements exactly that degenerate behavior.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from viforssms_tpu.distributions.normal import normal_logpdf


def pairwise_swap(x):
    """Swap adjacent positions (0<->1, 2<->3, ...) along the last axis.

    Equivalent to the reference's scatter_nd pair permutation
    (``lotka_volterra_partial.py:206-213``) but as a static relayout.
    """
    p, L = x.shape
    return x.reshape(p, L // 2, 2)[:, :, ::-1].reshape(p, L)


class ScaleOffset(nn.Module):
    """Learnable elementwise affine = the reference's frozen batch-norm (see module docstring)."""

    @nn.compact
    def __call__(self, x):
        gamma = self.param("scale", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        beta = self.param("offset", nn.initializers.zeros, (x.shape[-1],), jnp.float32)
        return gamma.astype(x.dtype) * x + beta.astype(x.dtype)


class CausalConvMM(nn.Module):
    """Valid-padded causal conv as explicit im2col + one matmul.

    Numerically identical to ``nn.Conv(features, (kernel_len,), "VALID")`` and
    parameter-compatible with it (same ``kernel``/``bias`` shapes and init), but
    lowered as ``concat(K shifted slices) @ W`` so the operand never leaves the
    (p, L, C) row-major layout shared by the surrounding 1x1-conv towers and
    elementwise ops — avoiding the conv emitter's relayout copies (measured in
    docs/RESULTS.md; XLA's conv layouts cost ~25% of LV-partial step time).
    """

    features: int
    kernel_len: int

    @nn.compact
    def __call__(self, x):
        K, cin = self.kernel_len, x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (K, cin, self.features), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        l_out = x.shape[1] - K + 1
        cols = jnp.concatenate([x[:, k : k + l_out, :] for k in range(K)], axis=-1)
        return cols @ kernel.reshape(K * cin, self.features) + bias


class CausalConvHybrid(nn.Module):
    """XLA-conv forward + im2col backward (``ops/hybrid_conv.py``). Measured
    NEGATIVE at LV-partial scale (docs/RESULTS.md "hybrid conv study") —
    ships off by default. Parameter-compatible with
    ``nn.Conv``/``CausalConvMM``."""

    features: int
    kernel_len: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        from viforssms_tpu.ops.hybrid_conv import causal_conv_hybrid

        K, cin = self.kernel_len, x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (K, cin, self.features), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        cd = self.dtype or x.dtype
        return causal_conv_hybrid(x.astype(cd), kernel.astype(cd), bias.astype(cd))


class ConvIAF(nn.Module):
    """One local IAF conv flow: z -> x = z[K:] * sigma + mu.

    1-D (``AR.py:50-85``): features are 4 ELU dense layers over the aligned
    time-series feature window; output conv has stride 1 and 2 channels.

    2-D interleaved (``lotka_volterra_partial.py:68-104``): features are
    3 ELU dense layers + a transposed ELU projection to width ``feat_dims``
    (the reference feeds the FULL feature window to every flow and lets this
    transpose re-shape it to the shrinking conv length); the output conv has
    stride 2, producing one (mu, sigma) pair per interleaved (u, v) pair,
    re-interleaved with an identity half so each flow transforms only one
    species per step.
    """

    network_dims: Tuple[int, ...]
    kernel_len: int
    flow_dims: int = 1
    feat_dims: int = 0        # 2-D only: width of the transposed feature projection
    use_norm: bool = False    # ScaleOffset between 1x1 convs (non-AR scripts)
    mu_softplus: bool = False  # "mu1" variant: identity-half mu=1, softplus'd mu
    sigma_eps: float = 1e-10
    # TPU-fast alternative for 2-D flows: keep features locally ALIGNED (the
    # 1-D feature path) instead of the reference's transposed global
    # projection, whose conv input channel count grows with the window length
    # (quadratic FLOPs in kernel_ext — lotka_volterra_partial.py:75-79).
    aligned_feats: bool = False
    # Pallas megakernel for the flow tail (conv+theta+ELU+tower+out+sample in
    # one VMEM pass; ops/fused_flow.py). Only valid for 1-D or aligned 2-D
    # flows. "interpret" runs the same kernel through the Pallas interpreter
    # (tests on CPU). NOTE: fused mode declares its own (flat) parameter
    # layout; ops.fused_flow.tail_params_from_xla converts checkpoints.
    fused_tail: str = "off"  # "off" | "on" | "interpret"
    conv_mode: str = "conv"  # "conv" | "im2col" | "hybrid" (see CausalConvMM/-Hybrid)
    # Zero-init the final (mu, sigma) layer — the Glow/IAF near-identity
    # trick: every flow starts at mu=0, sigma=softplus(0)+eps (~0.69), so
    # deep/wide stacks don't compound random init scales into exploding
    # paths (8 lecun-init flows reached |x| ~ 200 at init — measured, r3).
    # Default False = reference init parity.
    out_init_zero: bool = False
    # Activation dtype for the conv/tower compute ("float32" | "bfloat16").
    # Params stay f32; mu/sigma and all density math are cast back to f32.
    # bf16 halves the bytes moved by the layout copies between the conv
    # emitter and the surrounding fusions — the dominant step cost at
    # LV-partial scale (docs/RESULTS.md) — at ~3 decimal digits of activation
    # rounding, which the reparameterized-ELBO noise dwarfs (measured study).
    compute_dtype: str = "float32"

    # Feature-MLP output precomputed by the stack (batched across flows —
    # NMAFlowStack.batched_feat_mlp). When True, ts_feats is already the
    # 4-layer ELU embedding and this module creates no feat params.
    precomputed_feats: bool = False

    @nn.compact
    def __call__(self, z, ts_feats, theta):
        """z: (p, L); ts_feats: (p, Lf, F); theta: (p, D) -> (x, log_sigma).

        Returns ``x`` of shape (p, L - kernel_len) and elementwise
        ``log_sigma`` of the same shape (caller reduces over its window).
        """
        w0 = self.network_dims[0]
        p = z.shape[0]
        cd = jnp.bfloat16 if self.compute_dtype == "bfloat16" else None

        # --- feature net ---
        if self.precomputed_feats:
            h = ts_feats
        elif self.flow_dims == 1 or self.aligned_feats:
            h = ts_feats[:, :-1, :]
            for i in range(4):  # AR.py:53-56
                h = nn.elu(nn.Dense(w0, name=f"feat_{i}", dtype=cd)(h))
        else:
            h = ts_feats[:, :-1, :]
            for i in range(3):  # lotka_volterra_partial.py:72-74
                h = nn.elu(nn.Dense(w0, name=f"feat_{i}", dtype=cd)(h))
            # transposed projection to the conv length (lotka_volterra_partial.py:75-76)
            h = nn.elu(nn.Dense(self.feat_dims, name="feat_T", dtype=cd)(h))
            h = jnp.transpose(h, (0, 2, 1))

        # --- theta embedding: 3 linear layers, broadcast-added (AR.py:63-70) ---
        t = nn.Dense(w0, name="theta_0", dtype=cd)(theta)
        t = nn.Dense(w0, name="theta_1", dtype=cd)(t)
        t = nn.Dense(w0, name="theta_2", dtype=cd)(t)

        if self.fused_tail != "off":
            # whole-tail Pallas megakernel (ops/fused_flow.py)
            assert self.flow_dims == 1 or self.aligned_feats, (
                "fused_tail requires the 1-D or aligned-2-D feature path")
            from viforssms_tpu.ops import fused_flow as ff

            n_tower = len(self.network_dims[1:-1])
            cin = 1 + w0
            fp = {
                name: self.param(name, init, shape)
                for name, shape, init in ff.tail_param_specs(
                    self.kernel_len, cin, w0, n_tower, self.use_norm)
            }
            wc, bc, tower, wo_, bo_ = ff.tail_args_from_params(
                fp, n_tower, self.use_norm)
            # bf16 MXU passes on hardware (matches matmul_precision="bfloat16"
            # elsewhere); exact f32 in interpret mode so CPU tests pin parity
            mm_name = "float32" if self.fused_tail == "interpret" else "bfloat16"
            static = (self.kernel_len, self.use_norm, self.flow_dims,
                      self.mu_softplus, self.sigma_eps, mm_name,
                      self.fused_tail == "interpret")
            return ff.fused_flow_tail(z, h, t, wc, bc, tower, wo_, bo_, static)

        # --- causal conv over [sample ⊕ features] ---
        inp = jnp.concatenate([z[:, :-1, None].astype(h.dtype), h], axis=2)
        if self.conv_mode == "im2col":
            conv = CausalConvMM(w0, self.kernel_len, name="conv_in")(inp)
        elif self.conv_mode == "hybrid":
            conv = CausalConvHybrid(w0, self.kernel_len, name="conv_in", dtype=cd)(inp)
        else:
            conv = nn.Conv(
                w0, kernel_size=(self.kernel_len,), padding="VALID",
                name="conv_in", dtype=cd,
            )(inp)
        h = nn.elu(conv + t[:, None, :])

        # --- 1x1-conv (per-step MLP) tower ---
        for i, width in enumerate(self.network_dims[1:-1]):
            h = nn.elu(nn.Dense(width, name=f"tower_{i}", dtype=cd)(h))
            if self.use_norm:
                h = ScaleOffset(name=f"norm_{i}")(h)

        out_kw = ({"kernel_init": nn.initializers.zeros}
                  if self.out_init_zero else {})
        if self.flow_dims == 1:
            out = nn.Dense(2, name="out", dtype=cd, **out_kw)(h).astype(jnp.float32)  # (p, L-K, 2)
            mu = out[:, :, 0]
            sigma = jax.nn.softplus(out[:, :, 1]) + self.sigma_eps
        else:
            # stride-2 output conv == dense on even positions (lotka_volterra_partial.py:97)
            out = nn.Dense(2, name="out", dtype=cd, **out_kw)(h[:, ::2, :]).astype(jnp.float32)  # (p, M, 2)
            mu_t, sigma_t = out[:, :, 0], out[:, :, 1]
            if self.mu_softplus:
                id_mu = jnp.ones_like(mu_t)  # ..._learn_theta.py:161
                mu_t = jax.nn.softplus(mu_t) + self.sigma_eps
            else:
                id_mu = jnp.zeros_like(mu_t)  # lotka_volterra_partial.py:100
            sigma_t = jax.nn.softplus(sigma_t) + self.sigma_eps
            # re-interleave [identity, transformed] pairs -> full length
            mu = jnp.stack([id_mu, mu_t], axis=2).reshape(p, -1)
            sigma = jnp.stack([jnp.ones_like(sigma_t), sigma_t], axis=2).reshape(p, -1)

        x = z[:, self.kernel_len:] * sigma + mu
        return x, jnp.log(sigma)


class NMAFlowStack(nn.Module):
    """Base windowed normal + ``no_flows`` ConvIAF flows (+ pairwise permutes in 2-D).

    Mirrors ``Flow_Stack`` (``AR.py:92-110``): flow i consumes the previous
    flow's sample; 1-D flows see progressively truncated feature windows
    ``ts_feats[:, i*kernel_len:, :]`` (``AR.py:190-193``), 2-D flows see the
    full window through their transposed projection.

    ``__call__(z, ts_feats, theta)`` takes base noise z of shape
    (p, kernel_ext) and returns ``(x, log_q)`` with x of shape
    (p, flow_dims * batch_dims + flow_dims) and log_q of shape (p,).
    """

    network_dims: Tuple[int, ...]
    kernel_len: int
    no_flows: int
    batch_dims: int
    flow_dims: int = 1
    use_norm: bool = False
    mu_softplus: bool = False
    sigma_eps: float = 1e-10
    aligned_feats: bool = False  # see ConvIAF.aligned_feats
    fused_tail: str = "off"      # see ConvIAF.fused_tail
    conv_mode: str = "conv"      # see ConvIAF.conv_mode
    compute_dtype: str = "float32"  # see ConvIAF.compute_dtype
    out_init_zero: bool = False  # see ConvIAF.out_init_zero
    # Batch the per-flow feature MLPs into one einsum chain over a leading
    # flow axis (1-D / aligned-2-D paths only). The MLPs are pointwise over
    # time, so MLP_i(ts_feats[:, iK:]) == MLP_i(ts_feats)[:, iK:] — compute
    # all flows on the full window at once, slice per flow. Cuts the feature
    # path from 12 to 4 matmul dispatches per forward (3 flows x 4 layers).
    # NOTE: declares its own stacked parameter layout (bfeat_j_*), so
    # checkpoints don't interchange with the per-flow layout.
    batched_feat_mlp: bool = False
    # Rematerialize each flow in the backward pass (jax.checkpoint): trades
    # ~1 extra forward per flow for not keeping its activations in HBM —
    # the standard memory lever for long windows / many flows.
    remat: bool = False

    @nn.compact
    def __call__(self, z, ts_feats, theta):
        window = self.flow_dims * self.batch_dims
        kernel_ext = z.shape[1]
        # windowed base log-prob (AR.py:31-35)
        log_q = jnp.sum(normal_logpdf(z, 0.0, 1.0)[:, -window:], axis=1)
        embs = None
        if self.batched_feat_mlp:
            assert self.flow_dims == 1 or self.aligned_feats, (
                "batched_feat_mlp requires the 1-D or aligned-2-D feature path")
            assert self.fused_tail == "off"
            w0 = self.network_dims[0]
            cd = jnp.bfloat16 if self.compute_dtype == "bfloat16" else None
            h = ts_feats[:, :-1, :]
            dims = [h.shape[-1]] + [w0] * 4
            init = nn.initializers.lecun_normal(batch_axis=(0,))
            for j in range(4):  # AR.py:53-56, all flows in one einsum
                W = self.param(f"bfeat_{j}_kernel", init,
                               (self.no_flows, dims[j], dims[j + 1]), jnp.float32)
                b = self.param(f"bfeat_{j}_bias", nn.initializers.zeros,
                               (self.no_flows, dims[j + 1]), jnp.float32)
                if cd is not None:
                    h, W, b = h.astype(cd), W.astype(cd), b.astype(cd)
                eq = "plf,nfo->nplo" if j == 0 else "nplf,nfo->nplo"
                h = nn.elu(jnp.einsum(eq, h, W) + b[:, None, None, :])
            embs = h  # (no_flows, p, Lf-1, w0)
        x = z
        for i in range(self.no_flows):
            if embs is not None:
                feats = embs[i][:, i * self.kernel_len :, :]
                feat_dims = 0
            elif self.flow_dims == 1 or self.aligned_feats:
                feats = ts_feats[:, i * self.kernel_len :, :]
                feat_dims = 0
            else:
                feats = ts_feats
                # conv input length of flow i, minus one (lotka_volterra_partial.py:281)
                feat_dims = kernel_ext - 1 - i * self.kernel_len
            flow_cls = nn.remat(ConvIAF) if self.remat else ConvIAF
            x, log_sigma = flow_cls(
                network_dims=self.network_dims,
                kernel_len=self.kernel_len,
                flow_dims=self.flow_dims,
                feat_dims=feat_dims,
                use_norm=self.use_norm,
                mu_softplus=self.mu_softplus,
                sigma_eps=self.sigma_eps,
                aligned_feats=self.aligned_feats,
                fused_tail=self.fused_tail,
                conv_mode=self.conv_mode,
                compute_dtype=self.compute_dtype,
                out_init_zero=self.out_init_zero,
                precomputed_feats=embs is not None,
                name=f"flow_{i}",
            )(x, feats, theta)
            log_q = log_q - jnp.sum(log_sigma[:, -window:], axis=1)
            if self.flow_dims == 2 and i < self.no_flows - 1:
                x = pairwise_swap(x)  # species alternation between flows
        return x, log_q
