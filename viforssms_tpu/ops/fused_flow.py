"""Pallas TPU megakernel: one NMA conv-flow "tail" in a single VMEM pass.

Motivation (measured on v5e, LV-partial config, bf16 scanned steps): the XLA
path spends ~25% of device time on layout copies between the convolution
emitter's layouts and the surrounding loop fusions, and runs the small-shape
convs at 12-22% of peak (hlo_stats; docs/RESULTS.md). This kernel computes the
ENTIRE flow tail —

    conv_valid(concat[z[:, :-1, None], feats], W) + b + theta_bias
    -> ELU -> [Dense + ELU (+ ScaleOffset)] x n_tower
    -> Dense(2) -> (mu, softplus(sigma)+eps) [stride-2 interleave in 2-D]
    -> x = z[:, K:] * sigma + mu,  log_sigma

— in ONE pallas_call with every intermediate VMEM-resident (zero HBM traffic
between stages). The backward is a second kernel using flash-style recompute.

TPU-shape discipline (what made it compile): Mosaic code size explodes when a
matmul result is reshaped to 3-D with a non-multiple-of-8 middle dimension
(every slab needs unaligned sublane shuffles, emitted per particle). So the
kernel works ENTIRELY in a flat 2-D domain: rows are (particle-major,
position-minor) with the per-particle length padded to a multiple of 8, the
causal conv is K row-shifted full-width matmuls, the stride-2 interleave is a
row-parity select (padded length is even, so global row parity == in-particle
position parity), and all per-particle reshapes/reductions happen OUTSIDE the
kernel in XLA where they are cheap fusions.

The fused tail covers the 1-D flow (``AR.py:61-85``) and the ALIGNED 2-D flow
(``FlowConfig.aligned_feats_2d``; stride-2 output + identity interleave,
``lotka_volterra_partial.py:97-104``) — both have conv input channels
``1 + w0``. The reference-parity transposed 2-D mode keeps the XLA path (its
conv input is the transposed global feature mix — the quadratic architecture
itself is the layout problem there).

Numerical parity with the XLA path is pinned by tests/test_fused_flow.py
(values and gradients, interpret mode so they run anywhere).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _elu(x):
    # exp-based (expm1 has no Mosaic lowering)
    return jnp.where(x > 0, x, jnp.exp(x) - 1.0)


def _delu(x):
    # d elu / dx as a function of the PRE-activation
    return jnp.where(x > 0, jnp.ones_like(x), jnp.exp(x))


def _softplus(x):
    return jnp.logaddexp(x, 0.0)


def _mm(a, b, dtype):
    """2-D matmul with optional bf16 operand rounding, f32 accumulation."""
    if dtype == jnp.bfloat16:
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def cfg_conv_group(K: int) -> int:
    """Taps per partial-im2col group (contraction depth = group * Cin).

    8 balances MXU contraction depth against the VMEM footprint of the
    lane-concatenated shifted copies (G copies of the conv input live at the
    matmul; the backward is split into two kernels to keep each stack small)."""
    return min(K, 8)


def _shift_up(q, k, N, C):
    """result[r] = q[r + k], rows r >= N-k undefined (circular wrap).

    Implemented as a bare circular roll: Mosaic's native rotate beats the
    slice+concat formulation (narrow-lane concatenate also crashes its
    vectorizer). The wrap is deliberately left unmasked — wrapped values land
    only in rows >= N-k, which are padded/invalid rows of the LAST particle
    (per-particle padded length >= Lout + K - 1), always discarded by the
    wrapper's extraction; in the weight-gradient contraction those rows meet
    exactly-zero cotangents (zero-padded upstream grads stay exactly zero
    through the row-local backward chain), so the products vanish. All
    operands are finite (pad rows are zero, ELU'/sigmoid in (0, 1]), so no
    0*inf NaNs can arise."""
    if k == 0:
        return q
    del C
    return pltpu.roll(q, shift=N - k, axis=0)


def _shift_down(q, k, N, C):
    """result[r] = q[r - k] (zero above the top)."""
    if k == 0:
        return q
    rolled = pltpu.roll(q, shift=k, axis=0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (N, C), 0)
    return jnp.where(rows >= k, rolled, jnp.zeros_like(q))


# ---------------------------------------------------------------------------
# Shared flat-domain forward (VALUES; reused by fwd kernel and bwd recompute)
# ---------------------------------------------------------------------------


def _fwd_flat(xh2, tbF, ztF, wc, bc, tws, tbs, gammas, betas, wo, bo, *,
              K, n_tower, use_norm, flow_dims, mu_softplus, sigma_eps, mm_dtype):
    """xh2 (N, Cin) flat conv input; tbF (N, w0) broadcast theta bias;
    ztF (N, 1) flat z[:, K:] (padded). Returns flat intermediates."""
    N, Cin = xh2.shape
    w0 = tbF.shape[1]

    # Conv via grouped partial-im2col: G shifted copies of the input are
    # lane-concatenated so each MXU pass contracts G*Cin deep (a 20-tap conv
    # as 20 separate Cin-deep dots starves the MXU ~8x; grouping restores
    # near the conv emitter's arithmetic intensity while staying VMEM-local).
    G = cfg_conv_group(K)
    xh_c = xh2  # roll in f32 (Mosaic rotate is 32-bit only); _mm casts
    acc = jnp.zeros((N, w0), jnp.float32)
    for g0 in range(0, K, G):
        g1 = min(g0 + G, K)
        xcat = jnp.concatenate(
            [_shift_up(xh_c, k, N, Cin) for k in range(g0, g1)], axis=1)
        wgrp = wc[g0 * Cin:g1 * Cin, :]
        acc = acc + _mm(xcat, wgrp, mm_dtype)
    pre0 = acc + bc[None, :] + tbF
    a = _elu(pre0)

    pres = [pre0]
    acts = [a]
    for i in range(n_tower):
        pre = _mm(acts[-1], tws[i], mm_dtype) + tbs[i][None, :]
        act = _elu(pre)
        if use_norm:
            act = act * gammas[i][None, :] + betas[i][None, :]
        pres.append(pre)
        acts.append(act)

    o2 = _mm(acts[-1], wo, mm_dtype) + bo[None, :]          # (N, 2)
    mu_all = jax.lax.slice(o2, (0, 0), (N, 1))
    sig_all = jax.lax.slice(o2, (0, 1), (N, 2))

    if flow_dims == 1:
        mu = mu_all
        sigma = _softplus(sig_all) + sigma_eps
    else:
        # row parity == in-particle position parity (padded length is even)
        par = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0) % 2
        sh_mu = _shift_down(mu_all, 1, N, 1)
        sh_sig = _shift_down(sig_all, 1, N, 1)
        if mu_softplus:
            id_mu = jnp.ones((N, 1), jnp.float32)
            mu_t = _softplus(sh_mu) + sigma_eps
        else:
            id_mu = jnp.zeros((N, 1), jnp.float32)
            mu_t = sh_mu
        mu = jnp.where(par == 1, mu_t, id_mu)
        sigma = jnp.where(par == 1, _softplus(sh_sig) + sigma_eps,
                          jnp.ones((N, 1), jnp.float32))
    x = ztF * sigma + mu
    log_sigma = jnp.log(sigma)
    return x, log_sigma, sigma, mu_all, sig_all, pres, acts


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _read_weights(it, n_tower, use_norm):
    wc = next(it)[:]
    bc = next(it)[0, :]
    tws, tbs, gammas, betas = [], [], [], []
    for _ in range(n_tower):
        tws.append(next(it)[:])
        tbs.append(next(it)[0, :])
        if use_norm:
            gammas.append(next(it)[0, :])
            betas.append(next(it)[0, :])
    wo = next(it)[:]
    bo = next(it)[0, :]
    return wc, bc, tws, tbs, gammas, betas, wo, bo


def _make_fwd_kernel(cfg):
    def kernel(*refs):
        it = iter(refs)
        xh2 = next(it)[:]
        tbF = next(it)[:]
        ztF = next(it)[:]
        wc, bc, tws, tbs, gammas, betas, wo, bo = _read_weights(
            it, cfg["n_tower"], cfg["use_norm"])
        out_x = next(it)
        out_ls = next(it)
        x, log_sigma, *_ = _fwd_flat(
            xh2, tbF, ztF, wc, bc, tws, tbs, gammas, betas, wo, bo,
            K=cfg["K"], n_tower=cfg["n_tower"], use_norm=cfg["use_norm"],
            flow_dims=cfg["flow_dims"], mu_softplus=cfg["mu_softplus"],
            sigma_eps=cfg["sigma_eps"], mm_dtype=cfg["mm_dtype"])
        out_x[:] = x
        out_ls[:] = log_sigma

    return kernel


def _make_bwd_stage_kernel(cfg):
    """Backward part 1: recompute forward, backprop output stage + tower.
    Produces dpre0 (the conv-output cotangent); the conv backward runs in a
    SEPARATE kernel so each call's VMEM stack stays within budget (Mosaic's
    scoped allocator keeps the whole unrolled program live)."""
    K, n_tower = cfg["K"], cfg["n_tower"]
    use_norm, flow_dims = cfg["use_norm"], cfg["flow_dims"]
    mu_softplus, mm_dtype = cfg["mu_softplus"], cfg["mm_dtype"]

    def kernel(*refs):
        it = iter(refs)
        xh2 = next(it)[:]
        tbF = next(it)[:]
        ztF = next(it)[:]
        wc, bc, tws, tbs, gammas, betas, wo, bo = _read_weights(it, n_tower, use_norm)
        gx = next(it)[:]      # (N, 1), zero on invalid rows
        gls = next(it)[:]
        dzt_ref = next(it)
        dpre0_ref = next(it)  # (N, w0): conv cotangent; also theta-bias grad rows
        dbc_ref = next(it)
        dtower_refs = [next(it) for _ in range(n_tower * (4 if use_norm else 2))]
        dwo_ref = next(it)
        dbo_ref = next(it)

        N, Cin = xh2.shape

        # --- recompute forward ---
        (x, log_sigma, sigma, mu_all, sig_all, pres, acts) = _fwd_flat(
            xh2, tbF, ztF, wc, bc, tws, tbs, gammas, betas, wo, bo,
            K=K, n_tower=n_tower, use_norm=use_norm, flow_dims=flow_dims,
            mu_softplus=mu_softplus, sigma_eps=cfg["sigma_eps"], mm_dtype=mm_dtype)

        # --- output stage backward ---
        dzt_ref[:] = gx * sigma
        dsigma = gx * ztF + gls / sigma
        dmu = gx
        if flow_dims == 1:
            dmu_all = dmu
            dsig_all = dsigma * jax.nn.sigmoid(sig_all)
        else:
            par = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0) % 2
            sh_mu = _shift_down(mu_all, 1, N, 1)
            sh_sig = _shift_down(sig_all, 1, N, 1)
            dmu_sh = jnp.where(
                par == 1,
                dmu * (jax.nn.sigmoid(sh_mu) if mu_softplus else 1.0), 0.0)
            dsig_sh = jnp.where(par == 1, dsigma * jax.nn.sigmoid(sh_sig), 0.0)
            dmu_all = _shift_up(dmu_sh, 1, N, 1)
            dsig_all = _shift_up(dsig_sh, 1, N, 1)

        do2 = jnp.concatenate([dmu_all, dsig_all], axis=1)   # (N, 2)
        dwo_ref[:] = _mm(acts[-1].T, do2, mm_dtype)
        dbo_ref[0, :] = jnp.sum(do2, axis=0)
        dact = _mm(do2, wo.T, mm_dtype)                      # (N, w0)

        # --- tower backward ---
        for i in range(n_tower - 1, -1, -1):
            pre = pres[i + 1]
            elu_out = _elu(pre)
            if use_norm:
                base = i * 4
                dtower_refs[base + 2][0, :] = jnp.sum(dact * elu_out, axis=0)
                dtower_refs[base + 3][0, :] = jnp.sum(dact, axis=0)
                dact = dact * gammas[i][None, :]
            else:
                base = i * 2
            dpre = dact * _delu(pre)
            dtower_refs[base + 0][:] = _mm(acts[i].T, dpre, mm_dtype)
            dtower_refs[base + 1][0, :] = jnp.sum(dpre, axis=0)
            dact = _mm(dpre, tws[i].T, mm_dtype)

        dpre0 = dact * _delu(pres[0])
        dpre0_ref[:] = dpre0
        dbc_ref[0, :] = jnp.sum(dpre0, axis=0)

    return kernel


def _make_bwd_conv_kernel(cfg):
    """Backward part 2: conv dgrad/wgrad from (xh2, wc, dpre0)."""
    K = cfg["K"]
    mm_dtype = cfg["mm_dtype"]

    def kernel(xh2_ref, wc_ref, dpre0_ref, dwc_ref, dxh_ref):
        xh2 = xh2_ref[:]
        wc = wc_ref[:]
        dpre0 = dpre0_ref[:]
        N, Cin = xh2.shape
        dxh_ref[:] = jnp.zeros((N, Cin), jnp.float32)
        G = cfg_conv_group(K)
        for g0 in range(0, K, G):
            g1 = min(g0 + G, K)
            # dW[group] = xcat^T @ dpre0 (valid: dpre0 zero on pad rows)
            xcat = jnp.concatenate(
                [_shift_up(xh2, k, N, Cin) for k in range(g0, g1)], axis=1)
            dwc_ref[g0 * Cin:g1 * Cin, :] = _mm(xcat.T, dpre0, mm_dtype)
            rg = _mm(dpre0, wc[g0 * Cin:g1 * Cin, :].T, mm_dtype)
            acc_dxh = dxh_ref[:]
            for j, k in enumerate(range(g0, g1)):
                rk = jax.lax.slice(rg, (0, j * Cin), (N, (j + 1) * Cin))
                acc_dxh = acc_dxh + _shift_down(rk, k, N, Cin)
            dxh_ref[:] = acc_dxh

    return kernel


# ---------------------------------------------------------------------------
# Wrappers (XLA side: pad/flatten in, extract out)
# ---------------------------------------------------------------------------


def _flat_weight_inputs(wc, bc, tower_params, wo, bo, use_norm):
    flat = [wc, bc[None, :]]
    for tp in tower_params:
        if use_norm:
            tw, tbias, g, be = tp
            flat += [tw, tbias[None, :], g[None, :], be[None, :]]
        else:
            tw, tbias = tp
            flat += [tw, tbias[None, :]]
    flat += [wo, bo[None, :]]
    return flat


def _prep_inputs(z, feats, tb, K):
    """Pad per-particle length to a multiple of 8 and flatten."""
    P, L = z.shape
    Lm1, Lout = L - 1, L - K
    w0 = tb.shape[1]
    Lp = _round_up(Lm1, 8)
    N = P * Lp
    xh = jnp.concatenate([z[:, :-1, None], feats], axis=2)      # (P, Lm1, Cin)
    xh = jnp.pad(xh, ((0, 0), (0, Lp - Lm1), (0, 0)))
    xh2 = xh.reshape(N, xh.shape[2])
    tbF = jnp.broadcast_to(tb[:, None, :], (P, Lp, w0)).reshape(N, w0)
    zt = jnp.pad(z[:, K:], ((0, 0), (0, Lp - Lout)))
    ztF = zt.reshape(N, 1)
    return xh2, tbF, ztF, Lp, N, Lout


def _compiler_params(cfg):
    if cfg["interpret"]:
        return None
    # the recompute backward holds several (N, w0) stages live; the default
    # 16M scoped-vmem budget is too conservative for this single-program kernel
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _cfg(static, n_tower):
    (K, use_norm, flow_dims, mu_softplus, sigma_eps, mm_name, interpret) = static
    return dict(K=K, n_tower=n_tower, use_norm=use_norm, flow_dims=flow_dims,
                mu_softplus=mu_softplus, sigma_eps=sigma_eps,
                mm_dtype=jnp.bfloat16 if mm_name == "bfloat16" else jnp.float32,
                interpret=interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def fused_flow_tail(z, feats, tb, wc, bc, tower_params, wo, bo, static):
    """Differentiable fused flow tail.

    z (P, L) f32; feats (P, L-1, w0); tb (P, w0) theta bias; wc (K*(1+w0), w0)
    flattened conv kernel; bc (w0,); tower_params: tuple of
    (w, b[, gamma, beta]); wo (w0, 2); bo (2,).
    ``static``: (kernel_len, use_norm, flow_dims, mu_softplus, sigma_eps,
    mm_dtype_name, interpret). Returns (x (P, L-K), log_sigma (P, L-K))."""
    P, L = z.shape
    K = static[0]
    n_tower = len(tower_params)
    cfg = _cfg(static, n_tower)
    xh2, tbF, ztF, Lp, N, Lout = _prep_inputs(z, feats, tb, K)
    kern = _make_fwd_kernel(cfg)
    flat = [xh2, tbF, ztF] + _flat_weight_inputs(
        wc, bc, tuple(tower_params), wo, bo, cfg["use_norm"])
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    xF, lsF = pl.pallas_call(
        kern,
        in_specs=[vspec] * len(flat),
        out_specs=[vspec, vspec],
        out_shape=[jax.ShapeDtypeStruct((N, 1), jnp.float32),
                   jax.ShapeDtypeStruct((N, 1), jnp.float32)],
        compiler_params=_compiler_params(cfg),
        interpret=cfg["interpret"],
    )(*flat)
    x = xF.reshape(P, Lp)[:, :Lout]
    ls = lsF.reshape(P, Lp)[:, :Lout]
    return x, ls


def _bwd_stage_out_shapes(N, w0, n_tower, use_norm):
    shapes = [
        jax.ShapeDtypeStruct((N, 1), jnp.float32),        # dzt (flat)
        jax.ShapeDtypeStruct((N, w0), jnp.float32),       # dpre0 (flat)
        jax.ShapeDtypeStruct((1, w0), jnp.float32),       # dbc
    ]
    for _ in range(n_tower):
        shapes.append(jax.ShapeDtypeStruct((w0, w0), jnp.float32))
        shapes.append(jax.ShapeDtypeStruct((1, w0), jnp.float32))
        if use_norm:
            shapes.append(jax.ShapeDtypeStruct((1, w0), jnp.float32))
            shapes.append(jax.ShapeDtypeStruct((1, w0), jnp.float32))
    shapes.append(jax.ShapeDtypeStruct((w0, 2), jnp.float32))
    shapes.append(jax.ShapeDtypeStruct((1, 2), jnp.float32))
    return shapes


def _fft_fwd(z, feats, tb, wc, bc, tower_params, wo, bo, static):
    out = fused_flow_tail(z, feats, tb, wc, bc, tower_params, wo, bo, static)
    return out, (z, feats, tb, wc, bc, tuple(tower_params), wo, bo)


def _fft_bwd(static, res, g):
    z, feats, tb, wc, bc, tower_params, wo, bo = res
    gx, gls = g
    P, L = z.shape
    K = static[0]
    n_tower = len(tower_params)
    cfg = _cfg(static, n_tower)
    w0 = tb.shape[1]
    Lm1, Lout = L - 1, L - K
    xh2, tbF, ztF, Lp, N, _ = _prep_inputs(z, feats, tb, K)
    # flat cotangents (zero on pad rows)
    gxF = jnp.pad(gx, ((0, 0), (0, Lp - Lout))).reshape(N, 1)
    glsF = jnp.pad(gls, ((0, 0), (0, Lp - Lout))).reshape(N, 1)
    flat = [xh2, tbF, ztF] + _flat_weight_inputs(
        wc, bc, tower_params, wo, bo, cfg["use_norm"]) + [gxF, glsF]
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    # part 1: recompute + output/tower backward -> dpre0
    outs = pl.pallas_call(
        _make_bwd_stage_kernel(cfg),
        in_specs=[vspec] * len(flat),
        out_specs=[vspec] * len(_bwd_stage_out_shapes(N, w0, n_tower, cfg["use_norm"])),
        out_shape=_bwd_stage_out_shapes(N, w0, n_tower, cfg["use_norm"]),
        compiler_params=_compiler_params(cfg),
        interpret=cfg["interpret"],
    )(*flat)
    it = iter(outs)
    dztF = next(it); dpre0F = next(it); dbc = next(it)[0]
    dtower = []
    for _ in range(n_tower):
        dtw = next(it); dtb_i = next(it)[0]
        if cfg["use_norm"]:
            dg = next(it)[0]; dbe = next(it)[0]
            dtower.append((dtw, dtb_i, dg, dbe))
        else:
            dtower.append((dtw, dtb_i))
    dwo = next(it); dbo = next(it)[0]
    # part 2: conv dgrad/wgrad
    Cin = 1 + w0
    dwc, dxhF = pl.pallas_call(
        _make_bwd_conv_kernel(cfg),
        in_specs=[vspec] * 3,
        out_specs=[vspec, vspec],
        out_shape=[jax.ShapeDtypeStruct((K * Cin, w0), jnp.float32),
                   jax.ShapeDtypeStruct((N, Cin), jnp.float32)],
        compiler_params=_compiler_params(cfg),
        interpret=cfg["interpret"],
    )(xh2, wc, dpre0F)
    # un-flatten (XLA side)
    dxh3 = dxhF.reshape(P, Lp, 1 + w0)[:, :Lm1, :]
    dfeats = dxh3[:, :, 1:]
    dz = jnp.zeros((P, L), jnp.float32)
    dz = dz.at[:, :Lm1].add(dxh3[:, :, 0])
    dz = dz.at[:, K:].add(dztF.reshape(P, Lp)[:, :Lout])
    dtb = dpre0F.reshape(P, Lp, w0).sum(axis=1)
    return dz, dfeats, dtb, dwc, dbc, tuple(dtower), dwo, dbo


fused_flow_tail.defvjp(_fft_fwd, _fft_bwd)


def flow_tail_reference(z, feats, tb, wc, bc, tower_params, wo, bo, static):
    """Pure-XLA forward with identical semantics (tests + fallback): the
    standard conv formulation, NOT the flat-domain one."""
    (K, use_norm, flow_dims, mu_softplus, sigma_eps, _, _) = static
    P, L = z.shape
    inp = jnp.concatenate([z[:, :-1, None], feats], axis=2)
    Cin = inp.shape[2]
    w = wc.reshape(K, Cin, -1)
    dn = jax.lax.conv_dimension_numbers(inp.shape, w.shape, ("NWC", "WIO", "NWC"))
    conv = jax.lax.conv_general_dilated(inp, w, (1,), "VALID", dimension_numbers=dn)
    h = jax.nn.elu(conv + bc + tb[:, None, :])
    for tp in tower_params:
        if use_norm:
            tw, tbias, g, be = tp
        else:
            tw, tbias = tp
        h = jax.nn.elu(h @ tw + tbias)
        if use_norm:
            h = h * g + be
    if flow_dims == 1:
        out = h @ wo + bo
        mu = out[:, :, 0]
        sigma = jax.nn.softplus(out[:, :, 1]) + sigma_eps
    else:
        out = h[:, ::2, :] @ wo + bo
        mu_t, sig_t = out[:, :, 0], out[:, :, 1]
        if mu_softplus:
            id_mu = jnp.ones_like(mu_t)
            mu_t = jax.nn.softplus(mu_t) + sigma_eps
        else:
            id_mu = jnp.zeros_like(mu_t)
        sig_t = jax.nn.softplus(sig_t) + sigma_eps
        mu = jnp.stack([id_mu, mu_t], 2).reshape(P, -1)
        sigma = jnp.stack([jnp.ones_like(sig_t), sig_t], 2).reshape(P, -1)
    x = z[:, K:] * sigma + mu
    return x, jnp.log(sigma)


# ---------------------------------------------------------------------------
# Module-level helpers (parameter plumbing for flows/nma.py)
# ---------------------------------------------------------------------------


def tail_param_specs(kernel_len, cin, w0, n_tower, use_norm):
    """(name, shape, init) triples for the fused tail's parameters, matching
    the XLA path's initial distributions (flax Conv/Dense defaults)."""
    import flax.linen as nn

    lecun = nn.initializers.lecun_normal()
    zeros = nn.initializers.zeros
    ones = nn.initializers.ones
    specs = [
        ("conv_kernel", (kernel_len * cin, w0), lecun),
        ("conv_bias", (w0,), zeros),
    ]
    for i in range(n_tower):
        specs += [(f"tower_{i}_kernel", (w0, w0), lecun),
                  (f"tower_{i}_bias", (w0,), zeros)]
        if use_norm:
            specs += [(f"norm_{i}_scale", (w0,), ones),
                      (f"norm_{i}_offset", (w0,), zeros)]
    specs += [("out_kernel", (w0, 2), lecun), ("out_bias", (2,), zeros)]
    return specs


def tail_params_from_xla(flow_params, n_tower, use_norm):
    """Convert one ConvIAF's XLA-path param dict (conv_in/tower_i/norm_i/out
    submodules) to the fused flat layout — checkpoint migration + exact A/B."""
    import numpy as np

    p = flow_params
    K, cin, w0 = p["conv_in"]["kernel"].shape
    out = {
        "conv_kernel": np.asarray(p["conv_in"]["kernel"]).reshape(K * cin, w0),
        "conv_bias": np.asarray(p["conv_in"]["bias"]),
    }
    for i in range(n_tower):
        out[f"tower_{i}_kernel"] = np.asarray(p[f"tower_{i}"]["kernel"])
        out[f"tower_{i}_bias"] = np.asarray(p[f"tower_{i}"]["bias"])
        if use_norm:
            out[f"norm_{i}_scale"] = np.asarray(p[f"norm_{i}"]["scale"])
            out[f"norm_{i}_offset"] = np.asarray(p[f"norm_{i}"]["offset"])
    out["out_kernel"] = np.asarray(p["out"]["kernel"])
    out["out_bias"] = np.asarray(p["out"]["bias"])
    return out


def tail_args_from_params(params, n_tower, use_norm):
    """(wc, bc, tower_params, wo, bo) from a fused flat param dict."""
    tower = []
    for i in range(n_tower):
        tp = [params[f"tower_{i}_kernel"], params[f"tower_{i}_bias"]]
        if use_norm:
            tp += [params[f"norm_{i}_scale"], params[f"norm_{i}_offset"]]
        tower.append(tuple(tp))
    return (params["conv_kernel"], params["conv_bias"], tuple(tower),
            params["out_kernel"], params["out_bias"])
