"""Analytic speed-of-light accounting for the NMA train step.

Factored out of ``scripts/roofline.py`` (round 4) so ``bench.py`` and the
learn-theta bench can report model FLOP utilization (MFU) next to steps/s —
the judging bar for single-chip perf is %-of-peak, not raw steps
(VERDICT r3 item 5).

FLOPs are counted analytically from the ConvIAF geometry (``flows/nma.py``;
SURVEY.md §3.5 names the conv/dense chain as the dominant compute), backward
taken as 2x forward on the matmul path (dgrad + wgrad). This is the MODEL
FLOP count — layout copies, gathers, and XLA bookkeeping are excluded, which
is exactly what makes the ratio an MFU rather than a hardware counter.
"""

from __future__ import annotations

# Per-chip peaks (public specs). device_kind carries the marketing name
# ("TPU v5 lite") on every JAX TPU backend.
PEAK = {
    "tpu v5 lite": {"bf16_tflops": 197.0, "f32_tflops": 98.5,
                    "hbm_gbps": 819.0},
    "tpu v4": {"bf16_tflops": 275.0, "f32_tflops": 137.5, "hbm_gbps": 1228.0},
    "tpu v5p": {"bf16_tflops": 459.0, "f32_tflops": 229.5, "hbm_gbps": 2765.0},
    "tpu v6 lite": {"bf16_tflops": 918.0, "f32_tflops": 459.0,
                    "hbm_gbps": 1640.0},
}


def device_peak(device) -> dict | None:
    """Peak table entry for a jax device, or None when unknown."""
    dev = f"{getattr(device, 'device_kind', '')} {device}".lower()
    for k, v in PEAK.items():
        if k in dev:
            return v
    return None


def flow_step_flops(p, kernel_ext, F, w0, n_feat_layers, kernel_len, n_tower,
                    no_flows, flow_dims, theta_dim):
    """Matmul FLOPs (fwd) of one ELBO evaluation, from the ConvIAF geometry
    (flows/nma.py): per flow — feature dense layers F->w0->w0..., causal
    conv (K*(1+w0) -> w0 per position), 1x1 tower, output head, theta
    embedding."""
    L = kernel_ext - 1             # feature/conv positions per window
    fl = 0
    for i in range(no_flows):
        Lf = L - i * kernel_len    # truncated feature window per flow
        Lc = kernel_ext - (i + 1) * kernel_len  # conv output positions
        dims = [F] + [w0] * n_feat_layers
        fl += sum(2 * Lf * dims[j] * dims[j + 1] for j in range(n_feat_layers))
        fl += 2 * Lc * kernel_len * (1 + w0) * w0          # causal conv
        fl += 2 * Lc * w0 * w0 * n_tower                   # 1x1 tower
        out_pos = Lc // 2 if flow_dims == 2 else Lc
        fl += 2 * out_pos * w0 * 2                         # mu/sigma head
        fl += 2 * (theta_dim * w0 + 2 * w0 * w0)           # theta embed
    return p * fl


def engine_step_flops(eng) -> int:
    """Total matmul FLOPs (fwd + dgrad + wgrad) of one train step of a
    windowed VIEngine-family engine."""
    fw = eng.cfg.flow
    F = int(eng.tables.feat.shape[-1])
    fwd = flow_step_flops(
        p=eng.cfg.p, kernel_ext=eng.spec.kernel_ext, F=F,
        w0=fw.network_dims[0], n_feat_layers=4, kernel_len=fw.kernel_len,
        n_tower=len(fw.network_dims[1:-1]), no_flows=fw.no_flows,
        flow_dims=fw.flow_dims, theta_dim=eng.model.theta_dim)
    return 3 * fwd


def mfu_fields(eng, steps_per_sec) -> dict:
    """MFU block for a bench JSON line: achieved model TFLOP/s and
    %-of-peak at bf16/f32 when the device is in the peak table."""
    import jax

    total = engine_step_flops(eng)
    achieved = total * steps_per_sec / 1e12
    out = {
        "analytic_total_gflops_per_step": round(total / 1e9, 2),
        "achieved_model_tflops": round(achieved, 3),
    }
    peak = device_peak(jax.devices()[0])
    if peak:
        out["mfu_bf16"] = round(100 * achieved / peak["bf16_tflops"], 2)
        out["mfu_f32"] = round(100 * achieved / peak["f32_tflops"], 2)
    return out
