"""LV-partial path-posterior floor: PSIS-corrected means + translation probe.

Round-5 context (VERDICT r4 item 8): the judged lv_partial path bias/sd
median sits at ~0.25 gold SDs from the pinned-theta path-NUTS gold across
every treatment tried — windowed (0.269), exact full-path ELBO at 12k/40k
steps (0.228/0.254), full-path IWAE k=25 (0.280), and a capacity-boosted
family (5 flows x 64 wide, 90k steps: 0.251). A plateau that survives 2x
capacity and 7x training is not a fit defect. This script settles what it
is, with the same rigor the round-3/4 theta floors used:

1. **PSIS-corrected path means** — every full-path particle is an exact
   importance draw (``SequenceVIEngine.importance_draws``); if the smoothed
   weights are usable (k_hat < 0.7), SNIS path means are a strictly better
   posterior estimator than raw q means and may beat the plateau outright.
   SIR draws (resampling proportional to smoothed weights) feed the same
   ``_path_block`` comparison as every other artifact.
2. **Translation probe (CRN)** — shift the VI path distribution's mean
   toward the gold mean in the unconstrained (pre-softplus) space:
   ``u' = u + alpha * (mean_gold_u - mean_vi_u)``. A mean translation
   leaves q's entropy invariant, so ``ELBO(alpha) - ELBO(0) =
   E_q[log p(u + a*delta | y) - log p(u | y)]`` with the exact
   pinned-theta path posterior density (the gold's own target,
   ``ssm2d_path_log_posterior``). alpha* = 0 with every toward-gold alpha
   significantly negative certifies the residual as the reverse-KL
   objective's optimum under mean translations (the mean-vs-mode gap of a
   skewed posterior), not a missing 0.05 of convergence.

Writes validation/floor_lv_path.json.

Run (chip):  python scripts/lv_path_floor.py [--tag lv_fullpath_cap]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from validate_baseline import (  # noqa: E402
    VAL_DIR,
    _dat_dir,
    _path_block,
    _vi_paths_batched,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="lv_fullpath_cap",
                    help="full-path study checkpoint to certify")
    ap.add_argument("--no-flows", type=int, default=5)
    ap.add_argument("--net-width", type=int, default=64)
    ap.add_argument("--batches", type=int, default=40,
                    help="importance/translation draw batches of p=50")
    args = ap.parse_args()

    from viforssms_tpu.core.platform import apply_platform_env

    apply_platform_env()
    import dataclasses

    import jax
    import jax.numpy as jnp

    from viforssms_tpu.cli.experiments import build_lv_partial
    from viforssms_tpu.core.config import FlowConfig  # noqa: F401
    from viforssms_tpu.data.features import lv_tables
    from viforssms_tpu.distributions.bijectors import Softplus
    from viforssms_tpu.inference.quality import psis
    from viforssms_tpu.inference.validate import ssm2d_path_log_posterior
    from viforssms_tpu.inference.vi.sequence_train import SequenceVIEngine
    from viforssms_tpu.utils.checkpoint import Checkpointer

    t0 = time.time()
    weng, info = build_lv_partial(dat_dir=_dat_dir())
    over = {}
    if args.tag == "lv_fullpath_off":
        over = {"learn_mean_offset": True}
    if args.tag == "lv_fullpath_off2":
        over = {"learn_mean_offset": True, "offset_update_scale": 5.0}
    if args.tag == "lv_fullpath_cap":
        kl, nf, w = 20, args.no_flows, args.net_width
        cfg = dataclasses.replace(
            weng.cfg, flow=dataclasses.replace(
                weng.cfg.flow, kernel_len=kl, no_flows=nf,
                network_dims=(w,) * 5))
        tables, spec = lv_tables(info["obs"], info["obs_bin"],
                                 info["time_till"], kl, nf,
                                 weng.cfg.flow.feat_window, 50,
                                 x0=info["x0"], dt=info["dt"])
        weng = dataclasses.replace(weng, cfg=cfg, tables=tables, spec=spec)
    eng = SequenceVIEngine.from_windowed(weng, **over)
    state = Checkpointer(os.path.join(VAL_DIR, args.tag, "ckpt")).restore(
        eng.init(jax.random.key(1)))
    assert state is not None, f"run lv_fullpath_study for {args.tag} first"

    cands = sorted(glob.glob(os.path.join(VAL_DIR, "lv_partial",
                                          "gold_path_nuts*.npz")),
                   key=os.path.getmtime)
    with np.load(cands[-1]) as z:
        gold_u = z["u"]                                   # (n, C, 2T)
    gold_file = os.path.basename(cands[-1])
    sp = Softplus()
    gold_paths = np.asarray(sp.forward(jnp.asarray(gold_u)))
    gold_u_mean = gold_u.reshape(-1, gold_u.shape[-1]).mean(0)

    # ---- 1. PSIS-corrected path means ----
    theta_pin = np.asarray(info["theta_prior_mean"], np.float32)
    xs, lws = [], []
    key = jax.random.key(7)
    for b in range(args.batches):
        key, sub = jax.random.split(key)
        th, x, lw = eng.importance_draws(state.params, sub, num_batches=1)
        xs.append(np.asarray(x)), lws.append(np.asarray(lw))
    x_all = np.concatenate(xs, 0)                         # (S, 2, T)
    lw_all = np.concatenate(lws, 0)
    finite = np.isfinite(lw_all)
    n_drop = int((~finite).sum())
    if n_drop:
        print(f"dropping {n_drop} non-finite importance draws", flush=True)
    x_all, lw_all = x_all[finite], lw_all[finite]
    ps = psis(lw_all)
    k_hat = float(ps.k_hat)
    lw_s = np.asarray(ps.log_weights)
    if not np.isfinite(lw_s).all():
        # a near-uniform tail degenerates the Pareto fit (sigma<=0 ->
        # NaN smoothed weights); raw weights are already well-behaved there
        print("PSIS smoothing degenerate on near-uniform tail — using raw "
              "weights", flush=True)
        lw_s = lw_all
    wts = np.exp(lw_s - lw_s.max())
    wts = wts / wts.sum()
    ess = float(1.0 / np.sum(wts ** 2))
    print(f"full-path importance weights: k_hat {k_hat:.3f}, "
          f"ESS {ess:.1f}/{len(wts)}", flush=True)
    psis_block = None
    if k_hat < 0.7:
        idx = np.random.RandomState(0).choice(len(wts), size=len(wts),
                                              p=wts)
        psis_block = _path_block(
            x_all[idx].reshape(len(idx), -1), gold_paths)
        print(f"PSIS-SIR path block: median "
              f"{psis_block['bias_sd_median']:.3f}, max "
              f"{psis_block['bias_sd_max']:.2f}", flush=True)

    # ---- 2. translation probe in unconstrained space ----
    vi_paths = _vi_paths_batched(eng, state.params, jax.random.key(22),
                                 args.batches)            # (S, 2, T)
    S = vi_paths.shape[0]
    u_vi = np.asarray(sp.inverse(jnp.asarray(
        vi_paths.reshape(S, -1).astype(np.float64))))
    delta = jnp.asarray(gold_u_mean - u_vi.mean(0), jnp.float32)
    logp = ssm2d_path_log_posterior(weng.model, info["obs"], info["obs_bin"],
                                    info["x0"], theta_pin,
                                    path_transform=sp)
    logp_v = jax.jit(jax.vmap(logp))
    alphas = [-0.25, 0.0, 0.25, 0.5, 0.75, 1.0]
    u_j = jnp.asarray(u_vi, jnp.float32)
    base = np.asarray(logp_v(u_j))
    curve, curve_se = {}, {}
    for a in alphas:
        d = np.asarray(logp_v(u_j + a * delta)) - base    # paired per draw
        curve[f"{a:+.2f}"] = float(d.mean())
        curve_se[f"{a:+.2f}"] = float(d.std() / np.sqrt(S))
        print(f"alpha={a:+.2f}: dELBO {d.mean():.2f} ± "
              f"{d.std() / np.sqrt(S):.2f}", flush=True)
    toward = [a for a in alphas if a > 0]
    sig = all(curve[f"{a:+.2f}"] + 2 * curve_se[f"{a:+.2f}"] < 0
              for a in toward)
    a_star = max(curve, key=lambda k: curve[k])
    floor_ok = float(a_star) <= 0.0 and sig

    out = {
        "config": args.tag,
        "gold_file": gold_file,
        "k_hat": k_hat, "snis_ess": ess,
        "psis_sir_paths": psis_block,
        "translation_probe": {
            "space": "unconstrained (pre-softplus), entropy-invariant mean "
                     "shift toward the gold u-mean",
            "delta_elbo_vs_alpha0": curve,
            "se": curve_se,
            "alpha_star": float(a_star),
            "toward_gold_all_significantly_negative": bool(sig),
        },
        "floor_certified": bool(floor_ok),
        "draws": int(S),
        "plateau_evidence": {
            "windowed": 0.269, "fullpath_40k": 0.254, "fullpath_iw25": 0.280,
            "cap_5flows_64wide_90k": 0.251,
            "note": "path bias/sd medians across treatments (round-5 runs)"},
        "wall_s": round(time.time() - t0, 1),
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    with open(os.path.join(VAL_DIR, "floor_lv_path.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(f"floor_certified={floor_ok} -> validation/floor_lv_path.json",
          flush=True)


if __name__ == "__main__":
    main()
