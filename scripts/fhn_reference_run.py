"""FHN at the FULL reference scale, trained to a CONVERGED ELBO curve.

``fitz_nag_NVP.py:453-468`` is the reference's headline regime: T=1e5 time
units at dt=0.1 — one million latent steps — trained indefinitely at
lr=1e-4. Round 2 ran it mechanically (20k steps, explicitly unconverged,
docs/RESULTS.md). This script gives it a real budget: scan-chunked windowed
training (the only memory-feasible regime for 2e6 path coordinates on one
chip — the full-path engine's activation stash would be ~terabytes),
checkpointed and resumable, logging the per-chunk ELBO to a JSONL curve and
stopping on a measured plateau.

Convergence evidence written to validation/fhn_ref.json:
  * the ELBO curve (validation/fhn_ref/elbo_curve.jsonl) with a plateau
    statistic: relative improvement of the mean chunk-ELBO between the last
    two 10%-budget spans;
  * theta posterior vs the generating parameters — with ~1e5 observations
    the posterior is tight around truth iff training converged;
  * posterior-path observation residuals.

Posterior-parity validation for FHN lives at the decimated-T config
(validation/fhn.json, T=2000, joint NUTS gold): a 2e6-dim NUTS is not a
usable gold standard at this scale, which is exactly why the reference's
regime needs the windowed ELBO in the first place.

Run on the TPU:  python scripts/fhn_reference_run.py [--steps 2000000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VAL_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "validation")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2_000_000,
                    help="training budget (resume-aware)")
    ap.add_argument("--T", type=float, default=100_000.0,
                    help="series length in time units (1e5 -> 1e6 latent steps)")
    ap.add_argument("--chunk", type=int, default=10_000,
                    help="steps per logged dispatch chunk")
    ap.add_argument("--plateau-tol", type=float, default=3e-4,
                    help="stop when |Δ mean ELBO| between the last two "
                         "10%%-budget spans < tol * |ELBO|")
    args = ap.parse_args()

    from viforssms_tpu.core.platform import apply_platform_env

    apply_platform_env()
    import dataclasses

    import jax

    from viforssms_tpu.cli.experiments import build_fitz_nag
    from viforssms_tpu.utils.checkpoint import Checkpointer

    t_build = time.time()
    # normalize_time: at T=1e5 time units the raw absolute-time channel
    # freezes training from step one (conv outputs ~1e5, SDE density -1e20,
    # every gradient norm overflows -> the global-norm clip zeroes all
    # updates; measured, round 4). See lv_tables(time_scale=...).
    eng, info = build_fitz_nag(synthetic=True, T=args.T, normalize_time=True)
    # belt+braces at this scale: skip any update whose gradients are
    # non-finite instead of letting the clip NaN/zero the whole step
    eng = dataclasses.replace(eng, skip_nonfinite_updates=True)
    target = info["target"]
    print(f"built engine: {target} latent steps x 2 dims "
          f"({time.time() - t_build:.0f}s)", flush=True)

    cfg_dir = os.path.join(VAL_DIR, "fhn_ref")
    os.makedirs(cfg_dir, exist_ok=True)
    curve_path = os.path.join(cfg_dir, "elbo_curve.jsonl")
    ckpt = Checkpointer(os.path.join(cfg_dir, "ckpt"))
    meta_path = os.path.join(cfg_dir, "fit_meta.json")

    state = eng.init(jax.random.key(1))
    restored = ckpt.restore(state)
    if restored is not None and int(restored.step) > 0:
        with open(meta_path) as f:
            meta = json.load(f)
        # review r4: a checkpoint trained on the raw-time feature table has
        # identical parameter shapes but incompatible weights (inputs differ
        # by 1e5x) — refuse to continue it silently
        if not meta.get("normalize_time", False):
            raise SystemExit(
                "validation/fhn_ref checkpoint predates normalize_time "
                "(raw-time feature table); delete validation/fhn_ref and "
                "restart — resuming would mix feature conventions")
        state = restored
        fit_done = int(meta["fit_steps"])
        print(f"resumed at step {int(state.step)} (fit steps {fit_done})",
              flush=True)
    else:
        fit_done = 0
        t0 = time.time()
        state = eng.pretrain(state, finite_gate=1000, scan_chunk=200)
        print(f"pretrain (finite gate) done in {time.time() - t0:.0f}s "
              f"at step {int(state.step)}", flush=True)
        ckpt.save(state)
        with open(meta_path, "w") as f:
            json.dump({"fit_steps": 0, "normalize_time": True}, f)

    # ELBO curve accumulates across resumes
    curve = []
    if os.path.exists(curve_path):
        with open(curve_path) as f:
            curve = [json.loads(l) for l in f if l.strip()]

    span = max(args.steps // 10, args.chunk)  # plateau comparison window

    def span_mean(lo, hi):
        vals = [c["elbo"] for c in curve if lo <= c["fit_steps"] <= hi]
        return float(np.mean(vals)) if vals else None

    converged = False
    while fit_done < args.steps:
        n = min(args.chunk, args.steps - fit_done)
        tc = time.time()
        state, m = eng.fit(state, num_steps=n, scan_chunk=2000)
        elbo_now = float(m.elbo)  # forces dispatch completion: honest timing
        dt_c = time.time() - tc
        fit_done += n
        rec = {"fit_steps": fit_done, "elbo": elbo_now,
               "sde_lp": float(m.sde_lp), "obs_lp": float(m.obs_lp),
               "path_lq": float(m.path_lq), "grad_norm": float(m.grad_norm),
               "steps_per_s": round(n / dt_c, 1),
               "t": time.strftime("%H:%M:%S")}
        curve.append(rec)
        with open(curve_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        ckpt.save(state)
        with open(meta_path, "w") as f:
            json.dump({"fit_steps": fit_done, "normalize_time": True}, f)
        print(f"  {fit_done}/{args.steps}: elbo {rec['elbo']:.6g} "
              f"({rec['steps_per_s']} steps/s)", flush=True)
        # plateau check on the last two spans
        if fit_done >= 2 * span:
            a = span_mean(fit_done - 2 * span, fit_done - span)
            b = span_mean(fit_done - span, fit_done)
            if a is not None and b is not None and abs(b) > 0:
                rel = (b - a) / abs(b)
                if abs(rel) < args.plateau_tol:
                    print(f"plateau: span means {a:.6g} -> {b:.6g} "
                          f"(rel {rel:.2e} < {args.plateau_tol})", flush=True)
                    converged = True
                    break

    # --- convergence evidence ---
    theta = eng.sample_theta(state.params, jax.random.key(7), 20_000)
    names = ("log_eps", "alpha", "beta", "log_s1", "log_s2")
    truth = np.asarray(info["theta_true"], np.float64)
    tm, ts = theta.mean(0), theta.std(0)
    z_truth = np.abs(tm - truth) / np.maximum(ts, 1e-12)

    # observation residuals on a posterior path sample (bounded dispatches)
    t_terms = eng.eval_terms(state.params, jax.random.key(8),
                             eng._sample_starts(jax.random.key(9)))
    obs_lp_per_window = float(np.mean(np.asarray(t_terms.obs_lp)))

    last = curve[-1] if curve else {}
    a = span_mean(fit_done - 2 * span, fit_done - span)
    b = span_mean(fit_done - span, fit_done)
    out = {
        "config": "fhn_ref",
        "reference": "fitz_nag_NVP.py:453-468 (T=1e5, dt=0.1 -> 1e6 latent steps)",
        "normalize_time": True,
        "latent_steps": int(target),
        "fit_steps": fit_done,
        "budget": args.steps,
        "converged_plateau": converged,
        "plateau_spans": [a, b],
        "plateau_rel_change": (None if not (a and b) else (b - a) / abs(b)),
        "final": last,
        "theta_names": list(names),
        "theta_mean": tm.tolist(),
        "theta_sd": ts.tolist(),
        "theta_truth": truth.tolist(),
        "theta_z_vs_truth": z_truth.tolist(),
        "obs_lp_per_window": obs_lp_per_window,
        "posterior_parity_at_decimated_T": "validation/fhn.json (T=2000, joint NUTS gold)",
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    with open(os.path.join(VAL_DIR, "fhn_ref.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("saved validation/fhn_ref.json", flush=True)
    for i, nm in enumerate(names):
        print(f"{nm}: {tm[i]:.4f}±{ts[i]:.4f} truth {truth[i]:.4f} "
              f"z {z_truth[i]:.1f}", flush=True)


if __name__ == "__main__":
    main()
