"""Objective-floor certificate for the FHN REFERENCE-scale theta bias.

``validation/fhn_ref.json`` (T=1e5 time units -> 1e6 latent steps, the
reference's headline regime, ``fitz_nag_NVP.py:453-468``) converged with
``log_eps`` ~0.055 nats below truth at a posterior sd of 0.0014 — z~40 vs
truth. At the decimated T=2000 config the identical bias was shown to be the
reverse-KL objective's own optimum and was removed by the PF-evidence
forward-KL refit (``validation/fhn_smc_refit.json``). At T=1e6 steps a
bootstrap-PF evidence estimate with usable SNIS noise (~1-2 nats) would need
~2M particles per draw (logZ variance grows ~T/N; the T=2000 config measured
2.3 nats at N=4096), which is out of reach for one chip — so this script
certifies the bias the way round 3 certified the SV floor instead
(VERDICT r4 item 3's sanctioned alternative).

Translation probe, common random numbers: translate ONLY the theta samples
of the trained flow by ``alpha * (truth - vi_mean)`` (a de-biasing shift;
``q_alpha`` is the pushforward of q under a constant shift, so
``log q_alpha(theta') = log q(theta)`` and the entropy is alpha-invariant)
and evaluate the engine's own windowed training objective with the SAME
window/noise/theta draws across every alpha. If the objective's optimum sits
at alpha=0 and every step toward truth costs a significantly positive amount
of ELBO, the z~40 residual is the training objective's optimum at reference
scale — a floor, not a fit defect.

Writes a ``floor_certificate`` block into validation/fhn_ref.json.

Run (chip):  python scripts/fhn_ref_floor.py [--chunk 100] [--chunks 40]
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
    ap.add_argument("--T", type=float, default=100_000.0)
    ap.add_argument("--chunk", type=int, default=100,
                    help="paired ELBO draws per device dispatch")
    ap.add_argument("--chunks", type=int, default=40,
                    help="dispatches per alpha (draws = chunk * chunks)")
    args = ap.parse_args()

    from viforssms_tpu.core.platform import apply_platform_env

    apply_platform_env()
    import jax
    import jax.numpy as jnp

    from viforssms_tpu.cli.experiments import build_fitz_nag
    from viforssms_tpu.inference.vi.elbo import compute_elbo
    from viforssms_tpu.utils.checkpoint import Checkpointer

    t0 = time.time()
    eng, info = build_fitz_nag(synthetic=True, T=args.T, normalize_time=True)
    # match the engine the checkpoint was saved under
    # (scripts/fhn_reference_run.py wraps the optimizer in apply_if_finite)
    import dataclasses

    eng = dataclasses.replace(eng, skip_nonfinite_updates=True)
    cfg_dir = os.path.join(VAL_DIR, "fhn_ref")
    state = Checkpointer(os.path.join(cfg_dir, "ckpt")).restore(
        eng.init(jax.random.key(1)))
    assert state is not None and int(state.step) > 0, (
        "run scripts/fhn_reference_run.py first")
    params = state.params
    truth = np.asarray(info["theta_true"], np.float64)

    vi_theta = eng.sample_theta(params, jax.random.key(5), 20_000)
    vi_mean, vi_sd = vi_theta.mean(0), vi_theta.std(0)
    delta_full = jnp.asarray(truth - vi_mean, jnp.float32)
    names = ("log_eps", "alpha", "beta", "log_s1", "log_s2")
    print("vi_mean:", np.round(vi_mean, 4), " truth:", np.round(truth, 4),
          " z:", np.round((vi_mean - truth) / vi_sd, 1), flush=True)

    # masks: full de-biasing shift, and the headline coordinate alone
    masks = {
        "all": jnp.ones(5, jnp.float32),
        "log_eps": jnp.asarray([1.0, 0, 0, 0, 0], jnp.float32),
    }

    p = eng.cfg.p

    def terms_alpha(params, key, shift):
        """One paired windowed-ELBO draw at translated theta (CRN: the key
        fixes windows, base noise and theta draws across alphas)."""
        k_starts, k_elbo = jax.random.split(key)
        starts = eng._sample_starts(k_starts)

        def flow_apply(z, feats, theta):
            return eng.flow.apply(params["flow"], z, feats, theta)

        def theta_sample(k):
            th, lq = eng.theta_flow.apply(
                params["theta"], k, p,
                method=type(eng.theta_flow).sample_and_log_prob)
            # constant shift: log q_alpha(th + shift) == log q(th)
            return th + shift[None, :], lq

        gather_fn = None
        if eng._stacked is not None:
            from viforssms_tpu.data.features import (
                WindowBatch,
                make_stacked_gather,
            )

            gather_fn = make_stacked_gather(WindowBatch(*eng._stacked),
                                            eng.cfg.batch_dims)
        t = compute_elbo(eng.model, flow_apply, theta_sample, k_elbo,
                         eng.tables, eng.spec, starts, eng.cfg.elbo_scale,
                         gather_fn=gather_fn)
        return jnp.mean(t.elbo)

    def chunk_mean(params, key, shift, n):
        def body(c, i):
            k = jax.random.fold_in(key, i)
            return c + terms_alpha(params, k, shift), None

        out, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(n))
        return out / n

    jfn = jax.jit(chunk_mean, static_argnums=3)

    alphas = [-0.25, 0.0, 0.25, 0.5, 0.75, 1.0]
    cert = {"alpha_grid": alphas, "draws": args.chunk * args.chunks,
            "vi_mean": vi_mean.tolist(), "vi_sd": vi_sd.tolist(),
            "truth": truth.tolist(), "names": list(names)}
    floor_ok = True
    for mname, m in masks.items():
        # paired per-chunk means, identical keys across alphas
        per_alpha = np.zeros((len(alphas), args.chunks))
        for c in range(args.chunks):
            key = jax.random.key(1000 + c)
            for ia, a in enumerate(alphas):
                per_alpha[ia, c] = float(
                    jfn(params, key, a * delta_full * m, args.chunk))
        d = per_alpha - per_alpha[alphas.index(0.0)]   # paired differences
        dm, dse = d.mean(1), d.std(1) / np.sqrt(args.chunks)
        curve = {f"{a:+.2f}": [float(x), float(s)]
                 for a, x, s in zip(alphas, dm, dse)}
        a_star = alphas[int(np.argmax(dm))]
        toward = [i for i, a in enumerate(alphas) if a > 0]
        # every toward-truth translation must COST bound, significantly
        sig = all(dm[i] < 0 and dm[i] + 2 * dse[i] < 0 for i in toward)
        cert[mname] = {"delta_elbo_vs_alpha0": curve, "alpha_star": a_star,
                       "toward_truth_all_significantly_negative": bool(sig)}
        floor_ok = floor_ok and a_star <= 0.0 and sig
        print(f"mask={mname}: alpha*={a_star} "
              + " ".join(f"{a:+.2f}:{x:.1f}±{s:.1f}"
                         for a, x, s in zip(alphas, dm, dse)), flush=True)

    cert["floor_certified"] = bool(floor_ok)
    cert["interpretation"] = (
        "The windowed reverse-KL objective at reference scale prefers the "
        "biased theta: de-biasing translations toward truth strictly lower "
        "the bound under common random numbers. The z~40 log_eps residual "
        "is the objective's optimum (the same floor the reference's TF1 "
        "script optimizes to), mirrored at the decimated T=2000 config "
        "where PF-evidence refit removes it (validation/fhn_smc_refit.json)."
        if floor_ok else
        "Translation toward truth does NOT cost bound — the residual is a "
        "fit defect, not an objective floor; more training or a refit at "
        "scale is warranted.")
    cert["wall_s"] = round(time.time() - t0, 1)

    with open(os.path.join(VAL_DIR, "fhn_ref.json")) as f:
        doc = json.load(f)
    doc["floor_certificate"] = cert
    with open(os.path.join(VAL_DIR, "fhn_ref.json"), "w") as f:
        json.dump(doc, f, indent=1)
    print(f"floor_certified={floor_ok} -> validation/fhn_ref.json "
          f"({cert['wall_s']}s)", flush=True)


if __name__ == "__main__":
    main()
