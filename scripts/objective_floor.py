"""Objective-floor certificate for the SV / FHN posterior-parity residuals.

Question (VERDICT r2 items 1/2/5): is the remaining VI bias at the SV and
FHN validation configs an *optimization/capacity failure* (more training or
a wider flow would remove it) or the *reverse-KL objective's own optimum*
(the same floor the reference's TF1 scripts sit on, since they optimize the
same ELBO over the same conv-IAF family — ``AR.py:184-187``)?

Certificate: inside the family N(mu, Sigma_gold) with Sigma_gold the
gold-NUTS posterior covariance (shrunk toward its diagonal), sweep the mean
along the segment  mu(alpha) = mu_gold + alpha * (mu_VI - mu_gold)  and
evaluate the exact ELBO

    ELBO(alpha) = E_{z~N(mu(alpha), Sigma)}[log p(theta, x, y)] + H[N]

with common random numbers across alpha (the entropy term is
alpha-independent).  If argmax_alpha lands near alpha=1 (the VI mean) and
ELBO(alpha=0) < ELBO(alpha=1), the ELBO itself prefers the biased mean even
at the gold posterior's *shape* — the residual bias is the objective's
floor, not a fit defect.  If instead alpha*=0 wins, the VI fit is
sub-optimal and more training/capacity is the right call.

This is evaluated with the same model log-joint the NUTS gold sampled
(``scripts/validate_baseline.py::validate_sv``/``validate_fhn``), with a
per-particle normalization parity check against the production engine's own
ELBO terms, so all three numbers (VI ELBO, ELBO(alpha) curve, gold) live on
one scale.

Writes validation/floor_<config>.json.

Run:  python scripts/objective_floor.py --config sv   [--draws 2048]
      python scripts/objective_floor.py --config fhn
(CPU is fine: JAX_PLATFORMS=cpu python scripts/objective_floor.py ...)
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

VAL_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "validation")


def _gold_draws(cfg):
    cands = sorted(glob.glob(os.path.join(VAL_DIR, cfg, "gold_joint_nuts*.npz")),
                   key=os.path.getmtime)  # newest gold (review r4)
    assert cands, f"run validate_baseline.py {cfg} first"
    with np.load(cands[-1]) as z:
        g = z["gold"]                                  # (n, C, D)
    return g.reshape(-1, g.shape[-1]).astype(np.float64), os.path.basename(cands[-1])


def _production_engine(cfg, tag=None):
    """Best available full-path production checkpoint (falls back windowed)."""
    import jax

    from viforssms_tpu.inference.vi.sequence_train import SequenceVIEngine
    from viforssms_tpu.utils.checkpoint import Checkpointer

    # checkpoint search order == validate_baseline's judged-artifact order
    # (ADVICE r3, high: the certificate must be issued for the posterior
    # validate will judge)
    from validate_baseline import FHN_PRODUCTION_TAGS, SV_PRODUCTION_TAGS

    if cfg == "sv":
        from validate_baseline import _dat_dir

        from viforssms_tpu.cli.experiments import build_sv_dense
        weng, info = build_sv_dense(
            sv_file=os.path.join(_dat_dir(), "SV.dat"))
        tags = SV_PRODUCTION_TAGS
    else:
        from viforssms_tpu.cli.experiments import build_fitz_nag
        weng, info = build_fitz_nag(synthetic=True, T=200.0)
        tags = FHN_PRODUCTION_TAGS
    if tag is not None:
        tags = (tag,)
    eng = SequenceVIEngine.from_windowed(weng)
    state = eng.init(jax.random.key(7))
    src = None
    for tag in tags:
        ck = os.path.join(VAL_DIR, tag, "ckpt")
        if os.path.isdir(ck):
            r = Checkpointer(ck).restore(state)
            if r is not None and int(r.step) > 0:
                state, src = r, f"validation/{tag}/ckpt"
                break
    if src is None:
        r = Checkpointer(os.path.join(VAL_DIR, cfg, "ckpt")).restore(
            weng.init(jax.random.key(8)))
        assert r is not None, f"no checkpoint for {cfg}"
        state = state._replace(params=r.params)
        src = f"validation/{cfg}/ckpt (windowed params)"
    return eng, state, info, src


def _log_joint_fn(cfg, eng, info):
    import jax.numpy as jnp

    model = eng.model
    if cfg == "sv":
        obs = jnp.asarray(info["obs"])
        x0_lat = info["x0"]

        def log_joint(q):
            theta = q[:4][None, :]
            lat = jnp.concatenate([jnp.asarray([x0_lat], q.dtype), q[4:]])
            x = jnp.stack([obs, lat])[None]
            return (model.transition_log_prob(x, theta)
                    + model.log_prior(theta))[0]

        return log_joint, 4
    from viforssms_tpu.inference.validate import ssm2d_log_joint
    return (ssm2d_log_joint(model, info["obs"], info["obs_bin"], info["x0"]),
            model.theta_dim)


def _parity_check(cfg, eng, state, log_joint, theta_dim, seed=61):
    """Engine joint terms vs the validate log-joint on the SAME draws.

    Certifies both sides share one normalization so the ELBO(alpha) curve,
    the engine ELBO and the gold all compare on a single scale."""
    import jax

    def draw(params, k1, k2):
        theta, theta_lq, prior = eng._theta(params, k1)
        t = eng._terms(params, k2, theta)
        return theta, t.x, t.sde_lp + t.obs_lp + prior, t.elbo + prior - theta_lq

    theta, x, eng_logp, lw = jax.jit(draw)(state.params,
                                           jax.random.key(seed),
                                           jax.random.key(seed + 1000))
    theta = np.asarray(theta)
    x = np.asarray(x)
    if cfg == "sv":
        flat = x[:, 1, :]
    else:
        flat = x.reshape(x.shape[0], -1)
    q = np.concatenate([theta, flat], axis=1).astype(np.float32)
    mine = np.asarray(jax.jit(jax.vmap(log_joint))(q))
    diff = mine - np.asarray(eng_logp)
    return {
        "max_abs_diff": float(np.nanmax(np.abs(diff))),
        "mean_engine_logp": float(np.nanmean(np.asarray(eng_logp))),
        "mean_validate_logp": float(np.nanmean(mine)),
        "elbo_vi_onebatch": float(np.nanmean(np.asarray(lw))),
    }, q, np.asarray(lw, np.float64), mine.astype(np.float64)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", choices=("sv", "fhn"), required=True)
    ap.add_argument("--draws", type=int, default=2048)
    ap.add_argument("--shrink", type=float, default=0.05,
                    help="covariance shrinkage toward the diagonal")
    ap.add_argument("--batch", type=int, default=256,
                    help="device batch for log-joint evaluation")
    ap.add_argument("--tag", default=None,
                    help="force a specific validation/<tag>/ckpt as the "
                         "production checkpoint")
    ap.add_argument("--vi-batches", type=int, default=8,
                    help="production-posterior draw batches (p draws each); "
                         "raise for tighter paired-penalty SEs on small-p "
                         "configs")
    args = ap.parse_args()

    from viforssms_tpu.core.platform import apply_platform_env

    apply_platform_env()
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    gold, gold_file = _gold_draws(args.config)
    eng, state, info, ckpt_src = _production_engine(args.config, tag=args.tag)
    log_joint, theta_dim = _log_joint_fn(args.config, eng, info)
    parity, q_vi, lw0, logp0 = _parity_check(args.config, eng, state,
                                             log_joint, theta_dim)
    print(f"normalization parity: max|engine - validate| = "
          f"{parity['max_abs_diff']:.3e}", flush=True)

    D = gold.shape[1]
    assert q_vi.shape[1] == D, (q_vi.shape, D)
    mu_g = gold.mean(0)
    S = np.cov(gold, rowvar=False)
    lam = args.shrink
    S = (1.0 - lam) * S + lam * np.diag(np.diag(S))
    S[np.diag_indices_from(S)] += 1e-8 * float(np.trace(S)) / D
    L = np.linalg.cholesky(S)
    entropy = 0.5 * D * np.log(2.0 * np.pi * np.e) + np.sum(
        np.log(np.diag(L)))

    # VI mean from the production posterior (fresh draws, a few batches)
    mus, lws, logps = [q_vi], [lw0], [logp0]
    for b in range(args.vi_batches - 1):
        _, q, lw, lp = _parity_check(args.config, eng, state, log_joint,
                                     theta_dim, seed=71 + 2 * b)
        mus.append(q)
        lws.append(lw)
        logps.append(lp)
    q_vi_all = np.concatenate(mus, axis=0)
    lw_all = np.concatenate(lws)
    logq_all = np.concatenate(logps) - lw_all    # log q(z_i), parity-exact
    mu_v = q_vi_all.mean(0).astype(np.float64)

    # ELBO(q_VI): exact full-path bound on the production checkpoint
    elbo_vi, elbo_vi_se = eng.estimate_elbo(state.params, jax.random.key(45),
                                            10)
    print(f"ELBO(q_VI) = {elbo_vi:.4f} ± {elbo_vi_se:.4f}", flush=True)

    # common random numbers across the alpha sweep
    rng = np.random.RandomState(17)
    eps = rng.normal(size=(args.draws, D))
    base = eps @ L.T                                    # (n, D)

    lj = jax.jit(jax.vmap(log_joint))

    def _eval(zs):
        vals = []
        for i in range(0, zs.shape[0], args.batch):
            vals.append(np.asarray(lj(jnp.asarray(zs[i:i + args.batch]))))
        v = np.concatenate(vals).astype(np.float64)
        finite = np.isfinite(v)
        return (float(v[finite].mean()),
                float(v[finite].std() / np.sqrt(max(finite.sum(), 1))),
                int(finite.sum()))

    # --- probe 1: mean line-search at the GOLD covariance shape ----------
    alphas = [-0.25, 0.0, 0.2, 0.4, 0.6, 0.8, 0.9, 1.0, 1.1, 1.25]
    curve, curve_se = [], []
    for a in alphas:
        mu = mu_g + a * (mu_v - mu_g)
        m, se, nf = _eval((base + mu[None, :]).astype(np.float32))
        curve.append(m + entropy)
        curve_se.append(se)
        print(f"gauss alpha={a:+.2f}: ELBO = {m + entropy:.4f} ± {se:.4f} "
              f"(finite {nf}/{args.draws})", flush=True)
    best = int(np.argmax(curve))

    # --- probe 2: TRANSLATION-optimality of the production flow ----------
    # Shifting a flow's output by a constant leaves its entropy unchanged
    # (z' = z + d  =>  log q_d(z') = log q(z)), and a per-coordinate shift
    # is inside the family's reach (the final conv / MADE mu-biases), so
    #   ELBO(q shifted by a*Delta) - ELBO(q) = E_q[log p(z + a*Delta)]
    #                                          - E_q[log p(z)].
    # Delta = mu_gold - mu_VI.  If the curve peaks at a=0, the production
    # posterior is translation-optimal: no family member reachable by pure
    # de-biasing beats it, so the residual bias IS the objective's optimum
    # given the family shape (the certificate the Gaussian probe cannot
    # give, since it confounds mean and shape).
    delta = mu_g - mu_v
    t_alphas = [-0.25, -0.1, 0.0, 0.1, 0.25, 0.5, 0.75, 1.0]
    masks = {
        "joint": np.ones(D),
        "theta_only": np.concatenate([np.ones(theta_dim),
                                      np.zeros(D - theta_dim)]),
        "path_only": np.concatenate([np.zeros(theta_dim),
                                     np.ones(D - theta_dim)]),
    }
    translation = {"alpha_grid": t_alphas}

    def _eval_vec(zs):
        vals = []
        for i in range(0, zs.shape[0], args.batch):
            vals.append(np.asarray(lj(jnp.asarray(zs[i:i + args.batch]))))
        return np.concatenate(vals).astype(np.float64)

    m_iw = re.search(r"_iw(\d+)", ckpt_src)
    iw_k = int(m_iw.group(1)) if m_iw else 1
    from scipy.special import logsumexp as _lse

    def _bound_vec(v):
        """Per-draw (plain) or per-group (IWAE-k) bound contributions of the
        shifted flow: log q is unchanged at the shifted samples
        (entropy-invariant translation), so lw_i(a) = log p(z_i + a*d)
        - log q(z_i); IWAE grouping matches training's reshape(-1, k)."""
        if iw_k <= 1:
            return v
        lw_a = np.where(np.isfinite(v), v, -np.inf) - logq_all
        return _lse(lw_a.reshape(-1, iw_k), axis=1) - np.log(iw_k)

    bnds = {}          # mask -> list over alpha of per-draw/group bounds
    for mname, mask in masks.items():
        d = (delta * mask)[None, :]
        cs, ses, iws, iw_ses = [], [], [], []
        bnds[mname] = []
        for a in t_alphas:
            v = _eval_vec((q_vi_all + a * d).astype(np.float32))
            bnds[mname].append(_bound_vec(v))
            finite = np.isfinite(v)
            cs.append(float(v[finite].mean()))
            ses.append(float(v[finite].std()
                             / np.sqrt(max(finite.sum(), 1))))
            if iw_k > 1:
                # a group whose members are ALL non-finite logsumexps to
                # -inf; filter (as the plain-ELBO path and the paired
                # penalty do) and record the drop so json stays standard
                # (ADVICE r3, low)
                bnd = bnds[mname][-1]
                bfin = bnd[np.isfinite(bnd)]
                iws.append(float(bfin.mean()) if bfin.size else
                           float(np.finfo(np.float64).min))
                iw_ses.append(float(bfin.std() / np.sqrt(bfin.size))
                              if bfin.size else 0.0)
                translation.setdefault(
                    mname + "_iwae_dropped_groups", []).append(
                        int(bnd.size - bfin.size))
        translation[mname] = cs
        translation[mname + "_se"] = ses
        b = int(np.argmax(cs))
        translation[mname + "_alpha_star"] = t_alphas[b]
        msg = (f"translate[{mname}]: " + " ".join(
            f"{a:+.2f}:{c:.2f}" for a, c in zip(t_alphas, cs))
            + f"  -> alpha*={t_alphas[b]}")
        if iw_k > 1:
            translation[mname + "_iwae"] = iws
            translation[mname + "_iwae_se"] = iw_ses
            bi = int(np.argmax(iws))
            translation[mname + "_iwae_alpha_star"] = t_alphas[bi]
            msg += (f" | IWAE{iw_k}: " + " ".join(
                f"{a:+.2f}:{c:.2f}" for a, c in zip(t_alphas, iws))
                + f" -> alpha*={t_alphas[bi]}")
        print(msg, flush=True)
    translation["iw_k"] = iw_k

    i0 = t_alphas.index(0.0)
    i1 = t_alphas.index(1.0)
    # the production fit's own objective decides: the IWAE-k bound when the
    # checkpoint was IWAE-trained, else the plain ELBO
    sfx = "_iwae" if iw_k > 1 else ""
    translation["decision_curve"] = "theta_only & paired penalty" + sfx
    th = np.asarray(translation["theta_only" + sfx])
    th_se = np.asarray(translation["theta_only" + sfx + "_se"])
    po = np.asarray(translation["path_only" + sfx])
    toward = [i for i, a in enumerate(t_alphas) if a > 0]
    # The validation criterion judges THETA marginals, so the certificate
    # targets them twice over:
    #   (a) a theta-only de-biasing translation never raises the
    #       production objective (peak at alpha <= 0.1, no toward-gold
    #       step wins by 2 SE) — theta is at the objective's optimum GIVEN
    #       the current paths;
    #   (b) even GRANTING the paths their translation gain (which may lie
    #       partly outside the conv family's reach — an arbitrary per-step
    #       offset is not a constant mu-bias), adding the theta shift on
    #       top still hurts: the PAIRED per-draw penalty
    #       bound(path_only) - bound(joint) is positive and significant at
    #       alpha=1 (common random draws make this difference tight);
    #   (c) the flow's bound beats the gold-moment Gaussian outright.
    theta_peak = t_alphas[int(np.argmax(th))]
    theta_optimal = (theta_peak <= 0.1 and not any(
        th[i] - th[i0] > 2.0 * (th_se[i] + th_se[i0]) for i in toward))
    pen, pen_se = [], []
    for i in range(len(t_alphas)):
        dvec = bnds["path_only"][i] - bnds["joint"][i]
        dvec = dvec[np.isfinite(dvec)]
        pen.append(float(dvec.mean()))
        pen_se.append(float(dvec.std() / np.sqrt(max(len(dvec), 1))))
    translation["theta_penalty_given_path"] = pen
    translation["theta_penalty_given_path_se"] = pen_se
    theta_penalized = pen[i1] > 2.0 * pen_se[i1]
    translation["theta_only_peak"] = theta_peak
    translation["path_translation_slack_nats"] = float(
        np.max(po) - po[i0])
    translation_optimal = bool(theta_optimal and theta_penalized)
    floor_certified = bool(translation_optimal
                           and elbo_vi >= curve[alphas.index(0.0)])
    out = {
        "config": args.config,
        "question": "is the residual VI bias the reverse-KL objective's "
                    "optimum (floor) or a fit defect?",
        "gold_file": gold_file,
        "production_ckpt": ckpt_src,
        "gauss_probe": {
            "family": f"N(mu(alpha), Sigma_gold shrunk lam={lam}) over the "
                      f"{D}-dim joint [theta({theta_dim}), path]",
            "alpha_grid": alphas,
            "elbo_alpha": curve,
            "elbo_alpha_se": curve_se,
            "alpha_star": alphas[best],
            "entropy_gauss": float(entropy),
            "reading": "alpha=0 gold mean, alpha=1 VI mean, SAME gold "
                       "covariance; confounds mean and shape — kept as the "
                       "shape-advantage measurement only",
        },
        "translation_probe": translation,
        "translation_optimal": bool(translation_optimal),
        "elbo_gauss_gold_mean": curve[alphas.index(0.0)],
        "elbo_gauss_vi_mean": curve[alphas.index(1.0)],
        "elbo_vi": [float(elbo_vi), float(elbo_vi_se)],
        "n_vi_draws": int(q_vi_all.shape[0]),
        "normalization_parity": parity,
        "n_gold_draws": int(gold.shape[0]),
        "floor_certified": bool(floor_certified),
        "reading": ("translation_probe: E_q[log p(z + a*(mu_gold - mu_VI))] "
                    "on production-flow draws (the IWAE-k bound of the "
                    "shifted flow when the checkpoint is IWAE-trained); the "
                    "shift leaves H[q] unchanged and is inside the family's "
                    "reach. Certified when a theta-only de-biasing "
                    "translation never raises the objective AND the fully "
                    "de-biased joint is significantly worse AND the flow "
                    "bound beats the gold-moment Gaussian — i.e. the JUDGED "
                    "theta bias is the objective's optimum given the family "
                    "shape; path-only slack is reported separately"),
        "wall_s": round(time.time() - t0, 1),
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    path = os.path.join(VAL_DIR, f"floor_{args.config}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"saved {path}; theta-only peak alpha = "
          f"{translation['theta_only_peak']}, path slack "
          f"{translation['path_translation_slack_nats']:.2f} nats "
          f"({'FLOOR CERTIFIED' if floor_certified else 'NOT certified — '
             'a de-biasing translation would raise the objective'})",
          flush=True)


if __name__ == "__main__":
    main()
