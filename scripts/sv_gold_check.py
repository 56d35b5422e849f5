"""SV gold-robustness check: NON-CENTERED joint NUTS vs the centered gold.

The validation gold (``validate_baseline.py sv``) samples the CENTERED
joint [theta, x_{1:T}] — for stochastic volatility this is the classic
funnel geometry: at small vol-of-vol (t3) the latent path's conditional
scale collapses, and a sampler that cannot enter the neck biases the t3
marginal UPWARD — exactly the direction in which the VI posterior "fails"
validation (VI t3 sits ~1.1-1.8 gold SDs BELOW gold across rounds 2-3).

This script samples the NON-CENTERED parameterization [theta, eps_{1:T}]
with x2 reconstructed in-graph:

    x2_{t+1} = x2_t + dt (t1 - e^{t2} x2_t) + sqrt(dt) e^{t3} eps_t,
    eps ~ N(0, 1)  (the latent transition density + Jacobian cancel exactly),

which removes the funnel from the conditioning. Agreement of the two theta
marginals certifies the gold; a t3 shift toward the VI means the centered
gold was funnel-biased and the bias story must be re-read.

Writes validation/sv_gold_check.json.

Run on the TPU:  python scripts/sv_gold_check.py
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

from validate_baseline import VAL_DIR, _chain_diag, _dat_dir  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-s", type=int, default=4_000)
    ap.add_argument("--n-w", type=int, default=2_000)
    ap.add_argument("--chains", type=int, default=8)
    args = ap.parse_args()

    from viforssms_tpu.core.platform import apply_platform_env

    apply_platform_env()
    import jax
    import jax.numpy as jnp

    from viforssms_tpu.cli.experiments import build_sv_dense
    from viforssms_tpu.inference.mcmc.nuts import nuts_sample

    eng, info = build_sv_dense(sv_file=os.path.join(_dat_dir(), "SV.dat"))
    model = eng.model
    obs = jnp.asarray(info["obs"])          # (T+1,) observed dim
    T = info["target"]
    x0_lat = float(info["x0"])
    dt = model.dt
    sdt = float(np.sqrt(dt))

    def log_joint_nc(q):
        theta = q[:4]
        eps = q[4:]
        t0, t1, t2, t3 = theta

        # x2_{t+1} = a x2_t + b_t with a = 1 - dt e^{t2} CONSTANT in t:
        # an affine recurrence -> log-depth associative_scan instead of a
        # sequential lax.scan (a scan'd leapfrog gradient is ~T x slower)
        a = 1.0 - dt * jnp.exp(t2)
        b = dt * t1 + sdt * jnp.exp(t3) * eps          # (T,)
        a_arr = jnp.full_like(b, a)

        def compose(c1, c2):                            # c1 first, then c2
            a1, b1 = c1
            a2, b2 = c2
            return a1 * a2, a2 * b1 + b2

        A, B = jax.lax.associative_scan(compose, (a_arr, b))
        states = A * x0_lat + B                         # x2_{t+1}, t=0..T-1
        # emit the state CONDITIONING each observed transition: x2_t for
        # t=0..T-1 (x0 first, last state unused)
        x2_path = jnp.concatenate(
            [jnp.asarray([x0_lat], q.dtype), states[:-1]])
        # observed-dim transition density (the model's only likelihood term):
        # d1 ~ N(dt * t0 * x1, sqrt(dt) * x1 * exp(x2/2))
        x1 = obs[:-1]
        d1 = obs[1:] - x1
        s1 = sdt * x1 * jnp.exp(0.5 * x2_path)
        lp_obs = jnp.sum(-0.5 * ((d1 - dt * t0 * x1) / s1) ** 2
                         - jnp.log(s1) - 0.5 * jnp.log(2 * jnp.pi))
        lp_eps = jnp.sum(-0.5 * eps ** 2 - 0.5 * jnp.log(2 * jnp.pi))
        prior = model.log_prior(theta[None, :])[0]
        return lp_obs + lp_eps + prior

    anchor = np.asarray(model.pretrain_theta_anchor, np.float32)
    C = args.chains
    rng = np.random.RandomState(3)
    init = np.concatenate([
        np.tile(anchor, (C, 1)) + 0.05 * rng.normal(size=(C, 4)),
        0.1 * rng.normal(size=(C, T)),
    ], axis=1).astype(np.float32)

    t0c = time.time()
    samples, diag = nuts_sample(log_joint_nc, jnp.asarray(init),
                                jax.random.key(77), num_samples=args.n_s,
                                num_warmup=args.n_w, step_size=0.01,
                                max_depth=9, adapt_mass=True,
                                dispatch_chunk=100)
    wall = time.time() - t0c
    th_nc = np.asarray(samples)[:, :, :4]   # (n, C, 4)
    print(f"non-centered NUTS: {C}x{args.n_s} in {wall:.0f}s, "
          f"accept={float(np.mean(np.asarray(diag['accept']))):.2f}, "
          f"divergences={np.asarray(diag['divergences']).tolist()}",
          flush=True)

    # centered gold (newest keyed cache)
    cands = sorted(glob.glob(os.path.join(VAL_DIR, "sv",
                                          "gold_joint_nuts*.npz")))
    with np.load(cands[-1]) as z:
        th_c = z["gold"][:, :, :4]

    from viforssms_tpu.inference.validate import compare_moments

    names = ("t0_drift", "t1_mean", "t2_rate", "t3_vol")
    cmp = compare_moments(th_nc.reshape(-1, 4), th_c)
    c_flat = th_c.reshape(-1, 4).astype(np.float64)
    nc_flat = th_nc.reshape(-1, 4).astype(np.float64)
    shift_sd = (np.abs(nc_flat.mean(0) - c_flat.mean(0))
                / (c_flat.std(0) + 1e-12))
    out = {
        "config": "sv_gold_check",
        "parameterizations": "non-centered [theta, eps] vs centered [theta, x]",
        "centered_gold_file": os.path.basename(cands[-1]),
        "names": list(names),
        "centered_mean": c_flat.mean(0).tolist(),
        "centered_sd": c_flat.std(0).tolist(),
        "noncentered_mean": nc_flat.mean(0).tolist(),
        "noncentered_sd": nc_flat.std(0).tolist(),
        "shift_in_centered_sd": shift_sd.tolist(),
        "z_mc": cmp.z.tolist(),
        "nc_diag": {
            **_chain_diag(th_nc),
            "divergences": np.asarray(diag["divergences"]).astype(int).tolist(),
            "depth_frac_max": np.round(np.asarray(
                diag["depth_frac_max"], np.float64), 4).tolist(),
            "accept": float(np.mean(np.asarray(diag["accept"]))),
            "step_size": float(np.asarray(diag["step_size"])),
        },
        "wall_s": round(wall, 1),
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    with open(os.path.join(VAL_DIR, "sv_gold_check.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("saved validation/sv_gold_check.json", flush=True)
    for i, n in enumerate(names):
        print(f"{n}: centered {c_flat.mean(0)[i]:.4f}±{c_flat.std(0)[i]:.4f} "
              f"nc {nc_flat.mean(0)[i]:.4f}±{nc_flat.std(0)[i]:.4f} "
              f"shift/sd {shift_sd[i]:.2f}", flush=True)


if __name__ == "__main__":
    main()
