"""Directly optimize the path mean offset on the exact posterior density.

The translation probe (scripts/lv_path_floor.py) established that
``ELBO(q shifted by delta) - ELBO(q) = E_q[log p(u + delta | y) -
log p(u | y)]`` (entropy-invariant mean shift), and that the SGD-trained
offset leaves ~0.7 nats of this unclaimed (wide flat basin + per-step
noise). So claim it directly: draw a large FIXED set of u ~ q from the
trained artifact (common random numbers) and maximize

    F(delta) = (1/N) sum_i log p(u_i + delta | y)

over the (2T,) translation with Adam — a deterministic optimization once
the draws are fixed, so no equilibrium noise. The optimum over this
subspace is exactly the ELBO-optimal mean translation of the current q;
the gold is never touched. delta folds into params["offset"] (same family
as lv_fullpath_off2 already ships) and the artifact re-judges.

Run (chip):  python scripts/offset_direct.py [--draws 8000] [--steps 400]
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
    ap.add_argument("--draws", type=int, default=8000)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--lr", type=float, default=0.02)
    ap.add_argument("--scale", type=float, default=30.0,
                    help="offset_update_scale the checkpoint was saved with")
    args = ap.parse_args()

    from viforssms_tpu.core.platform import apply_platform_env

    apply_platform_env()
    import jax
    import jax.numpy as jnp
    import optax

    from viforssms_tpu.cli.experiments import build_lv_partial
    from viforssms_tpu.distributions.bijectors import Softplus
    from viforssms_tpu.inference.validate import ssm2d_path_log_posterior
    from viforssms_tpu.inference.vi.sequence_train import SequenceVIEngine
    from viforssms_tpu.utils.checkpoint import Checkpointer

    t0 = time.time()
    weng, info = build_lv_partial(dat_dir=_dat_dir())
    eng = SequenceVIEngine.from_windowed(weng, learn_mean_offset=True,
                                         offset_update_scale=args.scale)
    ck = Checkpointer(os.path.join(VAL_DIR, "lv_fullpath_off2", "ckpt"))
    state = ck.restore(eng.init(jax.random.key(1)))
    assert state is not None

    cands = sorted(glob.glob(os.path.join(VAL_DIR, "lv_partial",
                                          "gold_path_nuts*.npz")),
                   key=os.path.getmtime)
    with np.load(cands[-1]) as z:
        gold_u = z["u"]
    gold_file = os.path.basename(cands[-1])
    sp = Softplus()
    gold_paths = np.asarray(sp.forward(jnp.asarray(gold_u)))

    def judge(params):
        vi = _vi_paths_batched(eng, params, jax.random.key(22), 8)
        return _path_block(vi.reshape(vi.shape[0], -1), gold_paths)

    base_block = judge(state.params)
    print(f"before: median {base_block['bias_sd_median']:.3f}, "
          f"max {base_block['bias_sd_max']:.2f}", flush=True)

    # fixed u-draws from the CURRENT artifact (fresh keys, disjoint from
    # the judging key stream)
    n_b = max(1, args.draws // eng.cfg.p)
    x = _vi_paths_batched(eng, state.params, jax.random.key(97), n_b)
    u = jnp.asarray(sp.inverse(jnp.asarray(
        x.reshape(x.shape[0], -1, order="C").astype(np.float64))),
        jnp.float32)                                      # (N, 2T)
    theta_pin = np.asarray(info["theta_prior_mean"], np.float32)
    logp = ssm2d_path_log_posterior(weng.model, info["obs"], info["obs_bin"],
                                    info["x0"], theta_pin, path_transform=sp)

    def objective(delta):
        return -jnp.mean(jax.vmap(lambda ui: logp(ui + delta))(u))

    opt = optax.adam(args.lr)
    delta = jnp.zeros(u.shape[1])
    ostate = opt.init(delta)

    @jax.jit
    def step(delta, ostate):
        loss, g = jax.value_and_grad(objective)(delta)
        up, ostate = opt.update(g, ostate)
        return optax.apply_updates(delta, up), ostate, loss

    f0 = float(objective(delta))
    for i in range(args.steps):
        delta, ostate, loss = step(delta, ostate)
    f1 = float(loss)
    gain = f0 - f1
    print(f"claimed {gain:.3f} nats over {args.steps} Adam steps "
          f"(|delta| max {float(jnp.abs(delta).max()):.3f})", flush=True)

    params_new = dict(state.params)
    params_new["offset"] = state.params["offset"] + delta.reshape(
        2, -1)
    new_block = judge(params_new)
    print(f"after:  median {new_block['bias_sd_median']:.3f}, "
          f"max {new_block['bias_sd_max']:.2f}", flush=True)

    if new_block["bias_sd_median"] < base_block["bias_sd_median"]:
        state = state._replace(params=params_new)
        ck.save(state)
        path = os.path.join(VAL_DIR, "lv_fullpath_off2.json")
        with open(path) as f:
            doc = json.load(f)
        doc["paths"] = new_block
        doc["gold_file"] = gold_file
        doc["direct_offset"] = {"draws": int(u.shape[0]),
                                "adam_steps": args.steps,
                                "nats_claimed": gain,
                                "median_before": base_block["bias_sd_median"]}
        doc["timestamp"] = time.strftime("%Y-%m-%d %H:%M:%S")
        with open(path, "w") as f:
            json.dump(doc, f, indent=1)
        print(f"promoted -> {path}", flush=True)
    else:
        print("no judged improvement; artifact unchanged", flush=True)
    print(f"wall {time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
