"""--production-ladder CLI verb (VERDICT r3 item 7): the windowed ->
exact-full-path protocol behind the validated production posteriors,
reproducible in one command, resume-aware per stage."""

import json
import os

import numpy as np
import pytest


@pytest.mark.slow
def test_fhn_production_ladder_cli(tmp_path):
    from viforssms_tpu.cli.experiments import main

    out = str(tmp_path / "ladder")
    argv = ["fitz-nag", "--production-ladder", "--synthetic", "--T", "20",
            "--steps", "60", "--pretrain-gate", "20",
            "--ladder-fullpath-steps", "20", "--ladder-iw-k", "5",
            "--ladder-objective", "dreg", "--out", out]
    main(argv)
    with open(os.path.join(out, "ladder.json")) as f:
        s = json.load(f)
    assert s["kind"] == "fhn"
    assert "objective=dreg k=5" in s["protocol"]
    assert np.isfinite(s["elbo_fullpath"][0])
    assert os.path.exists(os.path.join(out, "theta_samples.txt"))
    assert os.path.exists(os.path.join(out, "posterior_paths.txt"))
    # stage checkpoints exist -> a rerun resumes instead of retraining
    assert os.path.isdir(os.path.join(out, "windowed", "ckpt"))
    assert os.path.isdir(os.path.join(out, "fullpath", "ckpt"))
    # resume path: a second invocation must be a no-op for both stages
    main(argv)
    with open(os.path.join(out, "windowed", "fit_meta.json")) as f:
        assert json.load(f)["fit_steps"] == 60
    with open(os.path.join(out, "fullpath", "fit_meta.json")) as f:
        assert json.load(f)["fit_steps"] == 20


@pytest.mark.slow
def test_ladder_smc_refit_isolated_and_idempotent(tmp_path):
    """The stage-3 refit must live in its own stage dir: the stage-2
    checkpoint keeps the un-refit thetas, and a re-invocation restores the
    saved refit instead of re-applying it on top of itself (ADVICE r4,
    medium)."""
    import jax

    from viforssms_tpu.cli.experiments import run_production_ladder

    out = str(tmp_path / "ladder")
    kw = dict(kind="fhn", out_dir=out, windowed_steps=40, fullpath_steps=15,
              iw_k=1, objective="elbo", pretrain=20, synthetic=True, T=20.0,
              export_rows=64, smc_refit=True, refit_rounds=1,
              refit_particles=64, refit_proposal_batch=16, refit_draws=32)
    state1 = run_production_ladder(**kw)
    with open(os.path.join(out, "ladder.json")) as f:
        s1 = json.load(f)
    assert "PF-evidence theta refit" in s1["protocol"]
    assert os.path.isdir(os.path.join(out, "refit", "ckpt"))
    # the ladder posterior ships a loadable serving bundle (round 5)
    from viforssms_tpu.serving import load_artifacts

    arts = load_artifacts(os.path.join(out, "serving"))
    assert arts.meta["full_path"] is True
    th_served = arts.sample_theta(5)
    assert th_served.shape == (8192, 5) and np.isfinite(th_served).all()
    with open(os.path.join(out, "refit", "refit_meta.json")) as f:
        rmeta = json.load(f)
    assert rmeta["refit_cfg"]["stage2_fit_steps"] == 15
    # the stage-2 checkpoint must NOT carry the refit thetas
    from viforssms_tpu.utils.checkpoint import Checkpointer

    from viforssms_tpu.cli.experiments import build_fitz_nag  # noqa: F401
    fckpt = Checkpointer(os.path.join(out, "fullpath", "ckpt"))
    s2 = fckpt.restore(state1)
    t_refit = jax.tree.leaves(state1.params["theta"])[0]
    t_stage2 = jax.tree.leaves(s2.params["theta"])[0]
    assert not np.allclose(np.asarray(t_refit), np.asarray(t_stage2))
    # second invocation: restores the refit (identical thetas, no re-apply)
    state2 = run_production_ladder(**kw)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(state2.params["theta"])[0]),
        np.asarray(t_refit))
