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
