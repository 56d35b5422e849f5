"""Validation-harness plumbing regressions (ADVICE r2/r3 closures).

These pin the non-chip logic of ``scripts/validate_baseline.py``:
  * checkpoint-extension deficits count FIT steps only (the fit_meta.json
    sidecar), never pretrain steps (ADVICE r2);
  * an objective-floor certificate is honored only for the judged
    production checkpoint under the current gold draws (ADVICE r3, high +
    medium);
  * the judged-artifact tag order matches scripts/objective_floor.py's
    checkpoint search order by construction (shared constants);
  * PMMHResult fields are uniformly host NumPy (ADVICE r2, low).
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

from validate_baseline import (  # noqa: E402
    FHN_PRODUCTION_TAGS,
    SV_PRODUCTION_TAGS,
    _fit_deficit,
    _floor_passes,
)


def test_fit_deficit_excludes_pretrain(tmp_path):
    cfg_dir = str(tmp_path)
    # restored TrainState.step = pretrain (1000) + fit (2000) = 3000, but
    # the sidecar records the fit-only count: a 20k schedule owes 18k more,
    # NOT 17k
    with open(os.path.join(cfg_dir, "fit_meta.json"), "w") as f:
        json.dump({"fit_steps": 2000}, f)
    deficit, fit_done = _fit_deficit(cfg_dir, restored_step=3000,
                                     num_steps=20_000)
    assert (deficit, fit_done) == (18_000, 2000)
    # finished schedule: no retrain
    deficit, _ = _fit_deficit(cfg_dir, restored_step=3000, num_steps=2000)
    assert deficit == 0


def test_fit_deficit_legacy_checkpoint(tmp_path):
    # pre-sidecar checkpoint: fall back to the TOTAL step (over-counts fit,
    # i.e. never re-trains a finished schedule)
    deficit, fit_done = _fit_deficit(str(tmp_path), restored_step=3000,
                                     num_steps=20_000)
    assert (deficit, fit_done) == (17_000, 3000)


def _cert(**kw):
    base = {
        "floor_certified": True,
        "production_ckpt": "validation/sv_fullpath_iw25/ckpt",
        "gold_file": "gold_joint_nuts_abc.npz",
        "elbo_vi": [650.0, 0.1],
        "elbo_gauss_gold_mean": 600.0,
    }
    base.update(kw)
    return base


def test_floor_cert_tag_and_gold_gating():
    c = _cert()
    assert _floor_passes(c, "sv_fullpath_iw25", "gold_joint_nuts_abc.npz")
    # wrong judged tag -> not honored (ADVICE r3 high)
    assert not _floor_passes(c, "sv_wide_iw25", "gold_joint_nuts_abc.npz")
    # stale gold -> not honored (ADVICE r3 medium)
    assert not _floor_passes(c, "sv_fullpath_iw25", "gold_joint_nuts_new.npz")
    # uncertified or bound below the gold-moment Gaussian -> False
    assert not _floor_passes(_cert(floor_certified=False),
                             "sv_fullpath_iw25", "gold_joint_nuts_abc.npz")
    assert not _floor_passes(_cert(elbo_vi=[500.0, 0.1]),
                             "sv_fullpath_iw25", "gold_joint_nuts_abc.npz")
    assert not _floor_passes(None, "sv_fullpath_iw25", "x")
    # no judged production artifact (windowed posterior being judged): a
    # cert issued for a production checkpoint cannot apply (review r4)
    assert not _floor_passes(c, None, "gold_joint_nuts_abc.npz")


def test_production_tag_lists_shared_with_objective_floor():
    import objective_floor  # noqa: F401  (imports the shared constants)

    src = open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "..", "scripts", "objective_floor.py")).read()
    # the floor script must derive its checkpoint search from the SAME
    # constants validate judges with — no separately-maintained list
    assert "SV_PRODUCTION_TAGS" in src and "FHN_PRODUCTION_TAGS" in src
    assert all(t.startswith("sv_") for t in SV_PRODUCTION_TAGS)
    assert all(t.startswith("fhn_") for t in FHN_PRODUCTION_TAGS)


def test_pmmh_result_fields_are_numpy():
    import jax
    import jax.numpy as jnp

    from viforssms_tpu.inference.mcmc.pmmh import pmmh

    def log_ev(k, th):
        return -0.5 * jnp.sum(th ** 2)

    def log_prior(th):
        return jnp.zeros(())

    r = pmmh(jax.random.key(0), log_ev, log_prior,
             jnp.zeros(2, jnp.float32), num_steps=12, warmup=4,
             dispatch_chunk=5)
    for name, v in r._asdict().items():
        assert isinstance(v, np.ndarray), (name, type(v))
