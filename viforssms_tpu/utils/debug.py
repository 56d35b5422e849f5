"""Numerical monitors — the reference's NaN/Inf counter scopes as utilities.

The terminal reference script wraps every intermediate in summary scopes
counting non-finite values and Cholesky ranges (``..._learn_theta.py:528-567``).
Here: pytree-wide counters to attach to metrics, cheap enough to run every
log step, plus a checkify wrapper for hard failures in debugging sessions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def nonfinite_counts(tree) -> dict:
    """Count NaN/Inf leaves-wise; returns {"nan": n, "inf": n, "total": n}."""
    leaves = [l for l in jax.tree.leaves(tree) if hasattr(l, "dtype")]
    nan = sum(int(jnp.sum(jnp.isnan(l))) for l in leaves)
    inf = sum(int(jnp.sum(jnp.isinf(l))) for l in leaves)
    total = sum(int(l.size) for l in leaves)
    return {"nan": nan, "inf": inf, "total": total}


def assert_all_finite(tree, name: str = "tree"):
    c = nonfinite_counts(tree)
    if c["nan"] or c["inf"]:
        raise FloatingPointError(f"{name}: {c['nan']} NaN, {c['inf']} Inf of {c['total']}")


def check_engine_numerics(engine, state, key, starts=None) -> dict:
    """Per-term NaN/Inf report for one ELBO evaluation — the reference's
    monitor scopes (``..._learn_theta.py:528-567``) as an on-demand probe."""
    import jax
    import jax.numpy as jnp

    if starts is None:
        if engine.series_mode:
            starts = jnp.arange(min(engine.cfg.p, engine.num_series), dtype=jnp.int32)
        else:
            starts = jnp.zeros((engine.cfg.p,), jnp.int32)
    t = engine.eval_terms(state.params, key, starts)
    report = {}
    for name in ("elbo", "sde_lp", "obs_lp", "path_lq", "theta_lq", "prior_lp",
                 "theta", "x"):
        report[name] = nonfinite_counts(getattr(t, name))
    report["params"] = nonfinite_counts(state.params)
    return report


def chol_range_monitor(a, c) -> dict:
    """Cholesky diagonal range monitor (..._learn_theta.py:552-567)."""
    return {
        "chol_diag_min": float(jnp.minimum(jnp.min(a), jnp.min(c))),
        "chol_diag_max": float(jnp.maximum(jnp.max(a), jnp.max(c))),
    }
