"""Adamax transform vs a NumPy port of the reference update rule."""

import jax.numpy as jnp
import numpy as np

from viforssms_tpu.inference.vi.adamax import adamax, clipped_adamax


def test_adamax_matches_reference_rule():
    lr, b1, b2, eps = 1e-2, 0.9, 0.999, 1e-8
    opt = adamax(lr, b1, b2, eps)
    params = {"w": jnp.array([1.0, -2.0, 0.5])}
    state = opt.init(params)

    # NumPy reference (optimisers/adamax.py:51-57)
    v = np.zeros(3)
    m = np.zeros(3)
    w = np.array([1.0, -2.0, 0.5])

    rng = np.random.default_rng(0)
    for _ in range(20):
        g = rng.normal(size=3).astype(np.float32)
        updates, state = opt.update({"w": jnp.asarray(g)}, state, params)
        params = {"w": params["w"] + updates["w"]}
        v = b1 * v + (1 - b1) * g
        m = np.maximum(b2 * m + eps, np.abs(g))
        w = w - lr * v / m
    np.testing.assert_allclose(params["w"], w, rtol=1e-5, atol=1e-6)


def test_clipped_adamax_clips_global_norm():
    opt = clipped_adamax(learning_rate=1.0, grad_clip=1.0)
    params = {"w": jnp.zeros(4)}
    state = opt.init(params)
    g = {"w": jnp.full(4, 100.0)}
    updates, _ = opt.update(g, state, params)
    # after clipping to norm 1, first-step v=(1-b1)*g_c, m=|g_c| => |update| = lr*(1-b1)
    np.testing.assert_allclose(np.abs(updates["w"]), 0.05, rtol=1e-4)
