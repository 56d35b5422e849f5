"""Invertibility / log-det / causality tests for the NMA conv-IAF stack.

These are the unit tests the reference never had for its hardest component
(SURVEY.md §7.3 item 2): the windowed log-density contract is checked against
an exact autodiff Jacobian of the restricted map z_window -> x_window.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viforssms_tpu.distributions.normal import normal_logpdf
from viforssms_tpu.flows.nma import NMAFlowStack, pairwise_swap


def _build(flow_dims, mu_softplus=False, aligned=False):
    kernel_len, no_flows, batch_dims = 4, 2, 6
    stack = NMAFlowStack(
        network_dims=(8, 8, 8),
        kernel_len=kernel_len,
        no_flows=no_flows,
        batch_dims=batch_dims,
        flow_dims=flow_dims,
        use_norm=(flow_dims == 2),
        mu_softplus=mu_softplus,
        aligned_feats=aligned,
    )
    kernel_ext = kernel_len * no_flows + flow_dims * batch_dims + flow_dims
    F = 5
    key = jax.random.key(0)
    z = jax.random.normal(key, (3, kernel_ext))
    feats = jax.random.normal(jax.random.key(1), (3, kernel_ext, F))
    theta = jax.random.normal(jax.random.key(2), (3, 3))
    params = stack.init(jax.random.key(3), z, feats, theta)
    return stack, params, z, feats, theta, kernel_ext, batch_dims * flow_dims + flow_dims


def test_pairwise_swap():
    x = jnp.arange(12.0).reshape(2, 6)
    y = pairwise_swap(x)
    np.testing.assert_allclose(y[0], [1, 0, 3, 2, 5, 4])
    np.testing.assert_allclose(pairwise_swap(y), x)


@pytest.mark.parametrize("flow_dims,mu1", [(1, False), (2, False), (2, True)])
def test_shapes_and_finiteness(flow_dims, mu1):
    stack, params, z, feats, theta, kext, out_len = _build(flow_dims, mu1)
    x, log_q = stack.apply(params, z, feats, theta)
    assert x.shape == (3, out_len)
    assert log_q.shape == (3,)
    assert np.all(np.isfinite(x)) and np.all(np.isfinite(log_q))


@pytest.mark.parametrize(
    "flow_dims,mu1,aligned",
    [(1, False, False), (2, False, False), (2, True, False), (2, True, True)],
)
def test_windowed_log_det_matches_jacobian(flow_dims, mu1, aligned):
    """log q = base_window_lp - logabsdet(d x_win / d z_win) for fixed context."""
    stack, params, z, feats, theta, kext, out_len = _build(flow_dims, mu1, aligned)
    window = out_len - flow_dims  # flow_dims * batch_dims
    z0 = z[:1]
    feats0, theta0 = feats[:1], theta[:1]

    def f(zw):
        z_full = z0.at[0, -window:].set(zw)
        x, _ = stack.apply(params, z_full, feats0, theta0)
        return x[0, -window:]

    zw0 = z0[0, -window:]
    jac = jax.jacobian(f)(zw0)
    _, logdet = np.linalg.slogdet(np.asarray(jac))
    _, log_q = stack.apply(params, z0, feats0, theta0)
    base_lp = float(jnp.sum(normal_logpdf(z0, 0.0, 1.0)[0, -window:]))
    np.testing.assert_allclose(float(log_q[0]), base_lp - logdet, rtol=1e-3, atol=1e-3)


def test_causality_no_forward_leakage():
    """x_t must not depend on z_s for s > t (1-D flow)."""
    stack, params, z, feats, theta, kext, out_len = _build(1)
    z0, feats0, theta0 = z[:1], feats[:1], theta[:1]

    def f(zf):
        x, _ = stack.apply(params, zf[None, :], feats0, theta0)
        return x[0]

    jac = np.asarray(jax.jacobian(f)(z0[0]))  # (out_len, kernel_ext)
    offset = kext - out_len  # context consumed by the convs
    for t in range(out_len):
        # output t may depend on z up to index t + offset only
        assert np.allclose(jac[t, t + offset + 1 :], 0.0, atol=1e-7), t


def test_context_locality_window():
    """x_t depends on at most no_flows*kernel_len past z's (the NMA locality)."""
    stack, params, z, feats, theta, kext, out_len = _build(1)
    z0, feats0, theta0 = z[:1], feats[:1], theta[:1]

    def f(zf):
        x, _ = stack.apply(params, zf[None, :], feats0, theta0)
        return x[0]

    jac = np.asarray(jax.jacobian(f)(z0[0]))
    offset = kext - out_len  # = no_flows * kernel_len
    t = out_len - 1
    # dependence reaches back at most offset + 1 z-steps (AR.py:132 window arithmetic)
    lo = t + offset - (offset + 1)
    assert np.allclose(jac[t, : max(lo, 0)], 0.0, atol=1e-7)


@pytest.mark.parametrize("flow_dims", [1, 2])
@pytest.mark.parametrize("mode", ["im2col", "hybrid"])
def test_alt_conv_modes_match_conv(mode, flow_dims):
    """conv_mode="im2col" (unfold + dot) and "hybrid" (conv-emitter forward +
    custom_vjp im2col backward) are numerically identical to the XLA conv
    lowering and parameter-compatible with it (same pytree, so trained
    checkpoints interchange between the lowerings)."""
    stack, params, z, feats, theta, _, _ = _build(flow_dims, aligned=(flow_dims == 2))
    stack_mm = stack.clone(conv_mode=mode)
    params_mm = stack_mm.init(jax.random.key(3), z, feats, theta)
    assert jax.tree.structure(params) == jax.tree.structure(params_mm)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params_mm)):
        assert a.shape == b.shape
    x0, lq0 = stack.apply(params, z, feats, theta)
    x1, lq1 = stack_mm.apply(params, z, feats, theta)  # same params, new lowering
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x0), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lq1), np.asarray(lq0), rtol=1e-5, atol=1e-5)
    # gradients agree too (the custom lowering is used inside value_and_grad)
    g0 = jax.grad(lambda p: stack.apply(p, z, feats, theta)[1].sum())(params)
    g1 = jax.grad(lambda p: stack_mm.apply(p, z, feats, theta)[1].sum())(params)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-5)


def test_batched_feat_mlp_matches_per_flow():
    """batched_feat_mlp computes the same function as the per-flow feature
    MLPs when its stacked weights are built from the per-flow ones."""
    stack, params, z, feats, theta, _, _ = _build(2, aligned=True)
    stack_b = stack.clone(batched_feat_mlp=True)
    pb = stack_b.init(jax.random.key(9), z, feats, theta)
    # graft the per-flow weights into the stacked layout
    import copy
    pb = jax.tree.map(lambda a: a, pb)  # deep-ish copy of the dict tree
    inner = dict(pb["params"])
    for j in range(4):
        inner[f"bfeat_{j}_kernel"] = jnp.stack(
            [params["params"][f"flow_{i}"][f"feat_{j}"]["kernel"]
             for i in range(stack.no_flows)])
        inner[f"bfeat_{j}_bias"] = jnp.stack(
            [params["params"][f"flow_{i}"][f"feat_{j}"]["bias"]
             for i in range(stack.no_flows)])
    for i in range(stack.no_flows):
        fl = {k: v for k, v in params["params"][f"flow_{i}"].items()
              if not k.startswith("feat_")}
        inner[f"flow_{i}"] = fl
    pb = {"params": inner}
    x0, lq0 = stack.apply(params, z, feats, theta)
    x1, lq1 = stack_b.apply(pb, z, feats, theta)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x0), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lq1), np.asarray(lq0), rtol=1e-5, atol=1e-5)


def test_compute_dtype_bf16_matches_f32():
    """bf16 activation compute (FlowConfig.compute_dtype, the round-5
    production learn-theta bench setting) must keep params f32, return f32
    outputs, and agree with the f32 path to activation-rounding tolerance
    — mu/sigma and density math are cast back to f32 by design
    (flows/nma.py ConvIAF.compute_dtype)."""
    stack, params, z, feats, theta, kext, out_len = _build(2, True, True)
    stack16 = stack.clone(compute_dtype="bfloat16")
    x0, lq0 = stack.apply(params, z, feats, theta)
    x1, lq1 = stack16.apply(params, z, feats, theta)
    assert x1.dtype == jnp.float32 and lq1.dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(x1)))
    # bf16 has ~3 decimal digits; paths are O(1) at this init
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x0),
                               rtol=0.05, atol=0.05)
    np.testing.assert_allclose(np.asarray(lq1), np.asarray(lq0),
                               rtol=0.05, atol=0.5)
    # gradients flow and stay finite through the bf16 compute
    def loss(p):
        _, lq = stack16.apply(p, z, feats, theta)
        return jnp.sum(lq)
    g = jax.grad(loss)(params)
    leaves = jax.tree.leaves(g)
    assert leaves and all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert all(l.dtype == jnp.float32 for l in leaves)
