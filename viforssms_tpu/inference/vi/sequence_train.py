"""Full-path sequence-sharded ELBO training — the CP analog for long series.

The reference trains long series (FHN: 1e6 latent steps,
``fitz_nag_NVP.py:456-457``) by sampling random sub-windows on one device with
the ``T/batch_dims`` ELBO rescaling. Because the NMA flow is local, there is a
second, TPU-native regime this module provides: shard the TIME axis of the
ENTIRE path across the mesh and optimize the EXACT full-path ELBO — no window
subsampling, no rescaling variance. Per step:

  * base noise + aligned features halo-exchange ``no_flows*kernel_len``
    positions once (ring ``ppermute`` over ICI, ``parallel/halo.py``);
  * each device runs the ordinary flow stack on its chunk
    (``flows/sharded.py`` layout);
  * the model's elementwise path transform runs locally; the TRANSFORMED
    state then halo-exchanges ``flow_dims`` positions so every device owns
    the (x_{t-1}, x_t) pairs that cross its left boundary (device 0 uses x0);
  * transition/observation/path-density terms reduce with ``psum``; theta
    terms are replicated.

The result equals the unsharded full-path ELBO exactly (tests); gradients
flow through ``ppermute``/``psum`` (their transposes are inserted by JAX), so
one ``jax.grad`` + Adamax step trains across the slice.

Restrictions: aligned 2-D features (the transposed projection is global —
``flows/sharded.py``); models whose ``transform_path`` is elementwise with
the mask/shift first-column pinning convention (AR1, LV, FHN, i.e. everything
except series-mode learn-theta, whose per-window x0 prior is tied to the
series axis, and SV's observed-dim injection).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from viforssms_tpu.flows.nma import NMAFlowStack
from viforssms_tpu.parallel.halo import halo_exchange_left


class SeqELBOTerms(NamedTuple):
    elbo: jax.Array      # (p,)
    sde_lp: jax.Array    # (p,)
    obs_lp: jax.Array    # (p,)
    path_lq: jax.Array   # (p,)
    x: jax.Array         # (p, d, T) transformed full path (time-sharded)


def _local_flow(flow: NMAFlowStack, local: int) -> NMAFlowStack:
    return NMAFlowStack(
        network_dims=flow.network_dims,
        kernel_len=flow.kernel_len,
        no_flows=flow.no_flows,
        batch_dims=local // flow.flow_dims,
        flow_dims=flow.flow_dims,
        use_norm=flow.use_norm,
        mu_softplus=flow.mu_softplus,
        sigma_eps=flow.sigma_eps,
        aligned_feats=flow.aligned_feats,
        remat=flow.remat,
    )


def sequence_sharded_elbo(model, flow: NMAFlowStack, params, z, feats, y,
                          obs_mask, theta, x0, mesh, axis: str = "sequence"):
    """Exact full-path ELBO path terms with the time axis sharded.

    z: (p, L_total) base noise, L_total = flow_dims * T;
    feats: (p, L_total, F) aligned features; y/obs_mask: (p, T) for 1-D
    models or (p, 2, T) for 2-D; theta: (p, D) replicated; x0: scalar or
    (flow_dims,) initial state. Returns :class:`SeqELBOTerms` WITHOUT the
    theta/prior terms (caller adds them; they are particle-local).
    """
    assert flow.flow_dims == 1 or flow.aligned_feats, (
        "sequence sharding requires aligned features for 2-D flows"
    )
    d = flow.flow_dims
    context = flow.no_flows * flow.kernel_len
    n = mesh.shape[axis]
    p, L_total = z.shape
    assert L_total % n == 0 and (L_total // n) % d == 0, (L_total, n, d)
    local = L_total // n
    lflow = _local_flow(flow, local)
    x0_vec = jnp.broadcast_to(jnp.asarray(x0, z.dtype).reshape(-1), (d,))

    def run_local(z_c, f_c, th, y_c, m_c):
        # flow over [left-halo | my chunk]
        z_ext = halo_exchange_left(z_c, context, axis)
        f_ext = jnp.moveaxis(
            halo_exchange_left(jnp.moveaxis(f_c, 1, 2), context, axis), 2, 1
        )
        x_raw, lq = lflow.apply(params, z_ext, f_ext, th)   # (p, local), (p,)

        W = local // d
        if d == 1:
            raw = x_raw[:, None, :]                          # (p, 1, W)
        else:
            raw = jnp.transpose(x_raw.reshape(p, W, d), (0, 2, 1))
        if model.uses_mask_shift:
            # elementwise transform on local positions; the dummy first
            # column (masked to 0, shifted by 0) is discarded below
            raw_ext = jnp.concatenate(
                [jnp.zeros((p, d, 1), raw.dtype), raw], axis=2)
            mask = jnp.ones((p, d, W + 1), raw.dtype).at[:, :, 0].set(0.0)
            shift = jnp.zeros((p, d, W + 1), raw.dtype)
            x_t, log_det = model.transform_path(raw_ext, mask, shift)
            body = x_t[:, :, 1:]                             # (p, d, W)
            lq = lq + log_det
        else:
            body = raw

        # edge state: left neighbor's last (transformed) state; x0 on device 0
        flat = jnp.transpose(body, (0, 2, 1)).reshape(p, local)
        ext = halo_exchange_left(flat, d, axis)              # (p, local + d)
        idx = jax.lax.axis_index(axis)
        edge = jnp.where(idx == 0,
                         jnp.broadcast_to(x0_vec[None, :], (p, d)),
                         ext[:, :d])
        ext = jnp.concatenate([edge, ext[:, d:]], axis=1)
        x_full = jnp.transpose(ext.reshape(p, W + 1, d), (0, 2, 1))
        if d == 1:
            x_full = x_full[:, 0, :]                         # (p, W+1)

        sde = model.transition_log_prob(x_full, th)
        obs = model.observation_log_prob(x_full, y_c, m_c, th)
        return (
            jax.lax.psum(sde, axis),
            jax.lax.psum(obs, axis),
            jax.lax.psum(lq, axis),
            body if d > 1 else body[:, 0, :],
        )

    y_spec = P(None, axis) if d == 1 else P(None, None, axis)
    x_spec = P(None, axis) if d == 1 else P(None, None, axis)
    f = jax.shard_map(
        run_local,
        mesh=mesh,
        in_specs=(P(None, axis), P(None, axis, None), P(None, None),
                  y_spec, y_spec),
        out_specs=(P(None), P(None), P(None), x_spec),
    )
    sde, obs, lq, x = f(z, feats, theta, y, obs_mask)
    elbo = sde - lq + obs
    return SeqELBOTerms(elbo, sde, obs, lq, x)


class SeqTrainState(NamedTuple):
    params: dict
    opt_state: tuple
    key: jax.Array
    step: jax.Array


def make_sequence_train_step(model, flow: NMAFlowStack, opt, mesh,
                             axis: str = "sequence", x0=0.0,
                             theta_flow=None, fix_theta_value=None):
    """Build a jitted full-path train step over a time-sharded mesh.

    ``params`` is {"flow": ..., "theta": ...} (theta entry absent/ignored
    when ``fix_theta_value`` is given). Data args (feats, y, obs_mask) are
    closed over by the caller per dataset and passed per call (static shapes
    -> one compilation)."""
    from viforssms_tpu.inference.vi.theta_flow import ThetaPosterior

    z_sharding = NamedSharding(mesh, P(None, axis))

    def loss_fn(params, key, feats, y, obs_mask):
        p = feats.shape[0]
        L_total = feats.shape[1]
        k_t, k_z = jax.random.split(key)
        if fix_theta_value is not None:
            theta = jnp.tile(jnp.asarray(fix_theta_value)[None, :], (p, 1))
            theta_lq = jnp.zeros(p, theta.dtype)
            prior = jnp.zeros(p, theta.dtype)
        else:
            theta, theta_lq = theta_flow.apply(
                params["theta"], k_t, p,
                method=ThetaPosterior.sample_and_log_prob)
            prior = model.log_prior(theta)
        z = jax.lax.with_sharding_constraint(
            jax.random.normal(k_z, (p, L_total)), z_sharding)
        t = sequence_sharded_elbo(model, flow, params["flow"], z, feats, y,
                                  obs_mask, theta, x0, mesh, axis)
        elbo = t.elbo + prior - theta_lq
        return -jnp.mean(elbo), t

    @jax.jit
    def train_step(state: SeqTrainState, feats, y, obs_mask):
        key, sub = jax.random.split(state.key)
        (loss, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, sub, feats, y, obs_mask)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        import optax

        params = optax.apply_updates(state.params, updates)
        return SeqTrainState(params, opt_state, key, state.step + 1), loss, terms

    return train_step
