"""Sequence-sharded full-path NMA sampling (the SP/CP analog for causal convs).

The reference processes long series (FHN: 1e6 latent steps,
``fitz_nag_NVP.py:456-457``) as sequential windows on one device. Because the
NMA flow is local — a position depends on at most ``no_flows*kernel_len``
earlier base-noise/feature positions — the ENTIRE path can instead be sampled
in one shot with the time axis sharded across devices: each device holds a
contiguous chunk, receives its left neighbor's trailing
``no_flows*kernel_len`` positions once (ring ``ppermute`` over ICI,
``parallel/halo.py``), runs the ordinary flow stack locally, and the
windowed log-density contributions reduce with one ``psum``.

Requires the aligned 2-D feature mode (``FlowConfig.aligned_feats_2d``): the
reference's transposed feature projection is global over the window and
cannot shard. Chunk parity: ``flow_dims * T`` must divide evenly by the mesh
axis and chunks must be even-length for the 2-D interleave.

Device 0's halo is zero-filled, which matches the zero left-padding the
feature tables use for the sequence start (``AR.py:137-140``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from viforssms_tpu.flows.nma import NMAFlowStack
from viforssms_tpu.parallel.halo import halo_exchange_left


def sequence_sharded_sample(flow: NMAFlowStack, params, z, feats, theta, mesh,
                            axis: str = "sequence"):
    """Sample a full path with the time axis sharded over ``axis``.

    z: (p, L_total) base noise, L_total = flow_dims * T (+ flow_dims edge slot);
    feats: (p, L_total, F) aligned features; theta: (p, D) replicated.
    Returns (x (p, L_total), log_q (p,)) — identical to running the stack
    unsharded over the zero-left-padded sequence.
    """
    assert flow.flow_dims == 1 or flow.aligned_feats, (
        "sequence sharding requires aligned features for 2-D flows"
    )
    context = flow.no_flows * flow.kernel_len
    n = mesh.shape[axis]
    L_total = z.shape[1]
    assert L_total % n == 0, (L_total, n)
    local = L_total // n
    assert local % flow.flow_dims == 0

    local_flow = NMAFlowStack(
        network_dims=flow.network_dims,
        kernel_len=flow.kernel_len,
        no_flows=flow.no_flows,
        batch_dims=local // flow.flow_dims,
        flow_dims=flow.flow_dims,
        use_norm=flow.use_norm,
        mu_softplus=flow.mu_softplus,
        sigma_eps=flow.sigma_eps,
        aligned_feats=flow.aligned_feats,
    )

    def run_local(z_c, f_c, th):
        # one halo exchange covers the receptive field of the whole stack
        z_ext = halo_exchange_left(z_c, context, axis)
        f_ext = jnp.moveaxis(
            halo_exchange_left(jnp.moveaxis(f_c, 1, 2), context, axis), 2, 1
        )
        x, log_q_local = local_flow.apply(params, z_ext, f_ext, th)
        log_q = jax.lax.psum(log_q_local, axis)
        return x, log_q

    f = jax.shard_map(
        run_local,
        mesh=mesh,
        in_specs=(P(None, axis), P(None, axis, None), P(None, None)),
        out_specs=(P(None, axis), P(None)),
    )
    return f(z, feats, theta)


def unsharded_reference(flow: NMAFlowStack, params, z, feats, theta):
    """Same computation on one device: zero-left-pad and run the stack with
    batch_dims = full length (for tests and single-chip use)."""
    context = flow.no_flows * flow.kernel_len
    p, L_total = z.shape
    z_ext = jnp.concatenate([jnp.zeros((p, context), z.dtype), z], axis=1)
    f_ext = jnp.concatenate(
        [jnp.zeros((p, context, feats.shape[2]), feats.dtype), feats], axis=1
    )
    full_flow = NMAFlowStack(
        network_dims=flow.network_dims,
        kernel_len=flow.kernel_len,
        no_flows=flow.no_flows,
        batch_dims=L_total // flow.flow_dims,
        flow_dims=flow.flow_dims,
        use_norm=flow.use_norm,
        mu_softplus=flow.mu_softplus,
        sigma_eps=flow.sigma_eps,
        aligned_feats=flow.aligned_feats,
    )
    return full_flow.apply(params, z_ext, f_ext, theta)
