"""Sequence-axis sharding with halo exchange — the CP/SP analog for causal convs.

The NMA flow is local by construction: a time window needs only
``no_flows * kernel_len`` steps of left context (SURVEY.md §5 "long-context").
That makes the time axis shardable: each device holds a contiguous chunk,
fetches the trailing ``halo`` steps of its LEFT neighbor with a ring
``ppermute`` over ICI, runs the valid-padded conv locally, and the
concatenation of chunk outputs equals the unsharded computation exactly —
no attention, no all-to-all, one neighbor exchange per flow stack.

Use inside ``shard_map`` over a mesh axis named ``axis_name``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def halo_exchange_left(x, halo: int, axis_name: str, edge=None):
    """Prepend the last ``halo`` steps of the left neighbor's chunk.

    x: (..., L_local) per-device chunk. Device 0 receives ``edge``
    (broadcast to ``(..., halo)``) — the global left boundary. ``None``
    means zeros (matching the reference's zero-padded feature tables,
    AR.py:137-140); the product sequence engine passes the table's real
    padding block so the first chunk is conditioned identically to the
    windowed path (``inference/vi/sequence_train.SequenceVIEngine``).
    """
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)
    L = x.shape[-1]
    if halo > L:
        # The halo spans multiple neighbors (tiny chunks — e.g. a long flow
        # context over a deep mesh): gather the full axis once and slice the
        # needed window locally. One all-gather instead of ceil(halo/L)
        # ppermute hops; only taken in the small-chunk regime.
        full = jax.lax.all_gather(x, axis_name, axis=x.ndim - 1, tiled=True)
        if edge is None:
            edge_block = jnp.zeros(x.shape[:-1] + (halo,), x.dtype)
        else:
            edge_block = jnp.broadcast_to(
                jnp.asarray(edge, x.dtype), x.shape[:-1] + (halo,))
        padded = jnp.concatenate([edge_block, full], axis=-1)
        # my chunk starts at global position idx*L == padded index idx*L+halo;
        # left context = padded[idx*L : idx*L + halo]
        ctx = jax.lax.dynamic_slice_in_dim(padded, idx * L, halo, x.ndim - 1)
        return jnp.concatenate([ctx, x], axis=-1)
    tail = x[..., -halo:]
    # send my tail to my RIGHT neighbor == receive left neighbor's tail
    recv = jax.lax.ppermute(tail, axis_name, [(i, (i + 1) % n) for i in range(n)])
    if edge is None:
        edge_block = jnp.zeros_like(recv)
    else:
        edge_block = jnp.broadcast_to(jnp.asarray(edge, x.dtype), recv.shape)
    recv = jnp.where(idx == 0, edge_block, recv)
    return jnp.concatenate([recv, x], axis=-1)


def sharded_causal_conv1d(x, kernel, mesh, axis_name: str = "sequence"):
    """Causal conv along the last axis of x (..., L) sharded over ``axis_name``.

    Matches ``valid`` conv over zero-left-padded input of length L + K - 1,
    i.e. output[t] = sum_k kernel[k] * x[t - (K-1) + k] with zero history.
    Reference semantics: the causal conv1d at AR.py:61-62 acting on the padded
    tables. Demonstrates the halo pattern used by the sequence-sharded flow.
    """
    K = kernel.shape[0]

    def local(xc):
        xh = halo_exchange_left(xc, K - 1, axis_name)
        dn = jax.lax.conv_dimension_numbers((1, 1, xh.shape[-1]), (1, 1, K), ("NCW", "OIW", "NCW"))
        out = jax.lax.conv_general_dilated(
            xh[None, None, :], kernel[None, None, :], (1,), "VALID", dimension_numbers=dn
        )
        return out[0, 0]

    f = jax.shard_map(
        local, mesh=mesh, in_specs=P(axis_name), out_specs=P(axis_name)
    )
    return f(x)
