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


def halo_exchange_left(x, halo: int, axis_name: str):
    """Prepend the last ``halo`` steps of the left neighbor's chunk.

    x: (..., L_local) per-device chunk. Device 0 receives zeros (the global
    left padding — matching the reference's zero-padded feature tables,
    AR.py:137-140).
    """
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)
    tail = x[..., -halo:]
    # send my tail to my RIGHT neighbor == receive left neighbor's tail
    recv = jax.lax.ppermute(tail, axis_name, [(i, (i + 1) % n) for i in range(n)])
    recv = jnp.where(idx == 0, jnp.zeros_like(recv), recv)
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
