"""Named-mesh construction and sharding rules.

The reference is single-process/single-device (SURVEY.md §2.3); its only
parallel axes are implicit (particles p, series batch, time windows). Here
those become explicit mesh axes:

  * ``particles`` — p simultaneous (theta, window) posterior samples: pure
    data parallelism; ELBO gradient means become psum collectives inserted by
    XLA over ICI.
  * ``data``      — independent series (the 1024-series batched LV runs):
    replica axis, DCN-friendly.
  * ``sequence``  — the time axis, shardable because the NMA flow is local:
    a window needs only ``no_flows*kernel_len`` left context, exchanged as a
    halo via ``ppermute`` (parallel/halo.py).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_sizes: Sequence[int], axis_names: Sequence[str] = ("particles",),
              devices=None) -> Mesh:
    """Build a Mesh over the first prod(axis_sizes) devices."""
    import numpy as np

    devices = devices if devices is not None else jax.devices()
    n = int(np.prod(axis_sizes))
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    dev = np.asarray(devices[:n]).reshape(tuple(axis_sizes))
    return Mesh(dev, tuple(axis_names))


def particle_sharding(mesh: Mesh, ndim: int, axis: str = "particles") -> NamedSharding:
    """Shard the leading (particle) axis; replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_leading(mesh: Optional[Mesh], tree, axis: str = "particles"):
    """Constrain every array in ``tree`` to leading-axis sharding over ``axis``.

    No-op when ``mesh`` is None — the engine calls this unconditionally.
    """
    if mesh is None:
        return tree

    def f(a):
        if not hasattr(a, "ndim") or a.ndim == 0:
            return a
        return jax.lax.with_sharding_constraint(a, particle_sharding(mesh, a.ndim, axis))

    return jax.tree.map(f, tree)
