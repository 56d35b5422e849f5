"""Multi-host (multi-process) execution helpers — the DCN layer.

The reference is strictly single-process (SURVEY.md §2.3). This module wires
the framework to JAX's distributed runtime so the same named-mesh programs
(particle DP, series DP, sequence sharding) run across processes: on a TPU
pod slice each process drives its local chips and collectives ride ICI/DCN;
on CPU the same code paths run over Gloo, which is how the multi-host tests
work without hardware (two OS processes x N virtual devices each).

Conventions:
  * call :func:`initialize` first in every process (env-driven on real
    fleets via JAX's standard cluster detection; explicit for tests);
  * data enters as process-local NumPy via :func:`shard_global` (each
    process contributes its slice) or :func:`replicate_global` (each
    process holds the identical full array);
  * PRNG state that crosses jit boundaries should be legacy ``PRNGKey``
    uint32 vectors (globalizable like any array), not typed key objects.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Join the JAX distributed runtime (idempotent per process).

    With no arguments, defers to JAX's environment-based cluster detection
    (TPU pod metadata / standard env vars). Explicit arguments are for
    multi-process tests on one machine."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(axis_names: Sequence[str] = ("particles",),
                axis_sizes: Optional[Sequence[int]] = None) -> Mesh:
    """Mesh over ALL global devices (every process sees the same mesh)."""
    devs = np.array(jax.devices())
    if axis_sizes is None:
        axis_sizes = (len(devs),) + (1,) * (len(axis_names) - 1)
    return Mesh(devs.reshape(tuple(axis_sizes)), tuple(axis_names))


def shard_global(mesh: Mesh, spec: P, local_data) -> jax.Array:
    """Assemble a global array from this process's slice of the data."""
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), np.asarray(local_data))


def replicate_global(mesh: Mesh, tree):
    """Replicate a pytree of host arrays onto the global mesh.

    Every process must pass identical data (the usual case for parameters,
    optimizer state, and feature tables)."""
    sharding = NamedSharding(mesh, P())

    def one(a):
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(jax.device_get(a)))

    return jax.tree.map(one, tree)


def replicate_state(mesh: Mesh, tree):
    """:func:`replicate_global` for pytrees that contain TYPED PRNG keys
    (``jax.random.key``): key arrays are converted to their uint32 key data,
    replicated, and re-wrapped with the same impl — so a whole
    ``VIEngine``/``SequenceVIEngine`` TrainState globalizes in one call."""
    def one(a):
        try:
            is_key = jax.dtypes.issubdtype(a.dtype, jax.dtypes.prng_key)
        except Exception:
            is_key = False
        if is_key:
            impl = jax.random.key_impl(a)
            data = replicate_global(mesh, jax.random.key_data(a))
            return jax.random.wrap_key_data(data, impl=impl)
        return replicate_global(mesh, a)

    return jax.tree.map(one, tree)


def all_processes_equal(value: float, tol: float = 0.0) -> bool:
    """Check a host scalar agrees across processes (via a global psum)."""
    import jax.numpy as jnp

    mesh = global_mesh(("check",))
    n = mesh.shape["check"]

    def f(v):
        mx = jax.lax.pmax(v[0], "check")
        mn = jax.lax.pmin(v[0], "check")
        return mx - mn  # replicated scalar -> addressable on every process

    arr = shard_global(mesh, P("check"),
                       np.full((jax.local_device_count(),), value, np.float32))
    spread = jax.jit(jax.shard_map(f, mesh=mesh, in_specs=P("check"),
                                   out_specs=P()))(arr)
    return bool(float(jax.device_get(spread)) <= tol)
