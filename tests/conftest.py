"""Test harness: run everything on a virtual 8-device CPU mesh.

Set platform flags before jax initializes so sharding tests can build real
multi-device meshes without TPU hardware (the standard JAX mechanism for
multi-host simulation; SURVEY.md §4).
"""

import os

# Force CPU: the image's sitecustomize pins JAX_PLATFORMS to the (single) TPU
# backend in every process; tests must not contend for that one chip.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu"
assert jax.device_count() == 8
