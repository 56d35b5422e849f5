"""Gaussian distributions (replaces ``tfd.Normal`` / ``tfd.MultivariateNormalDiag``).

Pure-functional log-pdfs plus thin distribution objects carrying parameters.
Everything broadcasts and vectorizes; no batch-shape machinery is needed for
this model class.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

_HALF_LOG_2PI = 0.5 * math.log(2.0 * math.pi)


def normal_logpdf(x, loc, scale):
    """Elementwise N(loc, scale) log-density."""
    z = (x - loc) / scale
    return -0.5 * z * z - jnp.log(scale) - _HALF_LOG_2PI


@dataclasses.dataclass(frozen=True)
class Normal:
    loc: object = 0.0
    scale: object = 1.0

    def sample(self, key, shape=()):
        loc = jnp.asarray(self.loc)
        scale = jnp.asarray(self.scale)
        full = tuple(shape) + jnp.broadcast_shapes(loc.shape, scale.shape)
        return loc + scale * jax.random.normal(key, full, dtype=jnp.result_type(loc, scale, float))

    def log_prob(self, x):
        return normal_logpdf(x, jnp.asarray(self.loc), jnp.asarray(self.scale))


@dataclasses.dataclass(frozen=True)
class MultivariateNormalDiag:
    """Diagonal MVN over the last axis (event axis)."""

    loc: object = 0.0
    scale_diag: object = 1.0

    def sample(self, key, shape=()):
        loc = jnp.asarray(self.loc)
        scale = jnp.asarray(self.scale_diag)
        full = tuple(shape) + jnp.broadcast_shapes(loc.shape, scale.shape)
        return loc + scale * jax.random.normal(key, full, dtype=jnp.result_type(loc, scale, float))

    def log_prob(self, x):
        return jnp.sum(
            normal_logpdf(x, jnp.asarray(self.loc), jnp.asarray(self.scale_diag)), axis=-1
        )
