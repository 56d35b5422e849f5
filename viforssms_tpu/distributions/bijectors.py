"""Stateless elementwise bijectors.

Replaces the ``tfd.bijectors`` usages of the reference (Softplus / Affine /
AffineScalar / Chain path transforms, e.g. ``lotka_volterra_partial.py:292-297``
and ``..._learn_theta.py:338-345,405-408``). Parameterized flows (MAF) live in
``inference/vi/theta_flow.py`` as flax modules.

Conventions:
  * ``forward(x)`` maps base -> target, ``inverse(y)`` maps target -> base.
  * ``forward_log_det(x)`` / ``inverse_log_det(y)`` return ELEMENTWISE log-det
    contributions with the same shape as the input; callers reduce over event
    dims (the reference's ``event_ndims`` argument) with ``sum_event``.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp


def sum_event(x, event_ndims: int):
    """Sum the trailing ``event_ndims`` axes (tf bijector ``event_ndims``)."""
    if event_ndims == 0:
        return x
    return jnp.sum(x, axis=tuple(range(-event_ndims, 0)))


class Bijector:
    def forward(self, x):
        raise NotImplementedError

    def inverse(self, y):
        raise NotImplementedError

    def forward_log_det(self, x):
        raise NotImplementedError

    def inverse_log_det(self, y):
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class Identity(Bijector):
    def forward(self, x):
        return x

    def inverse(self, y):
        return y

    def forward_log_det(self, x):
        return jnp.zeros_like(x)

    def inverse_log_det(self, y):
        return jnp.zeros_like(y)


@dataclasses.dataclass(frozen=True)
class Softplus(Bijector):
    """y = log1p(exp(x));   x = y + log(-expm1(-y))."""

    def forward(self, x):
        return jnp.logaddexp(x, 0.0)

    def inverse(self, y):
        # log(exp(y) - 1) computed stably for small and large y.
        return y + jnp.log(-jnp.expm1(-y))

    def forward_log_det(self, x):
        # log sigmoid(x) = -softplus(-x)
        return -jnp.logaddexp(-x, 0.0)

    def inverse_log_det(self, y):
        # d/dy log(exp(y)-1) = 1 / (1 - exp(-y))
        return -jnp.log(-jnp.expm1(-y))


@dataclasses.dataclass(frozen=True)
class Exp(Bijector):
    def forward(self, x):
        return jnp.exp(x)

    def inverse(self, y):
        return jnp.log(y)

    def forward_log_det(self, x):
        return x

    def inverse_log_det(self, y):
        return -jnp.log(y)


@dataclasses.dataclass(frozen=True)
class Affine(Bijector):
    """y = scale * x + shift (broadcasting elementwise)."""

    shift: float = 0.0
    scale: float = 1.0

    def forward(self, x):
        return self.scale * x + self.shift

    def inverse(self, y):
        return (y - self.shift) / self.scale

    def forward_log_det(self, x):
        return jnp.broadcast_to(jnp.log(jnp.abs(jnp.asarray(self.scale, x.dtype))), x.shape)

    def inverse_log_det(self, y):
        return jnp.broadcast_to(-jnp.log(jnp.abs(jnp.asarray(self.scale, y.dtype))), y.shape)


@dataclasses.dataclass(frozen=True)
class Chain(Bijector):
    """Compose bijectors tf-style: Chain([f, g]).forward(x) == f(g(x)).

    Matches ``tfb.Chain`` ordering (last listed applied first on forward),
    as used for the positive-path transform chain
    ``Chain([Affine(+1), Softplus, Affine(-1)])`` (``..._learn_theta.py:405-408``).
    """

    bijectors: Sequence[Bijector] = ()

    def forward(self, x):
        for b in reversed(self.bijectors):
            x = b.forward(x)
        return x

    def inverse(self, y):
        for b in self.bijectors:
            y = b.inverse(y)
        return y

    def forward_log_det(self, x):
        total = jnp.zeros_like(x)
        for b in reversed(self.bijectors):
            total = total + b.forward_log_det(x)
            x = b.forward(x)
        return total

    def inverse_log_det(self, y):
        total = jnp.zeros_like(y)
        for b in self.bijectors:
            total = total + b.inverse_log_det(y)
            y = b.inverse(y)
        return total


def softplus_path_transform(shift: float = 1.0) -> Chain:
    """The reference's positive-path chain: x -> softplus(x + (-1)) + 1 style.

    ``Chain([Affine(shift=+s), Softplus, Affine(shift=-s)])``
    (``lotka_volterra_partial_intact.py:257-264``, ``..._learn_theta.py:338-345``).
    """
    return Chain((Affine(shift=shift), Softplus(), Affine(shift=-shift)))
