"""Masked-autoregressive-flow posterior for model parameters theta.

Re-expresses the reference's theta posterior — a chain of
``Invert(MaskedAutoregressiveFlow(hidden=[5,5,5], elu))`` bijectors with random
permutations between and an optional terminal Softplus for positivity
(``AR.py:377-391``, ``..._learn_theta.py:835-850``) — as a flax module with an
explicit MADE implementation.

Directions (matching ``tfb.Invert(tfb.MaskedAutoregressiveFlow)``):
  * sampling pushes base noise through ``MAF.inverse``, a single parallel MADE
    pass per bijector: ``x = (z - shift(z)) * exp(-log_scale(z))`` — ideal for
    the TPU (a few tiny matmuls, no sequential loop);
  * density evaluation at arbitrary theta (only needed for diagnostics like
    the reference's "truth_log_prob", ``lotka_volterra_partial.py:319``) runs
    the D-step autoregressive solve, D = len(theta) in {3,4,5}.

``sample_and_log_prob`` returns the log-density of the drawn sample for free
(no inverse pass), which is all the ELBO needs (``AR.py:117-118``).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from viforssms_tpu.distributions.normal import normal_logpdf


def _made_degrees(dim: int, hidden: Sequence[int]) -> list:
    """MADE degree assignment: inputs 1..D, hidden cycled over 1..D-1."""
    degrees = [np.arange(1, dim + 1)]
    max_deg = max(dim - 1, 1)
    for width in hidden:
        degrees.append(np.arange(width) % max_deg + 1)
    return degrees


def made_masks(dim: int, hidden: Sequence[int]) -> Tuple[list, np.ndarray]:
    """Autoregressive masks: hidden masks (prev_deg <= next_deg), strict output mask."""
    degrees = _made_degrees(dim, hidden)
    masks = []
    for d_in, d_out in zip(degrees[:-1], degrees[1:]):
        masks.append((d_out[None, :] >= d_in[:, None]).astype(np.float32))
    # output degree d depends on hidden degrees < d (strict)
    out_mask = (degrees[0][None, :] > degrees[-1][:, None]).astype(np.float32)
    return masks, out_mask


class MaskedDense(nn.Module):
    features: int
    mask: np.ndarray  # (in_features, features)

    @nn.compact
    def __call__(self, x):
        w = self.param("kernel", nn.initializers.glorot_uniform(), self.mask.shape, x.dtype)
        b = self.param("bias", nn.initializers.zeros, (self.features,), x.dtype)
        return x @ (w * jnp.asarray(self.mask, x.dtype)) + b


class MADE(nn.Module):
    """Masked autoregressive density network: x -> (shift, log_scale).

    Output component i depends only on inputs with index < i (0-based), the
    contract behind ``tfb.masked_autoregressive_default_template``.
    """

    dim: int
    hidden: Tuple[int, ...] = (5, 5, 5)

    @nn.compact
    def __call__(self, x):
        masks, out_mask = made_masks(self.dim, self.hidden)
        h = x
        for mask in masks:
            h = nn.elu(MaskedDense(features=mask.shape[1], mask=mask)(h))
        shift = MaskedDense(features=self.dim, mask=out_mask)(h)
        # Separate head so shift and log_scale get independent weights.
        log_scale = MaskedDense(features=self.dim, mask=out_mask)(h)
        # Keep scales sane early in training (tf clips implicitly via init).
        log_scale = jnp.clip(log_scale, -5.0, 5.0)
        return shift, log_scale


class ThetaPosterior(nn.Module):
    """q(theta): base Normal -> [Invert(MAF), Permute]* -> optional Softplus."""

    dim: int
    num_bijectors: int = 5
    hidden: Tuple[int, ...] = (5, 5, 5)
    softplus: bool = False
    base_loc: float = 0.0
    base_scale: float = 1.0
    perm_seed: int = 1

    def setup(self):
        self.mades = [
            MADE(dim=self.dim, hidden=self.hidden, name=f"made_{k}")
            for k in range(self.num_bijectors)
        ]
        rng = np.random.RandomState(self.perm_seed)
        # A fixed random permutation between consecutive bijectors
        # (reference tfb.Permute, AR.py:384-385).
        self.perms = [rng.permutation(self.dim) for _ in range(self.num_bijectors - 1)]

    def __call__(self, key, p: int):
        return self.sample_and_log_prob(key, p)

    def sample_and_log_prob(self, key, p: int, widen: float = 1.0):
        """Draw p samples and their log q — one parallel MADE pass per bijector.

        ``widen > 1`` inflates the BASE scale by that factor (a defensive
        proposal for self-normalized/forward-KL training: samples reach
        beyond the current posterior's support); the returned log-density is
        the widened proposal's own, so importance weights against it are
        exact. ``widen=1`` is the posterior itself."""
        scale = self.base_scale * widen
        z = self.base_loc + scale * jax.random.normal(key, (p, self.dim))
        log_q = jnp.sum(normal_logpdf(z, self.base_loc, scale), axis=-1)
        x = z
        for k in range(self.num_bijectors):
            shift, log_scale = self.mades[k](x)
            x = (x - shift) * jnp.exp(-log_scale)
            log_q = log_q + jnp.sum(log_scale, axis=-1)
            if k < self.num_bijectors - 1:
                x = x[:, jnp.asarray(self.perms[k])]
        if self.softplus:
            # terminal positivity bijector (..._learn_theta.py:844)
            log_q = log_q + jnp.sum(jnp.logaddexp(-x, 0.0), axis=-1)  # -log sigmoid(x)
            x = jnp.logaddexp(x, 0.0)
        return x, log_q

    def log_prob(self, theta):
        """log q at arbitrary theta (shape (..., dim)) — D-step inverse solve."""
        x = theta
        log_q = jnp.zeros(theta.shape[:-1], theta.dtype)
        if self.softplus:
            log_q = log_q - jnp.sum(jnp.log(-jnp.expm1(-x)), axis=-1)
            x = x + jnp.log(-jnp.expm1(-x))  # softplus inverse
        for k in reversed(range(self.num_bijectors)):
            if k < self.num_bijectors - 1:
                inv_perm = np.argsort(self.perms[k])
                x = x[..., jnp.asarray(inv_perm)]
            # Solve z from x = (z - shift(z)) exp(-log_scale(z)) by D fixed-point
            # sweeps (exact because conditioning is strictly triangular).
            z = jnp.zeros_like(x)
            for _ in range(self.dim):
                shift, log_scale = self.mades[k](z)
                z = x * jnp.exp(log_scale) + shift
            _, log_scale = self.mades[k](z)
            log_q = log_q + jnp.sum(log_scale, axis=-1)
            x = z
        log_q = log_q + jnp.sum(
            normal_logpdf(x, self.base_loc, self.base_scale), axis=-1
        )
        return log_q


class Coupling(nn.Module):
    """One RealNVP affine-coupling bijector (sampling direction).

    ``mask`` marks the conditioner half (passed through unchanged); the other
    half is transformed ``y = x * exp(s(x_m)) + t(x_m)`` with s, t from a
    small ELU MLP. Exactly invertible in one pass (both directions parallel).
    """

    dim: int
    hidden: Tuple[int, ...] = (8, 8)
    mask: Tuple[int, ...] = ()

    @nn.compact
    def _st(self, xm):
        h = xm
        for i, w in enumerate(self.hidden):
            h = nn.elu(nn.Dense(w, name=f"h_{i}")(h))
        s = nn.Dense(self.dim, name="s")(h)
        t = nn.Dense(self.dim, name="t")(h)
        return jnp.clip(s, -5.0, 5.0), t

    def forward(self, x):
        m = jnp.asarray(self.mask, x.dtype)
        s, t = self._st(x * m)
        s = s * (1 - m)
        y = x * m + (1 - m) * (x * jnp.exp(s) + t)
        return y, jnp.sum(s, axis=-1)

    def inverse(self, y):
        m = jnp.asarray(self.mask, y.dtype)
        s, t = self._st(y * m)
        s = s * (1 - m)
        x = y * m + (1 - m) * ((y - t) * jnp.exp(-s))
        return x, -jnp.sum(s, axis=-1)

    def __call__(self, x):  # for init
        return self.forward(x)


class RealNVPPosterior(nn.Module):
    """q(theta) as a RealNVP coupling chain (the flow family named by the
    reference's ``fitz_nag_NVP.py`` and BASELINE.json's north star), with the
    same API as :class:`ThetaPosterior`. Both directions are single parallel
    passes, so ``log_prob`` at arbitrary theta is exact without the MAF's
    D-step solve."""

    dim: int
    num_bijectors: int = 5
    hidden: Tuple[int, ...] = (8, 8)
    softplus: bool = False
    base_loc: float = 0.0
    base_scale: float = 1.0

    def setup(self):
        # alternating even/odd conditioner masks
        masks = []
        for k in range(self.num_bijectors):
            m = tuple(1 if (i + k) % 2 == 0 else 0 for i in range(self.dim))
            masks.append(m)
        self.couplings = [
            Coupling(dim=self.dim, hidden=self.hidden, mask=masks[k],
                     name=f"cpl_{k}")
            for k in range(self.num_bijectors)
        ]

    def __call__(self, key, p: int):
        return self.sample_and_log_prob(key, p)

    def sample_and_log_prob(self, key, p: int, widen: float = 1.0):
        scale = self.base_scale * widen
        z = self.base_loc + scale * jax.random.normal(key, (p, self.dim))
        log_q = jnp.sum(normal_logpdf(z, self.base_loc, scale), axis=-1)
        x = z
        for c in self.couplings:
            x, ldj = c.forward(x)
            log_q = log_q - ldj
        if self.softplus:
            log_q = log_q + jnp.sum(jnp.logaddexp(-x, 0.0), axis=-1)
            x = jnp.logaddexp(x, 0.0)
        return x, log_q

    def log_prob(self, theta):
        x = theta
        log_q = jnp.zeros(theta.shape[:-1], theta.dtype)
        if self.softplus:
            log_q = log_q - jnp.sum(jnp.log(-jnp.expm1(-x)), axis=-1)
            x = x + jnp.log(-jnp.expm1(-x))
        for c in reversed(self.couplings):
            x, ldj = c.inverse(x)
            log_q = log_q + ldj
        return log_q + jnp.sum(
            normal_logpdf(x, self.base_loc, self.base_scale), axis=-1)
