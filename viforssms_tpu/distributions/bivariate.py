"""Batched bivariate Gaussian log-density from a lower-triangular factor.

Replaces the reference's ``Bivariate_Normal`` which went through three
generations of numerical fixes — explicit ``matrix_inverse``
(``lotka_volterra_partial.py:39-52``), SVD pseudo-inverse
(``lotka_volterra_latest_batch_gpt.py:58-86``), and jittered triangular solve
(``..._learn_theta.py:50-61``). Here the 2x2 solve is done in closed form by
back-substitution on the Cholesky factor directly — no inverse, no solve op,
fully fused elementwise math on the VPU:

    L = [[a, 0], [b, c]],  L u = r  =>  u1 = r1/a, u2 = (r2 - b u1)/c
    log N(x; mu, L L^T) = -0.5 ||u||^2 - log a - log c - log(2 pi)
"""

from __future__ import annotations

import math

import jax.numpy as jnp

_LOG_2PI = math.log(2.0 * math.pi)


def bivariate_tril_logpdf(x1, x2, mu1, mu2, a, b, c, jitter: float = 0.0):
    """Log-density of (x1, x2) under N(mu, L L^T), L = [[a,0],[b,c]].

    All arguments broadcast elementwise; returns an array of the broadcast
    shape. ``jitter`` is added to the diagonal entries a, c (the reference
    adds ``eye * 1e-3`` to the Cholesky, ``..._learn_theta.py:52-53``).
    """
    a = a + jitter
    c = c + jitter
    r1 = x1 - mu1
    r2 = x2 - mu2
    u1 = r1 / a
    u2 = (r2 - b * u1) / c
    return -0.5 * (u1 * u1 + u2 * u2) - jnp.log(a) - jnp.log(c) - _LOG_2PI


def diag_normal_logpdf(x1, x2, mu1, mu2, s1, s2):
    """Log-density of (x1, x2) under independent N(mu_i, s_i^2) (SV/FHN diffusion,
    ``SV_dense.py:219-223``, ``fitz_nag_NVP.py:251-255``)."""
    z1 = (x1 - mu1) / s1
    z2 = (x2 - mu2) / s2
    return -0.5 * (z1 * z1 + z2 * z2) - jnp.log(s1) - jnp.log(s2) - _LOG_2PI
