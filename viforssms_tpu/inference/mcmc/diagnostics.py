"""MCMC convergence diagnostics: split R-hat and autocorrelation ESS.

Standard definitions (Gelman et al., BDA3 / Vehtari et al. 2021 rank-
normalization omitted — plain split-R-hat on the raw draws, and Geyer
initial-monotone-sequence ESS). Used to qualify the HMC/NUTS gold-standard
runs before comparing moments against VI (BASELINE.json: agreement within
2 MC-SE — the SE needs a defensible ESS, not the nominal draw count).

Pure NumPy on host: diagnostics run once per chain batch, off the hot path.
"""

from __future__ import annotations

import numpy as np


def split_rhat(draws) -> np.ndarray:
    """Split potential-scale-reduction factor.

    draws: (num_samples, num_chains, dim) — each chain is split in half, so
    R-hat detects within-chain nonstationarity too. Returns (dim,).
    """
    x = np.asarray(draws, np.float64)
    n, m, d = x.shape
    half = n // 2
    # (2m) half-chains of length `half`
    halves = np.concatenate([x[:half], x[half : 2 * half]], axis=1)
    hn, hm = half, 2 * m
    chain_means = halves.mean(axis=0)                      # (2m, d)
    chain_vars = halves.var(axis=0, ddof=1)                # (2m, d)
    w = chain_vars.mean(axis=0)                            # within
    b = hn * chain_means.var(axis=0, ddof=1)               # between
    var_plus = (hn - 1) / hn * w + b / hn
    return np.sqrt(var_plus / np.maximum(w, 1e-300))


def ess(draws) -> np.ndarray:
    """Effective sample size via Geyer's initial monotone sequence.

    draws: (num_samples, num_chains, dim). Returns (dim,). Autocorrelations
    are estimated per chain with FFT, combined with the multi-chain
    correction (Stan reference manual, effective-sample-size section).
    """
    x = np.asarray(draws, np.float64)
    n, m, d = x.shape
    out = np.empty(d)
    for j in range(d):
        xc = x[:, :, j]
        chain_means = xc.mean(axis=0)
        chain_vars = xc.var(axis=0, ddof=1)
        w = chain_vars.mean()
        var_plus = (n - 1) / n * w + chain_means.var(ddof=1) if m > 1 else w
        if var_plus <= 0:
            out[j] = n * m
            continue
        # per-chain autocovariance via FFT
        xd = xc - chain_means
        L = 1 << (2 * n - 1).bit_length()
        f = np.fft.rfft(xd, L, axis=0)
        acov = np.fft.irfft(f * np.conj(f), L, axis=0)[:n].real / n
        rho = 1.0 - (w - acov.mean(axis=1)) / var_plus     # (n,)
        # Geyer: sum consecutive pairs while positive, enforce monotone decrease
        tau = 1.0
        prev = np.inf
        for t in range(1, n - 1, 2):
            pair = rho[t] + rho[t + 1]
            if pair < 0:
                break
            pair = min(pair, prev)
            prev = pair
            tau += 2.0 * pair
        out[j] = n * m / tau
    return out


def summarize(draws) -> dict:
    """Per-coordinate mean/sd/ESS/R-hat + MC standard error of the mean."""
    x = np.asarray(draws, np.float64)
    e = ess(x)
    return {
        "mean": x.reshape(-1, x.shape[-1]).mean(0),
        "sd": x.reshape(-1, x.shape[-1]).std(0, ddof=1),
        "ess": e,
        "rhat": split_rhat(x),
        "mcse_mean": x.reshape(-1, x.shape[-1]).std(0, ddof=1) / np.sqrt(np.maximum(e, 1.0)),
    }
