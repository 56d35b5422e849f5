"""VI quality diagnostics: importance weights, IWAE bound, PSIS-k̂, SIR.

The reference offers no way to ask "did the variational fit actually work?"
beyond eyeballing TensorBoard ELBO traces and theta histograms
(``AR.py:206-224``). This module adds the standard importance-sampling
toolkit on top of the engine's own per-particle ELBO terms:

* **log importance weights** ``log w = log p(x, y, theta) - log q(x, theta)``
  — exactly the per-particle ELBO when one window covers the whole series
  (``elbo_scale == 1``), which is the regime where the minibatch estimator
  (``AR.py:184-187``) degenerates to the full joint.
* **IWAE bound** ``log(1/K sum w_k)`` (Burda et al. 2016): a tighter evidence
  lower bound than the ELBO, sandwiching ``ELBO <= IWAE_K <= log Z`` and
  monotone in K — pinned against the exact Kalman evidence in
  ``tests/test_quality.py``.
* **PSIS smoothing + k-hat** (Vehtari, Simpson, Gelman, Yao, Gabry 2024;
  Zhang & Stephens 2009 tail fit): fits a generalized Pareto to the largest
  importance ratios. ``k_hat < 0.5`` — q is a reliable proposal; ``0.5–0.7``
  — usable with PSIS smoothing; ``> 0.7`` — the variational fit is too
  narrow to trust importance corrections (Yao et al. 2018, "Yes, but did it
  work?").
* **SIR resampling**: debiased posterior draws by resampling q's samples in
  proportion to their (smoothed) weights.

Everything here is host-side numpy over a handful of scalars per particle —
the heavy lifting (the joint/flow densities) already ran on device through
``VIEngine.eval_terms``.
"""

from __future__ import annotations

import dataclasses

import numpy as np


# ---------------------------------------------------------------------------
# Generalized-Pareto tail fit (Zhang & Stephens 2009 empirical-Bayes profile
# likelihood; the estimator behind PSIS k-hat).
# ---------------------------------------------------------------------------

def gpd_fit(x: np.ndarray) -> tuple:
    """Fit GPD(shape=k, scale=sigma) to exceedances ``x > 0``.

    Returns ``(k_hat, sigma)`` in the standard parameterization where the
    survival function is ``(1 + k x / sigma)^(-1/k)`` — heavy tails have
    ``k > 0``. Uses the Zhang–Stephens (2009) quadrature over the profile
    likelihood with the weakly-informative prior of Vehtari et al. (2024).
    """
    x = np.sort(np.asarray(x, dtype=np.float64))
    n = x.size
    if n < 5 or x[-1] <= 0:
        return np.inf, np.nan
    prior_bs, prior_k = 3.0, 10.0
    m = 30 + int(np.sqrt(n))
    # candidate values of b = k/sigma (theta in the paper)
    b = 1.0 - np.sqrt(m / (np.arange(1, m + 1, dtype=np.float64) - 0.5))
    b /= prior_bs * x[int(n / 4 + 0.5) - 1]
    b += 1.0 / x[-1]
    # profile MLE of (their) k given b, and the profile log-likelihood
    k = np.mean(np.log1p(-b[:, None] * x[None, :]), axis=1)
    log_lik = n * (np.log(-b / k) - k - 1.0)
    # posterior weights over candidates: softmax of the profile likelihood
    w = np.exp(log_lik - log_lik.max())
    keep = w >= 10 * np.finfo(np.float64).eps
    w, b = w[keep], b[keep]
    w /= w.sum()
    b_post = np.sum(b * w)
    # NOTE sign: Zhang–Stephens' shape is the negative of the standard GPD
    # xi; ``mean(log1p(-b x))`` computes xi directly (positive = heavy tail).
    k_post = np.mean(np.log1p(-b_post * x))
    # regularize toward k=0.5 (Vehtari et al. 2024 eq. for small tails)
    k_post = (n * k_post + prior_k * 0.5) / (n + prior_k)
    sigma = -k_post / b_post
    return float(k_post), float(sigma)


def _gpd_quantile(p: np.ndarray, k: float, sigma: float) -> np.ndarray:
    """Inverse CDF of GPD(k, sigma) at probabilities ``p``."""
    if abs(k) < 1e-12:
        return -sigma * np.log1p(-p)
    return sigma / k * (np.power(1.0 - p, -k) - 1.0)


# ---------------------------------------------------------------------------
# PSIS
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class PSISResult:
    log_weights: np.ndarray   # smoothed, self-normalized: logsumexp == 0
    k_hat: float
    n_tail: int

    @property
    def ess(self) -> float:
        """Importance-sampling effective sample size 1/sum(w^2)."""
        w = np.exp(self.log_weights)
        return float(1.0 / np.sum(w * w))

    @property
    def flag(self) -> str:
        if self.k_hat < 0.5:
            return "good"
        if self.k_hat < 0.7:
            return "ok"
        return "bad"


def psis(log_weights: np.ndarray) -> PSISResult:
    """Pareto-smooth raw log importance weights.

    The largest ``M = min(0.2 S, 3 sqrt(S))`` ratios are replaced by expected
    order statistics of the fitted GPD (capped at the raw maximum); the
    result is self-normalized in log space.
    """
    lw = np.asarray(log_weights, dtype=np.float64).copy()
    S = lw.size
    lw_max = lw.max()
    lw -= lw_max
    M = int(min(0.2 * S, 3.0 * np.sqrt(S)))
    k_hat = np.inf
    if M >= 5:
        order = np.argsort(lw)
        tail_ids = order[-M:]
        cutoff = lw[order[-M - 1]]
        exceed = np.exp(lw[tail_ids]) - np.exp(cutoff)
        k_hat, sigma = gpd_fit(exceed)
        if np.isfinite(k_hat):
            probs = (np.arange(M, dtype=np.float64) + 0.5) / M
            smoothed = _gpd_quantile(probs, k_hat, sigma) + np.exp(cutoff)
            # assign in ascending order, never above the observed max (=1)
            lw[tail_ids[np.argsort(lw[tail_ids])]] = np.minimum(
                np.log(smoothed), 0.0
            )
    norm = _logsumexp(lw)
    return PSISResult(log_weights=lw - norm, k_hat=float(k_hat), n_tail=M)


def _logsumexp(a: np.ndarray) -> float:
    m = a.max()
    return float(m + np.log(np.sum(np.exp(a - m))))


# ---------------------------------------------------------------------------
# Importance weights / IWAE from a trained engine
# ---------------------------------------------------------------------------

def log_importance_weights(engine, params, key, num_batches: int = 8,
                           series_index: int = 0) -> np.ndarray:
    """Raw ``log w`` for ``num_batches * p`` posterior draws.

    Valid only when each particle's ELBO is the FULL joint minus the full
    variational density: one window spanning the whole series
    (``spec.num_windows == 1`` and ``elbo_scale == 1``), or series-mode
    tables (each "window" is a whole series; ``series_index`` picks one).
    Raises on windowed configurations — random sub-window ELBOs are unbiased
    for the bound but are NOT log importance ratios of any fixed joint.

    For ``fix_theta`` engines the weights target ``p(x | y, theta)`` and the
    IWAE bound estimates ``log p(y | theta)`` — directly comparable to the
    Kalman evidence on AR(1).
    """
    import jax
    import jax.numpy as jnp

    if engine.series_mode:
        # series-mode tables are independent of cfg, so a cfg with
        # batch_dims != T would silently temper every weight by T/batch_dims
        if abs(engine.cfg.elbo_scale - 1.0) > 1e-6:
            raise ValueError(
                "importance weights require elbo_scale == 1 (whole-series "
                f"windows); got elbo_scale={engine.cfg.elbo_scale} — set "
                "batch_dims == T in the series-mode config"
            )
        starts = jnp.full((engine.cfg.p,), int(series_index), jnp.int32)
    else:
        if engine.spec.num_windows != 1 or abs(engine.cfg.elbo_scale - 1.0) > 1e-6:
            raise ValueError(
                "importance weights require a single whole-series window "
                f"(num_windows={engine.spec.num_windows}, "
                f"elbo_scale={engine.cfg.elbo_scale}); rebuild the engine with "
                "batch_dims == T"
            )
        starts = jnp.zeros((engine.cfg.p,), jnp.int32)
    out = []
    for _ in range(num_batches):
        key, sub = jax.random.split(key)
        t = engine.eval_terms(params, sub, starts)
        out.append(np.asarray(t.elbo, np.float64))
    return np.concatenate(out)


def iw_elbo(log_weights: np.ndarray, K: int = 0) -> float:
    """IWAE-K evidence lower bound from raw log weights.

    ``K == 0`` uses all weights as one batch; otherwise averages
    ``log mean(w)`` over disjoint groups of K (the Burda et al. L_K
    estimator), discarding the remainder.
    """
    lw = np.asarray(log_weights, dtype=np.float64)
    if K <= 0 or K >= lw.size:
        return _logsumexp(lw) - np.log(lw.size)
    n = (lw.size // K) * K
    groups = lw[:n].reshape(-1, K)
    m = groups.max(axis=1, keepdims=True)
    vals = m[:, 0] + np.log(np.mean(np.exp(groups - m), axis=1))
    return float(vals.mean())


def snis_moments(values: np.ndarray, log_weights: np.ndarray,
                 smooth: bool = True):
    """Self-normalized importance-sampling posterior moments.

    ``values``: (S, d) function values (e.g. theta draws) aligned with
    ``log_weights`` (S,). Returns ``(mean, sd, se_mean, psis_result)``:
    the SNIS estimates of posterior mean and sd per column, the delta-method
    standard error of the mean built from the PSIS effective sample size
    (Owen 2013 ch. 9), and the PSIS diagnostics (k-hat decides whether the
    estimate is trustworthy: < 0.7 per Yao et al. 2018).

    This is the debiasing step after IWAE training: q is the proposal, the
    weighted mixture is the posterior estimate — consistent as S grows even
    when q itself is biased/underdispersed, provided the tail is integrable
    (finite k-hat < 1)."""
    v = np.asarray(values, np.float64)
    if v.ndim == 1:
        v = v[:, None]
    ps = psis(log_weights)
    lw = ps.log_weights if smooth else (
        np.asarray(log_weights, np.float64)
        - _logsumexp(np.asarray(log_weights, np.float64)))
    w = np.exp(lw)                          # normalized
    mean = w @ v
    var = w @ (v - mean) ** 2
    sd = np.sqrt(np.maximum(var, 0.0))
    ess = max(ps.ess if smooth else 1.0 / float(np.sum(w * w)), 1.0)
    se_mean = sd / np.sqrt(ess)
    return mean, sd, se_mean, ps


def sir_resample(draws: np.ndarray, log_weights: np.ndarray, key,
                 num_samples: int, smooth: bool = True) -> np.ndarray:
    """Sampling-importance-resampling: debiased posterior draws.

    ``draws``: (S, ...) samples from q aligned with ``log_weights`` (S,).
    Resamples ``num_samples`` rows with probability proportional to the
    (optionally PSIS-smoothed) weights. ``key`` is a jax PRNG key.
    """
    import jax

    lw = psis(log_weights).log_weights if smooth else None
    if lw is None:
        lw = np.asarray(log_weights, np.float64)
        lw = lw - _logsumexp(lw)
    idx = np.asarray(
        jax.random.choice(
            key, lw.size, shape=(num_samples,), replace=True, p=np.exp(lw)
        )
    )
    return np.asarray(draws)[idx]


@dataclasses.dataclass(frozen=True)
class VIQualityReport:
    elbo: float            # mean per-particle ELBO (standard bound)
    iwae: float            # IWAE over all S draws (tighter bound)
    k_hat: float           # PSIS tail-shape diagnostic
    ess: float             # importance-sampling effective sample size
    n_samples: int
    flag: str              # good (<0.5) / ok (<0.7) / bad (>=0.7)

    def as_dict(self) -> dict:
        return dataclasses.asdict(self)


def vi_quality(engine, params, key, num_batches: int = 16,
               series_index: int = 0) -> VIQualityReport:
    """One-call check of a trained variational fit (Yao et al. 2018).

    Draws ``num_batches * p`` particles, computes the standard and
    importance-weighted bounds, and the PSIS k-hat verdict on whether q is
    close enough to the posterior for importance corrections to be trusted.
    """
    lw = log_importance_weights(engine, params, key, num_batches, series_index)
    lw = lw[np.isfinite(lw)]
    res = psis(lw)
    return VIQualityReport(
        elbo=float(lw.mean()),
        iwae=iw_elbo(lw),
        k_hat=res.k_hat,
        ess=res.ess,
        n_samples=int(lw.size),
        flag=res.flag,
    )
