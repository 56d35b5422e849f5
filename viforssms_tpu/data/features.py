"""Window/feature pipeline: precomputed padded tables + on-device gathers.

The reference assembles every minibatch on the host with dozens of per-index
NumPy concatenations per step (``AR.py:262-288`` — its second hot loop,
SURVEY.md §3.5). Here the padded feature tables are built ONCE (host NumPy,
below) and live in device HBM; per step a jitted ``vmap`` of
``lax.dynamic_slice`` gathers the p windows — static shapes, no host work,
fully inside the compiled train step.

Table layouts mirror the reference exactly so feature semantics (and hence
posterior parity) carry over:
  * 1-D AR:  ``AR.py:135-150``   — channels [obs lags x fw, context flag,
    time, time-till, obs indicator]
  * 2-D LV/FHN: ``lotka_volterra_partial.py:188-204`` — interleaved (u,v)
    layout, channels [obs lags x fw (stride-5 shifts), context flag, time,
    time-till]; obs indicator fed separately as ``bin_feed``
  * SV: ``SV_dense.py:159-184`` — channels [obs lags x fw, time, rolling
    variance, log rolling variance-of-diffs]
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class WindowTables(NamedTuple):
    """Device-resident padded tables (a pytree of arrays)."""

    feat: jax.Array                 # (L, F)
    mask: jax.Array                 # (d, W_total + 1)
    shift: jax.Array                # (d, W_total + 1)
    bin_feed: Optional[jax.Array]   # (d, W_total) obs indicator (2-D models)
    dim_one: Optional[jax.Array]    # (W_total + 1,) raw observed dim (SV)


@dataclasses.dataclass(frozen=True)
class WindowSpec:
    """Static window geometry, hashable for jit closure."""

    kernel_ext: int
    batch_dims: int
    flow_dims: int
    target_dims: int  # number of latent steps (windows start at multiples of batch_dims)

    @property
    def num_windows(self) -> int:
        return self.target_dims // self.batch_dims

    def window_starts(self) -> np.ndarray:
        return np.arange(0, self.target_dims, self.batch_dims, dtype=np.int32)


class WindowBatch(NamedTuple):
    feats: jax.Array     # (p, kernel_ext, F)
    mask: jax.Array      # (p, d, batch_dims+1)
    shift: jax.Array     # (p, d, batch_dims+1)
    bin_feed: Optional[jax.Array]  # (p, d, batch_dims)
    dim_one: Optional[jax.Array]   # (p, batch_dims+1)


def gather_windows(tables: WindowTables, spec: WindowSpec, starts) -> WindowBatch:
    """Gather p windows at latent-step ``starts`` (each a multiple of batch_dims)."""
    ke, b, d = spec.kernel_ext, spec.batch_dims, spec.flow_dims
    F = tables.feat.shape[1]

    def one(s):
        feats = jax.lax.dynamic_slice(tables.feat, (d * s, 0), (ke, F))
        mask = jax.lax.dynamic_slice(tables.mask, (0, s), (tables.mask.shape[0], b + 1))
        shift = jax.lax.dynamic_slice(tables.shift, (0, s), (tables.shift.shape[0], b + 1))
        binf = (
            jax.lax.dynamic_slice(tables.bin_feed, (0, s), (tables.bin_feed.shape[0], b))
            if tables.bin_feed is not None
            else None
        )
        dim1 = (
            jax.lax.dynamic_slice(tables.dim_one, (s,), (b + 1,))
            if tables.dim_one is not None
            else None
        )
        return feats, mask, shift, binf, dim1

    feats, mask, shift, binf, dim1 = jax.vmap(one)(jnp.asarray(starts, jnp.int32))
    return WindowBatch(feats, mask, shift, binf, dim1)


def stacked_window_bytes(tables: WindowTables, spec: WindowSpec) -> int:
    """HBM cost of materializing every aligned window once (see stack_windows)."""
    F = tables.feat.shape[1]
    d = tables.mask.shape[0]
    per_window = spec.kernel_ext * F + 2 * d * (spec.batch_dims + 1)
    if tables.bin_feed is not None:
        per_window += d * spec.batch_dims
    if tables.dim_one is not None:
        per_window += spec.batch_dims + 1
    return 4 * spec.num_windows * per_window


def stack_windows(tables: WindowTables, spec: WindowSpec) -> WindowBatch:
    """Materialize ALL aligned windows once: a WindowBatch whose leading axis
    is the window index (num_windows, ...).

    Window starts are always multiples of ``batch_dims`` (AR.py:257-260), so
    the per-step dynamic-slice gathers of ``gather_windows`` can be replaced
    by a single leading-axis take from this precomputed stack — measured 17%
    off the whole LV-partial train step on v5e (the five per-particle gathers
    were ~0.24 ms/step; a row take is one contiguous gather). Costs
    ``stacked_window_bytes`` of HBM (windows overlap by the flow context), so
    the engine only auto-enables it below a size threshold.
    """
    starts = jnp.asarray(spec.window_starts())
    return gather_windows(tables, spec, starts)


def make_stacked_gather(stacked: WindowBatch, batch_dims: int):
    """gather_fn over a precomputed window stack; ``starts`` stay latent-step
    offsets (multiples of batch_dims) so call sites are unchanged."""

    def gather(tables, spec, starts):
        del tables, spec
        idx = jnp.asarray(starts, jnp.int32) // batch_dims
        return WindowBatch(*(None if a is None else a[idx] for a in stacked))

    return gather


def _pad_to(row: np.ndarray, L: int) -> np.ndarray:
    assert len(row) <= L, (len(row), L)
    return np.concatenate([row, np.zeros(L - len(row))])


def ar1_tables(obs, obs_bin, time_till, kernel_len, no_flows, feat_window,
               batch_dims, x0):
    """1-D feature tables (AR.py:135-150)."""
    obs = np.asarray(obs, np.float64)
    T = len(obs)
    pad = no_flows * kernel_len + 1
    L = pad + T + 1
    cols = []
    for i in range(feat_window):
        cols.append(_pad_to(np.concatenate([np.zeros(pad - i), obs, np.zeros(i)]), L))
    cols.append(_pad_to(np.concatenate([np.ones(pad), np.zeros(T)]), L))       # context flag
    cols.append(_pad_to(np.concatenate([np.zeros(pad), np.arange(T + 1)]), L))  # abs time
    cols.append(_pad_to(np.concatenate(
        [np.arange(pad + time_till[0], time_till[0], -1), time_till]), L))     # time-till
    cols.append(_pad_to(np.concatenate([np.zeros(pad), obs_bin]), L))           # obs indicator
    feat = np.stack(cols, axis=1).astype(np.float32)
    mask = np.concatenate([np.zeros((1, 1)), np.ones((1, T))], axis=1).astype(np.float32)
    shift = np.concatenate([np.array([[x0]]), np.zeros((1, T))], axis=1).astype(np.float32)
    tables = WindowTables(
        feat=jnp.asarray(feat), mask=jnp.asarray(mask), shift=jnp.asarray(shift),
        bin_feed=None, dim_one=None,
    )
    spec = WindowSpec(
        kernel_ext=no_flows * kernel_len + batch_dims + 1,
        batch_dims=batch_dims, flow_dims=1, target_dims=T,
    )
    return tables, spec


def lv_tables(obs2, obs_bin2, time_till2, kernel_len, no_flows, feat_window,
              batch_dims, x0, dt, context_flag_in_pad=False, time_till_end=0.0,
              time_scale=1.0):
    """2-D interleaved tables (lotka_volterra_partial.py:188-204).

    ``context_flag_in_pad=False`` gives LV's convention (flag marks the
    target region); ``True`` gives FHN's inverted one (fitz_nag_NVP.py:197-198).
    ``time_till_end`` is 0.0 for LV, -dt for FHN (fitz_nag_NVP.py:193-194).

    ``time_scale`` rescales the absolute-time channel. The reference feeds
    raw time (``fitz_nag_NVP.py:191-192``), which reaches 1e5 at its headline
    T — through a lecun-init dense stack that puts conv outputs at ~1e5 and
    the SDE density at -1e20 with overflowing gradients (measured: training
    is frozen by the zeroed global-norm clip from step one). Passing
    ``1/T_real`` maps the channel to (0, 1]; a conditioning-feature rescale
    is a reparameterization of the first dense layer, so the variational
    family is unchanged. Off (1.0) by default for parity with existing
    checkpoints/golds.
    """
    obs2 = np.asarray(obs2, np.float64)
    d, target = obs2.shape
    assert d == 2
    obs_flat = np.reshape(obs2, -1, "F")  # interleaved (u0,v0,u1,v1,...)
    pad = no_flows * kernel_len + 2
    # FHN's time-till padding block has one extra interleaved pair (its
    # ``-dt`` arange endpoint, fitz_nag_NVP.py:193-194) — size the table to
    # the longest row; gathers never read past the reference slice extents.
    L = pad + 2 * target + (2 if time_till_end < 0.0 else 0)
    cols = []
    for i in range(0, feat_window * 5, 5):  # stride-5 lag shifts
        cols.append(_pad_to(np.concatenate([np.zeros(pad - i), obs_flat, np.zeros(i)]), L))
    if context_flag_in_pad:
        flag = np.concatenate([np.ones(pad), np.zeros(2 * target)])
    else:
        flag = np.concatenate([np.zeros(pad), np.ones(2 * target)])
    cols.append(_pad_to(flag, L))
    T_real = target * dt
    cols.append(_pad_to(np.concatenate(
        [np.zeros(pad),
         time_scale * np.repeat(np.arange(dt, T_real + dt / 2, dt),
                                2)[: 2 * target]]), L))
    # time-till: interleave the (2, .) padding block with the (2, target) data block
    ttp = np.arange(np.round(pad * (dt / 2), 1), time_till_end, -dt)
    ttp2 = np.tile(ttp, (2, 1))
    tt_full = np.concatenate([ttp2, np.asarray(time_till2, np.float64)], axis=1)
    cols.append(_pad_to(np.reshape(tt_full, -1, "F"), L))
    feat = np.stack(cols, axis=1).astype(np.float32)
    mask = np.concatenate([np.zeros((2, 1)), np.ones((2, target))], axis=1).astype(np.float32)
    shift = np.concatenate(
        [np.asarray(x0, np.float64)[:, None], np.zeros((2, target))], axis=1
    ).astype(np.float32)
    tables = WindowTables(
        feat=jnp.asarray(feat), mask=jnp.asarray(mask), shift=jnp.asarray(shift),
        bin_feed=jnp.asarray(np.asarray(obs_bin2, np.float32)), dim_one=None,
    )
    spec = WindowSpec(
        kernel_ext=no_flows * kernel_len + 2 * batch_dims + 2,
        batch_dims=batch_dims, flow_dims=2, target_dims=target,
    )
    return tables, spec


def series_tables(obs2, obs_bin2, time_till2, num_series, kernel_len, no_flows,
                  feat_window, x0, dt):
    """Per-series 2-D tables for the batched learn-theta pipeline.

    The terminal reference variant precomputes features for 1024 independent
    series and streams them through ``tf.data`` in batches of p
    (``..._learn_theta.py:256-314``); each "window" is a whole series
    (batch_dims == series length). Here the per-series tables stack on a
    leading series axis and ``gather_series`` picks a batch by index.

    Note: the reference slices its globally-flattened observation array at
    ``[2j : 2j + 2T]`` for series j (``..._learn_theta.py:264-266``), which
    strides across series boundaries for every j > 0 — an indexing bug that
    feeds misaligned feature windows. We slice each series' own block.
    """
    obs2 = np.asarray(obs2, np.float64)
    d, total = obs2.shape
    assert d == 2 and total % num_series == 0
    target = total // num_series
    per = []
    for j in range(num_series):
        sl = slice(j * target, (j + 1) * target)
        t, s = lv_tables(
            obs2[:, sl], obs_bin2[:, sl], time_till2[:, sl], kernel_len, no_flows,
            feat_window, target, x0=x0, dt=dt,
        )
        per.append(t)
    tables = WindowTables(
        feat=jnp.stack([t.feat for t in per]),
        mask=jnp.stack([t.mask for t in per]),
        shift=jnp.stack([t.shift for t in per]),
        bin_feed=jnp.stack([t.bin_feed for t in per]),
        dim_one=None,
    )
    spec = WindowSpec(
        kernel_ext=no_flows * kernel_len + 2 * target + 2,
        batch_dims=target, flow_dims=2, target_dims=target,
    )
    return tables, spec


def gather_series(tables: WindowTables, spec: WindowSpec, idx) -> WindowBatch:
    """Pick p whole-series windows by series index (leading table axis)."""
    take = lambda a: jnp.take(a, jnp.asarray(idx, jnp.int32), axis=0) if a is not None else None
    feats = take(tables.feat)
    return WindowBatch(
        feats=feats,
        mask=take(tables.mask),
        shift=take(tables.shift),
        bin_feed=take(tables.bin_feed),
        dim_one=take(tables.dim_one),
    )


def sv_tables(obs, kernel_len, no_flows, feat_window, batch_dims, x0, dt=1.0):
    """SV tables with rolling variance channels (SV_dense.py:159-184)."""
    obs = np.asarray(obs, np.float64)
    n = len(obs)          # series length (target + 1)
    target = n - 1
    pad = no_flows * kernel_len
    L = pad + n
    cols = []
    for i in range(0, feat_window * 5, 5):
        cols.append(_pad_to(np.concatenate([np.zeros(pad - i), obs, np.zeros(i)]), L))
    T_real = target * dt
    cols.append(_pad_to(np.concatenate(
        [np.zeros(pad + 1), np.arange(0.1, T_real + dt / 2, dt)[:target]]), L))
    var_store = np.array([np.var(obs[i : i + kernel_len]) for i in range(n - kernel_len)])
    cols.append(_pad_to(np.concatenate([np.zeros((no_flows + 1) * kernel_len), var_store]), L))
    obs_diff = obs[1:] - obs[:-1]
    vds = np.array(
        [np.var(obs_diff[i : i + kernel_len]) for i in range(len(obs_diff) - kernel_len)]
    )
    cols.append(_pad_to(np.concatenate(
        [np.zeros((no_flows + 1) * kernel_len), np.log(vds), np.zeros(1)]), L))
    feat = np.stack(cols, axis=1).astype(np.float32)
    mask = np.concatenate([np.zeros((1, 1)), np.ones((1, target))], axis=1).astype(np.float32)
    shift = np.concatenate([np.array([[x0]]), np.zeros((1, target))], axis=1).astype(np.float32)
    tables = WindowTables(
        feat=jnp.asarray(feat), mask=jnp.asarray(mask), shift=jnp.asarray(shift),
        bin_feed=None, dim_one=jnp.asarray(obs.astype(np.float32)),
    )
    spec = WindowSpec(
        kernel_ext=no_flows * kernel_len + batch_dims + 1,
        batch_dims=batch_dims, flow_dims=1, target_dims=target,
    )
    return tables, spec
