"""The VI training engine: one jitted train step + pre-train phase + loop.

Replaces the reference's host-feed ``VI_SSM.train`` loop (``AR.py:240-310``)
with a fully-compiled step: window sampling, feature gather, flow, ELBO,
gradients, Adamax update, metrics — a single XLA program. The host loop only
pumps steps and reads back metrics.

Supports particle-axis data parallelism: pass ``mesh`` + ``particle_axis`` to
shard the p particles across devices; gradients are averaged by XLA-inserted
collectives (the ``mean`` over particles spans the sharded axis).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional

import jax
import jax.flatten_util  # noqa: F401  (jnp-style namespace access below)
import jax.numpy as jnp
import numpy as np
import optax

from viforssms_tpu.core.config import VIConfig
from viforssms_tpu.data.features import WindowSpec, WindowTables
from viforssms_tpu.flows.nma import NMAFlowStack
from viforssms_tpu.inference.vi.adamax import adamax, clipped_adamax
from viforssms_tpu.inference.vi.elbo import compute_elbo
from viforssms_tpu.inference.vi.theta_flow import ThetaPosterior


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    pre_opt_state: Any
    key: jax.Array
    step: jax.Array


class StepMetrics(NamedTuple):
    elbo: jax.Array
    sde_lp: jax.Array
    obs_lp: jax.Array
    path_lq: jax.Array
    theta_lq: jax.Array
    prior_lp: jax.Array
    grad_norm: jax.Array


@dataclasses.dataclass
class VIEngine:
    """Builds and runs the compiled VI program for one (model, config, data)."""

    model: Any
    cfg: VIConfig
    tables: WindowTables
    spec: WindowSpec
    fix_theta_value: Optional[np.ndarray] = None
    theta_base_loc: float = 0.0
    theta_base_scale: float = 1.0
    use_norm: bool = False
    donate: bool = True
    mesh: Any = None          # optional jax.sharding.Mesh for particle DP
    particle_axis: str = "particles"
    # None = XLA default; "bfloat16" trades ~1e-3 relative matmul error for
    # ~1.4x on the conv-dominated step (measured on v5e) — safe for VI noise
    matmul_precision: Any = None
    # Precompute all aligned windows once and gather by row index per step
    # (features.stack_windows): ~17% off the LV-partial step on v5e. "auto"
    # enables it when the stack costs < stack_windows_max_bytes of HBM (long
    # series opt out — a 1e6-step FHN stack would be ~0.3 GB of overlap).
    stack_windows: Any = "auto"   # True | False | "auto"
    stack_windows_max_bytes: int = 128 * 1024 * 1024
    # PRNG implementation for all in-step randomness (None = key as passed,
    # usually threefry2x32). "rbg" trades threefry's splittability guarantees
    # for the TPU-native hardware generator: +1.4% on the LV-partial step
    # (docs/RESULTS.md). The impl travels inside the typed key, so every
    # split/sample downstream inherits it.
    prng_impl: Any = None
    # Sticking-the-landing (Roeder et al. 2017) for the theta term: evaluate
    # log q(theta) with STOPPED variational parameters so its score term
    # drops from the gradient — an unbiased, lower-variance estimator that is
    # exactly zero-variance when q(theta) hits the posterior. Costs one extra
    # (tiny) density pass per step. Path-space STL would need the NMA flow's
    # sequential inverse, so it is theta-only by design.
    theta_stl: bool = False
    # IWAE training (Burda et al. 2016): group the p particles into p/K
    # groups of K that share one window/series, and maximize the tighter
    # bound log(1/K sum_k w_k) per group instead of the per-particle ELBO.
    # Only meaningful when each particle's ELBO is a full log importance
    # weight — one window spanning the whole series, or series-mode tables
    # (inference/quality.py has the same requirement). 0/1 = standard ELBO.
    iw_k: int = 0
    # Skip updates with non-finite gradients (optax.apply_if_finite): a
    # FINITE-but-extreme ELBO can overflow in the backward pass, after which
    # the global-norm clip NaNs every parameter — nan_mask_loss cannot catch
    # it. Off by default (changes the optimizer-state pytree — not
    # checkpoint-compatible with existing states); used for cold wide-family
    # training (sv_fullpath_study --cold).
    skip_nonfinite_updates: bool = False

    def __post_init__(self):
        cfg = self.cfg
        self.flow = NMAFlowStack(
            network_dims=tuple(cfg.flow.network_dims),
            kernel_len=cfg.flow.kernel_len,
            no_flows=cfg.flow.no_flows,
            batch_dims=cfg.batch_dims,
            flow_dims=cfg.flow.flow_dims,
            use_norm=self.use_norm,
            mu_softplus=cfg.flow.mu_softplus,
            sigma_eps=cfg.flow.sigma_eps,
            aligned_feats=cfg.flow.aligned_feats_2d,
            out_init_zero=getattr(cfg.flow, "out_init_zero", False),
            fused_tail=cfg.flow.fused_tail,
            conv_mode=getattr(cfg.flow, "conv_mode", "conv"),
            compute_dtype=getattr(cfg.flow, "compute_dtype", "float32"),
            batched_feat_mlp=getattr(cfg.flow, "batched_feat_mlp", False),
            remat=cfg.flow.remat,
        )
        theta_cls = ThetaPosterior
        if getattr(cfg, "theta_flow_type", "maf") == "realnvp":
            from viforssms_tpu.inference.vi.theta_flow import RealNVPPosterior

            theta_cls = RealNVPPosterior
        self.theta_flow = theta_cls(
            dim=self.model.theta_dim,
            num_bijectors=cfg.theta_num_bijectors,
            hidden=tuple(cfg.theta_hidden),
            softplus=cfg.theta_softplus,
            base_loc=self.theta_base_loc,
            base_scale=self.theta_base_scale,
        )
        self.opt = clipped_adamax(
            learning_rate=cfg.train.learn_rate,
            beta1=cfg.train.beta1,
            beta2=cfg.train.beta2,
            grad_clip=cfg.train.grad_clip,
        )
        if self.skip_nonfinite_updates:
            self.opt = optax.apply_if_finite(self.opt,
                                             max_consecutive_errors=10_000)
        # separate optimizer instance for pre-training (AR.py:201-202);
        # flattened for the same per-leaf-op reason as clipped_adamax
        self.pre_opt = optax.flatten(adamax(
            learning_rate=cfg.train.pre_train_lr, beta1=cfg.train.pre_train_beta1
        ))
        # series mode: tables carry a leading series axis; "starts" are series
        # indices and each window is a whole series (..._learn_theta.py:305-314)
        self.series_mode = self.tables.feat.ndim == 3
        self.num_series = int(self.tables.feat.shape[0]) if self.series_mode else 0
        if self.iw_k > 1:
            if self.cfg.p % self.iw_k:
                raise ValueError(f"iw_k={self.iw_k} must divide p={self.cfg.p}")
            if not self.series_mode and (
                self.spec.num_windows != 1 or abs(self.cfg.elbo_scale - 1.0) > 1e-6
            ):
                raise ValueError(
                    "iw_k requires whole-series windows (batch_dims == T) or "
                    "series-mode tables: sub-window ELBOs are not importance "
                    "weights of a fixed joint"
                )
            if self.theta_stl:
                # The stopped-score trick is unbiased only for the K=1 ELBO;
                # applied to the IWAE bound it is biased (Tucker et al. 2018,
                # doubly-reparameterized gradients). Refuse the combination
                # rather than silently optimizing the wrong objective.
                raise ValueError(
                    "theta_stl with iw_k > 1 gives a biased gradient of the "
                    "IWAE bound (needs DReG weighting); set one or the other"
                )
        # with-replacement iff windows don't cover p draws (AR.py:257-260)
        self.replace = cfg.batch_dims * cfg.p >= self.spec.target_dims
        use = self.stack_windows and not self.series_mode
        if use and self.stack_windows == "auto":
            from viforssms_tpu.data.features import stacked_window_bytes

            use = stacked_window_bytes(self.tables, self.spec) <= self.stack_windows_max_bytes
        self._use_stacked = bool(use)
        self._stacked = self._make_stacked()
        self._build_steps()
        self._init_done = True

    def _make_stacked(self):
        if not getattr(self, "_use_stacked", False):
            return None
        from viforssms_tpu.data.features import stack_windows

        return tuple(stack_windows(self.tables, self.spec))

    def __setattr__(self, name, value):
        object.__setattr__(self, name, value)
        # hot-swapping tables (run_series_sweep reuses one engine across
        # same-shape series) must refresh the precomputed window stack, which
        # is passed into the compiled step as data (no recompilation)
        if name == "tables" and getattr(self, "_init_done", False):
            object.__setattr__(self, "_stacked", self._make_stacked())

    # ---- parameter init ----
    def init(self, key) -> TrainState:
        cfg = self.cfg
        if self.prng_impl is not None:
            n = jax.random.key_data(jax.random.key(0, impl=self.prng_impl)).shape[0]
            key = jax.random.wrap_key_data(
                jax.random.bits(key, (n,), jnp.uint32), impl=self.prng_impl
            )
        k1, k2, k3, k4 = jax.random.split(key, 4)
        z = jnp.zeros((cfg.p, self.spec.kernel_ext))
        feats = jnp.zeros((cfg.p, self.spec.kernel_ext, self.tables.feat.shape[-1]))
        theta0 = jnp.zeros((cfg.p, self.model.theta_dim))
        flow_params = self.flow.init(k1, z, feats, theta0)
        theta_params = self.theta_flow.init(k2, k3, cfg.p)
        params = {"flow": flow_params, "theta": theta_params}
        return TrainState(
            params=params,
            opt_state=self.opt.init(params),
            pre_opt_state=self.pre_opt.init(params),
            key=k4,
            step=jnp.zeros((), jnp.int32),
        )

    def init_replicated(self, key, num_replicas: int) -> TrainState:
        """Stacked :class:`TrainState` for ``num_replicas`` independent fits
        (leading replica axis on every leaf) — feed to
        ``train_many_replicated``. Each replica initializes from its own key,
        exactly as ``num_replicas`` separate ``init`` calls would."""
        states = [self.init(k) for k in jax.random.split(key, num_replicas)]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *states)

    def warm_init(self, key, params) -> TrainState:
        """Fresh optimizer/PRNG state around EXISTING parameters.

        The flow/theta parameter shapes depend only on the flow config and
        theta_dim — not on the series length — so a trained engine's params
        drop into any engine with the same ``FlowConfig``/model. Uses: online
        continuation when new observations extend the series (rebuild tables
        at the new T, keep the posterior), warm-started series sweeps
        (cli/experiments.py), and transfer across related series. Typically
        skips pre-training (the params are already in a finite basin). No
        reference counterpart (it rebuilds graphs cold per series,
        ``lotka_volterra_latest.py:627-715``).

        The params are COPIED: the train steps donate their input state
        (``VIEngine.donate``), and sharing buffers with the caller would let
        the first fit delete the caller's copy."""
        state = self.init(key)
        return state._replace(params=jax.tree.map(jnp.copy, params))

    # ---- core losses ----
    def _terms(self, params, key, starts, tables=None, stacked=None):
        tables = self.tables if tables is None else tables
        def flow_apply(z, feats, theta):
            return self.flow.apply(params["flow"], z, feats, theta)

        def theta_sample(k):
            # one theta per row of `starts` (usually cfg.p; exports batch more)
            theta, theta_lq = self.theta_flow.apply(
                params["theta"], k, starts.shape[0],
                method=type(self.theta_flow).sample_and_log_prob,
            )
            if self.theta_stl:
                # re-evaluate log q at the sampled theta with detached flow
                # params: gradients reach q only through the reparameterized
                # sample (the path derivative) — the STL estimator. The MAF
                # fixed-point solve is exact (strictly triangular), so the
                # value is unchanged; only the gradient differs.
                theta_lq = self.theta_flow.apply(
                    jax.lax.stop_gradient(params["theta"]), theta,
                    method=type(self.theta_flow).log_prob,
                )
            return theta, theta_lq

        shard_fn = None
        if self.mesh is not None:
            from viforssms_tpu.parallel.mesh import shard_leading

            shard_fn = lambda tree: shard_leading(self.mesh, tree, self.particle_axis)
        gather_fn = None
        if stacked is not None:
            from viforssms_tpu.data.features import WindowBatch, make_stacked_gather

            gather_fn = make_stacked_gather(WindowBatch(*stacked), self.cfg.batch_dims)
        if self.series_mode:
            from viforssms_tpu.data.features import gather_series

            gather_fn = gather_series
        return compute_elbo(
            self.model, flow_apply, theta_sample, key, tables, self.spec,
            starts, self.cfg.elbo_scale, fix_theta_value=self.fix_theta_value,
            shard_fn=shard_fn, gather_fn=gather_fn,
        )

    def _sample_starts(self, key):
        draws = self.cfg.p
        if self.iw_k > 1:
            # IWAE groups share one window/series: draw p/K starts, repeat K
            draws = self.cfg.p // self.iw_k
        if self.series_mode:
            n = self.num_series
            starts = jax.random.choice(key, n, shape=(draws,), replace=n < draws)
        else:
            n = self.spec.num_windows
            idx = jax.random.choice(key, n, shape=(draws,), replace=self.replace)
            starts = idx.astype(jnp.int32) * self.cfg.batch_dims
        if self.iw_k > 1:
            starts = jnp.repeat(starts, self.iw_k)
        return starts

    def _loss(self, params, key, starts, tables=None, stacked=None):
        t = self._terms(params, key, starts, tables, stacked)
        elbo = t.elbo
        if self.iw_k > 1:
            # per-group IWAE bound; groups are contiguous (starts repeat K)
            g = elbo.reshape(-1, self.iw_k)
            if self.cfg.train.nan_mask_loss:  # ..._learn_theta.py:482
                # A masked-to-0 particle would DOMINATE the group logsumexp
                # (real full-series ELBOs are large-negative), saturating the
                # bound at ~log K and zeroing every real particle's gradient.
                # Instead drop non-finite members from the group: -inf kills
                # their softmax weight, the log K divisor shrinks to the
                # survivor count, and an all-bad group contributes 0 (the
                # same neutral value the K=1 mask uses).
                finite = jnp.isfinite(g)
                n_ok = jnp.sum(finite, axis=1)
                g = jnp.where(finite, g, -jnp.inf)
                bound = jax.nn.logsumexp(g, axis=1) - jnp.log(
                    jnp.maximum(n_ok, 1).astype(elbo.dtype)
                )
                bound = jnp.where(n_ok > 0, bound, jnp.zeros_like(bound))
            else:
                bound = jax.nn.logsumexp(g, axis=1) - jnp.log(float(self.iw_k))
            loss = -jnp.mean(bound)
        else:
            if self.cfg.train.nan_mask_loss:  # ..._learn_theta.py:482
                elbo = jnp.where(jnp.isnan(elbo), jnp.zeros_like(elbo), elbo)
            loss = -jnp.mean(elbo)
        metrics_scale = self.cfg.elbo_scale
        metrics = StepMetrics(
            elbo=-loss,
            sde_lp=metrics_scale * jnp.mean(t.sde_lp),
            obs_lp=metrics_scale * jnp.mean(t.obs_lp),
            path_lq=metrics_scale * jnp.mean(t.path_lq),
            theta_lq=jnp.mean(t.theta_lq),
            prior_lp=jnp.mean(t.prior_lp),
            grad_norm=jnp.zeros(()),
        )
        return loss, metrics

    def _pre_loss(self, params, key, starts, tables=None, stacked=None):
        from viforssms_tpu.data.features import (
            WindowBatch,
            gather_series,
            gather_windows,
            make_stacked_gather,
        )
        from viforssms_tpu.inference.vi.elbo import obs_from_features

        tables = self.tables if tables is None else tables
        t = self._terms(params, key, starts, tables, stacked)
        if self.series_mode:
            gather = gather_series
        elif stacked is not None:
            gather = make_stacked_gather(WindowBatch(*stacked), self.cfg.batch_dims)
        else:
            gather = gather_windows
        batch = gather(tables, self.spec, starts)
        y, obs_mask = obs_from_features(self.model, batch, self.spec)
        return self.model.pretrain_loss(t.x, t.theta, y, obs_mask), t

    # ---- jitted steps ----
    def _build_steps(self):
        donate = (0,) if self.donate else ()

        def prec(f):
            if self.matmul_precision is None:
                return f
            def g(*a, **k):
                with jax.default_matmul_precision(self.matmul_precision):
                    return f(*a, **k)
            return g

        def train_at(state: TrainState, tables, stacked, starts, key, next_key):
            (loss, metrics), grads = jax.value_and_grad(self._loss, has_aux=True)(
                state.params, key, starts, tables, stacked
            )
            # one norm over the raveled vector: CSEs with the flat clip inside
            # the optimizer (per-leaf optax.global_norm was ~100 tiny reduces)
            gnorm = jnp.linalg.norm(jax.flatten_util.ravel_pytree(grads)[0])
            updates, opt_state = self.opt.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            metrics = metrics._replace(grad_norm=gnorm)
            return (
                TrainState(params, opt_state, state.pre_opt_state, next_key, state.step + 1),
                metrics,
            )

        def train_step(state: TrainState, tables, stacked):
            key, k_starts, k_elbo = jax.random.split(state.key, 3)
            starts = self._sample_starts(k_starts)
            return train_at(state, tables, stacked, starts, k_elbo, key)

        def train_step_at(state: TrainState, tables, stacked, starts):
            key, k_elbo = jax.random.split(state.key)
            return train_at(state, tables, stacked, starts, k_elbo, key)

        def pretrain_at(state: TrainState, tables, stacked, starts, key, next_key):
            (loss, t), grads = jax.value_and_grad(self._pre_loss, has_aux=True)(
                state.params, key, starts, tables, stacked
            )
            updates, pre_opt_state = self.pre_opt.update(
                grads, state.pre_opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
            # finite-path gate signal (lotka_volterra_partial.py:388-400)
            finite = jnp.all(jnp.isfinite(t.path_lq))
            return (
                TrainState(params, state.opt_state, pre_opt_state, next_key, state.step + 1),
                loss,
                finite,
            )

        def pretrain_step(state: TrainState, tables, stacked):
            key, k_starts, k_elbo = jax.random.split(state.key, 3)
            starts = self._sample_starts(k_starts)
            return pretrain_at(state, tables, stacked, starts, k_elbo, key)

        def pretrain_step_at(state: TrainState, tables, stacked, starts):
            key, k_elbo = jax.random.split(state.key)
            return pretrain_at(state, tables, stacked, starts, k_elbo, key)

        def train_many(state: TrainState, tables, stacked, num_steps: int):
            """num_steps training steps inside ONE compiled program (lax.scan):
            a single host dispatch regardless of chunk size — the device never
            waits on the host between steps (the reference crossed the
            host/device boundary twice per step, SURVEY.md §3.1)."""
            def body(s, _):
                s, m = train_step(s, tables, stacked)
                return s, m

            state, ms = jax.lax.scan(body, state, None, length=num_steps)
            return state, ms

        def pretrain_many(state: TrainState, tables, stacked, num_steps: int):
            def body(s, _):
                s, loss, finite = pretrain_step(s, tables, stacked)
                return s, (loss, finite)

            state, (losses, finites) = jax.lax.scan(body, state, None, length=num_steps)
            return state, losses, finites

        def train_epoch(state: TrainState, tables, stacked, idx_mat):
            """One pass over (B, p) series-index batches inside a single
            compiled scan (the tf.data epoch loop as one dispatch)."""
            def body(s, idx):
                s, m = train_step_at(s, tables, stacked, idx)
                return s, m

            state, ms = jax.lax.scan(body, state, idx_mat)
            return state, ms

        def pretrain_epoch(state: TrainState, tables, stacked, idx_mat):
            def body(s, idx):
                s, loss, finite = pretrain_step_at(s, tables, stacked, idx)
                return s, (loss, finite)

            state, (losses, finites) = jax.lax.scan(body, state, idx_mat)
            return state, losses, finites

        def train_epochs(state: TrainState, tables, stacked, idx_mat,
                         num_epochs: int):
            """MANY epochs in one compiled dispatch (nested scan).

            The tunneled accelerator costs ~25 ms of dispatch/queueing per
            device call (docs/RESULTS.md dispatch study); at the production
            learn-theta shape an epoch is only num_series/p batches (2 at
            the bench config), so the per-EPOCH dispatch of ``train_epoch``
            pays ~12.5 ms/step of pure tunnel tax — ~77% of the measured
            step. Scanning epochs amortizes it to nothing. Per-epoch mean
            ELBO (``..._learn_theta.py:713-717``) comes back as an array;
            metrics of the final batch of the final epoch as StepMetrics."""
            def epoch_body(s, _):
                def body(ss, idx):
                    ss, m = train_step_at(ss, tables, stacked, idx)
                    return ss, m

                s, ms = jax.lax.scan(body, s, idx_mat)
                return s, (jnp.mean(ms.elbo),
                           jax.tree.map(lambda a: a[-1], ms))

            state, (epoch_elbo, ms) = jax.lax.scan(
                epoch_body, state, None, length=num_epochs)
            return state, epoch_elbo, jax.tree.map(lambda a: a[-1], ms)

        def pretrain_epochs(state: TrainState, tables, stacked, idx_mat,
                            num_epochs: int):
            def epoch_body(s, _):
                s, losses, finites = pretrain_epoch(s, tables, stacked, idx_mat)
                return s, (losses[-1], jnp.all(finites))

            state, (losses, finites) = jax.lax.scan(
                epoch_body, state, None, length=num_epochs)
            return state, losses, finites

        def train_many_rep(states, tables, stacked, num_steps: int):
            """Replica-packed training: R independent fits (own params, opt
            state, PRNG stream) advance ``num_steps`` each inside ONE
            compiled program. The flow convs/matmuls then see R*p rows, so
            a reference-shaped config (p=50 < the 128 MXU lanes) fills the
            systolic array — the round-5 throughput lever for the LV-partial
            headline (VERDICT r4 item 4: the reference's seeds-2..5 sweeps
            ARE independent replicas, ``lotka_volterra_partial.py:467-477``).
            Tables are closed over (broadcast): replicas share the dataset
            and differ by PRNG stream, exactly like same-data multi-seed
            runs; per-replica datasets go through ``run_series_sweep``."""
            return jax.vmap(
                lambda s: train_many(s, tables, stacked, num_steps))(states)

        def train_many_rep_tables(states, tables, num_steps: int):
            """Replica-packed training with PER-REPLICA tables (leading
            replica axis on every table leaf): R different series train
            simultaneously — the reference's per-series sweep workload
            (``lotka_volterra_latest.py:627-715``) at R-fold batch width."""
            return jax.vmap(
                lambda s, t: train_many(s, t, None, num_steps))(states, tables)

        def pretrain_many_rep_tables(states, tables, num_steps: int):
            return jax.vmap(
                lambda s, t: pretrain_many(s, t, None, num_steps))(states, tables)

        _train_step = jax.jit(prec(train_step), donate_argnums=donate)
        _train_epoch = jax.jit(prec(train_epoch), donate_argnums=donate)
        _pretrain_epoch = jax.jit(prec(pretrain_epoch), donate_argnums=donate)
        _train_step_at = jax.jit(prec(train_step_at), donate_argnums=donate)
        _train_many = jax.jit(prec(train_many), static_argnums=3, donate_argnums=donate)
        _pretrain_step = jax.jit(prec(pretrain_step), donate_argnums=donate)
        _pretrain_step_at = jax.jit(prec(pretrain_step_at), donate_argnums=donate)
        _pretrain_many = jax.jit(prec(pretrain_many), static_argnums=3, donate_argnums=donate)
        _eval_terms = jax.jit(
            prec(lambda params, key, starts, tables, stacked: self._terms(
                params, key, starts, tables, stacked))
        )
        self.train_step = lambda state: _train_step(state, self.tables, self._stacked)
        self.train_step_at = lambda state, starts: _train_step_at(
            state, self.tables, self._stacked, starts)
        self.train_many = lambda state, n: _train_many(state, self.tables, self._stacked, n)
        _train_many_rep = jax.jit(prec(train_many_rep), static_argnums=3,
                                  donate_argnums=donate)
        self.train_many_replicated = lambda states, n: _train_many_rep(
            states, self.tables, self._stacked, n)
        _train_many_rep_t = jax.jit(prec(train_many_rep_tables),
                                    static_argnums=2, donate_argnums=donate)
        _pretrain_many_rep_t = jax.jit(prec(pretrain_many_rep_tables),
                                       static_argnums=2, donate_argnums=donate)
        self.train_many_replicated_tables = _train_many_rep_t
        self.pretrain_many_replicated_tables = _pretrain_many_rep_t
        self.pretrain_step = lambda state: _pretrain_step(state, self.tables, self._stacked)
        self.pretrain_many = lambda state, n: _pretrain_many(
            state, self.tables, self._stacked, n)
        _train_epochs = jax.jit(prec(train_epochs), static_argnums=4,
                                donate_argnums=donate)
        _pretrain_epochs = jax.jit(prec(pretrain_epochs), static_argnums=4,
                                   donate_argnums=donate)
        self.train_epoch = lambda state, idx: _train_epoch(
            state, self.tables, self._stacked, idx)
        self.pretrain_epoch = lambda state, idx: _pretrain_epoch(
            state, self.tables, self._stacked, idx)
        self.train_epochs = lambda state, idx, n: _train_epochs(
            state, self.tables, self._stacked, idx, n)
        self.pretrain_epochs = lambda state, idx, n: _pretrain_epochs(
            state, self.tables, self._stacked, idx, n)
        self.pretrain_step_at = lambda state, starts: _pretrain_step_at(
            state, self.tables, self._stacked, starts)
        self.eval_terms = lambda params, key, starts: _eval_terms(
            params, key, starts, self.tables, self._stacked)

    # ---- loops ----
    def pretrain(self, state: TrainState, num_steps: Optional[int] = None,
                 finite_gate: Optional[int] = None, log_every: int = 0,
                 logger=None, scan_chunk: int = 0):
        """Fixed-step pre-train (AR.py:290-298) or consecutive-finite gate
        (lotka_volterra_partial.py:388-400). ``scan_chunk > 0`` runs chunks of
        that many steps per device dispatch (remote-device friendly); the
        finite gate is then evaluated from the chunk's per-step flags."""
        num_steps = num_steps if num_steps is not None else self.cfg.train.pre_train_steps
        consec = 0
        i = 0
        while True:
            if scan_chunk > 0:
                state, losses, finites = self.pretrain_many(state, scan_chunk)
                loss = float(losses[-1])
                i += scan_chunk
                fl = np.asarray(finites)
                run = 0
                for f in fl[::-1]:
                    if not f:
                        break
                    run += 1
                consec = consec + run if run == len(fl) else run
            else:
                state, loss, finite = self.pretrain_step(state)
                i += 1
                if finite_gate is not None:
                    consec = consec + 1 if bool(finite) else 0
            if logger is not None and log_every and i % max(log_every, 1) < (scan_chunk or 1):
                logger.write(int(state.step), {"pretrain_loss": float(loss)})
            if finite_gate is not None:
                if consec >= finite_gate or i >= 20 * finite_gate:
                    break
            elif i >= num_steps:
                break
        return state

    def fit(self, state: TrainState, num_steps: int, logger=None, log_every: int = 50,
            checkpointer=None, scan_chunk: int = 0, should_stop=None):
        """Python-loop training; ``scan_chunk > 0`` dispatches chunks of that
        many compiled steps at a time (one host round-trip per chunk).

        ``should_stop``: optional zero-arg callable checked at every dispatch
        boundary — the preemption hook (SURVEY.md §5 failure detection): a
        SIGTERM handler sets a flag, training exits cleanly at the next
        boundary, and the caller checkpoints the returned state."""
        last = None
        if scan_chunk > 0:
            done = 0
            while done < num_steps:
                if should_stop is not None and should_stop():
                    break
                n = min(scan_chunk, num_steps - done)
                state, ms = self.train_many(state, n)
                last = jax.tree.map(lambda a: a[-1], ms)
                done += n
                if logger is not None:
                    logger.write(int(state.step), metrics_to_dict(last))
                if checkpointer is not None and self.cfg.train.checkpoint_every and (
                    done % self.cfg.train.checkpoint_every < n
                ):
                    checkpointer.save(state)
            return state, last
        for i in range(num_steps):
            if should_stop is not None and should_stop():
                break
            state, metrics = self.train_step(state)
            last = metrics
            if logger is not None and (i % log_every == 0 or i == num_steps - 1):
                logger.write(int(state.step), metrics_to_dict(metrics))
            if checkpointer is not None and self.cfg.train.checkpoint_every and (
                (i + 1) % self.cfg.train.checkpoint_every == 0
            ):
                checkpointer.save(state)
        return state, last

    def fit_epochs(self, state: TrainState, num_epochs: int, pre_train_epochs: int = 0,
                   logger=None, checkpointer=None, checkpoint_every: int = 100,
                   should_stop=None, scan_epochs: int = 0):
        """Epoch training over the series axis: each epoch iterates all series
        in deterministic batches of p (the tf.data loop of
        ``..._learn_theta.py:602-731``). Requires series-mode tables.

        ``scan_epochs > 1`` runs that many epochs per device dispatch
        (``train_epochs`` nested scan) — the production setting on a
        tunneled accelerator, where per-dispatch overhead otherwise
        dominates a 2-batch epoch (docs/RESULTS.md dispatch study);
        logging/checkpoint cadence then applies per chunk."""
        assert self.series_mode, "fit_epochs requires series-axis tables"
        p = self.cfg.p
        group = self.iw_k if self.iw_k > 1 else 1
        per = p // group  # distinct series per batch (repeated K-fold for IWAE)
        batches = [
            np.repeat(np.arange(i, i + per, dtype=np.int32), group)
            for i in range(0, self.num_series - per + 1, per)
        ]
        idx_mat = jnp.asarray(np.stack(batches))  # (B, p)
        last = None
        epoch = 0
        while epoch < num_epochs:
            if should_stop is not None and should_stop():
                break
            pre = epoch < pre_train_epochs
            rec = {"epoch": epoch, "pretrain": float(pre)}
            phase_end = pre_train_epochs if pre else num_epochs
            n = (min(scan_epochs, phase_end - epoch)
                 if scan_epochs and scan_epochs > 1 else 1)
            if pre:
                if n > 1:
                    state, losses, _ = self.pretrain_epochs(state, idx_mat, n)
                else:
                    state, losses, _ = self.pretrain_epoch(state, idx_mat)
                rec["pretrain_loss"] = float(losses[-1])
            elif n > 1:
                state, epoch_elbo, last = self.train_epochs(state, idx_mat, n)
                rec["epoch_ELBO"] = float(epoch_elbo[-1])
            else:
                state, ms = self.train_epoch(state, idx_mat)
                last = jax.tree.map(lambda a: a[-1], ms)
                rec["epoch_ELBO"] = float(jnp.mean(ms.elbo))  # ..._learn_theta.py:713-717
            epoch += n
            if logger is not None:
                logger.write(int(state.step), rec)
            if checkpointer is not None and (
                    epoch % checkpoint_every < n or n >= checkpoint_every):
                checkpointer.save(state)
        return state, last

    def sample_series_paths(self, params, key):
        """Posterior paths for every series (..._learn_theta.py:745-775):
        returns (num_series, flow_dims, target_dims)."""
        assert self.series_mode
        p = self.cfg.p
        outs = []
        for i in range(0, self.num_series - p + 1, p):
            key, sub = jax.random.split(key)
            idx = jnp.arange(i, i + p, dtype=jnp.int32)
            t = self.eval_terms(params, sub, idx)
            outs.append(np.asarray(t.x[..., 1:]))
        return np.concatenate(outs, axis=0)

    # ---- inference/export ----
    def sample_posterior_paths(self, params, key, max_rows: int = 8192):
        """Stitch full-length posterior paths from all windows (AR.py:323-362).

        Windows x particles evaluate in batched dispatches of at most
        ``max_rows`` rows (one dispatch for typical series; chunked for very
        long ones — a 1e6-step FHN series has 20k windows, far beyond one
        program's memory). Chunks share one compiled shape (the last chunk is
        padded with repeats and trimmed). With a mesh attached the rows shard
        over the particle axis."""
        assert not self.series_mode, "use sample_series_paths for series-mode tables"
        ws = self.spec.window_starts()
        p = self.cfg.p
        wpc = max(1, min(len(ws), max_rows // p))  # windows per chunk
        outs = []
        for c0 in range(0, len(ws), wpc):
            chunk = ws[c0 : c0 + wpc]
            n_real = len(chunk)
            if n_real < wpc:  # pad to the compiled shape
                chunk = np.concatenate([chunk, np.repeat(chunk[-1:], wpc - n_real)])
            starts = jnp.asarray(np.repeat(chunk, p), jnp.int32)
            key, sub = jax.random.split(key)
            t = self.eval_terms(params, sub, starts)
            x = np.asarray(t.x).reshape(wpc, p, *t.x.shape[1:])
            outs.extend(x[i][..., 1:] for i in range(n_real))
        return np.concatenate(outs, axis=-1)

    def estimate_elbo(self, params, key, num_draws: int = 20):
        """Low-variance ELBO estimate averaged over fresh windows/noise draws
        (the reference's commented-out ``ELBO_estimate``,
        ``lotka_volterra_partial.py:524``). Returns (mean, std-error)."""
        vals = []
        for _ in range(num_draws):
            key, k1, k2 = jax.random.split(key, 3)
            starts = self._sample_starts(k1)
            t = self.eval_terms(params, k2, starts)
            vals.append(float(jnp.mean(t.elbo)))
        vals = np.asarray(vals)
        return float(vals.mean()), float(vals.std() / np.sqrt(len(vals)))

    def sample_theta(self, params, key, n):
        """Draw n theta samples from q(theta) (SV_dense.py:458-459)."""
        chunks = []
        remaining = n
        while remaining > 0:
            key, sub = jax.random.split(key)
            m = min(remaining, 8192)
            th, _ = self.theta_flow.apply(
                params["theta"], sub, m, method=type(self.theta_flow).sample_and_log_prob
            )
            chunks.append(np.asarray(th))
            remaining -= m
        return np.concatenate(chunks, axis=0)


def metrics_to_dict(m: StepMetrics) -> dict:
    """Metric names mirror the reference's TensorBoard scalars (AR.py:206-215)."""
    return {
        "ELBO": float(m.elbo),
        "SDE_log_prob": float(m.sde_lp),
        "obs_log_prob": float(m.obs_lp),
        "path_log_prob": float(m.path_lq),
        "theta_log_prob": float(m.theta_lq),
        "prior_log_prob": float(m.prior_lp),
        "global_norm": float(m.grad_norm),
    }
