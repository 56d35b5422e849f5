"""Full-path sequence-sharded ELBO training — the CP analog for long series.

The reference trains long series (FHN: 1e6 latent steps,
``fitz_nag_NVP.py:456-457``) by sampling random sub-windows on one device with
the ``T/batch_dims`` ELBO rescaling. Because the NMA flow is local, there is a
second, TPU-native regime this module provides: shard the TIME axis of the
ENTIRE path across the mesh and optimize the EXACT full-path ELBO — no window
subsampling, no rescaling variance. Per step:

  * base noise + aligned features halo-exchange ``no_flows*kernel_len``
    positions once (ring ``ppermute`` over ICI, ``parallel/halo.py``); the
    global left edge (device 0) is conditioned on the feature table's real
    padding block and free context noise, matching the windowed path;
  * each device runs the ordinary flow stack on its chunk
    (``flows/sharded.py`` layout);
  * the model's elementwise path transform runs locally; the TRANSFORMED
    state then halo-exchanges ``flow_dims`` positions so every device owns
    the (x_{t-1}, x_t) pairs that cross its left boundary (device 0 uses x0);
  * transition/observation/path-density terms reduce with ``psum``; theta
    terms are replicated over the sequence axis and shard over the particle
    axis of a 2-D (particles x sequence) mesh.

The result equals the unsharded full-path ELBO exactly (tests); gradients
flow through ``ppermute``/``psum`` (their transposes are inserted by JAX), so
one ``jax.grad`` + Adamax step trains across the slice.

:class:`SequenceVIEngine` is the product path: built from the SAME
``(model, cfg, tables, spec)`` as the windowed :class:`~viforssms_tpu.
inference.vi.train.VIEngine`, it derives the full-path arrays from the
feature tables, supports pre-training (finite gates), scan-chunked fits,
checkpointing, metrics, and SV's observed-dim injection
(``SV_dense.py:193-194,245-246``), over a 1-D ``(sequence,)`` or 2-D
``(particles, sequence)`` mesh.

Restriction: 2-D flows need aligned features (the reference's transposed
projection is global over the window — ``flows/sharded.py``). Series-mode
learn-theta stays on the windowed engine (each series IS one window).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from viforssms_tpu.core.config import VIConfig
from viforssms_tpu.data.features import WindowSpec, WindowTables
from viforssms_tpu.flows.nma import NMAFlowStack
from viforssms_tpu.parallel.halo import halo_exchange_left


def dreg_theta_mix(theta, w_tilde):
    """Per-sample gradient-reweighted theta for the DReG estimator.

    Value-identity (returns exactly ``theta``) whose tangent w.r.t. the
    theta-flow parameters is scaled per-sample by ``w_tilde``. Feeding the
    result through the log-weight computation under a ``stop_gradient``-ed
    theta-flow density and weighting the result by ``stop_gradient(w_tilde)``
    yields the doubly-reparameterized (DReG, Tucker et al. 2019) gradient
    w_tilde^2 * d(log w)/d(theta) * d(theta)/d(phi) for the theta-flow
    parameters in ONE backward pass, while every other parameter group sees
    the plain-IWAE w_tilde weighting."""
    sg = jax.lax.stop_gradient
    return sg(theta) + sg(w_tilde)[:, None] * (theta - sg(theta))


def masked_group_logsumexp(vals, group, nan_mask):
    """log-mean-exp over trailing groups of size ``group``.

    With ``nan_mask`` non-finite members are dropped from their group and
    the count adjusts (the windowed engine's IWAE convention, ``train.py``
    iw_k path); an all-non-finite group yields -inf WITHOUT poisoning
    gradients (the usual logsumexp-at-(-inf) NaN cotangent is avoided by
    hand-rolling the max-shift with a clamped log)."""
    g = vals.reshape(-1, group)
    if nan_mask:
        finite = jnp.isfinite(g)
        n_ok = jnp.sum(finite, axis=1)
        g = jnp.where(finite, g, -jnp.inf)
    else:
        n_ok = jnp.full(g.shape[0], group)
    gmax = jax.lax.stop_gradient(jnp.max(g, axis=1))
    gmax = jnp.where(jnp.isfinite(gmax), gmax, 0.0)
    s = jnp.sum(jnp.exp(g - gmax[:, None]), axis=1)
    tiny = jnp.asarray(np.finfo(np.float32).tiny, vals.dtype)
    out = (jnp.log(jnp.maximum(s, tiny)) + gmax
           - jnp.log(jnp.maximum(n_ok, 1).astype(vals.dtype)))
    # an all-(-inf) group (every member diverged, with OR without the nan
    # mask) is -inf, not log(tiny) (review r4: the old logsumexp surfaced
    # such groups as an inf loss; the clamped log must not silently
    # launder them into a finite bound) — the where keeps gradients clean
    return jnp.where((n_ok > 0) & (s > 0), out, -jnp.inf), n_ok


class SeqELBOTerms(NamedTuple):
    elbo: jax.Array      # (p,)
    sde_lp: jax.Array    # (p,)
    obs_lp: jax.Array    # (p,)
    path_lq: jax.Array   # (p,)
    x: jax.Array         # (p, d, T) transformed full path (time-sharded)


def _local_flow(flow: NMAFlowStack, local: int) -> NMAFlowStack:
    return NMAFlowStack(
        network_dims=flow.network_dims,
        kernel_len=flow.kernel_len,
        no_flows=flow.no_flows,
        batch_dims=local // flow.flow_dims,
        flow_dims=flow.flow_dims,
        use_norm=flow.use_norm,
        mu_softplus=flow.mu_softplus,
        sigma_eps=flow.sigma_eps,
        aligned_feats=flow.aligned_feats,
        out_init_zero=flow.out_init_zero,
        fused_tail=flow.fused_tail,
        conv_mode=flow.conv_mode,
        compute_dtype=flow.compute_dtype,
        batched_feat_mlp=flow.batched_feat_mlp,
        remat=flow.remat,
    )


def sequence_sharded_elbo(model, flow: NMAFlowStack, params, z, feats, y,
                          obs_mask, theta, x0, mesh, axis: str = "sequence",
                          *, particle_axis: Optional[str] = None,
                          edge_feats=None, z_ctx=None, dim_one=None,
                          mean_offset=None):
    """Exact full-path ELBO path terms with the time axis sharded.

    z: (p, L_total) base noise, L_total = flow_dims * T;
    feats: (p, L_total, F) per-particle OR (L_total, F) shared aligned
    features (shared features ride the sequence axis only — no p-fold HBM);
    y/obs_mask: per-particle (p, T) / (p, 2, T) or shared (T,) / (2, T);
    theta: (p, D); x0: scalar or (flow_dims,) initial state.

    Keyword extensions (the product-engine path):
      * ``particle_axis`` — also shard the leading p axis over this mesh axis
        (2-D particles x sequence composition);
      * ``edge_feats`` — (context, F) real feature rows conditioning device
        0's halo (the table's padding block) instead of zeros;
      * ``z_ctx`` — (p, context) free context noise for device 0 (the
        windowed base dist's uncounted context columns, ``AR.py:31-35``);
      * ``dim_one`` — (T + 1,) observed series for SV's injected dim
        (``SV_dense.py:245-246``): the flow samples the 1-D latent, the model
        path is assembled as [observed; latent].
      * ``mean_offset`` — (d, T) learned per-coordinate mean shift added to
        the raw (pre-transform) flow sample. A constant shift leaves
        ``log q`` invariant (pushforward under translation), so no density
        correction is owed. Round-5 family extension: the lv_partial
        translation probe (``scripts/lv_path_floor.py``) measured that the
        exact full-path ELBO PREFERS the gold-shifted mean by ~1.7 nats —
        a per-position mean the conv flow (which shares weights across
        positions) cannot express on its own.

    Returns :class:`SeqELBOTerms` WITHOUT the theta/prior terms (caller adds
    them; they are particle-local).
    """
    assert flow.flow_dims == 1 or flow.aligned_feats, (
        "sequence sharding requires aligned features for 2-D flows"
    )
    d = flow.flow_dims
    observed_dim = bool(getattr(model, "observed_dim", False)) and dim_one is not None
    context = flow.no_flows * flow.kernel_len
    n = mesh.shape[axis]
    p, L_total = z.shape
    assert L_total % n == 0 and (L_total // n) % d == 0, (L_total, n, d)
    local = L_total // n
    lflow = _local_flow(flow, local)
    d_model = 2 if observed_dim else d
    if observed_dim:
        x0_vec = jnp.stack([jnp.asarray(dim_one[0], z.dtype),
                            jnp.asarray(x0, z.dtype).reshape(())])
    else:
        x0_vec = jnp.broadcast_to(jnp.asarray(x0, z.dtype).reshape(-1), (d,))
    shared_feats = feats.ndim == 2
    shared_obs = y.ndim == (1 if d == 1 else 2)
    edge_feats_t = None if edge_feats is None else jnp.asarray(edge_feats).T
    pa = particle_axis

    def run_local(z_c, f_c, th, y_c, m_c, zc_c, d1_c, off_c):
        pl = z_c.shape[0]  # local particle count (p / mesh.shape[pa])
        # flow over [left-halo | my chunk]; device 0's halo carries the
        # table's padding features + free context noise
        z_ext = halo_exchange_left(z_c, context, axis, edge=zc_c)
        if shared_feats:
            f_ext1 = halo_exchange_left(f_c.T, context, axis, edge=edge_feats_t)
            f_ext = jnp.broadcast_to(
                jnp.transpose(f_ext1)[None], (pl,) + f_ext1.T.shape)
        else:
            f_ext = jnp.moveaxis(
                halo_exchange_left(jnp.moveaxis(f_c, 1, 2), context, axis,
                                   edge=edge_feats_t), 2, 1)
        x_raw, lq = lflow.apply(params, z_ext, f_ext, th)   # (pl, local), (pl,)

        W = local // d
        if d == 1:
            raw = x_raw[:, None, :]                          # (pl, 1, W)
        else:
            raw = jnp.transpose(x_raw.reshape(pl, W, d), (0, 2, 1))
        if off_c is not None:
            raw = raw + off_c[None]     # translation: log q invariant
        if observed_dim:
            # SV: inject the observed dim above the sampled latent
            obs_body = jnp.broadcast_to(d1_c[None, None, :], (pl, 1, W))
            body = jnp.concatenate([obs_body, raw], axis=1)  # (pl, 2, W)
        elif model.uses_mask_shift:
            # elementwise transform on local positions; the dummy first
            # column (masked to 0, shifted by 0) is discarded below
            raw_ext = jnp.concatenate(
                [jnp.zeros((pl, d, 1), raw.dtype), raw], axis=2)
            mask = jnp.ones((pl, d, W + 1), raw.dtype).at[:, :, 0].set(0.0)
            shift = jnp.zeros((pl, d, W + 1), raw.dtype)
            x_t, log_det = model.transform_path(raw_ext, mask, shift)
            body = x_t[:, :, 1:]                             # (pl, d, W)
            lq = lq + log_det
        else:
            body = raw

        # edge state: left neighbor's last (transformed) state; x0 on device 0
        flat = jnp.transpose(body, (0, 2, 1)).reshape(pl, d_model * W)
        ext = halo_exchange_left(flat, d_model, axis, edge=x0_vec)
        x_full = jnp.transpose(ext.reshape(pl, W + 1, d_model), (0, 2, 1))
        if d_model == 1:
            x_full = x_full[:, 0, :]                         # (pl, W+1)

        if shared_obs:
            y_b = jnp.broadcast_to(y_c[None], (pl,) + y_c.shape)
            m_b = jnp.broadcast_to(m_c[None], (pl,) + m_c.shape)
        else:
            y_b, m_b = y_c, m_c
        sde = model.transition_log_prob(x_full, th)
        obs = model.observation_log_prob(x_full, y_b, m_b, th)
        return (
            jax.lax.psum(sde, axis),
            jax.lax.psum(obs, axis),
            jax.lax.psum(lq, axis),
            body if d_model > 1 else body[:, 0, :],
        )

    if shared_obs:
        y_spec = P(axis) if d == 1 else P(None, axis)
    else:
        y_spec = P(pa, axis) if d == 1 else P(pa, None, axis)
    x_spec = P(pa, axis) if d_model == 1 else P(pa, None, axis)
    f_spec = P(axis, None) if shared_feats else P(pa, axis, None)
    zc_spec = None if z_ctx is None else P(pa, None)
    d1_spec = None if dim_one is None else P(axis)
    d1_body = None if dim_one is None else dim_one[1:]
    off_spec = None if mean_offset is None else P(None, axis)
    f = jax.shard_map(
        run_local,
        mesh=mesh,
        in_specs=(P(pa, axis), f_spec, P(pa, None), y_spec, y_spec,
                  zc_spec, d1_spec, off_spec),
        out_specs=(P(pa), P(pa), P(pa), x_spec),
    )
    sde, obs, lq, x = f(z, feats, theta, y, obs_mask, z_ctx, d1_body,
                        mean_offset)
    elbo = sde - lq + obs
    return SeqELBOTerms(elbo, sde, obs, lq, x)


class SeqTrainState(NamedTuple):
    params: dict
    opt_state: tuple
    key: jax.Array
    step: jax.Array


def make_sequence_train_step(model, flow: NMAFlowStack, opt, mesh,
                             axis: str = "sequence", x0=0.0,
                             theta_flow=None, fix_theta_value=None):
    """Build a jitted full-path train step over a time-sharded mesh.

    ``params`` is {"flow": ..., "theta": ...} (theta entry absent/ignored
    when ``fix_theta_value`` is given). Data args (feats, y, obs_mask) are
    closed over by the caller per dataset and passed per call (static shapes
    -> one compilation)."""
    from viforssms_tpu.inference.vi.theta_flow import ThetaPosterior

    z_sharding = NamedSharding(mesh, P(None, axis))

    def loss_fn(params, key, feats, y, obs_mask):
        p = feats.shape[0]
        L_total = feats.shape[1]
        k_t, k_z = jax.random.split(key)
        if fix_theta_value is not None:
            theta = jnp.tile(jnp.asarray(fix_theta_value)[None, :], (p, 1))
            theta_lq = jnp.zeros(p, theta.dtype)
            prior = jnp.zeros(p, theta.dtype)
        else:
            theta, theta_lq = theta_flow.apply(
                params["theta"], k_t, p,
                method=ThetaPosterior.sample_and_log_prob)
            prior = model.log_prior(theta)
        z = jax.lax.with_sharding_constraint(
            jax.random.normal(k_z, (p, L_total)), z_sharding)
        t = sequence_sharded_elbo(model, flow, params["flow"], z, feats, y,
                                  obs_mask, theta, x0, mesh, axis)
        elbo = t.elbo + prior - theta_lq
        return -jnp.mean(elbo), t

    @jax.jit
    def train_step(state: SeqTrainState, feats, y, obs_mask):
        key, sub = jax.random.split(state.key)
        (loss, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, sub, feats, y, obs_mask)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return SeqTrainState(params, opt_state, key, state.step + 1), loss, terms

    return train_step


# ---------------------------------------------------------------------------
# Product engine
# ---------------------------------------------------------------------------

def _singleton_mesh(particle_axis: str, sequence_axis: str) -> Mesh:
    dev = np.asarray(jax.devices()[:1]).reshape(1, 1)
    return Mesh(dev, (particle_axis, sequence_axis))


@dataclasses.dataclass
class SequenceVIEngine:
    """Full-path sequence-sharded VI training as a first-class engine.

    Drop-in sibling of the windowed :class:`VIEngine`: same constructor
    family ``(model, cfg, tables, spec)``, same :class:`TrainState` layout
    (checkpoint-compatible), same ``pretrain``/``fit`` loop semantics — but
    each step optimizes the EXACT full-path ELBO with the time axis sharded
    over ``mesh``'s ``sequence`` axis and particles over its ``particles``
    axis (either axis may be size 1; ``mesh=None`` builds a single-device
    1x1 mesh so one compiled program serves every topology).

    Full-path arrays are derived from the SAME feature tables the windowed
    engine uses: for latent position t the aligned feature row is
    ``tables.feat[offset + t]`` with ``offset = kernel_ext - flow_dims *
    batch_dims`` (the windowed gather's target alignment,
    ``data/features.gather_windows``); device 0's halo is conditioned on the
    table's real padding block (``AR.py:137-150`` semantics) plus free
    context noise, so the full-path variational family matches the windowed
    family at window 0 rather than a zero-padded approximation.
    """

    model: Any
    cfg: VIConfig
    tables: WindowTables
    spec: WindowSpec
    mesh: Optional[Mesh] = None
    particle_axis: str = "particles"
    sequence_axis: str = "sequence"
    fix_theta_value: Optional[np.ndarray] = None
    theta_base_loc: float = 0.0
    theta_base_scale: float = 1.0
    use_norm: bool = False
    donate: bool = True
    matmul_precision: Any = None
    # IWAE training (Burda et al. 2016): every full-path particle's ELBO is a
    # complete log importance weight of the joint (theta, x_{1:T}) — the
    # windowed engine's whole-series restriction is satisfied by
    # construction here — so groups of K particles maximize the tighter
    # log(1/K sum w_k) bound. 0/1 = standard ELBO.
    iw_k: int = 0
    # Training objective (round 4; docs/KNOWN_GAPS.md round-3 escape routes):
    #   "elbo"  — standard reverse-KL ELBO (iw_k>1 upgrades it to "iwae" for
    #             back-compat with the round-3 studies);
    #   "iwae"  — plain-gradient IWAE over iw_k-groups (round-3 production);
    #   "dreg"  — the same IWAE bound with DOUBLY-REPARAMETERIZED gradients
    #             for the theta-flow parameters (Tucker et al. 2019): the
    #             high-variance score term is removed and the pathwise term
    #             is w^2-weighted, so k can scale far past 25 without the
    #             theta-gradient SNR collapse that stalled round 3. Costs a
    #             second (no-grad) forward pass per step.
    #   "rws"   — reweighted wake-sleep wake-phase theta update (forward
    #             KL): theta-flow parameters maximize the self-normalized
    #             importance-weighted log-density of their own samples
    #             (mass-covering, directly attacks reverse-KL mean bias)
    #             while the path flow trains on the IWAE bound at stopped
    #             theta samples.
    objective: str = "elbo"
    # Paths per theta (>1 = marginalized weights): each theta is scored by
    # log(1/M sum_j p(y, x_j, th)/q(x_j|th)) over M path draws — a
    # Rao-Blackwellized theta weight whose variance drops with M. This is
    # the lever against the PSIS k_hat ~ 2.1 joint-weight degeneracy
    # (round-3 KNOWN_GAPS): the path-space noise that swamped per-particle
    # weights is averaged out BEFORE theta-level normalization.
    inner_m: int = 1
    # "rws" proposal widening: theta sampled from the flow with base scale
    # inflated by this factor (weights use the widened proposal's own
    # density, so they stay exact); lets the wake update see — and move
    # mass toward — regions beyond the current posterior's reach.
    theta_widen: float = 1.0
    # "rws" truncated self-normalized weights (Ionides 2008 style): cap raw
    # weights at rws_clip * mean(weight) before normalizing (0 = off).
    # Bounds the worst-case single-sample pull at the cost of some bias.
    rws_clip: float = 0.0
    # Mask ALL theta-flow parameter updates (path-only fine-tuning, e.g.
    # re-matching the path flow to a theta posterior that was refit
    # externally — inference/vi/theta_refit.py). Changes the optimizer
    # pytree (chained mask), so restore warm params into a fresh opt state.
    freeze_theta: bool = False
    # "rws" adaptive weight TEMPERING (0 = off): rescale centered
    # log-weights by beta = min(1, target_sd / sd(log w)) before
    # normalizing. Measured necessity: even marginalized (inner_m=8)
    # full-path weights have PSIS k_hat ~ 1.97 / ESS ~ 2 per 1000 at the SV
    # config — untempered wake updates would chase single extreme path
    # draws. Tempering targets the geometric bridge q^(1-beta) p^beta each
    # step; iterating the wake update still has q = p as its fixed point
    # (at q = p the weights are uniform), it just converges damped — each
    # step now runs at a controlled effective ESS. 1.5-2.5 are sane
    # targets.
    rws_target_sd: float = 0.0
    # Learned per-coordinate mean offset (d, T) added to the raw
    # (pre-transform) path sample — a translation, so log q is invariant.
    # Round-5 family extension: the conv flow shares weights across
    # positions and cannot express an arbitrary per-position mean; the
    # lv_partial translation probe measured the exact ELBO preferring the
    # gold-shifted mean by ~1.7 nats (scripts/lv_path_floor.py). Changes
    # the params pytree (adds "offset") — not checkpoint-compatible with
    # False.
    learn_mean_offset: bool = False
    # Multiplier on the offset's UPDATES (post-Adamax, so it acts as a
    # per-subtree learning rate — Adamax itself is gradient-scale
    # invariant). The offset's ELBO signal is ~nats over 2T coordinates
    # (wide flat basin): at the shared 1e-3 step it random-walks instead of
    # descending. Measured: 60k steps left the probe's +1.7 nats unclaimed.
    offset_update_scale: float = 1.0
    # Skip parameter updates whose gradients are non-finite (optax.
    # apply_if_finite). Cold full-path training can produce a single inf
    # gradient from an extreme-tail particle (a full-path SDE term is ~T/b
    # windowed terms in one number); the global-norm clip then yields
    # NaN * params and the run is dead — nan_mask_loss cannot catch a
    # FINITE-but-extreme ELBO whose gradient overflows. Changes the
    # optimizer-state pytree (not checkpoint-compatible with False).
    skip_nonfinite_updates: bool = False

    def __post_init__(self):
        from viforssms_tpu.inference.vi.adamax import adamax, clipped_adamax
        from viforssms_tpu.inference.vi.theta_flow import ThetaPosterior

        cfg, spec = self.cfg, self.spec
        d, T = spec.flow_dims, spec.target_dims
        self.L_total = d * T
        self.context = cfg.flow.no_flows * cfg.flow.kernel_len
        if self.mesh is None:
            self.mesh = _singleton_mesh(self.particle_axis, self.sequence_axis)
        assert self.particle_axis in self.mesh.shape, self.mesh
        assert self.sequence_axis in self.mesh.shape, self.mesh
        n_seq = self.mesh.shape[self.sequence_axis]
        assert self.L_total % n_seq == 0 and (self.L_total // n_seq) % d == 0, (
            f"L_total={self.L_total} must split evenly over "
            f"{n_seq} sequence shards (even chunks for 2-D interleave)")
        assert cfg.p % self.mesh.shape[self.particle_axis] == 0, (
            cfg.p, self.mesh.shape)
        if self.objective not in ("elbo", "iwae", "dreg", "rws"):
            raise ValueError(f"unknown objective {self.objective!r}")
        if self.objective == "elbo" and self.iw_k > 1:
            # round-3 invocation style: iw_k alone selects IWAE training
            self.objective = "iwae"
        if self.inner_m > 1 and cfg.p % self.inner_m:
            raise ValueError(f"inner_m={self.inner_m} must divide p={cfg.p}")
        n_theta = cfg.p // max(self.inner_m, 1)
        if self.iw_k > 1 and n_theta % self.iw_k:
            raise ValueError(
                f"iw_k={self.iw_k} must divide n_theta={n_theta} "
                f"(p={cfg.p} / inner_m={self.inner_m})")
        if self.fix_theta_value is not None and (
                self.objective in ("dreg", "rws") or self.inner_m > 1):
            # the weighted path samples theta from the flow unconditionally
            # (review r4: inner_m>1 would silently ignore the pinned theta)
            raise ValueError(
                f"objective={self.objective!r}/inner_m={self.inner_m} "
                "train/weight a theta flow; incompatible with "
                "fix_theta_value")
        self.flow = NMAFlowStack(
            network_dims=tuple(cfg.flow.network_dims),
            kernel_len=cfg.flow.kernel_len,
            no_flows=cfg.flow.no_flows,
            batch_dims=T,
            flow_dims=d,
            use_norm=self.use_norm,
            mu_softplus=cfg.flow.mu_softplus,
            sigma_eps=cfg.flow.sigma_eps,
            aligned_feats=True,  # transposed mode cannot shard (flows/sharded.py)
            out_init_zero=getattr(cfg.flow, "out_init_zero", False),
            conv_mode=getattr(cfg.flow, "conv_mode", "conv"),
            compute_dtype=getattr(cfg.flow, "compute_dtype", "float32"),
            remat=cfg.flow.remat,
        )
        self.theta_flow = ThetaPosterior(
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
        if self.learn_mean_offset and self.offset_update_scale != 1.0:
            def _offset_mask(params):
                return {k: jax.tree_util.tree_map(lambda _: k == "offset", v)
                        for k, v in params.items()}

            self.opt = optax.chain(
                self.opt, optax.masked(
                    optax.scale(self.offset_update_scale), _offset_mask))
        if self.freeze_theta:
            def _theta_mask(params):
                return {k: jax.tree_util.tree_map(lambda _: k == "theta", v)
                        for k, v in params.items()}

            # Zero the theta GRADIENTS before the clipped optimizer, not the
            # updates after it: frozen theta grads must not inflate the
            # global-norm clip (shrinking path-flow updates — exactly the
            # post-refit frozen-theta fine-tune case) and a non-finite theta
            # grad must not make apply_if_finite skip the whole path update
            # (ADVICE r4).
            self.opt = optax.chain(
                optax.masked(optax.set_to_zero(), _theta_mask), self.opt)
        if self.skip_nonfinite_updates:
            self.opt = optax.apply_if_finite(self.opt,
                                             max_consecutive_errors=10_000)
        self.pre_opt = optax.flatten(adamax(
            learning_rate=cfg.train.pre_train_lr, beta1=cfg.train.pre_train_beta1
        ))
        self._derive_data()
        self._build_steps()

    def _derive_data(self):
        """Full-path arrays from the windowed tables (see class docstring)."""
        spec, tables = self.spec, self.tables
        d, T = spec.flow_dims, spec.target_dims
        offset = spec.kernel_ext - d * spec.batch_dims
        assert offset >= self.context, (offset, self.context)
        feat = np.asarray(tables.feat)
        self.feats_full = jnp.asarray(feat[offset : offset + self.L_total])
        self.edge_feats = jnp.asarray(feat[offset - self.context : offset])
        self.x0 = np.asarray(tables.shift)[:, 0] if d > 1 else float(
            np.asarray(tables.shift)[0, 0])
        self.dim_one = tables.dim_one  # (T+1,) or None (SV only)
        if getattr(self.model, "observed_dim", False):
            assert self.dim_one is not None, "SV tables must carry dim_one"
            self.y_full = jnp.zeros((T,), jnp.float32)       # unused by model
            self.mask_full = jnp.zeros((T,), jnp.float32)
        elif d == 1:
            self.y_full = self.feats_full[:, 0]
            self.mask_full = self.feats_full[:, -1]          # obs indicator
        else:
            y = np.asarray(self.feats_full[:, 0]).reshape(T, d).T
            self.y_full = jnp.asarray(y)                     # (2, T)
            self.mask_full = jnp.asarray(np.asarray(tables.bin_feed))

    # ---- parameter init (TrainState layout shared with VIEngine) ----
    def init(self, key):
        from viforssms_tpu.inference.vi.train import TrainState

        cfg = self.cfg
        k1, k2, k3, k4 = jax.random.split(key, 4)
        z = jnp.zeros((1, self.L_total + self.context))
        feats = jnp.zeros((1, self.L_total + self.context,
                           self.tables.feat.shape[-1]))
        theta0 = jnp.zeros((1, self.model.theta_dim))
        flow_params = self.flow.init(k1, z, feats, theta0)
        theta_params = self.theta_flow.init(k2, k3, cfg.p)
        params = {"flow": flow_params, "theta": theta_params}
        if self.learn_mean_offset:
            params["offset"] = jnp.zeros(
                (self.spec.flow_dims, self.spec.target_dims), jnp.float32)
        return TrainState(
            params=params,
            opt_state=self.opt.init(params),
            pre_opt_state=self.pre_opt.init(params),
            key=k4,
            step=jnp.zeros((), jnp.int32),
        )

    # ---- losses ----
    def _terms(self, params, key, theta):
        k_z, k_c = jax.random.split(key)
        p = theta.shape[0]
        z = jax.lax.with_sharding_constraint(
            jax.random.normal(k_z, (p, self.L_total)),
            NamedSharding(self.mesh, P(self.particle_axis, self.sequence_axis)))
        z_ctx = jax.random.normal(k_c, (p, self.context))
        return sequence_sharded_elbo(
            self.model, self.flow, params["flow"], z, self.feats_full,
            self.y_full, self.mask_full, theta, self.x0, self.mesh,
            self.sequence_axis, particle_axis=self.particle_axis,
            edge_feats=self.edge_feats, z_ctx=z_ctx, dim_one=self.dim_one,
            mean_offset=params.get("offset"))

    def _theta(self, params, key):
        p = self.cfg.p
        if self.fix_theta_value is not None:
            theta = jnp.tile(jnp.asarray(self.fix_theta_value)[None, :], (p, 1))
            zero = jnp.zeros(p, theta.dtype)
            return theta, zero, zero
        theta, theta_lq = self.theta_flow.apply(
            params["theta"], key, p,
            method=type(self.theta_flow).sample_and_log_prob)
        return theta, theta_lq, self.model.log_prior(theta)

    def _loss(self, params, key):
        from viforssms_tpu.inference.vi.train import StepMetrics

        if self.objective in ("dreg", "rws") or self.inner_m > 1:
            return self._loss_weighted(params, key)
        k_t, k_p = jax.random.split(key)
        theta, theta_lq, prior_lp = self._theta(params, k_t)
        t = self._terms(params, k_p, theta)
        elbo = t.elbo + prior_lp - theta_lq
        if self.objective == "iwae" and self.iw_k > 1:
            # per-group IWAE bound over full-path importance weights; the
            # nan-mask drops non-finite members from the group (same
            # reasoning as the windowed engine's iw_k path)
            bound, n_ok = masked_group_logsumexp(
                elbo, self.iw_k, self.cfg.train.nan_mask_loss)
            bound = jnp.where(n_ok > 0, bound, jnp.zeros_like(bound))
            loss = -jnp.mean(bound)
            metrics = StepMetrics(
                elbo=-loss, sde_lp=jnp.mean(t.sde_lp),
                obs_lp=jnp.mean(t.obs_lp), path_lq=jnp.mean(t.path_lq),
                theta_lq=jnp.mean(theta_lq), prior_lp=jnp.mean(prior_lp),
                grad_norm=jnp.zeros(()),
            )
            return loss, metrics
        if self.cfg.train.nan_mask_loss:
            elbo = jnp.where(jnp.isnan(elbo), jnp.zeros_like(elbo), elbo)
        loss = -jnp.mean(elbo)
        metrics = StepMetrics(
            elbo=-loss, sde_lp=jnp.mean(t.sde_lp), obs_lp=jnp.mean(t.obs_lp),
            path_lq=jnp.mean(t.path_lq), theta_lq=jnp.mean(theta_lq),
            prior_lp=jnp.mean(prior_lp), grad_norm=jnp.zeros(()),
        )
        return loss, metrics

    # ---- weighted objectives (round 4): marginalized IWAE / DReG / RWS ----

    def _marginalized_lw(self, params, k_p, theta_u, theta_lq_u,
                         theta_params_override=None):
        """Per-theta full log importance weight, paths marginalized.

        theta_u: (n_theta, D) theta draws; each is scored by inner_m path
        draws from q(x | theta) (the SAME base noise for a given k_p, so
        repeated calls are common-random-number comparable):
          lw_i = log(1/M sum_j w_path_ij) + log p(theta_i) - log q(theta_i).
        ``theta_params_override`` substitutes the theta-flow parameter tree
        used for the density term (the DReG phi-bar evaluation)."""
        theta = (jnp.repeat(theta_u, self.inner_m, axis=0)
                 if self.inner_m > 1 else theta_u)
        t = self._terms(params, k_p, theta)
        lhat, n_ok = masked_group_logsumexp(
            t.elbo, self.inner_m, self.cfg.train.nan_mask_loss)
        prior_u = self.model.log_prior(theta_u)
        if theta_params_override is not None:
            lq_u = self.theta_flow.apply(
                theta_params_override, theta_u,
                method=type(self.theta_flow).log_prob)
        else:
            lq_u = theta_lq_u
        return lhat + prior_u - lq_u, prior_u, t

    def _group_weights(self, lw_sg, k_g):
        """Per-group self-normalized weights from STOPPED log-weights;
        non-finite members get weight 0 (flat (n_theta,) output)."""
        g = lw_sg.reshape(-1, k_g)
        finite = jnp.isfinite(g)
        g = jnp.where(finite, g, -jnp.inf)
        gmax = jnp.max(g, axis=1, keepdims=True)
        e = jnp.where(finite, jnp.exp(g - jnp.where(jnp.isfinite(gmax),
                                                    gmax, 0.0)), 0.0)
        w = e / jnp.maximum(jnp.sum(e, axis=1, keepdims=True), 1e-30)
        return w.reshape(-1)

    def _bound_loss(self, lw, k_g):
        """-mean over valid groups of the per-group log-mean-exp bound."""
        bound, n_ok = masked_group_logsumexp(
            lw, k_g, self.cfg.train.nan_mask_loss)
        valid = n_ok > 0
        n_valid = jnp.maximum(jnp.sum(valid), 1)
        return -jnp.sum(jnp.where(valid, bound, 0.0)) / n_valid.astype(lw.dtype)

    def _loss_weighted(self, params, key):
        from viforssms_tpu.inference.vi.train import StepMetrics

        sg = jax.lax.stop_gradient
        k_t, k_p = jax.random.split(key)
        n_t = self.cfg.p // self.inner_m
        k_g = self.iw_k if self.iw_k > 1 else n_t
        widen = self.theta_widen if self.objective == "rws" else 1.0
        theta_u, theta_lq_u = self.theta_flow.apply(
            params["theta"], k_t, n_t, widen,
            method=type(self.theta_flow).sample_and_log_prob)

        if self.objective == "dreg":
            # pass 1 (values only, everything stopped — a pure forward):
            # group weights w and the reported bound come from here
            lw0, prior0, t0 = self._marginalized_lw(
                jax.tree_util.tree_map(sg, params), k_p, sg(theta_u),
                sg(theta_lq_u))
            lw0 = sg(lw0)
            w = self._group_weights(lw0, k_g)
            bound_loss = sg(self._bound_loss(lw0, k_g))
            # pass 2 (gradients): theta tangent pre-scaled by w so the
            # sg(w)-weighted sum yields the DReG w^2 pathwise theta
            # gradient; the phi-bar density evaluation removes the score
            # term; path-flow parameters see the plain-IWAE w weighting.
            theta_mix = dreg_theta_mix(theta_u, w)
            lw1, _, _ = self._marginalized_lw(
                params, k_p, theta_mix, None,
                theta_params_override=jax.tree_util.tree_map(
                    sg, params["theta"]))
            lw1 = jnp.where(jnp.isfinite(lw0), lw1, 0.0)
            n_groups = jnp.asarray(n_t // k_g, lw1.dtype)
            surrogate = -jnp.sum(sg(w) * lw1) / n_groups
            loss = surrogate - sg(surrogate) + bound_loss
            theta_lq_m = jnp.mean(theta_lq_u)
            prior_m = jnp.mean(prior0)
            t = t0
        elif self.objective == "rws":
            # wake-phase theta update: theta samples are STOPPED everywhere;
            # the path flow trains on the marginalized IWAE bound at those
            # thetas, the theta flow ONLY on the weighted wake density.
            theta_s = sg(theta_u)
            lw, prior_u, t = self._marginalized_lw(
                params, k_p, theta_s, sg(theta_lq_u))
            loss_path = self._bound_loss(lw, k_g)
            lw_sg = sg(lw)
            if self.rws_target_sd > 0.0:
                fin = jnp.isfinite(lw_sg)
                n_f = jnp.maximum(jnp.sum(fin), 1).astype(lw_sg.dtype)
                mu = jnp.sum(jnp.where(fin, lw_sg, 0.0)) / n_f
                sd = jnp.sqrt(jnp.sum(jnp.where(fin, (lw_sg - mu) ** 2,
                                                0.0)) / n_f + 1e-12)
                beta = jnp.minimum(1.0, self.rws_target_sd / sd)
                lw_sg = jnp.where(fin, mu + beta * (lw_sg - mu), lw_sg)
            if self.rws_clip > 0.0:
                # truncated self-normalized weights: cap at clip * mean
                lme, _ = masked_group_logsumexp(lw_sg, k_g, True)
                cap = (jnp.repeat(lme, k_g) + jnp.log(self.rws_clip))
                lw_sg = jnp.minimum(lw_sg, cap)
            w = self._group_weights(lw_sg, k_g)
            lqw = self.theta_flow.apply(
                params["theta"], theta_s,
                method=type(self.theta_flow).log_prob)
            lqw = jnp.where(sg(jnp.isfinite(lqw)), lqw, 0.0)
            n_groups = jnp.asarray(n_t // k_g, lw.dtype)
            loss_wake = -jnp.sum(sg(w) * lqw) / n_groups
            loss = loss_path + loss_wake
            theta_lq_m = jnp.mean(theta_lq_u)
            prior_m = jnp.mean(prior_u)
        else:
            # marginalized IWAE, plain gradients
            lw, prior_u, t = self._marginalized_lw(params, k_p, theta_u,
                                                   theta_lq_u)
            loss = self._bound_loss(lw, k_g)
            theta_lq_m = jnp.mean(theta_lq_u)
            prior_m = jnp.mean(prior_u)

        metrics = StepMetrics(
            elbo=-loss if self.objective != "rws" else -loss_path,
            sde_lp=jnp.mean(t.sde_lp), obs_lp=jnp.mean(t.obs_lp),
            path_lq=jnp.mean(t.path_lq), theta_lq=theta_lq_m,
            prior_lp=prior_m, grad_norm=jnp.zeros(()),
        )
        return loss, metrics

    def _x_with_edge(self, x):
        """Prepend the x0 column so model.pretrain_loss sees the windowed
        (p, [d,] W+1) layout."""
        p = x.shape[0]
        if x.ndim == 2:
            col = jnp.full((p, 1), jnp.asarray(self.x0, x.dtype))
            return jnp.concatenate([col, x], axis=1)
        d_model = x.shape[1]
        if getattr(self.model, "observed_dim", False):
            edge = jnp.stack([jnp.asarray(self.dim_one[0], x.dtype),
                              jnp.asarray(self.x0, x.dtype).reshape(())])
        else:
            edge = jnp.broadcast_to(
                jnp.asarray(self.x0, x.dtype).reshape(-1), (d_model,))
        col = jnp.broadcast_to(edge[None, :, None], (p, d_model, 1))
        return jnp.concatenate([col, x], axis=2)

    def _pre_loss(self, params, key):
        k_t, k_p = jax.random.split(key)
        theta, _, _ = self._theta(params, k_t)
        t = self._terms(params, k_p, theta)
        x = self._x_with_edge(t.x)
        p = x.shape[0]
        y = jnp.broadcast_to(self.y_full[None], (p,) + self.y_full.shape)
        m = jnp.broadcast_to(self.mask_full[None], (p,) + self.mask_full.shape)
        return self.model.pretrain_loss(x, theta, y, m), t

    # ---- jitted steps (mirrors VIEngine._build_steps) ----
    def _build_steps(self):
        from viforssms_tpu.inference.vi.train import TrainState

        donate = (0,) if self.donate else ()

        def prec(f):
            if self.matmul_precision is None:
                return f
            def g(*a, **k):
                with jax.default_matmul_precision(self.matmul_precision):
                    return f(*a, **k)
            return g

        def train_step(state: TrainState):
            key, k_loss = jax.random.split(state.key)
            (loss, metrics), grads = jax.value_and_grad(self._loss, has_aux=True)(
                state.params, k_loss)
            gnorm = jnp.linalg.norm(jax.flatten_util.ravel_pytree(grads)[0])
            updates, opt_state = self.opt.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            metrics = metrics._replace(grad_norm=gnorm)
            return (
                TrainState(params, opt_state, state.pre_opt_state, key, state.step + 1),
                metrics,
            )

        def pretrain_step(state: TrainState):
            key, k_loss = jax.random.split(state.key)
            (loss, t), grads = jax.value_and_grad(self._pre_loss, has_aux=True)(
                state.params, k_loss)
            updates, pre_opt_state = self.pre_opt.update(
                grads, state.pre_opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            finite = jnp.all(jnp.isfinite(t.path_lq))
            return (
                TrainState(params, state.opt_state, pre_opt_state, key, state.step + 1),
                loss,
                finite,
            )

        def train_many(state: TrainState, num_steps: int):
            def body(s, _):
                return train_step(s)

            return jax.lax.scan(body, state, None, length=num_steps)

        def pretrain_many(state: TrainState, num_steps: int):
            def body(s, _):
                s, loss, finite = pretrain_step(s)
                return s, (loss, finite)

            state, (losses, finites) = jax.lax.scan(
                body, state, None, length=num_steps)
            return state, losses, finites

        self.train_step = jax.jit(prec(train_step), donate_argnums=donate)
        self.pretrain_step = jax.jit(prec(pretrain_step), donate_argnums=donate)
        self.train_many = jax.jit(prec(train_many), static_argnums=1,
                                  donate_argnums=donate)
        self.pretrain_many = jax.jit(prec(pretrain_many), static_argnums=1,
                                     donate_argnums=donate)
        self._eval_terms = jax.jit(prec(
            lambda params, key: self._terms(
                params, jax.random.split(key)[1],
                self._theta(params, jax.random.split(key)[0])[0])))

    # reuse the windowed engine's host loops verbatim — they only touch the
    # step methods built above and cfg.train (checkpointing, finite gates,
    # scan chunking, preemption hooks)
    def _import_loops():
        from viforssms_tpu.inference.vi.train import VIEngine

        return VIEngine.pretrain, VIEngine.fit, VIEngine.sample_theta

    pretrain, fit, sample_theta = _import_loops()
    del _import_loops

    def sample_posterior_paths(self, params, key, max_rows: int = 8192):
        """Posterior full paths: (p, T) for 1-D models, (p, 2, T) for 2-D /
        SV (observed dim injected) — matching the windowed engine's layout.
        ``max_rows`` is accepted for CLI interface parity (the full-path
        program always evaluates all p particles in one dispatch)."""
        del max_rows
        t = self._eval_terms(params, key)
        return np.asarray(t.x)

    @classmethod
    def from_windowed(cls, eng, mesh: Optional[Mesh] = None,
                      **overrides) -> "SequenceVIEngine":
        """Convert a windowed :class:`VIEngine` into the full-path
        sequence-sharded engine over ``mesh`` — same model, config, tables,
        theta posterior and parameter shapes (a windowed checkpoint's params
        drop straight in; optimizer state restarts)."""
        kw = dict(
            model=eng.model, cfg=eng.cfg, tables=eng.tables, spec=eng.spec,
            mesh=mesh, fix_theta_value=eng.fix_theta_value,
            theta_base_loc=eng.theta_base_loc,
            theta_base_scale=eng.theta_base_scale, use_norm=eng.use_norm,
            matmul_precision=eng.matmul_precision, iw_k=eng.iw_k,
        )
        kw.update(overrides)
        return cls(**kw)

    def importance_draws(self, params, key, num_batches: int = 8):
        """(theta, x, log_w) for ``num_batches * p`` joint draws.

        Every full-path particle is an exact importance draw of the joint
        (theta, x_{1:T}): ``log w = log p(y, x, theta) - log q(x, theta)``
        is the per-particle full-path ELBO including the theta terms — the
        sequence-engine counterpart of ``inference.quality.
        log_importance_weights`` (which serves the windowed whole-series
        regimes). Feed to ``quality.psis`` / ``quality.snis_moments`` for
        PSIS-smoothed posterior estimates and the k-hat reliability flag."""
        if not hasattr(self, "_iw_draw"):
            def draw(params, k1, k2):
                theta, theta_lq, prior = self._theta(params, k1)
                t = self._terms(params, k2, theta)
                return theta, t.x, t.elbo + prior - theta_lq

            self._iw_draw = jax.jit(draw)
        thetas, xs, lws = [], [], []
        for _ in range(num_batches):
            key, k1, k2 = jax.random.split(key, 3)
            th, x, lw = self._iw_draw(params, k1, k2)
            thetas.append(np.asarray(th))
            xs.append(np.asarray(x))
            lws.append(np.asarray(lw, np.float64))
        return (np.concatenate(thetas), np.concatenate(xs),
                np.concatenate(lws))

    def marginalized_importance_draws(self, params, key, num_batches: int = 8):
        """(theta, log_w) with PATHS MARGINALIZED: each theta draw is scored
        by ``inner_m`` path draws, log w = log(1/M sum_j p(y, x_j, th)/
        q(x_j|th)) + log p(th) - log q(th) — a Rao-Blackwellized theta
        weight. Against the per-particle joint weights (PSIS k_hat ~ 2.1 at
        the SV/FHN dims, round-3 KNOWN_GAPS) the path-space noise is
        averaged out BEFORE normalization, so SNIS over theta becomes
        usable. Requires ``inner_m > 1`` on this engine."""
        assert self.inner_m > 1, "set inner_m > 1 for marginalized draws"
        if not hasattr(self, "_miw_draw"):
            def draw(params, k1, k2):
                n_t = self.cfg.p // self.inner_m
                theta_u, theta_lq_u = self.theta_flow.apply(
                    params["theta"], k1, n_t,
                    method=type(self.theta_flow).sample_and_log_prob)
                lw, _, _ = self._marginalized_lw(params, k2, theta_u,
                                                 theta_lq_u)
                return theta_u, lw

            self._miw_draw = jax.jit(draw)
        thetas, lws = [], []
        for _ in range(num_batches):
            key, k1, k2 = jax.random.split(key, 3)
            th, lw = self._miw_draw(params, k1, k2)
            thetas.append(np.asarray(th))
            lws.append(np.asarray(lw, np.float64))
        return np.concatenate(thetas), np.concatenate(lws)

    def estimate_elbo(self, params, key, num_draws: int = 20):
        """Mean/SE of the full-path ELBO over fresh draws (exact bound — no
        window subsampling variance). One jitted program per draw — an eager
        evaluation would dispatch the theta flow op-by-op, which is minutes
        per draw over a tunneled backend."""
        if not hasattr(self, "_elbo_draw"):
            def draw(params, k1, k2):
                theta, theta_lq, prior = self._theta(params, k1)
                t = self._terms(params, k2, theta)
                return jnp.mean(t.elbo + prior - theta_lq)

            self._elbo_draw = jax.jit(draw)
        vals = []
        for _ in range(num_draws):
            key, k1, k2 = jax.random.split(key, 3)
            vals.append(float(self._elbo_draw(params, k1, k2)))
        vals = np.asarray(vals)
        return float(vals.mean()), float(vals.std() / np.sqrt(len(vals)))
