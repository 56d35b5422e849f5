"""Static configuration pytrees for the NMA-VI stack.

Replaces the reference's positional ``hyperparameters.txt`` + per-script
hard-coded driver constants (reference ``main.py:26-57``,
``lotka_volterra_partial.py:467-477``) with typed dataclasses. All fields are
static (hashable) so configs can close over jitted functions.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class FlowConfig:
    """Shape of the NMA causal-conv IAF variational sampler.

    Mirrors the knobs of the reference IAF/Flow_Stack (``AR.py:38-110``):
    ``kernel_len`` is the causal conv receptive field per flow, ``no_flows``
    the number of stacked flows, ``network_dims`` the conv-tower widths,
    ``feat_window`` the number of lagged-observation feature channels.
    """

    kernel_len: int = 50
    no_flows: int = 3
    network_dims: Tuple[int, ...] = (50, 50, 50)
    feat_window: int = 10
    # Number of interleaved state dimensions handled by the flow:
    # 1 for scalar SSMs (AR(1), SV latent), 2 for bivariate SDEs (LV, FHN)
    # using the stride-2 interleaved layout (lotka_volterra_partial.py:97-104).
    flow_dims: int = 1
    # 2-D variants: value added to the identity half of mu. The original LV
    # uses mu=0 (identity); the "mu1" stability variants use softplus(mu)+eps
    # on the transformed half (lotka_volterra_latest_batch_gpt_64_mu1_cov.py:153).
    mu_softplus: bool = False
    # Width of the transposed feature embedding for 2-D flows
    # (lotka_volterra_partial.py:75-76). Ignored for flow_dims == 1.
    sigma_eps: float = 1e-10
    # TPU-fast 2-D feature mode: locally-aligned features (1-D style) instead
    # of the transposed global projection whose conv-channel count scales with
    # the window (quadratic FLOPs). ON by default: the six-seed quality study
    # (docs/RESULTS.md "Aligned 2-D feature mode") found it statistically
    # equivalent to the reference's transposed projection and 1.07-2.1x
    # faster. Set False (CLI: --transposed) for reference-parity runs.
    aligned_feats_2d: bool = True
    # Zero-init each flow's final (mu, sigma) layer (Glow/IAF near-identity
    # init): required for stable cold training of deep/wide stacks (>5
    # flows), whose lecun-init outputs otherwise compound into exploding
    # paths. False = reference init parity (flows/nma.py ConvIAF).
    out_init_zero: bool = False
    # Pallas whole-tail megakernel ("off" | "on" | "interpret"); requires the
    # 1-D or aligned-2-D feature path (ops/fused_flow.py).
    fused_tail: str = "off"
    # Lowering of the causal conv: "conv" = lax.conv_general_dilated (XLA conv
    # emitter); "im2col" = explicit unfold + one dot_general, which keeps the
    # operand in the same (p, L, C) dense layout as the surrounding 1x1
    # convs/elementwise ops (the conv emitter's {1,2,0}/{2,0,1} layouts cost
    # ~25% of step self-time in relayout copies at LV-partial shapes —
    # docs/RESULTS.md "megakernel study"); "hybrid" = conv-emitter forward +
    # im2col backward via custom_vjp (ops/hybrid_conv.py) — measured NEGATIVE
    # at bench shapes (the custom_vjp fusion boundary costs more than the
    # backward saves; docs/RESULTS.md "hybrid conv study"), ships for larger
    # shapes. Parameter pytree is identical in all modes (kernel
    # (K, Cin, Cout) + bias), so checkpoints interchange.
    conv_mode: str = "conv"
    # Activation dtype inside the conv/tower stack ("float32" | "bfloat16").
    # Params and all density math stay f32 (flows/nma.py ConvIAF docs).
    compute_dtype: str = "float32"
    # Batch the per-flow feature MLPs into one einsum chain (1-D/aligned-2-D
    # only; own stacked param layout — flows/nma.py NMAFlowStack docs).
    batched_feat_mlp: bool = False
    # rematerialize each flow in the backward pass (memory for FLOPs)
    remat: bool = False

    def kernel_ext(self, batch_dims: int) -> int:
        """Extended sample window: context + target (+x0 slot(s)).

        1-D: ``kernel_len*no_flows + batch_dims + 1``      (AR.py:132)
        2-D: ``kernel_len*no_flows + 2*batch_dims + 2``    (lotka_volterra_partial.py:185-186)
        """
        return self.kernel_len * self.no_flows + self.flow_dims * batch_dims + self.flow_dims

    @property
    def context_len(self) -> int:
        """Left context consumed by the stacked valid-padded convs."""
        return self.kernel_len * self.no_flows


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization settings (reference ``AR.py:226-236``, ``optimisers/adamax.py``)."""

    learn_rate: float = 1e-3
    grad_clip: float = 2.5e8
    beta1: float = 0.95
    beta2: float = 0.999
    pre_train_steps: int = 500
    pre_train_lr: float = 1e-3
    pre_train_beta1: float = 0.9
    num_steps: int = 10_000
    nan_mask_loss: bool = False  # ..._learn_theta.py:482
    checkpoint_every: int = 1000
    seed: int = 1


@dataclasses.dataclass(frozen=True)
class VIConfig:
    """Top-level VI problem description.

    ``p`` is the particle axis (simultaneous posterior samples) — the
    reference's only parallel axis (SURVEY.md §2.3) and our primary sharded
    data-parallel axis. ``batch_dims`` is the target window length, ``T`` the
    full latent-path length in steps.
    """

    p: int = 50
    batch_dims: int = 50
    T: int = 5000
    dt: float = 1.0
    flow: FlowConfig = dataclasses.field(default_factory=FlowConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    # theta posterior flow (reference AR.py:377-391)
    theta_num_bijectors: int = 5
    theta_hidden: Tuple[int, ...] = (5, 5, 5)
    theta_softplus: bool = False  # terminal variant positivity (..._learn_theta.py:844)
    # "maf" = Invert(MAF) chain (AR.py:377-391); "realnvp" = affine-coupling
    # chain (the family named by fitz_nag_NVP.py / BASELINE.json north star)
    theta_flow_type: str = "maf"
    fix_theta: bool = False       # lotka_volterra_latest.py:197-203

    @property
    def kernel_ext(self) -> int:
        return self.flow.kernel_ext(self.batch_dims)

    @property
    def elbo_scale(self) -> float:
        """Path-term rescaling T/batch_dims (AR.py:184-185)."""
        return float(self.T) / float(self.batch_dims)


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Named-mesh layout for multi-chip execution.

    Axes (SURVEY.md §5 "Distributed communication backend"):
      ``data``      — series-batch / replica axis (DCN-friendly)
      ``particles`` — particle/chain axis (pure DP over ICI)
      ``sequence``  — time-axis sharding with halo exchange (ICI)
    """

    data: int = 1
    particles: int = 1
    sequence: int = 1

    @property
    def num_devices(self) -> int:
        return self.data * self.particles * self.sequence

    @property
    def axis_names(self) -> Tuple[str, ...]:
        return ("data", "particles", "sequence")
