from viforssms_tpu.distributions.bijectors import (
    Affine,
    Bijector,
    Chain,
    Exp,
    Identity,
    Softplus,
)
from viforssms_tpu.distributions.bivariate import (
    bivariate_tril_logpdf,
    diag_normal_logpdf,
)
from viforssms_tpu.distributions.normal import (
    Normal,
    MultivariateNormalDiag,
    normal_logpdf,
)
from viforssms_tpu.distributions.transformed import TransformedDistribution

__all__ = [
    "Affine",
    "Bijector",
    "Chain",
    "Exp",
    "Identity",
    "Softplus",
    "Normal",
    "MultivariateNormalDiag",
    "TransformedDistribution",
    "bivariate_tril_logpdf",
    "diag_normal_logpdf",
    "normal_logpdf",
]
