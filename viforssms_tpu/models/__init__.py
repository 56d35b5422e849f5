from viforssms_tpu.models.ar1 import AR1
from viforssms_tpu.models.base import SSM
from viforssms_tpu.models.double_well import DoubleWell
from viforssms_tpu.models.fitzhugh_nagumo import FitzHughNagumo
from viforssms_tpu.models.lotka_volterra import (
    LotkaVolterra,
    LotkaVolterraLearnObsScale,
    LotkaVolterraLearnTheta,
)
from viforssms_tpu.models.stochastic_volatility import StochasticVolatility

__all__ = [
    "AR1",
    "SSM",
    "DoubleWell",
    "FitzHughNagumo",
    "LotkaVolterra",
    "LotkaVolterraLearnObsScale",
    "LotkaVolterraLearnTheta",
    "StochasticVolatility",
]
