"""TransformedDistribution: push a base distribution through a bijector chain.

Replaces ``tfd.TransformedDistribution`` for the stateless-bijector cases the
reference uses (x0 priors through softplus chains, softplus-transformed theta
priors, the multiplicative-noise observation transform —
``lotka_volterra_latest.py:327-337``, ``..._learn_theta.py:344-345,420-437``).
The parameterized MAF theta posterior is a flax module instead
(``inference/vi/theta_flow.py``).
"""

from __future__ import annotations

import dataclasses

from viforssms_tpu.distributions.bijectors import Bijector, sum_event


@dataclasses.dataclass(frozen=True)
class TransformedDistribution:
    distribution: object
    bijector: Bijector
    # How many trailing axes of a sample form one event for the log-det
    # reduction (tf's bijector event_ndims).
    event_ndims: int = 1

    def sample(self, key, shape=()):
        return self.bijector.forward(self.distribution.sample(key, shape))

    def log_prob(self, y):
        x = self.bijector.inverse(y)
        ildj = sum_event(self.bijector.inverse_log_det(y), self.event_ndims)
        return self.distribution.log_prob(x) + ildj
