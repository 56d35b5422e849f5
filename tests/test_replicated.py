"""Replica-packed training (round 5): R independent fits in ONE program.

The LV-partial headline lever — a reference-shaped config has p=50 < the
128 MXU lanes, so packing R replicas into the batch dimension fills the
systolic array (VERDICT r4 item 4). Semantics must be exactly R separate
fits: same per-replica params as running each replica's key through the
plain scanned path.
"""

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _lv_engine


def test_replicated_matches_sequential_fits():
    eng = _lv_engine(target=40, batch_dims=10, p=4, kernel_len=4, no_flows=2,
                     net=(8, 8, 8), feat_window=3)
    states = eng.init_replicated(jax.random.key(0), 2)

    # reference: run each replica separately through the plain scan path
    singles = []
    for r in range(2):
        s = jax.tree.map(lambda a: a[r], states)
        s, ms = eng.train_many(s, 4)
        singles.append((s, ms))

    sts, ms_rep = eng.train_many_replicated(states, 4)
    for r in range(2):
        got = jax.flatten_util.ravel_pytree(
            jax.tree.map(lambda a: a[r], sts.params))[0]
        want = jax.flatten_util.ravel_pytree(singles[r][0].params)[0]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(ms_rep.elbo[r]),
                                   np.asarray(singles[r][1].elbo),
                                   rtol=2e-3, atol=1e-2)
    # replicas genuinely differ (independent PRNG streams)
    p0 = jax.flatten_util.ravel_pytree(jax.tree.map(lambda a: a[0], sts.params))[0]
    p1 = jax.flatten_util.ravel_pytree(jax.tree.map(lambda a: a[1], sts.params))[0]
    assert float(jnp.abs(p0 - p1).max()) > 1e-4
