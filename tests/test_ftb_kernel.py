"""Fused FTB-tail Pallas kernel vs the composed XLA graph (interpret).

The inference path (train=False on TPU) runs attention-multiply ->
channel mix -> freq mix -> residual mix -> BN-folded bias -> ReLU in
one pallas_call (aero_tpu/ops/ftb.py); training keeps the composed
graph. Reference: src/models/modules.py:279-325.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aero_tpu.models.modules import FTB
from aero_tpu.ops import ftb as ftb_ops


@pytest.fixture(autouse=True)
def interpret_mode():
    old = ftb_ops._INTERPRET
    ftb_ops._INTERPRET = True
    yield
    ftb_ops._INTERPRET = old


@pytest.mark.parametrize("f,c,t", [(32, 8, 50), (16, 24, 129),
                                   # F > block_f=64: exercises the r5
                                   # F-grid incl. a ragged F pad (96->128)
                                   (96, 8, 70)])
def test_ftb_kernel_matches_composed(f, c, t):
    rng = np.random.default_rng(0)
    x = jnp.asarray(0.3 * rng.standard_normal((2, f, t, c)).astype(np.float32))
    m = FTB(input_dim=f, in_channel=c)
    v = m.init(jax.random.PRNGKey(0), x, train=False)

    # perturb the BN running stats so the fold is non-trivial
    v = jax.tree_util.tree_map(lambda a: a, v)
    stats = v["batch_stats"]
    stats = jax.tree_util.tree_map(
        lambda a: a + 0.1 * jnp.arange(a.shape[-1], dtype=a.dtype)
        if a.ndim else a, stats)
    v = {**v, "batch_stats": stats}

    got = m.apply(v, x, train=False)           # fused kernel (interpret)
    old = ftb_ops._INTERPRET
    ftb_ops._INTERPRET = False                 # forces composed path on CPU
    try:
        want = m.apply(v, x, train=False)
    finally:
        ftb_ops._INTERPRET = old
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)
