"""Streaming EDSR serving path (experimental; see edsr_fast.py STATUS note)
vs the linen forward."""

import jax
import numpy as np

from studiosr_tpu.models.edsr import EDSR
import os, sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from edsr_fast import edsr_fast_forward


def test_edsr_fast_forward_matches_linen():
    model = EDSR.build(scale=4, n_feats=16, n_resblocks=2, res_scale=0.5)
    x = np.random.default_rng(0).standard_normal((1, 16, 16, 3), dtype=np.float32)
    want = np.asarray(model(x))
    got = np.asarray(
        jax.jit(lambda v, t: edsr_fast_forward(v, t, model.config, interpret=True))(
            model.variables, x
        )
    )
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)
