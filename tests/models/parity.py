"""Shared golden-value parity harness: reference torch model vs our JAX model.

Builds both with identical (small) configs, pushes the torch ``state_dict``
through the generic translator, and compares forwards on random input.
"""

from __future__ import annotations

import numpy as np


def assert_parity(ref_model, jax_model, hw=(20, 24), atol=2e-4, rtol=1e-4, seed=1, batch=1):
    import torch

    from studiosr_tpu.zoo import translate_state_dict

    ref_model = ref_model.eval()
    state = {k: v.detach().cpu().numpy() for k, v in ref_model.state_dict().items()}
    jax_model.variables, report = translate_state_dict(state, jax_model.variables)
    assert not report.missing, f"missing params: {report.missing}"

    x = np.random.default_rng(seed).standard_normal((batch, hw[0], hw[1], 3), dtype=np.float32)
    with torch.no_grad():
        want = ref_model(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(jax_model(x))
    np.testing.assert_allclose(got, want, atol=atol, rtol=rtol)
    return report
