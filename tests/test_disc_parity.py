"""Golden parity: MPD discriminator vs the reference torch implementation."""
import os
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

REF = "/root/reference/emotional-vits"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference repo not mounted")
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

from vits_tpu.models.discriminators import MultiPeriodDiscriminator  # noqa: E402
from vits_tpu.utils.torch_compat import load_torch_state_dict  # noqa: E402


def test_mpd_matches_reference():
    import models as ref_models

    torch.manual_seed(0)
    tm = ref_models.MultiPeriodDiscriminator(use_spectral_norm=False).eval()
    ours = MultiPeriodDiscriminator(use_spectral_norm=False)
    params = load_torch_state_dict(tm.state_dict(), ours.init_params(jax.random.PRNGKey(0)),
                                   verbose=True)
    rng = np.random.RandomState(0)
    T = 2048
    y = rng.uniform(-0.9, 0.9, (2, 1, T)).astype(np.float32)
    y_hat = rng.uniform(-0.9, 0.9, (2, 1, T)).astype(np.float32)
    with torch.no_grad():
        r_t, g_t, fr_t, fg_t = tm(torch.from_numpy(y), torch.from_numpy(y_hat))
    r_j, g_j, fr_j, fg_j = ours.apply(params, jnp.asarray(y.transpose(0, 2, 1)),
                                      jnp.asarray(y_hat.transpose(0, 2, 1)))
    assert len(r_j) == len(r_t) == 6
    for i, (a, b) in enumerate(zip(r_j, r_t)):
        np.testing.assert_allclose(np.sort(np.asarray(a).ravel()),
                                   np.sort(b.numpy().ravel()), atol=2e-3, rtol=1e-3,
                                   err_msg=f"disc {i} scores")
    # feature-map count parity (fmap layout differs: NHWC vs NCHW)
    for i, (fa, fb) in enumerate(zip(fr_j, fr_t)):
        assert len(fa) == len(fb)
        for a, b in zip(fa, fb):
            assert np.asarray(a).size == b.numpy().size, f"disc {i} fmap size"
    # exact-value check on the DiscriminatorS branch (pure 1-D, same layout)
    np.testing.assert_allclose(np.asarray(r_j[0]), r_t[0].numpy(), atol=2e-3, rtol=1e-3)
