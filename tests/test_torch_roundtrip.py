"""Reverse bridge: our params -> torch state_dict -> back, and loadable by the
reference torch model."""
import os
import sys

import numpy as np
import pytest
import torch

import jax

REF = "/root/reference/emotional-vits"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference repo not mounted")
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

from test_model_parity import TINY, models  # noqa: E402
from vits_tpu.utils.torch_compat import (  # noqa: E402
    export_torch_state_dict, load_torch_state_dict, save_torch_checkpoint)


def test_roundtrip_and_reference_load(models, tmp_path):
    tm, ours, params = models
    state = export_torch_state_dict(params)
    ref_state = tm.state_dict()
    # every reference key present with the right shape
    missing = [k for k in ref_state if k not in state]
    assert not missing, missing[:8]
    for k in ref_state:
        assert tuple(state[k].shape) == tuple(ref_state[k].shape), \
            f"{k}: {state[k].shape} vs {tuple(ref_state[k].shape)}"
    # value roundtrip: params were bridged FROM tm, so exporting must
    # reproduce tm's tensors exactly
    for k in ref_state:
        np.testing.assert_allclose(state[k], ref_state[k].numpy(), atol=1e-6,
                                   err_msg=k)
    # and the torch reference accepts the saved file
    path = str(tmp_path / "roundtrip.pth")
    save_torch_checkpoint(path, params, iteration=7)
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    tm.load_state_dict(ckpt["model"], strict=True)
    assert ckpt["iteration"] == 7
    # and loads back into our pytree unchanged
    params2 = load_torch_state_dict(ckpt["model"], params)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
