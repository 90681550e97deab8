"""AOT deployment artifacts: export --convert 1 → .jaxexp → AOTBundle serving.

The reference validates its TorchScript export against eager outputs
(export.py:183-189, torch.jit.trace(..., check_trace=True)) and serves TRT
engines through TRTWrapper (toolkits/trt_infer.py:7-98). Equivalent coverage
here: the serialized StableHLO graphs must reproduce the jitted infer_p1/p2
bit-for-bit at the exported bucket shapes, and EmoVITS(aot=True) must serve
requests from the bundle with outputs equal to the jitted engine.
"""
import os
import shutil

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vits_tpu.nn.core import fold_weight_norm
from vits_tpu.ops.seq import infer_path
from vits_tpu.utils import checkpoint as ckpt

from test_infer_wrap import TINY_JSON, deploy_dir  # noqa: F401 (fixture)

TEXT_BUCKETS = (32,)
FRAME_BUCKETS = (64, 128, 192, 256)


@pytest.fixture(scope="module")
def aot_dir(deploy_dir, tmp_path_factory):  # noqa: F811
    """Run the export CLI with --convert 1 over the tiny deployment dir."""
    d, synth, params = deploy_dir
    import vits_tpu.export as export_mod
    out = tmp_path_factory.mktemp("aot")
    export_mod.main([
        "--outdir", str(out), "--checkpoint", os.path.join(d, "checkpoint.npz"),
        "--config", os.path.join(d, "config.json"), "--convert", "1",
        "--text-buckets", ",".join(map(str, TEXT_BUCKETS)),
        "--frame-buckets", ",".join(map(str, FRAME_BUCKETS)),
        "--verbose", "0",
    ])
    return str(out), synth, params


def test_bundle_matches_jit(aot_dir):
    """Deserialized graphs == jitted graphs on identical inputs
    (check_trace analog)."""
    d, synth, params = aot_dir
    from vits_tpu.serve.aot import AOTBundle
    bundle = AOTBundle(d)
    assert bundle.text_buckets() == sorted(TEXT_BUCKETS)
    assert bundle.frame_buckets(32) == sorted(FRAME_BUCKETS)

    folded = fold_weight_norm(params)
    rng = np.random.RandomState(0)
    tb = 32
    x = rng.randn(1, tb, 16).astype(np.float32)
    x_mask = np.zeros((1, tb, 1), np.float32)
    x_mask[0, :27] = 1.0
    emo = rng.randn(1, 1024).astype(np.float32)
    sid = np.asarray([3], np.int32)

    got = bundle.call_p1(tb, folded, x, x_mask, emo, sid)
    want = jax.jit(lambda p, a, m, e, s: synth.infer_p1(p, a, e, s, x_mask=m))(
        folded, x, x_mask, emo, sid)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))

    m_p, s_p, logw, g = got
    w_ceil = np.ceil(np.exp(np.asarray(logw, np.float32))[0, :27, 0])
    y_len = int(w_ceil.sum())
    fb = bundle.pick_frame_bucket(tb, y_len)
    assert fb is not None
    dur = np.zeros((1, tb), np.float32)
    dur[0, :27] = w_ceil
    attn = np.asarray(infer_path(jnp.asarray(dur), fb), np.float32)
    noise = rng.randn(1, fb, 8).astype(np.float32)
    y_mask = np.zeros((1, fb, 1), np.float32)
    y_mask[0, :y_len] = 1.0

    wav_aot = np.asarray(bundle.call_p2(tb, fb, folded, attn, m_p, s_p, g,
                                        noise, y_mask))
    wav_jit = np.asarray(jax.jit(
        lambda p, a, m, s, gg, n, ym: synth.infer_p2(p, a, m, s, gg, n, y_mask=ym)
    )(folded, attn, m_p, s_p, g, noise, y_mask))
    np.testing.assert_array_equal(wav_aot, wav_jit)


def test_emovits_serves_from_bundle(aot_dir, deploy_dir):  # noqa: F811
    """EmoVITS(aot=True) consumes the artifacts end-to-end and equals the
    jitted engine's output for an in-bucket request."""
    aotd, synth, params = aot_dir
    d, _, _ = deploy_dir
    # the bundle dir needs the serving resources beside the artifacts
    for res in ("config.json", "checkpoint.npz", "spk.map", "3.emo"):
        src = os.path.join(d, res)
        if os.path.exists(src) and not os.path.exists(os.path.join(aotd, res)):
            shutil.copy(src, os.path.join(aotd, res))

    from vits_tpu.infer import EmoVITS
    model = EmoVITS(os.path.join(aotd, "checkpoint.npz"), aot=True)
    assert model.aot is not None
    rng = np.random.RandomState(3)
    text = rng.randn(19, 16).astype(np.float32)
    emo = rng.randn(1024).astype(np.float32)
    np.random.seed(11)
    wav_aot, _ = model.infer(2, text, emo)

    ref = EmoVITS(os.path.join(aotd, "checkpoint.npz"), aot=False,
                  text_quantum=32, frame_quantum=64)
    np.random.seed(11)
    wav_jit, _ = ref._infer_two_phase(2, text, emo)
    # the AOT frame bucket can differ from the jit quantum bucket, but the
    # masked graphs are padding-invariant, so the trimmed wavs must agree
    assert len(wav_aot) == len(wav_jit)
    np.testing.assert_allclose(wav_aot, wav_jit, atol=2e-5)

    # a request longer than every exported bucket falls back to the jit path
    long_text = rng.randn(40, 16).astype(np.float32)
    np.random.seed(12)
    wav_long, _ = model.infer(2, long_text, emo)
    assert len(wav_long) > 0 and np.all(np.isfinite(wav_long))
