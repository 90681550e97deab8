"""ONNX interchange export (vits_tpu.onnx) tests.

Validates the three layers independently:
- wire format: writer → reader round trip, plus `protoc --decode` against
  tools/onnx_subset.proto (field numbers of the public onnx.proto);
- converter: exported p1/p2 evaluated by the numpy ONNX interpreter
  (vits_tpu.onnx.runtime — an independent implementation of ONNX op
  semantics) must match the jax forward;
- dynamic axes: p1 must evaluate correctly at a text length OTHER than the
  traced one (the reference marks input_text axis 1 dynamic —
  emotional-vits/export.py:207).
"""

import shutil
import subprocess

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vits_tpu.models.synthesizer import Synthesizer
from vits_tpu.nn.core import fold_weight_norm
from vits_tpu.onnx import export_p1, export_p2, proto, runtime

from test_model_parity import TINY


@pytest.fixture(scope="module")
def tiny():
    synth = Synthesizer(**TINY)
    params = synth.init_params(jax.random.PRNGKey(0))
    return synth, params, fold_weight_norm(params)


@pytest.fixture(scope="module")
def p1_bytes(tiny):
    synth, params, _ = tiny
    return export_p1(synth, params, t_x=12)


def _p1_inputs(t_x, seed=0):
    rng = np.random.RandomState(seed)
    return {"input_text": rng.randn(1, t_x, TINY["text_channels"]).astype(np.float32),
            "input_emo": rng.randn(1, 1024).astype(np.float32),
            "input_g": np.array([2], np.int64)}


def _p1_reference(synth, pf, inp):
    m_p, s_p, logw, g = synth.infer_p1(
        pf, jnp.asarray(inp["input_text"]), jnp.asarray(inp["input_emo"]),
        jnp.asarray(inp["input_g"], jnp.int32))
    return {"output_m_p": np.swapaxes(np.asarray(m_p), 1, 2),
            "output_s_p": np.swapaxes(np.asarray(s_p), 1, 2),
            "output_logw": np.swapaxes(np.asarray(logw), 1, 2),
            "output_g": np.asarray(g)}


def test_p1_matches_jax(tiny, p1_bytes):
    synth, _, pf = tiny
    inp = _p1_inputs(12)
    out = runtime.run_model(p1_bytes, inp)
    ref = _p1_reference(synth, pf, inp)
    for k, v in ref.items():
        assert out[k].shape == v.shape, k
        np.testing.assert_allclose(out[k], v, atol=2e-4, rtol=2e-3, err_msg=k)


def test_p1_dynamic_text_length(tiny, p1_bytes):
    """The exported p1 graph must generalize beyond its traced length."""
    synth, _, pf = tiny
    for t_x in (7, 20):
        inp = _p1_inputs(t_x, seed=t_x)
        out = runtime.run_model(p1_bytes, inp)
        ref = _p1_reference(synth, pf, inp)
        for k, v in ref.items():
            assert out[k].shape == v.shape, (k, t_x)
            np.testing.assert_allclose(out[k], v, atol=2e-4, rtol=2e-3,
                                       err_msg=f"{k} @T={t_x}")


def test_p2_matches_jax(tiny):
    synth, params, pf = tiny
    t_x, t_y = 12, 40
    mb = export_p2(synth, params, t_x=t_x, t_y=t_y)
    rng = np.random.RandomState(1)
    attn = np.zeros((1, t_y, t_x), np.float32)
    pos = 0
    for i, d in enumerate([3, 4, 5, 3, 4, 5, 3, 4, 5, 2, 1, 1]):
        attn[0, pos:pos + d, i] = 1.0
        pos += d
    inp = {"input_attn": attn,
           "input_m_p": rng.randn(1, TINY["inter_channels"], t_x).astype(np.float32),
           "input_s_p": np.abs(rng.randn(1, TINY["inter_channels"], t_x)).astype(np.float32),
           "input_g": rng.randn(1, TINY["gin_channels"]).astype(np.float32),
           "input_noise": (0.3 * rng.randn(1, TINY["inter_channels"], t_y)).astype(np.float32)}
    out = runtime.run_model(mb, inp)
    wav = synth.infer_p2(
        pf, jnp.asarray(attn),
        jnp.asarray(np.swapaxes(inp["input_m_p"], 1, 2)),
        jnp.asarray(np.swapaxes(inp["input_s_p"], 1, 2)),
        jnp.asarray(inp["input_g"]),
        jnp.asarray(np.swapaxes(inp["input_noise"], 1, 2)), packed=False)
    ref = np.swapaxes(np.asarray(wav), 1, 2)
    assert out["output_wav"].shape == ref.shape
    np.testing.assert_allclose(out["output_wav"], ref, atol=2e-4, rtol=2e-3)


def test_roundtrip_structure(p1_bytes):
    m = proto.parse_model(p1_bytes)
    assert m["ir_version"] == 8
    assert m["opset"] == 17
    g = m["graph"]
    assert [vi["name"] for vi in g["input"]] == \
        ["input_text", "input_emo", "input_g"]
    assert [vi["name"] for vi in g["output"]] == \
        ["output_m_p", "output_s_p", "output_logw", "output_g"]
    # dynamic axis annotation parity with the reference export
    ti = next(vi for vi in g["input"] if vi["name"] == "input_text")
    assert ti["shape"][1] == "text_len"
    assert len(g["initializer"]) > 10
    assert len(g["node"]) > 50


def test_io_dtypes(p1_bytes):
    g = proto.parse_model(p1_bytes)["graph"]
    by_name = {vi["name"]: vi for vi in g["input"]}
    # sid is int64 on the wire (torch consumers send long), cast inside
    assert by_name["input_g"]["elem_type"] == proto.INT64
    assert by_name["input_text"]["elem_type"] == proto.FLOAT


def test_tensor_scalar_roundtrip():
    # regression: ascontiguousarray silently promoted 0-d arrays to 1-d
    t = proto.parse_tensor(proto.tensor_proto("s", np.float32(3.5)))
    arr = proto.tensor_to_np(t)
    assert arr.shape == () and arr == np.float32(3.5)


def test_onnx_matches_torch_reference_oracle(tiny):
    """Full interchange chain: reference torch model → torch_compat weight
    bridge → ONNX export → numpy evaluation must reproduce the TORCH
    reference outputs (channel-first, the reference's own wire layouts) —
    i.e. a consumer of the reference's ONNX artifacts can swap in ours and
    get the same audio. Oracle: emotional-vits models.py infer_p1/infer_p2
    (export surface export.py:197-226)."""
    import os
    import sys
    REF = "/root/reference/emotional-vits"
    if not os.path.isdir(REF):
        pytest.skip("reference repo not mounted")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import torch
    import models as ref_models
    from vits_tpu.utils.torch_compat import load_torch_state_dict

    torch.manual_seed(0)
    tm = ref_models.SynthesizerTrn(
        TINY["text_channels"], TINY["spec_channels"], TINY["segment_size"],
        inter_channels=TINY["inter_channels"],
        hidden_channels=TINY["hidden_channels"],
        filter_channels=TINY["filter_channels"], n_heads=TINY["n_heads"],
        n_layers=TINY["n_layers"], kernel_size=TINY["kernel_size"],
        p_dropout=TINY["p_dropout"],
        resblock_kernel_sizes=list(TINY["resblock_kernel_sizes"]),
        resblock_dilation_sizes=[list(d) for d in TINY["resblock_dilation_sizes"]],
        upsample_rates=list(TINY["upsample_rates"]),
        upsample_initial_channel=TINY["upsample_initial_channel"],
        upsample_kernel_sizes=list(TINY["upsample_kernel_sizes"]),
        resblock=TINY["resblock"], ffn=TINY["ffn"],
        kernel_size_q=TINY["kernel_size_q"], n_layers_q=TINY["n_layers_q"],
        hidden_size_d=TINY["hidden_size_d"], kernel_size_d=TINY["kernel_size_d"],
        p_dropout_d=TINY["p_dropout_d"], act_func_d=TINY["act_func_d"],
        dilation_rate=list(TINY["dilation_rate"]), n_flows=TINY["n_flows"],
        n_speakers=TINY["n_speakers"], gin_channels=TINY["gin_channels"],
    ).eval()
    synth = Synthesizer(**TINY)
    params = load_torch_state_dict(tm.state_dict(),
                                   synth.init_params(jax.random.PRNGKey(0)),
                                   strict=False)

    t_x, t_y = 10, 32
    mb1 = export_p1(synth, params, t_x=t_x)
    mb2 = export_p2(synth, params, t_x=t_x, t_y=t_y)

    rng = np.random.RandomState(7)
    x = rng.randn(1, t_x, TINY["text_channels"]).astype(np.float32)
    emo = rng.randn(1, 1024).astype(np.float32)
    sid = np.array([1], np.int64)
    with torch.no_grad():
        tm_p, ts_p, tlogw, tg = tm.infer_p1(
            torch.from_numpy(x), torch.from_numpy(emo), torch.from_numpy(sid))
    o1 = runtime.run_model(mb1, {"input_text": x, "input_emo": emo,
                                 "input_g": sid})
    np.testing.assert_allclose(o1["output_m_p"], tm_p.numpy(),
                               atol=5e-4, rtol=5e-3)
    np.testing.assert_allclose(o1["output_s_p"], ts_p.numpy(),
                               atol=5e-4, rtol=5e-3)
    np.testing.assert_allclose(o1["output_logw"], tlogw.numpy(),
                               atol=5e-4, rtol=5e-3)
    np.testing.assert_allclose(o1["output_g"], tg.numpy(), atol=5e-4)

    # phase 2 on a hand-built alignment, reference layouts throughout
    attn = np.zeros((1, t_y, t_x), np.float32)
    pos = 0
    for i, d in enumerate([3, 4, 3, 4, 3, 4, 3, 4, 2, 2]):
        attn[0, pos:pos + d, i] = 1.0
        pos += d
    noise = (0.3 * rng.randn(1, TINY["inter_channels"], t_y)).astype(np.float32)
    with torch.no_grad():
        twav = tm.infer_p2(torch.from_numpy(attn), tm_p, ts_p, tg,
                           torch.from_numpy(noise))
    o2 = runtime.run_model(mb2, {
        "input_attn": attn, "input_m_p": o1["output_m_p"],
        "input_s_p": o1["output_s_p"], "input_g": o1["output_g"],
        "input_noise": noise})
    assert o2["output_wav"].shape == tuple(twav.shape)
    np.testing.assert_allclose(o2["output_wav"], twav.numpy(),
                               atol=2e-3, rtol=5e-2)


def test_cli_check_and_run(p1_bytes, tmp_path, capsys):
    """python -m vits_tpu.onnx <model> --run: structure check + smoke run
    (the onnx.checker / trt_infer analog); --run draws the dynamic axis at a
    non-traced length, so it also exercises length generalization."""
    from vits_tpu.onnx.__main__ import main as cli
    path = tmp_path / "m.onnx"
    path.write_bytes(p1_bytes)
    rc = cli([str(path), "--run"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "structure: OK" in out and "run: OK" in out
    # corrupt: truncate the file → the check must fail (either a parse error
    # or a structural PROBLEM / nonzero exit, depending on where the cut
    # lands relative to a protobuf message boundary)
    bad = tmp_path / "bad.onnx"
    bad.write_bytes(p1_bytes[: len(p1_bytes) // 2])
    try:
        rc_bad = cli([str(bad), "--run"])
    except Exception:
        rc_bad = 1
    assert rc_bad != 0


@pytest.mark.skipif(shutil.which("protoc") is None, reason="protoc not in image")
def test_protoc_decodes_our_wire_format(p1_bytes, tmp_path):
    """Independent wire-format check: Google's protobuf parser must decode
    the hand-rolled encoding against the mirrored onnx field numbers."""
    import os
    proto_dir = os.path.join(os.path.dirname(__file__), "..", "tools")
    r = subprocess.run(
        ["protoc", f"-I{proto_dir}", "--decode=vits_tpu_onnx.ModelProto",
         "onnx_subset.proto"],
        input=p1_bytes, capture_output=True, timeout=120)
    assert r.returncode == 0, r.stderr.decode()[:2000]
    text = r.stdout.decode()
    assert 'ir_version: 8' in text
    assert 'op_type: "Conv"' in text
    assert 'dim_param: "text_len"' in text
    assert 'name: "output_logw"' in text
