"""ONNX interchange export for the two-phase inference graphs.

Mirrors the reference's `torch.onnx.export` surface
(emotional-vits/export.py:197-226): two models, `model_p1.onnx`
(text encoder + duration predictor) and `model_p2.onnx` (prior expansion +
flow reverse + HiFi-GAN decode), with the reference's exact I/O names,
layouts, and dynamic-axis annotations:

  p1: (input_text[B,T,Ctext], input_emo[B,1024], input_g[B] int64 sid)
      → (output_m_p[B,C,T], output_s_p[B,C,T], output_logw[B,1,T],
         output_g[B,gin])                    dynamic: input_text axis 1
  p2: (input_attn[B,Ty,Tx], input_m_p[B,C,Tx], input_s_p[B,C,Tx],
       input_g[B,gin], input_noise[B,C,Ty]) → output_wav[B,1,Twav]
                                 dynamic: attn axes 1,2; m_p/s_p/noise T axes

Internally the graphs are our channel-last jax graphs traced with
`jax.make_jaxpr` (vits_tpu.onnx.convert); boundary Transposes present the
reference's channel-first wire contract, so a consumer of the reference's
ONNX artifacts (e.g. its toolkits/onnx2engine.py TRT flow) can switch
without changes. The p1 graph is genuinely length-dynamic (verified by
evaluating at lengths other than the traced one); p2 is traced at a given
(t_x, t_y) and is shape-specialized beyond its annotated dynamic axes — pad
to serving buckets exactly as `EmoVITS` does (infer.py), the same contract a
TRT optimization profile imposes.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from . import convert
from ..nn.core import fold_weight_norm


def export_p1(synth, params, t_x: int = 48):
    """Serialized model_p1.onnx bytes for a Synthesizer + params."""
    p = fold_weight_norm(params)

    def fn(p, x, emo, sid):
        m_p, s_p, logw, g = synth.infer_p1(p, x, emo, sid.astype(jnp.int32))
        return (jnp.swapaxes(m_p, 1, 2), jnp.swapaxes(s_p, 1, 2),
                jnp.swapaxes(logw, 1, 2), g)

    x = np.zeros((1, t_x, synth.text_channels), np.float32)
    emo = np.zeros((1, 1024), np.float32)
    sid = np.zeros((1,), np.int64)
    return convert.convert_fn(
        fn, (x, emo, sid), p,
        input_names=["input_text", "input_emo", "input_g"],
        output_names=["output_m_p", "output_s_p", "output_logw", "output_g"],
        dynamic_axes={"input_text": {1: "text_len"},
                      "output_m_p": {2: "text_len"},
                      "output_s_p": {2: "text_len"},
                      "output_logw": {2: "text_len"}},
        graph_name="vits_tpu_p1")


def export_p2(synth, params, t_x: int = 48, t_y: int = 384):
    """Serialized model_p2.onnx bytes (shape-specialized at t_x × t_y)."""
    p = fold_weight_norm(params)
    up = 1
    for r in synth.upsample_rates:
        up *= r

    def fn(p, attn, m_p, s_p, g, noise):
        o = synth.infer_p2(p, attn, jnp.swapaxes(m_p, 1, 2),
                           jnp.swapaxes(s_p, 1, 2), g,
                           jnp.swapaxes(noise, 1, 2), packed=False)
        return jnp.swapaxes(o, 1, 2)

    C = synth.inter_channels
    attn = np.zeros((1, t_y, t_x), np.float32)
    m_p = np.zeros((1, C, t_x), np.float32)
    s_p = np.zeros((1, C, t_x), np.float32)
    g = np.zeros((1, synth.gin_channels), np.float32)
    noise = np.zeros((1, C, t_y), np.float32)
    return convert.convert_fn(
        fn, (attn, m_p, s_p, g, noise), p,
        input_names=["input_attn", "input_m_p", "input_s_p", "input_g",
                     "input_noise"],
        output_names=["output_wav"],
        dynamic_axes={"input_attn": {1: "frames", 2: "text_len"},
                      "input_m_p": {2: "text_len"},
                      "input_s_p": {2: "text_len"},
                      "input_noise": {2: "frames"},
                      "output_wav": {2: "samples"}},
        graph_name="vits_tpu_p2")


def export_onnx(synth, params, outdir, t_x: int = 48, t_y: int = 384):
    """Write model_p1.onnx / model_p2.onnx; returns the two paths."""
    import os
    os.makedirs(outdir, exist_ok=True)
    p1 = os.path.join(outdir, "model_p1.onnx")
    with open(p1, "wb") as f:
        f.write(export_p1(synth, params, t_x=t_x))
    p2 = os.path.join(outdir, "model_p2.onnx")
    with open(p2, "wb") as f:
        f.write(export_p2(synth, params, t_x=t_x, t_y=t_y))
    return p1, p2
