#!/usr/bin/env python3
"""Benchmark: synthesized audio-seconds per second per chip (+ batch-1 RTF).

Runs on the real TPU chip (axon). Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

vs_baseline is the ratio to real-time synthesis (1.0 audio-sec/s), since the
reference publishes no numbers (BASELINE.md) and only instruments RTF
(infer.py:284-288).

Timing note: over the axon relay, block_until_ready can return before compute
finishes, so every timed region ends with a full host round-trip
(jax.device_get).
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from vits_tpu.config import get_hparams_from_file, default_config_path
    from vits_tpu.models.synthesizer import Synthesizer
    from vits_tpu.ops.seq import infer_path
    from vits_tpu.nn.core import fold_weight_norm

    hps = get_hparams_from_file(default_config_path("base"))
    synth = Synthesizer.from_hps(hps)
    params = fold_weight_norm(synth.init_params(jax.random.PRNGKey(0)))
    sr = hps.data.sampling_rate
    hop = hps.data.hop_length
    inter = hps.model.inter_channels

    # ---- config: batch-8 emotion-conditioned decode (BASELINE config 2) ----
    B, T_x, T_y = 8, 96, 768  # ~9.2 s audio per utterance at 16 kHz / hop 192
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T_x, hps.data.text_channels).astype(np.float32))
    emo = jnp.asarray(rng.randn(B, 1024).astype(np.float32))
    sid = jnp.asarray(rng.randint(0, hps.data.n_speakers, B), jnp.int32)
    noise = jnp.asarray(rng.randn(B, T_y, inter).astype(np.float32) * hps.data.noise_scale)
    durations = jnp.full((B, T_x), T_y // T_x, jnp.float32)
    attn = infer_path(durations, T_y)

    p1 = jax.jit(lambda p, x, e, s: synth.infer_p1(p, x, e, s))
    p2 = jax.jit(lambda p, a, m, s, g, n: synth.infer_p2(p, a, m, s, g, n))

    m_p, s_p, logw, g = p1(params, x, emo, sid)
    wav = p2(params, attn, m_p, s_p, g, noise)
    np.asarray(wav)  # warm

    iters = 5
    t0 = time.time()
    for _ in range(iters):
        m_p, s_p, logw, g = p1(params, x, emo, sid)
        wav = p2(params, attn, m_p, s_p, g, noise)
    wav = np.asarray(wav)
    dt = (time.time() - t0) / iters
    audio_sec = B * T_y * hop / sr
    aps_b8 = audio_sec / dt

    # ---- batch-1 RTF (BASELINE metric; infer.py:284-288) ----
    x1, emo1, sid1 = x[:1], emo[:1], sid[:1]
    noise1, attn1 = noise[:1], attn[:1]
    m_p, s_p, logw, g = p1(params, x1, emo1, sid1)
    wav1 = np.asarray(p2(params, attn1, m_p, s_p, g, noise1))
    t0 = time.time()
    for _ in range(iters):
        m_p, s_p, logw, g = p1(params, x1, emo1, sid1)
        wav1 = p2(params, attn1, m_p, s_p, g, noise1)
    wav1 = np.asarray(wav1)
    dt1 = (time.time() - t0) / iters
    rtf = dt1 / (T_y * hop / sr)

    print(json.dumps({
        "metric": "synthesized_audio_sec_per_s_per_chip",
        "value": round(aps_b8, 2),
        "unit": "audio_sec/s",
        "vs_baseline": round(aps_b8 / 1.0, 2),
        "batch1_rtf": round(rtf, 5),
        "batch": B,
        "frames": T_y,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    sys.exit(main())
