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

# Peak compute used for the MFU estimate (the driver runs on one v5e chip:
# 197 bf16 TFLOP/s, 394 int8 TOP/s — public v5e spec). fp32 has no native
# MXU mode on v5e; the /2 figure is an assumption, flagged in the JSON.
PEAK_FLOPS = {"fp32": 197e12 / 2, "bf16": 197e12, "int8": 394e12}


def main():
    from vits_tpu.utils.jitcache import enable_persistent_cache
    enable_persistent_cache()
    from vits_tpu.config import get_hparams_from_file, default_config_path
    from vits_tpu.models.synthesizer import Synthesizer
    from vits_tpu.ops.seq import infer_path
    from vits_tpu.nn.core import fold_weight_norm

    hps = get_hparams_from_file(default_config_path("base"))
    synth = Synthesizer.from_hps(hps)
    params32 = fold_weight_norm(synth.init_params(jax.random.PRNGKey(0)))
    sr = hps.data.sampling_rate
    hop = hps.data.hop_length
    inter = hps.model.inter_channels

    # ---- config: batch-8 emotion-conditioned decode (BASELINE config 2) ----
    B, T_x, T_y = 8, 96, 768  # ~9.2 s audio per utterance at 16 kHz / hop 192
    rng = np.random.RandomState(0)
    inputs32 = dict(
        x=jnp.asarray(rng.randn(B, T_x, hps.data.text_channels).astype(np.float32)),
        emo=jnp.asarray(rng.randn(B, 1024).astype(np.float32)),
        noise=jnp.asarray(rng.randn(B, T_y, inter).astype(np.float32) * hps.data.noise_scale),
    )
    sid = jnp.asarray(rng.randint(0, hps.data.n_speakers, B), jnp.int32)
    durations = jnp.full((B, T_x), T_y // T_x, jnp.float32)
    attn32 = infer_path(durations, T_y)

    def run_variant(dtype):
        cast = lambda t: jax.tree_util.tree_map(
            lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a, t)
        params = cast(params32)
        x, emo, noise = cast(inputs32["x"]), cast(inputs32["emo"]), cast(inputs32["noise"])
        attn = cast(attn32)
        p1 = jax.jit(lambda p, x, e, s: synth.infer_p1(p, x, e, s))
        p2 = jax.jit(lambda p, a, m, s, g, n: synth.infer_p2(p, a, m, s, g, n))
        # On-device scalar checksum: device_get of it forces every queued op
        # to finish (data dependency) without pulling the 2.3 MB waveform
        # through the relay inside the timed region.
        ck = jax.jit(lambda w: jnp.sum(w.astype(jnp.float32)))
        m_p, s_p, logw, g = p1(params, x, emo, sid)
        wav = np.asarray(p2(params, attn, m_p, s_p, g, noise), np.float32)  # warm
        jax.device_get(ck(p2(params, attn, m_p, s_p, g, noise)))  # warm ck
        iters = 20
        t0 = time.time()
        for _ in range(iters):
            m_p, s_p, logw, g = p1(params, x, emo, sid)
            wav_d = p2(params, attn, m_p, s_p, g, noise)
        jax.device_get(ck(wav_d))
        dt = (time.time() - t0) / iters
        aps = B * T_y * hop / sr / dt

        x1, emo1, noise1, attn1 = x[:1], emo[:1], noise[:1], attn[:1]
        m_p, s_p, logw, g = p1(params, x1, emo1, sid[:1])
        jax.device_get(ck(p2(params, attn1, m_p, s_p, g, noise1)))
        t0 = time.time()
        for _ in range(iters):
            m_p, s_p, logw, g = p1(params, x1, emo1, sid[:1])
            wav1 = p2(params, attn1, m_p, s_p, g, noise1)
        jax.device_get(ck(wav1))
        rtf = ((time.time() - t0) / iters) / (T_y * hop / sr)
        return aps, rtf, wav, dt

    def run_q8(dtype):
        """int8 quantized-decoder serving mode (nn.quant): calibrate + quantize
        once, then time p1 (float) + p2 with the int8 decoder."""
        cast = lambda t: jax.tree_util.tree_map(
            lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a, t)
        params = cast(params32)
        x, emo, noise = cast(inputs32["x"]), cast(inputs32["emo"]), cast(inputs32["noise"])
        attn = cast(attn32)
        p1 = jax.jit(lambda p, x, e, s: synth.infer_p1(p, x, e, s))
        m_p, s_p, logw, g = p1(params, x, emo, sid)
        # calibration latents: the exact decoder input distribution
        z_cal = jax.jit(lambda p, a, m, s, g, n: synth.flow.apply(
            p["flow"], jnp.einsum("byx,bxc->byc", a, m) + n * jnp.einsum(
                "byx,bxc->byc", a, s), None, g=g, reverse=True))(
            params, attn, m_p, s_p, g, noise)
        dec_q8 = synth.quantize_decoder(params, z_cal, g)
        p2 = jax.jit(lambda p, q, a, m, s, g, n: synth.infer_p2(p, a, m, s, g, n, dec_q8=q))
        ck = jax.jit(lambda w: jnp.sum(w.astype(jnp.float32)))
        wav = np.asarray(p2(params, dec_q8, attn, m_p, s_p, g, noise), np.float32)
        jax.device_get(ck(p2(params, dec_q8, attn, m_p, s_p, g, noise)))
        iters = 20
        t0 = time.time()
        for _ in range(iters):
            m_p, s_p, logw, g = p1(params, x, emo, sid)
            wav_d = p2(params, dec_q8, attn, m_p, s_p, g, noise)
        jax.device_get(ck(wav_d))
        dt = (time.time() - t0) / iters
        aps = B * T_y * hop / sr / dt

        x1, emo1, noise1, attn1 = x[:1], emo[:1], noise[:1], attn[:1]
        m_p, s_p, logw, g = p1(params, x1, emo1, sid[:1])
        jax.device_get(ck(p2(params, dec_q8, attn1, m_p, s_p, g, noise1)))
        t0 = time.time()
        for _ in range(iters):
            m_p, s_p, logw, g = p1(params, x1, emo1, sid[:1])
            wav1 = p2(params, dec_q8, attn1, m_p, s_p, g, noise1)
        jax.device_get(ck(wav1))
        rtf = ((time.time() - t0) / iters) / (T_y * hop / sr)
        return aps, rtf, wav, dt, params, dec_q8

    def run_b1_e2e(dtype):
        """HONEST two-phase batch-1 latency: p1 dispatch -> host fetch of the
        predicted durations (a real relay round-trip — the cost the plain
        batch1_rtf rows exclude by precomputing attn) -> host alignment build
        -> p2 dispatch -> full waveform fetch (serving returns audio to the
        host). This is what EmoVITS.infer() actually does per request."""
        cast = lambda t: jax.tree_util.tree_map(
            lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a, t)
        params = cast(params32)
        x1 = cast(inputs32["x"][:1])
        emo1 = cast(inputs32["emo"][:1])
        noise1 = cast(inputs32["noise"][:1])
        p1 = jax.jit(lambda p, x, e, s: synth.infer_p1(p, x, e, s))
        p2 = jax.jit(lambda p, a, m, s, g, n: synth.infer_p2(p, a, m, s, g, n))

        def once():
            m_p, s_p, logw, g = p1(params, x1, emo1, sid[:1])
            w = np.exp(np.asarray(logw, np.float32))[0, :, 0]  # host sync
            w_ceil = np.ceil(np.minimum(w, 1.0)) * (T_y // T_x)  # pin audio len
            attn = infer_path(jnp.asarray(w_ceil[None], np.float32), T_y).astype(dtype)
            return np.asarray(p2(params, attn, m_p, s_p, g, noise1), np.float32)

        once()  # warm
        iters = 20
        t0 = time.time()
        for _ in range(iters):
            wav = once()
        dt = (time.time() - t0) / iters
        return dt / (T_y * hop / sr)

    def run_b1_stream_ttfa(dtype, chunk=64, halo=24):
        """Streaming time-to-first-audio: p1 -> host durations sync -> latent
        -> decode of the FIRST window only -> first chunk on the host
        (EmoVITS.infer_stream's first yield)."""
        cast = lambda t: jax.tree_util.tree_map(
            lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a, t)
        params = cast(params32)
        x1 = cast(inputs32["x"][:1])
        emo1 = cast(inputs32["emo"][:1])
        noise1 = cast(inputs32["noise"][:1])
        attn1 = cast(attn32[:1])
        p1 = jax.jit(lambda p, x, e, s: synth.infer_p1(p, x, e, s))
        latent = jax.jit(lambda p, a, m, s, g, n: synth.flow.apply(
            p["flow"], jnp.einsum("byx,bxc->byc", a, m) + n * jnp.einsum(
                "byx,bxc->byc", a, s), None, g=g, reverse=True))
        dec_chunk = jax.jit(lambda p, z, g: synth.dec.apply(p["dec"], z, g=g))

        def once():
            m_p, s_p, logw, g = p1(params, x1, emo1, sid[:1])
            np.asarray(logw, np.float32)  # host durations sync
            z = latent(params, attn1, m_p, s_p, g, noise1)
            seg = dec_chunk(params, z[:, :chunk + halo], g)
            return np.asarray(seg, np.float32)[0, :chunk * hop, 0]

        once()  # warm
        iters = 20
        t0 = time.time()
        for _ in range(iters):
            once()
        return (time.time() - t0) / iters

    def run_fused_b1(dtype, dec_q8=None, params=None):
        """Batch-1 latency via the fused single-dispatch graph (encode +
        on-device alignment + flow + decode in one jit) — no p1->host->p2
        round-trip. Same audio duration as the two-phase batch-1 RTF rows.
        dec_q8: the calibrated int8 decoder — the fused+int8 serving mode
        (EmoVITS's default path once quantize-mode calibration freezes)."""
        cast = lambda t: jax.tree_util.tree_map(
            lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a, t)
        if params is None:
            params = cast(params32)
        x1 = cast(inputs32["x"][:1])
        emo1 = cast(inputs32["emo"][:1])
        fused = jax.jit(lambda p, q, r, x, xl, e, s: synth.inference(
            p, r, x.astype(dtype), xl, e, s,
            noise_scale=hps.data.noise_scale, max_frames=T_y, dec_q8=q)[0])
        ck = jax.jit(lambda w: jnp.sum(w.astype(jnp.float32)))
        args = (params, dec_q8, jax.random.PRNGKey(0), x1,
                jnp.asarray([T_x], jnp.int32), emo1, sid[:1])
        jax.device_get(ck(fused(*args)))
        iters = 20
        t0 = time.time()
        for _ in range(iters):
            wav1 = fused(*args)
        jax.device_get(ck(wav1))
        rtf_graph = ((time.time() - t0) / iters) / (T_y * hop / sr)
        # end-to-end flavor: serving returns the audio, so include the full
        # waveform fetch (one relay round-trip — vs TWO on the 2-phase path)
        t0 = time.time()
        for _ in range(iters):
            np.asarray(fused(*args), np.float32)
        rtf_e2e = ((time.time() - t0) / iters) / (T_y * hop / sr)
        return rtf_graph, rtf_e2e

    aps32, rtf32, wav32, dt32 = run_variant(jnp.float32)
    apsbf, rtfbf, wavbf, dtbf = run_variant(jnp.bfloat16)
    apsq8, rtfq8, wavq8, dtq8, params_q8, dec_q8 = run_q8(jnp.bfloat16)
    rtf_fused, rtf_fused_e2e = run_fused_b1(jnp.bfloat16)
    rtf_fq8, rtf_fq8_e2e = run_fused_b1(jnp.bfloat16, dec_q8=dec_q8,
                                        params=params_q8)
    rtf_e2e = run_b1_e2e(jnp.bfloat16)
    ttfa_s = run_b1_stream_ttfa(jnp.bfloat16)
    # parity guards: reduced-precision waveforms must stay correlated w/ fp32
    corr = float(np.corrcoef(wav32.ravel(), wavbf.ravel())[0, 1])
    corr_q8 = float(np.corrcoef(wav32.ravel(), wavq8.ravel())[0, 1])
    candidates = [(aps32, rtf32, "fp32")]
    if np.isfinite(corr) and corr > 0.98:
        candidates.append((apsbf, rtfbf, "bf16"))
    if np.isfinite(corr_q8) and corr_q8 > 0.98:
        candidates.append((apsq8, rtfq8, "int8"))
    aps, rtf, mode = max(candidates, key=lambda c: c[0])

    # MFU / roofline accounting (VERDICT r2 task 2): closed-form useful
    # (dense-equivalent) FLOPs from utils/flops.py — cost_analysis() is null
    # on the axon backend. MFU = useful FLOPs / time / peak. For the int8
    # mode, MFU is a speed-of-light ratio: the lower-bound time with the
    # quantized decoder convs at the int8 peak and everything else at the
    # bf16 peak, divided by the measured time.
    from vits_tpu.utils import flops as FL
    fl = FL.infer_flops(synth, B, T_x, T_y)
    q8s = FL.infer_q8_split(synth, B, T_x, T_y)
    sol_q8 = q8s["int8"] / PEAK_FLOPS["int8"] + q8s["float"] / PEAK_FLOPS["bf16"]
    # EXECUTED decoder FLOPs incl. the phase-packing inflation the graph
    # actually runs (utils/flops.generator_executed_flops) — the honest
    # denominator for "how close to the machine" (BASELINE.md roofline)
    dec_exec = FL.generator_executed_flops(synth.dec, B, T_y)["total"]

    print(json.dumps({
        "metric": "synthesized_audio_sec_per_s_per_chip",
        "value": round(aps, 2),
        "unit": "audio_sec/s",
        "vs_baseline": round(aps / 1.0, 2),
        "batch1_rtf": round(rtf, 5),
        "batch1_rtf_fused_bf16": round(rtf_fused, 5),
        "batch1_rtf_e2e_bf16": round(rtf_e2e, 5),
        "batch1_rtf_fused_e2e_bf16": round(rtf_fused_e2e, 5),
        "batch1_rtf_fused_int8": round(rtf_fq8, 5),
        "batch1_rtf_fused_e2e_int8": round(rtf_fq8_e2e, 5),
        "batch1_stream_ttfa_ms": round(ttfa_s * 1e3, 2),
        "mode": mode,
        "fp32_audio_sec_per_s": round(aps32, 2),
        "bf16_audio_sec_per_s": round(apsbf, 2),
        "int8_audio_sec_per_s": round(apsq8, 2),
        "bf16_fp32_corr": round(corr, 5),
        "int8_fp32_corr": round(corr_q8, 5),
        "batch": B,
        "frames": T_y,
        "flops_per_batch": fl,
        "decoder_executed_gflop_per_batch": round(dec_exec / 1e9, 1),
        "gflop_per_audio_sec": round(fl / (B * T_y * hop / sr) / 1e9, 2),
        "mfu_fp32": round(fl / dt32 / PEAK_FLOPS["fp32"], 4),
        "mfu_bf16": round(fl / dtbf / PEAK_FLOPS["bf16"], 4),
        "mfu_int8": round(sol_q8 / dtq8, 4),
        "peak_tflops_assumed": {k: v / 1e12 for k, v in PEAK_FLOPS.items()},
        # Achieved machine peaks measured on this chip (BASELINE.md roofline,
        # scripts/probe_bw.py): mfu_* above divides by PAPER peaks and so
        # understates proximity to what the hardware actually delivers.
        "peak_measured_2026_08_21": {"bf16_tflops": 156.4, "int8_tops": 238.2,
                                     "hbm_gbps": 390.0},
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    sys.exit(main())
