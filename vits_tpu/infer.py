"""Production batch-1 inference engine.

Capability parity with the reference infer.py (EmoVITS, infer.py:12-184):
deployment-checkpoint loading with weight-norm folding, speaker-id remap
`*.map` files and per-speaker K-means emotion banks `<spkid>.emo` with mtime
hot-reload (infer.py:77-133), a pre-sampled noise ring buffer (infer.py:69,
172-175), and the two-phase inference split — phase 1 encodes text + predicts
durations on device, the host expands durations into the alignment, phase 2
decodes (infer.py:160-182, models.py:558-575).

TPU twist: both phases are jitted with BUCKETED static shapes (text padded to
multiples of `text_quantum`, output frames to `frame_quantum`) + masks, so a
handful of compilations cover all requests; outputs are exact (the masked
graphs are bit-consistent with exact-length computation — see models/*.py).
"""

from __future__ import annotations

import os
import sys
from functools import partial
from typing import Dict, Optional, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp

from vits_tpu import config as config_mod
from vits_tpu.models.synthesizer import Synthesizer
from vits_tpu.nn.core import fold_weight_norm
from vits_tpu.ops.seq import infer_path, sequence_mask
from vits_tpu.utils import checkpoint as ckpt_mod
from vits_tpu.utils.summary import logger


def find_files(root_dir: str, suffix: str):
    out = []
    for root, _, files in os.walk(root_dir, followlinks=True):
        for fn in files:
            if fn.endswith(suffix):
                out.append(os.path.join(root, fn))
    return out


class EmoVITS:
    """Two-phase bucketed TTS inference (reference EmoVITS, infer.py:12-184)."""

    def __init__(self, checkpoint_path: Optional[str] = None, *, loglv: int = 0,
                 text_quantum: int = 32, frame_quantum: int = 64,
                 compute_dtype=None, quantize: Optional[bool] = None,
                 aot: Optional[bool] = None):
        self.loglv = loglv
        from vits_tpu.utils.jitcache import enable_persistent_cache
        enable_persistent_cache()  # serving restarts skip relay compiles
        # serving-mode knobs, env-overridable so the serving stack can opt in
        # without config plumbing: VITS_TPU_DTYPE=fp32|bf16, VITS_TPU_QUANTIZE=1
        if compute_dtype is None:
            dtype_name = os.environ.get("VITS_TPU_DTYPE", "fp32")
            dtype_map = {"bf16": jnp.bfloat16, "fp32": jnp.float32}
            compute_dtype = dtype_map.get(dtype_name)
            if compute_dtype is None:
                raise ValueError(
                    f"VITS_TPU_DTYPE={dtype_name!r} not recognized; "
                    f"valid values: {sorted(dtype_map)}")
        if quantize is None:
            quantize = os.environ.get("VITS_TPU_QUANTIZE", "0") not in ("0", "", "false")
        self.quantize = bool(quantize)
        self.compute_dtype = compute_dtype
        if checkpoint_path is None:
            checkpoint_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                           "..", "checkpoint", "checkpoint.npz")
        self.res_root_path = os.path.dirname(checkpoint_path)
        hps = config_mod.get_hparams_from_file(os.path.join(self.res_root_path, "config.json"))
        self.hps = hps
        self.sampling_rate = hps.data.sampling_rate
        self.hop_size = hps.data.hop_length
        self.text_channels = hps.data.text_channels
        self.inter_channels = hps.model.inter_channels
        self.num_speaker = hps.data.n_speakers
        self.noise_scale = hps.data.noise_scale
        self.text_quantum = text_quantum
        self.frame_quantum = frame_quantum
        self.max_text_len = getattr(hps.data, "max_text_len", 384)

        # speaker id remaps + emotion banks (hot-reloadable)
        self.spkid_mapping: Dict[int, int] = {}
        self.spkid_mapping_mtime: Dict[str, int] = {}
        for map_path in find_files(self.res_root_path, ".map"):
            self._load_spkid_mapping(map_path)
        self.spk_emo_embed: Dict[int, np.ndarray] = {}
        self.spk_emo_embed_mtime: Dict[str, int] = {}
        for emo_path in find_files(self.res_root_path, ".emo"):
            try:
                spkid = int(os.path.splitext(os.path.basename(emo_path))[0])
            except ValueError:
                continue
            self._load_spk_emo_embed(spkid)

        # model
        self.synth = Synthesizer.from_hps(hps)
        template = self.synth.init_params(jax.random.PRNGKey(0))
        if checkpoint_path.endswith((".pth", ".pt")):
            from vits_tpu.utils.torch_compat import load_torch_checkpoint
            params = load_torch_checkpoint(checkpoint_path, template)
        else:
            loaded, _, _ = ckpt_mod.load_checkpoint(checkpoint_path, {"model": template})
            params = loaded["model"]
        params = fold_weight_norm(params)
        if compute_dtype != jnp.float32:
            params = jax.tree_util.tree_map(
                lambda a: a.astype(compute_dtype) if a.dtype == jnp.float32 else a, params)
        self.params = jax.device_put(params)

        # pre-sampled noise ring buffer (infer.py:69); a device-resident copy
        # feeds the fused graph (in-graph dynamic_slice at a host-drawn start
        # — ring character with zero per-request noise transfer)
        rng = np.random.RandomState(12345)
        self.noise = (rng.randn(self.inter_channels * 4096) * self.noise_scale).astype(np.float32)
        self._noise_dev = None

        self._fused_cache = {}
        # Fused single-dispatch is the serving DEFAULT: measured 1.8× faster
        # end-to-end than two-phase at batch 1 (BASELINE.md batch-1 table —
        # it saves one ~25-30 ms relay round-trip) and, drawing its prior
        # noise from the same pre-sampled ring, keeps the reference noise
        # character. VITS_TPU_FUSED=0 restores the two-phase path.
        self._prefer_fused = os.environ.get(
            "VITS_TPU_FUSED", "1") not in ("0", "", "false")
        self._p1 = jax.jit(self._infer_p1_impl)
        self._p2 = jax.jit(self._infer_p2_impl)
        self._p2q = jax.jit(self._infer_p2_q8_impl)
        self._latent = jax.jit(self._latent_impl)
        self._calib = jax.jit(self._calib_impl)
        self._dec_chunk = jax.jit(self._dec_chunk_impl)
        # int8 decoder (nn.quant): activation scales are calibrated as a
        # running max-abs over the first `q8_calib_requests` requests (those
        # requests are served from the float path), then frozen with a safety
        # margin and gated on waveform correlation vs the float decode — a
        # single-request calibration silently clips later, larger activations.
        self.dec_q8 = None
        self._q8_record = None
        self._q8_seen = 0
        self.q8_calib_requests = max(1, int(os.environ.get(
            "VITS_TPU_Q8_CALIB_REQUESTS", "8")))
        self.q8_margin = float(os.environ.get("VITS_TPU_Q8_MARGIN", "1.1"))
        self.q8_min_corr = float(os.environ.get("VITS_TPU_Q8_MIN_CORR", "0.995"))

        # AOT serving (reference TRT-engine deployment, trt_infer.py:7-98):
        # serve from the .jaxexp artifacts written by `export --convert 1`
        # next to checkpoint.npz. Requests whose shapes exceed the exported
        # buckets fall back to the jitted path; the artifacts are validated
        # against the jit graph by tests/test_aot.py (check_trace analog).
        if aot is None:
            aot = os.environ.get("VITS_TPU_AOT", "0") not in ("0", "", "false")
        self.aot = None
        if aot:
            if compute_dtype != jnp.float32:
                raise ValueError("AOT artifacts are exported at fp32; "
                                 "use compute_dtype=fp32 with aot=True")
            from vits_tpu.serve.aot import AOTBundle
            bundle = AOTBundle(self.res_root_path)
            if bundle.text_buckets():
                self.aot = bundle
            else:
                logger.warning("aot=True but no .jaxexp artifacts in %s — "
                               "serving from the jitted path", self.res_root_path)
        self.inference = self.infer

    # ---------------- resource management (infer.py:77-133) ----------------
    def _load_spkid_mapping(self, mapfn: str):
        if not os.path.exists(mapfn):
            return
        with open(mapfn, "rt") as f:
            for line in f:
                line = line.strip()
                if not line or line[0] == "#":
                    continue
                arr = line.split()
                if len(arr) != 2 or not (arr[0].lstrip("-").isdigit() and arr[1].lstrip("-").isdigit()):
                    continue
                self.spkid_mapping[int(arr[0])] = int(arr[1])
        self.spkid_mapping_mtime[mapfn] = int(os.stat(mapfn).st_mtime)

    def _load_spk_emo_embed(self, spkid: int):
        emo_path = os.path.join(self.res_root_path, f"{spkid}.emo")
        if os.path.exists(emo_path):
            emb = np.fromfile(emo_path, dtype=np.float32).reshape(-1, 1024)
            self.spk_emo_embed[spkid] = emb
            self.spk_emo_embed_mtime[emo_path] = int(os.stat(emo_path).st_mtime)
            return emb
        return None

    def _get_spk_emo_embed(self, emo: tuple) -> np.ndarray:
        if isinstance(emo[0], (int, np.integer)):
            emb = self.spk_emo_embed.get(int(emo[0]))
            if emb is None:
                emb = self._load_spk_emo_embed(int(emo[0]))
            assert emb is not None, f"no emotion bank for speaker {emo[0]}"
        elif isinstance(emo[0], np.ndarray):
            emb = emo[0].reshape(-1, 1024).astype(np.float32)
        else:
            raise ValueError("emo[0] must be int or ndarray")
        eid = -1 if len(emo) == 1 else int(emo[1])
        if eid < 0 or eid >= emb.shape[0]:
            eid = np.random.randint(0, emb.shape[0])
        return emb[eid]

    def update(self):
        """mtime-driven hot reload of maps/banks (infer.py:118-133)."""
        for map_path in list(self.spkid_mapping_mtime.keys()):
            if not os.path.exists(map_path):
                self.spkid_mapping_mtime.pop(map_path)
                continue
            if int(os.stat(map_path).st_mtime) != self.spkid_mapping_mtime[map_path]:
                self._load_spkid_mapping(map_path)
        for emo_path in list(self.spk_emo_embed_mtime.keys()):
            if not os.path.exists(emo_path):
                self.spk_emo_embed_mtime.pop(emo_path)
                continue
            if int(os.stat(emo_path).st_mtime) != self.spk_emo_embed_mtime[emo_path]:
                self._load_spk_emo_embed(int(os.path.splitext(os.path.basename(emo_path))[0]))

    # ---------------- jitted phases ----------------
    def _infer_p1_impl(self, params, x, x_mask, emo, sid):
        # requests arrive as fp32 numpy; run the graph in the serving dtype
        # (params are already cast — mixed-dtype convs are a trace error)
        dt = self.compute_dtype
        return self.synth.infer_p1(params, x.astype(dt), emo.astype(dt), sid,
                                   x_mask=x_mask.astype(dt))

    def _infer_p2_impl(self, params, attn, m_p, s_p, g, noise, y_mask):
        return self.synth.infer_p2(params, attn, m_p, s_p, g, noise, y_mask=y_mask)

    def _infer_p2_q8_impl(self, params, dec_q8, attn, m_p, s_p, g, noise, y_mask):
        return self.synth.infer_p2(params, attn, m_p, s_p, g, noise, y_mask=y_mask,
                                   dec_q8=dec_q8)

    def _latent_impl(self, params, attn, m_p, s_p, g, noise, y_mask):
        """Decoder input z (infer_p2 minus the decode) — for calibration."""
        attn = attn.astype(m_p.dtype)
        ym = y_mask.astype(m_p.dtype)
        m_e = jnp.einsum("byx,bxc->byc", attn, m_p)
        s_e = jnp.einsum("byx,bxc->byc", attn, s_p)
        z_p = m_e + noise.astype(m_p.dtype) * s_e
        z = self.synth.flow.apply(params["flow"], z_p, ym, g=g, reverse=True)
        return z * ym

    def _calib_impl(self, params, z, g, y_mask):
        """Per-request max-abs record of every quantizable conv input."""
        return self.synth.dec.calibrate(params["dec"], z, g=g,
                                        x_mask=y_mask.astype(z.dtype))

    def _dec_chunk_impl(self, params, z_chunk, g, y_mask_chunk):
        """Masked decode of one latent window (streaming path)."""
        return self.synth.dec.apply(params["dec"], z_chunk, g=g,
                                    x_mask=y_mask_chunk.astype(z_chunk.dtype))

    def _q8_observe(self, attn_j, m_p, s_p, g, noise_j, y_mask_j):
        """Fold one request's activation statistics into the running record;
        freeze + quality-gate the int8 decoder once enough requests were seen.
        Returns True once the quantized path is ready to serve."""
        if self.dec_q8 is not None:
            return True
        z_cal = self._latent(self.params, attn_j, m_p, s_p, g, noise_j, y_mask_j)
        record = self._calib(self.params, z_cal, g, y_mask_j)
        if self._q8_record is None:
            self._q8_record = record
        else:
            self._q8_record = jax.tree_util.tree_map(
                jnp.maximum, self._q8_record, record)
        self._q8_seen += 1
        if self._q8_seen < self.q8_calib_requests:
            return False
        scales = jax.tree_util.tree_map(
            lambda a: a * self.q8_margin, self._q8_record)
        dec_q8 = jax.jit(self.synth.dec.quantize)(self.params["dec"], scales)
        # one-time quality gate: int8 decode must correlate with the float
        # decode on the freezing request (the analog of bench.py's corr gate)
        wav_f = np.asarray(self._p2(self.params, attn_j, m_p, s_p, g,
                                    noise_j, y_mask_j), np.float32).ravel()
        wav_q = np.asarray(self._p2q(self.params, dec_q8, attn_j, m_p, s_p, g,
                                     noise_j, y_mask_j), np.float32).ravel()
        denom = float(np.linalg.norm(wav_f) * np.linalg.norm(wav_q))
        corr = float(wav_f @ wav_q) / denom if denom > 0 else 0.0
        if corr < self.q8_min_corr:
            logger.warning("int8 decoder failed the correlation gate "
                           "(%.4f < %.4f) — serving stays on the float path",
                           corr, self.q8_min_corr)
            self.quantize = False
            return False
        self.dec_q8 = dec_q8
        return True

    @staticmethod
    def _quantize(n, q, cap=None):
        m = ((n + q - 1) // q) * q
        return min(m, cap) if cap else m

    def _resolve_request(self, spkid: int, text: np.ndarray, emo):
        """Speaker remap + emotion-vector resolution shared by infer paths."""
        x_length = int(text.shape[0])
        spkid = self.spkid_mapping.get(spkid, spkid)
        assert spkid < self.num_speaker, f"spkid={spkid} >= {self.num_speaker}"
        if isinstance(emo, np.ndarray) and emo.ndim <= 2 and emo.size == 1024:
            emo_vec = emo.reshape(-1).astype(np.float32)
        else:
            if emo is None:
                emo = (spkid, -1)
            if isinstance(emo[0], (int, np.integer)):
                first = self.spkid_mapping.get(int(emo[0]), int(emo[0])) if emo[0] != 0 else spkid
                emo = (first, -1 if len(emo) == 1 else emo[1])
            emo_vec = self._get_spk_emo_embed(emo)
        return spkid, emo_vec, x_length

    def _run_phase1(self, spkid, text, emo_vec, x_length, x_pad, aot_tb=None):
        x = np.zeros((1, x_pad, self.text_channels), np.float32)
        x[0, :x_length] = text[:x_pad]
        x_mask = np.zeros((1, x_pad, 1), np.float32)
        x_mask[0, :x_length] = 1.0
        args = (self.params, jnp.asarray(x), jnp.asarray(x_mask),
                jnp.asarray(emo_vec[None]), jnp.asarray([spkid], jnp.int32))
        if aot_tb:
            return self.aot.call_p1(aot_tb, *args)
        return self._p1(*args)

    def _alignment(self, w_ceil, x_length, x_pad, y_length, y_pad):
        """Host-side duration expansion + noise-ring slice (infer.py:169-176)."""
        dur = np.zeros((1, x_pad), np.float32)
        dur[0, :x_length] = w_ceil
        attn = np.asarray(infer_path(jnp.asarray(dur), y_pad), np.float32)
        nl = y_pad * self.inter_channels
        start = np.random.randint(max(self.noise.size - nl, 1))
        noise = np.resize(self.noise[start:start + nl], (nl,)).reshape(1, y_pad, self.inter_channels)
        y_mask = np.zeros((1, y_pad, 1), np.float32)
        y_mask[0, :y_length] = 1.0
        return jnp.asarray(attn), jnp.asarray(noise), jnp.asarray(y_mask)

    def infer(self, spkid: int, text: np.ndarray, emo=None, *,
              duration_rate: float = 1.0):
        """text: (N, text_channels) float32 -> (wav float32 (T,), emo used).

        Batch-1 requests route through the fused single-dispatch graph
        (infer_fused) by default — it skips the p1→host→p2 relay round-trip,
        which dominates short-utterance latency (BASELINE.md batch-1 table);
        VITS_TPU_FUSED=0 restores two-phase. int8 serving calibrates on the
        two-phase path (the calibration record needs the p1 artifacts), then
        dispatches the fused graph with the bf16 decoder — across bench
        runs fused+int8 measured within relay noise of fused bf16 at
        batch-1 shapes (graph 10.4-11.9 vs 10.4-10.9 ms; BASELINE.md), so
        int8 buys nothing there and bf16 keeps float-path waveform parity;
        VITS_TPU_FUSED_Q8=1 opts into the int8 fused decode. AOT bundles stay
        two-phase (the exported buckets are two-phase artifacts)."""
        if self._prefer_fused and self.aot is None and \
                (not self.quantize or self.dec_q8 is not None):
            return self.infer_fused(spkid, text, emo, duration_rate=duration_rate)
        return self._infer_two_phase(spkid, text, emo, duration_rate=duration_rate)

    def _infer_two_phase(self, spkid: int, text: np.ndarray, emo=None, *,
                         duration_rate: float = 1.0):
        spkid, emo_vec, x_length = self._resolve_request(spkid, text, emo)

        # phase 1 (bucketed text); prefer an AOT bucket when a bundle serves
        aot_tb = self.aot.pick_text_bucket(x_length) if self.aot else None
        x_pad = aot_tb or self._quantize(x_length, self.text_quantum, self.max_text_len)
        m_p, s_p, logw, g = self._run_phase1(spkid, text, emo_vec, x_length,
                                             x_pad, aot_tb)

        # host: durations -> alignment (infer.py:169-176)
        w = np.exp(np.asarray(logw, np.float32))[0, :x_length, 0] * duration_rate
        w_ceil = np.ceil(w)
        y_length = max(int(w_ceil.sum()), 1)
        aot_fb = (self.aot.pick_frame_bucket(aot_tb, y_length)
                  if aot_tb and not self.quantize else None)
        y_pad = aot_fb or self._quantize(y_length, self.frame_quantum)
        attn_j, noise_j, y_mask_j = self._alignment(w_ceil, x_length, x_pad,
                                                    y_length, y_pad)
        if self.quantize and self._q8_observe(attn_j, m_p, s_p, g, noise_j, y_mask_j):
            wav = self._p2q(self.params, self.dec_q8, attn_j, m_p, s_p, g,
                            noise_j, y_mask_j)
        elif aot_fb:
            wav = self.aot.call_p2(aot_tb, aot_fb, self.params, attn_j, m_p,
                                   s_p, g, noise_j, y_mask_j)
        else:
            wav = self._p2(self.params, attn_j, m_p, s_p, g, noise_j, y_mask_j)
        wav = np.asarray(wav, np.float32)[0, :y_length * self.hop_size, 0]
        return wav, emo_vec

    def infer_fused(self, spkid: int, text: np.ndarray, emo=None, *,
                    duration_rate: float = 1.0):
        """Single-dispatch batch-1 synthesis (latency path): text encode,
        duration predict, ON-DEVICE alignment (generate_path), flow reverse,
        and decode in ONE jitted graph — no host round-trip between phases
        (the reference's one-shot `infer`, models.py:517-556, vs the served
        two-phase split). The frame budget is a static bucket estimated from
        the text length (VITS_TPU_FUSED_FRAMES_PER_TOKEN, default 8); if the
        predicted durations overflow it, the call transparently falls back to
        the exact two-phase path. Prior noise is an in-graph dynamic_slice of
        the device-resident pre-sampled ring at a host-drawn start — the
        reference's noise-ring character (infer.py:69,172-175) with zero
        per-request noise transfer. The fused graph decodes in bf16 even when
        the int8 decoder is calibrated: at batch-1 shapes int8 measured
        within relay noise of bf16 across bench runs (sub-128-lane tiles +
        quantize traversals eat the MXU win int8 gets at batch 8;
        BASELINE.md batch-1 table, 2026-08-21), so bf16 keeps float-path
        waveform parity at no latency cost. VITS_TPU_FUSED_Q8=1 opts the
        fused graph into the int8 decoder anyway."""
        spkid, emo_vec, x_length = self._resolve_request(spkid, text, emo)
        x_pad = self._quantize(x_length, self.text_quantum, self.max_text_len)
        fpt = float(os.environ.get("VITS_TPU_FUSED_FRAMES_PER_TOKEN", "8"))
        max_frames = self._quantize(
            max(int(x_length * fpt * duration_rate), self.frame_quantum),
            self.frame_quantum)
        # the in-graph noise slice must fit the pre-sampled ring; a budget
        # beyond it is capped, and a genuine overflow then falls back to the
        # exact two-phase path below (y_frames >= max_frames)
        ring_frames = self.noise.size // self.inter_channels
        max_frames = min(max_frames, (ring_frames // self.frame_quantum)
                         * self.frame_quantum)
        use_q8 = self.dec_q8 is not None and os.environ.get(
            "VITS_TPU_FUSED_Q8", "0") not in ("0", "", "false")
        fn = self._fused_cache.get((x_pad, max_frames, use_q8))
        if fn is None:
            synth, dt, C = self.synth, self.compute_dtype, self.inter_channels

            def impl(params, dec_q8, ring, start, x, x_lengths, emo, sid, ls):
                nl = max_frames * C
                noise = jax.lax.dynamic_slice(ring, (start,), (nl,)) \
                    .reshape(1, max_frames, C)
                o, _, y_mask, _ = synth.inference(
                    params, None, x.astype(dt), x_lengths, emo.astype(dt), sid,
                    length_scale=ls, max_frames=max_frames, noise=noise,
                    dec_q8=dec_q8)
                return o, jnp.sum(y_mask[0]).astype(jnp.int32)

            fn = jax.jit(impl)
            self._fused_cache[(x_pad, max_frames, use_q8)] = fn
        if self._noise_dev is None:
            self._noise_dev = jax.device_put(self.noise)
        x = np.zeros((1, x_pad, self.text_channels), np.float32)
        x[0, :x_length] = text[:x_pad]
        nl = max_frames * self.inter_channels
        start = np.random.randint(max(self.noise.size - nl, 1))
        o, y_frames = fn(self.params, self.dec_q8 if use_q8 else None,
                         self._noise_dev, jnp.asarray(start, jnp.int32),
                         jnp.asarray(x), jnp.asarray([x_length], jnp.int32),
                         jnp.asarray(emo_vec[None]),
                         jnp.asarray([spkid], jnp.int32),
                         np.float32(duration_rate))
        y_frames = int(y_frames)
        if y_frames >= max_frames:  # frame budget clipped: exact 2-phase retry
            return self._infer_two_phase(spkid, text, emo,
                                         duration_rate=duration_rate)
        wav = np.asarray(o, np.float32)[0, :y_frames * self.hop_size, 0]
        return wav, emo_vec

    def infer_stream(self, spkid: int, text: np.ndarray, emo=None, *,
                     duration_rate: float = 1.0,
                     chunk_frames: Optional[int] = None,
                     halo: int = 24):
        """Streaming synthesis: yields float32 wav chunks whose concatenation
        is bit-identical to the two-phase `_infer_two_phase()` output
        (north-star config 5). NB: `infer()` defaults to the FUSED path,
        whose noise slice spans a different (bucketed) frame budget, so
        stream output matches two-phase serving (VITS_TPU_FUSED=0), not the
        fused default.

        Phase 1 + alignment run once; the latent z is computed in one jitted
        call, then decoded in overlapping windows with a receptive-field halo
        (Synthesizer.stream_decode semantics), keeping only each window's
        interior. With `chunk_frames` left at the frame quantum the noise-ring
        slice equals the non-streaming path's, so outputs match sample-for-
        sample. Per-window shapes take at most 3 distinct values (first /
        interior / last), bounding jit compilations.

        The first chunk arrives after ~(chunk+halo)/T of the decode work —
        time-to-first-audio instead of time-to-full-utterance.
        """
        chunk = chunk_frames or self.frame_quantum
        spkid, emo_vec, x_length = self._resolve_request(spkid, text, emo)
        x_pad = self._quantize(x_length, self.text_quantum, self.max_text_len)
        m_p, s_p, logw, g = self._run_phase1(spkid, text, emo_vec, x_length, x_pad)

        w = np.exp(np.asarray(logw, np.float32))[0, :x_length, 0] * duration_rate
        w_ceil = np.ceil(w)
        y_length = max(int(w_ceil.sum()), 1)
        y_pad = self._quantize(y_length, chunk)
        attn_j, noise_j, y_mask_j = self._alignment(w_ceil, x_length, x_pad,
                                                    y_length, y_pad)

        # masked latent once (flow reverse); chunked masked decode after
        z = self._latent(self.params, attn_j, m_p, s_p, g, noise_j, y_mask_j)
        up = self.hop_size
        for s in range(0, y_length, chunk):
            lo = max(0, s - halo)
            hi = min(y_pad, s + chunk + halo)
            seg = self._dec_chunk(self.params, z[:, lo:hi], g, y_mask_j[:, lo:hi])
            keep = min(chunk, y_length - s)
            yield np.asarray(seg, np.float32)[0, (s - lo) * up:(s - lo + keep) * up, 0]


def main(argv=None):
    """CLI decoding of .vec feature files (parity: infer.py main, 187-288)."""
    import argparse
    import logging
    import time
    from vits_tpu.utils.audio import write_wav

    parser = argparse.ArgumentParser(description="Decode dumped features with the TPU TTS generator.")
    parser.add_argument("--scpfn", "--scp", type=str, required=True)
    parser.add_argument("--spkid", "--sid", default=None, type=int)
    parser.add_argument("--emotion", "--emo", default=None, type=str,
                        help="(spkid|path, eid) emotion selector")
    parser.add_argument("--outdir", type=str, required=True)
    parser.add_argument("--checkpoint", "--ckpt", default=None, type=str)
    parser.add_argument("--verbose", type=int, default=1)
    parser.add_argument("--dtype", choices=("fp32", "bf16"), default=None,
                        help="compute dtype (default: VITS_TPU_DTYPE or fp32)")
    parser.add_argument("--quantize", action="store_true", default=None,
                        help="int8 decoder serving mode (nn.quant)")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO if args.verbose else logging.WARN)
    os.makedirs(args.outdir, exist_ok=True)
    dtype = {None: None, "fp32": jnp.float32, "bf16": jnp.bfloat16}[args.dtype]
    model = EmoVITS(args.checkpoint, loglv=args.verbose, compute_dtype=dtype,
                    quantize=args.quantize)

    features = {}
    with open(args.scpfn) as fid:
        for line in fid:
            line = line.strip()
            if not line or line[0] == "#":
                continue
            parts = line.split("|")
            utt_id = os.path.splitext(os.path.basename(parts[0]))[0]
            spkid = args.spkid if args.spkid is not None else (int(parts[-1]) if len(parts) > 1 else 1)
            emo = None
            src = args.emotion if args.emotion is not None else (parts[1] if len(parts) > 2 else None)
            if src:
                e = src.split(":")
                if os.path.exists(e[0]):
                    e0 = np.fromfile(e[0], dtype=np.float32).reshape(-1, 1024)
                else:
                    e0 = int(e[0])
                emo = (e0, int(e[1]) if len(e) > 1 else -1)
            features[utt_id] = (spkid, emo, parts[0])

    total_rtf, idx = 0.0, 0
    for idx, (utt_id, (spkid, emo, vecfn)) in enumerate(features.items(), 1):
        start = time.time()
        text = np.fromfile(vecfn, dtype=np.float32).reshape(-1, model.text_channels)
        wav, _ = model.infer(spkid, text, emo)
        write_wav(os.path.join(args.outdir, f"{utt_id}.wav"), wav, model.sampling_rate)
        total_rtf += (time.time() - start) / (len(wav) / model.sampling_rate)
    if idx:
        logging.info("Finished generation of %d utterances (RTF = %.3f).", idx, total_rtf / idx)


if __name__ == "__main__":
    main()
