"""Emotion embedding extraction (1024-d per utterance).

Parity with the reference toolkits/extract_emotion.py (35-125): mean-pooled
hidden states of the audeering wav2vec2 emotion model, written as float32
`.emo` files. The HF model is loaded lazily (transformers is in the image; the
weights must be present locally in zero-egress environments — pass
`model_path`). Passing a `.onnx` file or an audonnx-style directory
(`model.onnx` inside) as `model_path` instead routes through onnxruntime —
the reference's second extractor, toolkits/extract_emotion2.py:14-31.
A deterministic spectral-statistics fallback keeps the SAT/data
pipelines runnable without the model: 1024-d features from band energies and
modulation statistics (clearly NOT the production embedding — install the
wav2vec2 weights for that).
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
from typing import Optional

import numpy as np

DEFAULT_MODEL = "audeering/wav2vec2-large-robust-12-ft-emotion-msp-dim"
_model_cache = {}


def _load_w2v2(model_path: str):
    if model_path in _model_cache:
        return _model_cache[model_path]
    import torch
    from transformers import Wav2Vec2Model, Wav2Vec2FeatureExtractor
    fe = Wav2Vec2FeatureExtractor.from_pretrained(model_path)
    model = Wav2Vec2Model.from_pretrained(model_path).eval()
    _model_cache[model_path] = (fe, model, torch)
    return _model_cache[model_path]


def extract_w2v2(wav: np.ndarray, sr: int, model_path: str = DEFAULT_MODEL) -> np.ndarray:
    """Mean-pooled wav2vec2 hidden states -> (1024,) float32
    (extract_emotion.py:55-83)."""
    fe, model, torch = _load_w2v2(model_path)
    inputs = fe(wav, sampling_rate=sr, return_tensors="pt")
    with torch.no_grad():
        hidden = model(inputs.input_values).last_hidden_state  # (1, T, 1024)
        emb = hidden.mean(dim=1)[0]
    return emb.numpy().astype(np.float32)


def _is_onnx_model(model_path: Optional[str]) -> bool:
    """True when model_path names an exported ONNX model: either a `.onnx`
    file or an audonnx-style directory containing `model.onnx`
    (extract_emotion2.py:14-21's zenodo archive layout)."""
    if not model_path:
        return False
    if model_path.endswith(".onnx"):
        return True
    return os.path.isdir(model_path) and os.path.exists(
        os.path.join(model_path, "model.onnx"))


def _onnx_session(model_path: str):
    try:
        import onnxruntime  # not in the base image; optional dependency
    except ImportError as e:
        raise RuntimeError(
            "model_path points at an ONNX model but onnxruntime is not "
            "installed; `pip install onnxruntime` or pass a HF transformers "
            "model path instead") from e
    onnx_file = (model_path if model_path.endswith(".onnx")
                 else os.path.join(model_path, "model.onnx"))
    return onnxruntime.InferenceSession(
        onnx_file, providers=["CPUExecutionProvider"])


def extract_onnx(wav: np.ndarray, sr: int, model_path: str,
                 session=None) -> np.ndarray:
    """Emotion embedding from an exported ONNX wav2vec2 model — the
    reference's second extractor (extract_emotion2.py:23-31: audonnx model,
    `hidden_states` head = pooled 1024-d embedding).

    `session` is injectable for tests; by default an onnxruntime CPU session
    is created (and cached) from `model_path`.
    """
    key = ("onnx", model_path)
    if session is None:
        if key not in _model_cache:
            _model_cache[key] = _onnx_session(model_path)
        session = _model_cache[key]
    if sr != 16000:
        raise ValueError(f"ONNX emotion model expects 16 kHz input, got {sr}")
    x = wav.astype(np.float32)
    peak = np.max(np.abs(x))
    if peak > 0:
        x = x / peak  # extract_emotion2.py:25 x /= max(abs(x))
    feed_name = session.get_inputs()[0].name
    out_names = [o.name for o in session.get_outputs()]
    # prefer the pooled-embedding head; fall back to the first output
    pick = "hidden_states" if "hidden_states" in out_names else out_names[0]
    (out,) = session.run([pick], {feed_name: x[None, :]})
    out = np.asarray(out, np.float32)
    if out.ndim == 3:  # (1, T, C) un-pooled export: mean-pool time
        out = out.mean(axis=1)
    return out.reshape(-1).astype(np.float32)


def extract_fallback(wav: np.ndarray, sr: int) -> np.ndarray:
    """Model-free stand-in: 64 mel-band log energies × (mean, std, deltas...)
    expanded/tiled to 1024 dims. Deterministic; for pipeline plumbing only."""
    from vits_tpu.utils.audio import spectrogram_np
    n_fft = 512
    spec = spectrogram_np(wav.astype(np.float32), n_fft, n_fft // 4, n_fft)  # (T, F)
    logspec = np.log(spec + 1e-5)
    feats = []
    for stat in (logspec.mean(0), logspec.std(0),
                 np.abs(np.diff(logspec, axis=0)).mean(0) if len(logspec) > 1 else logspec.mean(0)):
        feats.append(stat)
    v = np.concatenate(feats)
    v = np.resize(v, 1024)
    v = (v - v.mean()) / (v.std() + 1e-6)
    return v.astype(np.float32)


def extract_to_file(wav_path: str, emo_path: str,
                    model_path: Optional[str] = None) -> np.ndarray:
    from vits_tpu.utils.audio import load_wav_norm
    wav, sr = load_wav_norm(wav_path)
    if _is_onnx_model(model_path):
        emb = extract_onnx(wav, sr, model_path)
    elif model_path:
        emb = extract_w2v2(wav, sr, model_path)
    else:
        try:
            emb = extract_w2v2(wav, sr, DEFAULT_MODEL)
        except Exception:
            emb = extract_fallback(wav, sr)
    emb.astype(np.float32).tofile(emo_path)
    return emb


def main(argv=None):
    parser = argparse.ArgumentParser(description="Extract 1024-d emotion embeddings.")
    parser.add_argument("--wavdir", type=str, required=True)
    parser.add_argument("--outdir", type=str, default=None,
                        help="default: beside each wav")
    parser.add_argument("--model", type=str, default=None,
                        help="HF path of the wav2vec2 emotion model, or a "
                             ".onnx file / audonnx model dir (onnxruntime)")
    args = parser.parse_args(argv)
    wavs = sorted(glob.glob(os.path.join(args.wavdir, "**", "*.wav"), recursive=True))
    for w in wavs:
        out = (os.path.join(args.outdir, os.path.basename(w)[:-4] + ".emo")
               if args.outdir else w[:-4] + ".emo")
        extract_to_file(w, out, args.model)
        print(out)


if __name__ == "__main__":
    main()
