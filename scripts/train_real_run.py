#!/usr/bin/env python3
"""End-to-end on-chip training run through the REAL input pipeline
(BASELINE config 3 as an actual run, not a synthetic-batch bench).

Builds a synthetic base-config-scale corpus (scp + .vec/.emo/.wav files),
then drives vits_tpu.train.loop.run — BucketSampler, Prefetcher, native
dataio, jitted D-then-G step, jitted eval — for N steps on whatever backend
owns the process (the real chip under axon). Prints one JSON line with step
timing, compile count, input-pipeline stall %, eval cost, and the eval
mel-L1 trajectory.

Usage: python scripts/train_real_run.py [steps=300] [variant=mel] [batch=32]
"""

import json
import os
import sys
import time

import numpy as np


def build_corpus(root: str, hps, n: int = 192, seed: int = 0):
    """Synthetic utterances at base-config scale: 1.5-9.5 s of band-limited
    harmonic babble (not white noise, so spectrograms have structure), text
    vectors at ~ 1 token per 4 frames, 1024-d emotion embeddings."""
    from vits_tpu.utils.audio import write_wav
    os.makedirs(root, exist_ok=True)
    sr = hps.data.sampling_rate
    hop = hps.data.hop_length
    tc = hps.data.text_channels
    rng = np.random.RandomState(seed)
    lines = []
    for i in range(n):
        frames = rng.randint(int(1.5 * sr / hop), int(9.5 * sr / hop))
        T = frames * hop
        t = np.arange(T) / sr
        f0 = rng.uniform(80, 300)
        wav = np.zeros(T, np.float32)
        for h in range(1, 6):
            wav += rng.uniform(0.1, 0.5) / h * np.sin(
                2 * np.pi * f0 * h * t + rng.uniform(0, 6.28)).astype(np.float32)
        wav += 0.05 * rng.randn(T).astype(np.float32)
        wav *= 0.5 / max(1e-6, np.abs(wav).max())
        write_wav(os.path.join(root, f"u{i}.wav"), wav, sr)
        n_tok = max(4, frames // 4)
        rng.randn(n_tok, tc).astype(np.float32).tofile(os.path.join(root, f"u{i}.vec"))
        rng.randn(1024).astype(np.float32).tofile(os.path.join(root, f"u{i}.emo"))
        lines.append(f"{root}/u{i}.vec|{root}/u{i}.wav|{root}/u{i}.emo|{i % 16}")
    with open(os.path.join(root, "train.scp"), "w") as f:
        f.write("\n".join(lines))
    with open(os.path.join(root, "valid.scp"), "w") as f:
        f.write("\n".join(lines[:4]))
    return os.path.join(root, "train.scp"), os.path.join(root, "valid.scp")


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    variant = sys.argv[2] if len(sys.argv) > 2 else "mel"
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    import jax
    from vits_tpu.config import get_hparams_from_file, default_config_path
    from vits_tpu.train import loop as L

    hps = get_hparams_from_file(default_config_path("base"))
    root = os.environ.get("TRAIN_RUN_DIR", "/tmp/vits_tpu_train_run")
    corpus = os.path.join(root, "corpus")
    scp = os.path.join(corpus, "train.scp")
    if not os.path.exists(scp):
        t0 = time.time()
        build_corpus(corpus, hps)
        print(f"corpus built in {time.time() - t0:.1f}s", flush=True)
    hps.data.training_files = scp
    hps.data.validation_files = os.path.join(corpus, "valid.scp")
    hps.model_dir = os.path.join(root, f"logs_{variant}")
    hps.train.batch_size = batch
    hps.train.log_interval = 25
    hps.train.eval_interval = 100
    hps.train.epochs = 10_000
    hps.adapt = False

    # per-interval wall/throughput samples via the loop's log callback
    samples = []
    t_start = time.time()

    def log_cb(step, metrics):
        samples.append({"step": step,
                        "audio_sec_per_s": round(metrics.get("audio_sec_per_s", 0.0), 1),
                        "input_stall_pct": round(metrics.get("input_stall_pct", 0.0), 2),
                        "loss_g": round(metrics.get("loss_g_total", float("nan")), 3),
                        "wall_s": round(time.time() - t_start, 1)})
        print(json.dumps(samples[-1]), flush=True)

    state, global_step = L.run(hps, variant=variant, max_steps=steps, log_cb=log_cb)

    wall = time.time() - t_start

    # distinct jit shapes the step saw = (spec bucket, per-bucket text pad)
    # combos (data.Prefetcher pins ONE text pad per bucket)
    from vits_tpu.train.data import (BucketSampler, Prefetcher,
                                     TextAudioSpeakerDataset, DEFAULT_BOUNDARIES)
    ds = TextAudioSpeakerDataset(hps.data.training_files, hps)
    sampler = BucketSampler(ds.lengths, hps.train.batch_size,
                            list(DEFAULT_BOUNDARIES))
    pads = Prefetcher(ds, sampler)._text_pads()
    shapes = sorted({(sampler.bucket_upper_bound(bi), pads[bi])
                     for bi in range(len(sampler.buckets)) if sampler.buckets[bi]})

    # eval mel-L1 trajectory + wall costs from the loop's log
    evals = []
    try:
        import re
        with open(os.path.join(hps.model_dir, "train.log")) as f:
            for line in f:
                m = re.search(r"eval step (\d+) mel_l1 ([\d.]+) wall ([\d.]+)s", line)
                if m:
                    evals.append({"step": int(m.group(1)),
                                  "mel_l1": float(m.group(2)),
                                  "wall_s": float(m.group(3))})
    except OSError:
        pass
    # steady state = intervals after the first (which includes the compile)
    steady = samples[1:] if len(samples) > 1 else samples
    out = {
        "metric": f"train_run_{variant}_audio_sec_per_s",
        "value": round(float(np.mean([s["audio_sec_per_s"] for s in steady])), 1),
        "unit": "audio_sec/s",
        "steps": global_step,
        "batch": batch,
        "wall_s": round(wall, 1),
        "first_interval_wall_s": samples[0]["wall_s"] if samples else None,
        "input_stall_pct": round(float(np.mean([s["input_stall_pct"] for s in steady])), 2),
        "loss_g_first": samples[0]["loss_g"] if samples else None,
        "loss_g_last": samples[-1]["loss_g"] if samples else None,
        "jit_shapes": shapes,
        "evals": evals[-8:],
        "backend": jax.default_backend(),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
