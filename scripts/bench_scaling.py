#!/usr/bin/env python3
"""Multi-host scaling harness (BASELINE config 5: N-host pod GAN training).

Runs the REAL-pipeline trainer (train.loop.run — BucketSampler rank striding,
Prefetcher, local_batch_to_global feed, jitted D-then-G step) at
process_count 1 and N via `jax.distributed`, and prints ONE BASELINE-style
JSON row with the per-leg audio-seconds/s and the scaling efficiency

    efficiency = throughput_per_process(N) / throughput(1)

(each process accounts only its local shard's audio, so per-process
throughput at perfect scaling equals the 1-process throughput; global
throughput is N x the per-process number).

On a real v5e pod, launch this once per host with --coord <host:port> and
the TPU backend; in this 1-chip environment the harness is validated on the
virtual CPU mesh (--tiny --cpu-devices 4), which exercises every moving part
except the ICI fabric: tests/test_scaling_harness.py asserts the efficiency
is computed from two real runs. The pod NUMBER awaits multi-host hardware
(BASELINE.md notes this).

Usage (driver mode):
  python scripts/bench_scaling.py [--nproc 2] [--steps 20] [--variant mel]
      [--batch 32] [--tiny] [--cpu-devices N] [--workdir DIR]

Reference surface: train.py:29-50 (torchrun/NCCL process group + DDP);
BASELINE.json configs[4].
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def tiny_hps(train_scp, valid_scp, batch):
    """Tiny full-HParams for the CPU-mesh validation (mirrors
    tests/test_loop.py's config; hop 8, 1600 Hz)."""
    from vits_tpu.config import HParams
    return HParams(**{
        "train": {
            "log_interval": 2, "eval_interval": 10_000, "seed": 1234,
            "epochs": 10_000, "steps": 30_000, "learning_rate": 2e-4,
            "betas": [0.8, 0.99], "eps": 1e-9, "batch_size": batch,
            "lr_decay": 0.999875, "segment_size": 64, "weight_decay": 0.01,
            "c_mel": 45, "c_dur": 2, "c_kl": 1.0, "c_kl_q": 0.01,
            "align_noise": 1e-2, "align_noise_decay": 1e-6,
            "align_noise_min": 1e-4, "bucket_boundaries": [8, 32, 64],
        },
        "data": {
            "training_files": train_scp, "validation_files": valid_scp,
            "max_text_len": 384, "max_wav_len": 1600 * 12, "text_channels": 16,
            "sampling_rate": 1600, "filter_length": 64, "hop_length": 8,
            "win_length": 64, "n_mel_channels": 20, "mel_fmin": 0.0,
            "mel_fmax": None, "n_speakers": 8, "noise_scale": 0.707,
        },
        "model": {
            "inter_channels": 8, "hidden_channels": 16, "filter_channels": 24,
            "n_heads": 2, "n_layers": 2, "kernel_size": 3, "p_dropout": 0.1,
            "ffn": "FFN2", "resblock": "2", "resblock_kernel_sizes": [3],
            "resblock_dilation_sizes": [[1, 3]], "upsample_rates": [4, 2],
            "upsample_initial_channel": 64, "upsample_kernel_sizes": [8, 4],
            "kernel_size_q": 5, "n_layers_q": 3, "hidden_size_d": 16,
            "kernel_size_d": 5, "p_dropout_d": 0.5, "act_func_d": "ReLU",
            "use_spectral_norm": False, "dilation_rate": [1, 1], "n_flows": 2,
            "gin_channels": 16,
        },
    })


def build_tiny_corpus(root, n=24, seed=3):
    """Tiny corpus matching tiny_hps (1600 Hz, hop 8, 16-d text)."""
    import numpy as np
    from vits_tpu.utils.audio import write_wav
    os.makedirs(root, exist_ok=True)
    rng = np.random.RandomState(seed)
    lines = []
    for i in range(n):
        T = rng.randint(16, 56) * 8
        write_wav(os.path.join(root, f"u{i}.wav"),
                  rng.uniform(-0.9, 0.9, T).astype(np.float32), 1600)
        rng.randn(rng.randint(4, 12), 16).astype(np.float32).tofile(
            os.path.join(root, f"u{i}.vec"))
        rng.randn(1024).astype(np.float32).tofile(os.path.join(root, f"u{i}.emo"))
        lines.append(f"{root}/u{i}.vec|{root}/u{i}.wav|{root}/u{i}.emo|{i % 4}")
    with open(os.path.join(root, "train.scp"), "w") as f:
        f.write("\n".join(lines))
    with open(os.path.join(root, "valid.scp"), "w") as f:
        f.write("\n".join(lines[:2]))


def worker(args):
    """One jax.distributed process: run the real-pipeline trainer for
    --steps, print rank 0's steady audio-s/s as `RESULT {...}`."""
    if args.cpu_devices:
        os.environ["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={args.cpu_devices}")
    import jax
    if args.cpu_devices:
        jax.config.update("jax_platforms", "cpu")
    if args.nproc > 1:
        jax.distributed.initialize(args.coord, num_processes=args.nproc,
                                   process_id=args.pid)
    import numpy as np
    from vits_tpu.train import loop as L

    corpus = os.path.join(args.workdir, "corpus")
    if args.tiny:
        hps = tiny_hps(os.path.join(corpus, "train.scp"),
                       os.path.join(corpus, "valid.scp"), args.batch)
    else:
        from vits_tpu.config import get_hparams_from_file, default_config_path
        sys.path.insert(0, os.path.join(REPO, "scripts"))
        hps = get_hparams_from_file(default_config_path("base"))
        hps.data.training_files = os.path.join(corpus, "train.scp")
        hps.data.validation_files = os.path.join(corpus, "valid.scp")
        hps.train.batch_size = args.batch
        hps.train.log_interval = 10
        hps.train.eval_interval = 10_000
        hps.train.epochs = 10_000
    hps.model_dir = os.path.join(args.workdir,
                                 f"logs_n{args.nproc}_r{args.pid}")
    hps.adapt = False

    samples = []
    L.run(hps, variant=args.variant, max_steps=args.steps,
          log_cb=lambda s, m: samples.append(m))
    if jax.process_index() == 0:
        steady = samples[1:] if len(samples) > 1 else samples
        tp = float(np.mean([m["audio_sec_per_s"] for m in steady])) if steady else 0.0
        stall = float(np.mean([m["input_stall_pct"] for m in steady])) if steady else 0.0
        print("RESULT " + json.dumps({
            "nproc": args.nproc, "audio_sec_per_s": round(tp, 2),
            "input_stall_pct": round(stall, 2),
            "devices": len(jax.devices())}), flush=True)


def run_leg(nproc, args):
    """Spawn nproc worker processes; return rank 0's RESULT dict."""
    port = free_port()
    procs = []
    for i in range(nproc):
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        env.pop("XLA_FLAGS", None)
        cmd = [sys.executable, os.path.abspath(__file__), "--worker",
               "--pid", str(i), "--nproc", str(nproc),
               "--coord", f"localhost:{port}",
               "--steps", str(args.steps), "--variant", args.variant,
               "--batch", str(args.batch), "--workdir", args.workdir,
               "--cpu-devices", str(args.cpu_devices)]
        if args.tiny:
            cmd.append("--tiny")
        procs.append(subprocess.Popen(cmd, stdout=subprocess.PIPE,
                                      stderr=subprocess.STDOUT, env=env,
                                      text=True))
    result = None
    for p in procs:
        out, _ = p.communicate(timeout=args.timeout)
        if p.returncode != 0:
            raise RuntimeError(f"worker failed:\n{out[-3000:]}")
        for line in out.splitlines():
            if line.startswith("RESULT "):
                result = json.loads(line[len("RESULT "):])
    if result is None:
        raise RuntimeError("no RESULT line from rank 0")
    return result


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--pid", type=int, default=0)
    ap.add_argument("--nproc", type=int, default=2)
    ap.add_argument("--coord", default="localhost:0")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--variant", default="mel", choices=("mel", "stft"))
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny config for the CPU-mesh validation")
    ap.add_argument("--cpu-devices", type=int, default=0,
                    help=">0: force CPU backend with N virtual devices/proc")
    ap.add_argument("--workdir", default="/tmp/vits_tpu_bench_scaling")
    ap.add_argument("--timeout", type=int, default=1800)
    args = ap.parse_args(argv)

    if args.worker:
        worker(args)
        return None

    os.makedirs(args.workdir, exist_ok=True)
    corpus = os.path.join(args.workdir, "corpus")
    if not os.path.exists(os.path.join(corpus, "train.scp")):
        if args.tiny:
            build_tiny_corpus(corpus)
        else:
            sys.path.insert(0, os.path.join(REPO, "scripts"))
            from train_real_run import build_corpus
            from vits_tpu.config import get_hparams_from_file, default_config_path
            build_corpus(corpus, get_hparams_from_file(default_config_path("base")))

    t0 = time.time()
    single = run_leg(1, args)
    multi = run_leg(args.nproc, args)
    eff = (multi["audio_sec_per_s"] / single["audio_sec_per_s"]
           if single["audio_sec_per_s"] > 0 else float("nan"))
    row = {
        "metric": f"train_{args.variant}_scaling_efficiency",
        "value": round(eff, 4),
        "unit": "per_process_throughput_ratio",
        "nproc": args.nproc,
        "audio_sec_per_s_1proc": single["audio_sec_per_s"],
        "audio_sec_per_s_per_proc_nproc": multi["audio_sec_per_s"],
        "global_audio_sec_per_s_nproc": round(
            multi["audio_sec_per_s"] * args.nproc, 2),
        "input_stall_pct_nproc": multi["input_stall_pct"],
        "devices_per_proc": multi["devices"],
        "steps": args.steps,
        "batch_per_proc": args.batch,
        "tiny": args.tiny,
        "wall_s": round(time.time() - t0, 1),
    }
    print(json.dumps(row), flush=True)
    return row


if __name__ == "__main__":
    main()
