#!/usr/bin/env python3
"""Training-step benchmark (BASELINE config 3): full GAN step on 1 chip —
MAS + flows + HiFi-GAN adversarial + mel loss on the base config.

Emits a JSON event stream: one "compiled" event (compile wall time), one
"step" event per timed iteration (per-step wall, synced via a scalar
device_get), then a final summary line with the median step time, steps/s,
audio-seconds/s, and MFU. Not invoked by the driver (bench.py is); used for
perf tracking.
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from vits_tpu.config import get_hparams_from_file, default_config_path
    from vits_tpu.train.loop import build_models, build_optimizers, init_state
    from vits_tpu.train.step import TrainStepConfig, make_train_step

    hps = get_hparams_from_file(default_config_path("base"))
    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    spec_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    variant = sys.argv[3] if len(sys.argv) > 3 else "mel"  # mel (train.py) | stft (train_stft.py)
    # 6th positional arg "dur" adds the duration discriminator (`-d` flag,
    # train.py:96-105) to the step — its on-chip cost had never been measured.
    use_dur_dis = len(sys.argv) > 5 and sys.argv[5] == "dur"
    text_len = 96

    hps.adapt = False
    hps.use_dur_dis = use_dur_dis
    synth, disc, dur = build_models(hps, variant, use_dur_dis)
    gen_opt, disc_opt, dur_opt = build_optimizers(hps, variant, use_dur_dis)
    state = init_state(hps, synth, disc, dur, gen_opt, disc_opt, dur_opt)
    compute_dtype = jnp.bfloat16 if getattr(hps.train, "bf16_run", False) else jnp.float32
    cfg = TrainStepConfig.from_hps(hps, variant=variant, use_dur_dis=use_dur_dis,
                                   compute_dtype=compute_dtype)
    step = jax.jit(make_train_step(synth, disc, cfg, gen_opt, disc_opt,
                                   dur_disc=dur, dur_opt=dur_opt),
                   donate_argnums=(0,))

    rng = np.random.RandomState(0)
    F = hps.data.filter_length // 2 + 1
    hop = hps.data.hop_length
    batch = {
        "x": jnp.asarray(rng.randn(batch_size, text_len, hps.data.text_channels).astype(np.float32)),
        "x_lengths": jnp.asarray([text_len - (i % 7) for i in range(batch_size)], jnp.int32),
        "spec": jnp.asarray(np.abs(rng.randn(batch_size, spec_frames, F)).astype(np.float32)),
        "spec_lengths": jnp.asarray([spec_frames - 13 * (i % 4) for i in range(batch_size)], jnp.int32),
        "wav": jnp.asarray(rng.uniform(-0.5, 0.5, (batch_size, spec_frames * hop)).astype(np.float32)),
        "emo": jnp.asarray(rng.randn(batch_size, 1024).astype(np.float32)),
        "sid": jnp.asarray(rng.randint(0, hps.data.n_speakers, batch_size), jnp.int32),
    }

    # Closed-form useful FLOPs of the full train step (utils/flops.py —
    # cost_analysis() is null on the axon backend). v5e peak: 197 bf16 TFLOP/s.
    from vits_tpu.utils import flops as FL
    step_flops = FL.train_step_flops(synth, disc, cfg, batch_size, text_len,
                                     spec_frames)

    # compile_s includes trace + XLA compile + first execution (timed around
    # the first call).
    t0 = time.time()
    state, metrics = step(state, batch, jax.random.PRNGKey(0), 2e-4, 2e-4, 0.01)
    jax.device_get(metrics["loss_g_total"])
    compile_s = time.time() - t0
    print(json.dumps({"event": "compiled", "compile_s": round(compile_s, 1)}),
          flush=True)

    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 20
    # per-iter sync: over the relay, queuing many donated-state steps with no
    # intermediate syncs buffers gigabytes host-side; a scalar device_get per
    # step keeps the pipeline honest and gives per-step wall times.
    times = []
    for i in range(iters):
        t0 = time.time()
        state, metrics = step(state, batch, jax.random.PRNGKey(i + 1), 2e-4, 2e-4, 0.01)
        loss = float(jax.device_get(metrics["loss_g_total"]))
        times.append(time.time() - t0)
        print(json.dumps({"event": "step", "i": i, "s": round(times[-1], 3)}),
              flush=True)
    dt = float(np.median(times))
    audio_sec = float(np.sum(np.asarray(batch["spec_lengths"]))) * hop / hps.data.sampling_rate

    print(json.dumps({
        "metric": f"train_{variant}{'_dur' if use_dur_dis else ''}_audio_sec_per_s_per_chip",
        "value": round(audio_sec / dt, 2),
        "unit": "audio_sec/s",
        "step_time_s": round(dt, 4),
        "steps_per_s": round(1.0 / dt, 3),
        "batch": batch_size,
        "spec_frames": spec_frames,
        "compile_s": round(compile_s, 1),
        "loss_g_total": round(loss, 3),
        "step_flops": step_flops,
        "mfu_bf16": round(step_flops / dt / 197e12, 4) if step_flops else None,
        "backend": jax.default_backend(),
    }), flush=True)


if __name__ == "__main__":
    main()
