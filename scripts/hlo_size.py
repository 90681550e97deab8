#!/usr/bin/env python3
"""Lower the train step (mel and stft variants) at base config and report HLO
instruction counts — a local proxy for remote compile cost. No TPU needed."""
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp


def count_hlo(lowered):
    txt = lowered.as_text()
    # count stablehlo ops (lines with " = ")
    return sum(1 for line in txt.splitlines() if " = " in line), len(txt)


def main():
    from vits_tpu.config import get_hparams_from_file, default_config_path
    from vits_tpu.train.loop import build_models, build_optimizers, init_state
    from vits_tpu.train.step import TrainStepConfig, make_train_step

    hps = get_hparams_from_file(default_config_path("base"))
    batch_size, spec_frames, text_len = 8, 400, 96
    hps.adapt = False
    hps.use_dur_dis = False
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

    for variant in (sys.argv[1:] or ["mel", "stft"]):
        synth, disc, _ = build_models(hps, variant, False)
        gen_opt, disc_opt, _ = build_optimizers(hps, variant, False)
        state = init_state(hps, synth, disc, None, gen_opt, disc_opt, None)
        cfg = TrainStepConfig.from_hps(hps, variant=variant, compute_dtype=jnp.bfloat16)
        step = make_train_step(synth, disc, cfg, gen_opt, disc_opt)
        low = jax.jit(step, donate_argnums=(0,)).lower(
            state, batch, jax.random.PRNGKey(0), 2e-4, 2e-4, 0.01)
        n, size = count_hlo(low)
        print(f"{variant}: {n} stablehlo ops, {size/1e6:.1f} MB text")


if __name__ == "__main__":
    main()
