#!/usr/bin/env python3
"""Time the real composed train step per-iteration, donate vs not."""

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

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    T_y = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    donate = (sys.argv[3] if len(sys.argv) > 3 else "donate") == "donate"
    T_x = 96

    hps = get_hparams_from_file(default_config_path("base"))
    hps.adapt = False
    hps.use_dur_dis = False
    synth, disc, _ = build_models(hps, "mel", False)
    gen_opt, disc_opt, _ = build_optimizers(hps, "mel", False)
    state = init_state(hps, synth, disc, None, gen_opt, disc_opt, None)
    cfg = TrainStepConfig.from_hps(hps, variant="mel", compute_dtype=jnp.bfloat16)
    step = jax.jit(make_train_step(synth, disc, cfg, gen_opt, disc_opt),
                   donate_argnums=(0,) if donate else ())

    rng = np.random.RandomState(0)
    F = hps.data.filter_length // 2 + 1
    hop = hps.data.hop_length
    batch = {
        "x": jnp.asarray(rng.randn(B, T_x, hps.data.text_channels).astype(np.float32)),
        "x_lengths": jnp.asarray([T_x] * B, jnp.int32),
        "spec": jnp.asarray(np.abs(rng.randn(B, T_y, F)).astype(np.float32)),
        "spec_lengths": jnp.asarray([T_y] * B, jnp.int32),
        "wav": jnp.asarray(rng.uniform(-0.5, 0.5, (B, T_y * hop)).astype(np.float32)),
        "emo": jnp.asarray(rng.randn(B, 1024).astype(np.float32)),
        "sid": jnp.asarray(rng.randint(0, hps.data.n_speakers, B), jnp.int32),
    }

    t0 = time.time()
    state, metrics = step(state, batch, jax.random.PRNGKey(0), 2e-4, 2e-4, 0.01)
    v = float(np.asarray(metrics["loss_g_total"]))
    print(json.dumps({"compile_s": round(time.time() - t0, 1), "donate": donate,
                      "loss": round(v, 3)}), flush=True)
    leaf = jax.tree_util.tree_leaves(state["gen"])[0]
    print("state device:", leaf.devices(), "committed:", leaf.committed, flush=True)

    for i in range(4):
        t0 = time.time()
        state, metrics = step(state, batch, jax.random.PRNGKey(i + 1), 2e-4, 2e-4, 0.01)
        v = float(np.asarray(metrics["loss_g_total"]))
        print(json.dumps({"iter": i, "s": round(time.time() - t0, 3),
                          "loss": round(v, 3)}), flush=True)


if __name__ == "__main__":
    main()
