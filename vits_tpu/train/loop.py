"""Training orchestration.

Capability parity with the reference train.py / train_stft.py `run()` +
`train_and_evaluate()` + `evaluate()` (train.py:40-346): dataset + bucket
sampler + prefetch, model/optimizer construction, checkpoint resume (tolerant
merge; `adapt` resets step and optimizer — utils.py:19-45), per-epoch
exponential LR decay, per-step annealed alignment noise (explicit schedule
instead of the reference's mutated attribute, models.py:491-495), TensorBoard
scalars/images/audio, eval synthesis, G/D checkpointing, and the stop
conditions (adapt-steps cap, lr floor — train.py:149-150).

TPU-native execution: one jitted GAN step over a (data, model) mesh
(vits_tpu.parallel.mesh); multi-host uses jax.distributed + per-process data
shards from the rank-strided bucket sampler.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vits_tpu.models.synthesizer import Synthesizer, DurationDiscriminator
from vits_tpu.models.discriminators import MultiPeriodDiscriminator
from vits_tpu.models.mrd import MultiWaveSTFTDiscriminator
from vits_tpu.ops.stft import mel_spectrogram, spec_to_mel
from vits_tpu.parallel.mesh import (local_batch_to_global, make_mesh,
                                    make_sharded_train_step, replicate,
                                    shard_batch)
from vits_tpu.train.data import BucketSampler, Prefetcher, TextAudioSpeakerDataset, DEFAULT_BOUNDARIES
from vits_tpu.train.optim import Optimizer, exponential_lr
from vits_tpu.train.step import TrainStepConfig, make_train_step
from vits_tpu.utils import checkpoint as ckpt
from vits_tpu.utils import summary as S


def align_noise_at(hps, step: int) -> float:
    t = hps.train
    noise = getattr(t, "align_noise", 0.0) - getattr(t, "align_noise_decay", 0.0) * step
    return max(noise, getattr(t, "align_noise_min", 0.0))


def count_params(tree, exclude=("enc_q", "g")):
    """Generator parameter count excluding enc_q and weight-norm g duplicates
    (train.py:111-113 semantics)."""
    total = 0
    def rec(t, path):
        nonlocal total
        if isinstance(t, dict):
            for k, v in t.items():
                rec(v, path + [k])
        else:
            if "enc_q" in path or path[-1] == "g":
                return
            total += int(np.prod(np.shape(t)))
    rec(tree, [])
    return total


def build_models(hps, variant: str, use_dur_dis: bool):
    synth = Synthesizer.from_hps(hps)
    if variant == "mel":
        disc = MultiPeriodDiscriminator(getattr(hps.model, "use_spectral_norm", False))
    else:
        disc = MultiWaveSTFTDiscriminator()
    dur = DurationDiscriminator(hps.model.hidden_channels, 64, 5) if use_dur_dis else None
    return synth, disc, dur


def build_optimizers(hps, variant: str, use_dur_dis: bool):
    t = hps.train
    gen_opt = Optimizer("adamw", tuple(t.betas), t.eps, t.weight_decay)
    dkind = "adamw" if variant == "mel" else "radam"
    disc_opt = Optimizer(dkind, tuple(t.betas), t.eps, 0.0)
    dur_opt = Optimizer(dkind, tuple(t.betas), t.eps, 0.0) if use_dur_dis else None
    return gen_opt, disc_opt, dur_opt


def init_state(hps, synth, disc, dur, gen_opt, disc_opt, dur_opt, seed=None):
    key = jax.random.PRNGKey(hps.train.seed if seed is None else seed)
    kg, kd, kp = jax.random.split(key, 3)
    state = {"gen": synth.init_params(kg), "disc": disc.init_params(kd),
             "step": jnp.zeros((), jnp.int32)}
    state["gen_opt"] = gen_opt.init(state["gen"])
    state["disc_opt"] = disc_opt.init(state["disc"])
    if dur is not None:
        state["dur"] = dur.init_params(kp)
        state["dur_opt"] = dur_opt.init(state["dur"])
    return state


def resume(hps, state, logger=None):
    """Resume from latest (or explicit) checkpoints with the reference's
    tolerant merge; adapt resets step/optimizer (utils.py:19-45)."""
    model_dir = hps.model_dir
    adapt = getattr(hps, "adapt", False)
    epoch = 1
    gpath = getattr(hps, "ckptG", None) or ckpt.latest_checkpoint_path(model_dir, "G_*.npz")
    dpath = getattr(hps, "ckptD", None) or ckpt.latest_checkpoint_path(model_dir, "D_*.npz")
    if gpath and os.path.exists(gpath):
        tmpl = {"model": state["gen"]} if adapt else {"model": state["gen"], "optimizer": state["gen_opt"]}
        loaded, step, epoch = ckpt.load_checkpoint(gpath, tmpl)
        state["gen"] = loaded["model"]
        if not adapt:
            state["gen_opt"] = loaded["optimizer"]
            state["step"] = jnp.asarray(step, jnp.int32)
        if logger:
            logger.info("Resumed G from %s (adapt=%s)", gpath, adapt)
    if dpath and os.path.exists(dpath):
        tmpl = {"model": state["disc"]} if adapt else {"model": state["disc"], "optimizer": state["disc_opt"]}
        loaded, _, _ = ckpt.load_checkpoint(dpath, tmpl)
        state["disc"] = loaded["model"]
        if not adapt:
            state["disc_opt"] = loaded["optimizer"]
        if logger:
            logger.info("Resumed D from %s (adapt=%s)", dpath, adapt)
    # duration-discriminator resume (reference train.py:123,129: ckptP =
    # latest P_*.pth, loaded with optimizer unless adapt)
    if "dur" in state:
        ppath = ckpt.latest_checkpoint_path(model_dir, "P_*.npz")
        if ppath and os.path.exists(ppath):
            tmpl = {"model": state["dur"]} if adapt else {"model": state["dur"], "optimizer": state["dur_opt"]}
            loaded, _, _ = ckpt.load_checkpoint(ppath, tmpl)
            state["dur"] = loaded["model"]
            if not adapt:
                state["dur_opt"] = loaded["optimizer"]
            if logger:
                logger.info("Resumed P from %s (adapt=%s)", ppath, adapt)
    if adapt:
        state["step"] = jnp.zeros((), jnp.int32)
        epoch = 1
    return state, epoch


def save_all(hps, state, epoch: int):
    step = int(state["step"])
    ckpt.save_checkpoint(os.path.join(hps.model_dir, f"G_{step}.npz"),
                         {"model": jax.device_get(state["gen"]),
                          "optimizer": jax.device_get(state["gen_opt"])},
                         step=step, epoch=epoch)
    ckpt.save_checkpoint(os.path.join(hps.model_dir, f"D_{step}.npz"),
                         {"model": jax.device_get(state["disc"]),
                          "optimizer": jax.device_get(state["disc_opt"])},
                         step=step, epoch=epoch)
    if "dur" in state:
        ckpt.save_checkpoint(os.path.join(hps.model_dir, f"P_{step}.npz"),
                             {"model": jax.device_get(state["dur"]),
                              "optimizer": jax.device_get(state["dur_opt"])},
                             step=step, epoch=epoch)


# Reference TensorBoard tag names (train.py:253-265) for the step metrics.
_TAG_MAP = {
    "loss_g_total": "loss/g/total", "loss_disc": "loss/d/total",
    "loss_fm": "loss/g/fm", "loss_mel": "loss/g/mel",
    "loss_stft": "loss/g/stft", "loss_dur": "loss/g/dur",
    "loss_kl": "loss/g/kl", "loss_kl_q": "loss/g/kl_q",
    "loss_disc_p": "loss/p/total", "loss_gen_p": "loss/p/gen",
}
# Per-sub-discriminator loss vectors → indexed reference tags.
_VEC_TAG_MAP = {
    "losses_g": "loss/g", "losses_d_r": "loss/d_r", "losses_d_g": "loss/d_g",
    "losses_p": "loss/p", "losses_p_r": "loss/p_r", "losses_p_g": "loss/p_g",
}


def log_train_summaries(writer, global_step: int, m: dict, lr: float):
    """Training-time TB summaries at reference parity (train.py:253-276):
    scalars (incl. per-sub-discriminator `loss/d_r/{i}`, `loss/d_g/{i}`,
    `loss/g/{i}`) and the mel-slice / full-mel / MAS-alignment images.

    `m` is the host-fetched metrics dict from the train step (scalars +
    `losses_*` vectors + `viz_*` tensors). Returns (scalars, images) so tests
    can assert the emitted keys."""
    scalars = {"learning_rate": float(lr)}
    for k, v in m.items():
        if k.startswith("viz_") or k in _VEC_TAG_MAP or np.ndim(v) != 0:
            continue
        if k == "loss_gen":
            # the aggregate adversarial G loss has no reference tag — the
            # reference emits only the per-sub `loss/g/{i}` (train.py:258);
            # emitting it as "loss/loss_gen" would off-reference the namespace
            continue
        scalars[_TAG_MAP.get(k, f"loss/{k}" if k.startswith("loss") else k)] = float(v)
    for k, base in _VEC_TAG_MAP.items():
        if k in m:
            for i, v in enumerate(np.asarray(m[k]).ravel()):
                scalars[f"{base}/{i}"] = float(v)
    images = {}
    if "viz_mel_org" in m:  # (T, C) channel-last → (C, T) for plotting
        images["slice/mel_org"] = S.plot_spectrogram_to_numpy(
            np.asarray(m["viz_mel_org"], np.float32).T)
        images["slice/mel_gen"] = S.plot_spectrogram_to_numpy(
            np.asarray(m["viz_mel_gen"], np.float32).T)
    if "viz_mel_all" in m:
        images["all/mel"] = S.plot_spectrogram_to_numpy(
            np.asarray(m["viz_mel_all"], np.float32).T)
    if "viz_attn" in m:
        images["all/attn"] = S.plot_alignment_to_numpy(
            np.asarray(m["viz_attn"], np.float32))
    S.summarize(writer, global_step, scalars=scalars, images=images)
    return scalars, images


# Cached jitted eval graphs, keyed on (synth config, text bucket, max_frames):
# on-chip evals must not dispatch hundreds of ops eagerly through the relay
# (VERDICT r2 task 6), and bucketing the text length keeps one compile across
# evals of different utterances. Synthesizer is a frozen (hashable) dataclass,
# so the config itself is the key — no id() aliasing after GC.
_EVAL_JIT = {}
_EVAL_TEXT_BUCKET = 32


def _eval_graph(synth, hps, t_bucket, max_frames):
    key = (synth, t_bucket, max_frames)
    fn = _EVAL_JIT.get(key)
    if fn is None:
        d = hps.data

        def graph(p, rng, x, x_lengths, emo, sid, noise_scale):
            o, attn, y_mask, _ = synth.inference(
                p, rng, x, x_lengths, emo, sid, noise_scale=noise_scale,
                max_frames=max_frames)
            # mel over the full static-length waveform; frames past y_len are
            # sliced off on the host
            mel = mel_spectrogram(o[..., 0], d.filter_length, d.n_mel_channels,
                                  d.sampling_rate, d.hop_length, d.win_length,
                                  d.mel_fmin, d.mel_fmax)
            return o, mel, jnp.sum(y_mask[0]).astype(jnp.int32)

        fn = jax.jit(graph)
        _EVAL_JIT[key] = fn
    return fn


def evaluate(hps, synth, gen_params, eval_dataset, writer, global_step, rng,
             first: bool = False):
    """Rank-0 single-utterance eval synthesis (train.py:289-346).

    `first` additionally logs the ground-truth mel/audio (train.py:335-337's
    global_step==0 branch). Also computes an eval mel-L1 scalar between the
    generated and GT mels over their overlapping frames (BASELINE.json
    metric 3; not in the reference, which only eyeballs the images).
    Returns the mel-L1 (or None when no eval data)."""
    if len(eval_dataset) == 0:
        return None
    item = eval_dataset[0]
    x = jnp.asarray(item["vec"])[None]
    emo = jnp.asarray(item["emo"])[None]
    sid = jnp.asarray([item["sid"]], jnp.int32)
    T_x = x.shape[1]
    t_bucket = -(-T_x // _EVAL_TEXT_BUCKET) * _EVAL_TEXT_BUCKET
    x = jnp.pad(x, ((0, 0), (0, t_bucket - T_x), (0, 0)))
    fn = _eval_graph(synth, hps, t_bucket, 1000)
    o, mel_full, y_frames = fn(gen_params, rng, x,
                               jnp.asarray([T_x], jnp.int32), emo, sid,
                               jnp.asarray(getattr(hps.data, "noise_scale", 1.0),
                                           jnp.float32))
    y_frames = int(y_frames)
    y_len = y_frames * hps.data.hop_length
    wav = np.asarray(o[0, :y_len, 0], dtype=np.float32)
    mel = np.asarray(mel_full[0], dtype=np.float32)[:y_frames]
    gt_mel = np.asarray(spec_to_mel(jnp.asarray(item["spec"])[None],
                                    hps.data.filter_length, hps.data.n_mel_channels,
                                    hps.data.sampling_rate, hps.data.mel_fmin,
                                    hps.data.mel_fmax))[0]
    n = min(mel.shape[0], gt_mel.shape[0])
    mel_l1 = float(np.mean(np.abs(mel[:n] - gt_mel[:n]))) if n else float("nan")
    images = {"gen/mel": S.plot_spectrogram_to_numpy(mel.T)}
    audios = {"gen/audio": wav}
    if first:
        images["gt/mel"] = S.plot_spectrogram_to_numpy(gt_mel.T)
        audios["gt/audio"] = np.asarray(item["wav"], np.float32)
    S.summarize(writer, global_step,
                scalars={"eval/mel_l1": mel_l1},
                images=images,
                audios=audios,
                audio_sampling_rate=hps.data.sampling_rate)
    return mel_l1


def run(hps, variant: str = "mel", max_steps: Optional[int] = None,
        mesh=None, log_cb=None):
    """Main training entry (single- or multi-host; call
    jax.distributed.initialize() before this on multi-host)."""
    from vits_tpu.utils.jitcache import enable_persistent_cache
    enable_persistent_cache()  # repeat runs skip the 30-200 s relay compiles
    is_main = jax.process_index() == 0
    logger = S.get_logger(hps.model_dir) if is_main else None
    writer = S.SummaryWriter(hps.model_dir) if is_main else None
    writer_eval = S.SummaryWriter(os.path.join(hps.model_dir, "eval")) if is_main else None
    if is_main:
        logger.info(hps.to_dict() if hasattr(hps, "to_dict") else hps)
        S.check_git_hash(hps.model_dir)

    use_dur_dis = getattr(hps, "use_dur_dis", False)
    mesh = mesh or make_mesh()
    # spec_on_device: the step computes spectrograms from the wav on device
    # (batch ships without "spec" — ~3× less host→device traffic, which
    # dominates real-pipeline step time through the relay). Host-side specs
    # remain available via hps.train.spec_on_device=False.
    spec_on_device = bool(getattr(hps.train, "spec_on_device", True))
    dataset = TextAudioSpeakerDataset(hps.data.training_files, hps,
                                      load_spec=not spec_on_device)
    eval_dataset = TextAudioSpeakerDataset(hps.data.validation_files, hps) \
        if is_main and os.path.exists(hps.data.validation_files) else []
    sampler = BucketSampler(dataset.lengths, hps.train.batch_size,
                            list(getattr(hps.train, "bucket_boundaries", DEFAULT_BOUNDARIES)),
                            num_replicas=jax.process_count(), rank=jax.process_index())
    if jax.process_count() == 1:
        # device placement runs in the prefetcher's bounded placement stage:
        # device_put is async so transfer overlaps the previous steps'
        # compute, while at most place_depth+1 batches sit staged in HBM
        place = lambda b: {**shard_batch(mesh, {k: v for k, v in b.items()
                                                if k != "wav_lengths"}),
                           "wav_lengths": b["wav_lengths"]}
    else:
        place = None  # multi-host: local shards assemble in the loop
    prefetcher = Prefetcher(
        dataset, sampler,
        workers=int(getattr(hps.train, "prefetch_workers", 8)),
        depth=int(getattr(hps.train, "prefetch_depth", 2)),
        # compact (int16 wav + bf16 text/emo) halves host→device bytes, but
        # its quantization only makes sense when the step computes in bf16;
        # fp32 parity/debug runs default to exact batches
        compact=bool(getattr(hps.train, "compact_batch",
                             getattr(hps.train, "bf16_run", False))),
        place=place,
        place_depth=int(getattr(hps.train, "prefetch_device_depth", 2)))

    synth, disc, dur = build_models(hps, variant, use_dur_dis)
    gen_opt, disc_opt, dur_opt = build_optimizers(hps, variant, use_dur_dis)
    state = init_state(hps, synth, disc, dur, gen_opt, disc_opt, dur_opt)
    state, epoch_start = resume(hps, state, logger)

    if is_main:
        logger.info("Load train files = %d", len(dataset))
        logger.info("Total parameters of Generator: %d", count_params(state["gen"]))
        logger.info("Total parameters of Discriminator: %d",
                    count_params(state["disc"], exclude=()))

    compute_dtype = jnp.bfloat16 if getattr(hps.train, "bf16_run", False) else jnp.float32
    cfg = TrainStepConfig.from_hps(hps, variant=variant, use_dur_dis=use_dur_dis,
                                   compute_dtype=compute_dtype)
    step_fn = make_train_step(synth, disc, cfg, gen_opt, disc_opt, dur, dur_opt)
    sharded_step = make_sharded_train_step(step_fn, mesh)
    state = replicate(mesh, state)

    t = hps.train
    global_step = int(state["step"])
    rng = jax.random.PRNGKey(t.seed + 17)
    t_last = time.time()
    audio_sec_acc = 0.0
    input_wait_acc = 0.0
    first_eval = True
    epoch = epoch_start
    lr = exponential_lr(t.learning_rate, t.lr_decay, epoch)
    lr_p = exponential_lr(1e-4, t.lr_decay, epoch)  # train.py:100-102,148
    # one continuous cross-epoch stream: the prefetch window never drains at
    # epoch boundaries (short corpora = few batches/epoch made those drains
    # the dominant input stall in the real-pipeline runs)
    batches = prefetcher.stream(epoch_start, t.epochs)
    while True:
        t_fetch = time.time()
        item = next(batches, None)
        if item is None:
            break
        batch_epoch, batch = item
        if batch_epoch != epoch:
            # epoch rollover: end-of-epoch terminations + lr schedule
            if (getattr(hps, "adapt", False) and global_step > t.steps) \
                    or lr <= 5e-6:
                break
            epoch = batch_epoch
            lr = exponential_lr(t.learning_rate, t.lr_decay, epoch)
            lr_p = exponential_lr(1e-4, t.lr_decay, epoch)
        # host wait on the input pipeline; compute is async-dispatched, so
        # any nonzero wait here is genuine input stall
        input_wait_acc += time.time() - t_fetch
        audio_sec = float(np.sum(batch["wav_lengths"])) / hps.data.sampling_rate
        batch.pop("wav_lengths", None)
        # single-host: the prefetcher transform already placed the batch
        # sharded over `data` (transfer overlapped with compute).
        # multi-host: each process holds only its rank-strided shard
        # (BucketSampler rank semantics = data_utils.py:231), so assemble
        # a global array from per-process shards instead.
        if jax.process_count() > 1:
            sb = local_batch_to_global(mesh, batch)
        else:
            sb = batch
        rng, sub = jax.random.split(rng)
        state, metrics = sharded_step(state, sb, sub, lr, lr,
                                      align_noise_at(hps, global_step), lr_p)
        global_step += 1
        audio_sec_acc += audio_sec
        if is_main and global_step % t.log_interval == 0:
            mh = jax.device_get(metrics)
            m = {k: float(v) for k, v in mh.items() if np.ndim(v) == 0}
            dt = time.time() - t_last
            m["audio_sec_per_s"] = audio_sec_acc / max(dt, 1e-9)
            m["input_stall_pct"] = 100.0 * input_wait_acc / max(dt, 1e-9)
            t_last = time.time()
            audio_sec_acc = 0.0
            input_wait_acc = 0.0
            logger.info("step %d epoch %d lr %.6g | %s", global_step, epoch, lr,
                        {k: round(v, 5) for k, v in m.items()})
            log_train_summaries(writer, global_step, {**mh, **m}, lr)
            if log_cb:
                log_cb(global_step, m)
        if is_main and global_step % t.eval_interval == 0:
            rng, sub = jax.random.split(rng)
            t_eval = time.time()
            # params are DP-replicated: take the local single-device
            # replica (no host round-trip through the relay)
            gen_local = jax.tree_util.tree_map(
                lambda a: a.addressable_data(0) if hasattr(a, "addressable_data") else a,
                state["gen"])
            mel_l1 = evaluate(hps, synth, gen_local, eval_dataset,
                              writer_eval, global_step, sub, first=first_eval)
            if mel_l1 is not None:
                logger.info("eval step %d mel_l1 %.4f wall %.2fs",
                            global_step, mel_l1, time.time() - t_eval)
            first_eval = False
            save_all(hps, jax.device_get(state), epoch)
        if max_steps is not None and global_step >= max_steps:
            break
    if is_main:
        save_all(hps, jax.device_get(state), epoch)
    return state, global_step
