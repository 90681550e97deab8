"""Smoke + behavior tests for the jitted GAN train step (tiny config, CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vits_tpu.models.synthesizer import Synthesizer, DurationDiscriminator
from vits_tpu.models.discriminators import MultiPeriodDiscriminator
from vits_tpu.models.mrd import MultiWaveSTFTDiscriminator
from vits_tpu.train.optim import Optimizer
from vits_tpu.train.step import TrainStepConfig, make_train_step

TINY = dict(
    text_channels=8, spec_channels=33, segment_size=8,
    inter_channels=8, hidden_channels=16, filter_channels=24,
    n_heads=2, n_layers=2, kernel_size=3, p_dropout=0.1,
    resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
    upsample_rates=(4, 2), upsample_initial_channel=64,
    upsample_kernel_sizes=(8, 4), resblock="2", ffn="FFN2",
    kernel_size_q=5, n_layers_q=3, hidden_size_d=16, kernel_size_d=5,
    p_dropout_d=0.5, act_func_d="ReLU", dilation_rate=(1, 1), n_flows=2,
    n_speakers=4, gin_channels=16,
)
HOP = 8  # == prod(upsample_rates)


def make_batch(B=2, T_x=11, T_y=24, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "x": jnp.asarray(rng.randn(B, T_x, TINY["text_channels"]).astype(np.float32)),
        "x_lengths": jnp.asarray([T_x - (i % 4) for i in range(B)], dtype=jnp.int32),
        "spec": jnp.asarray(np.abs(rng.randn(B, T_y, TINY["spec_channels"])).astype(np.float32)),
        "spec_lengths": jnp.asarray([T_y - (i % 3) * 3 for i in range(B)], dtype=jnp.int32),
        "wav": jnp.asarray(rng.uniform(-0.5, 0.5, (B, T_y * HOP)).astype(np.float32)),
        "emo": jnp.asarray(rng.randn(B, 1024).astype(np.float32)),
        "sid": jnp.asarray([i % TINY["n_speakers"] for i in range(B)], dtype=jnp.int32),
    }


def build(variant="mel", use_dur_dis=False, compute_dtype=jnp.float32):
    from vits_tpu.utils.tiny import init_gan_state, tiny_mrd_disc, tiny_step_config
    synth = Synthesizer(**TINY)
    cfg = tiny_step_config(variant, use_dur_dis=use_dur_dis,
                           compute_dtype=compute_dtype)
    if variant == "mel":
        disc = MultiPeriodDiscriminator(periods=(2, 3))
    else:
        disc = tiny_mrd_disc()
    gen_opt = Optimizer("adamw", (0.8, 0.99), 1e-9, 0.01)
    disc_opt = Optimizer("adamw" if variant == "mel" else "radam", (0.8, 0.99), 1e-9, 0.0)
    dur_disc = DurationDiscriminator(TINY["hidden_channels"], 8, 5) if use_dur_dis else None
    dur_opt = Optimizer("adamw", (0.8, 0.99), 1e-9, 0.0) if use_dur_dis else None
    state = init_gan_state(synth, disc, gen_opt, disc_opt, dur_disc, dur_opt)
    step = make_train_step(synth, disc, cfg, gen_opt, disc_opt, dur_disc, dur_opt)
    return step, state


def _finite_tree(t):
    return all(bool(jnp.isfinite(l).all()) for l in jax.tree_util.tree_leaves(t)
               if jnp.issubdtype(l.dtype, jnp.floating))


@pytest.mark.parametrize("variant", ["mel", "stft"])
def test_train_step_signature_stable(variant):
    """The output state's avals (incl. weak_type) AND pytree treedef must
    match the input state's, or every real training run retraces — through
    the TPU relay that is a full recompile PER STEP (~150 s mel; the stft
    variant hit exactly this via a per-call RAdamState NamedTuple class,
    measured 194 s/step at batch 32x400 until optim.RAdamState was hoisted
    to module level)."""
    step, state = build(variant, compute_dtype=jnp.bfloat16)
    jstep = jax.jit(step)
    s1, m1 = jstep(state, make_batch(), jax.random.PRNGKey(1), 2e-4, 2e-4, 0.01)
    _ = jstep(s1, make_batch(seed=2), jax.random.PRNGKey(2), 2e-4, 2e-4, 0.01)
    for k, v in m1.items():
        assert np.all(np.isfinite(np.asarray(v))), f"{k} not finite (bf16 step)"

    def aval(a):
        return (jnp.shape(a), str(jnp.result_type(a)),
                bool(getattr(a, "weak_type", False)))
    a0 = jax.tree_util.tree_map(aval, state)
    a1 = jax.tree_util.tree_map(aval, s1)
    mismatches = [
        (jax.tree_util.keystr(k), v0, v1)
        for (k, v0), (_, v1) in zip(jax.tree_util.tree_leaves_with_path(a0),
                                    jax.tree_util.tree_leaves_with_path(a1))
        if v0 != v1
    ]
    assert not mismatches, mismatches
    assert (jax.tree_util.tree_structure(s1)
            == jax.tree_util.tree_structure(state)), "state treedef changed"
    assert jstep._cache_size() == 1, "train step retraced between steps"


@pytest.mark.parametrize("variant", ["mel", "stft"])
def test_train_step_runs_and_updates(variant):
    step, state = build(variant)
    jstep = jax.jit(step)
    batch = make_batch()
    s1, m1 = jstep(state, batch, jax.random.PRNGKey(1), 2e-4, 2e-4, 0.01)
    s2, m2 = jstep(s1, make_batch(seed=2), jax.random.PRNGKey(2), 2e-4, 2e-4, 0.01)
    for m in (m1, m2):
        for k, v in m.items():
            assert np.all(np.isfinite(np.asarray(v))), f"{k} not finite"
    assert _finite_tree(s2["gen"]) and _finite_tree(s2["disc"])
    # params actually moved
    delta = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()),
                                   state["gen"], s2["gen"])
    assert max(jax.tree_util.tree_leaves(delta)) > 0
    assert int(s2["step"]) == 2
    assert float(m1["loss_disc"]) > 0 and float(m1["loss_g_total"]) > 0
    # observability outputs (train.py:253-276 parity): per-sub-discriminator
    # loss vectors + element-0 viz tensors for the image summaries
    n_sub = m1["losses_d_r"].shape[0]
    assert m1["losses_d_g"].shape == (n_sub,) and m1["losses_g"].shape == (n_sub,)
    assert m1["viz_attn"].ndim == 2  # (T_y, T_x)
    assert m1["viz_mel_org"].shape == m1["viz_mel_gen"].shape  # (seg_frames, n_mel)
    assert m1["viz_mel_org"].shape == (8, 20)
    if variant == "mel":
        assert m1["viz_mel_all"].shape[1] == 20  # full-length GT mel
    else:
        assert "viz_mel_all" not in m1  # train_stft.py logs slice mels + attn only


def test_train_step_compact_batch_matches_float():
    """Compact transport (int16 wav, bf16 text/emo — data.collate
    compact=True) runs the same step as the float batch to quantization
    tolerance; the step dequantizes on device."""
    import ml_dtypes
    step, state = build("mel")
    jstep = jax.jit(step)
    batch = make_batch()
    compact = dict(batch)
    wav = np.asarray(batch["wav"])
    compact["wav"] = jnp.asarray(
        np.clip(np.rint(wav * 32767.0), -32767, 32767).astype(np.int16))
    compact["x"] = jnp.asarray(np.asarray(batch["x"]).astype(ml_dtypes.bfloat16))
    compact["emo"] = jnp.asarray(np.asarray(batch["emo"]).astype(ml_dtypes.bfloat16))
    k = jax.random.PRNGKey(5)
    _, m_f = jstep(state, batch, k, 2e-4, 2e-4, 0.01)
    _, m_c = jstep(state, compact, k, 2e-4, 2e-4, 0.01)
    for key in ("loss_disc", "loss_g_total", "loss_mel"):
        a, b = float(m_f[key]), float(m_c[key])
        assert abs(a - b) <= 0.05 * abs(a) + 1e-3, (key, a, b)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_train_step_dur_disc(dtype):
    # bf16 included: the P discriminator must cast its params to the compute
    # dtype like D/G do (a real bf16 run hit a conv dtype mismatch here)
    step, state = build("mel", use_dur_dis=True, compute_dtype=dtype)
    jstep = jax.jit(step)
    s1, m1 = jstep(state, make_batch(), jax.random.PRNGKey(1), 2e-4, 2e-4, 0.0)
    assert np.isfinite(float(m1["loss_disc_p"]))
    assert np.isfinite(float(m1["loss_gen_p"]))
    # per-sub dur-disc losses (reference loss/p_r/{i}, loss/p_g/{i}, loss/p/{i})
    assert m1["losses_p_r"].shape == m1["losses_p_g"].shape == m1["losses_p"].shape
    delta = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()),
                                   state["dur"], s1["dur"])
    assert max(jax.tree_util.tree_leaves(delta)) > 0


def test_grad_flow_reaches_all_generator_params():
    """Every generator leaf (except the posterior's unused speaker path) gets a
    nonzero gradient signal within a couple of steps."""
    step, state = build("mel")
    jstep = jax.jit(step)
    s1, _ = jstep(state, make_batch(), jax.random.PRNGKey(3), 1e-2, 1e-2, 0.01)
    moved = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()),
                                   state["gen"], s1["gen"])
    flat, _ = jax.tree_util.tree_flatten_with_path(moved)
    frozen = [jax.tree_util.keystr(kp) for kp, v in flat if v == 0.0]
    # AdamW moves every param with nonzero grad; weight decay moves the rest.
    # Nothing should be perfectly frozen except zero-init'd scale-free leaves.
    allowed = [k for k in frozen if "post" in k]  # zero-init coupling post convs get grads; none expected frozen
    assert frozen == [] or frozen == allowed, f"frozen params: {frozen[:10]}"
