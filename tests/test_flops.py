"""Cross-check the closed-form FLOP accounting (utils/flops.py) against XLA's
HloCostAnalysis on the CPU backend (where cost_analysis works; on the axon TPU
backend it returns nothing — the reason flops.py exists).

The analytic count covers conv/matmul work only, so it must be a lower bound
on (and the dominant share of) XLA's count, which also includes elementwise
and reduction FLOPs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vits_tpu.config import get_hparams_from_file, default_config_path
from vits_tpu.models.synthesizer import Synthesizer
from vits_tpu.ops.seq import infer_path
from vits_tpu.utils import flops as FL


def xla_flops(fn, *args):
    ca = jax.jit(fn).lower(*args).cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    f = float(ca.get("flops", 0.0)) if ca else 0.0
    if f <= 0:
        pytest.skip("backend exposes no cost analysis")
    return f


@pytest.fixture(scope="module")
def setup():
    hps = get_hparams_from_file(default_config_path("base"))
    synth = Synthesizer.from_hps(hps)
    params = synth.init_params(jax.random.PRNGKey(0))
    return hps, synth, params


def test_infer_p1_flops_match_xla(setup):
    hps, synth, params = setup
    B, T_x = 2, 192  # large T so padded-conv edge taps (<1%) don't skew the check
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T_x, hps.data.text_channels).astype(np.float32))
    emo = jnp.asarray(rng.randn(B, 1024).astype(np.float32))
    sid = jnp.asarray([0, 1], jnp.int32)
    got = xla_flops(lambda p, x, e, s: synth.infer_p1(p, x, e, s), params, x, emo, sid)
    want = FL.infer_p1_flops(synth, B, T_x)
    # analytic counts matmul work only (XLA adds elementwise/softmax/LN) but
    # counts padded convs at full T*k taps (XLA excludes edge-padding taps,
    # <1% at this T)
    assert 0.75 * got <= want <= 1.01 * got, (want, got)


def test_infer_p2_flops_match_xla(setup):
    hps, synth, params = setup
    B, T_x, T_y = 2, 32, 256
    inter = hps.model.inter_channels
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T_x, hps.data.text_channels).astype(np.float32))
    emo = jnp.asarray(rng.randn(B, 1024).astype(np.float32))
    sid = jnp.asarray([0, 1], jnp.int32)
    m_p, s_p, logw, g = jax.jit(lambda p, x, e, s: synth.infer_p1(p, x, e, s))(
        params, x, emo, sid)
    noise = jnp.asarray(rng.randn(B, T_y, inter).astype(np.float32))
    attn = infer_path(jnp.full((B, T_x), T_y // T_x, jnp.float32), T_y)
    # packed=False: the analytic count is useful (dense-equivalent) FLOPs; the
    # phase-packed serving graph executes extra structurally-zero MACs that
    # XLA counts but MFU must not credit.
    got = xla_flops(
        lambda p, a, m, s, g, n: synth.infer_p2(p, a, m, s, g, n, packed=False),
        params, attn, m_p, s_p, g, noise)
    want = FL.infer_p2_flops(synth, B, T_x, T_y)["total"]
    # decoder-conv dominated: analytic should be within a few % of XLA
    assert 0.85 * got <= want <= 1.01 * got, (want, got)


@pytest.mark.parametrize("variant", ["mel", "stft"])
def test_train_step_flops_reasonable(setup, variant):
    """The train-step estimate uses backward-pass conventions (bwd = 2x fwd)
    that XLA's actual autodiff graph only approximates (rematerialization,
    fused VJPs), so the tolerance is wider — but it must stay the dominant
    share and never exceed XLA's total."""
    hps, synth, _ = setup
    from vits_tpu.train.loop import build_models, build_optimizers, init_state
    from vits_tpu.train.step import TrainStepConfig, make_train_step

    hps.adapt = False
    hps.use_dur_dis = False
    synth, disc, _ = build_models(hps, variant, False)
    gen_opt, disc_opt, _ = build_optimizers(hps, variant, False)
    state = init_state(hps, synth, disc, None, gen_opt, disc_opt, None)
    cfg = TrainStepConfig.from_hps(hps, variant=variant, compute_dtype=jnp.float32)
    step = make_train_step(synth, disc, cfg, gen_opt, disc_opt)

    B, T_x, T_y = 2, 24, 96
    F = hps.data.filter_length // 2 + 1
    hop = hps.data.hop_length
    rng = np.random.RandomState(0)
    batch = {
        "x": jnp.asarray(rng.randn(B, T_x, hps.data.text_channels).astype(np.float32)),
        "x_lengths": jnp.asarray([T_x, T_x - 3], jnp.int32),
        "spec": jnp.asarray(np.abs(rng.randn(B, T_y, F)).astype(np.float32)),
        "spec_lengths": jnp.asarray([T_y, T_y - 7], jnp.int32),
        "wav": jnp.asarray(rng.uniform(-0.5, 0.5, (B, T_y * hop)).astype(np.float32)),
        "emo": jnp.asarray(rng.randn(B, 1024).astype(np.float32)),
        "sid": jnp.asarray([0, 1], jnp.int32),
    }
    got = xla_flops(step, state, batch, jax.random.PRNGKey(0), 2e-4, 2e-4, 0.01)
    want = FL.train_step_flops(synth, disc, cfg, B, T_x, T_y)
    assert 0.5 * got <= want <= 1.05 * got, (want, got)


def test_executed_flops_vs_useful(setup):
    """EXECUTED decoder FLOPs (phase-packing inflation included) dominate the
    useful count exactly where packing kicks in: base config inflates ~1.5×
    overall, stages with pack>1 inflate the most, and the unpacked stages
    stay close to useful (BASELINE.md roofline denominator)."""
    hps, synth, _ = setup
    B, T_y = 8, 768
    useful = FL.generator_flops(synth.dec, B, T_y)
    execd = FL.generator_executed_flops(synth.dec, B, T_y)
    assert execd["total"] > useful["total"] - useful["conds"]
    assert 1.3 < execd["total"] / useful["total"] < 1.8, execd["total"] / useful["total"]
    # packed stage 2 (C=64, p=2) executes at least 1.5x its share; stage-key
    # presence pins the per-stage breakdown shape
    for k in ("conv_pre", "stage0", "stage1", "stage2", "stage3", "conv_post"):
        assert k in execd and execd[k] > 0


def test_closed_form_magnitude(setup):
    """Pin the headline number: ~34 GFLOP per synthesized audio-second at the
    base config (VERDICT r2's independent estimate), so accidental formula
    regressions are caught."""
    hps, synth, _ = setup
    B, T_x, T_y = 8, 96, 768
    audio_sec = B * T_y * hps.data.hop_length / hps.data.sampling_rate
    per_sec = FL.infer_flops(synth, B, T_x, T_y) / audio_sec
    assert 30e9 < per_sec < 38e9, per_sec
