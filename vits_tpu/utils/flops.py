"""Closed-form FLOP accounting for the VITS graphs (MFU instrumentation).

XLA's ``cost_analysis()`` returns nothing on the axon TPU backend, so
bench.py / bench_train.py count matmul-shaped FLOPs analytically from the
module configs instead (VERDICT r2 task 2). Conventions:

  * 1 MAC = 2 FLOPs, regardless of dtype;
  * only matmul-shaped work is counted — convs, dense layers, attention /
    alignment einsums, and the matmul-DFT STFT. Elementwise, normalization,
    and mask work is omitted: it is memory-bound and contributes no MXU time
    (and <2 % of the op count on these graphs);
  * shapes are computed by walking the exact conv plans of the module
    dataclasses (same ``_convs``/``_plan`` builders the forward pass uses),
    so the accounting stays in sync with the model code;
  * training backward: a differentiated conv/matmul costs 2x its forward
    (one contraction for the input grad, one for the weight grad), so a
    differentiated pass is 3x forward; a pass that only chains gradients
    (no weight grads, e.g. the G-step discriminator pass) is 2x; a pass
    under stop_gradient is 1x.

Cross-checked against XLA HloCostAnalysis on the CPU backend in
tests/test_flops.py. Reference surface: the metrics BASELINE.json asks for
(SURVEY.md §6); the reference itself publishes no FLOP numbers.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple


# ---------------------------------------------------------------------------
# primitive walkers
# ---------------------------------------------------------------------------

def conv1d_out_len(T: int, conv) -> int:
    pad = 0 if conv.padding == "VALID" else int(conv.padding)
    eff_k = conv.dilation * (conv.kernel_size - 1) + 1
    return (T + 2 * pad - eff_k) // conv.stride + 1


def conv1d_flops(B: int, T: int, conv) -> Tuple[float, int]:
    """(flops, T_out) of a Conv1d applied to (B, T, C_in)."""
    T_out = conv1d_out_len(T, conv)
    macs = B * T_out * conv.kernel_size * (conv.in_channels // conv.groups) * conv.out_channels
    return 2.0 * macs, T_out


def conv2d_flops(B: int, H: int, W: int, conv) -> Tuple[float, int, int]:
    """(flops, H_out, W_out) of a Conv2d applied to (B, H, W, C_in)."""
    kh, kw = conv.kernel_size
    sh, sw = conv.stride
    ph, pw = (0, 0) if conv.padding == "VALID" else conv.padding
    H_out = (H + 2 * ph - kh) // sh + 1
    W_out = (W + 2 * pw - kw) // sw + 1
    macs = B * H_out * W_out * kh * kw * conv.in_channels * conv.out_channels
    return 2.0 * macs, H_out, W_out


def conv_transpose1d_flops(B: int, T_in: int, conv) -> Tuple[float, int]:
    """(flops, T_out). Every input frame contributes k taps to the output."""
    macs = B * T_in * conv.kernel_size * conv.in_channels * conv.out_channels
    T_out = (T_in - 1) * conv.stride - 2 * conv.padding + conv.kernel_size
    return 2.0 * macs, T_out


def dense_flops(B: int, dense) -> float:
    return 2.0 * B * dense.in_features * dense.out_features


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------

def wn_flops(wn, B: int, T: int) -> float:
    """WN gated dilated stack (models/modules.py WN)."""
    h, L = wn.hidden_channels, wn.n_layers
    f = 0.0
    for i in range(L):
        f += conv1d_flops(B, T, wn._in_layer(i))[0]
        f += conv1d_flops(B, T, wn._res_skip_layer(i))[0]
    if wn.gin_channels:
        f += 2.0 * B * wn.gin_channels * 2 * h * L  # cond_layer Dense
    return f


def attention_encoder_flops(enc, B: int, T: int) -> float:
    """attentions.Encoder: per layer MHA (qkvo + 2 T^2 einsums) + FFN."""
    h = enc.hidden_channels
    f = 0.0
    for _ in range(enc.n_layers):
        f += 4 * 2.0 * B * T * h * h        # q, k, v, o projections
        f += 2 * 2.0 * B * T * T * h        # scores + probs@V
        ffn = enc._ffn()
        f += conv1d_flops(B, T, ffn._c1())[0]
        f += conv1d_flops(B, T, ffn._c2())[0]
        if enc.gin_channels and enc.ffn in ("FFN2", "FFN3"):
            f += dense_flops(B, ffn._cond())
    return f


def text_encoder_flops(te, B: int, T: int) -> float:
    h = te.hidden_channels
    f = 2.0 * B * T * te.in_channels * h            # emb Dense
    f += 2.0 * B * 1024 * h                          # emo_proj
    f += attention_encoder_flops(te._encoder(), B, T)
    f += 2.0 * B * T * h * 2 * te.out_channels       # proj conv 1x1
    return f


def duration_predictor_flops(dp, B: int, T: int) -> float:
    fch = dp.filter_channels
    f = 2.0 * B * T * dp.in_channels * fch           # pre 1x1
    f += 2 * 2.0 * B * dp.gin_channels * fch         # cond1/cond2
    f += 2 * 2.0 * B * T * dp.kernel_size * fch * fch  # conv_1, conv_2
    f += 2.0 * B * T * fch                            # proj
    return f


def posterior_encoder_flops(pe, B: int, T: int) -> float:
    h = pe.hidden_channels
    f = 2.0 * B * T * pe.in_channels * h
    f += wn_flops(pe._enc(), B, T)
    f += 2.0 * B * T * h * 2 * pe.out_channels
    return f


def flow_flops(fl, B: int, T: int) -> float:
    """ResidualCouplingBlock; forward and reverse cost the same."""
    f = 0.0
    for i in range(fl.n_flows):
        layer = fl._flow(i)
        h = layer.hidden_channels
        f += 2.0 * B * T * layer.half_channels * h           # pre 1x1
        f += wn_flops(layer._enc(), B, T)
        f += 2.0 * B * T * h * layer.half_channels * (2 - int(layer.mean_only))  # post
    return f


def generator_flops(gen, B: int, T: int) -> Dict[str, float]:
    """HiFi-GAN decoder on (B, T, inter). Breakdown dict + 'total'.
    'conds' are the per-resblock speaker Dense layers (stay float under q8)."""
    from vits_tpu.nn.core import Conv1d
    pre = Conv1d(gen.initial_channel, gen.upsample_initial_channel, 7, padding=3)
    out: Dict[str, float] = {"conv_pre": conv1d_flops(B, T, pre)[0],
                             "ups": 0.0, "resblocks": 0.0, "conds": 0.0}
    t = T
    for i in range(gen.num_upsamples):
        up = gen._up(i)
        fl, t = conv_transpose1d_flops(B, t, up)
        out["ups"] += fl
        for j in range(gen.num_kernels):
            rb = gen._resblock(i, j)
            for d in rb.dilation:
                out["resblocks"] += conv1d_flops(B, t, rb._c1(d))[0]
                out["resblocks"] += conv1d_flops(B, t, rb._c2())[0]
                out["conds"] += dense_flops(B, rb._cond())
    ch_last = gen.upsample_initial_channel // (2 ** gen.num_upsamples)
    post = Conv1d(ch_last, 1, 7, padding=3, bias=False)
    out["conv_post"] = conv1d_flops(B, t, post)[0]
    out["total"] = sum(v for k, v in out.items() if k != "total")
    return out


def generator_executed_flops(gen, B: int, T: int) -> Dict[str, float]:
    """EXECUTED decoder FLOPs under the phase-packed schedule the graph
    actually runs (nn.packed): a packed conv executes A dense taps over
    (p·C_in, p·C_out) kernels — an A·p/K inflation over the useful count
    wherever C < 128 forces packing (and ~A·u/K for the length-preserving
    packed transposed convs). This is the denominator behind BASELINE.md's
    roofline 'executed GFLOP' column; `generator_flops` stays the USEFUL
    count that the bench's MFU fields divide by. Returns per-stage totals +
    'total' (speaker conds excluded — they stay tiny Dense ops)."""
    from vits_tpu.nn.core import Conv1d
    from vits_tpu.nn.packed import _phase_map_regular, _phase_map_transposed
    pre = Conv1d(gen.initial_channel, gen.upsample_initial_channel, 7, padding=3)
    out: Dict[str, float] = {"conv_pre": conv1d_flops(B, T, pre)[0]}
    packs = gen._pack_schedule()
    t, p_cur = T, 1
    for i in range(gen.num_upsamples):
        u, k = gen.upsample_rates[i], gen.upsample_kernel_sizes[i]
        cin = gen.upsample_initial_channel // (2 ** i)
        cout = gen.upsample_initial_channel // (2 ** (i + 1))
        pad = (k - u) // 2
        stage = 0.0
        if k == 2 * pad + u:  # packed transposed form (Generator.apply)
            fmin, fmax, _, _ = _phase_map_transposed(k, p_cur, u, pad)
            A = fmax - fmin + 1
            stage += 2.0 * B * (t // p_cur) * A * (p_cur * cin) * (p_cur * u * cout)
        else:
            stage += conv_transpose1d_flops(B, t, gen._up(i))[0]
        t *= u
        p_cur = packs[i]
        M = t // p_cur
        for j in range(gen.num_kernels):
            rb = gen._resblock(i, j)
            for d in rb.dilation:
                for conv in (rb._c1(d), rb._c2()):
                    if p_cur > 1:
                        fmin, fmax, _, _ = _phase_map_regular(
                            conv.kernel_size, p_cur, conv.dilation, conv.padding)
                        A = fmax - fmin + 1
                        stage += 2.0 * B * M * A * (p_cur * conv.in_channels) \
                            * (p_cur * conv.out_channels)
                    else:
                        stage += conv1d_flops(B, t, conv)[0]
        out[f"stage{i}"] = stage
    ch_last = gen.upsample_initial_channel // (2 ** gen.num_upsamples)
    if p_cur > 1:
        fmin, fmax, _, _ = _phase_map_regular(7, p_cur, 1, 3)
        A = fmax - fmin + 1
        out["conv_post"] = 2.0 * B * (t // p_cur) * A * (p_cur * ch_last) * p_cur
    else:
        out["conv_post"] = conv1d_flops(B, t, Conv1d(ch_last, 1, 7, padding=3,
                                                     bias=False))[0]
    out["total"] = sum(v for k_, v in out.items() if k_ != "total")
    return out


# ---------------------------------------------------------------------------
# inference graphs
# ---------------------------------------------------------------------------

def infer_p1_flops(synth, B: int, T_x: int) -> float:
    """Phase 1: text encode + duration predict (synthesizer.infer_p1)."""
    return text_encoder_flops(synth.enc_p, B, T_x) + \
        duration_predictor_flops(synth.dp, B, T_x)


def infer_p2_flops(synth, B: int, T_x: int, T_y: int) -> Dict[str, float]:
    """Phase 2: expand + flow reverse + decode. Breakdown + 'total'."""
    dec = generator_flops(synth.dec, B, T_y)
    out = {
        "expand": 2 * 2.0 * B * T_y * T_x * synth.inter_channels,  # m_p_e, s_p_e
        "flow": flow_flops(synth.flow, B, T_y),
        "decoder": dec["total"],
        "dec_breakdown": dec,
    }
    out["total"] = out["expand"] + out["flow"] + out["decoder"]
    return out


def infer_flops(synth, B: int, T_x: int, T_y: int) -> float:
    """Full two-phase inference."""
    return infer_p1_flops(synth, B, T_x) + infer_p2_flops(synth, B, T_x, T_y)["total"]


def infer_q8_split(synth, B: int, T_x: int, T_y: int) -> Dict[str, float]:
    """FLOPs by execution dtype for the int8-decoder serving mode: the
    decoder convs (pre/ups/resblocks/post) run s8xs8->s32 on the MXU; the
    text encoder, flow, expand einsums, and speaker conds stay float."""
    p2 = infer_p2_flops(synth, B, T_x, T_y)
    dec = p2["dec_breakdown"]
    int8 = dec["conv_pre"] + dec["ups"] + dec["resblocks"] + dec["conv_post"]
    flt = infer_p1_flops(synth, B, T_x) + p2["expand"] + p2["flow"] + dec["conds"]
    return {"int8": int8, "float": flt, "total": int8 + flt}


# ---------------------------------------------------------------------------
# DSP + discriminators (training)
# ---------------------------------------------------------------------------

def stft_flops(B: int, T: int, fft: int, hop: int, win: int) -> float:
    """Matmul-DFT STFT (ops/stft.py): frames x (win -> F) for re and im."""
    frames = T // hop + 1  # center=True
    F = fft // 2 + 1
    return 2.0 * B * frames * win * F * 2


def mel_flops(B: int, T: int, fft: int, hop: int, win: int, n_mels: int) -> float:
    frames = T // hop + 1
    F = fft // 2 + 1
    return stft_flops(B, T, fft, hop, win) + 2.0 * B * frames * F * n_mels


def mpd_flops(mpd, B: int, T: int) -> float:
    """MultiPeriodDiscriminator forward on one (B, T, 1) wave."""
    f = 0.0
    for d in mpd._discs():
        if hasattr(d, "period"):  # DiscriminatorP: (B, T/p, p, 1) NHWC
            H = -(-T // d.period)
            W = d.period
            for conv in d._convs():
                fl, H, W = conv2d_flops(B, H, W, conv)
                f += fl
            f += conv2d_flops(B, H, W, d._post())[0]
        else:  # DiscriminatorS
            t = T
            for conv in d._convs():
                fl, t = conv1d_flops(B, t, conv)
                f += fl
            f += conv1d_flops(B, t, d._post())[0]
    return f


def mrd_flops(mrd, B: int, T: int,
              resolutions: Sequence[Tuple[int, int, int]]) -> float:
    """MultiWaveSTFTDiscriminator forward on one wave + its magnitudes."""
    f = 0.0
    mwd = mrd.mwd
    t, C = T, 1
    for i in range(mwd.num_dwt):
        d = mwd._disc(i)
        tt = t
        for conv in d._convs():
            fl, tt = conv1d_flops(B, tt, conv)
            f += fl
        if i + 1 < mwd.num_dwt:
            t, C = t // 2, C * 2
    mfd = mrd.mfd
    for i, (fft, hop, _win) in enumerate(resolutions):
        d = mfd._disc(i)
        H = fft // 2 + 1          # frequency axis
        W = T // hop + 1          # frames
        for conv in d._plan():
            fl, H, W = conv2d_flops(B, H, W, conv)
            f += fl
    return f


# ---------------------------------------------------------------------------
# training step
# ---------------------------------------------------------------------------

def train_step_flops(synth, disc, cfg, B: int, T_x: int, T_y: int) -> float:
    """Full D-then-G train step (train/step.py), base conventions above.

    Differentiated generator graph (3x): enc_p, enc_q, flow fwd, dp, decoder
    on the segment, flow reverse (z_q), prior-expand einsums. MAS neg_cent
    einsums are stop-grad (1x). D step: real+fake passes at 3x (weight grads
    need the full dgrad chain). G step: fake pass 2x (input grads only),
    mel-variant real pass 1x (stop-grad fmaps). STFT/mel of y_hat 3x, of the
    real wave 1x.
    """
    seg_frames = cfg.segment_frames
    seg_T = seg_frames * cfg.hop_length

    g_fwd = (
        text_encoder_flops(synth.enc_p, B, T_x)
        + posterior_encoder_flops(synth.enc_q, B, T_y)
        + 2 * flow_flops(synth.flow, B, T_y)             # fwd + z_q reverse
        + duration_predictor_flops(synth.dp, B, T_x)
        + generator_flops(synth.dec, B, seg_frames)["total"]
        + 2 * 2.0 * B * T_y * T_x * synth.inter_channels  # m_p_e, logs_p_e
    )
    mas = 2 * 2.0 * B * T_y * T_x * synth.inter_channels  # nc2 + nc3 (stop-grad)

    f = 3.0 * g_fwd + mas
    if cfg.variant == "mel":
        d_fwd = mpd_flops(disc, B, seg_T)
        f += 3.0 * (d_fwd + d_fwd)      # D step: real + fake
        f += 2.0 * d_fwd + 1.0 * d_fwd  # G step: fake (dgrad) + real (stop-grad)
        f += 3.0 * mel_flops(B, seg_T, cfg.filter_length, cfg.hop_length,
                             cfg.win_length, cfg.n_mel_channels)   # mel(y_hat)
        f += mel_flops(B, seg_T, cfg.filter_length, cfg.hop_length,
                       cfg.win_length, cfg.n_mel_channels)          # mel(y) 1x
    else:
        d_fwd = mrd_flops(disc, B, seg_T, cfg.resolutions)
        f += 3.0 * (d_fwd + d_fwd)
        f += 2.0 * d_fwd
        mags = sum(stft_flops(B, seg_T, *r) for r in cfg.resolutions)
        f += 3.0 * mags + 1.0 * mags    # |STFT|(y_hat) differentiated, (y) not
    return f
