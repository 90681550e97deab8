"""Data pipeline + checkpoint I/O tests (synthetic corpus in tmpdir)."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vits_tpu.config import HParams
from vits_tpu.utils.audio import read_wav, write_wav, load_wav_norm, spectrogram_np
from vits_tpu.utils import checkpoint as ckpt
from vits_tpu.ops.stft import spectrogram
from vits_tpu.train.data import (
    BucketSampler, Prefetcher, TextAudioSpeakerDataset, collate, load_binfn)


def test_wav_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    x = rng.uniform(-0.8, 0.8, 4000).astype(np.float32)
    p = str(tmp_path / "a.wav")
    write_wav(p, x, 16000)
    y, sr = read_wav(p)
    assert sr == 16000
    np.testing.assert_allclose(y, x, atol=1.0 / 16000)
    p2 = str(tmp_path / "b.wav")
    write_wav(p2, x, 8000, subtype="FLOAT")
    y2, sr2 = read_wav(p2)
    assert sr2 == 8000
    np.testing.assert_array_equal(y2, x)


def test_spectrogram_np_matches_jax():
    rng = np.random.RandomState(1)
    y = rng.uniform(-0.9, 0.9, 192 * 30).astype(np.float32)
    a = spectrogram_np(y, 1024, 192, 768)
    b = np.asarray(spectrogram(jnp.asarray(y[None]), 1024, 192, 768))[0]
    np.testing.assert_allclose(a, b, atol=2e-3, rtol=1e-4)


def make_corpus(tmp_path, n=12, sr=16000, hop=192, text_channels=16):
    rng = np.random.RandomState(7)
    lines = []
    for i in range(n):
        T = rng.randint(40, 120) * hop
        wav = rng.uniform(-0.9, 0.9, T).astype(np.float32)
        vec = rng.randn(rng.randint(4, 30), text_channels).astype(np.float32)
        emo = rng.randn(1024).astype(np.float32)
        wavfn = str(tmp_path / f"u{i}.wav")
        vecfn = str(tmp_path / f"u{i}.vec")
        emofn = str(tmp_path / f"u{i}.emo")
        write_wav(wavfn, wav, sr)
        vec.tofile(vecfn)
        emo.tofile(emofn)
        lines.append(f"{vecfn}|{wavfn}|{emofn}|{i % 4}")
    scp = str(tmp_path / "train.scp")
    with open(scp, "w") as f:
        f.write("\n".join(lines))
    return scp


def make_hps(text_channels=16, hop=192):
    return HParams(**{
        "train": {"segment_size": hop * 8},
        "data": {"sampling_rate": 16000, "filter_length": 1024,
                 "hop_length": hop, "win_length": 768,
                 "text_channels": text_channels, "max_text_len": 384,
                 "max_wav_len": 16000 * 12, "n_speakers": 4},
    })


def test_dataset_and_sampler(tmp_path):
    scp = make_corpus(tmp_path)
    hps = make_hps()
    ds = TextAudioSpeakerDataset(scp, hps)
    assert len(ds) > 0
    item = ds[0]
    assert item["vec"].shape[1] == 16
    assert item["emo"].shape == (1024,)
    assert item["spec"].shape[1] == 513
    assert item["spec"].shape[0] == len(item["wav"]) // 192
    # spec cache file written and reused
    wavfn = ds.items[0][1]
    assert os.path.exists(wavfn[:-4] + ".spec.npy")

    sampler = BucketSampler(ds.lengths, batch_size=2, boundaries=[32, 60, 90, 130],
                            num_replicas=2, rank=0)
    b0 = sampler.epoch_batches(0)
    b1 = sampler.epoch_batches(0)
    assert [b for _, b in b0] == [b for _, b in b1]  # deterministic per epoch
    r1 = BucketSampler(ds.lengths, 2, [32, 60, 90, 130], num_replicas=2, rank=1).epoch_batches(0)
    flat0 = {i for _, b in b0 for i in b}
    flat1 = {i for _, b in r1 for i in b}
    assert flat0 and flat1

    pf = Prefetcher(ds, sampler)
    batches = list(pf.epoch(0))
    assert len(batches) == len(b0)
    for b in batches:
        B, T, C = b["x"].shape
        assert C == 16 and T % 32 == 0
        assert b["spec"].shape[1] in (60, 90, 130)
        assert b["wav"].shape[1] == b["spec"].shape[1] * 192
        assert np.all(b["spec_lengths"] <= b["spec"].shape[1])


def test_wav_meta_header_only(tmp_path):
    """wav_meta returns (samples, sr) from the header; matches the decode."""
    from vits_tpu.utils.audio import load_wav_norm, wav_meta
    rng = np.random.RandomState(3)
    wav = rng.uniform(-0.9, 0.9, 12345).astype(np.float32)
    fn = str(tmp_path / "m.wav")
    write_wav(fn, wav, 16000)
    n, sr = wav_meta(fn)
    x, sr2 = load_wav_norm(fn)
    assert (n, sr) == (len(x), sr2) == (12345, 16000)


def test_prefetcher_static_text_pad_per_bucket(tmp_path):
    """All batches of a bucket share ONE text shape (jit shape count is
    bounded by bucket count, not buckets x batch-max text pads)."""
    scp = make_corpus(tmp_path, n=16)
    ds = TextAudioSpeakerDataset(scp, make_hps())
    assert len(ds.text_lengths) == len(ds)
    sampler = BucketSampler(ds.lengths, batch_size=2, boundaries=[32, 60, 90, 130])
    pf = Prefetcher(ds, sampler, workers=4)
    shapes = {}
    for (bi, _), b in zip(sampler.epoch_batches(0), pf.epoch(0)):
        shapes.setdefault(bi, set()).add(b["x"].shape[1])
        assert np.all(b["x_lengths"] <= b["x"].shape[1])
    assert shapes and all(len(s) == 1 for s in shapes.values()), shapes


def test_on_device_spec_matches_host_pipeline():
    """A spec-less batch's reflect-tailed wav, run through the on-device
    spectrogram, matches the host pipeline's exact-length spectrogram on all
    valid frames (the train step's no-"spec" path)."""
    import jax.numpy as jnp
    from vits_tpu.ops.stft import spectrogram
    from vits_tpu.train.data import collate
    from vits_tpu.utils.audio import spectrogram_np

    n_fft, hop, win = 64, 8, 64
    rng = np.random.RandomState(5)
    samples = []
    for L in (497, 520, 512):  # incl. non-multiples of hop and an exact fit
        samples.append({"vec": rng.randn(6, 4).astype(np.float32),
                        "wav": rng.uniform(-0.9, 0.9, L).astype(np.float32),
                        "emo": rng.randn(1024).astype(np.float32), "sid": 1})
    b = collate(samples, text_pad_to=8, spec_pad_to=64, hop_length=hop,
                reflect_tail=n_fft)
    assert "spec" not in b
    assert b["wav"].shape[1] == 64 * hop + n_fft  # room for the mirror tail
    frames = (b["wav"].shape[1] - n_fft) // hop
    dev = np.asarray(spectrogram(jnp.asarray(b["wav"]), n_fft, hop, win))[:, :frames]
    # collate sorts by frame count descending; map each batch row back to its
    # source sample to compare against the host spectrogram of the FULL wav
    # (== the exact-length wav here; the truncation case has its own test)
    srcs = sorted(samples, key=lambda s: -(len(s["wav"]) // hop))
    for i, s in enumerate(srcs):
        sl = int(b["spec_lengths"][i])
        host = spectrogram_np(s["wav"], n_fft, hop, win)
        assert host.shape[0] >= sl
        np.testing.assert_allclose(dev[i, :sl], host[:sl], rtol=2e-4, atol=2e-4)


def test_on_device_spec_bucket_cap_truncation():
    """When the source wav extends past spec_pad*hop (bucket-cap truncation
    with a sub-hop remainder), the collate tail ships the REAL continuation
    samples, so the last valid frames match the spectrogram of the FULL wav —
    the reference computes the spec before truncating frames (advisor r4)."""
    n_fft, hop, win = 64, 8, 64
    rng = np.random.RandomState(6)
    spec_pad = 64
    L = spec_pad * hop + 37  # past the cap, not a hop multiple
    full = rng.uniform(-0.9, 0.9, L).astype(np.float32)
    samples = [{"vec": rng.randn(6, 4).astype(np.float32), "wav": full,
                "emo": rng.randn(1024).astype(np.float32), "sid": 0}]
    b = collate(samples, text_pad_to=8, spec_pad_to=spec_pad, hop_length=hop,
                reflect_tail=n_fft)
    frames = (b["wav"].shape[1] - n_fft) // hop
    dev = np.asarray(spectrogram(jnp.asarray(b["wav"]), n_fft, hop, win))[:, :frames]
    host = spectrogram_np(full, n_fft, hop, win)
    sl = int(b["spec_lengths"][0])
    assert sl == spec_pad
    np.testing.assert_allclose(dev[0, :sl], host[:sl], rtol=2e-4, atol=2e-4)


def test_collate_compact_roundtrip():
    """compact=True ships wav int16 / text+emo bf16; dequantized values match
    the float collate to transport-quantization precision."""
    import ml_dtypes
    n_fft, hop = 64, 8
    rng = np.random.RandomState(9)
    samples = []
    for L in (497, 520):
        samples.append({"vec": rng.randn(6, 4).astype(np.float32),
                        "wav": rng.uniform(-0.99, 0.99, L).astype(np.float32),
                        "emo": rng.randn(1024).astype(np.float32), "sid": 1})
    bf = collate(samples, 8, 64, hop, reflect_tail=n_fft)
    bc = collate(samples, 8, 64, hop, reflect_tail=n_fft, compact=True)
    assert bc["wav"].dtype == np.int16
    assert bc["x"].dtype == ml_dtypes.bfloat16
    assert bc["emo"].dtype == ml_dtypes.bfloat16
    np.testing.assert_allclose(bc["wav"].astype(np.float32) / 32767.0,
                               bf["wav"], atol=0.51 / 32767.0)
    np.testing.assert_allclose(bc["x"].astype(np.float32), bf["x"],
                               rtol=8e-3, atol=8e-3)
    np.testing.assert_array_equal(bc["x_lengths"], bf["x_lengths"])


def test_checkpoint_roundtrip(tmp_path):
    tree = {"a": {"b": jnp.arange(6.0).reshape(2, 3), "c": jnp.zeros((4,))},
            "d": [jnp.ones((2,)), jnp.full((3,), 2.0)]}
    path = str(tmp_path / "G_100.npz")
    ckpt.save_checkpoint(path, tree, step=100, epoch=3)
    template = jax.tree_util.tree_map(jnp.zeros_like, tree)
    loaded, step, epoch = ckpt.load_checkpoint(path, template)
    assert step == 100 and epoch == 3
    for a, b in zip(jax.tree_util.tree_leaves(tree), jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # latest + soup
    ckpt.save_checkpoint(str(tmp_path / "G_200.npz"),
                         jax.tree_util.tree_map(lambda x: x * 3, tree), step=200)
    assert ckpt.latest_checkpoint_path(str(tmp_path)).endswith("G_200.npz")
    soup = ckpt.greedy_soup(ckpt.checkpoint_paths_sorted(str(tmp_path)), template, greedy=2)
    np.testing.assert_allclose(np.asarray(soup["a"]["b"]),
                               np.asarray(tree["a"]["b"]) * 2, rtol=1e-6)
    # partial load: extra template keys survive
    template2 = {"a": {"b": jnp.zeros((2, 3)), "c": jnp.zeros((4,)), "new": jnp.full((2,), 9.0)},
                 "d": [jnp.zeros((2,)), jnp.zeros((3,))]}
    loaded2, _, _ = ckpt.load_checkpoint(path, template2)
    np.testing.assert_array_equal(np.asarray(loaded2["a"]["new"]), np.full((2,), 9.0))
