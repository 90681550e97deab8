"""SAT adapt flow + toolkits tests (tiny corpus, CPU)."""
import glob
import json
import os

import numpy as np
import pytest

import jax

from vits_tpu.utils.audio import write_wav, load_wav_norm
from vits_tpu.utils import checkpoint as ckpt
from vits_tpu.models.synthesizer import Synthesizer

from test_infer_wrap import TINY_JSON


def test_cluster_and_vq(tmp_path):
    from vits_tpu.toolkits.cluster_emotion import cluster_emotions
    from vits_tpu.toolkits.vq_emotion import quantize
    rng = np.random.RandomState(0)
    paths = []
    for i in range(12):
        p = str(tmp_path / f"{i}.emo")
        center = np.zeros(1024)
        center[i % 3] = 5.0
        (center + rng.randn(1024) * 0.1).astype(np.float32).tofile(p)
        paths.append(p)
    bank = cluster_emotions(paths, k=3)
    assert bank.shape == (3, 1024)
    q = quantize(np.fromfile(paths[0], np.float32), bank)
    assert q.shape == (1, 1024)
    # quantized vector equals one of the centroids
    assert min(np.abs(bank - q).sum(axis=1)) < 1e-5


def test_trim_silence(tmp_path):
    from vits_tpu.toolkits.trim_sil import trim_silence_file
    sr = 8000
    sig = np.concatenate([np.zeros(sr // 2),
                          0.8 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr),
                          np.zeros(sr // 2)]).astype(np.float32)
    inp, outp = str(tmp_path / "in.wav"), str(tmp_path / "out.wav")
    write_wav(inp, sig, sr)
    trim_silence_file(inp, outp, target_sr=sr)
    trimmed, _ = load_wav_norm(outp)
    # roughly the tone + 2*50ms margins, much shorter than the padded input
    assert sr * 0.9 < len(trimmed) < sr * 1.4
    assert np.abs(trimmed).max() > 0


def test_emotion_fallback_extractor(tmp_path):
    from vits_tpu.toolkits.extract_emotion import extract_to_file
    sr = 8000
    write_wav(str(tmp_path / "a.wav"),
              np.random.RandomState(0).uniform(-0.5, 0.5, sr).astype(np.float32), sr)
    emb = extract_to_file(str(tmp_path / "a.wav"), str(tmp_path / "a.emo"))
    assert emb.shape == (1024,)
    assert os.path.getsize(str(tmp_path / "a.emo")) == 4096
    emb2 = np.fromfile(str(tmp_path / "a.emo"), np.float32)
    np.testing.assert_array_equal(emb, emb2)


class _FakeOnnxSession:
    """Stands in for an onnxruntime.InferenceSession of the audonnx w2v2
    export: input `signal` (1, T) f32 → outputs hidden_states (1, 1024) and
    logits (1, 3). Deterministic affine of simple signal stats."""

    class _IO:
        def __init__(self, name):
            self.name = name

    def get_inputs(self):
        return [self._IO("signal")]

    def get_outputs(self):
        return [self._IO("logits"), self._IO("hidden_states")]

    def run(self, names, feed):
        x = feed["signal"]
        assert x.ndim == 2 and x.dtype == np.float32
        assert np.max(np.abs(x)) <= 1.0 + 1e-6  # peak-normalized
        outs = {
            "logits": np.tile(x.mean(keepdims=True), (1, 3)),
            "hidden_states": x.std() * np.arange(1024, dtype=np.float32)[None],
        }
        return [outs[n] for n in names]


def test_emotion_onnx_extractor(tmp_path, monkeypatch):
    """ONNX route (extract_emotion2.py parity): audonnx-style model dir
    dispatches to the onnxruntime session and picks the hidden_states head."""
    from vits_tpu.toolkits import extract_emotion as ee

    mdir = tmp_path / "w2v2-onnx"
    mdir.mkdir()
    (mdir / "model.onnx").write_bytes(b"\x08\x07")  # content never parsed here
    assert ee._is_onnx_model(str(mdir))
    assert ee._is_onnx_model(str(mdir / "model.onnx"))
    assert not ee._is_onnx_model(str(tmp_path))
    assert not ee._is_onnx_model(None)

    fake = _FakeOnnxSession()
    wav = np.random.RandomState(1).uniform(-0.3, 0.3, 16000).astype(np.float32)
    emb = ee.extract_onnx(wav, 16000, str(mdir), session=fake)
    assert emb.shape == (1024,) and emb.dtype == np.float32
    # hidden_states head selected (monotone ramp), not the 3-d logits
    assert emb[0] == 0.0 and emb[1023] > emb[1]
    with pytest.raises(ValueError):
        ee.extract_onnx(wav, 22050, str(mdir), session=fake)

    # extract_to_file dispatches on the model-dir shape; inject the fake
    # session through the module cache (onnxruntime absent in this image)
    monkeypatch.setitem(ee._model_cache, ("onnx", str(mdir)), fake)
    sr = 16000
    write_wav(str(tmp_path / "b.wav"), wav, sr)
    out = ee.extract_to_file(str(tmp_path / "b.wav"), str(tmp_path / "b.emo"),
                             model_path=str(mdir))
    assert out.shape == (1024,)
    np.testing.assert_array_equal(
        out, np.fromfile(str(tmp_path / "b.emo"), np.float32))


def test_append_spkid(tmp_path, capsys):
    """appendspkid.pl parity: join a `utt spkid` map into an scp
    (reference toolkits/appendspkid.pl)."""
    from vits_tpu.toolkits.filelists import append_spkid, main

    scp = ["/a/u1.vec|/a/u1.wav|/a/u1.emo", "/a/u2.vec|/a/u2.wav|/a/u2.emo",
           "/a/unmapped.vec|/a/unmapped.wav|/a/unmapped.emo"]
    out = append_spkid(scp, {"u1": 5, "u2": "7"})
    # unmapped utterances are dropped, mapped ones gain a 4th field
    assert out == ["/a/u1.vec|/a/u1.wav|/a/u1.emo|5",
                   "/a/u2.vec|/a/u2.wav|/a/u2.emo|7"]

    mapfn, scpfn = str(tmp_path / "spk.map"), str(tmp_path / "train.scp")
    with open(mapfn, "w") as f:
        f.write("u1 5\nu2 7\nmalformed\n")
    with open(scpfn, "w") as f:
        f.write("\n".join(scp) + "\n")
    main([mapfn, scpfn])
    assert capsys.readouterr().out.strip().splitlines() == out


def test_plot_mels_cli(tmp_path):
    from vits_tpu.toolkits.plot_mels import main

    rng = np.random.RandomState(0)
    fns = []
    for i in range(2):
        fn = str(tmp_path / f"m{i}.mel")
        rng.randn(20, 8).astype(np.float32).tofile(fn)
        fns.append(fn)
    outfn = str(tmp_path / "mels.png")
    main(["8", outfn] + fns)
    assert os.path.getsize(outfn) > 0


@pytest.mark.slow
def test_sat_run_adapt(tmp_path):
    """Full voice-cloning flow on a tiny config: data prep -> adapt finetune
    -> export -> map + emotion banks."""
    from vits_tpu.sat import run_adapt
    from vits_tpu.parallel.mesh import make_mesh
    import vits_tpu.sat as sat_mod

    sat_dir = tmp_path / "sat"
    (sat_dir / "configs").mkdir(parents=True)
    (sat_dir / "pretrain").mkdir()
    cfg = json.loads(json.dumps(TINY_JSON))
    cfg["train"]["log_interval"] = 1
    cfg["train"]["eval_interval"] = 100
    cfg["train"]["epochs"] = 1
    cfg["train"]["lr_decay"] = 0.996
    cfg["train"]["bucket_boundaries"] = [4, 40, 80]
    with open(sat_dir / "configs" / "adapt.json", "w") as f:
        json.dump(cfg, f)

    # pretrained G
    from vits_tpu.config import get_hparams_from_file
    hps = get_hparams_from_file(str(sat_dir / "configs" / "adapt.json"))
    synth = Synthesizer.from_hps(hps)
    params = synth.init_params(jax.random.PRNGKey(0))
    ckpt.save_checkpoint(str(sat_dir / "pretrain" / "G_0.npz"),
                         {"model": jax.device_get(params)}, step=0)

    # two new speakers with 2 utterances each
    rng = np.random.RandomState(1)
    for spk in (10001, 10002):
        d = sat_dir / "data" / str(spk)
        d.mkdir(parents=True)
        for u in range(2):
            T = rng.randint(24, 40) * 8
            write_wav(str(d / f"u{u}.wav"), rng.uniform(-0.8, 0.8, T).astype(np.float32), 1600)
            with open(d / f"u{u}.txt", "w") as f:
                f.write("hello tiny world\n")

    out_dir = str(tmp_path / "checkpoint")
    mesh = make_mesh(devices=jax.devices()[:1])
    mapping = run_adapt(str(sat_dir), out_dir, max_steps=2, mesh=mesh)
    # reserved ids clamp to n_speakers-1 for the tiny 8-speaker config
    assert mapping == {"10001": 7, "10002": 6}
    assert os.path.exists(os.path.join(out_dir, "checkpoint.npz"))
    assert os.path.exists(os.path.join(out_dir, "config.json"))
    with open(os.path.join(out_dir, "spkid.map")) as f:
        lines = dict(l.split() for l in f.read().strip().splitlines())
    assert lines == {"10001": "7", "10002": "6"}
    assert os.path.exists(os.path.join(out_dir, "7.emo"))
    assert os.path.islink(os.path.join(out_dir, "10001.emo"))

    # serving engine consumes the artifact: external id remaps + bank lookup
    from vits_tpu.infer import EmoVITS
    model = EmoVITS(os.path.join(out_dir, "checkpoint.npz"))
    assert model.spkid_mapping[10001] == 7
    wav, _ = model.infer(10001, rng.randn(9, 16).astype(np.float32), None)
    assert len(wav) > 0 and np.all(np.isfinite(wav))
