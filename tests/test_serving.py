"""Serving stack: socket server + client + HTTP gateway, end-to-end (CPU)."""
import json
import os
import threading
import urllib.request

import numpy as np
import pytest

import jax

from vits_tpu.serve.protocol import synthesize
from vits_tpu.serve.socket_server import TTServer
from vits_tpu.serve import http_server as http_mod

from test_infer_wrap import TINY_JSON  # tiny deployment config
from vits_tpu.models.synthesizer import Synthesizer
from vits_tpu.utils import checkpoint as ckpt


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    d = tmp_path_factory.mktemp("serve_deploy")
    with open(d / "config.json", "w") as f:
        json.dump(TINY_JSON, f)
    from vits_tpu.config import get_hparams_from_file
    hps = get_hparams_from_file(str(d / "config.json"))
    synth = Synthesizer.from_hps(hps)
    params = synth.init_params(jax.random.PRNGKey(7))
    ckpt.save_checkpoint(str(d / "checkpoint.npz"), {"model": jax.device_get(params)})
    np.random.RandomState(5).randn(2, 1024).astype(np.float32).tofile(str(d / "1.emo"))

    srv = TTServer(port=0, num_workers=2, ckpt_path=str(d / "checkpoint.npz"))
    port = srv.start()
    yield ("127.0.0.1", port)
    srv.stop()


def test_socket_roundtrip(server):
    out = synthesize({"text": "hello there", "spkid": 1,
                      "emotion": np.zeros(1024, np.float32)}, server)
    assert out is not None
    assert out["wav"][:4] == b"RIFF"
    assert out["rtf"] > 0


def test_socket_persistent_connection(server):
    out1, sock = synthesize({"text": "one", "spkid": 1,
                             "emotion": np.zeros(1024, np.float32)}, server,
                            None, True)
    assert out1 is not None and sock is not None
    out2, sock = synthesize({"text": "two", "spkid": 1,
                             "emotion": np.zeros(1024, np.float32)}, server,
                            sock, True)
    assert out2 is not None
    if sock:
        sock.close()


def test_socket_streaming(server):
    """stream=True: framed PCM chunk dicts, then the final metadata dict."""
    from vits_tpu.serve.protocol import synthesize_stream
    msgs = list(synthesize_stream(
        {"text": "stream me please. " * 8, "spkid": 1,
         "emotion": np.zeros(1024, np.float32)}, server))
    assert msgs and msgs[-1].get("final") is True
    chunks = msgs[:-1]
    assert chunks, "expected at least one PCM chunk before the final dict"
    assert all(isinstance(m["pcm"], bytes) and m["sr"] > 0 for m in chunks)
    assert [m["seq"] for m in chunks] == list(range(len(chunks)))
    total = sum(len(m["pcm"]) for m in chunks)
    assert total > 0 and msgs[-1]["rtf"] > 0


def test_http_gateway_streaming(server):
    httpd = http_mod.serve(host="127.0.0.1", port=0, remote=server)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        url = (f"http://127.0.0.1:{port}/api/text2speech"
               f"?tex=streaming+hello&per=1&emo=0&stm=1")
        with urllib.request.urlopen(url, timeout=60) as r:
            assert r.headers["Content-Type"] == "audio/wav"
            body = r.read()  # urllib reassembles chunked transfer
        assert body[:4] == b"RIFF" and len(body) > 44
        # unknown-length streaming WAV header convention
        assert body[40:44] == b"\xff\xff\xff\xff" or len(body) > 44
    finally:
        httpd.shutdown()


def test_http_gateway(server):
    httpd = http_mod.serve(host="127.0.0.1", port=0, remote=server)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        # GET with semitone params; emotion id 1 resolves via the bank
        url = f"http://127.0.0.1:{port}/api/text2speech?tex=hi+there&per=1&vol=90&spd=2&pit=-1&emo=1"
        with urllib.request.urlopen(url, timeout=60) as r:
            body = r.read()
            assert r.headers["Content-Type"] == "audio/wav"
            assert body[:4] == b"RIFF"
        # POST with explicit emotion vector
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/text2speech",
            data=json.dumps({"tex": "post test", "per": 1,
                             "emo": [0.0] * 1024}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as r:
            assert r.read()[:4] == b"RIFF"
        # bad emo length -> json error
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/text2speech",
            data=json.dumps({"tex": "x", "emo": [0.0] * 3}).encode(),
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(req, timeout=60)
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        httpd.shutdown()


def test_socket_client_cli(server, tmp_path):
    """The ad-hoc client CLI (reference socket_client.py:39-109): text file in,
    WAV files out, both one-shot and streaming protocols."""
    from vits_tpu.serve import protocol
    host, port = server
    tf = tmp_path / "lines.txt"
    tf.write_text("hello there\n\nsecond line\n", encoding="utf-8")
    out1 = tmp_path / "out1"
    protocol.main(["--host", host, "--port", str(port), "-t", str(tf),
                   "-i", "1", "-o", str(out1)])
    wavs = sorted(os.listdir(out1))
    assert wavs == ["000001.wav", "000002.wav"]
    data = (out1 / "000001.wav").read_bytes()
    assert data[:4] == b"RIFF" and len(data) > 44

    out2 = tmp_path / "out2"
    protocol.main(["--host", host, "--port", str(port), "-u", "streamed hello",
                   "-i", "1", "--stream", "-o", str(out2)])
    data = (out2 / "000001.wav").read_bytes()
    assert data[:4] == b"RIFF" and len(data) > 44
