"""Tests for the small toolkits/ops pieces not covered elsewhere:
filelists (appendspkid.pl parity), plot_mels, and the pidfile status.sh."""

import os
import subprocess

import numpy as np

from vits_tpu.toolkits.filelists import append_spkid

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_append_spkid_joins_and_filters():
    scp = [
        "a/utt1.vec|a/utt1.wav|a/utt1.emo\n",
        "a/utt2.vec|a/utt2.wav|a/utt2.emo\n",
        "a/unknown.vec|a/unknown.wav|a/unknown.emo\n",
    ]
    mapping = {"utt1": "7", "utt2": 12}
    out = append_spkid(scp, mapping)
    # unmapped utterances are dropped (reference appendspkid.pl prints only hits)
    assert out == [
        "a/utt1.vec|a/utt1.wav|a/utt1.emo|7",
        "a/utt2.vec|a/utt2.wav|a/utt2.emo|12",
    ]


def test_plot_mels_cli(tmp_path):
    import pytest
    pytest.importorskip("matplotlib")
    from vits_tpu.toolkits import plot_mels

    dim = 8
    fns = []
    for i in range(2):
        fn = tmp_path / f"m{i}.bin"
        np.random.RandomState(i).randn(20, dim).astype(np.float32).tofile(fn)
        fns.append(str(fn))
    out = tmp_path / "mels.png"
    plot_mels.main([str(dim), str(out)] + fns)
    assert out.exists() and out.stat().st_size > 0


def test_status_sh_reports_stopped(tmp_path):
    # status.sh with no pidfiles reports every service stopped (pidfile-based
    # process control; parity with reference web_api/status.sh intent).
    r = subprocess.run(["sh", os.path.join(REPO, "web_api", "status.sh")],
                       capture_output=True, text=True, timeout=30)
    assert r.returncode == 0
    for name in ("socket_server", "http_server", "sat_api"):
        assert name in r.stdout
