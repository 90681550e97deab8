"""Nearest-centroid emotion quantization (toolkits/vq_emotion.py:13-32)."""

from __future__ import annotations

import argparse

import numpy as np
from scipy.cluster.vq import vq


def quantize(emo: np.ndarray, centers: np.ndarray) -> np.ndarray:
    code, _ = vq(emo.reshape(1, -1).astype(np.float64), centers.astype(np.float64))
    return centers[code].astype(np.float32)


def main(argv=None):
    parser = argparse.ArgumentParser(description="VQ .emo files against a bank.")
    parser.add_argument("clusterfn", type=str)
    parser.add_argument("scpfn", type=str)
    args = parser.parse_args(argv)
    centers = np.fromfile(args.clusterfn, np.float32).reshape(-1, 1024)
    with open(args.scpfn, "rt") as f:
        for emofn in f:
            emofn = emofn.strip()
            if not emofn or emofn[0] == "#":
                continue
            emo = np.fromfile(emofn, dtype=np.float32).reshape(1, 1024)
            q = quantize(emo, centers)
            q.tofile(emofn + ".vq")
            print(f"Output to {emofn}.vq")


if __name__ == "__main__":
    main()
