"""K-means emotion clustering -> per-speaker emotion banks.

Parity with the reference toolkits/cluster_emotion.py (13-66): cap at 10k
samples, trim the farthest (1-N) fraction of outliers from the global mean,
scipy k-means, centroids sorted by distance-to-mean, float32 bank file.
"""

from __future__ import annotations

import argparse
import sys
from typing import Sequence

import numpy as np
from scipy.cluster.vq import kmeans


def cluster_emotions(emo_paths: Sequence[str], k: int = 3,
                     keep_fraction: float = 0.9, seed: int = 0) -> np.ndarray:
    """Returns (K, 1024) centroid bank sorted by distance to the mean."""
    emo = np.stack([np.fromfile(p, dtype=np.float32)[:1024] for p in emo_paths])
    rng = np.random.RandomState(seed)
    rng.shuffle(emo)
    emo = emo[:10000]
    mean = np.mean(emo)
    if 0 < keep_fraction < 1.0 and len(emo) > 1:
        dist = np.linalg.norm(emo - mean, 2, -1)
        emo = emo[np.argsort(dist)][:max(1, int(keep_fraction * len(emo)))]
    center, _ = kmeans(emo.astype(np.float64), min(k, len(emo)), seed=seed)
    dist = np.linalg.norm(center - mean, 2, -1)
    return center[np.argsort(dist)].astype(np.float32)


def main(argv=None):
    parser = argparse.ArgumentParser(description="Cluster .emo files into a bank.")
    parser.add_argument("k", type=int)
    parser.add_argument("scpfn", type=str)
    parser.add_argument("outfn", type=str)
    parser.add_argument("keep", type=float, nargs="?", default=0.9)
    args = parser.parse_args(argv)
    with open(args.scpfn, "rt") as f:
        paths = [l.strip() for l in f if l.strip() and l.strip()[0] != "#"]
    bank = cluster_emotions(paths, args.k, args.keep)
    bank.tofile(args.outfn)
    print(f"saved {bank.shape} to {args.outfn}")


if __name__ == "__main__":
    main()
