"""AOT artifact execution — the TensorRT-engine analog.

The reference deploys TorchScript/ONNX → TRT engines (export.py:159-226,
toolkits/onnx2engine.py, toolkits/trt_infer.py). Our deployment artifact is a
serialized `jax.export` StableHLO graph per (phase, bucket shape), produced by
vits_tpu.export --convert 1. This loader deserializes them once and serves
calls with zero retracing — functionally TRTWrapper (trt_infer.py:7-98).
"""

from __future__ import annotations

import glob
import os
import re
from typing import Dict, Optional, Tuple

import jax


class AOTBundle:
    """Loads model_p1_t{T}.jaxexp / model_p2_t{T}_f{F}.jaxexp artifacts."""

    def __init__(self, artifact_dir: str):
        self.dir = artifact_dir
        self.p1: Dict[int, object] = {}
        self.p2: Dict[Tuple[int, int], object] = {}
        from jax import export as jexport
        for fn in glob.glob(os.path.join(artifact_dir, "model_p1_t*.jaxexp")):
            m = re.search(r"_t(\d+)\.jaxexp$", fn)
            if m:
                with open(fn, "rb") as f:
                    self.p1[int(m.group(1))] = jexport.deserialize(f.read())
        for fn in glob.glob(os.path.join(artifact_dir, "model_p2_t*_f*.jaxexp")):
            m = re.search(r"_t(\d+)_f(\d+)\.jaxexp$", fn)
            if m:
                with open(fn, "rb") as f:
                    self.p2[(int(m.group(1)), int(m.group(2)))] = jexport.deserialize(f.read())

    def text_buckets(self):
        return sorted(self.p1)

    def frame_buckets(self, t_bucket: int):
        return sorted(f for (t, f) in self.p2 if t == t_bucket)

    def pick_text_bucket(self, n: int) -> Optional[int]:
        for b in self.text_buckets():
            if n <= b:
                return b
        return None

    def pick_frame_bucket(self, t_bucket: int, n: int) -> Optional[int]:
        for b in self.frame_buckets(t_bucket):
            if n <= b:
                return b
        return None

    def call_p1(self, t_bucket: int, params, x, x_mask, emo, sid):
        return self.p1[t_bucket].call(params, x, x_mask, emo, sid)

    def call_p2(self, t_bucket: int, f_bucket: int, params, attn, m_p, s_p, g,
                noise, y_mask):
        return self.p2[(t_bucket, f_bucket)].call(params, attn, m_p, s_p, g,
                                                  noise, y_mask)
