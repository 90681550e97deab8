"""A small numpy evaluator for the ONNX op subset the exporter emits.

Two jobs:
- test oracle: tests/test_onnx.py runs exported models through this
  interpreter and compares against the jax forward — an implementation of
  ONNX op semantics that is independent of the converter, so a translation
  bug can't self-certify;
- zero-dependency runner: lets a consumer sanity-check an exported model
  in environments without onnxruntime (none ships in this image — the
  reference's runner, emotional-vits/toolkits/trt_infer.py, assumes TRT).

Implements exactly the ops `vits_tpu.onnx.convert` can emit; unknown ops
raise. Semantics follow the ONNX operator spec (opset 17): numpy-style
broadcasting for elementwise ops, Slice clamping, Reshape 0/-1 rules.
"""

from __future__ import annotations

import numpy as np

from . import proto


def _slice(data, starts, ends, axes=None, steps=None):
    starts = np.asarray(starts).tolist()
    ends = np.asarray(ends).tolist()
    axes = (list(range(len(starts))) if axes is None
            else np.asarray(axes).tolist())
    steps = [1] * len(starts) if steps is None else np.asarray(steps).tolist()
    index = [slice(None)] * data.ndim
    for st, en, ax, sp in zip(starts, ends, axes, steps):
        ax = ax % data.ndim
        dim = data.shape[ax]
        # ONNX clamping rules
        if sp > 0:
            st = min(max(st + dim if st < 0 else st, 0), dim)
            en = min(max(en + dim if en < 0 else en, 0), dim)
            index[ax] = slice(st, en, sp)
        else:
            st = st + dim if st < 0 else st
            st = min(max(st, 0), dim - 1)
            if en < -dim:  # INT_MIN sentinel → run off the front
                index[ax] = slice(st, None, sp)
            else:
                en = en + dim if en < 0 else en
                index[ax] = slice(st, en, sp)
    return data[tuple(index)]


def _reshape(data, shape):
    shape = np.asarray(shape).tolist()
    out = []
    for i, d in enumerate(shape):
        if d == 0:
            out.append(data.shape[i])
        else:
            out.append(d)
    return data.reshape(out)  # numpy handles the single -1


def _conv(x, w, b=None, dilations=None, group=1, pads=None, strides=None):
    # x: (N, C, *spatial), w: (M, C/group, *k)
    nsp = x.ndim - 2
    dilations = dilations or [1] * nsp
    strides = strides or [1] * nsp
    pads = pads or [0] * (2 * nsp)
    if nsp != 1:
        raise NotImplementedError("only 1-D Conv is emitted")
    (d,), (s,) = dilations, strides
    lo, hi = pads
    xp = np.pad(x, ((0, 0), (0, 0), (lo, hi)))
    N, C, W = xp.shape
    M, Cg, K = w.shape
    out_w = (W - (K - 1) * d - 1) // s + 1
    y = np.zeros((N, M, out_w), np.float64)
    mg = M // group
    for gi in range(group):
        xs = xp[:, gi * Cg:(gi + 1) * Cg]
        ws = w[gi * mg:(gi + 1) * mg]
        for k in range(K):
            seg = xs[:, :, k * d:k * d + (out_w - 1) * s + 1:s]
            y[:, gi * mg:(gi + 1) * mg] += np.einsum(
                "ncw,mc->nmw", seg.astype(np.float64), ws[:, :, k].astype(np.float64))
    if b is not None:
        y += b.reshape(1, -1, 1)
    return y.astype(x.dtype)


def _gather(data, indices, axis=0):
    return np.take(data, indices.astype(np.int64), axis=axis)


_BINOPS = {
    "Add": np.add, "Sub": np.subtract, "Mul": np.multiply,
    # integer Div truncates toward zero in ONNX (and lax.div) — NOT floor
    "Div": lambda a, b: (a / b if np.issubdtype(np.result_type(a, b),
                                                np.floating)
                         else (np.abs(a) // np.abs(b))
                         * np.where(np.sign(a) * np.sign(b) == 0, 1,
                                    np.sign(a) * np.sign(b))),
    "Pow": np.power, "Max": np.maximum, "Min": np.minimum,
    "Less": np.less, "LessOrEqual": np.less_equal, "Greater": np.greater,
    "GreaterOrEqual": np.greater_equal, "Equal": np.equal,
    "And": np.logical_and, "Or": np.logical_or, "Xor": np.logical_xor,
}

_UNOPS = {
    "Exp": np.exp, "Log": np.log, "Tanh": np.tanh, "Neg": np.negative,
    "Sqrt": np.sqrt, "Reciprocal": np.reciprocal, "Abs": np.abs,
    "Floor": np.floor, "Ceil": np.ceil, "Sign": np.sign, "Not": np.logical_not,
    "Identity": lambda x: x, "Sin": np.sin, "Cos": np.cos,
    "Sigmoid": lambda x: 1.0 / (1.0 + np.exp(-x)),
    "Erf": None,  # filled below to avoid importing scipy
    "Round": lambda x: np.round(x),
}


def _erf(x):
    # Abramowitz-Stegun 7.1.26, enough for test tolerance; the exporter only
    # emits Erf if a gelu appears (none in the current model family)
    t = 1.0 / (1.0 + 0.3275911 * np.abs(x))
    y = 1 - (((((1.061405429 * t - 1.453152027) * t) + 1.421413741) * t
              - 0.284496736) * t + 0.254829592) * t * np.exp(-x * x)
    return np.sign(x) * y


_UNOPS["Erf"] = _erf


def _eval_node(n: dict, iv: list):
    """Evaluate one parsed NodeProto on concrete numpy inputs."""
    op = n["op_type"]
    at = n["attrs"]
    if op in _BINOPS:
        out = _BINOPS[op](iv[0], iv[1])
    elif op in _UNOPS:
        out = _UNOPS[op](iv[0])
    elif op == "Where":
        out = np.where(iv[0], iv[1], iv[2])
    elif op == "Cast":
        out = iv[0].astype(proto.ONNX_TO_NP[at["to"]])
    elif op == "Reshape":
        out = _reshape(iv[0], iv[1])
    elif op == "Squeeze":
        out = np.squeeze(iv[0], tuple(np.asarray(iv[1]).tolist()))
    elif op == "Unsqueeze":
        out = np.expand_dims(iv[0], tuple(np.asarray(iv[1]).tolist()))
    elif op == "Transpose":
        out = np.transpose(iv[0], at.get("perm"))
    elif op == "Expand":
        # ONNX Expand: numpy-style broadcast of BOTH shapes
        shape = np.asarray(iv[1]).tolist()
        out = np.broadcast_to(
            iv[0], np.broadcast_shapes(np.shape(iv[0]), tuple(shape))).copy()
    elif op == "Slice":
        out = _slice(iv[0], iv[1], iv[2],
                     iv[3] if len(iv) > 3 else None,
                     iv[4] if len(iv) > 4 else None)
    elif op == "Concat":
        out = np.concatenate(iv, axis=at["axis"])
    elif op == "Pad":
        pads = np.asarray(iv[1]).tolist()
        half = len(pads) // 2
        cfg = list(zip(pads[:half], pads[half:]))
        cval = iv[2] if len(iv) > 2 and iv[2] is not None else 0
        out = np.pad(iv[0], cfg, constant_values=np.asarray(cval).item())
    elif op == "Einsum":
        out = np.einsum(at["equation"], *[v.astype(np.float64) for v in iv]
                        ).astype(iv[0].dtype)
    elif op == "MatMul":
        out = np.matmul(iv[0], iv[1])
    elif op == "Conv":
        out = _conv(iv[0], iv[1], iv[2] if len(iv) > 2 else None,
                    dilations=at.get("dilations"), group=at.get("group", 1),
                    pads=at.get("pads"), strides=at.get("strides"))
    elif op == "Gather":
        out = _gather(iv[0], iv[1], axis=at.get("axis", 0))
    elif op == "Shape":
        out = np.asarray(np.shape(iv[0]), np.int64)
    elif op == "ReduceSum":
        axes = tuple(np.asarray(iv[1]).tolist()) if len(iv) > 1 else None
        out = np.sum(iv[0], axis=axes, keepdims=bool(at.get("keepdims", 1)))
    elif op == "ReduceMax":
        axes = tuple(at["axes"]) if "axes" in at else None
        out = np.max(iv[0], axis=axes, keepdims=bool(at.get("keepdims", 1)))
    elif op == "ReduceMin":
        axes = tuple(at["axes"]) if "axes" in at else None
        out = np.min(iv[0], axis=axes, keepdims=bool(at.get("keepdims", 1)))
    elif op == "CumSum":
        if at.get("reverse"):
            raise NotImplementedError("reverse CumSum")
        out = np.cumsum(iv[0], axis=int(np.asarray(iv[1]).item()))
    elif op == "Mod":
        out = np.fmod(iv[0], iv[1]) if at.get("fmod") else np.mod(iv[0], iv[1])
    elif op == "Range":
        out = np.arange(np.asarray(iv[0]).item(), np.asarray(iv[1]).item(),
                        np.asarray(iv[2]).item(), dtype=iv[0].dtype)
    else:
        raise NotImplementedError(f"op {op}")
    if isinstance(out, np.ndarray) and out.dtype == np.float64 \
            and iv and iv[0] is not None \
            and np.asarray(iv[0]).dtype == np.float32:
        out = out.astype(np.float32)
    return out if isinstance(out, tuple) else (out,)


def run_model(model_bytes: bytes, inputs: dict) -> dict:
    """Evaluate a serialized ONNX model on numpy inputs; returns outputs."""
    m = proto.parse_model(model_bytes)
    g = m["graph"]
    env = dict(inputs)
    for t in g["initializer"]:
        env[t["name"]] = proto.tensor_to_np(t)
    for vi in g["input"]:
        if vi["name"] not in env:
            raise ValueError(f"missing input {vi['name']}")

    for n in g["node"]:
        try:
            iv = [env[x] if x else None for x in n["input"]]
        except KeyError as e:
            raise KeyError(f"node {n['name']} ({n['op_type']}): "
                           f"missing input {e}")
        try:
            outs = _eval_node(n, iv)
        except Exception as e:
            shapes = [None if v is None else np.shape(v) for v in iv]
            raise type(e)(
                f"node {n['name']} ({n['op_type']}) inputs {shapes} "
                f"attrs {n['attrs']}: {e}") from e
        for name, o in zip(n["output"], outs):
            env[name] = np.asarray(o)

    return {vi["name"]: env[vi["name"]] for vi in g["output"]}
