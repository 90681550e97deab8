"""CLI: inspect / smoke-run an exported .onnx artifact without onnxruntime.

  python -m vits_tpu.onnx model_p1.onnx            # summary + structure check
  python -m vits_tpu.onnx model_p1.onnx --run      # run on random inputs
  python -m vits_tpu.onnx model_p2.onnx --run --seed 3

The structural check plays the role of `onnx.checker` (every node input must
be a graph input, an initializer, or an earlier node's output; attributes and
tensors must parse); `--run` plays the reference's engine smoke-runner role
(toolkits/trt_infer.py) using the in-tree numpy evaluator.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from . import proto, runtime


def check_model(model: dict) -> list:
    """Structural validation; returns a list of problem strings."""
    problems = []
    g = model.get("graph")
    if g is None:
        return ["no graph"]
    if model.get("opset") is None:
        problems.append("no opset_import")
    known = {t["name"] for t in g["initializer"]}
    known |= {vi["name"] for vi in g["input"]}
    for n in g["node"]:
        for i in n["input"]:
            if i and i not in known:
                problems.append(
                    f"node {n['name']} ({n['op_type']}): input '{i}' is not "
                    "a graph input, initializer, or earlier output")
        if not n["op_type"]:
            problems.append(f"node {n['name']}: empty op_type")
        known |= set(n["output"])
    for vi in g["output"]:
        if vi["name"] not in known:
            problems.append(f"graph output '{vi['name']}' is never produced")
    return problems


def _rand_input(vi, seed, traced=None):
    rng = np.random.RandomState(seed)
    shape = []
    for ax, d in enumerate(vi["shape"]):
        if isinstance(d, int):
            shape.append(d)
        elif traced and len(traced) == len(vi["shape"]):
            # honest size for a dynamic axis: the traced "profile" shape the
            # exporter recorded in the model doc_string
            shape.append(traced[ax])
        else:
            shape.append(17)
    dt = proto.ONNX_TO_NP[vi["elem_type"]]
    if np.issubdtype(dt, np.floating):
        return rng.randn(*shape).astype(dt)
    return np.zeros(shape, dt)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="python -m vits_tpu.onnx")
    ap.add_argument("model")
    ap.add_argument("--run", action="store_true",
                    help="evaluate on random inputs with the numpy runtime")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    buf = open(args.model, "rb").read()
    m = proto.parse_model(buf)
    g = m["graph"]
    n_init_bytes = sum(len(t["raw"]) for t in g["initializer"])
    ops = {}
    for n in g["node"]:
        ops[n["op_type"]] = ops.get(n["op_type"], 0) + 1
    print(f"{args.model}: ir_version={m['ir_version']} opset={m['opset']} "
          f"producer={m['producer']!r}")
    print(f"graph '{g['name']}': {len(g['node'])} nodes, "
          f"{len(g['initializer'])} initializers "
          f"({n_init_bytes / 1e6:.1f} MB)")
    for vi in g["input"]:
        print(f"  input  {vi['name']}: {vi['shape']} "
              f"({proto.ONNX_TO_NP[vi['elem_type']].name})")
    for vi in g["output"]:
        print(f"  output {vi['name']}: {vi['shape']}")
    print("  ops:", ", ".join(f"{k}×{v}" for k, v in sorted(ops.items())))

    problems = check_model(m)
    for p in problems:
        print("PROBLEM:", p)
    if problems:
        return 1
    print("structure: OK")

    if args.run:
        traced = {}
        if "traced_shapes=" in m.get("doc", ""):
            import json
            traced = json.loads(m["doc"].split("traced_shapes=", 1)[1])
        inputs = {vi["name"]: _rand_input(vi, args.seed + i,
                                          traced.get(vi["name"]))
                  for i, vi in enumerate(g["input"])}
        out = runtime.run_model(buf, inputs)
        for k, v in out.items():
            flat = np.asarray(v, np.float64).ravel()
            print(f"  ran {k}: shape {np.shape(v)} "
                  f"mean {flat.mean():+.4e} std {flat.std():.4e} "
                  f"finite={np.all(np.isfinite(flat))}")
        if not all(np.all(np.isfinite(np.asarray(v, np.float64)))
                   for v in out.values()):
            return 1
        print("run: OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
