"""Checkpoint -> deployable artifact.

Capability parity with the reference export.py: greedy-soup averaging of the
last N training checkpoints (export.py:49-58), optional speaker-embedding
reset to row 0 (export.py:117-121), parameter counting excluding enc_q and
weight-norm magnitude duplicates (export.py:125-139), deployment checkpoint +
config snapshot (export.py:141-154), and two-phase graph export.

The TorchScript/ONNX/TensorRT chain (export.py:159-226, toolkits/onnx2engine.py)
maps to AOT `jax.export` serialization: infer_p1/infer_p2 are lowered to
StableHLO at the serving bucket shapes and written as `.jaxexp` artifacts that
deserialize + run without retracing.
"""

from __future__ import annotations

import argparse
import logging
import os
import shutil
import sys
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from vits_tpu import config as config_mod
from vits_tpu.models.synthesizer import Synthesizer
from vits_tpu.models.discriminators import MultiPeriodDiscriminator
from vits_tpu.models.mrd import MultiWaveSTFTDiscriminator
from vits_tpu.nn.core import fold_weight_norm
from vits_tpu.utils import checkpoint as ckpt_mod


def load_model(checkpoint: str, hps=None, *, greedy: int = 5, is_dis: int = 0):
    """Returns (module, params). checkpoint: file or run dir (G_*.npz soup)."""
    if hps is None:
        dirname = checkpoint if os.path.isdir(checkpoint) else os.path.dirname(checkpoint)
        hps = config_mod.get_hparams_from_file(os.path.join(dirname, "config.json"))
    if is_dis == 0:
        module = Synthesizer.from_hps(hps)
    elif is_dis == 1:
        module = MultiPeriodDiscriminator(getattr(hps.model, "use_spectral_norm", False))
    else:
        module = MultiWaveSTFTDiscriminator()
    template = {"model": module.init_params(jax.random.PRNGKey(0))}

    if os.path.isdir(checkpoint):
        paths = ckpt_mod.checkpoint_paths_sorted(checkpoint, "G_*.npz" if is_dis == 0 else "D_*.npz")
        if not paths:
            raise FileNotFoundError(f"no checkpoints in {checkpoint}")
        logging.info("Load [%s]", paths[-1])
        if greedy > 0 and len(paths) > 1:
            state = ckpt_mod.greedy_soup(paths, template, greedy=greedy)
        else:
            state, _, _ = ckpt_mod.load_checkpoint(paths[-1], template)
    elif checkpoint.endswith((".pth", ".pt")):
        from vits_tpu.utils.torch_compat import load_torch_checkpoint
        return module, load_torch_checkpoint(checkpoint, template["model"])
    else:
        state, _, _ = ckpt_mod.load_checkpoint(checkpoint, template)
    return module, state["model"]


def count_params_like_reference(params):
    """Param count excluding enc_q.* and weight-norm g (export.py:125-139)."""
    total = 0
    def rec(t, path):
        nonlocal total
        if isinstance(t, dict):
            for k, v in t.items():
                rec(v, path + [k])
        elif not ("enc_q" in path or path[-1] == "g"):
            total += int(np.prod(np.shape(t)))
    rec(params, [])
    return total


def export_aot(synth: Synthesizer, params, outdir: str, hps,
               text_buckets=(32, 64, 96, 128, 192, 256, 384),
               frame_buckets=(128, 256, 384, 512, 768, 1024)):
    """Serialize infer_p1/infer_p2 at bucketed shapes via jax.export."""
    from jax import export as jexport
    inter = hps.model.inter_channels
    gin = hps.model.gin_channels
    tc = hps.data.text_channels
    n_exported = 0
    for tb in text_buckets:
        fn = jax.jit(lambda p, x, m, e, s: synth.infer_p1(p, x, e, s, x_mask=m))
        args = (params,
                jax.ShapeDtypeStruct((1, tb, tc), jnp.float32),
                jax.ShapeDtypeStruct((1, tb, 1), jnp.float32),
                jax.ShapeDtypeStruct((1, 1024), jnp.float32),
                jax.ShapeDtypeStruct((1,), jnp.int32))
        exp = jexport.export(fn)(*args)
        with open(os.path.join(outdir, f"model_p1_t{tb}.jaxexp"), "wb") as f:
            f.write(exp.serialize())
        n_exported += 1
    for tb in text_buckets:
        for fb in frame_buckets:
            fn = jax.jit(lambda p, a, m, s, g, n, ym: synth.infer_p2(p, a, m, s, g, n, y_mask=ym))
            args = (params,
                    jax.ShapeDtypeStruct((1, fb, tb), jnp.float32),
                    jax.ShapeDtypeStruct((1, tb, inter), jnp.float32),
                    jax.ShapeDtypeStruct((1, tb, inter), jnp.float32),
                    jax.ShapeDtypeStruct((1, gin), jnp.float32),
                    jax.ShapeDtypeStruct((1, fb, inter), jnp.float32),
                    jax.ShapeDtypeStruct((1, fb, 1), jnp.float32))
            exp = jexport.export(fn)(*args)
            with open(os.path.join(outdir, f"model_p2_t{tb}_f{fb}.jaxexp"), "wb") as f:
                f.write(exp.serialize())
            n_exported += 1
    return n_exported


def main(argv=None):
    parser = argparse.ArgumentParser(description="Export the TPU TTS model.")
    parser.add_argument("--outdir", "-o", type=str, required=True)
    parser.add_argument("--checkpoint", "--ckpt", type=str, required=True)
    parser.add_argument("--config", "--conf", default=None, type=str)
    parser.add_argument("--discriminator", "--dis", "-d", default=0, type=int)
    parser.add_argument("--init-spk-embed", action="store_true")
    parser.add_argument("--greedy-soup", "--greedy", default=5, type=int)
    parser.add_argument("--convert", "-c", default=0, type=int,
                        help="1: AOT-export bucketed infer_p1/p2 (.jaxexp); "
                             "2: also emit model_p1.onnx/model_p2.onnx "
                             "(reference export.py:159-226 convert levels)")
    parser.add_argument("--onnx-tx", type=int, default=48,
                        help="text length model_p1/p2.onnx are traced at "
                             "(p1 is length-dynamic; reference uses 48)")
    parser.add_argument("--onnx-ty", type=int, default=384,
                        help="frame count model_p2.onnx is traced at")
    parser.add_argument("--text-buckets", type=str, default=None,
                        help="comma-separated text buckets for --convert")
    parser.add_argument("--frame-buckets", type=str, default=None,
                        help="comma-separated frame buckets for --convert")
    parser.add_argument("--verbose", type=int, default=1)
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO if args.verbose else logging.WARN, stream=sys.stdout)
    os.makedirs(args.outdir, exist_ok=True)
    if args.config is None:
        dirname = args.checkpoint if os.path.isdir(args.checkpoint) else os.path.dirname(args.checkpoint)
        config_path = os.path.join(dirname, "config.json")
    else:
        config_path = args.config
    hps = config_mod.get_hparams_from_file(config_path)

    module, params = load_model(args.checkpoint, hps, greedy=args.greedy_soup,
                                is_dis=args.discriminator)

    if args.init_spk_embed and not args.discriminator:
        logging.info("Reset speaker embedding!")
        emb = np.asarray(params["emb_g"]["embedding"])
        params["emb_g"]["embedding"] = jnp.asarray(np.broadcast_to(emb[:1], emb.shape).copy())

    if not args.discriminator:
        logging.info("Total parameters: %d", count_params_like_reference(params))

    out_config = os.path.join(args.outdir, "config.json")
    if not (os.path.exists(out_config) and os.path.samefile(config_path, out_config)):
        shutil.copyfile(config_path, out_config)
    ckpt_mod.save_checkpoint(os.path.join(args.outdir, "checkpoint.npz"),
                             {"model": jax.device_get(params)})
    logging.info("Exported parameters from [%s] to [%s/checkpoint.npz]",
                 args.checkpoint, args.outdir)

    if args.convert and not args.discriminator:
        synth = module
        folded = fold_weight_norm(params)
        kw = {}
        if args.text_buckets:
            kw["text_buckets"] = tuple(int(s) for s in args.text_buckets.split(","))
        if args.frame_buckets:
            kw["frame_buckets"] = tuple(int(s) for s in args.frame_buckets.split(","))
        n = export_aot(synth, folded, args.outdir, hps, **kw)
        logging.info("AOT-exported %d bucketed graphs to %s", n, args.outdir)
        if args.convert >= 2:
            from vits_tpu.onnx import export_onnx
            p1, p2 = export_onnx(synth, params, args.outdir,
                                 t_x=args.onnx_tx, t_y=args.onnx_ty)
            logging.info("Successfully convert part1 to onnx: [%s]", p1)
            logging.info("Successfully convert part2 to onnx: [%s]", p2)


if __name__ == "__main__":
    main()
