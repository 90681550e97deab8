"""Bridge: reference PyTorch checkpoints -> vits_tpu parameter pytrees.

The reference ships/loads `.pth` files holding `{"model": state_dict, ...}`
(utils.py:19-57, export.py:148-154). Our parameter trees intentionally mirror
the reference's module paths (e.g. `enc_p.encoder.attn_layers.0.conv_q`), so
this bridge is a mechanical per-leaf rename + layout transpose:

  torch layout                         ours
  Linear        (out, in)           -> (in, out)
  Conv1d        (out, in/groups, k) -> (k, in/groups, out)
  ConvTranspose (in, out, k)        -> (k, in, out)
  Conv2d        (out, in, kh, kw)   -> (kh, kw, in, out)
  weight_g      (out, 1, ...)       -> target g shape (reshape only)
  LayerNorm w/b (nn.LayerNorm)      -> gamma/beta
  Embedding     (n, d)              -> (n, d)

Weight-norm (g, v) pairs are preserved so loaded checkpoints can continue
training; fold with vits_tpu.nn.fold_weight_norm for inference (equivalent to
models.SynthesizerTrn.remove_weight_norm, models.py:467-474).
"""

from __future__ import annotations

import copy
from typing import Any, Dict, Mapping

import jax.numpy as jnp
import numpy as np


def _to_numpy(t):
    if isinstance(t, np.ndarray):
        return t
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _convert(key: str, arr: np.ndarray, target_shape) -> np.ndarray:
    if key.endswith("weight_g"):
        return arr.reshape(target_shape)  # norm scales: reshape only
    if arr.ndim <= 1:
        return arr.reshape(target_shape)
    if arr.ndim == 2:
        return arr.transpose(1, 0)
    if arr.ndim == 3:
        if ".ups." in key and key.endswith(("weight", "weight_v")):
            return arr.transpose(2, 0, 1)  # ConvTranspose (in,out,k)->(k,in,out)
        return arr.transpose(2, 1, 0)      # Conv1d (out,in,k)->(k,in,out)
    if arr.ndim == 4:
        return arr.transpose(2, 3, 1, 0)   # Conv2d
    raise ValueError(f"cannot convert {key} with shape {arr.shape} -> {target_shape}")


_LEAF_MAP = {"weight_g": "g", "weight_v": "v",
             "gamma": "gamma", "beta": "beta", "m": "m", "logs": "logs"}


def _resolve_leaf_name(node: Mapping[str, Any], torch_leaf: str) -> str:
    if torch_leaf == "bias":
        return "beta" if ("beta" in node and "b" not in node) else "b"
    if torch_leaf in _LEAF_MAP:
        return _LEAF_MAP[torch_leaf]
    if torch_leaf == "weight":
        if "gamma" in node:      # nn.LayerNorm weight
            return "gamma"
        if "embedding" in node:  # nn.Embedding weight — no transpose
            return "embedding"
        if "weight" in node:     # Swish learned scalar
            return "weight"
        if "v" in node:          # plain torch weight loaded into a weight-norm slot
            return "v"
        return "w"
    return torch_leaf


def load_torch_state_dict(state_dict: Mapping[str, Any], target_params: Dict[str, Any],
                          strict: bool = False, verbose: bool = False) -> Dict[str, Any]:
    """Fill a copy of target_params from a torch state_dict.

    Missing keys keep their current (e.g. freshly initialized) values with a
    log line, matching the tolerant key-union merge of utils.load_checkpoint
    (utils.py:33-43). Unknown torch keys raise only when strict.
    """
    params = copy.deepcopy(target_params)
    filled = set()
    for key, tensor in state_dict.items():
        arr = _to_numpy(tensor)
        path = key.split(".")
        node = params
        ok = True
        for seg in path[:-1]:
            if not isinstance(node, Mapping) or seg not in node:
                ok = False
                break
            node = node[seg]
        if ok:
            leaf = _resolve_leaf_name(node, path[-1])
            ok = isinstance(node, Mapping) and leaf in node
        if not ok:
            msg = f"torch key {key} has no target slot"
            if strict:
                raise KeyError(msg)
            if verbose:
                print(msg)
            continue
        tgt = node[leaf]
        if leaf == "embedding":
            conv = arr.reshape(np.shape(tgt))
        else:
            conv = _convert(key, arr, np.shape(tgt))
        node[leaf] = jnp.asarray(conv, dtype=jnp.asarray(tgt).dtype)
        filled.add(key)
    if verbose:
        print(f"loaded {len(filled)}/{len(state_dict)} torch tensors")
    return params


def load_torch_checkpoint(path: str, target_params: Dict[str, Any], **kw) -> Dict[str, Any]:
    """Load a reference .pth checkpoint file ({'model': state_dict, ...})."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("model", ckpt)
    return load_torch_state_dict(state, target_params, **kw)


# ---------------------------------------------------------------------------
# reverse bridge: our pytree -> reference-layout torch state_dict
# ---------------------------------------------------------------------------

def _unconvert(key: str, arr: np.ndarray, torch_leaf: str) -> np.ndarray:
    if torch_leaf == "weight_g":
        # standard: (out,) -> (out,1,...); ConvTranspose: (1,in,1) -> (in,1,1)
        if ".ups." in key:
            return arr.reshape(-1, 1, 1)
        if arr.ndim == 1:
            return arr.reshape(-1, 1, 1) if ".cond_layer" not in key and _is_conv_g(key) else arr.reshape(-1, 1)
        return arr
    if arr.ndim <= 1:
        return arr
    if arr.ndim == 2:
        return arr.transpose(1, 0)
    if arr.ndim == 3:
        if ".ups." in key:
            return arr.transpose(1, 2, 0)  # (k,in,out)->(in,out,k)
        return arr.transpose(2, 1, 0)      # (k,in,out)->(out,in,k)
    if arr.ndim == 4:
        return arr.transpose(3, 2, 0, 1)   # (kh,kw,in,out)->(out,in,kh,kw)
    raise ValueError(f"cannot unconvert {key} with shape {arr.shape}")


def _is_conv_g(key: str) -> bool:
    """Heuristic only used for weight_g reshaping of non-ups layers; resolved
    properly by export_torch_state_dict via the sibling v's ndim."""
    return True


def export_torch_state_dict(params: Dict[str, Any]) -> Dict[str, Any]:
    """Flatten our pytree into a reference-layout torch state_dict (numpy
    values; wrap with torch.as_tensor for torch.save). Inverse of
    load_torch_state_dict up to spectral-norm v buffers."""
    out: Dict[str, np.ndarray] = {}

    def rec(node, prefix):
        if not isinstance(node, Mapping):
            key = prefix
            out[key] = np.asarray(node)
            return
        leafs = {k: v for k, v in node.items() if not isinstance(v, Mapping)}
        for k, v in node.items():
            if isinstance(v, Mapping):
                rec(v, f"{prefix}.{k}" if prefix else k)
        for k, v in leafs.items():
            arr = np.asarray(v)
            if k == "w":
                name = "weight"
            elif k == "b":
                name = "bias"
            elif k == "v":
                name = "weight_v"
            elif k == "g":
                name = "weight_g"
            elif k == "embedding":
                name = "weight"
            elif k == "w_orig":
                name = "weight_orig"
            elif k == "u":
                name = "weight_u"
            elif k in ("gamma", "beta"):
                # nn.LayerNorm (enc_p.emb.1) uses weight/bias; modules.LayerNorm
                # keeps gamma/beta — distinguished by the known path
                if prefix.endswith("emb.1"):
                    name = "weight" if k == "gamma" else "bias"
                else:
                    name = k
            else:
                name = k
            key = f"{prefix}.{name}" if prefix else name
            if k == "embedding":
                out[key] = arr
            elif k == "g":
                sib = leafs.get("v")
                if sib is not None and np.asarray(sib).ndim == 2:
                    out[key] = arr.reshape(-1, 1)  # Linear weight_g (out,1)
                elif arr.ndim == 3:  # ConvTranspose stored (1,in,1)
                    out[key] = arr.reshape(-1, 1, 1)
                else:
                    out[key] = arr.reshape(-1, 1, 1)
            elif k in ("gamma", "beta", "b", "u", "weight", "alpha", "m", "logs"):
                out[key] = arr
            else:
                out[key] = _unconvert(key, arr, name)
    rec(params, "")
    return out


def save_torch_checkpoint(path: str, params: Dict[str, Any], iteration: int = 0):
    """Write a reference-compatible {'model': state_dict, 'iteration': N}
    .pth (export.py:148-154 shape) loadable by the PyTorch reference."""
    import torch
    state = {k: torch.as_tensor(np.ascontiguousarray(v))
             for k, v in export_torch_state_dict(params).items()}
    torch.save({"model": state, "iteration": iteration}, path)
