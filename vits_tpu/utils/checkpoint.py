"""Checkpoint I/O.

Capability parity with the reference utils.py: save_checkpoint/load_checkpoint
({model, iteration, optimizer}, utils.py:19-57) with the tolerant key-union
merge (missing keys keep current values, logged) and the `adapt` mode (reset
iteration, skip optimizer — utils.py:22-27); latest_checkpoint_path digit-sort
(utils.py:71-78); greedy-soup averaging of the last N checkpoints
(export.py:49-58).

Format: .npz of path-flattened pytree leaves (portable, mmap-friendly, no
pickle). Loading the reference's torch .pth files goes through
vits_tpu.utils.torch_compat instead.
"""

from __future__ import annotations

import glob
import logging
import os
import re
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

_SEP = "//"


def _flatten(tree, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{_SEP}{k}" if prefix else str(k)))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{_SEP}{i}" if prefix else str(i)))
        if len(tree) == 0:
            out[prefix + _SEP + "__empty__"] = np.zeros(0)
    elif tree is None:
        out[prefix + _SEP + "__none__"] = np.zeros(0)
    else:
        out[prefix] = np.asarray(tree)
    return out


def save_checkpoint(path: str, state: Any, step: int = 0, epoch: int = 1,
                    extra: Optional[Dict[str, Any]] = None):
    """state: arbitrary pytree (params and/or optimizer state)."""
    flat = _flatten(jax.device_get(state))
    flat["__step__"] = np.asarray(step)
    flat["__epoch__"] = np.asarray(epoch)
    if extra:
        for k, v in extra.items():
            flat[f"__extra__{_SEP}{k}"] = np.asarray(v)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **flat)
    os.replace(tmp, path)
    logger.info("Saved checkpoint at step %d to %s", step, path)


def load_into(template: Any, flat: Dict[str, np.ndarray], prefix="") -> Any:
    """Fill a template pytree from a flat dict; missing keys keep template
    values (key-union merge, utils.py:33-43)."""
    if isinstance(template, dict):
        return {k: load_into(v, flat, f"{prefix}{_SEP}{k}" if prefix else str(k))
                for k, v in template.items()}
    if isinstance(template, tuple) and hasattr(template, "_fields"):  # NamedTuple
        return type(template)(*(load_into(v, flat, f"{prefix}{_SEP}{i}" if prefix else str(i))
                                for i, v in enumerate(template)))
    if isinstance(template, (list, tuple)):
        return type(template)(load_into(v, flat, f"{prefix}{_SEP}{i}" if prefix else str(i))
                              for i, v in enumerate(template))
    if template is None:
        return None
    if prefix in flat:
        arr = flat[prefix]
        t = jnp.asarray(template)
        if arr.shape != t.shape:
            logger.info("%s: shape %s != %s; keeping current", prefix, arr.shape, t.shape)
            return template
        return jnp.asarray(arr, dtype=t.dtype)
    logger.info("%s is not in the checkpoint", prefix)
    return template


def load_checkpoint(path: str, template: Any):
    """Returns (state, step, epoch)."""
    with np.load(path, allow_pickle=False) as z:
        flat = {k: z[k] for k in z.files}
    step = int(flat.pop("__step__", 0))
    epoch = int(flat.pop("__epoch__", 1))
    state = load_into(template, flat)
    logger.info("Loaded checkpoint '%s' (step %d)", path, step)
    return state, step, epoch


def latest_checkpoint_path(dir_path: str, regex: str = "G_*.npz") -> Optional[str]:
    f_list = glob.glob(os.path.join(dir_path, regex))
    if not f_list:
        return None
    f_list.sort(key=lambda f: int("".join(filter(str.isdigit, os.path.basename(f))) or 0))
    return f_list[-1]


def checkpoint_paths_sorted(dir_path: str, regex: str = "G_*.npz"):
    f_list = glob.glob(os.path.join(dir_path, regex))
    f_list.sort(key=lambda f: int("".join(filter(str.isdigit, os.path.basename(f))) or 0))
    return f_list


def greedy_soup(paths, template, greedy: int = 5):
    """Average the last `greedy` checkpoints' params (export.py:49-58)."""
    paths = paths[-greedy:] if greedy > 0 else paths[-1:]
    acc = None
    n = 0
    for p in paths:
        state, _, _ = load_checkpoint(p, template)
        if acc is None:
            acc = jax.tree_util.tree_map(lambda a: np.asarray(a, np.float64), state)
        else:
            acc = jax.tree_util.tree_map(lambda a, b: a + np.asarray(b, np.float64), acc, state)
        n += 1
    return jax.tree_util.tree_map(
        lambda a, t: jnp.asarray(a / n, dtype=jnp.asarray(t).dtype), acc, template)


def prune_checkpoints(dir_path: str, keep: int = 5, regex: str = "G_*.npz"):
    """Keep the newest `keep` checkpoints (toolkits/del_ckpt.sh semantics)."""
    paths = checkpoint_paths_sorted(dir_path, regex)
    for p in paths[:-keep] if keep > 0 else []:
        try:
            os.remove(p)
        except OSError:
            pass
