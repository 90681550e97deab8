"""Config / flag system.

Parity with the reference utils.py: recursive attr-dict HParams (utils.py:249-278),
JSON config loading (get_hparams_from_file, utils.py:205-211), run-dir config
snapshotting (get_hparams, utils.py:152-191).
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Any


class HParams:
    """Recursive attribute dict over a JSON config (utils.py:249-278)."""

    def __init__(self, **kwargs):
        for k, v in kwargs.items():
            if isinstance(v, dict):
                v = HParams(**v)
            self[k] = v

    def keys(self):
        return self.__dict__.keys()

    def items(self):
        return self.__dict__.items()

    def values(self):
        return self.__dict__.values()

    def to_dict(self):
        return {k: (v.to_dict() if isinstance(v, HParams) else v) for k, v in self.items()}

    def __len__(self):
        return len(self.__dict__)

    def __getitem__(self, key):
        return getattr(self, key)

    def __setitem__(self, key, value):
        return setattr(self, key, value)

    def __contains__(self, key):
        return key in self.__dict__

    def __repr__(self):
        return self.__dict__.__repr__()


def get_hparams_from_file(config_path: str) -> HParams:
    with open(config_path, "r") as f:
        config = json.load(f)
    return HParams(**config)


def get_hparams_from_dir(model_dir: str) -> HParams:
    hps = get_hparams_from_file(os.path.join(model_dir, "config.json"))
    hps.model_dir = model_dir
    return hps


def default_config_path(name: str = "base") -> str:
    return os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "configs", f"{name}.json")


def get_hparams(args=None, init: bool = True) -> HParams:
    """CLI entry config, mirroring utils.get_hparams (utils.py:152-191):
    -c config JSON, -m model name (run dir ./logs/<model>), -a adapt flag,
    -d duration-discriminator flag, --ckptG/--ckptD resume paths. The config
    is snapshotted into the run dir so resumes/exports are self-describing."""
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", type=str, default=None,
                        help="JSON configuration file")
    parser.add_argument("-m", "--model", type=str, required=True, help="model/run name")
    parser.add_argument("-a", "--adapt", action="store_true",
                        help="speaker-adaptive finetune: reset step count + fresh optimizer")
    parser.add_argument("-d", "--use-dur-dis", action="store_true",
                        help="train with the adversarial duration discriminator")
    parser.add_argument("--ckptG", type=str, required=False, help="generator checkpoint to resume")
    parser.add_argument("--ckptD", type=str, required=False, help="discriminator checkpoint to resume")
    args = parser.parse_args(args)

    model_dir = os.path.join("./logs", args.model)
    os.makedirs(model_dir, exist_ok=True)
    config_save_path = os.path.join(model_dir, "config.json")
    if init:
        config_path = args.config or default_config_path()
        with open(config_path, "r") as f:
            data = f.read()
        with open(config_save_path, "w") as f:
            f.write(data)
    else:
        with open(config_save_path, "r") as f:
            data = f.read()

    hps = HParams(**json.loads(data))
    hps.model_dir = model_dir
    hps.adapt = args.adapt
    hps.use_dur_dis = args.use_dur_dis
    hps.ckptG = args.ckptG
    hps.ckptD = args.ckptD
    return hps
