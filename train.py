#!/usr/bin/env python3
"""CLI: adversarial training, mel + MultiPeriodDiscriminator variant.

Parity with the reference train.py entry: `python train.py -m <name>
[-c config.json] [-a] [-d] [--ckptG ...] [--ckptD ...]`. Multi-host TPU:
launch one process per host (jax.distributed auto-initializes on TPU pods).
"""
import jax

from vits_tpu.config import get_hparams
from vits_tpu.train.loop import run


def main():
    hps = get_hparams()
    run(hps, variant="mel")


if __name__ == "__main__":
    main()
