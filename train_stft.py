#!/usr/bin/env python3
"""CLI: adversarial training, multi-resolution STFT + MultiWaveSTFT
discriminator variant (parity with the reference train_stft.py; RAdam for the
discriminator, loss/discriminator share one multi-res STFT computation)."""
import jax

from vits_tpu.config import get_hparams
from vits_tpu.train.loop import run


def main():
    hps = get_hparams()
    run(hps, variant="stft")


if __name__ == "__main__":
    main()
