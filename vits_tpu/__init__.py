"""vits_tpu — a TPU-native (JAX/XLA/Pallas) emotion-controllable multi-speaker
VITS text-to-speech framework.

Built from scratch against the capability surface of the reference
`wwyuan2023/VITS` (emotional-vits) PyTorch repo: transformer text encoder over
dense float text vectors, deterministic duration predictor, affine-coupling
normalizing flows, WaveNet posterior encoder, monotonic alignment search (as a
Pallas DP kernel), HiFi-GAN-style upsampling decoder with speaker/emotion
conditioning, MPD/MRD adversarial training, mel + multi-resolution STFT losses
on MXU-matmul STFTs, data-parallel training over a `jax.sharding.Mesh`, and an
export/serving stack (two-phase jitted inference, sentence splitting, socket +
HTTP serving, speaker-adaptive training).

Layout conventions (TPU-first, differs from the torch reference):
  * sequence tensors are channel-last `(B, T, C)` so the channel dimension maps
    to the 128-wide lane dimension of the VPU/MXU;
  * a single masked implementation serves both training and inference —
    inference uses bucketed static shapes + masks instead of the reference's
    separate mask-free `infer()` methods;
  * all randomness is explicit `jax.random` key threading;
  * mutable schedule state (e.g. the reference's annealed alignment noise,
    models.py:491-495) is explicit functional state, never a Python attribute.
"""

from vits_tpu.version import __version__

__all__ = ["__version__"]
