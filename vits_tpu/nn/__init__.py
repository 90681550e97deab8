from vits_tpu.nn.core import (
    Dense,
    Conv1d,
    ConvTranspose1d,
    Conv2d,
    Embedding,
    LayerNorm,
    dropout,
    fold_weight_norm,
)

__all__ = [
    "Dense",
    "Conv1d",
    "ConvTranspose1d",
    "Conv2d",
    "Embedding",
    "LayerNorm",
    "dropout",
    "fold_weight_norm",
]
