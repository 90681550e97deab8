"""Optimizers and schedules.

Parity targets: AdamW with torch hyperparameters (train.py:86-106), RAdam for
the STFT-variant discriminators (train_stft.py:97-98, radam.py:13-99),
per-epoch exponential LR decay (train.py:135-137), and gradient value-clipping
with grad-norm reporting (commons.clip_grad_value_, commons.py:158-173).

Implemented as optax gradient transformations; the learning rate is threaded as
a runtime scalar (no recompilation when it decays).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class RAdamState(NamedTuple):
    # module-level on purpose: pytree treedefs compare node CLASS identity,
    # and inject_hyperparams re-invokes the transformation factory on every
    # update — a class defined inside scale_by_radam_rect would be a fresh
    # type per step, so the output opt-state's treedef would never equal the
    # input's and every jitted train step would silently retrace+recompile
    # (observed as ~190 s/step for the stft variant on the TPU relay).
    count: jnp.ndarray
    mu: optax.Updates
    nu: optax.Updates


def scale_by_radam_rect(b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    """Rectified Adam (radam.py semantics: variance rectification with SMA
    threshold 5, momentum-SGD fallback below it, decoupled weight decay is
    applied by the caller)."""

    def init_fn(params):
        return RAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(jnp.zeros_like, params),
            nu=jax.tree_util.tree_map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        t = count.astype(jnp.float32)
        mu = jax.tree_util.tree_map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, updates)
        nu = jax.tree_util.tree_map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, updates)
        beta2_t = jnp.power(b2, t)
        n_sma_max = 2.0 / (1.0 - b2) - 1.0
        n_sma = n_sma_max - 2.0 * t * beta2_t / (1.0 - beta2_t)
        rect = jnp.sqrt((1.0 - beta2_t) * (n_sma - 4.0) / (n_sma_max - 4.0)
                        * (n_sma - 2.0) / n_sma * n_sma_max / (n_sma_max - 2.0))
        bias1 = 1.0 - jnp.power(b1, t)
        step_adam = rect / bias1
        step_sgd = 1.0 / bias1
        use_adam = n_sma >= 5.0

        def upd(m, v):
            adam = step_adam * m / (jnp.sqrt(v) + eps)
            sgd = step_sgd * m
            return jnp.where(use_adam, adam, sgd)

        new_updates = jax.tree_util.tree_map(upd, mu, nu)
        return new_updates, RAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(kind: str, betas, eps: float, weight_decay: float):
    """Returns an optax transformation whose final scale is `-lr` injected at
    update time via optax.inject_hyperparams-free plumbing: we use
    scale_by_learning_rate with a schedule-free scalar passed through
    `opt_update(..., lr)` wrappers in step.py."""
    if kind == "adamw":
        def tx(lr):
            return optax.chain(
                optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps),
                optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
                optax.scale(-lr),
            )
    elif kind == "radam":
        def tx(lr):
            return optax.chain(
                scale_by_radam_rect(b1=betas[0], b2=betas[1], eps=eps),
                optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
                optax.scale(-lr),
            )
    else:
        raise ValueError(kind)
    return tx


class Optimizer:
    """Thin wrapper: init once, update with a runtime lr scalar.

    Uses inject_hyperparams so lr is a traced array (per-epoch exponential
    decay without recompiles, train.py:135-148)."""

    def __init__(self, kind: str, betas, eps: float, weight_decay: float):
        if kind == "adamw":
            base = lambda learning_rate: optax.chain(
                optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps),
                optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
                optax.scale(-1.0 * learning_rate),
            )
        elif kind == "radam":
            base = lambda learning_rate: optax.chain(
                scale_by_radam_rect(b1=betas[0], b2=betas[1], eps=eps),
                optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
                optax.scale(-1.0 * learning_rate),
            )
        else:
            raise ValueError(kind)
        self.tx = optax.inject_hyperparams(base)(learning_rate=0.0)

    def init(self, params):
        return self.tx.init(params)

    def update(self, grads, state, params, lr):
        state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
        return self.tx.update(grads, state, params)


def exponential_lr(base_lr: float, lr_decay: float, epoch: int) -> float:
    """ExponentialLR per epoch: lr = base * decay^(epoch-1) with last_epoch=-1
    semantics (decay applied after each epoch, train.py:135-137,146-148)."""
    return base_lr * (lr_decay ** max(epoch - 1, 0))
