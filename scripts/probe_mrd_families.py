#!/usr/bin/env python3
"""Per-family timing of the MRD discriminator (VERDICT r3 task 3): MWD levels
vs MSTFT resolutions, fwd and fwd+grad, at the real stft-step shapes
(batched real+fake: B=64, T=6144 samples, bf16). Also races the current
phase-decomposed dilated VALID conv against a shifted-matmul formulation
(k offset slices @ w[j], no transposes) inside the full MWD graph.

Each piece prints one JSON line when measured.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from vits_tpu.models import mrd as M
from vits_tpu.nn.core import wn_kernel, sn_update
from vits_tpu.train import losses as L

DT = jnp.bfloat16


def _tree_sum(t):
    return sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree_util.tree_leaves(t))


_CK = jax.jit(_tree_sum)


def timeit(fn, *args, iters=10):
    t0 = time.time()
    out = fn(*args)
    jax.device_get(_CK(out))
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(_CK(out))
    return (time.time() - t0) / iters, compile_s


def emit(name, dt, compile_s):
    print(json.dumps({"piece": name, "ms": round(dt * 1e3, 2),
                      "compile_s": round(compile_s, 1)}), flush=True)


def shifted_matmul_conv(conv, p, x):
    """Dilated VALID conv as k offset-sliced matmuls (no phase transposes)."""
    d, k = conv.dilation, conv.kernel_size
    T_out = x.shape[1] - (k - 1) * d
    w = wn_kernel(p)
    y = x[:, 0:T_out] @ w[0]
    for j in range(1, k):
        y = y + x[:, j * d:j * d + T_out] @ w[j]
    if conv.bias:
        y = y + p["b"]
    return y


def main():
    B, T = 64, 6144  # batched real+fake at segment length
    disc = M.MultiWaveSTFTDiscriminator()
    params = disc.init_params(jax.random.PRNGKey(0))
    params = sn_update(params)
    cast = lambda t: jax.tree_util.tree_map(
        lambda a: a.astype(DT) if a.dtype == jnp.float32 else a, t)
    params = cast(params)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.uniform(-0.5, 0.5, (B, T, 1)), DT)
    resolutions = L.DEFAULT_RESOLUTIONS
    mags = [L.stft_magnitude(x[..., 0].astype(jnp.float32), *r).astype(DT)
            for r in resolutions]

    mwd, mfd = disc.mwd, disc.mfd

    # family fwd
    f = jax.jit(lambda p, x: mwd.apply(p["mwd"], x))
    emit("mwd_fwd", *timeit(f, params, x))
    f = jax.jit(lambda p, m: mfd.apply(p["mfd"], m))
    emit("mstft_fwd", *timeit(f, params, mags))

    # family fwd+grad (discriminator_loss-like scalar over scores)
    def mwd_loss(p, x):
        return sum(jnp.sum(jnp.square(s.astype(jnp.float32)))
                   for s in mwd.apply(p["mwd"], x))
    f = jax.jit(jax.grad(mwd_loss))
    emit("mwd_grad", *timeit(f, params, x))

    def mfd_loss(p, m):
        return sum(jnp.sum(jnp.square(s.astype(jnp.float32)))
                   for s in mfd.apply(p["mfd"], m))
    f = jax.jit(jax.grad(mfd_loss))
    emit("mstft_grad", *timeit(f, params, mags))

    # shifted-matmul dilated conv variant inside the full MWD graph
    orig = M.dilated_valid_conv_phased
    M.dilated_valid_conv_phased = shifted_matmul_conv
    try:
        f = jax.jit(lambda p, x: mwd.apply(p["mwd"], x))
        emit("mwd_fwd_shifted", *timeit(f, params, x))
        f = jax.jit(jax.grad(mwd_loss))
        emit("mwd_grad_shifted", *timeit(f, params, x))
    finally:
        M.dilated_valid_conv_phased = orig

    # per-level MWD fwd (where do the wave FLOPs go?)
    xx = x
    for i in range(mwd.num_dwt):
        d = mwd._disc(i)
        f = jax.jit(lambda p, x, i=i, d=d: d.apply(p["mwd"]["discriminators"][str(i)], x))
        emit(f"mwd_level{i}_fwd", *timeit(f, params, xx))
        if i + 1 < mwd.num_dwt:
            Bx, Tx, Cx = xx.shape
            xx = xx.reshape(Bx, 2, Tx // 2, Cx).transpose(0, 2, 3, 1).reshape(Bx, Tx // 2, 2 * Cx)


if __name__ == "__main__":
    main()
