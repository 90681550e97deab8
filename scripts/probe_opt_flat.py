"""Time AdamW-update formulations on the real generator tree (B: graph-only
times via per-step sync; each measurement includes one ~25 ms RT)."""
import json, time
import numpy as np
import jax, jax.numpy as jnp

from vits_tpu.config import get_hparams_from_file, default_config_path
from vits_tpu.models.synthesizer import Synthesizer
from vits_tpu.train.optim import Optimizer

hps = get_hparams_from_file(default_config_path("base"))
synth = Synthesizer.from_hps(hps)
params = synth.init_params(jax.random.PRNGKey(0))
n_leaves = len(jax.tree_util.tree_leaves(params))
n_params = sum(int(np.prod(np.shape(a))) for a in jax.tree_util.tree_leaves(params))
print(f"leaves={n_leaves} params={n_params/1e6:.1f}M", flush=True)

opt = Optimizer("adamw", (0.8, 0.99), 1e-9, 0.01)
state = opt.init(params)
grads = jax.tree_util.tree_map(lambda a: jnp.ones_like(a) * 1e-4, params)

def _sync(r):
    leaf = jax.tree_util.tree_leaves(r)[0]
    np.asarray(leaf.ravel()[0])  # scalar fetch only

def timeit(f, *a, iters=30):
    t0 = time.time()
    r = f(*a)
    _sync(r)
    compile_s = time.time() - t0
    ts = []
    for _ in range(iters):
        t0 = time.time()
        r = f(*a)
        _sync(r)
        ts.append(time.time() - t0)
    return float(np.median(ts)), compile_s

# (a) current tree update
upd = jax.jit(lambda p, s, g: opt.update(p, s, g, 2e-4))
dt, cs = timeit(upd, params, state, grads)
print(json.dumps({"form": "tree_adamw", "ms": round(dt*1e3, 2), "compile_s": round(cs,1)}), flush=True)

# (b) flat buffer same math (floor)
flat = jnp.zeros((n_params,), jnp.float32)
m = jnp.zeros_like(flat); v = jnp.zeros_like(flat)
gf = jnp.ones_like(flat) * 1e-4
@jax.jit
def flat_update(p, m, v, g):
    b1, b2, eps, wd, lr = 0.8, 0.99, 1e-9, 0.01, 2e-4
    m2 = b1*m + (1-b1)*g
    v2 = b2*v + (1-b2)*g*g
    p2 = p - lr*(m2/ (jnp.sqrt(v2)+eps) + wd*p)
    return p2, m2, v2
dt, cs = timeit(flat_update, flat, m, v, gf)
print(json.dumps({"form": "flat_adamw_floor", "ms": round(dt*1e3, 2), "compile_s": round(cs,1)}), flush=True)

# (c) flatten -> flat update -> unflatten inside one jit
leaves, treedef = jax.tree_util.tree_flatten(params)
sizes = [int(np.prod(np.shape(a))) for a in leaves]
shapes = [np.shape(a) for a in leaves]
offs = np.cumsum([0] + sizes)
@jax.jit
def roundtrip_update(p_tree, m, v, g_tree):
    pl = jax.tree_util.tree_leaves(p_tree)
    gl = jax.tree_util.tree_leaves(g_tree)
    pf = jnp.concatenate([a.ravel() for a in pl])
    gf = jnp.concatenate([a.ravel() for a in gl])
    p2, m2, v2 = flat_update._fun(pf, m, v, gf) if hasattr(flat_update, "_fun") else (None,)*3
    return p2, m2, v2
# simpler: inline math
@jax.jit
def roundtrip(p_tree, m, v, g_tree):
    pl = jax.tree_util.tree_leaves(p_tree)
    gl = jax.tree_util.tree_leaves(g_tree)
    pf = jnp.concatenate([a.ravel() for a in pl])
    gf2 = jnp.concatenate([a.ravel() for a in gl])
    b1, b2, eps, wd, lr = 0.8, 0.99, 1e-9, 0.01, 2e-4
    m2 = b1*m + (1-b1)*gf2
    v2 = b2*v + (1-b2)*gf2*gf2
    p2 = pf - lr*(m2/(jnp.sqrt(v2)+eps) + wd*pf)
    outs = [jax.lax.dynamic_slice(p2, (int(offs[i]),), (sizes[i],)).reshape(shapes[i])
            for i in range(len(sizes))]
    return jax.tree_util.tree_unflatten(treedef, outs), m2, v2
dt, cs = timeit(roundtrip, params, m, v, grads)
print(json.dumps({"form": "flatten_update_unflatten", "ms": round(dt*1e3, 2), "compile_s": round(cs,1)}), flush=True)
