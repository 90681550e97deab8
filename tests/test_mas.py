"""MAS: scan & pallas(interpret) implementations vs the scalar reference DP."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vits_tpu.ops import mas


def brute_force_best_path(neg_cent, t_y, t_x):
    """Exhaustive DP (different formulation) for tiny sizes: max-sum monotonic
    path value, used to sanity-check maximum_path_ref itself."""
    best = {}
    # state: (y, x) -> best sum ending there
    for y in range(t_y):
        for x in range(t_x):
            if x > y or t_y - y < t_x - x:
                continue
            c = neg_cent[y, x]
            if y == 0:
                best[(y, x)] = c if x == 0 else -np.inf
            else:
                cands = []
                if (y - 1, x) in best:
                    cands.append(best[(y - 1, x)])
                if x > 0 and (y - 1, x - 1) in best:
                    cands.append(best[(y - 1, x - 1)])
                best[(y, x)] = c + (max(cands) if cands else -np.inf)
    return best[(t_y - 1, t_x - 1)]


def random_case(rng, B, T_y, T_x):
    neg = rng.randn(B, T_y, T_x).astype(np.float32)
    t_ys = rng.randint(2, T_y + 1, size=B).astype(np.int32)
    t_xs = np.minimum(rng.randint(1, T_x + 1, size=B), t_ys).astype(np.int32)
    return neg, t_ys, t_xs


def test_ref_path_is_optimal_and_valid():
    rng = np.random.RandomState(0)
    neg, t_ys, t_xs = random_case(rng, 4, 9, 6)
    path = mas.maximum_path_ref(neg, t_ys, t_xs)
    for i in range(4):
        ty, tx = int(t_ys[i]), int(t_xs[i])
        p = path[i]
        assert p[:ty, :tx].sum() == ty  # one x per y
        assert p[ty:, :].sum() == 0 and p[:, tx:].sum() == 0
        xs_of_y = p[:ty, :tx].argmax(axis=1)
        assert xs_of_y[0] == 0 and xs_of_y[-1] == tx - 1
        assert np.all(np.diff(xs_of_y) >= 0) and np.all(np.diff(xs_of_y) <= 1)
        got = (neg[i][:ty, :tx] * p[:ty, :tx]).sum()
        best = brute_force_best_path(neg[i].astype(np.float64), ty, tx)
        np.testing.assert_allclose(got, best, rtol=1e-5)


@pytest.mark.parametrize("B,T_y,T_x", [(2, 7, 5), (4, 25, 12), (3, 64, 40), (2, 120, 60)])
def test_scan_matches_ref(B, T_y, T_x):
    rng = np.random.RandomState(B + T_y)
    neg, t_ys, t_xs = random_case(rng, B, T_y, T_x)
    ref = mas.maximum_path_ref(neg, t_ys, t_xs)
    got = np.asarray(mas.maximum_path_scan(jnp.asarray(neg), jnp.asarray(t_ys), jnp.asarray(t_xs)))
    np.testing.assert_array_equal(got, ref)


def test_scan_equal_lengths():
    # t_x == t_y forces the pure-diagonal path
    rng = np.random.RandomState(7)
    neg = rng.randn(2, 6, 6).astype(np.float32)
    t = np.array([6, 4], dtype=np.int32)
    ref = mas.maximum_path_ref(neg, t, t)
    got = np.asarray(mas.maximum_path_scan(jnp.asarray(neg), jnp.asarray(t), jnp.asarray(t)))
    np.testing.assert_array_equal(got, ref)
    for i, ti in enumerate(t):
        np.testing.assert_array_equal(got[i, :ti, :ti], np.eye(ti, dtype=np.float32))


@pytest.mark.parametrize("B,T_y,T_x", [(2, 16, 8), (3, 40, 24)])
def test_pallas_interpret_matches_ref(B, T_y, T_x):
    rng = np.random.RandomState(99)
    neg, t_ys, t_xs = random_case(rng, B, T_y, T_x)
    ref = mas.maximum_path_ref(neg, t_ys, t_xs)
    got = np.asarray(mas.maximum_path_pallas(
        jnp.asarray(neg), jnp.asarray(t_ys), jnp.asarray(t_xs), interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_dispatcher_with_mask():
    rng = np.random.RandomState(3)
    B, T_y, T_x = 3, 20, 9
    neg, t_ys, t_xs = random_case(rng, B, T_y, T_x)
    ymask = np.arange(T_y)[None, :] < t_ys[:, None]
    xmask = np.arange(T_x)[None, :] < t_xs[:, None]
    mask = (ymask[:, :, None] & xmask[:, None, :]).astype(np.float32)
    ref = mas.maximum_path_ref(neg, t_ys, t_xs)
    got = np.asarray(mas.maximum_path(jnp.asarray(neg), jnp.asarray(mask), impl="scan"))
    np.testing.assert_array_equal(got, ref)


def test_maximum_path_preserves_dtype_bf16():
    """bf16 training graphs must get a bf16 path back (the Pallas kernel
    computes in f32 internally; a f32 leak would promote every downstream
    einsum in Synthesizer.forward to f32)."""
    rng = np.random.RandomState(3)
    neg = jnp.asarray(rng.randn(2, 12, 6), jnp.bfloat16)
    mask = jnp.ones((2, 12, 6), jnp.bfloat16)
    for impl in ("scan",):
        out = mas.maximum_path(neg, mask, impl=impl)
        assert out.dtype == jnp.bfloat16, impl
    out = mas.maximum_path_pallas(
        neg, jnp.asarray([12, 12], jnp.int32), jnp.asarray([6, 6], jnp.int32),
        interpret=True).astype(neg.dtype)
    assert out.dtype == jnp.bfloat16
