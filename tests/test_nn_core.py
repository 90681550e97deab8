"""Golden tests: nn.core layers vs torch CPU equivalents."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from vits_tpu.nn import core as nnc


def t2j_conv1d_w(w):
    # torch (out, in/groups, k) -> lax WIO (k, in/groups, out)
    return jnp.asarray(w.detach().numpy().transpose(2, 1, 0))


def t2j_convT1d_w(w):
    # torch ConvTranspose1d (in, out, k) -> our (k, in, out)
    return jnp.asarray(w.detach().numpy().transpose(2, 0, 1))


def t2j_conv2d_w(w):
    # torch (out, in, kh, kw) -> (kh, kw, in, out)
    return jnp.asarray(w.detach().numpy().transpose(2, 3, 1, 0))


@pytest.mark.parametrize("k,stride,pad,dil,groups", [
    (1, 1, 0, 1, 1),
    (5, 1, 2, 1, 1),
    (3, 1, 2, 2, 1),
    (41, 4, 20, 1, 4),
    (5, 3, 2, 1, 1),
])
def test_conv1d_matches_torch(k, stride, pad, dil, groups):
    torch.manual_seed(0)
    cin, cout, T, B = 8, 12, 37, 2
    tc = torch.nn.Conv1d(cin, cout, k, stride=stride, padding=pad, dilation=dil, groups=groups)
    x = torch.randn(B, cin, T)
    ref = tc(x).detach().numpy()  # (B, cout, T')

    layer = nnc.Conv1d(cin, cout, k, stride=stride, padding=pad, dilation=dil, groups=groups)
    p = {"w": t2j_conv1d_w(tc.weight), "b": jnp.asarray(tc.bias.detach().numpy())}
    y = layer.apply(p, jnp.asarray(x.numpy().transpose(0, 2, 1)))  # (B, T', cout)
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), ref, atol=1e-5)


@pytest.mark.parametrize("k,stride,pad", [
    (16, 8, 4), (12, 6, 3), (4, 2, 1),
])
def test_conv_transpose1d_matches_torch(k, stride, pad):
    torch.manual_seed(1)
    cin, cout, T, B = 6, 4, 25, 2
    tc = torch.nn.ConvTranspose1d(cin, cout, k, stride=stride, padding=pad)
    x = torch.randn(B, cin, T)
    ref = tc(x).detach().numpy()

    layer = nnc.ConvTranspose1d(cin, cout, k, stride=stride, padding=pad)
    p = {"w": t2j_convT1d_w(tc.weight), "b": jnp.asarray(tc.bias.detach().numpy())}
    y = layer.apply(p, jnp.asarray(x.numpy().transpose(0, 2, 1)))
    assert y.shape == (B, ref.shape[2], cout)
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), ref, atol=1e-5)


def test_conv2d_matches_torch():
    torch.manual_seed(2)
    tc = torch.nn.Conv2d(3, 7, (5, 1), stride=(3, 1), padding=(2, 0))
    x = torch.randn(2, 3, 40, 11)
    ref = tc(x).detach().numpy()

    layer = nnc.Conv2d(3, 7, (5, 1), stride=(3, 1), padding=(2, 0))
    p = {"w": t2j_conv2d_w(tc.weight), "b": jnp.asarray(tc.bias.detach().numpy())}
    y = layer.apply(p, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(y).transpose(0, 3, 1, 2), ref, atol=1e-5)


def test_layernorm_matches_torch():
    torch.manual_seed(3)
    C = 16
    tl = torch.nn.LayerNorm(C)
    with torch.no_grad():
        tl.weight.normal_()
        tl.bias.normal_()
    x = torch.randn(2, 9, C)
    ref = tl(x).detach().numpy()

    layer = nnc.LayerNorm(C)
    p = {"gamma": jnp.asarray(tl.weight.detach().numpy()), "beta": jnp.asarray(tl.bias.detach().numpy())}
    y = layer.apply(p, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-5)


def test_weight_norm_fold_matches_torch():
    torch.manual_seed(4)
    tc = torch.nn.utils.weight_norm(torch.nn.Conv1d(8, 12, 5, padding=2))
    x = torch.randn(2, 8, 20)
    ref = tc(x).detach().numpy()

    layer = nnc.Conv1d(8, 12, 5, padding=2, weight_norm=True)
    # torch weight_v (out, in, k), weight_g (out, 1, 1)
    v = t2j_conv1d_w(tc.weight_v)
    g = jnp.asarray(tc.weight_g.detach().numpy().reshape(-1))
    p = {"v": v, "g": g, "b": jnp.asarray(tc.bias.detach().numpy())}
    y = layer.apply(p, jnp.asarray(x.numpy().transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), ref, atol=1e-5)

    folded = nnc.fold_weight_norm(p)
    assert "w" in folded and "v" not in folded
    y2 = layer.apply(folded, jnp.asarray(x.numpy().transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y), atol=1e-6)


def test_spectral_norm_converges_to_torch():
    torch.manual_seed(5)
    tc = torch.nn.utils.spectral_norm(torch.nn.Conv1d(8, 12, 5, padding=2))
    x = torch.randn(2, 8, 20)
    # run torch a few times to converge its power iteration
    with torch.no_grad():
        for _ in range(200):
            tc(x)
    ref = tc(x).detach().numpy()

    w = t2j_conv1d_w(tc.weight_orig)
    u = jnp.asarray(np.random.RandomState(0).randn(12).astype(np.float32))
    for _ in range(300):
        w_sn, u = nnc.spectral_normalize(jnp.asarray(w), u)
    layer = nnc.Conv1d(8, 12, 5, padding=2)
    p = {"w": w_sn, "b": jnp.asarray(tc.bias.detach().numpy())}
    y = layer.apply(p, jnp.asarray(x.numpy().transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), ref, atol=1e-3, rtol=1e-3)
