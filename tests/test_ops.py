"""Golden tests: ops vs torch.nn.functional on random inputs."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from sudo_rm_rf_tpu import ops


def _rand(*shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(shape).astype(np.float32)


@pytest.mark.parametrize(
    "cin,cout,k,stride,pad,dil,groups",
    [
        (1, 24, 21, 10, 10, 1, 1),  # encoder shape
        (24, 16, 1, 1, 0, 1, 1),  # bottleneck
        (32, 32, 5, 1, 2, 1, 32),  # depthwise ladder lvl 0
        (32, 32, 5, 2, 2, 1, 32),  # depthwise ladder stride 2
        (16, 32, 3, 1, 2, 2, 1),  # dilated
        (12, 8, 3, 1, 1, 1, 4),  # grouped non-depthwise
    ],
)
def test_conv1d_matches_torch(cin, cout, k, stride, pad, dil, groups):
    x = _rand(2, cin, 101, seed=1)
    w = _rand(cout, cin // groups, k, seed=2) * 0.1
    b = _rand(cout, seed=3) * 0.1

    want = F.conv1d(
        torch.from_numpy(x),
        torch.from_numpy(w),
        torch.from_numpy(b),
        stride=stride,
        padding=pad,
        dilation=dil,
        groups=groups,
    ).numpy()
    got = np.asarray(
        ops.conv1d(
            jnp.array(x),
            jnp.array(w),
            jnp.array(b),
            stride=stride,
            padding=pad,
            dilation=dil,
            groups=groups,
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize(
    "cin,cout,k,stride,pad,outpad,groups",
    [
        (48, 2, 21, 10, 10, 9, 1),  # improved decoder
        (48, 2, 21, 10, 10, 9, 2),  # v1 grouped decoder
        (8, 12, 4, 2, 1, 0, 1),
        (8, 8, 5, 3, 2, 1, 4),
    ],
)
def test_conv_transpose1d_matches_torch(cin, cout, k, stride, pad, outpad, groups):
    x = _rand(2, cin, 40, seed=4)
    w = _rand(cin, cout // groups, k, seed=5) * 0.1
    b = _rand(cout, seed=6) * 0.1

    want = F.conv_transpose1d(
        torch.from_numpy(x),
        torch.from_numpy(w),
        torch.from_numpy(b),
        stride=stride,
        padding=pad,
        output_padding=outpad,
        groups=groups,
    ).numpy()
    got = np.asarray(
        ops.conv_transpose1d(
            jnp.array(x),
            jnp.array(w),
            jnp.array(b),
            stride=stride,
            padding=pad,
            output_padding=outpad,
            groups=groups,
        )
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_glob_ln_matches_reference_formula():
    from sudo_rm_rf.dnn.models import improved_sudormrf as ref

    x = _rand(3, 16, 50, seed=7)
    m = ref.GlobLN(16)
    with torch.no_grad():
        m.gamma.uniform_(0.5, 1.5)
        m.beta.uniform_(-0.5, 0.5)
    want = m(torch.from_numpy(x)).detach().numpy()
    got = np.asarray(
        ops.glob_ln(
            jnp.array(x),
            jnp.array(m.gamma.detach().numpy()),
            jnp.array(m.beta.detach().numpy()),
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_glob_ln_matches_groupnorm1():
    x = _rand(3, 16, 50, seed=8)
    m = torch.nn.GroupNorm(1, 16, eps=1e-8)
    with torch.no_grad():
        m.weight.uniform_(0.5, 1.5)
        m.bias.uniform_(-0.5, 0.5)
    want = m(torch.from_numpy(x)).detach().numpy()
    got = np.asarray(
        ops.glob_ln(
            jnp.array(x),
            jnp.array(m.weight.detach().numpy()),
            jnp.array(m.bias.detach().numpy()),
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_upsample_nearest_2x_matches_torch():
    x = _rand(2, 8, 30, seed=9)
    up = torch.nn.Upsample(scale_factor=2)
    want = up(torch.from_numpy(x)).numpy()
    got = np.asarray(ops.upsample_nearest_2x(jnp.array(x)))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("length,mult", [(100, 160), (160, 160), (161, 160), (5, 160)])
def test_padded_length_matches_reference(length, mult):
    # replicate the reference arithmetic (`improved_sudormrf.py:303-310`)
    if length < mult:
        want = mult
    else:
        res = 1 if length % mult else 0
        want = (length // mult + res) * mult
    assert ops.pad.padded_length(length, mult) == want


def test_pad_unpad_roundtrip():
    x = jnp.arange(2 * 3 * 101, dtype=jnp.float32).reshape(2, 3, 101)
    y = ops.pad_to_multiple(x, 32)
    assert y.shape[-1] == 128
    np.testing.assert_array_equal(np.asarray(y[..., 101:]), 0.0)
    np.testing.assert_array_equal(np.asarray(ops.unpad_to_length(y, 101)), np.asarray(x))


def test_cumulative_ln_matches_convtasnet_cln():
    from sudo_rm_rf.dnn.models import original_convtasnet as ref

    x = _rand(2, 12, 40, seed=10)
    m = ref.cLN(12, eps=1e-8)
    with torch.no_grad():
        m.gain.uniform_(0.5, 1.5)
        m.bias.uniform_(-0.5, 0.5)
    want = m(torch.from_numpy(x)).detach().numpy()
    got = np.asarray(
        ops.norm.cumulative_ln(
            jnp.array(x),
            jnp.array(m.gain.detach().numpy().ravel()),
            jnp.array(m.bias.detach().numpy().ravel()),
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
