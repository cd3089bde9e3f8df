"""Fused Pallas U-ConvBlock: parity vs the XLA path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sudo_rm_rf_tpu import models
from sudo_rm_rf_tpu.models.fast_inference import improved_forward_fast
from sudo_rm_rf_tpu.models.improved_sudormrf import UConvBlock
from sudo_rm_rf_tpu.ops.pallas.uconv import (
    fused_uconv_block,
    params_from_flax,
    uconv_block_reference,
)


def _rand_params(depth, ci, co, seed=0):
    rng = np.random.default_rng(seed)
    p = {
        "proj_w": rng.standard_normal((ci, co)).astype(np.float32) * 0.1,
        "proj_b": rng.standard_normal(ci).astype(np.float32) * 0.1,
        "proj_g": rng.uniform(0.5, 1.5, ci).astype(np.float32),
        "proj_beta": rng.standard_normal(ci).astype(np.float32) * 0.1,
        "proj_slope": np.float32(0.25),
        "dw_w": rng.standard_normal((depth, ci, 5)).astype(np.float32) * 0.3,
        "dw_b": rng.standard_normal((depth, ci)).astype(np.float32) * 0.1,
        "dw_g": rng.uniform(0.5, 1.5, (depth, ci)).astype(np.float32),
        "dw_beta": rng.standard_normal((depth, ci)).astype(np.float32) * 0.1,
        "final_g": rng.uniform(0.5, 1.5, ci).astype(np.float32),
        "final_beta": rng.standard_normal(ci).astype(np.float32) * 0.1,
        "final_slope": np.float32(0.25),
        "res_w": rng.standard_normal((co, ci)).astype(np.float32) * 0.1,
        "res_b": rng.standard_normal(co).astype(np.float32) * 0.1,
    }
    return {k: jnp.asarray(v) for k, v in p.items()}


@pytest.mark.parametrize("depth,t", [(4, 512), (5, 640)])
def test_fused_kernel_matches_reference(depth, t):
    params = _rand_params(depth, 64, 32, seed=depth)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 32, t)).astype(np.float32)
    )
    want = np.asarray(uconv_block_reference(x, params, depth))
    got = np.asarray(fused_uconv_block(x, params, depth=depth, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_reference_param_mapping_matches_flax_block():
    """kernel parameterization == the flax UConvBlock, via params_from_flax."""
    blk = UConvBlock(out_channels=32, in_channels=64, upsampling_depth=4)
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((2, 32, 512)).astype(np.float32)
    )
    variables = blk.init(jax.random.key(0), x)
    want = np.asarray(blk.apply(variables, x))
    kp = params_from_flax(variables["params"])
    got = np.asarray(uconv_block_reference(x, kp, 4))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_improved_forward_fast_matches_model():
    hp = dict(out_channels=32, in_channels=64, num_blocks=2, upsampling_depth=3,
              enc_kernel_size=21, enc_num_basis=24, num_sources=2)
    model = models.SuDORMRFImproved(**hp)
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((2, 1, 661)).astype(np.float32)
    )
    variables = model.init(jax.random.key(0), x)
    want = np.asarray(model.apply(variables, x))

    got_xla = np.asarray(
        improved_forward_fast(
            variables["params"], x, num_blocks=2, upsampling_depth=3,
            enc_kernel_size=21, num_sources=2, use_pallas=False,
        )
    )
    np.testing.assert_allclose(got_xla, want, rtol=1e-4, atol=1e-5)

    got_pl = np.asarray(
        improved_forward_fast(
            variables["params"], x, num_blocks=2, upsampling_depth=3,
            enc_kernel_size=21, num_sources=2, use_pallas=True, interpret=True,
        )
    )
    np.testing.assert_allclose(got_pl, want, rtol=1e-4, atol=1e-5)


def test_improved_forward_fast_tensor_parallel():
    """Channel-TP over the mesh 'model' axis: same numbers as unsharded,
    and the compiled program actually communicates (collectives present)."""
    from sudo_rm_rf_tpu.parallel import make_mesh

    hp = dict(num_blocks=2, upsampling_depth=3, enc_kernel_size=21,
              num_sources=2)
    model = models.SuDORMRFImproved(out_channels=32, in_channels=64,
                                    enc_num_basis=24, **hp)
    x = jnp.asarray(
        np.random.default_rng(5).standard_normal((4, 1, 661)).astype(np.float32)
    )
    variables = model.init(jax.random.key(1), x)
    want = np.asarray(
        improved_forward_fast(variables["params"], x, impl="fma", **hp)
    )

    mesh = make_mesh(n_model=4)  # (data=2, model=4) on the 8-dev CPU mesh
    fwd = jax.jit(lambda p, v: improved_forward_fast(
        p, v, impl="fma", tp_mesh=mesh, **hp))
    got = np.asarray(fwd(variables["params"], x))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    hlo = fwd.lower(variables["params"], x).compile().as_text()
    assert "all-reduce" in hlo or "reduce-scatter" in hlo, (
        "expected cross-chip collectives in the TP program"
    )

    import pytest

    with pytest.raises(ValueError, match="impl='fma'"):
        improved_forward_fast(variables["params"], x, impl="xla",
                              tp_mesh=mesh, **hp)


def test_fma_block_matches_reference():
    params = _rand_params(5, 64, 32, seed=9)
    from sudo_rm_rf_tpu.ops.pallas.uconv import uconv_block_fma

    x = jnp.asarray(
        np.random.default_rng(4).standard_normal((2, 32, 640)).astype(np.float32)
    )
    want = np.asarray(uconv_block_reference(x, params, 5))
    got = np.asarray(uconv_block_fma(x, params, 5))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_improved_forward_fast_fma_matches_model():
    hp = dict(out_channels=32, in_channels=64, num_blocks=2, upsampling_depth=3,
              enc_kernel_size=21, enc_num_basis=24, num_sources=2)
    model = models.SuDORMRFImproved(**hp)
    x = jnp.asarray(
        np.random.default_rng(5).standard_normal((2, 1, 661)).astype(np.float32)
    )
    variables = model.init(jax.random.key(0), x)
    want = np.asarray(model.apply(variables, x))
    got = np.asarray(
        improved_forward_fast(
            variables["params"], x, num_blocks=2, upsampling_depth=3,
            enc_kernel_size=21, num_sources=2, impl="fma",
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_groupcomm_forward_fast_matches_model():
    from sudo_rm_rf_tpu.models.fast_inference import groupcomm_forward_fast

    hp = dict(
        in_audio_channels=1, out_channels=32, in_channels=64, num_blocks=2,
        upsampling_depth=3, enc_kernel_size=21, enc_num_basis=24,
        num_sources=2, group_size=4,
    )
    model = models.GroupCommSuDORMRF(**hp)
    x = jnp.asarray(
        np.random.default_rng(6).standard_normal((2, 1, 661)).astype(np.float32)
    )
    variables = model.init(jax.random.key(0), x)
    want = np.asarray(model.apply(variables, x))
    got = np.asarray(
        groupcomm_forward_fast(
            variables["params"], x, num_blocks=2, upsampling_depth=3,
            enc_kernel_size=21, num_sources=2, group_size=4, impl="fma",
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_model_block_impl_fma_matches_xla():
    """block_impl='fma' shares the exact param tree and numerics of 'xla'."""
    hp = dict(out_channels=32, in_channels=64, num_blocks=2, upsampling_depth=3,
              enc_kernel_size=21, enc_num_basis=24, num_sources=2)
    m_xla = models.SuDORMRFImproved(**hp)
    m_fma = models.SuDORMRFImproved(**hp, block_impl="fma")
    x = jnp.asarray(
        np.random.default_rng(7).standard_normal((2, 1, 661)).astype(np.float32)
    )
    v_xla = m_xla.init(jax.random.key(0), x)
    v_fma = m_fma.init(jax.random.key(0), x)
    # identical param trees (paths and shapes)
    assert jax.tree_util.tree_structure(v_xla) == jax.tree_util.tree_structure(v_fma)
    want = np.asarray(m_xla.apply(v_xla, x))
    got = np.asarray(m_fma.apply(v_xla, x))  # same params through fma math
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # differentiable: grads flow and match closely
    def loss(variables, model):
        return jnp.sum(jnp.square(model.apply(variables, x)))

    g_xla = jax.grad(lambda v: loss(v, m_xla))(v_xla)
    g_fma = jax.grad(lambda v: loss(v, m_fma))(v_xla)
    for a, b in zip(jax.tree.leaves(g_xla), jax.tree.leaves(g_fma)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3)


def test_groupcomm_forward_fast_pallas_interpret():
    """The GC pallas wiring (folded-group fused blocks), in interpret mode."""
    from sudo_rm_rf_tpu.ops.pallas import uconv as U

    hp = dict(
        in_audio_channels=1, out_channels=32, in_channels=64, num_blocks=1,
        upsampling_depth=3, enc_kernel_size=21, enc_num_basis=24,
        num_sources=2, group_size=4,
    )
    model = models.GroupCommSuDORMRF(**hp)
    x = jnp.asarray(
        np.random.default_rng(8).standard_normal((2, 1, 661)).astype(np.float32)
    )
    variables = model.init(jax.random.key(0), x)
    want = np.asarray(model.apply(variables, x))

    # route the kernel through interpret mode for the CPU test
    orig = U.fused_uconv_block
    import functools

    def interp(x_, p_, depth=5, **kw):
        kw.pop("interpret", None)
        return orig(x_, p_, depth=depth, interpret=True)

    from sudo_rm_rf_tpu.models import fast_inference as fi

    old = fi.fused_uconv_block
    fi.fused_uconv_block = interp
    try:
        got = np.asarray(
            fi.groupcomm_forward_fast.__wrapped__(
                variables["params"], x, num_blocks=1, upsampling_depth=3,
                enc_kernel_size=21, num_sources=2, group_size=4, impl="pallas",
            )
        )
    finally:
        fi.fused_uconv_block = old
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_groupcomm_forward_fast_merged_and_bf16():
    """fma_merged parity at fp32, and the bf16 serving path's fidelity gate.

    The bf16 path (compute_dtype='bfloat16') keeps GlobLN statistics in
    fp32 and returns fp32; fidelity vs the fp32 path must stay above the
    serving gate (~36 dB measured on TPU, looser here for CPU rounding).
    """
    from sudo_rm_rf_tpu.models.fast_inference import groupcomm_forward_fast

    hp = dict(
        in_audio_channels=1, out_channels=32, in_channels=64, num_blocks=2,
        upsampling_depth=3, enc_kernel_size=21, enc_num_basis=24,
        num_sources=2, group_size=4,
    )
    model = models.GroupCommSuDORMRF(**hp)
    x = jnp.asarray(
        np.random.default_rng(8).standard_normal((2, 1, 661)).astype(np.float32)
    )
    variables = model.init(jax.random.key(0), x)
    want = np.asarray(model.apply(variables, x))
    kwargs = dict(num_blocks=2, upsampling_depth=3, enc_kernel_size=21,
                  num_sources=2, group_size=4)
    got = np.asarray(
        groupcomm_forward_fast(variables["params"], x, impl="fma_merged", **kwargs)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    bf = np.asarray(
        groupcomm_forward_fast(
            variables["params"], x, impl="fma_merged",
            compute_dtype="bfloat16", **kwargs,
        )
    )
    assert bf.dtype == np.float32
    fidelity_db = 10 * np.log10((want**2).sum() / ((want - bf) ** 2).sum())
    assert fidelity_db > 25.0, f"bf16 fidelity too low: {fidelity_db:.1f} dB"


def test_groupcomm_forward_fast_block_diagonal():
    """impl='fma_bd' (group-batched block-diagonal 1x1s) parity at fp32.

    The block-diagonal merged weight I_G (x) w inserts literal zeros into
    the contraction, so the path is exact up to reduction order vs
    fma_merged — same tolerance class as the other serving paths.
    """
    from sudo_rm_rf_tpu.models.fast_inference import groupcomm_forward_fast

    hp = dict(
        in_audio_channels=1, out_channels=32, in_channels=64, num_blocks=2,
        upsampling_depth=3, enc_kernel_size=21, enc_num_basis=24,
        num_sources=2, group_size=4,
    )
    model = models.GroupCommSuDORMRF(**hp)
    x = jnp.asarray(
        np.random.default_rng(11).standard_normal((3, 1, 661)).astype(np.float32)
    )
    variables = model.init(jax.random.key(0), x)
    want = np.asarray(model.apply(variables, x))
    got = np.asarray(
        groupcomm_forward_fast(
            variables["params"], x, impl="fma_bd", num_blocks=2,
            upsampling_depth=3, enc_kernel_size=21, num_sources=2,
            group_size=4,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
