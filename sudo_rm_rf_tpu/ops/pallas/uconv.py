"""Fused Pallas kernel for the SuDoRM-RF U-ConvBlock (inference hot path).

The block (`improved_sudormrf.py:162-220`) is HBM-bound under plain XLA:
each of proj/ladder/upsample/norm/res round-trips (C, T) feature maps to
HBM, and every GlobLN is two more full passes. This kernel runs ONE batch
element per grid step and keeps the whole multi-resolution pyramid in VMEM:

  x (Co, T) --MXU--> proj (Ci, T) -> PReLU+GlobLN folded into the ladder
  -> depth x depthwise k=5 convs (stride 1 then 2...) with GlobLN stats
     computed in-register -> reverse upsample-add -> final GlobLN+PReLU
  --MXU--> res (Co, T) + residual

GlobLN normalizations are never materialized: since depthwise conv is
linear, ``dwconv(a*x + b) = a*dwconv(x) + b*sum(w)`` per channel, so each
level's normalization constants are folded into the next conv's input
(two fused multiply-adds instead of a full extra pass).

VMEM budget (Ci=512, Co=256, T=3200, bf16 pyramid): ~11 MB — fits a v5e
core. Larger T should be tiled by the caller (the models pad T to
L//2 * 2**depth multiples, and inference chunks long audio anyway).

Forward-only: training takes the XLA path (this kernel has no custom VJP);
parity with the XLA implementation is enforced by tests.

STATUS (round 2): retired from the serving path, kept as a tested
experimental op. The `fma` XLA formulation captures ~95% of the fusion win
(0.162 vs 0.150 ms/block at the kernel's best shape) with no VMEM/compile
envelope and full differentiability, and the max-throughput serving config
(bs8 bf16 plain conv) bypasses per-block kernels entirely. Extending this
kernel past the (512 x 1600)-frame compile ceiling requires time tiling,
and GlobLN's full-(C, T) statistics then force a second pass per ladder
level — surrendering the VMEM-residency the kernel exists for. See
docs/ARCHITECTURE.md.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax

from sudo_rm_rf_tpu import ops


def uconv_block_reference(x, params, depth: int):
    """Pure-XLA reference with the exact kernel parameterization.

    params dict:
      proj_w (Ci, Co), proj_b (Ci,), proj_g/proj_beta (Ci,), proj_slope (),
      dw_w (depth, Ci, 5), dw_b (depth, Ci), dw_g/dw_beta (depth, Ci),
      final_g/final_beta (Ci,), final_slope (),
      res_w (Co, Ci), res_b (Co,)
    """
    ci = params["proj_w"].shape[0]
    y = jnp.einsum("co,bot->bct", params["proj_w"], x) + params["proj_b"][None, :, None]
    y = ops.glob_ln(y, params["proj_g"], params["proj_beta"])
    y = jnp.where(y >= 0, y, params["proj_slope"] * y)

    pyramid = []
    cur = y
    for k in range(depth):
        stride = 1 if k == 0 else 2
        cur = ops.conv1d(
            cur, params["dw_w"][k][:, None, :], params["dw_b"][k],
            stride=stride, padding=2, groups=ci,
        )
        cur = ops.glob_ln(cur, params["dw_g"][k], params["dw_beta"][k])
        pyramid.append(cur)

    acc = pyramid[-1]
    for k in range(depth - 2, -1, -1):
        acc = pyramid[k] + ops.upsample_nearest_2x(acc)

    acc = ops.glob_ln(acc, params["final_g"], params["final_beta"])
    acc = jnp.where(acc >= 0, acc, params["final_slope"] * acc)
    out = jnp.einsum("oc,bct->bot", params["res_w"], acc) + params["res_b"][None, :, None]
    return out + x


def uconv_block_fma(x, params, depth: int, constrain=None, matmul=None):
    """Pure-XLA block with the kernel's algebraic optimizations.

    Same math as uconv_block_reference but: depthwise convs as 5 shifted
    fused multiply-adds (XLA fuses these into single elementwise passes,
    avoiding its generic depthwise-conv lowering), and each GlobLN folded
    into the next conv's input as per-channel (a, b) constants, eliminating
    one full read/write pass per ladder level. Differentiable (pure jnp).

    constrain: optional fn (B, C, T) -> (B, C, T) inserting a sharding
    constraint on the channel dim — tensor parallelism over a mesh 'model'
    axis (GSPMD then shards the ladder per-channel and inserts the GlobLN
    psum and the proj/res matmul collectives automatically).

    matmul: optional fn (w, v) -> out with w (O, C) and v (B, C, T)
    computing out[b,o,t] = sum_c w[o,c] v[b,c,t] — the hook the int8
    serving path (models/quantized.py) uses to route the proj/res matmuls
    through quantized MXU dots. When set, ``params['proj_w']`` /
    ``params['res_w']`` may be whatever the hook understands (e.g. a
    {'q': int8, 's': scales} dict) — this function only passes them
    through. The proj einsum transposes w internally by default, so the
    default hook handles both orientations via (O, C) weights.
    """
    if constrain is None:
        constrain = lambda v: v
    if matmul is None:
        matmul = lambda w, v: jnp.einsum("oc,bct->bot", w, v)
    b, co, t = x.shape
    proj_w = params["proj_w"]
    # proj_w rows are the expanded Ci dim in both forms ((Ci, Co) array or
    # int8 {'q': (O=Ci, C=Co)} dict)
    ci = proj_w["q"].shape[0] if isinstance(proj_w, dict) else proj_w.shape[0]
    # proj_w is stored (Ci, Co); the hook contract is (O, C) = (Ci, Co) here
    y = matmul(proj_w, x) + params["proj_b"][None, :, None]
    y = constrain(y)
    y = ops.glob_ln(y, params["proj_g"], params["proj_beta"])
    y = jnp.where(y >= 0, y, params["proj_slope"] * y)

    def stats(o, n):
        # one-pass sum/sumsq (fuses into the producing conv; the centered
        # form would re-read the tensor), fp32 accumulation under bf16
        o32 = o.astype(jnp.float32)
        s1 = jnp.sum(o32, axis=(1, 2), keepdims=True)
        s2 = jnp.sum(o32 * o32, axis=(1, 2), keepdims=True)
        mean = s1 / n
        var = jnp.maximum(s2 / n - mean * mean, 0.0)
        return mean, lax.rsqrt(var + 1e-8)

    def conv_s1(v, w):  # v (B, C, T); w (C, 5)
        tt = v.shape[-1]
        vp = jnp.pad(v, ((0, 0), (0, 0), (2, 2)))
        return sum(
            w[None, :, j : j + 1] * lax.slice_in_dim(vp, j, j + tt, axis=2)
            for j in range(5)
        )

    def conv_s2(v, w):
        th = v.shape[-1] // 2
        vr = v.reshape(b, ci, th, 2)
        ve, vo = vr[..., 0], vr[..., 1]
        ve_p = jnp.pad(ve, ((0, 0), (0, 0), (1, 1)))
        vo_p = jnp.pad(vo, ((0, 0), (0, 0), (1, 0)))
        wc = w[None, :, :, None]
        return (
            wc[:, :, 0] * ve_p[:, :, 0:th]
            + wc[:, :, 1] * vo_p[:, :, 0:th]
            + wc[:, :, 2] * ve_p[:, :, 1 : th + 1]
            + wc[:, :, 3] * vo_p[:, :, 1:]
            + wc[:, :, 4] * ve_p[:, :, 2 : th + 2]
        )

    a = jnp.ones((1, ci, 1), y.dtype)
    bb = jnp.zeros((1, ci, 1), y.dtype)
    cur, raw, folds = y, [], []
    for k in range(depth):
        w_k = params["dw_w"][k]
        x_in = a * cur + bb
        o = conv_s1(x_in, w_k) if k == 0 else conv_s2(x_in, w_k)
        o = constrain(o + params["dw_b"][k][None, :, None])
        mean, inv = stats(o, ci * o.shape[-1])
        g = params["dw_g"][k].astype(jnp.float32)[None, :, None]
        be = params["dw_beta"][k].astype(jnp.float32)[None, :, None]
        a = (g * inv).astype(o.dtype)
        bb = (be - g * inv * mean).astype(o.dtype)
        raw.append(o)
        folds.append((a, bb))
        cur = o

    a, bb = folds[-1]
    acc = a * raw[-1] + bb
    for k in range(depth - 2, -1, -1):
        a, bb = folds[k]
        acc = (a * raw[k] + bb) + ops.upsample_nearest_2x(acc)

    acc = ops.glob_ln(acc, params["final_g"], params["final_beta"])
    acc = jnp.where(acc >= 0, acc, params["final_slope"] * acc)
    out = matmul(params["res_w"], acc) + params["res_b"][None, :, None]
    return constrain(out + x)


# ---------------------------------------------------------------------------
# In-kernel helpers. LAYOUT: time-major (T, C) — time on sublanes, channels
# on lanes. The axon Mosaic backend rejects minor-dim (lane) reshapes and
# strided slices, but handles leading-dim splits/merges; time-major turns
# de/interleaving into exactly those (see .claude/skills/verify/SKILL.md).
# ---------------------------------------------------------------------------


def _dw_conv_s1(x, w):
    """Depthwise k=5 stride-1 'same' conv on (T, Ci); w: (5, Ci)."""
    t = x.shape[0]
    xp = jnp.pad(x, ((2, 2), (0, 0)))
    out = None
    for j in range(5):  # static slices only: pallas TPU lacks dynamic_slice
        term = w[j : j + 1, :] * xp[j : j + t, :]
        out = term if out is None else out + term
    return out


def _dw_conv_s2(x, w):
    """Depthwise k=5 stride-2 conv on (T, Ci) -> (T//2, Ci); w: (5, Ci).

    y[t] = sum_j w[j] x[2t + j - 2]. Phase-decompose (leading-dim reshape):
      y = w0*xe[t-1] + w1*xo[t-1] + w2*xe[t] + w3*xo[t] + w4*xe[t+1]
    """
    t, ci = x.shape
    th = t // 2
    xr = x.reshape(th, 2, ci)
    xe, xo = xr[:, 0, :], xr[:, 1, :]
    xe_p = jnp.pad(xe, ((1, 1), (0, 0)))  # xe[t-1], xe[t], xe[t+1]
    xo_p = jnp.pad(xo, ((1, 0), (0, 0)))  # xo[t-1], xo[t]
    return (
        w[0:1, :] * xe_p[0:th, :]
        + w[1:2, :] * xo_p[0:th, :]
        + w[2:3, :] * xe_p[1 : th + 1, :]
        + w[3:4, :] * xo_p[1:, :]
        + w[4:5, :] * xe_p[2 : th + 2, :]
    )


def _upsample2(x):
    """(T, Ci) -> (2T, Ci) nearest (leading-dim broadcast+merge)."""
    t, ci = x.shape
    return jnp.broadcast_to(x[:, None, :], (t, 2, ci)).reshape(2 * t, ci)


def _make_kernel(depth: int, ci: int, co: int, t: int, eps: float = 1e-8):
    lens = [t // (2**max(k, 0)) for k in range(depth)]  # level lengths

    def kernel(
        x_ref, proj_w_ref, proj_b_ref, proj_g_ref, proj_beta_ref,
        proj_slope_ref, dw_w_ref, dw_b_ref, dw_g_ref, dw_beta_ref,
        final_g_ref, final_beta_ref, final_slope_ref, res_w_ref, res_b_ref,
        out_ref, *level_refs,
    ):
        x = x_ref[0]  # (T, Co) time-major

        # ---- proj 1x1 on MXU + GlobLN + PReLU ---------------------------
        # proj_w_ref holds W^T: (Co, Ci)
        y = (
            jnp.dot(x, proj_w_ref[:], preferred_element_type=jnp.float32)
            + proj_b_ref[:]
        )  # (T, Ci)
        mean = jnp.sum(y) / (ci * t)
        var = jnp.sum((y - mean) ** 2) / (ci * t)
        y = proj_g_ref[:] * ((y - mean) * lax.rsqrt(var + eps)) + proj_beta_ref[:]
        slope = proj_slope_ref[0, 0]
        y = jnp.where(y >= 0, y, slope * y)

        # ---- ladder: conv -> (stats only); norm folded into next conv ---
        # After level k's conv, we know raw o_k plus scalar stats; instead of
        # rewriting o_k normalized, carry per-channel row vectors (a, b) with
        # norm(o) = a*o + b and fold into conv k+1's input transform.
        a = jnp.ones((1, ci), jnp.float32)
        b = jnp.zeros((1, ci), jnp.float32)
        cur = y
        folds = []  # per-level (a, b) with norm(o_k) = a*o_k + b
        for k in range(depth):
            w_k = dw_w_ref[k]  # (5, Ci)
            x_in = a * cur + b  # folded normalization of previous level
            if k == 0:
                o = _dw_conv_s1(x_in, w_k)
            else:
                o = _dw_conv_s2(x_in, w_k)
            o = o + dw_b_ref[k]  # (1, Ci) broadcast
            n_k = ci * lens[k]
            mean = jnp.sum(o) / n_k
            var = jnp.sum((o - mean) ** 2) / n_k
            inv = lax.rsqrt(var + eps)
            g = dw_g_ref[k]
            be = dw_beta_ref[k]
            a = g * inv
            b = be - g * inv * mean
            folds.append((a, b))
            # store the RAW conv output (normalization folded on read)
            level_refs[k][:] = o.astype(level_refs[k].dtype)
            cur = o

        # ---- reverse upsample-add ---------------------------------------
        a, b = folds[depth - 1]
        acc = a * level_refs[depth - 1][:].astype(jnp.float32) + b
        for k in range(depth - 2, -1, -1):
            a, b = folds[k]
            normed = a * level_refs[k][:].astype(jnp.float32) + b
            acc = normed + _upsample2(acc)

        # ---- final GlobLN + PReLU + res 1x1 on MXU + residual ------------
        mean = jnp.sum(acc) / (ci * t)
        var = jnp.sum((acc - mean) ** 2) / (ci * t)
        acc = final_g_ref[:] * ((acc - mean) * lax.rsqrt(var + eps)) + final_beta_ref[:]
        fslope = final_slope_ref[0, 0]
        acc = jnp.where(acc >= 0, acc, fslope * acc)
        # res_w_ref holds W^T: (Ci, Co)
        out = (
            jnp.dot(acc, res_w_ref[:], preferred_element_type=jnp.float32)
            + res_b_ref[:]
        )
        out_ref[0] = out + x

    return kernel, lens


@functools.partial(jax.jit, static_argnames=("depth", "pyramid_dtype", "interpret"))
def fused_uconv_block(
    x: jax.Array,
    params: dict,
    depth: int = 5,
    pyramid_dtype=jnp.float32,
    interpret: bool = False,
) -> jax.Array:
    """Run the fused U-ConvBlock. x: (B, Co, T); returns (B, Co, T).

    T must be divisible by 2**(depth-1) (guaranteed by the model's front-end
    padding, `improved_sudormrf.py:244`).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, co, t = x.shape
    ci = params["proj_w"].shape[0]
    assert t % (2 ** (depth - 1)) == 0, (t, depth)
    # Runtime guard for the documented VMEM/compile envelope (module
    # docstring: ~(Ci=512, T=1600) is the measured ceiling; past it the
    # whole-pyramid-in-VMEM design cannot compile). Fail loudly with the
    # supported alternative instead of a cryptic Mosaic error.
    if ci * t > 512 * 1600 and not interpret:
        raise ValueError(
            f"fused_uconv_block: Ci*T = {ci}*{t} exceeds the kernel's "
            f"VMEM-residency envelope (Ci*T <= {512 * 1600}). Use the "
            f"'fma' XLA block (models.fast_inference / block_impl='fma'), "
            f"which captures ~95% of the fusion win at any shape, or chunk "
            f"T before calling."
        )

    kernel, lens = _make_kernel(depth, ci, co, t)

    row = lambda v: v.reshape(1, -1).astype(jnp.float32)  # (C,) -> (1, C)
    smem_scalar = lambda v: v.reshape(1, 1).astype(jnp.float32)
    inputs = [
        jnp.swapaxes(x, 1, 2).astype(jnp.float32),  # (B, T, Co) time-major
        params["proj_w"].astype(jnp.float32).T,  # (Co, Ci)
        row(params["proj_b"]),
        row(params["proj_g"]),
        row(params["proj_beta"]),
        smem_scalar(params["proj_slope"]),
        jnp.swapaxes(params["dw_w"].astype(jnp.float32), 1, 2),  # (D, 5, Ci)
        params["dw_b"].astype(jnp.float32)[:, None, :],  # (D, 1, Ci)
        params["dw_g"].astype(jnp.float32)[:, None, :],
        params["dw_beta"].astype(jnp.float32)[:, None, :],
        row(params["final_g"]),
        row(params["final_beta"]),
        smem_scalar(params["final_slope"]),
        params["res_w"].astype(jnp.float32).T,  # (Ci, Co)
        row(params["res_b"]),
    ]

    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    batch_spec = pl.BlockSpec((1, t, co), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    in_specs = [batch_spec] + [vmem()] * 4 + [
        pl.BlockSpec(memory_space=pltpu.SMEM)
    ] + [vmem()] * 4 + [vmem()] * 2 + [
        pl.BlockSpec(memory_space=pltpu.SMEM)
    ] + [vmem()] * 2

    scratch = [pltpu.VMEM((lens[k], ci), pyramid_dtype) for k in range(depth)]

    out = pl.pallas_call(
        kernel,
        grid=(b,),
        out_shape=jax.ShapeDtypeStruct((b, t, co), jnp.float32),
        in_specs=in_specs,
        out_specs=batch_spec,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*inputs)
    return jnp.swapaxes(out, 1, 2)  # back to (B, Co, T)


def params_from_flax(block_params: dict) -> dict:
    """Map a flax UConvBlock param subtree (improved variant naming) to the
    kernel's parameterization."""
    depth = len([k for k in block_params if k.startswith("spp_dw_")])
    dw_w = jnp.stack(
        [block_params[f"spp_dw_{k}"]["conv"]["weight"][:, 0, :] for k in range(depth)]
    )
    dw_b = jnp.stack([block_params[f"spp_dw_{k}"]["conv"]["bias"] for k in range(depth)])
    dw_g = jnp.stack([block_params[f"spp_dw_{k}"]["norm"]["gamma"] for k in range(depth)])
    dw_beta = jnp.stack([block_params[f"spp_dw_{k}"]["norm"]["beta"] for k in range(depth)])
    return {
        "proj_w": block_params["proj_1x1"]["conv"]["weight"][:, :, 0],
        "proj_b": block_params["proj_1x1"]["conv"]["bias"],
        "proj_g": block_params["proj_1x1"]["norm"]["gamma"],
        "proj_beta": block_params["proj_1x1"]["norm"]["beta"],
        "proj_slope": block_params["proj_1x1"]["act"]["weight"][0],
        "dw_w": dw_w,
        "dw_b": dw_b,
        "dw_g": dw_g,
        "dw_beta": dw_beta,
        "final_g": block_params["final_norm"]["norm"]["gamma"],
        "final_beta": block_params["final_norm"]["norm"]["beta"],
        "final_slope": block_params["final_norm"]["act"]["weight"][0],
        "res_w": block_params["res_conv"]["weight"][:, :, 0],
        "res_b": block_params["res_conv"]["bias"],
    }
