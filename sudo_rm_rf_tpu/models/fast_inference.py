"""Fast serving forward for the Improved SuDoRM-RF, over a standard flax
param tree.

Same math as `SuDORMRFImproved.__call__`, with:
  * every 1x1 conv expressed as an explicit MXU einsum;
  * each U-ConvBlock executed by the fused Pallas kernel
    (ops/pallas/uconv.py) keeping the pyramid in VMEM — or the XLA
    reference with ``use_pallas=False``;
  * optional bf16 compute (params/activations) with fp32 normalization
    statistics.

Forward-only (serving / eval / benchmark); training differentiates the flax
module. Numerical parity with `SuDORMRFImproved.apply` is covered by tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from sudo_rm_rf_tpu import ops
from sudo_rm_rf_tpu.ops.pallas.uconv import (
    fused_uconv_block,
    params_from_flax,
    uconv_block_fma,
    uconv_block_reference,
)


@functools.partial(
    jax.jit,
    static_argnames=("num_blocks", "upsampling_depth", "enc_kernel_size",
                     "num_sources", "use_pallas", "interpret", "impl",
                     "compute_dtype", "tp_mesh"),
)
def improved_forward_fast(
    params: dict,
    input_wav: jax.Array,
    num_blocks: int = 16,
    upsampling_depth: int = 5,
    enc_kernel_size: int = 21,
    num_sources: int = 2,
    use_pallas: bool = False,
    interpret: bool = False,
    impl: str = None,
    compute_dtype: str = None,
    tp_mesh=None,
) -> jax.Array:
    """params: the flax 'params' tree of SuDORMRFImproved. x: (B, 1|-, T).

    impl: 'fma' (default — fastest general path), 'pallas' (fused kernel;
    subject to the backend's VMEM/compile envelope, see docs/ARCHITECTURE),
    or 'xla' (plain convs). use_pallas=True is legacy shorthand for
    impl='pallas'.

    compute_dtype: e.g. 'bfloat16' for half-bandwidth serving — norm
    statistics stay fp32, output is cast back to fp32 (fidelity gated in
    tests and reported by bench.py).

    tp_mesh: optional jax.sharding.Mesh with a 'model' axis — tensor
    parallelism: block activations carry a channel-dim sharding constraint
    and GSPMD shards the per-channel ladder across chips, inserting GlobLN
    psums and proj/res matmul collectives (requires impl='fma'). Compose
    with a data axis for DP x TP serving of one jitted call.
    """
    if input_wav.ndim == 2:
        input_wav = input_wav[:, None, :]
    in_len = input_wav.shape[-1]
    multiple = (enc_kernel_size // 2) * 2**upsampling_depth
    x = ops.pad_to_multiple(input_wav, multiple)

    if compute_dtype is not None:
        cdt = jnp.dtype(compute_dtype)
        params = jax.tree.map(lambda a: a.astype(cdt), params)
        x = x.astype(cdt)

    enc_num_basis = params["encoder"]["weight"].shape[0]

    x = ops.conv1d(
        x, params["encoder"]["weight"], stride=enc_kernel_size // 2,
        padding=enc_kernel_size // 2,
    )
    s = x
    x = ops.glob_ln(x, params["ln"]["gamma"], params["ln"]["beta"])
    x = (
        jnp.einsum("on,bnt->bot", params["bottleneck"]["weight"][:, :, 0], x)
        + params["bottleneck"]["bias"][None, :, None]
    )

    if impl is None:
        impl = "pallas" if use_pallas else "fma"
    constrain = None
    if tp_mesh is not None:
        if impl != "fma":
            raise ValueError("tp_mesh requires impl='fma'")
        from jax.sharding import NamedSharding, PartitionSpec as P

        from sudo_rm_rf_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

        _ch_sh = NamedSharding(tp_mesh, P(DATA_AXIS, MODEL_AXIS, None))

        def constrain(v):
            return jax.lax.with_sharding_constraint(v, _ch_sh)

        x = constrain(x)
    for i in range(num_blocks):
        kp = params_from_flax(params[f"sm_{i}"])
        if impl == "pallas":
            x = fused_uconv_block(x, kp, depth=upsampling_depth,
                                  interpret=interpret)
        elif impl == "fma":
            x = uconv_block_fma(x, kp, upsampling_depth, constrain=constrain)
        else:
            x = uconv_block_reference(x, kp, upsampling_depth)

    slope = params["mask_net_0"]["weight"][0]
    x = jnp.where(x >= 0, x, slope * x)
    x = (
        jnp.einsum("oc,bct->bot", params["mask_net_1"]["weight"][:, :, 0], x)
        + params["mask_net_1"]["bias"][None, :, None]
    )
    b = x.shape[0]
    x = x.reshape(b, num_sources, enc_num_basis, -1)
    x = jax.nn.relu(x)
    x = x * s[:, None, :, :]

    est = ops.conv_transpose1d(
        x.reshape(b, num_sources * enc_num_basis, -1),
        params["decoder"]["weight"],
        stride=enc_kernel_size // 2,
        padding=enc_kernel_size // 2,
        output_padding=(enc_kernel_size // 2) - 1,
    )
    return ops.unpad_to_length(est, in_len).astype(jnp.float32)


def _einsum_mm(w, v):
    """Default channel matmul: out[b,o,t] = sum_c w[o,c] v[b,c,t]."""
    return jnp.einsum("oc,bct->bot", w, v)


def _make_bd_mm(b: int, g: int):
    """Group-batched block-diagonal channel matmul hook (round-2/3 VERDICT
    "group-batched kernel": batch the G groups' tiny (C/G -> O/G) shared
    projections into ONE MXU-shaped dot).

    The GC per-group 1x1 convs contract over C/G = 16..48 channels — a
    (16..48)-deep contraction uses ~1/8 of the 128-deep MXU systolic array
    and leaves the group axis as a batch of micro-matmuls. Expanding the
    shared weight to its block-diagonal merged form W_bd = I_G (x) w
    ((G*O, G*C)) turns all G projections into a single dense matmul with a
    G-times-deeper contraction dim: 16x the FLOPs on paper, but the GC
    forward is bandwidth-bound at these shapes (BENCHMARKS.md) and the
    activation traffic is unchanged — the MXU eats the extra zeros for
    free. Numerically exact up to reduction order: the inserted weights
    are literal 0.0 and contribute nothing to the dot products.

    Returns a hook with the `matmul(w (O, C), v (B*G, C, T))` signature of
    `gc_uconv_block_fma_merged` / `_tac_fast`.
    """

    def bd_mm(w, v):
        o, c = w.shape
        t = v.shape[-1]
        w_bd = jnp.einsum(
            "gh,oc->gohc", jnp.eye(g, dtype=w.dtype), w
        ).reshape(g * o, g * c)
        out = jnp.einsum("oc,bct->bot", w_bd, v.reshape(b, g * c, t))
        return out.reshape(b * g, o, t)

    return bd_mm


def gc_uconv_block_fma_merged(x, kp, depth: int, g: int, matmul=None):
    """GC U-ConvBlock with groups MERGED into the channel dim.

    The group-folded (B*G, C/G, T) layout leaves 3/4 of the VPU lanes idle
    (C/G = 32 of 128); here every elementwise/depthwise op runs on the full
    (B, C, T) merged layout while GlobLN statistics stay per-(batch, group)
    via reshaped reductions, and the shared 1x1 projections are einsums over
    the group axis. Numerics identical to the folded form (tested).

    x: (B, C_out, T) with C_out = g * out_pg; kp: the shared per-group
    kernel params (params_from_flax of the UBlock subtree).

    matmul: optional hook replacing the shared-across-groups 1x1 channel
    matmuls (proj/res), called as matmul(w (O, C), v (B*G, C, T)) — the
    int8 serving path (models/quantized.py) injects its MXU int8 dot here.
    """
    mm = matmul if matmul is not None else _einsum_mm
    b, c_out, t = x.shape
    out_pg = c_out // g
    in_pg = kp["proj_w"].shape[0]
    c_in = g * in_pg

    def stats_ab(o, gamma, beta, n):
        """per-(b, group) GlobLN folded to merged (B, C, 1) scale/shift.

        Statistics accumulate in fp32 even under bf16 compute; the folded
        scale/shift is cast back to the compute dtype so downstream traffic
        stays narrow.
        """
        og = o.reshape(b, g, in_pg, -1).astype(jnp.float32)
        # one-pass stats: sum and sum-of-squares fuse into a single read of o
        # (mean-then-centered-var would re-read the full tensor)
        nelem = og.shape[2] * og.shape[3]
        s1 = jnp.sum(og, axis=(2, 3), keepdims=True)
        s2 = jnp.sum(og * og, axis=(2, 3), keepdims=True)
        mean = s1 / nelem
        var = jnp.maximum(s2 / nelem - mean * mean, 0.0)
        inv = lax.rsqrt(var + 1e-8)  # (B, g, 1, 1)
        gm = gamma.astype(jnp.float32)[None, None, :, None]
        bt = beta.astype(jnp.float32)[None, None, :, None]
        a = (gm * inv).reshape(b, g, in_pg, 1).reshape(b, c_in, 1)
        bb = (bt - gm * inv * mean).reshape(b, c_in, 1)
        return a.astype(o.dtype), bb.astype(o.dtype)

    # proj 1x1 (shared across groups) + per-group GlobLN + PReLU
    y = mm(kp["proj_w"], x.reshape(b * g, out_pg, t)).reshape(b, g, in_pg, t)
    y = y + kp["proj_b"][None, None, :, None]
    y32 = y.astype(jnp.float32)
    nelem = y32.shape[2] * y32.shape[3]
    s1 = jnp.sum(y32, axis=(2, 3), keepdims=True)
    s2 = jnp.sum(y32 * y32, axis=(2, 3), keepdims=True)
    mean = s1 / nelem
    var = jnp.maximum(s2 / nelem - mean * mean, 0.0)
    inv = lax.rsqrt(var + 1e-8)
    gm = kp["proj_g"].astype(jnp.float32)[None, None, :, None]
    sc = (gm * inv).astype(y.dtype)
    sh = (
        kp["proj_beta"].astype(jnp.float32)[None, None, :, None] - gm * inv * mean
    ).astype(y.dtype)
    y = sc * y + sh
    y = jnp.where(y >= 0, y, kp["proj_slope"] * y).reshape(b, c_in, t)

    # depthwise ladder on merged channels: weights tiled across groups
    dw_w = jnp.tile(kp["dw_w"], (1, g, 1))  # (depth, C_in, 5)
    dw_b = jnp.tile(kp["dw_b"], (1, g))

    def conv_s1(v, w):
        vp = jnp.pad(v, ((0, 0), (0, 0), (2, 2)))
        tt = v.shape[-1]
        return sum(
            w[None, :, j : j + 1] * lax.slice_in_dim(vp, j, j + tt, axis=2)
            for j in range(5)
        )

    def conv_s2(v, w):
        th = v.shape[-1] // 2
        vr = v.reshape(b, c_in, th, 2)
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

    a = jnp.ones((b, c_in, 1), y.dtype)
    bb = jnp.zeros((b, c_in, 1), y.dtype)
    cur, raw, folds = y, [], []
    for k in range(depth):
        x_in = a * cur + bb
        o = conv_s1(x_in, dw_w[k]) if k == 0 else conv_s2(x_in, dw_w[k])
        o = o + dw_b[k][None, :, None]
        a, bb = stats_ab(o, kp["dw_g"][k], kp["dw_beta"][k], o.shape[-1])
        raw.append(o)
        folds.append((a, bb))
        cur = o

    a, bb = folds[-1]
    acc = a * raw[-1] + bb
    for k in range(depth - 2, -1, -1):
        a, bb = folds[k]
        acc = (a * raw[k] + bb) + ops.upsample_nearest_2x(acc)

    # final per-group GlobLN + PReLU + shared res 1x1 + residual
    accg = acc.reshape(b, g, in_pg, t)
    a32 = accg.astype(jnp.float32)
    nelem = a32.shape[2] * a32.shape[3]
    s1 = jnp.sum(a32, axis=(2, 3), keepdims=True)
    s2 = jnp.sum(a32 * a32, axis=(2, 3), keepdims=True)
    mean = s1 / nelem
    var = jnp.maximum(s2 / nelem - mean * mean, 0.0)
    inv = lax.rsqrt(var + 1e-8)
    gm = kp["final_g"].astype(jnp.float32)[None, None, :, None]
    sc = (gm * inv).astype(accg.dtype)
    sh = (
        kp["final_beta"].astype(jnp.float32)[None, None, :, None] - gm * inv * mean
    ).astype(accg.dtype)
    accg = sc * accg + sh
    accg = jnp.where(accg >= 0, accg, kp["final_slope"] * accg)
    out = mm(kp["res_w"], accg.reshape(b * g, in_pg, t)).reshape(b, g, out_pg, t)
    out = out + kp["res_b"][None, None, :, None]
    return out.reshape(b, c_out, t) + x


def _tac_fast(p, x, matmuls=None):
    """TAC over (B, G, N, T) with the flax TAC's param subtree
    (groupcomm_sudormrf.py TAC), as explicit einsums.

    Bandwidth-shaped rewrite of the reference math (same values):
    instead of broadcasting the group-mean to (B, G, H, T) and
    concatenating to (B, G, 2H, T) before the output linear — ~230 MB of
    HBM round-trips per block at bs4/4s — split W_out = [W_oy | W_om]
    along its input dim and compute W_oy·y + (W_om·m)[:, None]: the mean
    branch stays at its natural (B, H, T) size until the final add.

    matmuls: optional (mm_in, mm_mean, mm_out) channel-matmul hooks, each
    mm(w (O, C), v (B', C, T)) — the int8 serving path injects here.
    """
    b, g, n, t = x.shape
    mm_in, mm_mean, mm_out = matmuls if matmuls is not None else (
        _einsum_mm, _einsum_mm, _einsum_mm
    )

    def prelu(sub, v):
        return jnp.where(v >= 0, v, sub["weight"][0] * v)

    y = mm_in(p["TAC_input_0"]["weight"], x.reshape(b * g, n, t))
    h = y.shape[1]
    y = y.reshape(b, g, h, t) + p["TAC_input_0"]["bias"][None, None, :, None]
    y = prelu(p["TAC_input_1"], y)
    mean = jnp.mean(y, axis=1)
    mean = mm_mean(p["TAC_mean_0"]["weight"], mean) + p["TAC_mean_0"][
        "bias"
    ][None, :, None]
    mean = prelu(p["TAC_mean_1"], mean)
    w_out = p["TAC_output_0"]["weight"]  # (N, 2H)
    out = (
        mm_out(w_out[:, :h], y.reshape(b * g, h, t)).reshape(b, g, n, t)
        + _einsum_mm(w_out[:, h:], mean)[:, None]
        + p["TAC_output_0"]["bias"][None, None, :, None]
    )
    out = prelu(p["TAC_output_1"], out)
    out = ops.glob_ln(
        out.reshape(b * g, n, t), p["TAC_norm"]["gamma"], p["TAC_norm"]["beta"]
    )
    return x + out.reshape(b, g, n, t)


@functools.partial(
    jax.jit,
    static_argnames=("num_blocks", "upsampling_depth", "enc_kernel_size",
                     "num_sources", "group_size", "in_audio_channels", "impl",
                     "compute_dtype"),
)
def groupcomm_forward_fast(
    params: dict,
    input_wav: jax.Array,
    num_blocks: int = 16,
    upsampling_depth: int = 5,
    enc_kernel_size: int = 21,
    num_sources: int = 2,
    group_size: int = 16,
    in_audio_channels: int = 1,
    impl: str = "fma_merged",
    compute_dtype: str = None,
) -> jax.Array:
    """Fast serving forward for GroupCommSuDORMRF over its flax param tree.

    impl: 'fma_merged' (default; groups merged into full VPU lanes),
    'fma_bd' (merged + block-diagonal group-batched 1x1s: every shared
    per-group projection — TAC in/out, UBlock proj/res — runs as one
    full-contraction MXU dot via `_make_bd_mm`), 'fma' (group-folded),
    'pallas', or anything else -> XLA reference. Measured bs4 fp32:
    merged 10.26 ms vs flax apply 10.48 ms vs folded fma 15.4 ms vs
    pallas 32 ms (docs/ROADMAP.md item 3).

    The group fold (B, C, T) -> (B*G, C/G, T) runs each shared small
    U-ConvBlock through the FMA formulation; TAC linears are einsums.
    Parity with GroupCommSuDORMRF.apply is tested.
    """
    if input_wav.ndim == 2:
        input_wav = input_wav[:, None, :]
    in_len = input_wav.shape[-1]
    multiple = (enc_kernel_size // 2) * 2**upsampling_depth
    x = ops.pad_to_multiple(input_wav, multiple)

    if compute_dtype is not None:
        cdt = jnp.dtype(compute_dtype)
        params = jax.tree.map(lambda a: a.astype(cdt), params)
        x = x.astype(cdt)

    enc_num_basis = params["encoder"]["weight"].shape[0]
    out_channels = params["bottleneck"]["weight"].shape[0]

    x = ops.conv1d(
        x, params["encoder"]["weight"], stride=enc_kernel_size // 2,
        padding=enc_kernel_size // 2,
    )
    s = x
    x = ops.glob_ln(x, params["ln"]["gamma"], params["ln"]["beta"])
    x = ops.conv1d(
        x, params["bottleneck"]["weight"], params["bottleneck"]["bias"]
    )

    b = x.shape[0]
    g = group_size
    bd_mm = _make_bd_mm(b, g) if impl == "fma_bd" else None
    tac_mms = (bd_mm, _einsum_mm, bd_mm) if bd_mm is not None else None
    for i in range(num_blocks):
        bp = params[f"sm_{i}"]
        t = x.shape[-1]
        y = _tac_fast(
            bp["TAC"], x.reshape(b, g, out_channels // g, t), matmuls=tac_mms
        )
        y = y.reshape(b * g, out_channels // g, t)
        kp = params_from_flax(bp["UBlock"])
        if impl in ("fma_merged", "fma_bd"):
            x = gc_uconv_block_fma_merged(
                y.reshape(b, out_channels, t), kp, upsampling_depth, g,
                matmul=bd_mm,
            )
            continue
        if impl == "pallas":
            # the folded (B*G) batch keeps per-program VMEM tiny (C/G chans)
            y = fused_uconv_block(y, kp, depth=upsampling_depth)
        elif impl == "fma":
            y = uconv_block_fma(y, kp, upsampling_depth)
        else:
            y = uconv_block_reference(y, kp, upsampling_depth)
        x = y.reshape(b, out_channels, t)

    slope = params["mask_net_0"]["weight"][0]
    x = jnp.where(x >= 0, x, slope * x)
    x = ops.conv1d(
        x, params["mask_net_1"]["weight"], params["mask_net_1"]["bias"]
    )
    x = x.reshape(b, num_sources * in_audio_channels, enc_num_basis, -1)
    x = jax.nn.relu(x)
    x = x * s[:, None, :, :]

    est = ops.conv_transpose1d(
        x.reshape(b, -1, x.shape[-1]),
        params["decoder"]["weight"],
        stride=enc_kernel_size // 2,
        padding=enc_kernel_size // 2,
        output_padding=(enc_kernel_size // 2) - 1,
    )
    return ops.unpad_to_length(est, in_len).astype(jnp.float32)
