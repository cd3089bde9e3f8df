"""Sequence parallelism: one long recording separated in a single pass,
with the TIME axis sharded over the device mesh.

The reference has no long-input story at all — its eval runs whole
utterances at batch size 1 on one GPU (`simple_whamr_evaluation.py:138-151`)
and OOMs/recompiles as lengths grow. `inference/overlap_add.py` solves that
with chunked COLA blending; this module solves it *exactly*: the waveform is
split into contiguous per-device time shards and the network is evaluated
under `jax.shard_map`, so the result equals the unsharded forward pass to
float tolerance (no windowing, no chunk-boundary PIT realignment).

How each op family is distributed (SuDoRM-RF improved, fma formulation):

* **Convs / ladder resampling** — halo recompute: every shard carries a halo
  of `halo_frames` from each neighbor (one `lax.ppermute` edge exchange of
  raw samples; ~0.7 s of audio vs minutes-long shards), computes the full
  network on `owned + 2*halo`, and crops back to `owned`. The halo is sized
  to the network's receptive-field radius (`default_halo_frames`), so every
  owned output is exact.
* **GlobLN** — statistics are global over time. Each shard reduces
  sum/sum-of-squares over its OWNED frames only and `lax.psum`s them over
  the ``seq`` axis: exact global statistics, 2 scalars-per-batch of ICI
  traffic per norm.
* **Boundary padding semantics** — the unsharded model zero-pads *frames*
  at every ladder conv (`improved_sudormrf.py:177-194` pad=2 'same' convs).
  Out-of-range halo frames are therefore masked to zero before every
  spatial conv (an iota mask from the shard's global offset), which makes
  the two edge shards reproduce the global zero-padding exactly — including
  the first/last receptive field of the output, where naive halo recompute
  diverges (biases and norm shifts make "frames computed from zero samples"
  differ from "zero pad").

`lax.ppermute` leaves non-receiving edges zero, which is exactly the global
zero-pad of the waveform — no special-casing of the first/last shard.

Alignment: per-shard owned samples are a multiple of
``(enc_kernel_size//2) * 2**depth`` so frame counts stay divisible through
the stride-2 ladder and every shard's global start index is even at every
level (the stride-2 phase decomposition then matches the global grid).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sudo_rm_rf_tpu import ops
from sudo_rm_rf_tpu.ops.pallas.uconv import params_from_flax

SEQ_AXIS = "seq"


def make_seq_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D mesh over the ``seq`` (time-shard) axis."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    return Mesh(np.asarray(devices[:n_devices]), (SEQ_AXIS,))


def default_halo_frames(num_blocks: int, depth: int) -> int:
    """Receptive-field radius of the network in encoder frames, rounded up.

    Per U-ConvBlock the down ladder reaches +-(2 + sum_{k=1..D-1} 2*2^(k-1))
    = 2^D frames (k=5 'same' convs, stride 2); the upsample-add pass grows
    nothing. Encoder/decoder add +-2 frames. Rounded up to a multiple of
    2^(depth-1) to keep halo frame counts divisible through the ladder.
    """
    r = num_blocks * (2 ** depth) + 4
    q = 2 ** (depth - 1)
    return -(-r // q) * q


def _seq_glob_ln(x, gamma, beta, owned, axis, n_shards, eps=1e-8):
    """GlobLN of a (B, C, T_local) shard with exact global statistics.

    owned: (start, length) slice of locally-owned frames; statistics are
    psum'd over `axis`. Applied to ALL local frames (halo included) so the
    downstream halo recompute sees globally-consistent values.
    """
    start, length = owned
    o32 = lax.slice_in_dim(x, start, start + length, axis=2).astype(jnp.float32)
    s1 = jnp.sum(o32, axis=(1, 2), keepdims=True)
    s2 = jnp.sum(o32 * o32, axis=(1, 2), keepdims=True)
    s1 = lax.psum(s1, axis)
    s2 = lax.psum(s2, axis)
    count = x.shape[1] * length * n_shards
    mean = s1 / count
    var = jnp.maximum(s2 / count - mean * mean, 0.0)
    inv = lax.rsqrt(var + eps)
    g32 = gamma.astype(jnp.float32)[None, :, None]
    sc = (g32 * inv).astype(x.dtype)
    sh = (beta.astype(jnp.float32)[None, :, None] - g32 * inv * mean).astype(x.dtype)
    return sc * x + sh


def _halo_exchange(x_shard, halo_s, axis, n_shards):
    """(B, owned_s) -> (B, 1, owned_s + 2*halo_s) with neighbor halos.

    ppermute leaves the outermost edges zero — exactly the global zero pad.
    """
    left = lax.ppermute(
        x_shard[:, -halo_s:], axis, [(j, j + 1) for j in range(n_shards - 1)]
    )
    right = lax.ppermute(
        x_shard[:, :halo_s], axis, [(j + 1, j) for j in range(n_shards - 1)]
    )
    return jnp.concatenate([left, x_shard, right], axis=-1)[:, None, :]


def _level_masks(depth, f_local, owned_f, halo_frames, t_f_global, axis, dtype):
    """Per-ladder-level masks zeroing frames outside the global sequence."""
    i = lax.axis_index(axis)
    g_start_f = i * owned_f - halo_frames
    masks = []
    for k in range(depth):
        idx = (g_start_f >> k) + lax.iota(jnp.int32, f_local >> k)
        m = (idx >= 0) & (idx < (t_f_global >> k))
        masks.append(m.astype(dtype)[None, None, :])
    return masks


def _uconv_block_fma_seq(x, params, depth, masks, owned0, axis, n_shards):
    """`ops.pallas.uconv.uconv_block_fma` with sequence-sharded semantics.

    Same math/folding discipline; differences: (a) GlobLN statistics reduce
    over owned frames and psum over `axis`; (b) `masks[k]` (out-of-global
    zero masks per ladder level) multiply every spatial conv's input.
    """
    b, co, t = x.shape
    ci = params["proj_w"].shape[0]
    h0, o0 = owned0

    y = jnp.einsum("co,bot->bct", params["proj_w"], x) + params["proj_b"][None, :, None]
    y = _seq_glob_ln(y, params["proj_g"], params["proj_beta"], (h0, o0), axis, n_shards)
    y = jnp.where(y >= 0, y, params["proj_slope"] * y)

    def stats(o, level):
        s, l = h0 >> level, o0 >> level
        o32 = lax.slice_in_dim(o, s, s + l, axis=2).astype(jnp.float32)
        s1 = lax.psum(jnp.sum(o32, axis=(1, 2), keepdims=True), axis)
        s2 = lax.psum(jnp.sum(o32 * o32, axis=(1, 2), keepdims=True), axis)
        n = ci * l * n_shards
        mean = s1 / n
        var = jnp.maximum(s2 / n - mean * mean, 0.0)
        return mean, lax.rsqrt(var + 1e-8)

    def conv_s1(v, w):
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
        x_in = (a * cur + bb) * masks[k if k == 0 else k - 1]
        o = conv_s1(x_in, params["dw_w"][k]) if k == 0 else conv_s2(x_in, params["dw_w"][k])
        o = o + params["dw_b"][k][None, :, None]
        mean, inv = stats(o, k)
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

    acc = _seq_glob_ln(acc, params["final_g"], params["final_beta"], (h0, o0), axis, n_shards)
    acc = jnp.where(acc >= 0, acc, params["final_slope"] * acc)
    out = jnp.einsum("oc,bct->bot", params["res_w"], acc) + params["res_b"][None, :, None]
    return out + x


def _seq_forward_shard(
    params,
    x_shard,  # (B, owned_samples) — this shard's contiguous time slice
    *,
    num_blocks,
    depth,
    enc_kernel_size,
    num_sources,
    n_shards,
    halo_frames,
    compute_dtype,
    axis=SEQ_AXIS,
):
    """Per-shard body run under shard_map. Returns (B, S, owned_samples)."""
    stride = enc_kernel_size // 2
    halo_s = halo_frames * stride
    b, owned_s = x_shard.shape
    if owned_s < halo_s:
        raise ValueError(
            f"per-shard length {owned_s} < halo {halo_s}: halos are exchanged "
            "with immediate neighbors only — pad the input or shrink halo_frames"
        )
    owned_f = owned_s // stride
    t_f_global = n_shards * owned_f

    if compute_dtype is not None:
        cdt = jnp.dtype(compute_dtype)
        params = jax.tree.map(lambda v: v.astype(cdt), params)
        x_shard = x_shard.astype(cdt)

    xloc = _halo_exchange(x_shard, halo_s, axis, n_shards)

    # out-of-global-range masks per ladder level (frames beyond the global
    # sequence must read as the zero pad the unsharded convs apply)
    f_local = owned_f + 2 * halo_frames
    masks = _level_masks(
        depth, f_local, owned_f, halo_frames, t_f_global, axis, x_shard.dtype
    )

    enc_num_basis = params["encoder"]["weight"].shape[0]
    x = ops.conv1d(
        xloc, params["encoder"]["weight"], stride=stride, padding=stride
    )
    # bias-free encoder: out-of-global frames are exactly 0 already, but the
    # local 'same' pad makes the outermost halo frame inexact — inside the
    # erosion budget. Mask so downstream global-boundary semantics hold.
    x = x * masks[0]
    s = x
    x = _seq_glob_ln(
        x, params["ln"]["gamma"], params["ln"]["beta"],
        (halo_frames, owned_f), axis, n_shards,
    )
    x = (
        jnp.einsum("on,bnt->bot", params["bottleneck"]["weight"][:, :, 0], x)
        + params["bottleneck"]["bias"][None, :, None]
    )

    for blk in range(num_blocks):
        kp = params_from_flax(params[f"sm_{blk}"])
        x = _uconv_block_fma_seq(
            x, kp, depth, masks, (halo_frames, owned_f), axis, n_shards
        )

    slope = params["mask_net_0"]["weight"][0]
    x = jnp.where(x >= 0, x, slope * x)
    x = (
        jnp.einsum("oc,bct->bot", params["mask_net_1"]["weight"][:, :, 0], x)
        + params["mask_net_1"]["bias"][None, :, None]
    )
    x = x.reshape(b, num_sources, enc_num_basis, -1)
    x = jax.nn.relu(x)
    x = x * s[:, None, :, :]

    est = ops.conv_transpose1d(
        (x * masks[0][:, None]).reshape(b, num_sources * enc_num_basis, -1),
        params["decoder"]["weight"],
        stride=stride,
        padding=stride,
        output_padding=stride - 1,
    )
    out = lax.slice_in_dim(est, halo_s, halo_s + owned_s, axis=2)
    return out.astype(jnp.float32)


def _tac_seq(p, x, owned, axis, n_shards):
    """`fast_inference._tac_fast` (bandwidth-shaped TAC) with the final
    GlobLN's statistics psum'd over the ``seq`` axis. TAC itself is
    pointwise in time — no halo is consumed."""
    b, g, n, t = x.shape

    def lin(sub, v):
        return jnp.einsum("...ct,oc->...ot", v, sub["weight"]) + sub["bias"][
            ..., :, None
        ]

    def prelu(sub, v):
        return jnp.where(v >= 0, v, sub["weight"][0] * v)

    y = prelu(p["TAC_input_1"], lin(p["TAC_input_0"], x))
    mean = jnp.mean(y, axis=1)
    mean = prelu(p["TAC_mean_1"], lin(p["TAC_mean_0"], mean))
    h = y.shape[2]
    w_out = p["TAC_output_0"]["weight"]  # (N, 2H)
    out = (
        jnp.einsum("bgct,oc->bgot", y, w_out[:, :h])
        + jnp.einsum("bct,oc->bot", mean, w_out[:, h:])[:, None]
        + p["TAC_output_0"]["bias"][None, None, :, None]
    )
    out = prelu(p["TAC_output_1"], out)
    out = _seq_glob_ln(
        out.reshape(b * g, n, t), p["TAC_norm"]["gamma"], p["TAC_norm"]["beta"],
        owned, axis, n_shards,
    )
    return x + out.reshape(b, g, n, t)


def _gc_block_seq(x, kp, depth, g, masks, owned0, axis, n_shards):
    """`fast_inference.gc_uconv_block_fma_merged` with sequence-sharded
    semantics: per-(batch, group) GlobLN statistics over owned frames
    psum'd over `axis`; out-of-global masks on every spatial conv input."""
    b, c_out, t = x.shape
    out_pg = c_out // g
    in_pg = kp["proj_w"].shape[0]
    c_in = g * in_pg
    h0, o0 = owned0

    def grouped_stats(o, gamma, beta, level):
        """per-(b, group) stats over owned frames at `level`, psum'd; folded
        to merged (B, C_in, 1) scale/shift."""
        s, l = h0 >> level, o0 >> level
        og = lax.slice_in_dim(o, s, s + l, axis=2).reshape(
            b, g, in_pg, l
        ).astype(jnp.float32)
        s1 = lax.psum(jnp.sum(og, axis=(2, 3), keepdims=True), axis)
        s2 = lax.psum(jnp.sum(og * og, axis=(2, 3), keepdims=True), axis)
        nelem = in_pg * l * n_shards
        mean = s1 / nelem
        var = jnp.maximum(s2 / nelem - mean * mean, 0.0)
        inv = lax.rsqrt(var + 1e-8)  # (B, g, 1, 1)
        gm = gamma.astype(jnp.float32)[None, None, :, None]
        bt = beta.astype(jnp.float32)[None, None, :, None]
        a = (gm * inv).reshape(b, g, in_pg, 1).reshape(b, c_in, 1)
        bb = (bt - gm * inv * mean).reshape(b, c_in, 1)
        return a.astype(o.dtype), bb.astype(o.dtype)

    # proj 1x1 (shared across groups) + per-group GlobLN + PReLU
    xg = x.reshape(b, g, out_pg, t)
    y = jnp.einsum("bgct,ic->bgit", xg, kp["proj_w"]) + kp["proj_b"][None, None, :, None]
    a, bb = grouped_stats(
        y.reshape(b, c_in, t), kp["proj_g"], kp["proj_beta"], 0
    )
    y = (a * y.reshape(b, c_in, t) + bb)
    y = jnp.where(y >= 0, y, kp["proj_slope"] * y)

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
        x_in = (a * cur + bb) * masks[k if k == 0 else k - 1]
        o = conv_s1(x_in, dw_w[k]) if k == 0 else conv_s2(x_in, dw_w[k])
        o = o + dw_b[k][None, :, None]
        a, bb = grouped_stats(o, kp["dw_g"][k], kp["dw_beta"][k], k)
        raw.append(o)
        folds.append((a, bb))
        cur = o

    a, bb = folds[-1]
    acc = a * raw[-1] + bb
    for k in range(depth - 2, -1, -1):
        a, bb = folds[k]
        acc = (a * raw[k] + bb) + ops.upsample_nearest_2x(acc)

    a, bb = grouped_stats(acc, kp["final_g"], kp["final_beta"], 0)
    acc = a * acc + bb
    acc = jnp.where(acc >= 0, acc, kp["final_slope"] * acc)
    accg = acc.reshape(b, g, in_pg, t)
    out = jnp.einsum("bgit,ci->bgct", accg, kp["res_w"]) + kp["res_b"][
        None, None, :, None
    ]
    return out.reshape(b, c_out, t) + x


def _gc_seq_forward_shard(
    params,
    x_shard,  # (B, owned_samples)
    *,
    num_blocks,
    depth,
    enc_kernel_size,
    num_sources,
    group_size,
    n_shards,
    halo_frames,
    compute_dtype,
    axis=SEQ_AXIS,
):
    """GroupComm per-shard body under shard_map (in_audio_channels=1)."""
    stride = enc_kernel_size // 2
    halo_s = halo_frames * stride
    b, owned_s = x_shard.shape
    if owned_s < halo_s:
        raise ValueError(
            f"per-shard length {owned_s} < halo {halo_s}: pad the input or "
            "shrink halo_frames"
        )
    owned_f = owned_s // stride
    t_f_global = n_shards * owned_f

    if compute_dtype is not None:
        cdt = jnp.dtype(compute_dtype)
        params = jax.tree.map(lambda v: v.astype(cdt), params)
        x_shard = x_shard.astype(cdt)

    xloc = _halo_exchange(x_shard, halo_s, axis, n_shards)
    f_local = owned_f + 2 * halo_frames
    masks = _level_masks(
        depth, f_local, owned_f, halo_frames, t_f_global, axis, x_shard.dtype
    )
    owned0 = (halo_frames, owned_f)

    enc_num_basis = params["encoder"]["weight"].shape[0]
    out_channels = params["bottleneck"]["weight"].shape[0]
    g = group_size

    x = ops.conv1d(
        xloc, params["encoder"]["weight"], stride=stride, padding=stride
    )
    x = x * masks[0]
    s = x
    x = _seq_glob_ln(
        x, params["ln"]["gamma"], params["ln"]["beta"], owned0, axis, n_shards
    )
    x = ops.conv1d(
        x, params["bottleneck"]["weight"], params["bottleneck"]["bias"]
    )

    for i in range(num_blocks):
        bp = params[f"sm_{i}"]
        t = x.shape[-1]
        y = _tac_seq(
            bp["TAC"], x.reshape(b, g, out_channels // g, t),
            owned0, axis, n_shards,
        )
        kp = params_from_flax(bp["UBlock"])
        x = _gc_block_seq(
            y.reshape(b, out_channels, t), kp, depth, g, masks,
            owned0, axis, n_shards,
        )

    slope = params["mask_net_0"]["weight"][0]
    x = jnp.where(x >= 0, x, slope * x)
    x = ops.conv1d(
        x, params["mask_net_1"]["weight"], params["mask_net_1"]["bias"]
    )
    x = x.reshape(b, num_sources, enc_num_basis, -1)
    x = jax.nn.relu(x)
    x = x * s[:, None, :, :]

    est = ops.conv_transpose1d(
        (x * masks[0][:, None]).reshape(b, num_sources * enc_num_basis, -1),
        params["decoder"]["weight"],
        stride=stride,
        padding=stride,
        output_padding=stride - 1,
    )
    out = lax.slice_in_dim(est, halo_s, halo_s + owned_s, axis=2)
    return out.astype(jnp.float32)


def causal_halo_frames(num_blocks: int, depth: int) -> int:
    """Receptive-field radius of the CAUSAL model in encoder frames.

    The causal ladder uses k=21 'same' convs whose future taps are weight-
    masked (`causal_sudormrf.py`), so the reach is one-sided: 10 frames at
    level 0 plus 10*2^k for each stride-2 level -> 10*(2^depth - 1) per
    block, + encoder/decoder slack. A symmetric halo of this radius is used
    (the future side is cheap and keeps the shard layout shared with the
    other families). Rounded up to a multiple of 2^(depth-1).
    """
    r = num_blocks * 10 * (2 ** depth) + 8
    q = 2 ** (depth - 1)
    return -(-r // q) * q


def _causal_seq_forward_shard(
    params,
    x_shard,  # (B, owned_samples)
    *,
    num_blocks,
    depth,
    enc_kernel_size,
    num_sources,
    n_shards,
    halo_frames,
    compute_dtype,
    axis=SEQ_AXIS,
):
    """Causal SuDoRM-RF per-shard body under shard_map.

    Norm-free (NF-net skip-init, `causal_sudormrf.py`), so NO collective
    statistics are needed at all — the only ICI traffic is the one halo
    ppermute of raw samples. Causal weight masks are applied to the raw
    params exactly as the flax module does; out-of-global frames are zero-
    masked before every spatial conv (the boundary discipline shared with
    `_seq_forward_shard`).
    """
    from sudo_rm_rf_tpu.models.causal_sudormrf import _causal_mask

    stride = enc_kernel_size // 2
    halo_s = halo_frames * stride
    b, owned_s = x_shard.shape
    if owned_s < halo_s:
        raise ValueError(
            f"per-shard length {owned_s} < halo {halo_s}: pad the input or "
            "shrink halo_frames"
        )
    owned_f = owned_s // stride
    t_f_global = n_shards * owned_f

    if compute_dtype is not None:
        cdt = jnp.dtype(compute_dtype)
        params = jax.tree.map(lambda v: v.astype(cdt), params)
        x_shard = x_shard.astype(cdt)

    xloc = _halo_exchange(x_shard, halo_s, axis, n_shards)
    f_local = owned_f + 2 * halo_frames
    masks = _level_masks(
        depth, f_local, owned_f, halo_frames, t_f_global, axis, x_shard.dtype
    )

    def cconv(v, sub, stride=1, padding=0, groups=1):
        w = sub["weight"]
        w = w * _causal_mask(w.shape[-1], w.dtype)[None, None, :]
        return ops.conv1d(v, w, sub.get("bias"), stride=stride,
                          padding=padding, groups=groups)

    def prelu(sub, v):
        return jnp.where(v >= 0, v, sub["weight"][0] * v)

    enc_num_basis = params["encoder"]["weight"].shape[0]
    enc_k = params["encoder"]["weight"].shape[-1]  # 2L-1
    x = cconv(xloc, params["encoder"], stride=stride, padding=(enc_k - 1) // 2)
    x = x * masks[0]
    x = cconv(x, params["bottleneck"])

    ci = params["sm_0"]["proj_1x1"]["conv"]["weight"].shape[0]
    for blk in range(num_blocks):
        bp = params[f"sm_{blk}"]
        residual = x
        y = prelu(bp["proj_1x1"]["act"], cconv(x, bp["proj_1x1"]["conv"]))

        pyramid = []
        cur = y
        for k in range(depth):
            sub = bp[f"spp_dw_{k}"]
            cur = cconv(
                cur * masks[k if k == 0 else k - 1], sub["conv"],
                stride=1 if k == 0 else 2, padding=10, groups=ci,
            )
            cur = prelu(sub["act"], cur)
            pyramid.append(cur)

        acc = pyramid[-1]
        for k in range(depth - 2, -1, -1):
            acc = pyramid[k] + ops.upsample_nearest_2x(acc)

        out = cconv(acc, bp["res_conv"])
        x = out * bp["skipinit_gain"] + residual

    x = prelu(params["mask_net_0"], x)
    x = cconv(x, params["mask_net_1"])
    x = x.reshape(b, num_sources, enc_num_basis, -1)
    x = prelu(params["mask_nl_class"], x)

    est = ops.conv_transpose1d(
        (x * masks[0][:, None]).reshape(b, num_sources * enc_num_basis, -1),
        params["decoder"]["weight"],
        stride=stride,
        padding=stride,
        output_padding=stride - 1,
    )
    out = lax.slice_in_dim(est, halo_s, halo_s + owned_s, axis=2)
    return out.astype(jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "num_blocks", "depth", "enc_kernel_size", "num_sources",
        "halo_frames", "compute_dtype",
    ),
)
def causal_forward_seq(
    params,
    input_wav,  # (B, T), T shard-aligned
    mesh: Mesh,
    num_blocks: int = 16,
    depth: int = 4,
    enc_kernel_size: int = 21,
    num_sources: int = 2,
    halo_frames: Optional[int] = None,
    compute_dtype: Optional[str] = None,
):
    """Time-sharded causal forward. Equals `CausalSuDORMRF.apply` on the
    same input (tested); collective-free except the halo exchange."""
    n_shards = mesh.shape[SEQ_AXIS]
    if halo_frames is None:
        halo_frames = causal_halo_frames(num_blocks, depth)
    body = functools.partial(
        _causal_seq_forward_shard,
        num_blocks=num_blocks,
        depth=depth,
        enc_kernel_size=enc_kernel_size,
        num_sources=num_sources,
        n_shards=n_shards,
        halo_frames=halo_frames,
        compute_dtype=compute_dtype,
    )
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(None, SEQ_AXIS)),
        out_specs=P(None, None, SEQ_AXIS),
    )
    return fn(params, input_wav)


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "num_blocks", "depth", "enc_kernel_size", "num_sources",
        "group_size", "halo_frames", "compute_dtype",
    ),
)
def groupcomm_forward_seq(
    params,
    input_wav,  # (B, T), T shard-aligned
    mesh: Mesh,
    num_blocks: int = 16,
    depth: int = 5,
    enc_kernel_size: int = 21,
    num_sources: int = 2,
    group_size: int = 16,
    halo_frames: Optional[int] = None,
    compute_dtype: Optional[str] = None,
):
    """Time-sharded GroupComm forward (TAC is pointwise in time, so only
    the shared ladder consumes halo). Equals `groupcomm_forward_fast`
    (impl='fma_merged') on the same input — tested."""
    n_shards = mesh.shape[SEQ_AXIS]
    if halo_frames is None:
        halo_frames = default_halo_frames(num_blocks, depth)
    body = functools.partial(
        _gc_seq_forward_shard,
        num_blocks=num_blocks,
        depth=depth,
        enc_kernel_size=enc_kernel_size,
        num_sources=num_sources,
        group_size=group_size,
        n_shards=n_shards,
        halo_frames=halo_frames,
        compute_dtype=compute_dtype,
    )
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(None, SEQ_AXIS)),
        out_specs=P(None, None, SEQ_AXIS),
    )
    return fn(params, input_wav)


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "num_blocks", "depth", "enc_kernel_size", "num_sources",
        "halo_frames", "compute_dtype",
    ),
)
def improved_forward_seq(
    params,
    input_wav,  # (B, T) with T divisible by n_shards * (stride * 2**depth)
    mesh: Mesh,
    num_blocks: int = 16,
    depth: int = 5,
    enc_kernel_size: int = 21,
    num_sources: int = 2,
    halo_frames: Optional[int] = None,
    compute_dtype: Optional[str] = None,
):
    """Time-sharded forward of the improved SuDoRM-RF over `mesh`'s ``seq``
    axis. Numerically equal to `improved_forward_fast` on the same (B, T)
    input (tested); T must already be padded to a shard-aligned length —
    use `SequenceParallelSeparator` for arbitrary lengths.
    """
    n_shards = mesh.shape[SEQ_AXIS]
    if halo_frames is None:
        halo_frames = default_halo_frames(num_blocks, depth)
    body = functools.partial(
        _seq_forward_shard,
        num_blocks=num_blocks,
        depth=depth,
        enc_kernel_size=enc_kernel_size,
        num_sources=num_sources,
        n_shards=n_shards,
        halo_frames=halo_frames,
        compute_dtype=compute_dtype,
    )
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(None, SEQ_AXIS)),
        out_specs=P(None, None, SEQ_AXIS),
    )
    return fn(params, input_wav)


class SequenceParallelSeparator:
    """Separate one long mixture in a single exact pass over all chips.

    Complements `OverlapAddSeparator`: no windowing or chunk-boundary source
    realignment — the output equals the unsharded model bit-for-bit (up to
    reduction-order float noise), at 1/n_shards the per-chip time footprint.

    Args:
      params: flax 'params' tree of SuDORMRFImproved (model_type='relu')
        or GroupCommSuDORMRF (model_type='groupcomm_v2').
      mesh: 1-D ``seq`` mesh (default: all devices via `make_seq_mesh`).
      bucket_samples: round padded per-shard lengths up to a multiple of
        this to bound recompiles across input lengths (0 = exact fit).
    """

    def __init__(
        self,
        params,
        mesh: Optional[Mesh] = None,
        num_blocks: int = 16,
        upsampling_depth: int = 5,
        enc_kernel_size: int = 21,
        num_sources: int = 2,
        halo_frames: Optional[int] = None,
        input_normalize: bool = True,
        mixture_consistency: Optional[str] = None,
        compute_dtype: Optional[str] = None,
        bucket_samples: int = 0,
        model_type: str = "relu",
        group_size: int = 16,
    ):
        if model_type not in ("relu", "groupcomm_v2", "causal"):
            raise ValueError(
                f"sequence parallelism supports 'relu'/'groupcomm_v2'/"
                f"'causal' (attentive models fall back to overlap-add: "
                f"their global attention does not factor over time shards), "
                f"got {model_type!r}"
            )
        self.model_type = model_type
        self.group_size = group_size
        self.params = params
        self.mesh = mesh if mesh is not None else make_seq_mesh()
        self.num_blocks = num_blocks
        self.depth = upsampling_depth
        self.enc_kernel_size = enc_kernel_size
        self.num_sources = num_sources
        if halo_frames is not None:
            self.halo_frames = halo_frames
        elif model_type == "causal":
            self.halo_frames = causal_halo_frames(num_blocks, upsampling_depth)
        else:
            self.halo_frames = default_halo_frames(num_blocks, upsampling_depth)
        self.input_normalize = input_normalize
        self.mixture_consistency = mixture_consistency
        self.compute_dtype = compute_dtype
        self.bucket_samples = bucket_samples
        self._n = self.mesh.shape[SEQ_AXIS]
        self._align = (enc_kernel_size // 2) * (2 ** upsampling_depth)

    def _padded_len(self, t: int) -> int:
        per = -(-t // self._n)
        # halos come from immediate neighbors only: every shard must own at
        # least halo_samples (short inputs just get extra zero pad)
        per = max(per, self.halo_frames * (self.enc_kernel_size // 2))
        per = -(-per // self._align) * self._align
        if self.bucket_samples:
            per = -(-per // self.bucket_samples) * self.bucket_samples
        return per * self._n

    def separate(self, mixture: np.ndarray) -> np.ndarray:
        """(T,) mixture -> (S, T) separated sources."""
        mixture = np.asarray(mixture, np.float32).reshape(-1)
        t = mixture.shape[0]
        if self.input_normalize:
            mean = float(mixture.mean())
            std = float(mixture.std(ddof=1)) if t > 1 else 1.0
            xn = (mixture - mean) / (std + 1e-9)
        else:
            mean, std = 0.0, 1.0
            xn = mixture
        total = self._padded_len(t)
        padded = np.zeros(total, np.float32)
        padded[:t] = xn
        arr = jax.device_put(
            padded[None], NamedSharding(self.mesh, P(None, SEQ_AXIS))
        )
        kwargs = dict(
            num_blocks=self.num_blocks,
            depth=self.depth,
            enc_kernel_size=self.enc_kernel_size,
            num_sources=self.num_sources,
            halo_frames=self.halo_frames,
            compute_dtype=self.compute_dtype,
        )
        if self.model_type == "groupcomm_v2":
            est = groupcomm_forward_seq(
                self.params, arr, self.mesh,
                group_size=self.group_size, **kwargs,
            )
        elif self.model_type == "causal":
            est = causal_forward_seq(self.params, arr, self.mesh, **kwargs)
        else:
            est = improved_forward_seq(self.params, arr, self.mesh, **kwargs)
        est = np.asarray(est)[0, :, :t]
        if self.mixture_consistency is not None:
            from sudo_rm_rf_tpu.losses import mixture_consistency as mc

            est = np.asarray(
                mc(
                    jnp.asarray(est[None]),
                    jnp.asarray(xn[None, None, :t]),
                    self.mixture_consistency,
                )
            )[0]
        return est * std + mean
