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


def _pe_at(idx, d_model: int, dtype):
    """Sinusoidal positional encoding evaluated at GLOBAL frame indices.

    `models.attentive.sinusoidal_pe` tabulates positions 0..L-1 for the whole
    sequence; under time sharding each shard holds frames at global offsets
    that depend on `lax.axis_index`, so the encoding is evaluated pointwise
    at an int32 index vector instead (identical values at in-range indices;
    out-of-global halo indices produce garbage that the mask/crop discipline
    already discards). Matches the reference layout for even d_model
    (`attentive_sudormrf_v2.py:180-196`): even columns sin, odd columns cos.
    """
    pos = idx.astype(jnp.float32)[:, None]
    half = d_model // 2
    div = jnp.exp(
        jnp.arange(0, d_model, 2, dtype=jnp.float32)
        * (-np.log(10000.0) / d_model)
    )
    ang = pos * div[None, :]  # (L, half)
    pe = jnp.stack([jnp.sin(ang), jnp.cos(ang)], axis=-1).reshape(-1, 2 * half)
    return pe.astype(dtype)


def _gather_owned(x, owned, axis, n_shards):
    """All-gather every shard's OWNED frames of a (B, C, T_local) tensor into
    the exact global sequence (B, C, n_shards * owned_len), in shard order."""
    s, l = owned
    o = lax.slice_in_dim(x, s, s + l, axis=2)
    g = lax.all_gather(o, axis)  # (n_shards, B, C, l)
    b, c = x.shape[0], x.shape[1]
    return jnp.moveaxis(g, 0, 2).reshape(b, c, n_shards * l)


def _lin_cl(sub, v):
    """torch.nn.Linear on a channels-LAST (B, L, C) tensor."""
    return jnp.einsum("blc,oc->blo", v, sub["weight"]) + sub["bias"]


def _lin_cf(sub, v):
    """torch.nn.Linear on a channels-first (B, C, T) tensor
    (`groupcomm_sudormrf.Linear` semantics)."""
    return jnp.einsum("bct,oc->bot", v, sub["weight"]) + sub["bias"][None, :, None]


def _prelu(sub, v):
    w = sub["weight"]
    slope = w[0] if w.shape[0] == 1 else w.reshape((1, -1) + (1,) * (v.ndim - 2))
    return jnp.where(v >= 0, v, slope * v)


def _mha_global_kv(p, q, kv, n_heads):
    """`attentive.MHAttentionLayer` with q LOCAL (B, Lq, C) and k/v the
    all-gathered GLOBAL sequence (B, Lkv, C). Exactness: attention is a
    pointwise function of (query frame, full k/v set) — computing it for
    local queries against the gathered global keys equals the unsharded
    global self-attention at every in-range query position."""
    b, q_len, _ = q.shape
    kv_len = kv.shape[1]
    d = p["Q_proj"]["weight"].shape[0]
    h = n_heads
    d_head = d // h
    qh = (1.0 / np.sqrt(d_head)) * _lin_cl(p["Q_proj"], q).reshape(
        b, q_len, h, d_head
    )
    kh = _lin_cl(p["K_proj"], kv).reshape(b, kv_len, h, d_head)
    vh = _lin_cl(p["V_proj"], kv).reshape(b, kv_len, h, d_head)
    logits = jnp.einsum("nlhd,nshd->nhls", qh, kh)
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("nhls,nshd->nlhd", attn, vh).reshape(b, q_len, d)
    return _lin_cl(p["O_proj"], out)


def _transformer_seq(p, x, owned, n_heads, axis, n_shards):
    """`attentive.TransformerLayer` (v2 `attentive_sudormrf_v2.py:240-261`)
    under time sharding: q stays local, k/v are the all-gathered owned
    frames, both GlobLNs psum their statistics."""
    i = lax.axis_index(axis)
    g_start = i * owned[1] - owned[0]
    idx = g_start + lax.iota(jnp.int32, x.shape[-1])
    c = x.shape[1]
    xt = jnp.swapaxes(x, 1, 2) + _pe_at(idx, c, x.dtype)[None]
    kv_global = _gather_owned(jnp.swapaxes(xt, 1, 2), owned, axis, n_shards)
    xt = xt + _mha_global_kv(p["mha"], xt, jnp.swapaxes(kv_global, 1, 2), n_heads)
    y = _seq_glob_ln(
        jnp.swapaxes(xt, 1, 2), p["out_mha_norm"]["gamma"],
        p["out_mha_norm"]["beta"], owned, axis, n_shards,
    )
    ffn = _lin_cf(
        {"weight": p["ffn"]["conv"]["weight"][:, :, 0],
         "bias": p["ffn"]["conv"]["bias"]}, y,
    )
    ffn = _seq_glob_ln(
        ffn, p["ffn"]["norm"]["gamma"], p["ffn"]["norm"]["beta"],
        owned, axis, n_shards,
    )
    ffn = _prelu(p["ffn"]["act"], ffn)
    return _seq_glob_ln(
        ffn + y, p["out_norm"]["gamma"], p["out_norm"]["beta"],
        owned, axis, n_shards,
    )


def _mha_norm_seq(p, x, owned, n_heads, axis, n_shards):
    """`attentive.MHANormLayer` (v1, restored-linears form) under time
    sharding; the packed-qkv TorchMHA projects q locally and k/v from the
    gathered global sequence."""
    att_dim = p["in_linear"]["weight"].shape[0]
    xt = _lin_cf(p["in_linear"], x)  # (B, A, T)
    i = lax.axis_index(axis)
    g_start = i * owned[1] - owned[0]
    idx = g_start + lax.iota(jnp.int32, x.shape[-1])
    xt = xt + jnp.swapaxes(_pe_at(idx, att_dim, x.dtype)[None], 1, 2)
    xt = _seq_glob_ln(
        xt, p["in_norm"]["gamma"], p["in_norm"]["beta"], owned, axis, n_shards
    )

    mp = p["mha"]
    w, bvec = mp["in_proj_weight"], mp["in_proj_bias"]
    d = att_dim
    h = n_heads
    hd = d // h
    xt_cl = jnp.swapaxes(xt, 1, 2)  # (B, T, A)
    b, t_loc, _ = xt_cl.shape
    q = (jnp.einsum("btc,oc->bto", xt_cl, w[:d]) + bvec[:d]).reshape(
        b, t_loc, h, hd
    ) / np.sqrt(hd)
    kv_cl = jnp.swapaxes(_gather_owned(xt, owned, axis, n_shards), 1, 2)
    kvp = jnp.einsum("btc,oc->bto", kv_cl, w[d:]) + bvec[d:]
    k, v = jnp.split(kvp, 2, axis=-1)
    t_glob = kv_cl.shape[1]
    k = k.reshape(b, t_glob, h, hd)
    v = v.reshape(b, t_glob, h, hd)
    logits = jnp.einsum("blhd,bshd->bhls", q, k)
    attn = jax.nn.softmax(logits, axis=-1)
    att_out = jnp.einsum("bhls,bshd->blhd", attn, v).reshape(b, t_loc, d)
    att_out = _lin_cl(
        {"weight": mp["out_proj"]["weight"], "bias": mp["out_proj"]["bias"]},
        att_out,
    )
    y = xt + _seq_glob_ln(
        jnp.swapaxes(att_out, 1, 2), p["out_norm1"]["gamma"],
        p["out_norm1"]["beta"], owned, axis, n_shards,
    )
    out = _lin_cf(p["out_linear"], y)
    out = _seq_glob_ln(
        out, p["out_norm2"]["gamma"], p["out_norm2"]["beta"],
        owned, axis, n_shards,
    )
    return _prelu(p["act"], out)


def _attentive_block_seq(x, bp, depth, masks, owned0, n_heads, variant,
                         axis, n_shards):
    """`attentive._AttentiveUConvBlockBase` (v1/v2) with sequence-sharded
    semantics: halo-recompute convs with out-of-global masks, psum'd GlobLN
    statistics, and EXACT global attention at the most-downsampled level
    (all-gather of owned deepest frames as k/v — tiny: 1/2^(depth-1) of the
    level-0 frame count, `attentive_sudormrf.py:163-193` places the
    transformer only there)."""
    h0, o0 = owned0
    ci = bp["proj_1x1"]["conv"]["weight"].shape[0]
    residual = x
    y = _lin_cf(
        {"weight": bp["proj_1x1"]["conv"]["weight"][:, :, 0],
         "bias": bp["proj_1x1"]["conv"]["bias"]}, x,
    )
    y = _seq_glob_ln(
        y, bp["proj_1x1"]["norm"]["gamma"], bp["proj_1x1"]["norm"]["beta"],
        (h0, o0), axis, n_shards,
    )
    y = _prelu(bp["proj_1x1"]["act"], y)

    pyramid = []
    cur = y
    for k in range(depth):
        sub = bp[f"spp_dw_{k}"]
        cur = ops.conv1d(
            cur * masks[k if k == 0 else k - 1],
            sub["conv"]["weight"], sub["conv"]["bias"],
            stride=1 if k == 0 else 2, padding=2, groups=ci,
        )
        cur = _seq_glob_ln(
            cur, sub["norm"]["gamma"], sub["norm"]["beta"],
            (h0 >> k, o0 >> k), axis, n_shards,
        )
        pyramid.append(cur)

    lvl = depth - 1
    owned_l = (h0 >> lvl, o0 >> lvl)
    if variant == "v1":
        att = _mha_norm_seq(
            bp["attention"], pyramid[-1], owned_l, n_heads, axis, n_shards
        )
    else:
        att = _transformer_seq(
            bp["attention"], pyramid[-1], owned_l, n_heads, axis, n_shards
        )
    acc = att
    for k in range(depth - 2, -1, -1):
        acc = pyramid[k] + ops.upsample_nearest_2x(acc)

    acc = _seq_glob_ln(
        acc, bp["final_norm"]["norm"]["gamma"], bp["final_norm"]["norm"]["beta"],
        (h0, o0), axis, n_shards,
    )
    acc = _prelu(bp["final_norm"]["act"], acc)
    out = _lin_cf(
        {"weight": bp["res_conv"]["weight"][:, :, 0],
         "bias": bp["res_conv"]["bias"]}, acc,
    )
    return out + residual


def _attentive_seq_forward_shard(
    params,
    x_shard,  # (B, owned_samples)
    *,
    num_blocks,
    depth,
    enc_kernel_size,
    num_sources,
    n_heads,
    variant,
    n_shards,
    halo_frames,
    compute_dtype,
    axis=SEQ_AXIS,
):
    """Attentive SuDoRM-RF (v1/v2) per-shard body under shard_map.

    Convs follow the halo-recompute + out-of-global-mask discipline of
    `_seq_forward_shard`; the per-block transformer is computed EXACTLY:
    queries stay local, keys/values are one `lax.all_gather` of every
    shard's owned deepest-level frames (always exact — erosion consumes
    halo from the outside in, never the owned core), so in-range local
    queries see precisely the unsharded global attention. ICI per block =
    one (B, C, T_f/2^(depth-1)) gather; v3 is NOT offered here because its
    shallowest cross-attention resampler's k/v live at T_f/2 — gathering
    ~C/2 floats per input sample per block erases sequence parallelism's
    memory win (use overlap-add for v3)."""
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

    for blk in range(num_blocks):
        x = _attentive_block_seq(
            x, params[f"sm_{blk}"], depth, masks, owned0, n_heads, variant,
            axis, n_shards,
        )

    x = _prelu(params["mask_net_0"], x)
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


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "num_blocks", "depth", "enc_kernel_size", "num_sources",
        "n_heads", "variant", "halo_frames", "compute_dtype",
    ),
)
def attentive_forward_seq(
    params,
    input_wav,  # (B, T), T shard-aligned
    mesh: Mesh,
    num_blocks: int = 16,
    depth: int = 4,
    enc_kernel_size: int = 21,
    num_sources: int = 2,
    n_heads: int = 4,
    variant: str = "v2",
    halo_frames: Optional[int] = None,
    compute_dtype: Optional[str] = None,
):
    """Time-sharded attentive (v1/v2) forward; equals the unsharded
    `AttentiveSuDORMRF{,v2}.apply` on the same input (tested). The
    attention ladder level is reproduced exactly via a global k/v gather,
    NOT approximated by windowing."""
    if variant not in ("v1", "v2"):
        raise ValueError(f"attentive_forward_seq supports v1/v2, got {variant!r}")
    n_shards = mesh.shape[SEQ_AXIS]
    if halo_frames is None:
        halo_frames = default_halo_frames(num_blocks, depth)
    body = functools.partial(
        _attentive_seq_forward_shard,
        num_blocks=num_blocks,
        depth=depth,
        enc_kernel_size=enc_kernel_size,
        num_sources=num_sources,
        n_heads=n_heads,
        variant=variant,
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
        n_heads: int = 4,
    ):
        if model_type not in (
            "relu", "groupcomm_v2", "causal", "attention", "attention_v2"
        ):
            raise ValueError(
                f"sequence parallelism supports 'relu'/'groupcomm_v2'/"
                f"'causal'/'attention'/'attention_v2' (attention_v3 falls "
                f"back to overlap-add: its shallowest cross-attention "
                f"resampler takes k/v at T/2 frames x C channels, so the "
                f"per-block gather would move ~C/2 floats per input sample "
                f"— erasing the per-chip memory win that is the point of "
                f"time sharding), got {model_type!r}"
            )
        self.model_type = model_type
        self.group_size = group_size
        self.n_heads = n_heads
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
        elif self.model_type in ("attention", "attention_v2"):
            est = attentive_forward_seq(
                self.params, arr, self.mesh, n_heads=self.n_heads,
                variant="v1" if self.model_type == "attention" else "v2",
                **kwargs,
            )
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
