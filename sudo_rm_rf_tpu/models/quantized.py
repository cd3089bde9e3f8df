"""Int8 quantized serving for the Improved SuDoRM-RF (TPU MXU int8 path).

The serving forward's FLOPs live in the 1x1 convs — bottleneck (N -> C),
per-block proj (C -> Ci) and res (Ci -> C), and the mask head (C -> S*N);
each is a (O, C) x (B, C, T) matmul on the MXU. The v5e MXU runs
int8 x int8 -> int32 at twice the bf16 rate and the int8 operands halve
the HBM weight/activation traffic, so this path quantizes exactly those
matmuls:

  * weights: symmetric per-output-channel int8 (scale = absmax/127),
    quantized ONCE at load time (`quantize_improved_params`);
  * activations: symmetric dynamic per-batch-element int8, scale computed
    on the fly from the producing op's output (fuses with the producer);
  * accumulation in int32 (`preferred_element_type`), dequantized by
    s_w * s_x into the bf16 compute stream.

Everything that is bandwidth- rather than FLOP-bound (encoder/decoder k=21
convs, the depthwise ladder, GlobLN statistics) stays on the bf16 path with
fp32 statistics — identical to the gated bf16 serving configuration.

Like the bf16 path, this is a *gated* configuration: `fidelity_db` measures
output SNR vs the fp32 exact forward, and bench.py only publishes the int8
row when the gate passes. There is no reference counterpart (the reference
serves fp32 torch only, `simple_whamr_evaluation.py:138-151`); this is the
quantized-serving item of docs/ROADMAP.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from sudo_rm_rf_tpu import ops
from sudo_rm_rf_tpu.ops.pallas.uconv import params_from_flax, uconv_block_fma


def quantize_weight_per_channel(w: jax.Array) -> dict:
    """Symmetric per-row int8: w (O, C) -> {'q': int8 (O, C), 's': f32 (O,)}."""
    s = jnp.maximum(jnp.max(jnp.abs(w.astype(jnp.float32)), axis=1), 1e-12) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / s[:, None]), -127, 127)
    return {"q": q.astype(jnp.int8), "s": s}


def _mm_int8(w, v: jax.Array, out_dtype=jnp.bfloat16, scale=None,
             collect=None) -> jax.Array:
    """out[b,o,t] = sum_c w[o,c] v[b,c,t] through int8 MXU dots.

    w: {'q': (O, C) int8, 's': (O,) f32} — or a plain (O, C) float array,
    which runs the unquantized einsum (the per-family bf16 fallback for
    mixed int8/bf16 configs). v: (B, C, T) any float dtype.

    scale: None -> dynamic per-batch-element activation absmax (an extra
    full read + reduce of v per matmul); a scalar array -> STATIC
    calibrated absmax (the quantize fuses into v's producer, no reduction
    pass — `calibrate_improved_scales`). int32 accumulation either way.

    collect: optional list; when set, the observed absmax of v is appended
    during tracing (the calibration pass returns these as outputs).
    """
    if not isinstance(w, dict):
        return jnp.einsum("oc,bct->bot", w, v).astype(out_dtype)
    v32 = v.astype(jnp.float32)
    if collect is not None:
        collect.append(jnp.max(jnp.abs(v32)))
    if scale is None:
        amax = jnp.max(jnp.abs(v32), axis=(1, 2), keepdims=True)
        s_x = jnp.maximum(amax, 1e-12) / 127.0
    else:
        s_x = jnp.maximum(jnp.asarray(scale, jnp.float32), 1e-12) / 127.0
    vq = jnp.clip(jnp.round(v32 / s_x), -127, 127).astype(jnp.int8)
    y = jnp.einsum(
        "oc,bct->bot", w["q"], vq, preferred_element_type=jnp.int32
    )
    return (y.astype(jnp.float32) * (w["s"][None, :, None] * s_x)).astype(out_dtype)


ALL_FAMILIES = ("bottleneck", "proj", "res", "mask")


def quantize_improved_params(params: dict, compute_dtype=jnp.bfloat16,
                             families=ALL_FAMILIES) -> dict:
    """Build the int8 serving tree from the flax 'params' of SuDORMRFImproved.

    1x1 matmul weights (bottleneck, per-block proj/res, mask head) become
    {'q', 's'} int8 dicts; everything else is cast to ``compute_dtype``
    except normalization affines, which glob_ln reads through fp32 stats
    anyway. Do this once at load time, outside jit.

    families: which matmul families to quantize (subset of ALL_FAMILIES);
    the rest keep float weights and run the plain einsum — mixed int8/bf16
    configs for wide models where one family dominates the int8 error.
    """
    cdt = jnp.dtype(compute_dtype)
    required = {"encoder", "ln", "bottleneck", "mask_net_0", "mask_net_1",
                "decoder", "sm_0"}
    missing = required - set(params)
    # GroupComm shares the top-level names but its blocks are TAC+UBlock
    # subtrees, not the improved proj_1x1/spp_dw ladder
    if not missing and "proj_1x1" not in params["sm_0"]:
        missing = {"sm_0/proj_1x1"}
    if missing:
        raise ValueError(
            "quantize_improved_params expects the flax 'params' tree of "
            "SuDORMRFImproved (top-level keys encoder/ln/bottleneck/sm_i/"
            f"mask_net_*/decoder, blocks with proj_1x1); missing: "
            f"{sorted(missing)}. GroupComm/v1/causal trees are not supported "
            "by the int8 serving path."
        )
    num_blocks = len([k for k in params if k.startswith("sm_")])

    def maybe_q(w, family):
        w = jnp.asarray(w)
        if family in families:
            return quantize_weight_per_channel(w)
        return w.astype(cdt)

    blocks = []
    for i in range(num_blocks):
        kp = dict(params_from_flax(params[f"sm_{i}"]))
        # proj_w is stored (Ci, Co) and consumed as (O=Ci, C=Co); res_w is
        # (Co, Ci) consumed as (O=Co, C=Ci) — both already (O, C).
        kp["proj_w"] = maybe_q(kp["proj_w"], "proj")
        kp["res_w"] = maybe_q(kp["res_w"], "res")
        for k, v in kp.items():
            if k not in ("proj_w", "res_w"):
                kp[k] = jnp.asarray(v).astype(cdt)
        blocks.append(kp)
    return {
        "encoder": jnp.asarray(params["encoder"]["weight"]).astype(cdt),
        "ln_gamma": jnp.asarray(params["ln"]["gamma"]).astype(cdt),
        "ln_beta": jnp.asarray(params["ln"]["beta"]).astype(cdt),
        "bottleneck_w": maybe_q(
            params["bottleneck"]["weight"][:, :, 0], "bottleneck"
        ),
        "bottleneck_b": jnp.asarray(params["bottleneck"]["bias"]).astype(cdt),
        "blocks": blocks,
        "mask_slope": jnp.asarray(params["mask_net_0"]["weight"][0]).astype(cdt),
        "mask_w": maybe_q(params["mask_net_1"]["weight"][:, :, 0], "mask"),
        "mask_b": jnp.asarray(params["mask_net_1"]["bias"]).astype(cdt),
        "decoder": jnp.asarray(params["decoder"]["weight"]).astype(cdt),
    }


def _forward_int8_impl(
    qparams: dict,
    input_wav: jax.Array,
    upsampling_depth: int,
    enc_kernel_size: int,
    num_sources: int,
    cdt,
    scales: dict = None,
    collector: dict = None,
):
    """Shared int8 forward. scales: optional static activation-absmax tree
    {'bottleneck': (), 'proj': (R,), 'res': (R,), 'mask': ()} from
    `calibrate_improved_scales`; None -> dynamic scales. collector: optional
    dict of lists filled with observed absmax tracers (calibration pass)."""

    def site(family, i=None):
        col = None if collector is None else collector[family]

        def mm(w, v):
            if not isinstance(w, dict):  # unquantized family: plain einsum
                return _mm_int8(w, v, out_dtype=cdt)
            sc = None
            if scales is not None:
                sc = scales[family] if i is None else scales[family][i]
            return _mm_int8(w, v, out_dtype=cdt, scale=sc, collect=col)

        return mm

    def block_mm(kp, i):
        proj, res = site("proj", i), site("res", i)

        def mm(w, v):
            if w is kp["proj_w"]:
                return proj(w, v)
            if w is kp["res_w"]:
                return res(w, v)
            return _mm_int8(w, v, out_dtype=cdt)

        return mm

    if input_wav.ndim == 2:
        input_wav = input_wav[:, None, :]
    in_len = input_wav.shape[-1]
    multiple = (enc_kernel_size // 2) * 2**upsampling_depth
    x = ops.pad_to_multiple(input_wav, multiple).astype(cdt)

    enc_num_basis = qparams["encoder"].shape[0]
    x = ops.conv1d(
        x, qparams["encoder"], stride=enc_kernel_size // 2,
        padding=enc_kernel_size // 2,
    )
    s = x
    x = ops.glob_ln(x, qparams["ln_gamma"], qparams["ln_beta"])
    x = site("bottleneck")(qparams["bottleneck_w"], x) \
        + qparams["bottleneck_b"][None, :, None]

    for i, kp in enumerate(qparams["blocks"]):
        x = uconv_block_fma(x, kp, upsampling_depth, matmul=block_mm(kp, i))

    x = jnp.where(x >= 0, x, qparams["mask_slope"] * x)
    x = site("mask")(qparams["mask_w"], x) + qparams["mask_b"][None, :, None]
    b = x.shape[0]
    x = x.reshape(b, num_sources, enc_num_basis, -1)
    x = jax.nn.relu(x)
    x = x * s[:, None, :, :]

    est = ops.conv_transpose1d(
        x.reshape(b, num_sources * enc_num_basis, -1),
        qparams["decoder"],
        stride=enc_kernel_size // 2,
        padding=enc_kernel_size // 2,
        output_padding=(enc_kernel_size // 2) - 1,
    )
    return ops.unpad_to_length(est, in_len).astype(jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("upsampling_depth", "enc_kernel_size", "num_sources",
                     "compute_dtype"),
)
def improved_forward_int8(
    qparams: dict,
    input_wav: jax.Array,
    upsampling_depth: int = 5,
    enc_kernel_size: int = 21,
    num_sources: int = 2,
    compute_dtype: str = "bfloat16",
    scales: dict = None,
) -> jax.Array:
    """Int8 serving forward over a `quantize_improved_params` tree.

    Same dataflow as `fast_inference.improved_forward_fast` (impl='fma');
    the quantized 1x1 matmul families run int8 on the MXU, the rest runs in
    ``compute_dtype`` with fp32 normalization statistics. Output fp32.

    scales: optional STATIC calibrated activation scales (from
    `calibrate_improved_scales`) — removes the dynamic per-matmul absmax
    reduction pass; None keeps the dynamic path.
    """
    return _forward_int8_impl(
        qparams, input_wav, upsampling_depth, enc_kernel_size, num_sources,
        jnp.dtype(compute_dtype), scales=scales,
    )


def calibrate_improved_scales(
    qparams: dict,
    calib_wav: jax.Array,
    upsampling_depth: int = 5,
    enc_kernel_size: int = 21,
    num_sources: int = 2,
    compute_dtype: str = "bfloat16",
    margin: float = 1.0,
) -> dict:
    """Record per-site activation absmax on a calibration batch.

    Returns the static-scales tree `improved_forward_int8(..., scales=...)`
    consumes: one scalar per quantized matmul site (per-tensor symmetric),
    multiplied by ``margin`` (>1 leaves headroom for louder inputs; values
    past the scale saturate to +-127 rather than wrap). Run once at load
    time on a representative batch; the torch reference has no serving
    quantization at all (`simple_whamr_evaluation.py:138-151`).
    """

    @functools.partial(jax.jit, static_argnames=())
    def run(qp, x):
        collector = {"bottleneck": [], "proj": [], "res": [], "mask": []}
        _forward_int8_impl(
            qp, x, upsampling_depth, enc_kernel_size, num_sources,
            jnp.dtype(compute_dtype), collector=collector,
        )
        out = {}
        for k, v in collector.items():
            if not v:
                out[k] = jnp.zeros((0,))
            elif len(v) == 1:
                out[k] = v[0]
            else:
                out[k] = jnp.stack(v)
        return out

    observed = run(qparams, jnp.asarray(calib_wav))
    return jax.tree.map(lambda a: jnp.asarray(a, jnp.float32) * margin, observed)


# -- GroupComm family ---------------------------------------------------------

GC_ALL_FAMILIES = ("bottleneck", "tac_in", "tac_out", "proj", "res", "mask")


def quantize_gc_params(params: dict, compute_dtype=jnp.bfloat16,
                       families=GC_ALL_FAMILIES) -> dict:
    """Int8 serving tree for GroupCommSuDORMRF (the 0.51M published config
    family, `README.md:122`).

    The GC forward is bandwidth- rather than FLOP-bound (BENCHMARKS.md
    'GroupComm serving path'), so the win here is halved activation traffic
    into the channel matmuls, not MXU rate: the quantized sites are the
    shared-across-groups 1x1s with the largest activation operands — TAC
    input (reads x), the TAC output y-branch (reads the 3x hidden, the
    single biggest stream), the UBlock proj/res, and the full-width
    bottleneck / mask head. The TAC mean branch stays float: its operand is
    G-fold smaller and per-tensor int8 there buys nothing.

    Weights keep a ``compute_dtype`` copy in place (the merged fast path
    reads shapes/slices off them); the int8 {'q','s'} pairs live in a
    parallel ``int8`` store consumed by `groupcomm_forward_int8`'s matmul
    hooks. families: subset of GC_ALL_FAMILIES for per-family attribution.
    """
    cdt = jnp.dtype(compute_dtype)
    required = {"encoder", "ln", "bottleneck", "mask_net_0", "mask_net_1",
                "decoder", "sm_0"}
    missing = required - set(params)
    if not missing and "TAC" not in params["sm_0"]:
        missing = {"sm_0/TAC"}
    if missing:
        raise ValueError(
            "quantize_gc_params expects the flax 'params' tree of "
            "GroupCommSuDORMRF (blocks with TAC + UBlock subtrees); "
            f"missing: {sorted(missing)}. For SuDORMRFImproved trees use "
            "quantize_improved_params."
        )
    num_blocks = len([k for k in params if k.startswith("sm_")])
    cast = lambda a: jnp.asarray(a).astype(cdt)  # noqa: E731

    def maybe_q(w, family):
        return quantize_weight_per_channel(jnp.asarray(w)) \
            if family in families else None

    blocks = []
    for i in range(num_blocks):
        bp = params[f"sm_{i}"]
        tac = jax.tree.map(cast, dict(bp["TAC"]))
        kp = {k: cast(v) for k, v in params_from_flax(bp["UBlock"]).items()}
        w_out = jnp.asarray(bp["TAC"]["TAC_output_0"]["weight"])
        h = bp["TAC"]["TAC_input_0"]["weight"].shape[0]
        blocks.append({
            "tac": tac,
            "kp": kp,
            "int8": {
                "tac_in": maybe_q(bp["TAC"]["TAC_input_0"]["weight"], "tac_in"),
                "tac_out": maybe_q(w_out[:, :h], "tac_out"),
                "proj": maybe_q(params_from_flax(bp["UBlock"])["proj_w"], "proj"),
                "res": maybe_q(params_from_flax(bp["UBlock"])["res_w"], "res"),
            },
        })
    return {
        "encoder": cast(params["encoder"]["weight"]),
        "ln_gamma": cast(params["ln"]["gamma"]),
        "ln_beta": cast(params["ln"]["beta"]),
        "bottleneck_w": cast(params["bottleneck"]["weight"]),
        "bottleneck_b": cast(params["bottleneck"]["bias"]),
        "bottleneck_q": maybe_q(
            params["bottleneck"]["weight"][:, :, 0], "bottleneck"
        ),
        "blocks": blocks,
        "mask_slope": cast(params["mask_net_0"]["weight"][0]),
        "mask_w": cast(params["mask_net_1"]["weight"]),
        "mask_b": cast(params["mask_net_1"]["bias"]),
        "mask_q": maybe_q(params["mask_net_1"]["weight"][:, :, 0], "mask"),
        "decoder": cast(params["decoder"]["weight"]),
    }


def _gc_forward_int8_impl(
    qparams: dict,
    input_wav: jax.Array,
    num_blocks: int,
    upsampling_depth: int,
    enc_kernel_size: int,
    num_sources: int,
    group_size: int,
    in_audio_channels: int,
    cdt,
    scales: dict = None,
    collector: dict = None,
):
    """Shared GC int8 forward over the merged fast path
    (`fast_inference.gc_uconv_block_fma_merged` + `_tac_fast`), with the
    quantized channel matmuls injected through their hooks."""
    from sudo_rm_rf_tpu.models.fast_inference import (
        _einsum_mm,
        _tac_fast,
        gc_uconv_block_fma_merged,
    )

    def site(family, i=None):
        """mm hook: run int8 if the family was quantized, else the operand
        passed by the caller (already compute_dtype) through the plain dot."""
        q = qparams["blocks"][i]["int8"][family] if i is not None else \
            qparams[f"{family}_q"]
        col = None if collector is None else collector[family]

        def mm(w, v):
            if q is None:
                return _einsum_mm(w, v).astype(cdt)
            sc = None
            if scales is not None:
                sc = scales[family] if i is None else scales[family][i]
            return _mm_int8(q, v, out_dtype=cdt, scale=sc, collect=col)

        return mm

    if input_wav.ndim == 2:
        input_wav = input_wav[:, None, :]
    in_len = input_wav.shape[-1]
    multiple = (enc_kernel_size // 2) * 2**upsampling_depth
    x = ops.pad_to_multiple(input_wav, multiple).astype(cdt)

    enc_num_basis = qparams["encoder"].shape[0]
    out_channels = qparams["bottleneck_w"].shape[0]
    x = ops.conv1d(
        x, qparams["encoder"], stride=enc_kernel_size // 2,
        padding=enc_kernel_size // 2,
    )
    s = x
    x = ops.glob_ln(x, qparams["ln_gamma"], qparams["ln_beta"])
    x = site("bottleneck")(qparams["bottleneck_w"][:, :, 0], x) \
        + qparams["bottleneck_b"][None, :, None]

    b, g = x.shape[0], group_size
    for i in range(num_blocks):
        blk = qparams["blocks"][i]
        t = x.shape[-1]
        y = _tac_fast(
            blk["tac"], x.reshape(b, g, out_channels // g, t),
            matmuls=(site("tac_in", i), _einsum_mm, site("tac_out", i)),
        )
        x = gc_uconv_block_fma_merged(
            y.reshape(b, out_channels, t), blk["kp"], upsampling_depth, g,
            matmul=lambda w, v, _i=i: (
                site("proj", _i) if w is blk["kp"]["proj_w"]  # noqa: B023
                else site("res", _i)  # noqa: B023
            )(w, v),
        )

    x = jnp.where(x >= 0, x, qparams["mask_slope"] * x)
    x = site("mask")(qparams["mask_w"][:, :, 0], x) \
        + qparams["mask_b"][None, :, None]
    x = x.reshape(b, num_sources * in_audio_channels, enc_num_basis, -1)
    x = jax.nn.relu(x)
    x = x * s[:, None, :, :]

    est = ops.conv_transpose1d(
        x.reshape(b, -1, x.shape[-1]),
        qparams["decoder"],
        stride=enc_kernel_size // 2,
        padding=enc_kernel_size // 2,
        output_padding=(enc_kernel_size // 2) - 1,
    )
    return ops.unpad_to_length(est, in_len).astype(jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("num_blocks", "upsampling_depth", "enc_kernel_size",
                     "num_sources", "group_size", "in_audio_channels",
                     "compute_dtype"),
)
def groupcomm_forward_int8(
    qparams: dict,
    input_wav: jax.Array,
    num_blocks: int = 16,
    upsampling_depth: int = 5,
    enc_kernel_size: int = 21,
    num_sources: int = 2,
    group_size: int = 16,
    in_audio_channels: int = 1,
    compute_dtype: str = "bfloat16",
    scales: dict = None,
) -> jax.Array:
    """Int8 serving forward over a `quantize_gc_params` tree — the GC
    counterpart of `improved_forward_int8`, gated by the same fidelity
    check in bench/tests. scales: static tree from `calibrate_gc_scales`
    (dynamic per-site absmax when None)."""
    return _gc_forward_int8_impl(
        qparams, input_wav, num_blocks, upsampling_depth, enc_kernel_size,
        num_sources, group_size, in_audio_channels, jnp.dtype(compute_dtype),
        scales=scales,
    )


def calibrate_gc_scales(
    qparams: dict,
    calib_wav: jax.Array,
    num_blocks: int = 16,
    upsampling_depth: int = 5,
    enc_kernel_size: int = 21,
    num_sources: int = 2,
    group_size: int = 16,
    in_audio_channels: int = 1,
    compute_dtype: str = "bfloat16",
    margin: float = 1.0,
) -> dict:
    """Static per-site activation absmax for the GC int8 path (the GC
    counterpart of `calibrate_improved_scales`; static scales measured
    strictly faster than dynamic on the Improved family, BENCHMARKS.md)."""

    @jax.jit
    def run(qp, x):
        collector = {k: [] for k in GC_ALL_FAMILIES}
        _gc_forward_int8_impl(
            qp, x, num_blocks, upsampling_depth, enc_kernel_size,
            num_sources, group_size, in_audio_channels,
            jnp.dtype(compute_dtype), collector=collector,
        )
        out = {}
        for k, v in collector.items():
            if not v:
                out[k] = jnp.zeros((0,))
            elif len(v) == 1:
                out[k] = v[0]
            else:
                out[k] = jnp.stack(v)
        return out

    observed = run(qparams, jnp.asarray(calib_wav))
    return jax.tree.map(lambda a: jnp.asarray(a, jnp.float32) * margin, observed)


def fidelity_db(ref: jax.Array, est: jax.Array) -> float:
    """Output SNR (dB) of ``est`` against the exact reference output."""
    ref = jnp.asarray(ref, jnp.float32)
    err = ref - jnp.asarray(est, jnp.float32)
    num = jnp.sum(ref * ref)
    den = jnp.maximum(jnp.sum(err * err), 1e-20)
    return float(10.0 * jnp.log10(num / den))
