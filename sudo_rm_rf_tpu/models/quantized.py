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


def fidelity_db(ref: jax.Array, est: jax.Array) -> float:
    """Output SNR (dB) of ``est`` against the exact reference output."""
    ref = jnp.asarray(ref, jnp.float32)
    err = ref - jnp.asarray(est, jnp.float32)
    num = jnp.sum(ref * ref)
    den = jnp.maximum(jnp.sum(err * err), 1e-20)
    return float(10.0 * jnp.log10(num / den))
