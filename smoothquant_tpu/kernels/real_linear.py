"""Real-quantized linear forward: static permute → act quant → fused kernel.

This is the execution path the reference could only simulate: weights live
as int4-range values + group scales in HBM and are dequantized inside the
Pallas matmul kernel; activations are quantized on the fly (XLA-fused
elementwise) and the salient channels ride a dense bf16 side path in the
same kernel (SURVEY.md §2.7 "north star" kernel).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from smoothquant_tpu.kernels.int4_group_matmul import int4_group_matmul
from smoothquant_tpu.kernels.int_group_matmul import int_group_matmul
from smoothquant_tpu.kernels.pack import (
    PackedLinear,
    quantize_activations_packed,
    quantize_activations_packed_int,
)
from smoothquant_tpu.kernels.quant_matmul import dual_path_matmul
from smoothquant_tpu.quant.config import QuantConfig

# below this many tokens the int8-MXU output-scaled kernel wins (memory
# bound); above it the dequant kernel's full-depth MXU contractions win.
# The default is overridden by kernels/tuned.json, written by
# scripts/autotune.py from measurements on the actual chip.
_INT_PATH_MAX_TOKENS = 256
_TUNED_LOADED = False


def int_path_max_tokens() -> int:
    global _INT_PATH_MAX_TOKENS, _TUNED_LOADED
    if not _TUNED_LOADED:
        _TUNED_LOADED = True
        import json
        import os

        path = os.path.join(os.path.dirname(__file__), "tuned.json")
        try:
            with open(path) as f:
                _INT_PATH_MAX_TOKENS = int(json.load(f)["int_path_max_tokens"])
        except (OSError, KeyError, ValueError):
            pass
    return _INT_PATH_MAX_TOKENS


def _int_path_supported(meta) -> bool:
    if meta.act_bits > 8:
        return False  # activation values must fit the int8 container
    if meta.act_quant in ("per_token", "per_tensor"):
        return True
    return meta.act_group_size == meta.group_size


def real_quant_linear(
    packed: PackedLinear,
    x: jax.Array,
    cfg: Optional[QuantConfig] = None,  # compat; recipe lives in packed.meta
    *,
    compute: str = "auto",  # "auto" | "dequant" | "int"
    interpret: bool = False,
    out_dtype=None,
) -> jax.Array:
    """y = act_qdq(x) @ W_qdq^T + bias with true int-weight storage.

    x: (..., in_features).  Matches the simulated quant_linear numerics in
    the packed (static-permutation) domain.  The quantization recipe is
    self-contained in packed.meta (recorded at pack time), so models can mix
    per-layer recipes (e.g. int8 lm_head over an int4 body).  compute picks
    the kernel: "int" = int8-MXU matmul with output-side scaling
    (decode-optimal), "dequant" = in-VMEM weight dequant + bf16 MXU
    (prefill-optimal), "auto" = by token count.
    """
    del cfg
    meta = packed.meta
    shape = x.shape
    x2d = x.reshape(-1, shape[-1])
    n_tokens = x2d.shape[0]
    x_perm = jnp.take(x2d, packed.perm, axis=-1)

    if meta.nibble:
        compute = "int"  # nibble storage is only consumable by the int path
    elif compute == "auto":
        if not _int_path_supported(meta):
            compute = "dequant"
        elif meta.group_size >= meta.k_ns:
            # single-group (per-channel / promoted-int8) recipes run ONE
            # full-depth int8 contraction — int wins at every token count
            compute = "int"
        else:
            compute = ("int" if n_tokens <= int_path_max_tokens()
                       else "dequant")
    if compute == "int" and not _int_path_supported(meta):
        raise ValueError("int compute path unsupported for this recipe")

    if compute == "int":
        x_q, x_scales, x_sal = quantize_activations_packed_int(x_perm, meta)
        kernel = int4_group_matmul if meta.nibble else int_group_matmul
        y = kernel(
            x_q, x_scales, packed.w_qt, packed.w_scales_t,
            x_sal.astype(x.dtype), packed.w_sal_t.astype(x.dtype),
            group_size=meta.group_size,
            out_dtype=out_dtype or x.dtype,
            interpret=interpret,
        )
    else:
        x_ns_q, x_sal = quantize_activations_packed(x_perm, meta)
        y = dual_path_matmul(
            x_ns_q.astype(x.dtype),
            x_sal.astype(x.dtype),
            packed.w_qt,
            packed.w_scales_t,
            packed.w_sal_t.astype(x.dtype),
            group_size=meta.group_size,
            out_dtype=out_dtype or x.dtype,
            interpret=interpret,
        )
    if packed.bias is not None:
        y = y + packed.bias.astype(y.dtype)
    # use the kernel's actual output width, not meta.out_features — inside a
    # shard_map the arrays are O-shards while meta still records global dims
    return y.reshape(*shape[:-1], y.shape[-1])
