"""Real-quantized linear forward: static permute → act quant → fused kernel.

This is the execution path the reference could only simulate: weights live
as int4-range values + group scales in HBM and are dequantized inside the
Pallas matmul kernel; activations are quantized on the fly (XLA-fused
elementwise) and the salient channels ride a dense bf16 side path in the
same kernel (SURVEY.md §2.7 "north star" kernel).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from smoothquant_tpu.kernels.pack import PackedLinear, quantize_activations_packed
from smoothquant_tpu.kernels.quant_matmul import dual_path_matmul
from smoothquant_tpu.quant.config import QuantConfig


def real_quant_linear(
    packed: PackedLinear,
    x: jax.Array,
    cfg: QuantConfig,
    *,
    interpret: bool = False,
    out_dtype=None,
) -> jax.Array:
    """y = act_qdq(x) @ W_qdq^T + bias with true int-weight storage.

    x: (..., in_features).  Matches the simulated quant_linear numerics in
    the packed (static-permutation) domain.
    """
    meta = packed.meta
    shape = x.shape
    x2d = x.reshape(-1, shape[-1])
    x_perm = jnp.take(x2d, packed.perm, axis=-1)
    x_ns_q, x_sal = quantize_activations_packed(x_perm, meta, cfg)

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
    return y.reshape(*shape[:-1], meta.out_features)
