"""Fused activation quantize+layout for the int-compute decode path.

The XLA lowering of per-group activation quantization is a serialized chain
of ~13 tiny VPU ops (abs, reshape, reduce, clamp, divide, round, cast, pad,
transpose, bitcast ...) costing ~12 us per linear call inside the decode
scan — pure fixed-overhead, the tensors are a few hundred KB.  This kernel
does the whole chain in ONE Pallas call and emits directly the layout the
stacked int4/int8 group-matmul consumes: x3 (G, N_pad, gs) int8 and
xs_t (G, N_pad) f32 (what int4_group_matmul_stacked previously built with
an extra transpose).

Numerics are bit-identical to quant.core.compute_scale + round:
scale = max(absmax, 1e-5)/qmax in f32, round-to-nearest-even, signed clip
implicit (values are within ±qmax by construction of absmax).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SCALE_FLOOR = 1e-5


def _kernel(x_ref, xq_ref, xs_ref, *, gg: int, gs: int, qmax: float):
    for j in range(gg):
        blk = x_ref[:, j * gs:(j + 1) * gs].astype(jnp.float32)  # (N, gs)
        absmax = jnp.max(jnp.abs(blk), axis=1, keepdims=True)    # (N, 1)
        scale = jnp.maximum(absmax, _SCALE_FLOOR) / qmax
        xq_ref[j] = jnp.round(blk / scale).astype(jnp.int8)
        xs_ref[j] = scale[:, 0]


@functools.partial(jax.jit,
                   static_argnames=("group_size", "act_bits", "interpret"))
def quantize_acts_grouped_t(
    x_ns: jax.Array,        # (N, k_ns) fp — zero-padded non-salient slice
    *,
    group_size: int,
    act_bits: int,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Returns (x3 (G, N_pad, gs) int8, xs_t (G, N_pad) f32), N padded to 8.

    Zero rows/groups quantize to 0 with the floor scale — exactly what the
    XLA chain produced for padding."""
    n, k_ns = x_ns.shape
    gs = group_size
    assert k_ns % gs == 0
    g = k_ns // gs
    n_pad = max(8, -(-n // 8) * 8)
    if n_pad != n:
        x_ns = jnp.pad(x_ns, ((0, n_pad - n), (0, 0)))
    qmax = float(2 ** (act_bits - 1) - 1)

    gg = 1
    for cand in (16, 8, 4, 2):
        if g % cand == 0:
            gg = cand
            break

    xq, xs = pl.pallas_call(
        functools.partial(_kernel, gg=gg, gs=gs, qmax=qmax),
        grid=(g // gg,),
        in_specs=[pl.BlockSpec((n_pad, gg * gs), lambda kb: (0, kb),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((gg, n_pad, gs), lambda kb: (kb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gg, n_pad), lambda kb: (kb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g, n_pad, gs), jnp.int8),
            jax.ShapeDtypeStruct((g, n_pad), jnp.float32),
        ],
        interpret=interpret,
    )(x_ns)
    return xq, xs


def _norm_kernel(x_full_ref, x_blk_ref, w_full_ref, w_blk_ref,
                 xq_ref, xs_ref, sal_ref, *, gg: int, gs: int, qmax: float,
                 c: int, k_ns_raw: int, n_sal: int, k_s: int, eps: float,
                 norm_kind: str):
    kb = pl.program_id(0)
    xf = x_full_ref[:].astype(jnp.float32)                   # (N, P)
    if norm_kind == "rms":
        r = jax.lax.rsqrt(jnp.sum(xf * xf, axis=1, keepdims=True) / c + eps)
    else:
        r = jnp.ones_like(xf[:, :1])
    base0 = kb * gg * gs

    for j in range(gg):
        blk = x_blk_ref[:, j * gs:(j + 1) * gs].astype(jnp.float32)
        w = w_blk_ref[0, j * gs:(j + 1) * gs].astype(jnp.float32)
        y = blk * r * w[None, :]
        # zero the k_ns zero-padding region (cols >= k_ns_raw)
        col = base0 + j * gs + jax.lax.broadcasted_iota(
            jnp.int32, y.shape, 1)
        y = jnp.where(col < k_ns_raw, y, 0.0)
        absmax = jnp.max(jnp.abs(y), axis=1, keepdims=True)
        scale = jnp.maximum(absmax, _SCALE_FLOOR) / qmax
        xq_ref[j] = jnp.round(y / scale).astype(jnp.int8)
        xs_ref[j] = scale[:, 0]

    if k_s:
        @pl.when(kb == 0)
        def _():
            sal = (x_full_ref[:, k_ns_raw:k_ns_raw + n_sal]
                   .astype(jnp.float32) * r
                   * w_full_ref[0, k_ns_raw:k_ns_raw + n_sal]
                   .astype(jnp.float32))
            n = sal.shape[0]
            pad = jnp.zeros((n, k_s - n_sal), jnp.float32)
            sal_ref[:] = jnp.concatenate([sal, pad],
                                         axis=1).astype(sal_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "group_size", "act_bits", "k_ns", "num_salient", "k_s", "eps",
    "norm_kind", "sal_dtype", "interpret"))
def norm_quantize_acts_t(
    x_perm: jax.Array,      # (N, C) fp — PRE-norm residual, permuted order
    norm_w: jax.Array,      # (C,) — norm weight in the same order
    *,
    group_size: int,
    act_bits: int,
    k_ns: int,
    num_salient: int,
    k_s: int,
    eps: float,
    norm_kind: str = "rms",
    sal_dtype=jnp.bfloat16,
    interpret: bool = False,
):
    """RMSNorm + salient split + per-group quantize + kernel layout in ONE
    Pallas call — the full XLA chain (norm fusions, slice/pad, ~13 quantize
    ops) was ~20 us/linear of serialized tiny ops in the decode scan.

    Returns (x3 (G, N_pad, gs) int8, xs_t (G, N_pad) f32,
    x_sal (N_pad, k_s) sal_dtype).  Norm math in f32 (x.astype(f32) *
    rsqrt(mean(x²)+eps) * w), matching models.common.rms_norm up to its
    output-dtype rounding (which the fused path skips — strictly more
    precise in bf16 models)."""
    n, c = x_perm.shape
    gs = group_size
    g = k_ns // gs
    k_ns_raw = c - num_salient
    n_pad = max(8, -(-n // 8) * 8)
    p = max(c, k_ns)
    x_pad = jnp.pad(x_perm, ((0, n_pad - n), (0, p - c)))
    w_pad = jnp.pad(norm_w.reshape(1, -1), ((0, 0), (0, p - c)))
    qmax = float(2 ** (act_bits - 1) - 1)

    gg = 1
    for cand in (16, 8, 4, 2):
        if g % cand == 0:
            gg = cand
            break

    kern = functools.partial(
        _norm_kernel, gg=gg, gs=gs, qmax=qmax, c=c, k_ns_raw=k_ns_raw,
        n_sal=num_salient, k_s=k_s, eps=eps, norm_kind=norm_kind)
    out_shapes = [
        jax.ShapeDtypeStruct((g, n_pad, gs), jnp.int8),
        jax.ShapeDtypeStruct((g, n_pad), jnp.float32),
        jax.ShapeDtypeStruct((n_pad, max(k_s, 128)), sal_dtype),
    ]
    out_specs = [
        pl.BlockSpec((gg, n_pad, gs), lambda kb: (kb, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((gg, n_pad), lambda kb: (kb, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n_pad, max(k_s, 128)), lambda kb: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    xq, xs, sal = pl.pallas_call(
        kern,
        grid=(g // gg,),
        in_specs=[
            pl.BlockSpec((n_pad, p), lambda kb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, gg * gs), lambda kb: (0, kb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p), lambda kb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gg * gs), lambda kb: (0, kb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(x_pad, x_pad, w_pad, w_pad)
    return xq, xs, sal[:, :k_s] if k_s else sal[:, :0]
