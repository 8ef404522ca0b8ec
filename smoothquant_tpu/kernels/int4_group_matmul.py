"""True-int4 (nibble-packed) group matmul — 4 bits/weight in HBM.

Same math as int_group_matmul (int8×int8→int32 MXU per group, output-side
scale factorization), but the weight rides HBM packed two-per-byte in the
split-half layout produced by utils/native.pack_nibbles_split: packed byte
row r of (K/2, O) holds channel r in the low nibble and channel r + K/2 in
the high nibble, so the two unpacked halves are contiguous channel ranges
[0, K/2) and [K/2, K).

Each grid K-step loads one packed byte-group block and the *two* matching
activation/scale blocks (the same array bound twice with different index
maps — lo at group g, hi at group g + G/2).  Nibbles are sign-extended in
int32 (shift up, arithmetic shift down) and fed to the MXU as int8.

Constraint: (K/2) % group_size == 0 so groups never straddle the halves.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _unpack_nibbles_biased(packed: jax.Array,
                           interpret: bool) -> tuple[jax.Array, jax.Array]:
    """int8 packed bytes → (lo_u, hi_u) int8 BIASED nibbles (true value + 8).

    Compiled path: bitcast 4 sublane-adjacent bytes into one int32 lane and
    mask both nibble sets with TWO ops per 32-bit word — ~0.4 VPU ops per
    weight element instead of ~3.5 for per-element sign extension, which was
    the decode bottleneck (unpack serialized against the MXU).  The byte→
    lane packing order is irrelevant because the reverse bitcast restores
    it; the shift's cross-byte leakage lands in masked-out bit positions.
    The +8 bias is removed on the int32 accumulator (-8·Σx per group), not
    per element.
    """
    if interpret:  # interpreter has no tiled layout to bitcast against
        w32 = packed.astype(jnp.int32)
        lo_u = (w32 & 0xF).astype(jnp.int8)
        hi_u = (jnp.right_shift(w32, 4) & 0xF).astype(jnp.int8)
        return lo_u, hi_u
    w32v = pltpu.bitcast(packed, jnp.int32)
    mask = jnp.int32(0x0F0F0F0F)
    lo_u = pltpu.bitcast(w32v & mask, jnp.int8)
    hi_u = pltpu.bitcast(jnp.right_shift(w32v, 4) & mask, jnp.int8)
    return lo_u, hi_u


def _accum_halves(x_lo_ref, x_hi_ref, xs_lo_ref, xs_hi_ref, wp_ref,
                  ws_lo_ref, ws_hi_ref, out_ref, gpt: int, interpret: bool):
    w_lo, w_hi = _unpack_nibbles_biased(wp_ref[:], interpret)  # (gpt, gs, TO)

    # static Python loop: values (w_lo/w_hi) can't be dynamically indexed in
    # Mosaic, and gpt is a compile-time constant anyway
    for gg in range(gpt):
        x_lo = x_lo_ref[gg]
        x_hi = x_hi_ref[gg]
        sum_lo = jnp.sum(x_lo.astype(jnp.int32), axis=1, keepdims=True)
        sum_hi = jnp.sum(x_hi.astype(jnp.int32), axis=1, keepdims=True)
        p_lo = jax.lax.dot_general(
            x_lo, w_lo[gg],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        out_ref[:] += ((p_lo - 8 * sum_lo).astype(jnp.float32)
                       * xs_lo_ref[gg][:, None] * ws_lo_ref[gg][None, :])
        p_hi = jax.lax.dot_general(
            x_hi, w_hi[gg],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        out_ref[:] += ((p_hi - 8 * sum_hi).astype(jnp.float32)
                       * xs_hi_ref[gg][:, None] * ws_hi_ref[gg][None, :])


def _kernel(x_lo_ref, x_hi_ref, xs_lo_ref, xs_hi_ref, wp_ref,
            ws_lo_ref, ws_hi_ref, x_sal_ref, w_sal_t_ref, out_ref, *,
            gpt: int, interpret: bool):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        out_ref[:] = jax.lax.dot_general(
            x_sal_ref[:], w_sal_t_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    _accum_halves(x_lo_ref, x_hi_ref, xs_lo_ref, xs_hi_ref, wp_ref,
                  ws_lo_ref, ws_hi_ref, out_ref, gpt, interpret)


def _kernel_nosal(x_lo_ref, x_hi_ref, xs_lo_ref, xs_hi_ref, wp_ref,
                  ws_lo_ref, ws_hi_ref, out_ref, *, gpt: int, interpret: bool):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    _accum_halves(x_lo_ref, x_hi_ref, xs_lo_ref, xs_hi_ref, wp_ref,
                  ws_lo_ref, ws_hi_ref, out_ref, gpt, interpret)


def _accum_halves_stacked(x_lo_ref, x_hi_ref, xs_lo_ref, xs_hi_ref, wp_ref,
                          ws_lo_ref, ws_hi_ref, out_ref, gpt: int,
                          interpret: bool):
    w_lo, w_hi = _unpack_nibbles_biased(wp_ref[0], interpret)  # (gpt, gs, TO)
    for gg in range(gpt):
        x_lo = x_lo_ref[gg]
        x_hi = x_hi_ref[gg]
        sum_lo = jnp.sum(x_lo.astype(jnp.int32), axis=1, keepdims=True)
        sum_hi = jnp.sum(x_hi.astype(jnp.int32), axis=1, keepdims=True)
        p_lo = jax.lax.dot_general(
            x_lo, w_lo[gg],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        out_ref[:] += ((p_lo - 8 * sum_lo).astype(jnp.float32)
                       * xs_lo_ref[gg][:, None] * ws_lo_ref[0, gg][None, :])
        p_hi = jax.lax.dot_general(
            x_hi, w_hi[gg],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        out_ref[:] += ((p_hi - 8 * sum_hi).astype(jnp.float32)
                       * xs_hi_ref[gg][:, None] * ws_hi_ref[0, gg][None, :])


def _kernel_stacked(idx_ref, x_lo_ref, x_hi_ref, xs_lo_ref, xs_hi_ref,
                    wp_ref, ws_lo_ref, ws_hi_ref, x_sal_ref, w_sal_t_ref,
                    out_ref, *, gpt: int, interpret: bool):
    del idx_ref  # consumed by the index maps
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        out_ref[:] = jax.lax.dot_general(
            x_sal_ref[:], w_sal_t_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    _accum_halves_stacked(x_lo_ref, x_hi_ref, xs_lo_ref, xs_hi_ref, wp_ref,
                          ws_lo_ref, ws_hi_ref, out_ref, gpt, interpret)


def _kernel_stacked_nosal(idx_ref, x_lo_ref, x_hi_ref, xs_lo_ref, xs_hi_ref,
                          wp_ref, ws_lo_ref, ws_hi_ref, out_ref, *,
                          gpt: int, interpret: bool):
    del idx_ref
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    _accum_halves_stacked(x_lo_ref, x_hi_ref, xs_lo_ref, xs_hi_ref, wp_ref,
                          ws_lo_ref, ws_hi_ref, out_ref, gpt, interpret)


@functools.partial(
    jax.jit,
    static_argnames=("group_size", "out_dtype", "tile_o", "tile_g",
                     "interpret", "pre_laid"),
)
def int4_group_matmul_stacked(
    layer_idx: jax.Array,  # (1,) int32 — which layer's weights to stream
    x_q: jax.Array,        # (N, K) int8 — this layer's quantized activations
    x_scales: jax.Array,   # (N, G) f32
    w_packed: jax.Array,   # (L, K/2, O) int8 — ALL layers, nibble-packed
    w_scales_t: jax.Array, # (L, G, O) f32
    x_sal: jax.Array,      # (N, K_s) fp
    w_sal_t: jax.Array,    # (L, K_s, O) fp
    *,
    group_size: int,
    out_dtype=jnp.float32,
    tile_o: Optional[int] = None,
    tile_g: Optional[int] = None,
    interpret: bool = False,
    pre_laid: Optional[int] = None,
) -> jax.Array:
    """Layer-stacked variant for lax.scan decode: the FULL (L, ...) weight
    arrays are passed untouched (loop-invariant — no per-iteration slice
    copy, which cost ~2x decode throughput) and the kernel's index maps
    select layer `layer_idx` via scalar prefetch, so only that layer's
    blocks ever move HBM→VMEM.

    Shapes must be tile-aligned at pack time (pack_linear align_k_groups /
    align_o) — in-jit padding of a stacked weight would copy it every step.

    pre_laid: when set (to the true token count N), x_q/x_scales already
    carry the kernel layout — x_q (G, N_pad, gs) int8, x_scales (G, N_pad)
    f32, as produced by kernels.act_prep.quantize_acts_grouped_t — skipping
    the XLA-side pad/reshape/transpose chain.
    """
    if pre_laid is not None:
        n = pre_laid
        g_total, n_pad, _gs = x_q.shape
        assert _gs == group_size and x_scales.shape == (g_total, n_pad)
        kk = g_total * group_size
    else:
        n, kk = x_q.shape
        g_total = kk // group_size
        assert x_scales.shape == (n, g_total)
    l_num, half, o = w_packed.shape
    k_s = x_sal.shape[1]
    g_half = g_total // 2
    assert kk == 2 * half and half % group_size == 0
    assert w_scales_t.shape == (l_num, g_total, o)

    if tile_o is None:
        # largest standard tile that divides O: per-step weight DMAs under
        # ~512 KB go DMA-issue-latency bound, but oversized blocks crowd
        # VMEM (~16 MB/core) and starve XLA's cross-op prefetch buffers —
        # 2048 only pays off on wide outputs (pack with align_o=2048 so
        # they keep it)
        cands = (2048, 1024, 512, 256, 128) if o >= 8192 else (1024, 512,
                                                               256, 128)
        for cand in cands:
            if o % cand == 0:
                tile_o = cand
                break
    while o % tile_o:
        tile_o //= 2
    if tile_g is None:
        tile_g = 16 if g_half % 16 == 0 else 8
    while g_half % tile_g:
        tile_g //= 2
    # cap the weight block at ~2 MB so double-buffering stays comfortable
    while tile_g > 8 and tile_g * group_size * tile_o > 2 * 1024 * 1024:
        tile_g //= 2
    if tile_o < 128 or tile_g < 8:
        raise ValueError(
            f"stacked kernel needs tile-aligned shapes: O={o} g_half={g_half}"
            f" (pack with align_o/align_k_groups)")

    if pre_laid is not None:
        n_pad = x_q.shape[1]
        tile_n = n_pad if n_pad <= 128 else 128
        if x_sal.shape[0] != n_pad:
            x_sal = jnp.pad(x_sal, ((0, n_pad - x_sal.shape[0]), (0, 0)))
        x3, xs_t = x_q, x_scales
    else:
        tile_n = _ceil_to(max(n, 8), 8) if n <= 128 else 128
        n_pad = _ceil_to(n, tile_n)
        if n_pad != n:
            x_q = jnp.pad(x_q, ((0, n_pad - n), (0, 0)))
            x_scales = jnp.pad(x_scales, ((0, n_pad - n), (0, 0)))
            x_sal = jnp.pad(x_sal, ((0, n_pad - n), (0, 0)))
        x3 = x_q.reshape(n_pad, g_total, group_size).transpose(1, 0, 2)
        xs_t = x_scales.T
    wp4 = w_packed.reshape(l_num, g_half, group_size, o)

    grid = (n_pad // tile_n, o // tile_o, g_half // tile_g)
    gh = g_half // tile_g

    in_specs = [
        pl.BlockSpec((tile_g, tile_n, group_size),
                     lambda i, j, k, s: (k, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_g, tile_n, group_size),
                     lambda i, j, k, s, gh=gh: (k + gh, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_g, tile_n), lambda i, j, k, s: (k, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_g, tile_n), lambda i, j, k, s, gh=gh: (k + gh, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_g, group_size, tile_o),
                     lambda i, j, k, s: (s[0], k, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_g, tile_o), lambda i, j, k, s: (s[0], k, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_g, tile_o),
                     lambda i, j, k, s, gh=gh: (s[0], k + gh, j),
                     memory_space=pltpu.VMEM),
    ]
    operands = [x3, x3, xs_t, xs_t, wp4, w_scales_t, w_scales_t]
    if k_s:
        kernel = functools.partial(_kernel_stacked, gpt=tile_g,
                                   interpret=interpret)
        in_specs += [
            pl.BlockSpec((tile_n, k_s), lambda i, j, k, s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_s, tile_o), lambda i, j, k, s: (s[0], 0, j),
                         memory_space=pltpu.VMEM),
        ]
        operands += [x_sal, w_sal_t]
    else:
        kernel = functools.partial(_kernel_stacked_nosal, gpt=tile_g,
                                   interpret=interpret)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((tile_n, tile_o),
                                   lambda i, j, k, s: (i, j),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, o), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * o * (kk + k_s),
            bytes_accessed=(n_pad * kk + o * half
                            + (n_pad + o) * g_total * 4
                            + (n_pad + o) * k_s * 2 + n_pad * o * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(layer_idx, jnp.int32).reshape(1), *operands)

    return out[:n].astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("group_size", "out_dtype", "tile_o", "tile_g", "interpret"),
)
def int4_group_matmul(
    x_q: jax.Array,        # (N, K) int8 — integer-quantized activations
    x_scales: jax.Array,   # (N, G) f32
    w_packed: jax.Array,   # (K/2, O) int8 — split-half nibble-packed weights
    w_scales_t: jax.Array, # (G, O) f32
    x_sal: jax.Array,      # (N, K_s) fp salient slice
    w_sal_t: jax.Array,    # (K_s, O) fp
    *,
    group_size: int,
    out_dtype=jnp.float32,
    tile_o: Optional[int] = None,
    tile_g: Optional[int] = None,  # byte-groups per step (processes 2x groups)
    interpret: bool = False,
) -> jax.Array:
    n, kk = x_q.shape
    o = w_packed.shape[1]
    k_s = x_sal.shape[1]
    g_total = kk // group_size
    half = kk // 2
    assert kk % 2 == 0 and half % group_size == 0, (
        "nibble packing needs (K/2) % group_size == 0"
    )
    # decode-shape-tuned defaults (scripts/kernelbench.py int4_tiles on v5e):
    # wide outputs amortize per-step overheads with big O-tiles and deep
    # K-steps; narrow outputs need more grid steps for DMA/compute overlap
    if tile_o is None:
        tile_o = 2048 if o >= 8192 else 512
    if tile_g is None:
        tile_g = 16 if (o >= 8192 or g_total // 2 >= 48) else 8
    assert w_packed.shape == (half, o)
    assert x_scales.shape == (n, g_total)
    assert w_scales_t.shape == (g_total, o)
    g_half = g_total // 2

    tile_n = _ceil_to(max(n, 8), 8) if n <= 128 else 128
    n_pad = _ceil_to(n, tile_n)
    o_pad = _ceil_to(o, min(tile_o, _ceil_to(o, 128)))
    tile_o = min(tile_o, o_pad)
    # Mosaic sublane rule: the 2-D scale blocks' leading dim (tile_g) must be
    # 8-divisible (it is never the full axis — the arrays hold BOTH halves,
    # 2*g_half rows).  Pad each half up to whole 8-group tiles.
    tile_g = _ceil_to(min(tile_g, g_half), 8)
    g_half_pad = _ceil_to(g_half, tile_g)

    if n_pad != n:
        x_q = jnp.pad(x_q, ((0, n_pad - n), (0, 0)))
        x_scales = jnp.pad(x_scales, ((0, n_pad - n), (0, 0)))
        x_sal = jnp.pad(x_sal, ((0, n_pad - n), (0, 0)))
    if g_half_pad != g_half:
        pad_ch = (g_half_pad - g_half) * group_size
        # pad each half independently to keep the split-half invariant
        x_lo_part = jnp.pad(x_q[:, :half], ((0, 0), (0, pad_ch)))
        x_hi_part = jnp.pad(x_q[:, half:], ((0, 0), (0, pad_ch)))
        x_q = jnp.concatenate([x_lo_part, x_hi_part], axis=1)
        xs_lo = jnp.pad(x_scales[:, :g_half], ((0, 0), (0, g_half_pad - g_half)))
        xs_hi = jnp.pad(x_scales[:, g_half:], ((0, 0), (0, g_half_pad - g_half)))
        x_scales = jnp.concatenate([xs_lo, xs_hi], axis=1)
        w_packed = jnp.pad(w_packed, ((0, pad_ch), (0, 0)))
        ws_lo = jnp.pad(w_scales_t[:g_half], ((0, g_half_pad - g_half), (0, 0)))
        ws_hi = jnp.pad(w_scales_t[g_half:], ((0, g_half_pad - g_half), (0, 0)))
        w_scales_t = jnp.concatenate([ws_lo, ws_hi], axis=0)
        half = half + pad_ch
        g_half = g_half_pad
        g_total = 2 * g_half
        kk = 2 * half
    if o_pad != o:
        w_packed = jnp.pad(w_packed, ((0, 0), (0, o_pad - o)))
        w_scales_t = jnp.pad(w_scales_t, ((0, 0), (0, o_pad - o)))
        w_sal_t = jnp.pad(w_sal_t, ((0, 0), (0, o_pad - o)))

    x3 = x_q.reshape(n_pad, g_total, group_size).transpose(1, 0, 2)  # (G, N, gs)
    wp3 = w_packed.reshape(g_half, group_size, o_pad)                # (G/2, gs, O)
    xs_t = x_scales.T                                                # (G, N)

    grid = (n_pad // tile_n, o_pad // tile_o, g_half // tile_g)

    in_specs = [
        pl.BlockSpec((tile_g, tile_n, group_size), lambda i, j, k: (k, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_g, tile_n, group_size),
                     lambda i, j, k, gh=g_half // tile_g: (k + gh, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_g, tile_n), lambda i, j, k: (k, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_g, tile_n),
                     lambda i, j, k, gh=g_half // tile_g: (k + gh, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_g, group_size, tile_o), lambda i, j, k: (k, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_g, tile_o), lambda i, j, k: (k, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_g, tile_o),
                     lambda i, j, k, gh=g_half // tile_g: (k + gh, j),
                     memory_space=pltpu.VMEM),
    ]
    operands = [x3, x3, xs_t, xs_t, wp3, w_scales_t, w_scales_t]
    if k_s:  # salient dual path present
        kernel = functools.partial(_kernel, gpt=tile_g, interpret=interpret)
        in_specs += [
            pl.BlockSpec((tile_n, k_s), lambda i, j, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_s, tile_o), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ]
        operands += [x_sal, w_sal_t]
    else:
        kernel = functools.partial(_kernel_nosal, gpt=tile_g,
                                   interpret=interpret)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile_n, tile_o), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, o_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * o_pad * (kk + k_s),
            bytes_accessed=(n_pad * kk + o_pad * kk // 2
                            + (n_pad + o_pad) * g_total * 4
                            + (n_pad + o_pad) * k_s * 2 + n_pad * o_pad * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)

    return out[:n, :o].astype(out_dtype)
