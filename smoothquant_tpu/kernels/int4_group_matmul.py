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
    # Mosaic, and gpt is a compile-time constant anyway.  The accumulator is
    # hoisted to a local — ONE out_ref read + ONE write per K-step instead of
    # a VMEM read-modify-write per group (the RMW chain was ~half the scale-
    # epilogue's VPU traffic; kernel_dissect: full 622 GB/s vs noepilogue 912)
    acc = out_ref[:]
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
        acc += ((p_lo - 8 * sum_lo).astype(jnp.float32)
                * xs_lo_ref[gg][:, None]
                * ws_lo_ref[gg][None, :].astype(jnp.float32))
        p_hi = jax.lax.dot_general(
            x_hi, w_hi[gg],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        acc += ((p_hi - 8 * sum_hi).astype(jnp.float32)
                * xs_hi_ref[gg][:, None]
                * ws_hi_ref[gg][None, :].astype(jnp.float32))
    out_ref[:] = acc


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
    # accumulator hoisted to a local (see _accum_halves)
    acc = out_ref[:]
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
        acc += ((p_lo - 8 * sum_lo).astype(jnp.float32)
                * xs_lo_ref[gg][:, None]
                * ws_lo_ref[0, gg][None, :].astype(jnp.float32))
        p_hi = jax.lax.dot_general(
            x_hi, w_hi[gg],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        acc += ((p_hi - 8 * sum_hi).astype(jnp.float32)
                * xs_hi_ref[gg][:, None]
                * ws_hi_ref[0, gg][None, :].astype(jnp.float32))
    out_ref[:] = acc


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


_SCALE_FLOOR = 1e-5  # matches quant.core.compute_scale / kernels.act_prep


def _pick_rawx_tiles(o: int, g_half: int, group_size: int,
                     tile_o: Optional[int] = None,
                     tile_g: Optional[int] = None) -> tuple[int, int]:
    """Shared O/G tile choice for the rawx kernel and the blocked-layout
    packer (kernel tiling and storage blocking must agree exactly)."""
    if tile_o is None:
        # large O-tiles everywhere: with the act quantize fused in-kernel
        # there is no act_prep kernel competing for VMEM/prefetch, and the
        # narrow-output shapes (o_proj 4096->4096 measured 428 GB/s with
        # 1 MB blocks) are DMA-issue-bound — fewer, larger weight DMAs win
        for cand in (2048, 1024, 512, 256, 128):
            if o % cand == 0:
                tile_o = cand
                break
    while o % tile_o:
        tile_o //= 2
    if tile_g is None:
        tile_g = 16 if g_half % 16 == 0 else 8
    while g_half % tile_g:
        tile_g //= 2
    while tile_g > 8 and tile_g * group_size * tile_o > 2 * 1024 * 1024:
        tile_g //= 2
    if tile_o < 128 or tile_g < 8:
        raise ValueError(
            f"stacked kernel needs tile-aligned shapes: O={o} g_half={g_half}"
            f" (pack with align_o/align_k_groups)")
    return tile_o, tile_g


def block_rawx_weights(w_qt: jax.Array, w_scales_t: jax.Array,
                       w_sal_t: jax.Array, group_size: int):
    """Re-store stacked rawx weights BLOCK-CONTIGUOUS.

    The (L, K/2, O) layout makes every kernel weight block a strided DMA:
    tile_g*gs rows of tile_o bytes at an O-byte stride (~23 MB of address
    span per 2 MB block at the bench's gate_up shape).  Measured on v5e
    (scripts/dma_layout_probe.py, L=32): 666 GB/s strided vs 747 GB/s
    block-contiguous for the identical bytes — and the strided penalty
    GROWS with stack depth (the round-3 bench lost ~17 us/layer on gate_up
    between 8- and 32-layer stacks).  Returns
      wp  (L, nK, nJ, tile_g, gs, tile_o)
      ws  (L, G/tile_g, nJ, tile_g, tile_o)
      sal (L, nJ, k_s, tile_o)
    with tiles chosen by _pick_rawx_tiles (identical to the kernel's)."""
    l_num, half, o = w_qt.shape
    g_half = half // group_size
    g_total = 2 * g_half
    assert w_scales_t.shape == (l_num, g_total, o)
    tile_o, tile_g = _pick_rawx_tiles(o, g_half, group_size)
    nk, nj = g_half // tile_g, o // tile_o
    wp = (w_qt.reshape(l_num, nk, tile_g, group_size, nj, tile_o)
          .transpose(0, 1, 4, 2, 3, 5))
    ws = (w_scales_t.reshape(l_num, g_total // tile_g, tile_g, nj, tile_o)
          .transpose(0, 1, 3, 2, 4))
    k_s = w_sal_t.shape[1]
    sal = (w_sal_t.reshape(l_num, k_s, nj, tile_o).transpose(0, 2, 1, 3)
           if k_s else w_sal_t.reshape(l_num, nj, k_s, tile_o))
    return wp, ws, sal


def _make_rawx_kernel(gpt: int, gs: int, qmax: float, k_ns_raw: int,
                      n_sal: int, k_s: int, half_ch: int, c: int, eps: float,
                      norm_kind, need_mask: bool, num_k: int,
                      sal_mode: str, interpret: bool,
                      blocked: bool = False, stacked_norm: bool = False):
    """Kernel factory for the fused act-quant int4 matmul (see
    int4_group_matmul_stacked_rawx).  Returns a kernel whose positional ref
    signature matches the operand list the wrapper builds (norm refs only
    when norm_kind, salient refs only when k_s).

    norm_kind: "rms" fuses a preceding RMSNorm (nw rows are the norm
    weight); "mask" multiplies activations by the nw rows WITHOUT the
    rsqrt — used by the identity weight layout, whose 0/1 mask zeroes the
    scattered salient (and pad) channels out of the int path; None = raw.
    sal_mode: "tail" = salient channels are the permuted tail of x_full;
    "external" = a pre-gathered (N, k_s) x_sal operand (identity layout);
    "select" = a (1, p_ch, k_s) one-hot selection block rides the weight
    stream and the salient slice is computed IN-KERNEL as one MXU dot
    (x_full @ S — exact, one term per output), replacing the XLA gather
    chain that cost ~7 us/layer in the decode scan.
    blocked: weight operands arrive in the block-contiguous layout of
    block_rawx_weights (extra leading singleton block dims)."""
    fuse_norm = norm_kind == "rms"

    def _wp(ref):
        return ref[0, 0, 0] if blocked else ref[0]

    def _wsal(ref):
        return ref[0, 0] if blocked else ref[0]

    def _wsrow(ref, gg):
        return ref[0, 0, 0, gg] if blocked else ref[0, gg]

    def _nwrow(ref):
        # stacked (L, 1, C) norm rows carry an extra unit dim (Mosaic's
        # last-two-dims block rule)
        return ref[0, 0] if stacked_norm else ref[0]

    def kernel(*refs):
        pos = 1  # refs[0] = scalar-prefetch layer idx (consumed by index maps)
        x_full_ref = refs[pos]; pos += 1
        x_lo_ref = refs[pos]; pos += 1
        x_hi_ref = refs[pos]; pos += 1
        if norm_kind:
            nw_full_ref = refs[pos]; pos += 1
            nw_lo_ref = refs[pos]; pos += 1
            nw_hi_ref = refs[pos]; pos += 1
        wp_ref = refs[pos]; pos += 1
        ws_lo_ref = refs[pos]; pos += 1
        ws_hi_ref = refs[pos]; pos += 1
        if k_s:
            w_sal_t_ref = refs[pos]; pos += 1
        if k_s and sal_mode == "external":
            x_sal_ref = refs[pos]; pos += 1
        if k_s and sal_mode == "select":
            sel_ref = refs[pos]; pos += 1
        out_ref = refs[pos]; pos += 1
        acc_ref = refs[pos]; pos += 1
        xq_ref = refs[pos]; pos += 1   # (2*gpt*num_k, tile_n, gs) int8
        sc_ref = refs[pos]; pos += 1   # (2*gpt*num_k, tile_n, 128) f32
        if k_s and sal_mode == "select":
            xsal_ref = refs[pos]; pos += 1   # (tile_n, k_s) f32 scratch
        r_ref = refs[pos] if fuse_norm else None

        j = pl.program_id(1)
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _init():
            if fuse_norm:

                @pl.when(j == 0)
                def _r():
                    xf = x_full_ref[:].astype(jnp.float32)
                    r_ref[:] = jnp.broadcast_to(
                        jax.lax.rsqrt(
                            jnp.sum(xf * xf, axis=1, keepdims=True) / c
                            + eps),
                        r_ref.shape)
            if k_s and n_sal and sal_mode == "select":

                @pl.when(j == 0)
                def _sel():
                    # exact gather as one MXU dot (one-hot columns)
                    xsal_ref[:] = jax.lax.dot_general(
                        x_full_ref[:], sel_ref[0].astype(x_full_ref.dtype),
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )

                acc_ref[:] = jax.lax.dot_general(
                    xsal_ref[:].astype(w_sal_t_ref.dtype),
                    _wsal(w_sal_t_ref),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            elif k_s and n_sal and sal_mode == "external":
                acc_ref[:] = jax.lax.dot_general(
                    x_sal_ref[:].astype(w_sal_t_ref.dtype),
                    _wsal(w_sal_t_ref),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            elif k_s and n_sal:
                sal = (x_full_ref[:, k_ns_raw:k_ns_raw + n_sal]
                       .astype(jnp.float32))
                if fuse_norm:
                    sal = (sal * r_ref[:, :1]
                           * _nwrow(nw_full_ref)[k_ns_raw:k_ns_raw + n_sal]
                           .astype(jnp.float32)[None, :])
                if k_s > n_sal:
                    sal = jnp.concatenate(
                        [sal, jnp.zeros((sal.shape[0], k_s - n_sal),
                                        jnp.float32)], axis=1)
                acc_ref[:] = jax.lax.dot_general(
                    sal.astype(w_sal_t_ref.dtype), _wsal(w_sal_t_ref),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            else:
                acc_ref[:] = jnp.zeros_like(acc_ref)

        # quantize each activation group ONCE per (i, k) — at j == 0 — and
        # cache (xq, scale) in VMEM scratch for the remaining O-tiles
        # (quantizing inside every j step was pure redundant VPU work)
        @pl.when(j == 0)
        def _quantize():
            r = r_ref[:, :1] if fuse_norm else None
            halves = ((x_lo_ref, nw_lo_ref if norm_kind else None, 0),
                      (x_hi_ref, nw_hi_ref if norm_kind else None, half_ch))
            for hi, (x_ref_, nw_ref_, base) in enumerate(halves):
                for gg in range(gpt):
                    y = (x_ref_[:, gg * gs:(gg + 1) * gs]
                         .astype(jnp.float32))
                    if fuse_norm:
                        y = (y * r
                             * _nwrow(nw_ref_)[gg * gs:(gg + 1) * gs]
                             .astype(jnp.float32)[None, :])
                    elif norm_kind == "mask":
                        y = (y * _nwrow(nw_ref_)[gg * gs:(gg + 1) * gs]
                             .astype(jnp.float32)[None, :])
                    if need_mask and (base or k_ns_raw < half_ch):
                        # zero the overlap with salient/pad cols
                        col = (base + k * gpt * gs + gg * gs
                               + jax.lax.broadcasted_iota(
                                   jnp.int32, y.shape, 1))
                        y = jnp.where(col < k_ns_raw, y, 0.0)
                    absmax = jnp.max(jnp.abs(y), axis=1, keepdims=True)
                    scale = jnp.maximum(absmax, _SCALE_FLOOR) / qmax
                    slot = (hi * num_k + k) * gpt + gg
                    xq_ref[slot] = jnp.round(y / scale).astype(jnp.int8)
                    sc_ref[slot] = jnp.broadcast_to(scale, sc_ref.shape[1:])

        w_lo, w_hi = _unpack_nibbles_biased(_wp(wp_ref), interpret)
        acc = acc_ref[:]
        for hi, (w_half, ws_ref_) in enumerate(((w_lo, ws_lo_ref),
                                                (w_hi, ws_hi_ref))):
            for gg in range(gpt):
                slot = (hi * num_k + k) * gpt + gg
                xq = xq_ref[slot]
                scale = sc_ref[slot][:, :1]
                s_x = jnp.sum(xq.astype(jnp.int32), axis=1, keepdims=True)
                p = jax.lax.dot_general(
                    xq, w_half[gg],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                acc += ((p - 8 * s_x).astype(jnp.float32) * scale
                        * _wsrow(ws_ref_, gg)[None, :].astype(jnp.float32))
        acc_ref[:] = acc

        @pl.when(k == num_k - 1)
        def _fin():
            out_ref[:] = acc.astype(out_ref.dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("group_size", "act_bits", "num_salient", "eps",
                     "out_dtype", "tile_o", "tile_g", "norm_kind",
                     "interpret"),
)
def int4_group_matmul_stacked_rawx(
    layer_idx: jax.Array,   # (1,) int32 — which layer's weights to stream
    x_raw: jax.Array,       # (N, C) fp — PRE-quant (and pre-norm when
    #                         norm_w given) activations in PERMUTED order:
    #                         [C - num_salient non-salient | salient] —
    #                         or ORIGINAL order for the identity layout
    #                         (norm_kind="mask" + x_sal)
    norm_w: Optional[jax.Array],  # (C,) fp row: RMSNorm weight
    #                         (norm_kind="rms") or 0/1 channel mask
    #                         (norm_kind="mask", identity layout)
    w_packed: jax.Array,    # (L, K_ns/2, O) int8 nibble-packed
    w_scales_t: jax.Array,  # (L, G, O) f32
    w_sal_t: jax.Array,     # (L, k_s, O) fp
    x_sal: Optional[jax.Array] = None,  # (N, k_s) pre-gathered salient
    #                         activations (identity layout only)
    sal_select: Optional[jax.Array] = None,  # (L, C, k_s) one-hot
    #                         selection — in-kernel salient gather-as-dot
    #                         (identity layout; excludes x_sal)
    *,
    group_size: int,
    act_bits: int,
    num_salient: int,
    eps: float = 0.0,
    out_dtype=jnp.float32,
    tile_o: Optional[int] = None,
    tile_g: Optional[int] = None,
    norm_kind: str = "rms",
    interpret: bool = False,
) -> jax.Array:
    """Fully-fused decode linear: (RMSNorm) + salient split + per-group
    activation quantize + nibble-unpack int4 matmul in ONE Pallas call.

    Replaces the act_prep kernel + the XLA slice/pad glue between it and
    int4_group_matmul_stacked — each Pallas launch on the tunneled v5e
    costs ~8-13 us of fixed overhead, and the decode scan paid it twice
    per linear.  Quantizing inside the matmul's K-loop also produces the
    per-token group scale in its natural sublane layout, so the epilogue's
    per-group scale broadcast needs no cross-lane relayout (the standalone
    kernel's (G, N) scale blocks did one per group).

    Quantization semantics are bit-identical to kernels.act_prep /
    quant.core.compute_scale: scale = max(absmax, 1e-5)/qmax in f32,
    round-to-nearest-even.  Zero padding columns quantize to zero with the
    floor scale.  Norm math matches act_prep.norm_quantize_acts_t (f32
    rsqrt(mean x² + eps), "rms" only).
    """
    n, c = x_raw.shape
    blocked = w_packed.ndim == 6
    if blocked:
        # block_rawx_weights layout: tiles are baked into the array shape —
        # caller-supplied tile overrides cannot take effect here, so reject
        # mismatches instead of silently ignoring them
        assert tile_g is None or tile_g == w_packed.shape[3], (
            f"blocked tree bakes tile_g={w_packed.shape[3]}; got {tile_g}")
        assert tile_o is None or tile_o == w_packed.shape[5], (
            f"blocked tree bakes tile_o={w_packed.shape[5]}; got {tile_o}")
        l_num, nkb, njb, tile_g, _gs, tile_o = w_packed.shape
        assert _gs == group_size
        half = nkb * tile_g * group_size
        o = njb * tile_o
        kk = 2 * half
        g_total = kk // group_size
        g_half = g_total // 2
        assert w_scales_t.shape == (l_num, g_total // tile_g, njb, tile_g,
                                    tile_o)
        k_s = w_sal_t.shape[2]
    else:
        l_num, half, o = w_packed.shape
        kk = 2 * half
        g_total = kk // group_size
        g_half = g_total // 2
        assert w_scales_t.shape == (l_num, g_total, o)
        k_s = w_sal_t.shape[1]
        tile_o, tile_g = _pick_rawx_tiles(o, g_half, group_size, tile_o,
                                          tile_g)
    k_ns_raw = c - num_salient
    assert kk >= k_ns_raw and k_s >= num_salient

    bs = tile_g * group_size          # channels per x block
    assert half % bs == 0, "g_half % tile_g == 0 guarantees this"
    p_ch = _ceil_to(max(c, kk), bs)   # padded x width
    tile_n = _ceil_to(max(n, 8), 8) if n <= 128 else 128
    n_pad = _ceil_to(n, tile_n)
    if (n_pad, p_ch) != (n, c):
        x_raw = jnp.pad(x_raw, ((0, n_pad - n), (0, p_ch - c)))

    nk = norm_kind if norm_w is not None else None
    stacked_norm = nk is not None and norm_w.ndim in (2, 3)
    if nk is not None:
        # (L, C) stacked norm rows: the layer's row is selected by the
        # scalar-prefetch index map INSIDE the kernel streams — the XLA
        # dynamic-slice per layer (3 ops/layer of decode-scan glue) vanishes.
        # Stored (L, 1, C): Mosaic's block rule needs the last-two block
        # dims (1, C) to equal the array's trailing dims
        if stacked_norm and norm_w.ndim == 3:
            # (L, 1, C) — pass pre-reshaped from OUTSIDE the scan body, or
            # XLA relayout-copies the whole stack per layer call
            nw = jnp.pad(norm_w.astype(x_raw.dtype),
                         ((0, 0), (0, 0), (0, p_ch - c)))
        else:
            nw = norm_w if stacked_norm else norm_w.reshape(1, -1)
            nw = jnp.pad(nw.astype(x_raw.dtype), ((0, 0), (0, p_ch - c)))
            if stacked_norm:
                nw = nw.reshape(nw.shape[0], 1, p_ch)
    assert x_sal is None or sal_select is None
    sal_mode = ("select" if sal_select is not None
                else "external" if x_sal is not None else "tail")
    sal_external = sal_mode != "tail"
    if sal_mode == "external" and k_s:
        assert x_sal.shape[1] == k_s
        if x_sal.shape[0] != n_pad:
            x_sal = jnp.pad(x_sal, ((0, n_pad - x_sal.shape[0]), (0, 0)))
    if sal_mode == "select" and k_s:
        assert sal_select.shape[0] == l_num and sal_select.shape[2] == k_s
        if sal_select.shape[1] != p_ch:
            sal_select = jnp.pad(
                sal_select, ((0, 0), (0, p_ch - sal_select.shape[1]), (0, 0)))
        assert n_pad == tile_n, "select mode is decode-only (single N tile)"

    wp4 = (w_packed if blocked
           else w_packed.reshape(l_num, g_half, group_size, o))
    grid = (n_pad // tile_n, o // tile_o, g_half // tile_g)
    gh = g_half // tile_g
    # identity layout (sal_external): scattered salient/pad channels are
    # zeroed by the mask row, not by the tail-column comparison
    need_mask = kk > k_ns_raw and not sal_external

    in_specs = [
        pl.BlockSpec((tile_n, p_ch), lambda i, j, k, s: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_n, bs), lambda i, j, k, s: (i, k),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_n, bs), lambda i, j, k, s, gh=gh: (i, k + gh),
                     memory_space=pltpu.VMEM),
    ]
    operands = [x_raw, x_raw, x_raw]
    if nk is not None:
        if stacked_norm:
            in_specs += [
                pl.BlockSpec((1, 1, p_ch), lambda i, j, k, s: (s[0], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, bs), lambda i, j, k, s: (s[0], 0, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, bs),
                             lambda i, j, k, s, gh=gh: (s[0], 0, k + gh),
                             memory_space=pltpu.VMEM),
            ]
        else:
            in_specs += [
                pl.BlockSpec((1, p_ch), lambda i, j, k, s: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bs), lambda i, j, k, s: (0, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bs), lambda i, j, k, s, gh=gh: (0, k + gh),
                             memory_space=pltpu.VMEM),
            ]
        operands += [nw, nw, nw]
    if blocked:
        in_specs += [
            pl.BlockSpec((1, 1, 1, tile_g, group_size, tile_o),
                         lambda i, j, k, s: (s[0], k, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, tile_g, tile_o),
                         lambda i, j, k, s: (s[0], k, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, tile_g, tile_o),
                         lambda i, j, k, s, gh=gh: (s[0], k + gh, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
    else:
        in_specs += [
            pl.BlockSpec((1, tile_g, group_size, tile_o),
                         lambda i, j, k, s: (s[0], k, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_g, tile_o),
                         lambda i, j, k, s: (s[0], k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_g, tile_o),
                         lambda i, j, k, s, gh=gh: (s[0], k + gh, j),
                         memory_space=pltpu.VMEM),
        ]
    operands += [wp4, w_scales_t, w_scales_t]
    if k_s:
        in_specs.append(
            pl.BlockSpec((1, 1, k_s, tile_o),
                         lambda i, j, k, s: (s[0], j, 0, 0),
                         memory_space=pltpu.VMEM)
            if blocked else
            pl.BlockSpec((1, k_s, tile_o), lambda i, j, k, s: (s[0], 0, j),
                         memory_space=pltpu.VMEM))
        operands.append(w_sal_t)
    if k_s and sal_mode == "external":
        in_specs.append(
            pl.BlockSpec((tile_n, k_s), lambda i, j, k, s: (i, 0),
                         memory_space=pltpu.VMEM))
        operands.append(x_sal)
    if k_s and sal_mode == "select":
        in_specs.append(
            pl.BlockSpec((1, p_ch, k_s), lambda i, j, k, s: (s[0], 0, 0),
                         memory_space=pltpu.VMEM))
        operands.append(sal_select)

    scratch = [
        pltpu.VMEM((tile_n, tile_o), jnp.float32),           # acc
        pltpu.VMEM((g_total, tile_n, group_size), jnp.int8),  # xq cache
        pltpu.VMEM((g_total, tile_n, 128), jnp.float32),      # scale cache
    ]
    if k_s and sal_mode == "select":
        scratch.append(pltpu.VMEM((tile_n, k_s), jnp.float32))
    if nk == "rms":
        scratch.append(pltpu.VMEM((tile_n, 128), jnp.float32))

    kernel = _make_rawx_kernel(
        gpt=tile_g, gs=group_size, qmax=float(2 ** (act_bits - 1) - 1),
        k_ns_raw=k_ns_raw, n_sal=num_salient, k_s=k_s, half_ch=half, c=c,
        eps=eps, norm_kind=nk, need_mask=need_mask, num_k=gh,
        sal_mode=sal_mode, interpret=interpret, blocked=blocked,
        stacked_norm=stacked_norm)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((tile_n, tile_o),
                                   lambda i, j, k, s: (i, j),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, o), jnp.dtype(out_dtype)),
        compiler_params=pltpu.CompilerParams(
            # j carries the quantize cache in scratch (written at j == 0,
            # read by later O-tiles) — it must stay sequential
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * o * (kk + k_s),
            bytes_accessed=(n_pad * p_ch * 2 + o * half
                            + o * g_total * 4 + o * k_s * 2
                            + n_pad * o * 2),
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(layer_idx, jnp.int32).reshape(1), *operands)

    return out[:n]


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
    assert w_packed.ndim == 3, (
        "block_decode_tree (blocked) weights support only the rawx decode "
        "path; run prefill through the promoted-int8 tree")
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
            # prefill-size N-tiles exceed the 16 MB scoped-vmem default;
            # v5e has 128 MB VMEM
            vmem_limit_bytes=100 * 1024 * 1024,
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
            # prefill-size N-tiles exceed the 16 MB scoped-vmem default;
            # v5e has 128 MB VMEM
            vmem_limit_bytes=100 * 1024 * 1024,
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
