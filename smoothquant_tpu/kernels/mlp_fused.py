"""Fused SwiGLU-MLP decode megakernel — (RMSNorm) + gate_up int4 matmul +
SwiGLU + activation re-quantize + down_proj int4 matmul in ONE Pallas call.

The decode scan previously launched two fully-fused linears per MLP
(int4_group_matmul_stacked_rawx for gate_up and for down_proj) with an XLA
silu*up between them.  Each extra Pallas launch on the tunneled v5e costs
~8-13 us fixed overhead PLUS a pipeline-fill bubble while the next kernel's
first weight blocks DMA in (scripts/scan_floor_probe.py measured the four
per-layer matmul kernels at 221 us standalone vs ~290 us chained — the
delta is launch/fill, not compute).  This kernel runs both matmuls on ONE
flattened sequential grid, so the down_proj weight stream begins while the
gate_up tail is still computing: phase-1 steps sweep (j1, k1) of the
gate_up grid and park the down operands on their first block (prefetching
it), phase-2 steps sweep (j2, k2) of the down grid.

The gate_up output never touches HBM: it accumulates into a VMEM scratch
laid out as CHUNK-column slabs, and phase 2 reads gate/up slabs, applies
silu(gate)*up in f32, masks salient/pad columns, and group-quantizes —
exactly the math of the unfused path (kernels.int4_group_matmul rawx +
jax.nn.silu in f32), so logits match the two-launch path to f32 rounding.

Layout contract (what pack_model(fuse_projections=True,
shared_residual_basis=True) + fold_input_perm produce, as in bench.py):
  * gate_up: fused [gate | up] columns split at out_features/2, align_o
    zero-padding at the END; output rows pre-permuted into down_proj's
    packed channel order (fold_input_perm, n_splits=2).
  * down_proj: nibble-packed, pre_permuted, grouped recipe matching
    gate_up's; its input channel c is silu(gate[c]) * up[c].

Reference mapping: this is the decode hot loop the reference simulates per
Linear (fake_quant.py:279-322 forward + silu via HF LlamaMLP); here the
whole MLP is one fused TPU kernel.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from smoothquant_tpu.kernels.int4_group_matmul import _unpack_nibbles_biased

_SCALE_FLOOR = 1e-5  # matches quant.core.compute_scale


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_tile_o(o: int, cap_bytes: int, tile_g: int, gs: int,
                 chunk_align: int, max_tile: int) -> int:
    for cand in (2048, 1024, 512, 256, 128):
        if cand > max_tile or o % cand or cand % chunk_align:
            continue
        if tile_g * gs * cand <= cap_bytes:
            return cand
    return 0


def _pick_tile_g(g_half: int, gs: int, tile_o: int, cap_bytes: int) -> int:
    tg = 16 if g_half % 16 == 0 else 8
    while g_half % tg:
        tg //= 2
    while tg > 8 and tg * gs * tile_o > cap_bytes:
        tg //= 2
    return tg


def _quantize_group(y: jax.Array, qmax: float):
    """f32 (N, gs) → (int8 values, f32 (N, 1) scale); bit-identical to
    quant.core.compute_scale + round-to-nearest-even."""
    absmax = jnp.max(jnp.abs(y), axis=1, keepdims=True)
    scale = jnp.maximum(absmax, _SCALE_FLOOR) / qmax
    return jnp.round(y / scale).astype(jnp.int8), scale


def _make_kernel(cfg: dict):
    """Kernel factory.  cfg carries every static dimension (see wrapper)."""
    gs = cfg["gs"]
    chunk = cfg["chunk"]
    qmax = cfg["qmax"]
    t1_steps = cfg["t1_steps"]
    nk1, nk2 = cfg["nk1"], cfg["nk2"]
    tg1, tg2 = cfg["tile_g1"], cfg["tile_g2"]
    to1 = cfg["tile_o1"]
    fuse_norm = cfg["fuse_norm"]
    k_s1, n_sal1 = cfg["k_s1"], cfg["n_sal1"]
    k_s2, n_sal2 = cfg["k_s2"], cfg["n_sal2"]
    k_ns1_raw, k_ns2_raw = cfg["k_ns1_raw"], cfg["k_ns2_raw"]
    half1, half2 = cfg["half1"], cfg["half2"]
    c1, eps = cfg["c1"], cfg["eps"]
    inter_true = cfg["inter_true"]
    bs2 = tg2 * gs
    up_base = inter_true // chunk
    cpt1 = to1 // chunk          # scratch chunks per gate_up O-tile
    need_mask1 = cfg["kk1"] > k_ns1_raw
    interpret = cfg["interpret"]

    def kernel(*refs):
        pos = 1  # refs[0] = scalar-prefetch layer idx (used by index maps)
        x_full_ref = refs[pos]; pos += 1
        x_lo_ref = refs[pos]; pos += 1
        x_hi_ref = refs[pos]; pos += 1
        if fuse_norm:
            nw_full_ref = refs[pos]; pos += 1
            nw_lo_ref = refs[pos]; pos += 1
            nw_hi_ref = refs[pos]; pos += 1
        gu_wp_ref = refs[pos]; pos += 1
        gu_ws_lo_ref = refs[pos]; pos += 1
        gu_ws_hi_ref = refs[pos]; pos += 1
        if k_s1:
            gu_sal_ref = refs[pos]; pos += 1
        dn_wp_ref = refs[pos]; pos += 1
        dn_ws_lo_ref = refs[pos]; pos += 1
        dn_ws_hi_ref = refs[pos]; pos += 1
        if k_s2:
            dn_sal_ref = refs[pos]; pos += 1
        out_ref = refs[pos]; pos += 1
        acc1_ref = refs[pos]; pos += 1
        acc2_ref = refs[pos]; pos += 1
        gu_scr = refs[pos]; pos += 1   # (O1p/chunk, tile_n, chunk) f32
        xq1_ref = refs[pos]; pos += 1
        sc1_ref = refs[pos]; pos += 1
        xq2_ref = refs[pos]; pos += 1
        sc2_ref = refs[pos]; pos += 1
        sal2_ref = refs[pos] if k_s2 else None
        if k_s2:
            pos += 1
        r_ref = refs[pos] if fuse_norm else None

        t = pl.program_id(0)
        ph1 = t < t1_steps
        j1, k1 = t // nk1, t % nk1
        t2 = t - t1_steps
        j2, k2 = t2 // nk2, t2 % nk2

        # ---------------- phase 1: gate_up matmul → VMEM scratch ----------
        @pl.when(ph1)
        def _phase1():
            if fuse_norm:

                @pl.when(t == 0)
                def _r():
                    xf = x_full_ref[:].astype(jnp.float32)
                    r_ref[:] = jnp.broadcast_to(
                        jax.lax.rsqrt(
                            jnp.sum(xf * xf, axis=1, keepdims=True) / c1
                            + eps),
                        r_ref.shape)

            @pl.when(k1 == 0)
            def _init1():
                if k_s1 and n_sal1:
                    sal = (x_full_ref[:, k_ns1_raw:k_ns1_raw + n_sal1]
                           .astype(jnp.float32))
                    if fuse_norm:
                        sal = (sal * r_ref[:, :1]
                               * nw_full_ref[0, k_ns1_raw:k_ns1_raw + n_sal1]
                               .astype(jnp.float32)[None, :])
                    if k_s1 > n_sal1:
                        sal = jnp.concatenate(
                            [sal, jnp.zeros((sal.shape[0], k_s1 - n_sal1),
                                            jnp.float32)], axis=1)
                    acc1_ref[:] = jax.lax.dot_general(
                        sal.astype(gu_sal_ref.dtype), gu_sal_ref[0],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                else:
                    acc1_ref[:] = jnp.zeros_like(acc1_ref)

            # quantize each activation group ONCE (at j1 == 0), reuse for
            # the remaining O-tiles — same trick as the rawx kernel
            @pl.when(j1 == 0)
            def _quant1():
                r = r_ref[:, :1] if fuse_norm else None
                halves = ((x_lo_ref, nw_lo_ref if fuse_norm else None, 0),
                          (x_hi_ref, nw_hi_ref if fuse_norm else None, half1))
                for hi, (x_ref_, nw_ref_, base) in enumerate(halves):
                    for gg in range(tg1):
                        y = (x_ref_[:, gg * gs:(gg + 1) * gs]
                             .astype(jnp.float32))
                        if fuse_norm:
                            y = (y * r
                                 * nw_ref_[0, gg * gs:(gg + 1) * gs]
                                 .astype(jnp.float32)[None, :])
                        if need_mask1 and (base or k_ns1_raw < half1):
                            col = (base + k1 * tg1 * gs + gg * gs
                                   + jax.lax.broadcasted_iota(
                                       jnp.int32, y.shape, 1))
                            y = jnp.where(col < k_ns1_raw, y, 0.0)
                        xq, scale = _quantize_group(y, qmax)
                        slot = (hi * nk1 + k1) * tg1 + gg
                        xq1_ref[slot] = xq
                        sc1_ref[slot] = jnp.broadcast_to(
                            scale, sc1_ref.shape[1:])

            w_lo, w_hi = _unpack_nibbles_biased(gu_wp_ref[0], interpret)
            acc = acc1_ref[:]
            for hi, (w_half, ws_ref_) in enumerate(((w_lo, gu_ws_lo_ref),
                                                    (w_hi, gu_ws_hi_ref))):
                for gg in range(tg1):
                    slot = (hi * nk1 + k1) * tg1 + gg
                    xq = xq1_ref[slot]
                    scale = sc1_ref[slot][:, :1]
                    s_x = jnp.sum(xq.astype(jnp.int32), axis=1, keepdims=True)
                    p = jax.lax.dot_general(
                        xq, w_half[gg],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                    acc += ((p - 8 * s_x).astype(jnp.float32) * scale
                            * ws_ref_[0, gg][None, :].astype(jnp.float32))
            acc1_ref[:] = acc

            @pl.when(k1 == nk1 - 1)
            def _emit1():
                for cc in range(cpt1):
                    gu_scr[j1 * cpt1 + cc] = acc[:, cc * chunk:
                                                 (cc + 1) * chunk]

        # ---------------- phase 2: SwiGLU + quantize + down matmul --------
        def swiglu_chunk(ch):
            g = gu_scr[ch]
            u = gu_scr[up_base + ch]
            return g * jax.lax.logistic(g) * u  # f32 silu(g)*u

        @pl.when(jnp.logical_not(ph1))
        def _phase2():
            if k_s2 and n_sal2:

                @pl.when(t2 == 0)
                def _sal2():
                    # salient down channels live at [k_ns2_raw, inter_true)
                    c0 = k_ns2_raw // chunk
                    c_hi = inter_true // chunk
                    parts = [swiglu_chunk(cc) for cc in range(c0, c_hi)]
                    y = jnp.concatenate(parts, axis=1)
                    off = k_ns2_raw - c0 * chunk
                    y = y[:, off:off + n_sal2]
                    if k_s2 > n_sal2:
                        y = jnp.concatenate(
                            [y, jnp.zeros((y.shape[0], k_s2 - n_sal2),
                                          jnp.float32)], axis=1)
                    sal2_ref[:] = y

            @pl.when(j2 == 0)
            def _quant2():
                for hi, base in enumerate((0, half2)):
                    for cc in range(bs2 // chunk):
                        ch = (base + k2 * bs2) // chunk + cc
                        y = swiglu_chunk(ch)
                        col = (base + k2 * bs2 + cc * chunk
                               + jax.lax.broadcasted_iota(
                                   jnp.int32, y.shape, 1))
                        y = jnp.where(col < k_ns2_raw, y, 0.0)
                        for sub in range(chunk // gs):
                            xq, scale = _quantize_group(
                                y[:, sub * gs:(sub + 1) * gs], qmax)
                            slot = ((hi * nk2 + k2) * tg2
                                    + cc * (chunk // gs) + sub)
                            xq2_ref[slot] = xq
                            sc2_ref[slot] = jnp.broadcast_to(
                                scale, sc2_ref.shape[1:])

            @pl.when(k2 == 0)
            def _init2():
                if k_s2 and n_sal2:
                    acc2_ref[:] = jax.lax.dot_general(
                        sal2_ref[:].astype(dn_sal_ref.dtype), dn_sal_ref[0],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                else:
                    acc2_ref[:] = jnp.zeros_like(acc2_ref)

            w_lo, w_hi = _unpack_nibbles_biased(dn_wp_ref[0], interpret)
            acc = acc2_ref[:]
            for hi, (w_half, ws_ref_) in enumerate(((w_lo, dn_ws_lo_ref),
                                                    (w_hi, dn_ws_hi_ref))):
                for gg in range(tg2):
                    slot = (hi * nk2 + k2) * tg2 + gg
                    xq = xq2_ref[slot]
                    scale = sc2_ref[slot][:, :1]
                    s_x = jnp.sum(xq.astype(jnp.int32), axis=1, keepdims=True)
                    p = jax.lax.dot_general(
                        xq, w_half[gg],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                    acc += ((p - 8 * s_x).astype(jnp.float32) * scale
                            * ws_ref_[0, gg][None, :].astype(jnp.float32))
            acc2_ref[:] = acc

            @pl.when(k2 == nk2 - 1)
            def _out():
                out_ref[:] = acc.astype(out_ref.dtype)

    return kernel


def mlp_fused_supported(gu_meta, dn_meta, n_tokens: int) -> bool:
    """Gate for the fused MLP megakernel: both linears nibble-packed with
    matching grouped recipes, gate_up pre-permuted output (fold_input_perm)
    feeding a pre-permuted down_proj, decode-size token count, and chunk-
    alignable dimensions."""
    if gu_meta is None or dn_meta is None:
        return False
    if not (gu_meta.nibble and dn_meta.nibble):
        return False
    for m in (gu_meta, dn_meta):
        if m.act_quant in ("per_token", "per_tensor"):
            return False
        if m.act_group_size != m.group_size:
            return False
    if gu_meta.group_size != dn_meta.group_size:
        return False
    if not (gu_meta.pre_permuted and dn_meta.pre_permuted):
        return False
    if gu_meta.out_features != 2 * dn_meta.in_features:
        return False
    if n_tokens > 8:
        return False
    gs = gu_meta.group_size
    inter = dn_meta.in_features
    half2 = dn_meta.k_ns // 2
    chunk = _pick_chunk(gs, inter, half2)
    return chunk is not None


def _pick_chunk(gs: int, inter_true: int, half2: int) -> Optional[int]:
    for c in (256, 128, 64, 32, 16, 8):
        if c % gs == 0 and inter_true % c == 0 and half2 % c == 0:
            return c
    return None


@functools.partial(
    jax.jit,
    static_argnames=("group_size", "act_bits", "n_sal1", "n_sal2", "eps",
                     "gu_out_true", "dn_out_true", "out_dtype", "tile_o1",
                     "tile_o2", "interpret"),
)
def mlp_swiglu_fused_stacked(
    layer_idx: jax.Array,    # (1,) int32
    x_raw: jax.Array,        # (N, C) fp — pre-norm residual, permuted order
    norm_w: Optional[jax.Array],   # (C,) RMSNorm weight or None
    gu_wp: jax.Array,        # (L, K1/2, O1p) int8 nibble-packed gate_up
    gu_ws: jax.Array,        # (L, G1, O1p) f32/bf16
    gu_sal: jax.Array,       # (L, k_s1, O1p) fp
    dn_wp: jax.Array,        # (L, K2/2, O2p) int8 nibble-packed down
    dn_ws: jax.Array,        # (L, G2, O2p)
    dn_sal: jax.Array,       # (L, k_s2, O2p)
    *,
    group_size: int,
    act_bits: int,
    n_sal1: int,
    n_sal2: int,
    gu_out_true: int,        # gate_up true out_features (2 * intermediate)
    dn_out_true: int,        # down true out_features (hidden)
    eps: float = 0.0,
    out_dtype=jnp.float32,
    tile_o1: Optional[int] = None,
    tile_o2: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    """Returns down_proj output (N, dn_out_true) f32→out_dtype.  See module
    docstring for the layout contract; numerics match the two-launch rawx
    path computed in f32 end-to-end.

    tile_o1/tile_o2 override the O-tile autopick: the fused kernel holds
    BOTH linears' buffers resident, so its VMEM footprint trades against
    XLA's cross-kernel prefetch of the NEXT op's weights — in a decode scan
    smaller tiles can win even though standalone bigger tiles do."""
    n, c1 = x_raw.shape
    l_num, half1, o1p = gu_wp.shape
    _, half2, o2p = dn_wp.shape
    gs = group_size
    kk1, kk2 = 2 * half1, 2 * half2
    g1_total, g2_total = kk1 // gs, kk2 // gs
    gh1, gh2 = g1_total // 2, g2_total // 2
    k_s1, k_s2 = gu_sal.shape[1], dn_sal.shape[1]
    k_ns1_raw = c1 - n_sal1
    inter_true = gu_out_true // 2
    k_ns2_raw = inter_true - n_sal2
    assert gu_ws.shape[1] == g1_total and dn_ws.shape[1] == g2_total
    assert kk1 >= k_ns1_raw and kk2 >= k_ns2_raw
    assert n <= 8, "fused MLP kernel is gated to decode-size token counts"

    chunk = _pick_chunk(gs, inter_true, half2)
    assert chunk is not None, "dims not chunk-alignable (use unfused path)"

    cap = 2 * 1024 * 1024
    tg1 = _pick_tile_g(gh1, gs, tile_o1 or 2048, cap)
    to1 = (tile_o1 if tile_o1 and o1p % tile_o1 == 0 and tile_o1 % chunk == 0
           else _pick_tile_o(o1p, cap, tg1, gs, chunk, 2048))
    tg2 = _pick_tile_g(gh2, gs, tile_o2 or 1024, cap)
    to2 = (tile_o2 if tile_o2 and o2p % tile_o2 == 0
           else _pick_tile_o(o2p, cap, tg2, gs, 1, 1024))
    while to2 and (tg2 * gs) % chunk and tg2 < gh2:
        tg2 *= 2  # bs2 must be chunk-aligned
        if gh2 % tg2:
            to2 = 0
            break
    bs2 = tg2 * gs
    if not to1 or not to2 or bs2 % chunk or gh2 % tg2 or gh1 % tg1:
        raise ValueError(
            f"fused MLP needs tile-aligned shapes: O1={o1p} O2={o2p} "
            f"gh1={gh1} gh2={gh2} gs={gs}")

    nk1, nk2 = gh1 // tg1, gh2 // tg2
    j1_steps, j2_steps = o1p // to1, o2p // to2
    t1_steps = j1_steps * nk1
    t_total = t1_steps + j2_steps * nk2

    bs1 = tg1 * gs
    p_ch = _ceil_to(max(c1, kk1), bs1)
    tile_n = 8
    n_pad = tile_n
    if (n_pad, p_ch) != (n, c1):
        x_raw = jnp.pad(x_raw, ((0, n_pad - n), (0, p_ch - c1)))
    fuse_norm = norm_w is not None
    if fuse_norm:
        nw = jnp.pad(norm_w.reshape(1, -1).astype(x_raw.dtype),
                     ((0, 0), (0, p_ch - c1)))

    gu_wp4 = gu_wp.reshape(l_num, gh1, gs, o1p)
    dn_wp4 = dn_wp.reshape(l_num, gh2, gs, o2p)

    T1 = t1_steps  # noqa: N806 — captured by the index maps below

    # phase-aware index maps: each operand parks on its last-used (phase 1)
    # or first-used (phase 2) block during the other phase, so no DMA churn
    # and the first down block prefetches while gate_up still computes.
    def p1(t, s, f):
        tc = jnp.minimum(t, T1 - 1)
        return f(tc // nk1, tc % nk1, s)

    def p2(t, s, f):
        tc = jnp.maximum(t - T1, 0)
        return f(tc // nk2, tc % nk2, s)

    in_specs = [
        pl.BlockSpec((tile_n, p_ch), lambda t, s: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_n, bs1),
                     lambda t, s: p1(t, s, lambda j, k, s_: (0, k)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_n, bs1),
                     lambda t, s: p1(t, s, lambda j, k, s_: (0, k + nk1)),
                     memory_space=pltpu.VMEM),
    ]
    operands = [x_raw, x_raw, x_raw]
    if fuse_norm:
        in_specs += [
            pl.BlockSpec((1, p_ch), lambda t, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bs1),
                         lambda t, s: p1(t, s, lambda j, k, s_: (0, k)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bs1),
                         lambda t, s: p1(t, s, lambda j, k, s_: (0, k + nk1)),
                         memory_space=pltpu.VMEM),
        ]
        operands += [nw, nw, nw]
    in_specs += [
        pl.BlockSpec((1, tg1, gs, to1),
                     lambda t, s: p1(t, s, lambda j, k, s_: (s_[0], k, 0, j)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tg1, to1),
                     lambda t, s: p1(t, s, lambda j, k, s_: (s_[0], k, j)),
                     memory_space=pltpu.VMEM),
        # the hi-half scale block sits nk1 block indices after the lo half
        # (the scale array holds 2*gh1 group rows = 2*nk1 blocks of tg1)
        pl.BlockSpec((1, tg1, to1),
                     lambda t, s: p1(t, s, lambda j, k, s_: (s_[0], k + nk1,
                                                             j)),
                     memory_space=pltpu.VMEM),
    ]
    operands += [gu_wp4, gu_ws, gu_ws]
    if k_s1:
        in_specs.append(pl.BlockSpec(
            (1, k_s1, to1),
            lambda t, s: p1(t, s, lambda j, k, s_: (s_[0], 0, j)),
            memory_space=pltpu.VMEM))
        operands.append(gu_sal)
    in_specs += [
        pl.BlockSpec((1, tg2, gs, to2),
                     lambda t, s: p2(t, s, lambda j, k, s_: (s_[0], k, 0, j)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tg2, to2),
                     lambda t, s: p2(t, s, lambda j, k, s_: (s_[0], k, j)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tg2, to2),
                     lambda t, s: p2(t, s, lambda j, k, s_: (s_[0], k + nk2,
                                                             j)),
                     memory_space=pltpu.VMEM),
    ]
    operands += [dn_wp4, dn_ws, dn_ws]
    if k_s2:
        in_specs.append(pl.BlockSpec(
            (1, k_s2, to2),
            lambda t, s: p2(t, s, lambda j, k, s_: (s_[0], 0, j)),
            memory_space=pltpu.VMEM))
        operands.append(dn_sal)

    scratch = [
        pltpu.VMEM((tile_n, to1), jnp.float32),               # acc1
        pltpu.VMEM((tile_n, to2), jnp.float32),               # acc2
        pltpu.VMEM((o1p // chunk, tile_n, chunk), jnp.float32),  # gu slabs
        pltpu.VMEM((g1_total, tile_n, gs), jnp.int8),
        pltpu.VMEM((g1_total, tile_n, 128), jnp.float32),
        pltpu.VMEM((g2_total, tile_n, gs), jnp.int8),
        pltpu.VMEM((g2_total, tile_n, 128), jnp.float32),
    ]
    if k_s2:
        scratch.append(pltpu.VMEM((tile_n, k_s2), jnp.float32))
    if fuse_norm:
        scratch.append(pltpu.VMEM((tile_n, 128), jnp.float32))

    kernel = _make_kernel(dict(
        gs=gs, chunk=chunk, qmax=float(2 ** (act_bits - 1) - 1),
        t1_steps=t1_steps, nk1=nk1, nk2=nk2, tile_g1=tg1, tile_g2=tg2,
        tile_o1=to1, fuse_norm=fuse_norm, k_s1=k_s1, n_sal1=n_sal1,
        k_s2=k_s2, n_sal2=n_sal2, k_ns1_raw=k_ns1_raw, k_ns2_raw=k_ns2_raw,
        half1=half1, half2=half2, c1=c1, eps=eps, inter_true=inter_true,
        kk1=kk1, interpret=interpret,
    ))

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(t_total,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (tile_n, to2),
                lambda t, s: (0, jnp.maximum(t - T1, 0) // nk2),
                memory_space=pltpu.VMEM),
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, o2p), jnp.dtype(out_dtype)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * (o1p * (kk1 + k_s1) + o2p * (kk2 + k_s2)),
            bytes_accessed=(n_pad * p_ch * 2
                            + o1p * (half1 + g1_total * gu_ws.dtype.itemsize
                                     + k_s1 * 2)
                            + o2p * (half2 + g2_total * dn_ws.dtype.itemsize
                                     + k_s2 * 2)
                            + n_pad * o2p * 2),
            transcendentals=n_pad * inter_true,
        ),
        interpret=interpret,
    )(jnp.asarray(layer_idx, jnp.int32).reshape(1), *operands)

    return out[:n, :dn_out_true]
