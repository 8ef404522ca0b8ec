"""Fused decode-attention chain — K-rotary + KV int8 quantize + cache row
write + single-query flash attention in ONE Pallas call.

The prefetch-scan decode previously ran this chain as XLA glue + two
kernels per layer: rotary on k (XLA), the fused cache writer
(kernels/cache_write.py), decode_bias construction (XLA), and the flash
decode-attention kernel (kernels/decode_attention.py).  The matmul kernels
already run at ~80% of their HBM roofline, so the residual per-layer cost
is exactly this glue: each XLA op cluster and kernel launch on the
tunneled v5e costs ~2-10 us, and the chain ran ~80 us/layer against a
~25 us data floor.

One kernel, one flattened grid:
  * step 0 ("write phase"): rotate K (f32, bit-identical to
    cache_write._kernel), quantize K/V per (batch, head) to int8 with
    scale = max(absmax, 1e-8)/127, merge the decode position's row into
    the aliased cache row blocks (flushed to HBM at grid end), and stash
    the quantized values + scales in VMEM scratch.
  * steps 1..B*nkb*nst ("attention phase"): the decode_attention streaming
    softmax over the OLD cache tiles — the current position's HBM row is
    stale until the grid-end flush, so the in-kernel bias masks columns
    >= pos and the new position is appended as a small in-register
    "virtual tile" (built from scratch) on each (batch, head)-block's last
    S-tile, right before the output write.

Numerics: cache bytes match the separate writer bit-for-bit; attention
matches the separate kernel up to streaming-softmax reordering (the new
position is folded in last instead of inside its S-tile) — f32-rounding
level.  Mirrors the reference's int8 attention BMM semantics
(/root/reference/smoothquant/opt.py:44-45,79-84) like the unfused pair.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from smoothquant_tpu.kernels.decode_attention import (
    NEG_INF,
    _ceil_to,
    _flash_head,
    _pick_b_chunk,
    _pick_h_chunk,
    _pick_tile_s,
)


def _rot_half(x):
    d = x.shape[-1]
    return jnp.concatenate([-x[..., d // 2:], x[..., : d // 2]], axis=-1)


def _make_inline_kernel(*, sm_scale: float, hc: int, rp: int, nkb: int,
                        nst: int, ts: int, b: int, bc: int, d: int,
                        rotary: bool, int8_dots: bool,
                        flat_q: bool = False):
    """Virtual-tile attention WITHOUT a write phase: the new position's
    rotary+quantize runs inline on each (batch, head)-block's LAST S-tile,
    only for that block's heads — one fewer grid step than the phased
    kernel and no cross-step scratch stash.  Numerics are bit-identical to
    the phased variant (same per-head f32 rotate/absmax/round chain).

    flat_q (MHA only): q arrives PRE-rotary as a flat (bc, hc*d) block and
    the output is written flat (bc, hc*d) — q-rotary runs in-kernel (f32)
    and the XLA chain around the call (apply_rotary fusion + rep-pad +
    rep-slice + squeeze, ~8 us/layer of decode-scan glue) disappears."""

    def kernel(idx_ref, q_ref, kn_ref, vn_ref, cos_ref, sin_ref,
               kt_ref, vt_ref, kst_ref, vst_ref, o_ref,
               m_ref, l_ref, acc_ref):
        lpos = idx_ref[1]
        st = pl.program_id(0) % nst
        # current position's HBM row is stale (the aliased writer runs
        # after): mask cols >= lpos; the new position rides the virtual tile
        bias_row = jnp.where(
            st * ts + jax.lax.broadcasted_iota(jnp.int32, (1, ts), 1)
            < lpos, 0.0, NEG_INF)
        if flat_q:
            row0b = (jax.lax.broadcasted_iota(jnp.int32, (rp, d), 0)
                     == 0).astype(jnp.float32)

        def q_tile(b2, j):
            if not flat_q:
                return q_ref[b2, j]
            qf = q_ref[b2, 0:1, j * d:(j + 1) * d].astype(jnp.float32)
            if rotary:
                cosb = cos_ref[b2, 0].astype(jnp.float32)[None, :]
                sinb = sin_ref[b2, 0].astype(jnp.float32)[None, :]
                qf = qf * cosb + _rot_half(qf) * sinb
            # (1, d) -> (rp, d) row-0 by MULTIPLY (see Mosaic note below)
            return (qf * row0b).astype(o_ref.dtype)

        for b2 in range(bc):
            for j in range(hc):
                k_t, v_t = kt_ref[0, b2, j], vt_ref[0, b2, j]
                if not int8_dots:
                    k_t = k_t.astype(jnp.bfloat16)
                    v_t = v_t.astype(jnp.bfloat16)
                _flash_head(
                    q_tile(b2, j), k_t, v_t, bias_row,
                    kst_ref[0, b2, j:j + 1], vst_ref[0, b2, j:j + 1],
                    sm_scale, m_ref, l_ref, acc_ref,
                    (b2 * hc + j) * rp,
                    st == 0, False, o_ref, j, o_b=b2,
                    int8_dots=int8_dots,
                    flat_d=d if flat_q else None,
                )

        @pl.when(st == nst - 1)
        def _virtual():
            cos = cos_ref[:, 0].astype(jnp.float32)            # (bc, D)
            sin = sin_ref[:, 0].astype(jnp.float32)

            def quantize(x, rot: bool, b2: int):
                # (hc, d) f32 — bit-identical to cache_write._kernel
                if rot:
                    x = x * cos[b2][None, :] + _rot_half(x) * sin[b2][None, :]
                absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
                scale = jnp.maximum(absmax, 1e-8) / 127.0      # (hc, 1)
                return jnp.round(x / scale), scale

            # row-0 selection by MULTIPLY, not where: an (8,128) i1 mask
            # against a sublane-broadcast row hits a Mosaic relayout bug
            row0 = (jax.lax.broadcasted_iota(jnp.int32, (8, d), 0)
                    == 0).astype(jnp.bfloat16)
            bias_v = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1) == 0,
                0.0, NEG_INF)
            for b2 in range(bc):
                k8, ksc = quantize(kn_ref[b2].astype(jnp.float32), rotary,
                                   b2)
                v8, vsc = quantize(vn_ref[b2].astype(jnp.float32), False,
                                   b2)
                k8 = k8.astype(jnp.bfloat16)   # ints in [-127,127]: exact
                v8 = v8.astype(jnp.bfloat16)
                for j in range(hc):
                    k_t = k8[j][None, :] * row0
                    v_t = v8[j][None, :] * row0
                    _flash_head(
                        q_tile(b2, j), k_t, v_t, bias_v,
                        jnp.broadcast_to(ksc[j:j + 1], (1, 8)),
                        jnp.broadcast_to(vsc[j:j + 1], (1, 8)),
                        sm_scale, m_ref, l_ref, acc_ref,
                        (b2 * hc + j) * rp,
                        False, True, o_ref, j, o_b=b2,
                        flat_d=d if flat_q else None,
                    )

    return kernel


def _make_kernel(*, sm_scale: float, hc: int, rp: int, nkb: int, nst: int,
                 ts: int, b: int, bc: int, d: int, rotary: bool,
                 write_cache: bool, int8_dots: bool):
    def kernel(*refs):
        pos_i = 0
        idx_ref = refs[pos_i]; pos_i += 1
        q_ref = refs[pos_i]; pos_i += 1
        kn_ref = refs[pos_i]; pos_i += 1
        vn_ref = refs[pos_i]; pos_i += 1
        cos_ref = refs[pos_i]; pos_i += 1
        sin_ref = refs[pos_i]; pos_i += 1
        if write_cache:
            kq_in = refs[pos_i]; pos_i += 1
            vq_in = refs[pos_i]; pos_i += 1
            ks_in = refs[pos_i]; pos_i += 1
            vs_in = refs[pos_i]; pos_i += 1
        kt_ref = refs[pos_i]; pos_i += 1
        vt_ref = refs[pos_i]; pos_i += 1
        kst_ref = refs[pos_i]; pos_i += 1
        vst_ref = refs[pos_i]; pos_i += 1
        o_ref = refs[pos_i]; pos_i += 1
        if write_cache:
            kq_out = refs[pos_i]; pos_i += 1
            vq_out = refs[pos_i]; pos_i += 1
            ks_out = refs[pos_i]; pos_i += 1
            vs_out = refs[pos_i]; pos_i += 1
        (m_ref, l_ref, acc_ref, k8_scr, v8_scr, ksc_scr,
         vsc_scr) = refs[pos_i:]

        lpos = idx_ref[1]
        t = pl.program_id(0)

        # ---------------- step 0: rotate + quantize (+ cache row merge) ---
        @pl.when(t == 0)
        def _write():
            cos = cos_ref[:, 0].astype(jnp.float32)[:, None, :]   # (B,1,D)
            sin = sin_ref[:, 0].astype(jnp.float32)[:, None, :]

            def quantize(new_ref, rot: bool):
                x = new_ref[:].astype(jnp.float32)                # (B,H,D)
                if rot:
                    x = x * cos + _rot_half(x) * sin
                absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
                scale = jnp.maximum(absmax, 1e-8) / 127.0         # (B,H,1)
                return jnp.round(x / scale).astype(jnp.int8), scale

            k8, ksc = quantize(kn_ref, rotary)
            v8, vsc = quantize(vn_ref, False)
            if write_cache:
                row = lpos % 8
                lane = lpos % 128
                rows = jax.lax.broadcasted_iota(jnp.int32, kq_in[0].shape,
                                                2)
                kq_out[0] = jnp.where(rows == row, k8[:, :, None, :],
                                      kq_in[0])
                vq_out[0] = jnp.where(rows == row, v8[:, :, None, :],
                                      vq_in[0])
                lanes = jax.lax.broadcasted_iota(jnp.int32, ks_in[0].shape,
                                                 2)
                ks_out[0] = jnp.where(lanes == lane, ksc, ks_in[0])
                vs_out[0] = jnp.where(lanes == lane, vsc, vs_in[0])
            # scratch holds the int8 VALUES as bf16 (exact for [-127,127];
            # int8 scratch slices hit Mosaic's (32,128) int8 tiling rules,
            # and the virtual tile dots in bf16 anyway)
            k8_scr[:] = k8.astype(jnp.bfloat16).reshape(b * nkb, hc, d)
            v8_scr[:] = v8.astype(jnp.bfloat16).reshape(b * nkb, hc, d)
            ksc_scr[:] = jnp.broadcast_to(
                ksc.reshape(b * nkb, hc, 1), ksc_scr.shape)
            vsc_scr[:] = jnp.broadcast_to(
                vsc.reshape(b * nkb, hc, 1), vsc_scr.shape)

        # ---------------- steps 1..: streaming flash attention ------------
        @pl.when(t > 0)
        def _attn():
            t2 = t - 1
            hh = (t2 % (nkb * nst)) // nst
            st = t2 % nst
            bb = t2 // (nkb * nst)
            # the current position's HBM row is stale (flushed at grid
            # end): mask cols >= lpos; the new position rides the virtual
            # tile below
            bias_row = jnp.where(
                st * ts + jax.lax.broadcasted_iota(jnp.int32, (1, ts), 1)
                < lpos, 0.0, NEG_INF)
            for b2 in range(bc):
                for j in range(hc):
                    k_t, v_t = kt_ref[0, b2, j], vt_ref[0, b2, j]
                    if not int8_dots:
                        k_t = k_t.astype(jnp.bfloat16)
                        v_t = v_t.astype(jnp.bfloat16)
                    _flash_head(
                        q_ref[b2, j], k_t, v_t, bias_row,
                        kst_ref[0, b2, j:j + 1], vst_ref[0, b2, j:j + 1],
                        sm_scale, m_ref, l_ref, acc_ref,
                        (b2 * hc + j) * rp,
                        st == 0, False, o_ref, j, o_b=b2,
                        int8_dots=int8_dots,
                    )

            @pl.when(st == nst - 1)
            def _virtual():
                # row-0 selection by MULTIPLY, not where: an (8,128) i1
                # mask against a sublane-broadcast row hits a Mosaic
                # relayout bug ("non-singleton dimension replicated in
                # destination but not source")
                row0 = (jax.lax.broadcasted_iota(jnp.int32, (8, d), 0)
                        == 0).astype(jnp.bfloat16)
                bias_v = jnp.where(
                    jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1) == 0,
                    0.0, NEG_INF)
                for b2 in range(bc):
                    bbnk = (bb * bc + b2) * nkb + hh
                    k8b = k8_scr[bbnk]                   # (hc, d) bf16 ints
                    v8b = v8_scr[bbnk]
                    kscb = ksc_scr[bbnk]                 # (hc, 128) f32
                    vscb = vsc_scr[bbnk]
                    for j in range(hc):
                        k_t = k8b[j][None, :] * row0
                        v_t = v8b[j][None, :] * row0
                        _flash_head(
                            q_ref[b2, j], k_t, v_t, bias_v,
                            kscb[j:j + 1, :8], vscb[j:j + 1, :8],
                            sm_scale, m_ref, l_ref, acc_ref,
                            (b2 * hc + j) * rp,
                            False, True, o_ref, j, o_b=b2,
                        )

    return kernel


def fused_attn_supported(s: int, n_heads: int, n_kv: int,
                         head_dim: int) -> bool:
    return (_pick_tile_s(s) is not None and n_heads % n_kv == 0
            and head_dim % 64 == 0)


def _fused_attn_call(layer_idx, pos, q, k_new, v_new, cos, sin,
                     k_q, v_q, k_scale, v_scale, *, sm_scale, rotary,
                     interpret, write_cache, int8_dots, flat_io=False):
    l_num, _, n_kv, s, _ = k_q.shape
    if flat_io:
        # q: (B, 1, H*D) PRE-rotary, output flat (B, 1, H*D) — MHA only.
        # The unit middle dim satisfies Mosaic's last-two-block-dims rule
        # (the (bc, hc*d) block of a (B, H*D) array would not).
        b, _one, hd = q.shape
        d = k_q.shape[-1]
        h = hd // d
        assert h == n_kv, "flat_io requires MHA (rep == 1)"
        assert not write_cache
        rep = 1
    else:
        b, h, d = q.shape
        rep = h // n_kv
    ts = _pick_tile_s(s)
    assert ts is not None, f"cache length {s} not tileable"
    if sm_scale is None:
        sm_scale = 1.0 / (d ** 0.5)
    rp = _ceil_to(rep, 8)
    if flat_io:
        q4 = q
    else:
        q4 = q.reshape(b, n_kv, rep, d)
        if rp != rep:
            q4 = jnp.pad(q4, ((0, 0), (0, 0), (0, rp - rep), (0, 0)))
    hc = _pick_h_chunk(n_kv, ts, d, 1)
    bc = _pick_b_chunk(b, n_kv, hc, ts, d, 1)
    nkb = n_kv // hc
    nst = s // ts
    if cos is None:
        cos = sin = jnp.zeros((b, 1, d), jnp.float32)

    layer_idx = jnp.asarray(layer_idx, jnp.int32).reshape(())
    pos = jnp.asarray(pos, jnp.int32).reshape(())
    idx = jnp.stack([layer_idx, pos])

    if not write_cache:
        # inline-virtual kernel: no write phase, one grid step fewer
        def cmap0(t, s_):
            return (t // (nkb * nst), (t % (nkb * nst)) // nst, t % nst)

        q_spec0 = (pl.BlockSpec((bc, 1, hc * d),
                               lambda t, s_: cmap0(t, s_)[:2][:1]
                               + (0, cmap0(t, s_)[1]),
                               memory_space=pltpu.VMEM)
                   if flat_io else
                   pl.BlockSpec((bc, hc, rp, d),
                                lambda t, s_: cmap0(t, s_)[:2] + (0, 0),
                                memory_space=pltpu.VMEM))
        out = pl.pallas_call(
            _make_inline_kernel(sm_scale=sm_scale, hc=hc, rp=rp, nkb=nkb,
                                nst=nst, ts=ts, b=b, bc=bc, d=d,
                                rotary=rotary, int8_dots=int8_dots,
                                flat_q=flat_io),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=((b // bc) * nkb * nst,),
                in_specs=[
                    q_spec0,
                    pl.BlockSpec((bc, hc, d),
                                 lambda t, s_: cmap0(t, s_)[:2] + (0,),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((bc, hc, d),
                                 lambda t, s_: cmap0(t, s_)[:2] + (0,),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((bc, 1, d),
                                 lambda t, s_: (cmap0(t, s_)[0], 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((bc, 1, d),
                                 lambda t, s_: (cmap0(t, s_)[0], 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(
                        (1, bc, hc, ts, d),
                        lambda t, s_: (s_[0],) + cmap0(t, s_)[:2]
                        + (cmap0(t, s_)[2], 0),
                        memory_space=pltpu.VMEM),
                    pl.BlockSpec(
                        (1, bc, hc, ts, d),
                        lambda t, s_: (s_[0],) + cmap0(t, s_)[:2]
                        + (cmap0(t, s_)[2], 0),
                        memory_space=pltpu.VMEM),
                    pl.BlockSpec(
                        (1, bc, hc, ts),
                        lambda t, s_: (s_[0],) + cmap0(t, s_),
                        memory_space=pltpu.VMEM),
                    pl.BlockSpec(
                        (1, bc, hc, ts),
                        lambda t, s_: (s_[0],) + cmap0(t, s_),
                        memory_space=pltpu.VMEM),
                ],
                out_specs=[pl.BlockSpec(
                    (bc, 1, hc * d),
                    lambda t, s_: (cmap0(t, s_)[0], 0, cmap0(t, s_)[1]),
                    memory_space=pltpu.VMEM) if flat_io else
                    pl.BlockSpec(
                    (bc, hc, rp, d),
                    lambda t, s_: cmap0(t, s_)[:2] + (0, 0),
                    memory_space=pltpu.VMEM)],
                scratch_shapes=[
                    pltpu.VMEM((bc * hc * rp, 128), jnp.float32),
                    pltpu.VMEM((bc * hc * rp, 128), jnp.float32),
                    pltpu.VMEM((bc * hc * rp, d), jnp.float32),
                ],
            ),
            out_shape=[jax.ShapeDtypeStruct(
                (b, 1, h * d) if flat_io else (b, n_kv, rp, d), q.dtype)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            cost_estimate=pl.CostEstimate(
                flops=4 * b * h * s * d,
                bytes_accessed=(2 * b * n_kv * s * d + b * h * d * 2 * 2),
                transcendentals=b * h * s,
            ),
            interpret=interpret,
        )(idx, q4, k_new, v_new, cos, sin, k_q, v_q, k_scale, v_scale)
        if flat_io:
            return out[0]
        return out[0][:, :, :rep].reshape(b, h, d)

    if write_cache:
        # The decode row/scale blocks are SLICED OUT here and written back
        # with dynamic_update_slice after the call.  Passing the full cache
        # both as the streamed-tile operand AND as an aliased row-block
        # operand makes XLA copy the whole multi-GB cache defensively every
        # call (measured 37x slower); small separate blocks sidestep the
        # double use.
        row0 = (pos // 8) * 8
        lane0 = (pos // 128) * 128
        kb = jax.lax.dynamic_slice(k_q, (layer_idx, 0, 0, row0, 0),
                                   (1, b, n_kv, 8, d))
        vb = jax.lax.dynamic_slice(v_q, (layer_idx, 0, 0, row0, 0),
                                   (1, b, n_kv, 8, d))
        ksb = jax.lax.dynamic_slice(k_scale, (layer_idx, 0, 0, lane0),
                                    (1, b, n_kv, 128))
        vsb = jax.lax.dynamic_slice(v_scale, (layer_idx, 0, 0, lane0),
                                    (1, b, n_kv, 128))

    def cmap(t, s_):
        t2 = jnp.maximum(t - 1, 0)
        return (t2 // (nkb * nst), (t2 % (nkb * nst)) // nst,
                t2 % nst)

    q_spec = pl.BlockSpec(
        (bc, hc, rp, d),
        lambda t, s_: (cmap(t, s_)[0], cmap(t, s_)[1], 0, 0),
        memory_space=pltpu.VMEM)
    new_spec = pl.BlockSpec((b, n_kv, d), lambda t, s_: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    cs_spec = pl.BlockSpec((b, 1, d), lambda t, s_: (0, 0, 0),
                           memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, b, n_kv, 8, d),
                            lambda t, s_: (0, 0, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    rsc_spec = pl.BlockSpec((1, b, n_kv, 128),
                            lambda t, s_: (0, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec(
        (1, bc, hc, ts, d),
        lambda t, s_: (s_[0],) + cmap(t, s_)[:2] + (cmap(t, s_)[2], 0),
        memory_space=pltpu.VMEM)
    sc_spec = pl.BlockSpec(
        (1, bc, hc, ts),
        lambda t, s_: (s_[0],) + cmap(t, s_),
        memory_space=pltpu.VMEM)
    out_attn_spec = pl.BlockSpec(
        (bc, hc, rp, d),
        lambda t, s_: (cmap(t, s_)[0], cmap(t, s_)[1], 0, 0),
        memory_space=pltpu.VMEM)

    kernel = _make_kernel(sm_scale=sm_scale, hc=hc, rp=rp, nkb=nkb, nst=nst,
                          ts=ts, b=b, bc=bc, d=d, rotary=rotary,
                          write_cache=write_cache, int8_dots=int8_dots)

    in_specs = [q_spec, new_spec, new_spec, cs_spec, cs_spec]
    operands = [q4, k_new, v_new, cos, sin]
    out_specs = [out_attn_spec]
    out_shape = [jax.ShapeDtypeStruct((b, n_kv, rp, d), q.dtype)]
    aliases = {}
    if write_cache:
        in_specs += [row_spec, row_spec, rsc_spec, rsc_spec]
        operands += [kb, vb, ksb, vsb]
        out_specs += [row_spec, row_spec, rsc_spec, rsc_spec]
        out_shape += [
            jax.ShapeDtypeStruct(kb.shape, jnp.int8),
            jax.ShapeDtypeStruct(vb.shape, jnp.int8),
            jax.ShapeDtypeStruct(ksb.shape, jnp.float32),
            jax.ShapeDtypeStruct(vsb.shape, jnp.float32),
        ]
        # operand order: (scalars, q4, k_new, v_new, cos, sin,
        #                 kq_row, vq_row, ks_row, vs_row, tiles x4)
        aliases = {6: 1, 7: 2, 8: 3, 9: 4}
    in_specs += [kv_spec, kv_spec, sc_spec, sc_spec]
    operands += [k_q, v_q, k_scale, v_scale]

    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1 + (b // bc) * nkb * nst,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((bc * hc * rp, 128), jnp.float32),  # running max
                pltpu.VMEM((bc * hc * rp, 128), jnp.float32),  # denom
                pltpu.VMEM((bc * hc * rp, d), jnp.float32),    # num
                pltpu.VMEM((b * nkb, hc, d), jnp.bfloat16),  # new k values
                pltpu.VMEM((b * nkb, hc, d), jnp.bfloat16),  # new v values
                pltpu.VMEM((b * nkb, hc, 128), jnp.float32),
                pltpu.VMEM((b * nkb, hc, 128), jnp.float32),
            ],
        ),
        out_shape=out_shape,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s * d,
            bytes_accessed=(2 * b * n_kv * s * d + b * h * d * 2 * 2
                            + 2 * b * n_kv * (8 * d + 512)),
            transcendentals=b * h * s,
        ),
        interpret=interpret,
    )(idx, *operands)

    if not write_cache:
        return outs[0][:, :, :rep].reshape(b, h, d)
    attn, kb2, vb2, ksb2, vsb2 = outs
    k_q = jax.lax.dynamic_update_slice(k_q, kb2, (layer_idx, 0, 0, row0, 0))
    v_q = jax.lax.dynamic_update_slice(v_q, vb2, (layer_idx, 0, 0, row0, 0))
    k_scale = jax.lax.dynamic_update_slice(k_scale, ksb2,
                                           (layer_idx, 0, 0, lane0))
    v_scale = jax.lax.dynamic_update_slice(v_scale, vsb2,
                                           (layer_idx, 0, 0, lane0))
    return attn[:, :, :rep].reshape(b, h, d), k_q, v_q, k_scale, v_scale


@functools.partial(jax.jit,
                   static_argnames=("sm_scale", "rotary", "interpret",
                                    "int8_dots"))
def fused_rope_write_attn_stacked(
    layer_idx: jax.Array,   # scalar int32
    pos: jax.Array,         # scalar int32 — aligned decode position
    q: jax.Array,           # (B, H, D) — ALREADY rotary-rotated queries
    k_new: jax.Array,       # (B, H_kv, D) — PRE-rotary keys
    v_new: jax.Array,       # (B, H_kv, D)
    cos: Optional[jax.Array],    # (B, 1, D) rotary tables (None: non-rotary)
    sin: Optional[jax.Array],
    k_q: jax.Array,         # (L, B, H_kv, S, D) int8 — updated in place
    v_q: jax.Array,
    k_scale: jax.Array,     # (L, B, H_kv, S) f32
    v_scale: jax.Array,
    *,
    sm_scale: Optional[float] = None,
    rotary: bool = True,
    interpret: bool = False,
    int8_dots: bool = False,
):
    """Returns (attn (B, H, D) in q.dtype, k_q', v_q', k_scale', v_scale').

    One Pallas call replacing write_quant_cache_stacked + decode_bias +
    decode_attention_stacked for the aligned single-token decode case
    (scalar per-layer pos, no attn_mask holes, int8 cache).  NOTE: the
    row/scale write-back costs ~9 us/layer of dynamic_update_slice glue;
    fused_virtual_attn_stacked + the aliased writer kernel is the faster
    composition (see ForwardContext.fuse_attn)."""
    return _fused_attn_call(layer_idx, pos, q, k_new, v_new, cos, sin,
                            k_q, v_q, k_scale, v_scale, sm_scale=sm_scale,
                            rotary=rotary, interpret=interpret,
                            write_cache=True, int8_dots=int8_dots)


@functools.partial(jax.jit,
                   static_argnames=("sm_scale", "rotary", "interpret",
                                    "int8_dots"))
def fused_virtual_attn_stacked(
    layer_idx: jax.Array,   # scalar int32
    pos: jax.Array,         # scalar int32 — aligned decode position
    q: jax.Array,           # (B, H, D) — ALREADY rotary-rotated queries
    k_new: jax.Array,       # (B, H_kv, D) — PRE-rotary keys
    v_new: jax.Array,       # (B, H_kv, D)
    cos: Optional[jax.Array],    # (B, 1, D) rotary tables (None: non-rotary)
    sin: Optional[jax.Array],
    k_q: jax.Array,         # (L, B, H_kv, S, D) int8 — the OLD cache
    v_q: jax.Array,
    k_scale: jax.Array,     # (L, B, H_kv, S) f32
    v_scale: jax.Array,
    *,
    sm_scale: Optional[float] = None,
    rotary: bool = True,
    interpret: bool = False,
    int8_dots: bool = False,
) -> jax.Array:
    """Attention over the OLD cache + the new position from registers — no
    cache write at all.  Returns attn (B, H, D).

    The caller runs the aliased cache writer AFTERWARDS: attention only
    READS the old cache (WAR, not RAW, against the writer), so it is not
    stalled behind the row write, and the in-kernel rotary+quantize of the
    new K/V (for the virtual softmax tile) matches the writer's bytes
    bit-for-bit."""
    return _fused_attn_call(layer_idx, pos, q, k_new, v_new, cos, sin,
                            k_q, v_q, k_scale, v_scale, sm_scale=sm_scale,
                            rotary=rotary, interpret=interpret,
                            write_cache=False, int8_dots=int8_dots)


@functools.partial(jax.jit,
                   static_argnames=("sm_scale", "rotary", "interpret",
                                    "int8_dots"))
def fused_virtual_attn_flat(
    layer_idx: jax.Array,   # scalar int32
    pos: jax.Array,         # scalar int32 — aligned decode position
    q2d: jax.Array,         # (B, 1, H*D) — PRE-rotary queries, flat
    k_new: jax.Array,       # (B, H_kv, D) — PRE-rotary keys
    v_new: jax.Array,       # (B, H_kv, D)
    cos: Optional[jax.Array],    # (B, 1, D) rotary tables (None: non-rotary)
    sin: Optional[jax.Array],
    k_q: jax.Array,         # (L, B, H_kv, S, D) int8 — the OLD cache
    v_q: jax.Array,
    k_scale: jax.Array,     # (L, B, H_kv, S) f32
    v_scale: jax.Array,
    *,
    sm_scale: Optional[float] = None,
    rotary: bool = True,
    interpret: bool = False,
    int8_dots: bool = False,
) -> jax.Array:
    """fused_virtual_attn_stacked with FLAT pre-rotary q and flat output —
    q-rotary runs in-kernel and the (B, H*D) in/out layouts erase the XLA
    apply_rotary + rep-pad + rep-slice + reshape chain around the call
    (~8 us/layer of decode-scan glue).  MHA (rep == 1) only; returns
    (B, 1, H*D)."""
    return _fused_attn_call(layer_idx, pos, q2d, k_new, v_new, cos, sin,
                            k_q, v_q, k_scale, v_scale, sm_scale=sm_scale,
                            rotary=rotary, interpret=interpret,
                            write_cache=False, int8_dots=int8_dots,
                            flat_io=True)
