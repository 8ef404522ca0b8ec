"""Dissect the int4 decode matmul: where do the non-DMA microseconds go?

Times, on the real chip, at decode shapes (N=8 padded, llama-7B linears):
  full        — the production int4_group_matmul kernel
  noepilogue  — same kernel with the per-group scale chain replaced by a
                raw int32 accumulate (isolates the scale-epilogue VPU cost)
  nounpack    — same kernel fed pre-unpacked int8 halves (isolates the
                nibble-unpack VPU cost; 2x the weight DMA of `full`)
  xla_int4    — pure-XLA grouped dot with jnp.int4 weight storage (native
                packed int4 layout; is Mosaic's unpack beatable?)
  xla_int8    — pure-XLA per-group dot with int8 weights (2x bytes, no
                unpack; the `promote per-group` alternative)
Prints one JSON line per (shape, variant) with ms and effective GB/s of
int4-equivalent weight bytes (so variants are comparable by time).
"""

from __future__ import annotations

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SHAPES = [(4096, 4096 + 1024), (4096, 11008 + 256), (11008 + 256, 4096),
          (4096, 3 * 4096), (4096, 2 * 11008 + 512)]
N = 8
GS = 64


def _log(m):
    import time
    print(f"# [{time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from smoothquant_tpu.utils.benchtools import time_steps

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.default_rng(0)

    for (k, o) in SHAPES:
        g_total = k // GS
        g_half = g_total // 2
        half = k // 2
        # weights: biased nibbles packed two-per-byte, split-half layout
        w_u = rng.integers(0, 16, size=(k, o), dtype=np.uint8)
        packed = (w_u[:half] | (w_u[half:] << 4)).astype(np.int8)
        ws = rng.uniform(0.01, 0.02, size=(g_total, o)).astype(np.float32)
        x_q = rng.integers(-127, 128, size=(N, k), dtype=np.int8)
        xs = rng.uniform(0.01, 0.02, size=(N, g_total)).astype(np.float32)

        packed_j = jnp.asarray(packed)
        ws_j = jnp.asarray(ws)
        x_j = jnp.asarray(x_q)
        xs_j = jnp.asarray(xs)
        int4_bytes = packed.nbytes + ws.nbytes

        from smoothquant_tpu.kernels.int_group_matmul import int_group_matmul
        from smoothquant_tpu.kernels.int4_group_matmul import int4_group_matmul

        sal = jnp.zeros((N, 0), jnp.bfloat16)
        wsal = jnp.zeros((0, o), jnp.bfloat16)

        def run_full(x, xsc, wp, wsc):
            return int4_group_matmul(x, xsc, wp, wsc, sal, wsal,
                                     group_size=GS, out_dtype=jnp.bfloat16)

        t = time_steps(jax.jit(run_full), (x_j, xs_j, packed_j, ws_j),
                       iters=50, repeats=5)
        print(json.dumps({"shape": [k, o], "variant": "full",
                          "ms": round(t * 1e3, 4),
                          "gbps_int4equiv": round(int4_bytes / t / 1e9, 1)}),
              flush=True)

        # ---- noepilogue: same blocking, raw int32 accumulate -------------
        tile_o = 2048 if o >= 8192 else 1024
        while o % tile_o:
            tile_o //= 2
        tile_g = 16 if (o >= 8192 or g_half >= 48) else 8
        while g_half % tile_g:
            tile_g //= 2

        def _ker_noepi(x_lo_ref, x_hi_ref, wp_ref, out_ref, *, gpt):
            kk = pl.program_id(2)

            @pl.when(kk == 0)
            def _():
                out_ref[:] = jnp.zeros_like(out_ref)

            w32v = pltpu.bitcast(wp_ref[:], jnp.int32)
            mask = jnp.int32(0x0F0F0F0F)
            w_lo = pltpu.bitcast(w32v & mask, jnp.int8)
            w_hi = pltpu.bitcast(jnp.right_shift(w32v, 4) & mask, jnp.int8)
            for gg in range(gpt):
                out_ref[:] += jax.lax.dot_general(
                    x_lo_ref[gg], w_lo[gg],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                out_ref[:] += jax.lax.dot_general(
                    x_hi_ref[gg], w_hi[gg],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)

        x3 = x_j.reshape(N, g_total, GS).transpose(1, 0, 2)
        wp4 = packed_j.reshape(g_half, GS, o)
        gh = g_half // tile_g
        grid = (1, o // tile_o, g_half // tile_g)

        def run_noepi(x3_, wp4_):
            return pl.pallas_call(
                functools.partial(_ker_noepi, gpt=tile_g),
                grid=grid,
                in_specs=[
                    pl.BlockSpec((tile_g, N, GS), lambda i, j, kk: (kk, i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((tile_g, N, GS),
                                 lambda i, j, kk, gh=gh: (kk + gh, i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((tile_g, GS, tile_o),
                                 lambda i, j, kk: (kk, 0, j),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((N, tile_o), lambda i, j, kk: (i, j),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((N, o), jnp.int32),
            )(x3_, x3_, wp4_)

        t = time_steps(jax.jit(run_noepi), (x3, wp4), iters=50, repeats=5)
        print(json.dumps({"shape": [k, o], "variant": "noepilogue",
                          "ms": round(t * 1e3, 4),
                          "gbps_int4equiv": round(int4_bytes / t / 1e9, 1)}),
              flush=True)

        # ---- nounpack: int8 halves pre-unpacked (2x DMA, no unpack) ------
        w8 = jnp.asarray(((w_u.astype(np.int8)) - 8))  # (K, O) int8

        def _ker_nounpack(x_ref, w_ref, out_ref, *, gpt):
            kk = pl.program_id(2)

            @pl.when(kk == 0)
            def _():
                out_ref[:] = jnp.zeros_like(out_ref)

            for gg in range(gpt):
                out_ref[:] += jax.lax.dot_general(
                    x_ref[gg], w_ref[gg],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)

        w83 = w8.reshape(g_total, GS, o)

        def run_nounpack(x3_, w83_):
            return pl.pallas_call(
                functools.partial(_ker_nounpack, gpt=tile_g),
                grid=(1, o // tile_o, g_total // tile_g),
                in_specs=[
                    pl.BlockSpec((tile_g, N, GS), lambda i, j, kk: (kk, i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((tile_g, GS, tile_o),
                                 lambda i, j, kk: (kk, 0, j),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((N, tile_o), lambda i, j, kk: (i, j),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((N, o), jnp.int32),
            )(x3_, w83_)

        t = time_steps(jax.jit(run_nounpack), (x3, w83), iters=50, repeats=5)
        print(json.dumps({"shape": [k, o], "variant": "nounpack_int8",
                          "ms": round(t * 1e3, 4),
                          "gbps_int4equiv": round(int4_bytes / t / 1e9, 1)}),
              flush=True)

        # ---- xla_int4: native jnp.int4 grouped dot ------------------------
        try:
            w4n = jnp.asarray((w_u.astype(np.int8) - 8), jnp.int4)  # (K, O)

            def run_xla4(x_, xs_, w_, ws_):
                xg = (x_.astype(jnp.float32)
                      * xs_.repeat(GS, axis=1)).astype(jnp.bfloat16)
                y = jax.lax.dot_general(
                    xg, w_.astype(jnp.bfloat16),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                del ws_
                return y.astype(jnp.bfloat16)

            # NOTE: per-group ws NOT applied (would need (N,G,O) intermediate)
            # — this probes the raw int4-storage dot speed only.
            t = time_steps(jax.jit(run_xla4), (x_j, xs_j, w4n, ws_j),
                           iters=50, repeats=5)
            print(json.dumps({"shape": [k, o], "variant": "xla_int4_raw",
                              "ms": round(t * 1e3, 4),
                              "gbps_int4equiv":
                              round(int4_bytes / t / 1e9, 1)}), flush=True)
        except Exception as e:  # int4 may be unsupported on this backend
            print(json.dumps({"shape": [k, o], "variant": "xla_int4_raw",
                              "error": str(e)[:120]}), flush=True)

        # ---- xla_int8 grouped: einsum with (N,G,O) intermediate -----------
        def run_xla8(x3_, xs_, w83_, ws_):
            p = jnp.einsum("gns,gso->ngo", x3_, w83_,
                           preferred_element_type=jnp.int32)
            y = jnp.einsum("ngo,ng,go->no", p.astype(jnp.float32), xs_, ws_)
            return y.astype(jnp.bfloat16)

        t = time_steps(jax.jit(run_xla8), (x3, xs_j, w83, ws_j),
                       iters=50, repeats=5)
        print(json.dumps({"shape": [k, o], "variant": "xla_int8_grouped",
                          "ms": round(t * 1e3, 4),
                          "gbps_int4equiv": round(int4_bytes / t / 1e9, 1)}),
              flush=True)
        _log(f"done {k}x{o}")


if __name__ == "__main__":
    main()
