"""Is the stacked-weight slowdown a strided-DMA effect?

The rawx kernels stream (tile_g*gs, tile_o) weight blocks out of a
(L, g_half, gs, O) array: each 2 MB block is 1024 rows of tile_o bytes at
an O-byte stride — ~23 MB of address-space span per block at the bench's
gate_up shape.  This probe times a minimal sum-reduction kernel over the
SAME bytes in (a) the current row-strided layout and (b) a block-contiguous
(L, K_BLOCKS, O_BLOCKS, tile_g*gs, tile_o) layout, at L in {8, 32}, to
isolate pure DMA-pattern cost from the matmul.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

K, O = 4096, 22528
GS = 64
TILE_G, TILE_O = 16, 2048
HALF = K // 2            # nibble-packed rows
G_HALF = HALF // GS      # 32


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from smoothquant_tpu.utils.benchtools import time_steps

    rng = np.random.default_rng(0)
    bs = TILE_G * GS                       # 1024 rows per block
    nk = G_HALF // TILE_G                  # 2 k-steps
    nj = O // TILE_O                       # 11 j-steps
    bytes_per_layer = HALF * O

    def kernel(idx_ref, w_ref, o_ref):
        j = pl.program_id(0)
        k = pl.program_id(1)

        @pl.when(jnp.logical_and(j == 0, k == 0))
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        o_ref[:] += jnp.sum(w_ref[:].astype(jnp.int32)).astype(jnp.float32)

    def run_strided(idx, w):
        # w: (L, HALF, O); block = (1, bs, TILE_O) → row-strided DMA
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(nj, nk),
                in_specs=[pl.BlockSpec((1, bs, TILE_O),
                                       lambda j, k, s: (s[0], k, j),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, 128),
                                       lambda j, k, s: (0, 0),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        )(idx, w)

    def run_blocked(idx, w):
        # w: (L, nk, nj, bs, TILE_O); each block contiguous
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(nj, nk),
                in_specs=[pl.BlockSpec((1, 1, 1, bs, TILE_O),
                                       lambda j, k, s: (s[0], k, j, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, 128),
                                       lambda j, k, s: (0, 0),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        )(idx, w)

    for L in (8, 32):
        w = jnp.asarray(rng.integers(-128, 128, size=(L, HALF, O),
                                     dtype=np.int8))
        # blocked copy: (L, nk, nj, bs, TILE_O)
        wb = jnp.asarray(
            np.ascontiguousarray(
                np.asarray(w).reshape(L, nk, bs, nj, TILE_O)
                .transpose(0, 1, 3, 2, 4)))

        def cyc(runner, ww):
            def run(x0, ww_):
                def body(carry, i):
                    y = runner(jnp.asarray(i, jnp.int32).reshape(1), ww_)
                    return carry + jnp.sum(y) * 1e-9, None
                out, _ = jax.lax.scan(body, x0, jnp.arange(L))
                return out
            return time_steps(run, (jnp.float32(0.0), ww), iters=8,
                              repeats=5) / L

        t_s = cyc(run_strided, w)
        t_b = cyc(run_blocked, wb)
        print(json.dumps({
            "L": L,
            "us_strided": round(t_s * 1e6, 1),
            "us_blocked": round(t_b * 1e6, 1),
            "gbps_strided": round(bytes_per_layer / t_s / 1e9, 1),
            "gbps_blocked": round(bytes_per_layer / t_b / 1e9, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
