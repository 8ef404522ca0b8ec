"""Microbench the stacked int4 decode kernel at the flagship decode shapes
(N=8-padded matvec), without packing a full model — fast iteration on
kernel-internal changes (epilogue layout, scale broadcasts, tiles)."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = 4
GS = 64
L = 4  # stacked layers (enough for scalar-prefetch indexing to be real)
SHAPES = [(4096, 12288, 256), (4096, 4096, 256), (4096, 22528, 256),
          (11264, 4096, 576)]


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from smoothquant_tpu.kernels.int4_group_matmul import (
        int4_group_matmul_stacked,
    )
    from smoothquant_tpu.utils.benchtools import time_steps

    rng = np.random.default_rng(0)
    total_ms = 0.0
    for (k, o, k_s) in SHAPES:
        g_total = k // GS
        half = k // 2
        wp = jnp.asarray(rng.integers(-128, 128, size=(L, half, o),
                                      dtype=np.int8))
        ws = jnp.asarray(rng.uniform(0.01, 0.02,
                                     size=(L, g_total, o)).astype(np.float32))
        wsal = jnp.asarray(rng.normal(size=(L, k_s, o)).astype(np.float32),
                           jnp.bfloat16)
        xq = jnp.asarray(rng.integers(-8, 8, size=(N, k), dtype=np.int8))
        xs = jnp.asarray(rng.uniform(0.01, 0.1,
                                     size=(N, g_total)).astype(np.float32))
        xsal = jnp.asarray(rng.normal(size=(N, k_s)).astype(np.float32),
                           jnp.bfloat16)
        idx = jnp.asarray([1], jnp.int32)

        def run(idx_, xq_, xs_, xsal_, wp_=wp, ws_=ws, wsal_=wsal):
            return int4_group_matmul_stacked(
                idx_, xq_, xs_, wp_, ws_, xsal_, wsal_,
                group_size=GS, out_dtype=jnp.bfloat16)

        t = time_steps(run, (idx, xq, xs, xsal), iters=64, repeats=5)
        int4_bytes = (half * o + g_total * o * 4 + k_s * o * 2)
        print(json.dumps({"shape": [k, o], "ms": round(t * 1e3, 4),
                          "gbps": round(int4_bytes / t / 1e9, 1)}),
              flush=True)
        total_ms += t * 1e3
    print(json.dumps({"sum_ms": round(total_ms, 4),
                      "layer_equiv_us": round(total_ms * 1e3, 1)}))


if __name__ == "__main__":
    main()
