"""Isolate the depth-32 slowdown of int4_group_matmul_stacked_rawx seen in
decode_profile: gate_up measured 64.4 us/layer in an 8-layer stack but
81.9 us/layer in a 32-layer stack (same block shapes, same grid).  Sweep the
stack depth L and the layer index (first/mid/last, cycling) at the bench's
gate_up shape to see whether the per-call time depends on L, on the layer
offset, or on cycling through layers (DRAM locality)."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = 4
GS = 64
K, O, K_S = 4096, 22528, 256


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from smoothquant_tpu.kernels.int4_group_matmul import (
        int4_group_matmul_stacked_rawx,
    )
    from smoothquant_tpu.utils.benchtools import time_steps

    rng = np.random.default_rng(0)
    g_total, half = K // GS, K // 2
    x = jnp.asarray(rng.normal(size=(N, K)).astype(np.float32), jnp.bfloat16)
    nw = jnp.asarray(rng.uniform(0.5, 1.5, size=(K,)).astype(np.float32),
                     jnp.bfloat16)
    bytes_per_layer = half * O + g_total * O * 2 + K_S * O * 2

    for L in (4, 8, 16, 32):
        wp = jnp.asarray(rng.integers(-128, 128, size=(L, half, O),
                                      dtype=np.int8))
        ws = jnp.asarray(rng.uniform(0.01, 0.02,
                                     size=(L, g_total, O)).astype(np.float32),
                         jnp.bfloat16)
        wsal = jnp.asarray(rng.normal(size=(L, K_S, O)).astype(np.float32),
                           jnp.bfloat16)

        # weights as real ARGUMENTS: closing over them embeds them as jaxpr
        # constants, which both ships them in the remote-compile request
        # (HTTP 413 above ~100 MB) and lets XLA specialize on them
        def run_fixed(x_, idx, wp_, ws_, wsal_):
            return int4_group_matmul_stacked_rawx(
                idx, x_, nw, wp_, ws_, wsal_,
                group_size=GS, act_bits=4, num_salient=204,
                eps=1e-5, norm_kind="rms", out_dtype=jnp.bfloat16)

        # fixed layer index
        idx0 = jnp.asarray([0], jnp.int32)
        idxl = jnp.asarray([L - 1], jnp.int32)
        t0 = time_steps(run_fixed, (x, idx0, wp, ws, wsal), iters=32,
                        repeats=5)
        tl = time_steps(run_fixed, (x, idxl, wp, ws, wsal), iters=32,
                        repeats=5)

        # cycling through layers inside one scan (decode-like access pattern)
        def run_cycle(x_, wp_, ws_, wsal_):
            def body(carry, i):
                y = int4_group_matmul_stacked_rawx(
                    jnp.asarray(i, jnp.int32).reshape(1),
                    carry, nw, wp_, ws_, wsal_,
                    group_size=GS, act_bits=4, num_salient=204,
                    eps=1e-5, norm_kind="rms", out_dtype=jnp.bfloat16)
                return carry + y[:, :K] * 1e-6, None

            out, _ = jax.lax.scan(body, x_, jnp.arange(L))
            return out

        tc = time_steps(run_cycle, (x, wp, ws, wsal), iters=8, repeats=5)
        print(json.dumps({
            "L": L,
            "us_fixed_l0": round(t0 * 1e6, 1),
            "us_fixed_last": round(tl * 1e6, 1),
            "us_cycle_per_layer": round(tc / L * 1e6, 1),
            "gbps_cycle": round(bytes_per_layer * L / tc / 1e9, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
