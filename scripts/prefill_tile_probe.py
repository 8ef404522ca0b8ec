"""Tile sweep + N-crossover for the fused int8 prefill kernel vs the pure
XLA composition, at (N, 4096->11008) and the lm_head (N, 4096->32000)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from smoothquant_tpu.kernels.int8_prefill import int8_prefill_matmul
    from smoothquant_tpu.utils.benchtools import time_steps

    rng = np.random.default_rng(0)

    # sx (f32) rides FIRST so time_steps can perturb it per repeat —
    # an int8 first arg defeats the anti-memoization perturbation and the
    # tunnel memoizes whole runs (measured "0.004 ms" 131 MB matmuls)
    def xla_comp(sx_, xq, wq, sw_, xs, ws):
        acc = jax.lax.dot_general(
            xq, wq, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * sx_ * sw_
        if xs.shape[1]:
            y = y + jax.lax.dot_general(
                xs, ws, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        return y.astype(jnp.bfloat16)

    import itertools

    shapes = [(4096, 11008)]
    ns = (256, 1024)
    for (K, O), N in itertools.product(shapes, ns):
        if True:
            k_s = 256
            x_q = jnp.asarray(rng.integers(-127, 128, size=(N, K)), jnp.int8)
            sx = jnp.asarray(rng.uniform(0.001, 0.01, size=(N, 1)),
                             jnp.float32)
            w_qt = jnp.asarray(rng.integers(-127, 128, size=(K, O)), jnp.int8)
            sw = jnp.asarray(rng.uniform(0.001, 0.01, size=(1, O)),
                             jnp.float32)
            x_sal = jnp.asarray(rng.normal(size=(N, k_s)), jnp.bfloat16)
            w_sal = jnp.asarray(rng.normal(size=(k_s, O)) * 0.02,
                                jnp.bfloat16)
            args = (sx, x_q, w_qt, sw, x_sal, w_sal)
            t_x = time_steps(xla_comp, args, iters=16, repeats=3)
            line = f"(N={N:5d}, {K}->{O})  xla {t_x*1e3:7.3f} ms |"
            best = (t_x, "xla")
            for tiles in [(0, 0, 0), (1024, 256, 4096)]:
                tn, to, tk = tiles
                if tn > max(N, 8):
                    continue

                def fk(sx_, xq, wq, sw_, xs, ws, _t=tiles):
                    return int8_prefill_matmul(
                        xq, sx_, wq, sw_, xs, ws, out_dtype=jnp.bfloat16,
                        tile_n=_t[0], tile_o=_t[1], tile_k=_t[2])

                try:
                    t_k = time_steps(fk, args, iters=16, repeats=3)
                except Exception as e:  # noqa: BLE001 — tile may not fit
                    line += f" {tiles}: FAIL({type(e).__name__})"
                    continue
                line += f" {tiles}: {t_k*1e3:6.3f}"
                if t_k < best[0]:
                    best = (t_k, str(tiles))
            print(line + f"   best={best[1]}")


if __name__ == "__main__":
    main()
