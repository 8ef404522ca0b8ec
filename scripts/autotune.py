"""Autotune the int/dequant kernel crossover on the actual chip.

Replaces the hard-coded _INT_PATH_MAX_TOKENS=256 heuristic (VERDICT r1 weak
#10) with a measurement: times real_quant_linear under both computes over a
token-count sweep at the flagship MLP shape and writes the crossover to
smoothquant_tpu/kernels/tuned.json, which real_linear loads at import.

Usage: python scripts/autotune.py  (runs on the default backend — the TPU)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TOKENS = (32, 64, 128, 256, 384, 512, 768, 1024)
SHAPE = (4096, 11008)


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from smoothquant_tpu.kernels.pack import pack_linear
    from smoothquant_tpu.kernels.real_linear import real_quant_linear
    from smoothquant_tpu.quant import w4a4_group
    from smoothquant_tpu.utils import roofline
    from smoothquant_tpu.utils.benchtools import time_steps

    rng = np.random.default_rng(0)
    k, o = SHAPE
    qcfg = w4a4_group(group_size=64, salient_prop=0.05)
    w = (rng.standard_normal((o, k)) * 0.02).astype(np.float32)
    imp = rng.uniform(0.1, 1.0, size=(k,))
    packed = pack_linear({"weight": jnp.asarray(w, jnp.bfloat16), "bias": None},
                         qcfg, importance=imp)

    measured = {}
    crossover = TOKENS[0]
    for n in TOKENS:
        x = jnp.asarray(rng.standard_normal((n, k)), jnp.bfloat16)
        ts = {}
        for compute in ("int", "dequant"):
            def step(x_, c=compute):
                return real_quant_linear(packed, x_, compute=c)

            iters = 256 if n <= 64 else max(32, 8192 // n)
            ts[compute] = time_steps(jax.jit(step), (x,), iters=iters,
                                     repeats=5)
        measured[str(n)] = {c: round(t * 1e3, 4) for c, t in ts.items()}
        print(f"# n={n}: int {ts['int']*1e3:.3f} ms, "
              f"dequant {ts['dequant']*1e3:.3f} ms", file=sys.stderr,
              flush=True)
        if ts["int"] <= ts["dequant"]:
            crossover = n

    # --- identity-int8 (promote_int8 / lm_head) path: fused Pallas kernel
    # vs the pure-XLA dot+epilogue composition.  Writes the N below which
    # XLA wins (its tiny-N matvec dispatch beats the kernel's tiled grid).
    from smoothquant_tpu.kernels.int8_prefill import int8_prefill_matmul
    from smoothquant_tpu.kernels.pack import promote_int8

    pk = promote_int8(pack_linear(
        {"weight": jnp.asarray(w, jnp.bfloat16), "bias": None}, qcfg,
        importance=imp, nibble=True))
    sw = pk.w_scales_t.astype(jnp.float32).reshape(1, -1)
    k_s = pk.w_sal_t.shape[0]
    w_sal = pk.w_sal_t.astype(jnp.bfloat16)

    def xla_path(sx_, xq, xs):
        acc = jax.lax.dot_general(
            xq, pk.w_qt, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * sx_ * sw
        y = y + jax.lax.dot_general(
            xs, w_sal, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return y.astype(jnp.bfloat16)

    def kernel_path(sx_, xq, xs):
        return int8_prefill_matmul(xq, sx_, pk.w_qt, sw, xs, w_sal,
                                   out_dtype=jnp.bfloat16)

    id_measured = {}
    prefill_min = TOKENS[-1] + 1
    for n in TOKENS:
        # sx rides FIRST (float) so time_steps' anti-memoization
        # perturbation feeds an operand both paths depend on
        sx = jnp.asarray(rng.uniform(0.001, 0.01, (n, 1)), jnp.float32)
        xq = jnp.asarray(rng.integers(-127, 128, (n, k)), jnp.int8)
        xs = jnp.asarray(rng.standard_normal((n, k_s)), jnp.bfloat16)
        iters = 256 if n <= 64 else max(32, 8192 // n)
        t_x = time_steps(xla_path, (sx, xq, xs), iters=iters, repeats=5)
        t_k = time_steps(kernel_path, (sx, xq, xs), iters=iters, repeats=5)
        id_measured[str(n)] = {"xla": round(t_x * 1e3, 4),
                               "kernel": round(t_k * 1e3, 4)}
        print(f"# identity n={n}: xla {t_x*1e3:.3f} ms, "
              f"kernel {t_k*1e3:.3f} ms", file=sys.stderr, flush=True)
        if t_k <= t_x and n < prefill_min:
            prefill_min = n

    out = {
        "int_path_max_tokens": crossover,
        "prefill_kernel_min_tokens": prefill_min,
        "shape": list(SHAPE),
        "recipe": "w4a4 g64 5%-salient int8-container",
        "chip": roofline.detect_chip().name,
        "measured_ms": measured,
        "identity_measured_ms": id_measured,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "smoothquant_tpu", "kernels", "tuned.json")
    with open(os.path.abspath(path), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
