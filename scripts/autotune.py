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

    out = {
        "int_path_max_tokens": crossover,
        "shape": list(SHAPE),
        "recipe": "w4a4 g64 5%-salient int8-container",
        "chip": roofline.detect_chip().name,
        "measured_ms": measured,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "smoothquant_tpu", "kernels", "tuned.json")
    with open(os.path.abspath(path), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
