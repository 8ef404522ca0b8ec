"""Isolate the prefetch-scan dead-time floor.

Times a lax.scan whose body is ONLY the chained stacked int4 matmuls
(qkv -> o -> gate_up -> down, data-dependent like the real layer), then
adds attention, then norms+quant chains — comparing each against the sum
of standalone kernel times to localize inter-op gaps.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

L = 32
B = 4


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from smoothquant_tpu.kernels.pack import fold_input_perm, pack_linear
    from smoothquant_tpu.kernels.real_linear import real_quant_linear
    from smoothquant_tpu.models import llama
    from smoothquant_tpu.quant import w4a4_group
    from smoothquant_tpu.utils.benchtools import time_steps

    qcfg = w4a4_group(group_size=64, salient_prop=0.05)
    rng = np.random.default_rng(0)
    cfg = llama.LlamaConfig.llama2_7b()
    h, inter = cfg.hidden_size, cfg.intermediate_size

    def pk(o, k, imp):
        lin = {"weight": jnp.asarray(
            rng.normal(size=(o, k)).astype(np.float32) * k ** -0.5,
            jnp.bfloat16), "bias": None}
        return pack_linear(lin, qcfg, importance=imp, act_absmax=imp,
                           nibble=True, align_k_groups=8, align_o=2048)

    import dataclasses as dc

    def prep(p):
        return dc.replace(p, meta=dc.replace(p.meta, pre_permuted=True))

    imp_h = rng.uniform(0.1, 1.0, size=(h,))
    imp_i = rng.uniform(0.1, 1.0, size=(inter,))
    layers = []
    for i in range(L):
        qkv = prep(pk(3 * h, h, imp_h))
        op = pk(h, h, imp_h)
        dp = pk(h, inter, imp_i)
        gu = prep(pk(2 * inter, h, imp_h))
        layers.append({"qkv": qkv, "o": op, "gu": gu, "dp": dp})
        if i % 8 == 7:
            print(f"# packed {i+1}/{L}", file=sys.stderr, flush=True)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)

    x = jnp.asarray(rng.normal(size=(B, h)), jnp.bfloat16)

    def matmuls_only(x, st):
        def body(carry, i):
            y = real_quant_linear(st["qkv"], carry, compute="int",
                                  layer_idx=i)
            y = real_quant_linear(st["o"], y[..., :h].astype(jnp.bfloat16),
                                  compute="int", layer_idx=i)
            g = real_quant_linear(st["gu"], y[..., :h].astype(jnp.bfloat16),
                                  compute="int", layer_idx=i)
            d = real_quant_linear(
                st["dp"],
                (g[..., :inter] * jax.nn.sigmoid(g[..., inter:])
                 ).astype(jnp.bfloat16),
                compute="int", layer_idx=i)
            return carry + d[..., :h].astype(carry.dtype) * 0.01, None

        unroll = int(os.environ.get("UNROLL", "1"))
        out, _ = jax.lax.scan(body, x, jnp.arange(L), unroll=unroll)
        return out

    t = time_steps(lambda xx, st: matmuls_only(xx, st), (x, stacked),
                   iters=16, repeats=5)
    wpl = sum(a.nbytes for a in jax.tree.leaves(stacked)) / L
    print(f"matmuls-only scan: {t*1e3:.3f} ms  = {t/L*1e6:.1f} us/layer "
          f"({wpl/1e6:.1f} MB/layer weights -> "
          f"{wpl/(t/L)/1e9:.0f} GB/s)")


if __name__ == "__main__":
    main()
