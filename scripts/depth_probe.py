"""Decompose the full-depth decode step: time the fused packed model at
several depths; the slope is the true per-layer cost under the full-scale
scan, the intercept is everything else (lm_head, embed, final norm, scan
setup, dispatch)."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DEPTHS = (8, 16, 32)
BATCH, CACHE = 4, 512


def main() -> None:
    import dataclasses
    import gc

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from smoothquant_tpu.kernels.pack import pack_linear
    from smoothquant_tpu.models import llama
    from smoothquant_tpu.models.common import ForwardContext
    from smoothquant_tpu.quant import QuantConfig, w4a4_group
    from smoothquant_tpu.utils.benchtools import time_steps

    qcfg = w4a4_group(group_size=64, salient_prop=0.05)
    head_qcfg = QuantConfig(weight_quant="per_channel", act_quant="per_token",
                            quant_bits=8)
    rng = np.random.default_rng(0)

    def fuse(*lins):
        return {"weight": jnp.concatenate([l["weight"] for l in lins], 0),
                "bias": None}

    def pk(lin, imp):
        return pack_linear(lin, qcfg, importance=imp, nibble=True,
                           align_k_groups=8, align_o=1024)

    results = {}
    key = jax.random.PRNGKey(2)
    for depth in DEPTHS:
        cfg = dataclasses.replace(llama.LlamaConfig.llama2_7b(),
                                  num_hidden_layers=depth)
        h, idim = cfg.hidden_size, cfg.intermediate_size
        layers = {}
        for i in range(depth):
            lp = llama.init_layer_params(jax.random.fold_in(key, i), cfg)
            sa, mlp = lp["self_attn"], lp["mlp"]
            lp["self_attn"] = {
                "qkv_proj": pk(fuse(sa["q_proj"], sa["k_proj"], sa["v_proj"]),
                               rng.uniform(0.1, 1.0, size=(h,))),
                "o_proj": pk(sa["o_proj"], rng.uniform(0.1, 1.0, size=(h,))),
            }
            lp["mlp"] = {
                "gate_up_proj": pk(fuse(mlp["gate_proj"], mlp["up_proj"]),
                                   rng.uniform(0.1, 1.0, size=(h,))),
                "down_proj": pk(mlp["down_proj"],
                                rng.uniform(0.1, 1.0, size=(idim,))),
            }
            layers[str(i)] = lp
        lm_head = llama._init_lin(jax.random.fold_in(key, 1000),
                                  cfg.vocab_size, h, False, jnp.bfloat16)
        packed = {
            "embed_tokens": {"weight": jax.random.normal(
                jax.random.fold_in(key, 1001), (cfg.vocab_size, h),
                jnp.bfloat16) * 0.02},
            "layers": layers,
            "norm": {"weight": jnp.ones((h,), jnp.bfloat16)},
            "lm_head": pack_linear(lm_head, head_qcfg),
        }
        del lm_head, layers
        packed = llama.stack_layers(packed, cfg)
        gc.collect()
        caches = llama.stacked_caches(cfg, BATCH, CACHE, jnp.bfloat16,
                                      pos=CACHE - 64, quant_kv=True)
        ctx = ForwardContext(quant=qcfg, compute="int")
        tok = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(BATCH, 1)))

        def step(t, p, c, cfg=cfg, ctx=ctx):
            logits, _ = llama.forward(p, t, cfg, ctx=ctx, caches=c)
            return logits[:, -1]

        t = time_steps(jax.jit(step), (tok, packed, caches), iters=32,
                       repeats=5)
        results[depth] = t
        print(f"# depth {depth}: {t*1e3:.3f} ms", file=sys.stderr, flush=True)
        del packed, caches
        gc.collect()

    d = sorted(results)
    slope = (results[d[-1]] - results[d[0]]) / (d[-1] - d[0])
    intercept = results[d[-1]] - slope * d[-1]
    print(json.dumps({
        "ms_per_depth": {str(k): round(v * 1e3, 3) for k, v in results.items()},
        "per_layer_ms": round(slope * 1e3, 4),
        "intercept_ms": round(intercept * 1e3, 3),
    }))


if __name__ == "__main__":
    main()
