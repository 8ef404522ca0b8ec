"""Benchmark: flagship quantized decode throughput on the local accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline (BASELINE.json): Llama-2-7B-dimension decoder slice, W4A4 g64
5%-salient, REAL packed execution (int4-range weights in HBM, int8-MXU
group matmul with output-side scaling).  Measured: single-token decode step
over a warm KV cache at batch 8.  vs_baseline = speedup over the bf16
unquantized decode of the same model on the same chip (the reference
publishes no latency numbers, SURVEY.md §6 — bf16-on-chip is the honest
baseline; >1.0 means the quantized path is faster).
"""

from __future__ import annotations

import json
import sys

import numpy as np


def _log(msg: str) -> None:
    import time

    print(f"# [{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

    # persistent compile cache — XLA/Mosaic compiles dominate wall time on
    # the tunneled backend; cached executables make reruns fast
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from smoothquant_tpu.models import ForwardContext, llama
    from smoothquant_tpu.models.common import KVCache
    from smoothquant_tpu.models.registry import pack_model
    from smoothquant_tpu.quant import w4a4_group
    from smoothquant_tpu.utils.benchtools import time_steps
    from __graft_entry__ import _flagship

    batch, cache_len, n_layers = 4, 512, 4
    _log("init flagship params")
    cfg, params = _flagship(num_layers=n_layers)
    qcfg = w4a4_group(group_size=64, salient_prop=0.05)
    rng = np.random.default_rng(0)
    feat = {
        f"model.layers.{i}.{g}.{p}": rng.uniform(
            0.1, 1.0,
            size=(cfg.intermediate_size if p == "down_proj" else cfg.hidden_size,))
        for i in range(cfg.num_hidden_layers)
        for g, ps in (("self_attn", ("q_proj", "k_proj", "v_proj", "o_proj")),
                      ("mlp", ("gate_proj", "up_proj", "down_proj")))
        for p in ps
    }
    _log("packing model")
    packed = pack_model("llama", params, cfg, qcfg, input_feat=feat, nibble=True)
    ctx = ForwardContext(quant=qcfg, compute="int")
    _log("packed")

    def make_caches():
        caches = [
            KVCache.create(batch, cache_len, cfg.num_key_value_heads,
                           cfg.head_dim, jnp.bfloat16)
            for _ in range(cfg.num_hidden_layers)
        ]
        # warm cache: pretend cache_len - 64 tokens are present
        return [KVCache(k=c.k, v=c.v, pos=jnp.int32(cache_len - 64)) for c in caches]

    caches = make_caches()
    tok = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(batch, 1)))

    # params/caches must be jit ARGUMENTS, not closure constants — closed-over
    # arrays get baked into the module as constants and constant-folding a
    # multi-GB model explodes compile time (utils/benchtools.py caveat).
    def decode_quant(t, p, c):
        logits, _ = llama.forward(p, t, cfg, ctx=ctx, caches=c)
        return logits[:, -1]

    def decode_bf16(t, p, c):
        logits, _ = llama.forward(p, t, cfg, caches=c)
        return logits[:, -1]

    _log("timing quant decode (compiles on first run)")
    t_q = time_steps(decode_quant, (tok, packed, caches), iters=16)
    _log(f"quant decode {t_q*1e3:.2f} ms; timing bf16 decode")
    t_bf = time_steps(decode_bf16, (tok, params, caches), iters=16)
    _log(f"bf16 decode {t_bf*1e3:.2f} ms")

    tokens_per_s = batch / t_q
    vs_baseline = t_bf / t_q

    print(json.dumps({
        "metric": "llama7b-dim W4A4 g64 5%-salient int4-packed decode throughput",
        "value": round(tokens_per_s, 1),
        "unit": "tokens/s/chip",
        "vs_baseline": round(vs_baseline, 4),
    }))
    print(
        f"# quant decode {t_q*1e3:.2f} ms/step, bf16 {t_bf*1e3:.2f} ms/step, "
        f"batch={batch}, cache={cache_len}, layers={n_layers}, "
        f"platform={jax.devices()[0].platform}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
