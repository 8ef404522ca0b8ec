"""Benchmark: flagship quantized-forward throughput on the local accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline (BASELINE.json): tokens/sec/chip for Llama-2-7B-dimension W4A4
g64 5%-salient forward.  vs_baseline is the ratio against the bf16
unquantized forward of the same model on the same chip (>1.0 = quantized
path is faster than bf16).  The reference publishes no latency numbers
(SURVEY.md §6), so bf16-on-chip is the honest baseline.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _time_fn(fn, ids, params, iters: int = 8) -> float:
    # chained in-jit timing; see utils/benchtools.py for why naive timing
    # lies on the tunneled TPU backend
    from smoothquant_tpu.utils.benchtools import time_steps

    return time_steps(lambda i, p: fn(p, i), (ids, params), iters=iters)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from smoothquant_tpu.models import ForwardContext, llama
    from smoothquant_tpu.models.registry import quantize_model
    from smoothquant_tpu.quant import w4a4_group
    from __graft_entry__ import _flagship

    batch, seq = 1, 2048
    cfg, params = _flagship(num_layers=4)
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
    qparams = quantize_model("llama", params, cfg, qcfg, input_feat=feat)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(batch, seq)))

    ctx = ForwardContext(quant=qcfg)
    quant_fn = lambda p, i: llama.forward(p, i, cfg, ctx=ctx)[0]
    bf16_fn = lambda p, i: llama.forward(p, i, cfg)[0]

    t_quant = _time_fn(quant_fn, ids, qparams)
    t_bf16 = _time_fn(bf16_fn, ids, params)

    tokens_per_s = batch * seq / t_quant
    vs_baseline = t_bf16 / t_quant

    print(json.dumps({
        "metric": "llama7b-dim W4A4 g64 5%-salient prefill throughput",
        "value": round(tokens_per_s, 1),
        "unit": "tokens/s/chip",
        "vs_baseline": round(vs_baseline, 4),
    }))
    print(
        f"# quant {t_quant*1e3:.1f} ms/step, bf16 {t_bf16*1e3:.1f} ms/step, "
        f"{batch}x{seq} tokens, {cfg.num_hidden_layers} layers, "
        f"platform={jax.devices()[0].platform}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
