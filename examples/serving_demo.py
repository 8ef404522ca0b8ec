"""Continuous-batching serving demo over a quantized model.

Shows the capability the reference never had (SURVEY.md §5 "also absent"):
mixed-length requests flowing through a slot-based batcher with a W8A8
quantized model and greedy decoding.  Runs fully offline on a tiny random
Llama.

  python examples/serving_demo.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax

    from smoothquant_tpu.models import llama
    from smoothquant_tpu.models.registry import quantize_model
    from smoothquant_tpu.quant import QuantConfig
    from smoothquant_tpu.serve import ContinuousBatcher, Request

    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    qcfg = QuantConfig(weight_quant="per_channel", act_quant="per_token",
                       quant_bits=8)
    qparams = quantize_model("llama", params, cfg, qcfg)

    batcher = ContinuousBatcher(llama, qparams, cfg, quant=qcfg,
                                max_batch=2, max_len=128)
    rng = np.random.default_rng(0)
    for uid, n in enumerate([5, 11, 3, 8]):
        batcher.submit(Request(
            uid=uid, prompt=rng.integers(0, cfg.vocab_size, size=(n,)),
            max_new_tokens=6,
        ))
    print("4 requests queued over 2 slots; running to completion...")
    done = batcher.run_to_completion()
    for r in sorted(done, key=lambda r: r.uid):
        print(f"request {r.uid}: prompt[{len(r.prompt)}] -> {r.generated}")


if __name__ == "__main__":
    main()
