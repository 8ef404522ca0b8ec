"""Shared CLI helpers: token streams, calibration batches, model forward fns."""

from __future__ import annotations

import numpy as np


def load_token_stream(args) -> np.ndarray:
    """Resolve the evaluation token stream.

    Priority: --tokens_path (pre-tokenized .npy, offline-friendly) else
    --dataset_path + --tokenizer_path (WikiText-2-style: text rows joined
    with "\\n\\n" and tokenized once, matching ppl_eval.py:38-40).
    """
    if getattr(args, "tokens_path", None):
        return np.load(args.tokens_path).reshape(-1).astype(np.int32)
    if getattr(args, "dataset_path", None):
        from datasets import load_dataset
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(args.tokenizer_path or args.model_path)
        ds = load_dataset("json", data_files=args.dataset_path, split="train")
        text = "\n\n".join(r["text"] for r in ds)
        return np.asarray(tok(text).input_ids, np.int32)
    raise SystemExit("need --tokens_path or --dataset_path")


def forward_fn(arch: str, cfg, quant=None):
    """logits_fn(params, ids) and tapped-forward builder for an architecture."""
    from smoothquant_tpu.models.common import ForwardContext
    from smoothquant_tpu.models.registry import get_arch

    mod = get_arch(arch)

    def logits_fn(params, ids):
        ctx = ForwardContext(quant=quant) if quant else None
        return mod.forward(params, ids, cfg, ctx=ctx)[0]

    def tapped_fn(params, ids, collector):
        mod.forward(params, ids, cfg, ctx=ForwardContext(taps=collector))

    return logits_fn, tapped_fn


def calib_batches(tokens: np.ndarray, num_samples: int, seq_len: int):
    import jax.numpy as jnp

    from smoothquant_tpu.quant.calibrate import make_calib_batches

    return [jnp.asarray(b) for b in make_calib_batches(tokens, num_samples, seq_len)]
