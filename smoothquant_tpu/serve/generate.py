"""Generation: jitted prefill + decode-step over a static KV cache.

Capability the reference inherits from HF but never exercises (SURVEY.md §5
"also absent"); here it is first-class, quantization-aware (the ForwardContext
threads the simulated or real quant path), and mesh-shardable (params may be
device_put with parallel.param_specs before building the engine).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from smoothquant_tpu.models.common import ForwardContext, KVCache, QuantKVCache


@dataclasses.dataclass
class GenerationConfig:
    max_new_tokens: int = 64
    temperature: float = 0.0  # 0 → greedy
    eos_token_id: Optional[int] = None
    seed: int = 0


def sample_token(logits: jax.Array, temperature: float, key) -> jax.Array:
    """logits (B, V) → token ids (B,). temperature 0 = argmax."""
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return jax.random.categorical(key, logits / temperature, axis=-1).astype(jnp.int32)


class Generator:
    """Single-sequence/batch generation on top of a model module.

    model_mod: models.llama / models.opt (needs forward(params, ids, cfg,
    ctx, caches) and cfg.num_hidden_layers etc.).
    """

    def __init__(self, model_mod, params, cfg, quant=None,
                 kv_dtype=None, max_len: int = 2048, quant_kv: bool = False,
                 compute: str = "auto", interpret: bool = False):
        self.mod = model_mod
        self.params = params
        self.cfg = cfg
        self.ctx = ForwardContext(quant=quant, compute=compute,
                                  interpret=interpret)
        self.max_len = max_len
        self.kv_dtype = kv_dtype or jnp.dtype(cfg.dtype)
        self._cache_cls = QuantKVCache if quant_kv else KVCache
        n_kv = getattr(cfg, "num_key_value_heads", cfg.num_attention_heads)
        self._n_kv = n_kv

        @jax.jit
        def _prefill(params, ids, caches):
            logits, caches = self.mod.forward(params, ids, self.cfg,
                                              ctx=self.ctx, caches=caches)
            return logits[:, -1, :], caches

        @jax.jit
        def _decode(params, tok, caches):
            logits, caches = self.mod.forward(params, tok[:, None], self.cfg,
                                              ctx=self.ctx, caches=caches)
            return logits[:, -1, :], caches

        self._prefill, self._decode = _prefill, _decode

    def _new_caches(self, batch: int):
        return [
            self._cache_cls.create(batch, self.max_len, self._n_kv,
                                   self.cfg.head_dim, self.kv_dtype)
            for _ in range(self.cfg.num_hidden_layers)
        ]

    def generate(self, prompt_ids: np.ndarray, gen: GenerationConfig) -> np.ndarray:
        """prompt_ids (B, S) → (B, S + new) generated ids (greedy/temperature)."""
        prompt_ids = np.atleast_2d(np.asarray(prompt_ids))
        b, s = prompt_ids.shape
        if s + gen.max_new_tokens > self.max_len:
            raise ValueError(
                f"prompt({s}) + max_new_tokens({gen.max_new_tokens}) exceeds "
                f"max_len({self.max_len})"
            )
        caches = self._new_caches(b)
        key = jax.random.PRNGKey(gen.seed)

        logits, caches = self._prefill(self.params, jnp.asarray(prompt_ids), caches)
        out = [prompt_ids]
        done = np.zeros(b, bool)
        for _ in range(gen.max_new_tokens):
            key, sub = jax.random.split(key)
            tok = sample_token(logits, gen.temperature, sub)
            tok_np = np.asarray(tok)
            if gen.eos_token_id is not None:
                tok_np = np.where(done, gen.eos_token_id, tok_np)
                done |= tok_np == gen.eos_token_id
            out.append(tok_np[:, None])
            if gen.eos_token_id is not None and done.all():
                break
            logits, caches = self._decode(self.params, jnp.asarray(tok_np), caches)
        return np.concatenate(out, axis=1)
