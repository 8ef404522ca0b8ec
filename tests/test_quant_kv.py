"""INT8 KV cache: numerics + serving integration."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from smoothquant_tpu.models import llama as jllama
from smoothquant_tpu.models.common import KVCache, QuantKVCache
from smoothquant_tpu.serve import ContinuousBatcher, GenerationConfig, Generator, Request


@pytest.fixture(scope="module")
def tiny_llama():
    cfg = jllama.LlamaConfig.tiny()
    params = jllama.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_quant_cache_roundtrip_accuracy():
    rng = np.random.default_rng(0)
    k = rng.normal(size=(2, 5, 4, 16)).astype(np.float32)
    v = rng.normal(size=(2, 5, 4, 16)).astype(np.float32)
    c = QuantKVCache.create(2, 8, 4, 16)
    c = c.update(jnp.asarray(k), jnp.asarray(v))
    kd, vd = c.read()  # head-major (B, H, S, D)
    # int8 + per-head scales: relative error ~1/127 plus bf16 read rounding
    np.testing.assert_allclose(
        np.asarray(kd, np.float32).transpose(0, 2, 1, 3)[:, :5], k,
        atol=np.abs(k).max() / 64)
    np.testing.assert_allclose(
        np.asarray(vd, np.float32).transpose(0, 2, 1, 3)[:, :5], v,
        atol=np.abs(v).max() / 64)
    assert int(c.pos) == 5


def test_quant_cache_per_slot_positions():
    rng = np.random.default_rng(1)
    c = QuantKVCache.create(2, 8, 2, 8, per_slot=True)
    c = c._replace(pos=jnp.asarray([0, 3], jnp.int32))
    k = jnp.asarray(rng.normal(size=(2, 1, 2, 8)).astype(np.float32))
    c2 = c.update(k, k)
    np.testing.assert_array_equal(np.asarray(c2.pos), [1, 4])
    # slot 1's write landed at position 3 (head-major: pos is axis 2)
    assert np.abs(np.asarray(c2.k_q)[1, :, 3]).sum() > 0
    assert np.abs(np.asarray(c2.k_q)[1, :, 0]).sum() == 0


def test_generator_quant_kv_close_to_fp_cache(tiny_llama):
    cfg, params = tiny_llama
    prompt = np.random.default_rng(2).integers(0, cfg.vocab_size, size=(1, 6))
    gen_fp = Generator(jllama, params, cfg, max_len=32)
    gen_q = Generator(jllama, params, cfg, max_len=32, quant_kv=True)
    out_fp = gen_fp.generate(prompt, GenerationConfig(max_new_tokens=5))
    out_q = gen_q.generate(prompt, GenerationConfig(max_new_tokens=5))
    # int8 cache is lossy; most greedy tokens should still agree on a tiny model
    agree = (out_fp[0, 6:] == out_q[0, 6:]).mean()
    assert agree >= 0.6, (out_fp, out_q)


def test_stacked_quant_kv_matches_per_layer(tiny_llama):
    cfg, params = tiny_llama
    rng = np.random.default_rng(4)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(2, 5)))
    caches = [QuantKVCache.create(2, 8, cfg.num_key_value_heads, cfg.head_dim)
              for _ in range(cfg.num_hidden_layers)]
    scache = jllama.stacked_caches(cfg, 2, 8, jnp.float32, quant_kv=True)
    stacked = jllama.stack_layers(params, cfg)
    ref, ref_caches = jllama.forward(params, ids, cfg, caches=caches)
    got, got_caches = jllama.forward(stacked, ids, cfg, caches=scache)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
    for i, rc in enumerate(ref_caches):
        np.testing.assert_array_equal(np.asarray(got_caches.k_q[i]),
                                      np.asarray(rc.k_q))


def test_batcher_quant_kv_runs(tiny_llama):
    cfg, params = tiny_llama
    rng = np.random.default_rng(3)
    b = ContinuousBatcher(jllama, params, cfg, max_batch=2, max_len=64,
                          quant_kv=True)
    reqs = [Request(uid=i, prompt=rng.integers(0, cfg.vocab_size, size=(n,)),
                    max_new_tokens=3) for i, n in enumerate([4, 7])]
    for r in reqs:
        b.submit(r)
    done = b.run_to_completion()
    assert len(done) == 2 and all(len(r.generated) == 3 for r in reqs)
