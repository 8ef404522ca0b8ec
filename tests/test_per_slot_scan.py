"""Per-slot (continuous-batching) prefetch-scan decode parity.

VERDICT r4 #1: the ContinuousBatcher used to decode on the per-layer path
because the prefetch-scan tree rejected per-slot cache positions.  These
tests pin that the per-slot scan path (stacked (L, B) positions + per-row
decode bias) matches the per-layer decode bit-for-bit-ish at RAGGED
positions, and that the batcher serves identical tokens on both paths.
"""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from smoothquant_tpu.models import ForwardContext, llama as jllama
from smoothquant_tpu.models.common import KVCache, QuantKVCache
from smoothquant_tpu.models.registry import pack_model
from smoothquant_tpu.quant import w4a4_group


@pytest.fixture(scope="module")
def packed_model():
    cfg = dataclasses.replace(
        jllama.LlamaConfig.tiny(), hidden_size=256, intermediate_size=256,
        num_attention_heads=2, num_key_value_heads=2, num_hidden_layers=3)
    params = jllama.init_params(jax.random.PRNGKey(0), cfg)
    qcfg = w4a4_group(group_size=16, salient_prop=0.05)
    rng = np.random.default_rng(1)
    feat = {key: rng.uniform(0.1, 1.0, size=(
        cfg.intermediate_size if "down_proj" in key else cfg.hidden_size,))
        for _, key, _ in jllama.quantizable_linears(cfg)}
    packed = pack_model("llama", params, cfg, qcfg, input_feat=feat,
                        compute_dtype=jnp.float32, nibble=True)
    return cfg, qcfg, packed


@pytest.mark.parametrize("quant_kv", [False, True])
def test_per_slot_scan_matches_per_layer(packed_model, quant_kv):
    """Ragged per-slot positions: slot 0 at fill 5, slot 1 at fill 3.  The
    stacked per-slot scan and the per-layer loop start from the SAME cache
    state and must produce the same logits and cache writes."""
    cfg, qcfg, packed = packed_model
    ctx = ForwardContext(quant=qcfg, compute="int", interpret=True,
                         fuse_attn="off")
    rng = np.random.default_rng(2)
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(2, 5)))

    cache_cls = QuantKVCache if quant_kv else KVCache
    caches = [cache_cls.create(2, 128, cfg.num_key_value_heads, cfg.head_dim,
                               jnp.float32)
              for _ in range(cfg.num_hidden_layers)]
    _, caches = jllama.forward(packed, prompt, cfg, ctx=ctx, caches=caches)

    # make the state RAGGED: slot 1 rewinds to fill 3 (its rows at 3, 4
    # hold stale-but-masked data, exactly a continuous-batching pool state)
    slot_pos = jnp.asarray([5, 3], jnp.int32)
    key_valid = np.zeros((2, 128), bool)
    key_valid[0, :5] = True
    key_valid[1, :3] = True
    caches = [c._replace(pos=slot_pos) for c in caches]
    positions = slot_pos[:, None]

    stacked = jllama.stack_layers(packed, cfg)
    scache = jax.tree.map(lambda *xs: jnp.stack(xs), *caches)
    assert scache.pos.shape == (cfg.num_hidden_layers, 2)

    # mark the incoming token's positions valid (what the batcher does)
    key_valid[0, 5] = True
    key_valid[1, 3] = True
    mask = jnp.asarray(key_valid)

    tok = jnp.asarray([[7], [9]])
    ref, ref_caches = jllama.forward(packed, tok, cfg, ctx=ctx, caches=caches,
                                     positions=positions, attn_mask=mask)
    got, got_caches = jllama.forward(stacked, tok, cfg, ctx=ctx, caches=scache,
                                     positions=positions, attn_mask=mask)

    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    for i, rc in enumerate(ref_caches):
        assert np.array_equal(np.asarray(got_caches.pos[i]),
                              np.asarray(rc.pos))
        for b, p in enumerate([5, 3]):
            if quant_kv:
                np.testing.assert_array_equal(
                    np.asarray(got_caches.k_q[i, b, :, p]),
                    np.asarray(rc.k_q[b, :, p]))
                np.testing.assert_array_equal(
                    np.asarray(got_caches.v_q[i, b, :, p]),
                    np.asarray(rc.v_q[b, :, p]))
            else:
                np.testing.assert_allclose(
                    np.asarray(got_caches.k[i, b, :, p]),
                    np.asarray(rc.k[b, :, p]), atol=1e-5)


@pytest.mark.parametrize("quant_kv", [False, True])
def test_batcher_fast_path_matches_per_layer(packed_model, quant_kv):
    """The ContinuousBatcher over a STACKED tree (per-slot prefetch-scan
    decode) must emit exactly the tokens the per-layer-path batcher emits
    for the same ragged request stream."""
    from smoothquant_tpu.serve.batching import ContinuousBatcher, Request

    cfg, qcfg, packed = packed_model
    rng = np.random.default_rng(3)

    def requests():
        return [Request(uid=i,
                        prompt=rng.integers(0, cfg.vocab_size,
                                            size=(int(n),)),
                        max_new_tokens=4)
                for i, n in enumerate([5, 9, 3])]

    rng = np.random.default_rng(3)
    slow = ContinuousBatcher(jllama, packed, cfg, quant=qcfg, max_batch=2,
                             max_len=128, quant_kv=quant_kv, compute="int",
                             interpret=True)
    assert not slow._stacked
    reqs_a = requests()
    for r in reqs_a:
        slow.submit(r)
    slow.run_to_completion()

    rng = np.random.default_rng(3)
    stacked = jllama.stack_layers(packed, cfg)
    fast = ContinuousBatcher(jllama, stacked, cfg, quant=qcfg, max_batch=2,
                             max_len=128, quant_kv=quant_kv, compute="int",
                             interpret=True, prefill_params=packed)
    assert fast._stacked
    reqs_b = requests()
    for r in reqs_b:
        fast.submit(r)
    fast.run_to_completion()

    for ra, rb in zip(reqs_a, reqs_b):
        assert ra.generated == rb.generated, (ra.uid, ra.generated,
                                              rb.generated)


def test_batcher_fast_path_chunked(packed_model):
    """step_chunk on the stacked fast path emits the same tokens as
    single-step decode."""
    from smoothquant_tpu.serve.batching import ContinuousBatcher, Request

    cfg, qcfg, packed = packed_model
    stacked = jllama.stack_layers(packed, cfg)

    def make(uid0):
        rng = np.random.default_rng(4)
        return [Request(uid=uid0 + i,
                        prompt=rng.integers(0, cfg.vocab_size, size=(int(n),)),
                        max_new_tokens=5)
                for i, n in enumerate([6, 4])]

    a = ContinuousBatcher(jllama, stacked, cfg, quant=qcfg, max_batch=2,
                          max_len=128, quant_kv=True, compute="int",
                          interpret=True, prefill_params=packed)
    ra = make(0)
    for r in ra:
        a.submit(r)
    a.run_to_completion(chunk=1)

    b = ContinuousBatcher(jllama, stacked, cfg, quant=qcfg, max_batch=2,
                          max_len=128, quant_kv=True, compute="int",
                          interpret=True, prefill_params=packed)
    rb = make(100)
    for r in rb:
        b.submit(r)
    b.run_to_completion(chunk=3)

    for x, y in zip(ra, rb):
        assert x.generated == y.generated
