"""S-major (batched-head) decode attention parity vs the head-major path.

The S-major cache (VERDICT r4 round-5 demand #2) changes only the BYTE
layout — numerics must match the head-major int8 kernel / einsum path to
f32 rounding at every rep (MHA / GQA / MQA)."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from smoothquant_tpu.kernels.attn_smajor import (
    decode_attention_smajor_stacked,
    supported,
    write_quant_cache_smajor,
)
from smoothquant_tpu.kernels.decode_attention import decode_attention_stacked
from smoothquant_tpu.models import ForwardContext, llama as jllama
from smoothquant_tpu.models.common import QuantKVCache, SMajorQuantKVCache
from smoothquant_tpu.models.registry import pack_model
from smoothquant_tpu.quant import w4a4_group


@pytest.mark.parametrize("h,n_kv", [(8, 8), (8, 2), (8, 1), (16, 16)])
def test_smajor_kernel_matches_head_major(h, n_kv):
    l_num, b, s, d = 2, 2, 128, 64
    assert supported(s, h, n_kv, d)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, h, d)), jnp.float32)
    k_hm = jnp.asarray(rng.integers(-127, 128, size=(l_num, b, n_kv, s, d)),
                       jnp.int8)
    v_hm = jnp.asarray(rng.integers(-127, 128, size=(l_num, b, n_kv, s, d)),
                       jnp.int8)
    ks = jnp.asarray(rng.uniform(0.005, 0.02, size=(l_num, b, n_kv, s)),
                     jnp.float32)
    vs = jnp.asarray(rng.uniform(0.005, 0.02, size=(l_num, b, n_kv, s)),
                     jnp.float32)
    valid = jnp.asarray(rng.random((b, s)) > 0.3).at[:, 0].set(True)
    bias = jnp.where(valid, 0.0, -1e30).astype(jnp.float32)

    ref = decode_attention_stacked(
        jnp.ones((1,), jnp.int32), q, k_hm, v_hm, bias, ks, vs,
        interpret=True)

    # S-major values: (L, B, S, n_kv*D)
    k_sm = k_hm.transpose(0, 1, 3, 2, 4).reshape(l_num, b, s, n_kv * d)
    v_sm = v_hm.transpose(0, 1, 3, 2, 4).reshape(l_num, b, s, n_kv * d)
    got = decode_attention_smajor_stacked(
        jnp.ones((1,), jnp.int32), q, k_sm, v_sm, bias, ks, vs,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_smajor_writer_matches_jnp():
    from smoothquant_tpu.models.common import apply_rotary

    l_num, b, h, s, d = 2, 3, 8, 64, 64
    rng = np.random.default_rng(1)
    k_new = jnp.asarray(rng.normal(size=(b, h, d)), jnp.float32)
    v_new = jnp.asarray(rng.normal(size=(b, h, d)), jnp.float32)
    cos = jnp.asarray(rng.normal(size=(b, 1, d)), jnp.float32)
    sin = jnp.asarray(rng.normal(size=(b, 1, d)), jnp.float32)
    k_sm = jnp.zeros((l_num, b, s, h * d), jnp.int8)
    v_sm = jnp.zeros((l_num, b, s, h * d), jnp.int8)
    ks = jnp.zeros((l_num, b, h, s), jnp.float32)
    vs = jnp.zeros((l_num, b, h, s), jnp.float32)
    pos = jnp.asarray([5, 0, 63], jnp.int32)

    kq2, vq2, ks2, vs2 = write_quant_cache_smajor(
        jnp.int32(1), pos, k_new, v_new, cos, sin, k_sm, v_sm, ks, vs,
        rotary=True, interpret=True)

    k_rot = apply_rotary(k_new[:, None], cos, sin)[:, 0]

    def q8(x):
        a = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
        sc = jnp.maximum(a, 1e-8) / 127.0
        return jnp.round(x / sc).astype(jnp.int8), sc[..., 0]

    kq_ref, ks_ref = q8(k_rot)
    vq_ref, vs_ref = q8(v_new)
    for bb in range(b):
        p = int(pos[bb])
        np.testing.assert_array_equal(
            np.asarray(kq2[1, bb, p]).reshape(h, d), np.asarray(kq_ref[bb]))
        np.testing.assert_array_equal(
            np.asarray(vq2[1, bb, p]).reshape(h, d), np.asarray(vq_ref[bb]))
        np.testing.assert_allclose(np.asarray(ks2[1, bb, :, p]),
                                   np.asarray(ks_ref[bb]), rtol=1e-6)
    # other layers / rows untouched
    np.testing.assert_array_equal(np.asarray(kq2[0]), np.asarray(k_sm[0]))
    np.testing.assert_array_equal(np.asarray(kq2[1, 0, 6]),
                                  np.asarray(k_sm[1, 0, 6]))


@pytest.fixture(scope="module")
def packed_model8():
    cfg = dataclasses.replace(
        jllama.LlamaConfig.tiny(), hidden_size=512, intermediate_size=512,
        num_attention_heads=8, num_key_value_heads=8, num_hidden_layers=2)
    params = jllama.init_params(jax.random.PRNGKey(0), cfg)
    qcfg = w4a4_group(group_size=16, salient_prop=0.05)
    rng = np.random.default_rng(1)
    feat = {key: rng.uniform(0.1, 1.0, size=(
        cfg.intermediate_size if "down_proj" in key else cfg.hidden_size,))
        for _, key, _ in jllama.quantizable_linears(cfg)}
    packed = pack_model("llama", params, cfg, qcfg, input_feat=feat,
                        compute_dtype=jnp.float32, nibble=True)
    return cfg, qcfg, packed


def test_smajor_scan_decode_matches_head_major(packed_model8):
    """Full scan decode over the S-major cache vs the head-major QuantKV
    cache from the SAME prefilled state."""
    cfg, qcfg, packed = packed_model8
    ctx = ForwardContext(quant=qcfg, compute="int", interpret=True,
                         fuse_attn="off")
    rng = np.random.default_rng(2)
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(2, 5)))

    caches = [QuantKVCache.create(2, 128, cfg.num_key_value_heads,
                                  cfg.head_dim, jnp.float32)
              for _ in range(cfg.num_hidden_layers)]
    _, caches = jllama.forward(packed, prompt, cfg, ctx=ctx, caches=caches)

    stacked = jllama.stack_layers(packed, cfg)
    hm = jax.tree.map(lambda *xs: jnp.stack(xs), *caches)
    l_num, b, n_kv, s, d = hm.k_q.shape
    sm = SMajorQuantKVCache(
        k_q=hm.k_q.transpose(0, 1, 3, 2, 4).reshape(l_num, b, s, n_kv * d),
        v_q=hm.v_q.transpose(0, 1, 3, 2, 4).reshape(l_num, b, s, n_kv * d),
        k_scale=hm.k_scale, v_scale=hm.v_scale, pos=hm.pos)

    tok = jnp.asarray([[7], [9]])
    ref, ref_c = jllama.forward(stacked, tok, cfg, ctx=ctx, caches=hm)
    got, got_c = jllama.forward(stacked, tok, cfg, ctx=ctx, caches=sm)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    # the written cache row matches (flattened head-major row)
    p = 5
    np.testing.assert_array_equal(
        np.asarray(got_c.k_q[1, 0, p]).reshape(n_kv, d),
        np.asarray(ref_c.k_q[1, 0, :, p]))
    assert np.array_equal(np.asarray(got_c.pos), np.asarray(ref_c.pos))


def test_smajor_per_slot_scan(packed_model8):
    """S-major + per-slot (L, B) positions (the serving path) vs the
    head-major per-slot scan."""
    cfg, qcfg, packed = packed_model8
    ctx = ForwardContext(quant=qcfg, compute="int", interpret=True,
                         fuse_attn="off")
    rng = np.random.default_rng(3)
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(2, 5)))
    caches = [QuantKVCache.create(2, 128, cfg.num_key_value_heads,
                                  cfg.head_dim, jnp.float32)
              for _ in range(cfg.num_hidden_layers)]
    _, caches = jllama.forward(packed, prompt, cfg, ctx=ctx, caches=caches)

    stacked = jllama.stack_layers(packed, cfg)
    hm = jax.tree.map(lambda *xs: jnp.stack(xs), *caches)
    slot_pos = jnp.asarray([5, 3], jnp.int32)
    hm = hm._replace(pos=jnp.broadcast_to(slot_pos, hm.pos.shape + (2,))
                     if hm.pos.ndim == 1 else hm.pos)
    hm = hm._replace(pos=jnp.broadcast_to(
        slot_pos, (cfg.num_hidden_layers, 2)))
    l_num, b, n_kv, s, d = hm.k_q.shape
    sm = SMajorQuantKVCache(
        k_q=hm.k_q.transpose(0, 1, 3, 2, 4).reshape(l_num, b, s, n_kv * d),
        v_q=hm.v_q.transpose(0, 1, 3, 2, 4).reshape(l_num, b, s, n_kv * d),
        k_scale=hm.k_scale, v_scale=hm.v_scale, pos=hm.pos)
    key_valid = np.zeros((2, 128), bool)
    key_valid[0, :6] = True
    key_valid[1, :4] = True
    mask = jnp.asarray(key_valid)
    positions = slot_pos[:, None]

    tok = jnp.asarray([[7], [9]])
    ref, _ = jllama.forward(stacked, tok, cfg, ctx=ctx, caches=hm,
                            positions=positions, attn_mask=mask)
    got, _ = jllama.forward(stacked, tok, cfg, ctx=ctx, caches=sm,
                            positions=positions, attn_mask=mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_batcher_smajor_matches_quantkv(packed_model8):
    """ContinuousBatcher on the S-major per-slot pool emits the same
    tokens as the head-major per-slot fast path."""
    from smoothquant_tpu.serve.batching import ContinuousBatcher, Request

    cfg, qcfg, packed = packed_model8
    stacked = jllama.stack_layers(packed, cfg)

    def make():
        rng = np.random.default_rng(7)
        return [Request(uid=i,
                        prompt=rng.integers(0, cfg.vocab_size, size=(int(n),)),
                        max_new_tokens=4)
                for i, n in enumerate([5, 9, 3])]

    outs = []
    for smajor in (False, True):
        b = ContinuousBatcher(jllama, stacked, cfg, quant=qcfg, max_batch=2,
                              max_len=128, quant_kv=True, compute="int",
                              interpret=True, prefill_params=packed,
                              smajor=smajor)
        reqs = make()
        for r in reqs:
            b.submit(r)
        b.run_to_completion(chunk=2)
        outs.append([r.generated for r in reqs])
    assert outs[0] == outs[1]


def test_smajor_declines_gracefully_on_other_archs():
    """Non-llama archs must REJECT the S-major cache at the prefetch gate
    (their scan bodies dispatch the head-major flash kernel) and fall back
    to the generic path instead of crashing."""
    from smoothquant_tpu.models.common import prefetch_tree_capable

    cache = SMajorQuantKVCache(
        k_q=jnp.zeros((2, 1, 128, 512), jnp.int8),
        v_q=jnp.zeros((2, 1, 128, 512), jnp.int8),
        k_scale=jnp.zeros((2, 1, 8, 128), jnp.float32),
        v_scale=jnp.zeros((2, 1, 8, 128), jnp.float32),
        pos=jnp.zeros((2,), jnp.int32))
    assert not prefetch_tree_capable({"self_attn": {}}, None, cache, 1)
    assert not prefetch_tree_capable({"self_attn": {}}, None, cache, 1,
                                     allow_smajor=False)
