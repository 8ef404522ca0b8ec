"""OPT prefetch-scan decode: fused qkv + fc1-perm fold + flash attention
parity against the flat per-layer packed forward (interpret mode)."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from smoothquant_tpu.models import ForwardContext, opt as jopt
from smoothquant_tpu.models.common import KVCache
from smoothquant_tpu.models.registry import pack_model
from smoothquant_tpu.quant import w4a4_group


@pytest.fixture(scope="module")
def setup():
    cfg = dataclasses.replace(
        jopt.OPTConfig.tiny(), hidden_size=128, ffn_dim=256,
        num_attention_heads=2, num_hidden_layers=2)
    params = jopt.init_params(jax.random.PRNGKey(0), cfg)
    qcfg = w4a4_group(group_size=16, salient_prop=0.05)
    rng = np.random.default_rng(1)
    feat = {}
    for i in range(cfg.num_hidden_layers):
        pre = f"model.decoder.layers.{i}"
        attn_in = rng.uniform(0.1, 1.0, size=(cfg.hidden_size,))
        for p in ("q_proj", "k_proj", "v_proj"):
            feat[f"{pre}.self_attn.{p}"] = attn_in
        feat[f"{pre}.self_attn.out_proj"] = rng.uniform(
            0.1, 1.0, size=(cfg.hidden_size,))
        feat[f"{pre}.fc1"] = rng.uniform(0.1, 1.0, size=(cfg.hidden_size,))
        feat[f"{pre}.fc2"] = rng.uniform(0.1, 1.0, size=(cfg.ffn_dim,))
    packed = pack_model("opt", params, cfg, qcfg, input_feat=feat,
                        act_scales=feat, compute_dtype=jnp.float32,
                        nibble=True, fuse=True, fold_perms=True,
                        align_k_groups=8, align_o=256)
    return cfg, params, qcfg, packed


def test_opt_fused_fold_flat_parity(setup):
    """Fused+folded pack forward == plain pack forward (teacher-forced)."""
    cfg, params, qcfg, packed = setup
    rng = np.random.default_rng(2)
    feat_free = pack_model("opt", params, cfg, qcfg,
                           compute_dtype=jnp.float32, nibble=True)
    ctx = ForwardContext(quant=qcfg, compute="int", interpret=True)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(2, 5)))
    ref, _ = jopt.forward(feat_free, ids, cfg, ctx=ctx)
    got, _ = jopt.forward(packed, ids, cfg, ctx=ctx)
    # different salient sets/perms (feat-free uses weight-derived keys) —
    # only check both produce finite, same-shape logits
    assert got.shape == ref.shape and np.isfinite(np.asarray(got)).all()


def test_opt_prefetch_decode_parity(setup):
    cfg, params, qcfg, packed = setup
    ctx = ForwardContext(quant=qcfg, compute="int", interpret=True)
    rng = np.random.default_rng(3)
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(2, 4)))

    caches = [KVCache.create(2, 128, cfg.num_attention_heads, cfg.head_dim,
                             jnp.float32) for _ in range(cfg.num_hidden_layers)]
    _, caches = jopt.forward(packed, prompt, cfg, ctx=ctx, caches=caches)

    stacked = jopt.stack_layers(packed, cfg)
    scache = jax.tree.map(lambda *xs: jnp.stack(xs), *caches)
    assert jopt._prefetch_capable(stacked, cfg, ctx, scache, 1)

    tok = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(2, 1)))
    ref, _ = jopt.forward(packed, tok, cfg, ctx=ctx, caches=caches)
    got, new_scache = jopt.forward(stacked, tok, cfg, ctx=ctx, caches=scache)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(
        np.asarray(new_scache.pos),
        np.asarray([c.pos for c in caches]) + 1)


def test_opt_prefetch_decode_quant_kv(setup):
    """INT8 stacked cache decode stays close to the bf16-cache path."""
    cfg, params, qcfg, packed = setup
    ctx = ForwardContext(quant=qcfg, compute="int", interpret=True)
    rng = np.random.default_rng(4)
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(1, 4)))

    caches = [KVCache.create(1, 128, cfg.num_attention_heads, cfg.head_dim,
                             jnp.float32) for _ in range(cfg.num_hidden_layers)]
    _, caches = jopt.forward(packed, prompt, cfg, ctx=ctx, caches=caches)

    stacked = jopt.stack_layers(packed, cfg)
    qcache = jopt.stacked_caches(cfg, 1, 128, jnp.float32, quant_kv=True)
    # replay the prompt's K/V into the quant cache
    for i, c in enumerate(caches):
        pos = int(c.pos)
        from smoothquant_tpu.models.common import QuantKVCache
        kq, ks = QuantKVCache._quantize(c.k[:, :, :pos])
        vq, vs = QuantKVCache._quantize(c.v[:, :, :pos])
        qcache = qcache._replace(
            k_q=qcache.k_q.at[i, :, :, :pos].set(kq),
            v_q=qcache.v_q.at[i, :, :, :pos].set(vq),
            k_scale=qcache.k_scale.at[i, :, :, :pos].set(ks),
            v_scale=qcache.v_scale.at[i, :, :, :pos].set(vs),
            pos=qcache.pos.at[i].set(pos),
        )
    assert jopt._prefetch_capable(stacked, cfg, ctx, qcache, 1)

    tok = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(1, 1)))
    ref, _ = jopt.forward(packed, tok, cfg, ctx=ctx, caches=caches)
    got, _ = jopt.forward(stacked, tok, cfg, ctx=ctx, caches=qcache)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0.08, atol=0.08)
