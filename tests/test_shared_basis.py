"""Shared residual-basis layout: pack_model(shared_residual_basis=True)
must produce EXACTLY the logits of the plain pack when the per-layer stats
already equal the shared stats — the transform is a pure load-time
relayout (embedding/norm/o/down columns + pre_permuted consumers)."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from smoothquant_tpu.models import ForwardContext, llama as jllama
from smoothquant_tpu.models.common import KVCache
from smoothquant_tpu.models.registry import pack_model
from smoothquant_tpu.quant import w4a4_group
from smoothquant_tpu.quant.config import QuantConfig


@pytest.fixture(scope="module")
def setup():
    cfg = dataclasses.replace(
        jllama.LlamaConfig.tiny(), hidden_size=256, intermediate_size=256,
        num_attention_heads=2, num_key_value_heads=2, num_hidden_layers=2)
    params = jllama.init_params(jax.random.PRNGKey(0), cfg)
    qcfg = w4a4_group(group_size=16, salient_prop=0.05)
    rng = np.random.default_rng(1)
    # identical stats for every residual-stream consumer (what the shared
    # basis uses), per-layer stats for the rest
    stream = rng.uniform(0.1, 1.0, size=(cfg.hidden_size,))
    feat = {}
    for i in range(cfg.num_hidden_layers):
        pre = f"model.layers.{i}"
        for p in ("q_proj", "k_proj", "v_proj"):
            feat[f"{pre}.self_attn.{p}"] = stream
        feat[f"{pre}.self_attn.o_proj"] = rng.uniform(
            0.1, 1.0, size=(cfg.hidden_size,))
        for p in ("gate_proj", "up_proj"):
            feat[f"{pre}.mlp.{p}"] = stream
        feat[f"{pre}.mlp.down_proj"] = rng.uniform(
            0.1, 1.0, size=(cfg.intermediate_size,))
    return cfg, params, qcfg, feat


@pytest.mark.parametrize("fuse", [True, False])
def test_shared_basis_logits_parity(setup, fuse):
    cfg, params, qcfg, feat = setup
    kw = dict(input_feat=feat, act_scales=feat, compute_dtype=jnp.float32,
              nibble=True, fuse=fuse, fold_perms=fuse)
    plain = pack_model("llama", params, cfg, qcfg, **kw)
    shared = pack_model("llama", params, cfg, qcfg,
                        shared_residual_basis=True, **kw)
    sa = shared["layers"]["0"]["self_attn"]
    qp = sa["qkv_proj"] if fuse else sa["q_proj"]
    assert qp.meta.pre_permuted

    ctx = ForwardContext(quant=qcfg, compute="int", interpret=True)
    ids = jnp.asarray(np.random.default_rng(2).integers(
        0, cfg.vocab_size, size=(2, 5)))
    ref, _ = jllama.forward(plain, ids, cfg, ctx=ctx)
    got, _ = jllama.forward(shared, ids, cfg, ctx=ctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_shared_basis_packed_lm_head_and_decode(setup):
    cfg, params, qcfg, feat = setup
    head_q = QuantConfig(weight_quant="per_channel", act_quant="per_token",
                         quant_bits=8)
    kw = dict(input_feat=feat, act_scales=feat, compute_dtype=jnp.float32,
              nibble=True, fuse=True, fold_perms=True, lm_head_qcfg=head_q)
    plain = pack_model("llama", params, cfg, qcfg, **kw)
    shared = pack_model("llama", params, cfg, qcfg,
                        shared_residual_basis=True, **kw)
    ctx = ForwardContext(quant=qcfg, compute="int", interpret=True)
    rng = np.random.default_rng(3)
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(1, 4)))
    caches_p = [KVCache.create(1, 128, cfg.num_key_value_heads, cfg.head_dim,
                               jnp.float32) for _ in range(cfg.num_hidden_layers)]
    caches_s = [KVCache.create(1, 128, cfg.num_key_value_heads, cfg.head_dim,
                               jnp.float32) for _ in range(cfg.num_hidden_layers)]
    ref, caches_p = jllama.forward(plain, prompt, cfg, ctx=ctx, caches=caches_p)
    got, caches_s = jllama.forward(shared, prompt, cfg, ctx=ctx, caches=caches_s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    # prefetch-scan decode on the shared-basis tree
    stacked = jllama.stack_layers(shared, cfg)
    scache = jax.tree.map(lambda *xs: jnp.stack(xs), *caches_s)
    assert jllama._prefetch_capable(stacked, cfg, ctx, scache, 1)
    tok = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(1, 1)))
    ref2, _ = jllama.forward(plain, tok, cfg, ctx=ctx, caches=caches_p)
    got2, _ = jllama.forward(stacked, tok, cfg, ctx=ctx, caches=scache)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2),
                               rtol=2e-4, atol=2e-4)
