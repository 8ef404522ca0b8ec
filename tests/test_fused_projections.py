"""Fused q/k/v and gate/up projections: packing equivalence + decode parity.

The fused projections share one input activation, so under shared
calibration stats the fused pack is a row-concatenation of the individual
packs — outputs must match the unfused path exactly (up to f32 fusion
rounding)."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from smoothquant_tpu.models import ForwardContext, llama as jllama
from smoothquant_tpu.models.common import KVCache
from smoothquant_tpu.models.registry import pack_model
from smoothquant_tpu.quant import w4a4_group


@pytest.fixture(scope="module")
def setup():
    cfg = dataclasses.replace(
        jllama.LlamaConfig.tiny(), hidden_size=256, intermediate_size=256,
        num_attention_heads=2, num_key_value_heads=2, num_hidden_layers=2)
    params = jllama.init_params(jax.random.PRNGKey(0), cfg)
    qcfg = w4a4_group(group_size=16, salient_prop=0.05)
    rng = np.random.default_rng(1)
    # shared stats per INPUT (what real calibration produces: q/k/v and
    # gate/up see the same tensor)
    feat = {}
    for i in range(cfg.num_hidden_layers):
        pre = f"model.layers.{i}"
        attn_in = rng.uniform(0.1, 1.0, size=(cfg.hidden_size,))
        mlp_in = rng.uniform(0.1, 1.0, size=(cfg.hidden_size,))
        down_in = rng.uniform(0.1, 1.0, size=(cfg.intermediate_size,))
        for p in ("q_proj", "k_proj", "v_proj"):
            feat[f"{pre}.self_attn.{p}"] = attn_in
        feat[f"{pre}.self_attn.o_proj"] = rng.uniform(
            0.1, 1.0, size=(cfg.hidden_size,))
        for p in ("gate_proj", "up_proj"):
            feat[f"{pre}.mlp.{p}"] = mlp_in
        feat[f"{pre}.mlp.down_proj"] = down_in
    return cfg, params, qcfg, feat


def test_fused_pack_matches_unfused_forward(setup):
    cfg, params, qcfg, feat = setup
    # act_scales drive the channel sort; without them the sort key is
    # weight-derived, which legitimately differs between a fused weight and
    # its parts — the real pipeline always has calibrated scales
    unfused = pack_model("llama", params, cfg, qcfg, input_feat=feat,
                         act_scales=feat, compute_dtype=jnp.float32,
                         nibble=True)
    fused = pack_model("llama", params, cfg, qcfg, input_feat=feat,
                       act_scales=feat, compute_dtype=jnp.float32,
                       nibble=True, fuse=True)
    assert "qkv_proj" in fused["layers"]["0"]["self_attn"]
    assert "gate_up_proj" in fused["layers"]["0"]["mlp"]

    ctx = ForwardContext(quant=qcfg, compute="int", interpret=True)
    ids = jnp.asarray(np.random.default_rng(2).integers(
        0, cfg.vocab_size, size=(2, 6)))
    ref, _ = jllama.forward(unfused, ids, cfg, ctx=ctx)
    got, _ = jllama.forward(fused, ids, cfg, ctx=ctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_prefetch_decode(setup):
    cfg, params, qcfg, feat = setup
    fused = pack_model("llama", params, cfg, qcfg, input_feat=feat,
                       compute_dtype=jnp.float32, nibble=True, fuse=True)
    ctx = ForwardContext(quant=qcfg, compute="int", interpret=True)
    rng = np.random.default_rng(3)
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(1, 4)))

    caches = [KVCache.create(1, 128, cfg.num_key_value_heads, cfg.head_dim,
                             jnp.float32) for _ in range(cfg.num_hidden_layers)]
    _, caches = jllama.forward(fused, prompt, cfg, ctx=ctx, caches=caches)

    stacked = jllama.stack_layers(fused, cfg)
    assert jllama._prefetch_capable(
        stacked, cfg, ctx, jax.tree.map(lambda *xs: jnp.stack(xs), *caches), 1)
    scache = jax.tree.map(lambda *xs: jnp.stack(xs), *caches)

    tok = jnp.asarray([[5]])
    ref, _ = jllama.forward(fused, tok, cfg, ctx=ctx, caches=caches)
    got, _ = jllama.forward(stacked, tok, cfg, ctx=ctx, caches=scache)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_fold_input_perm_unit():
    """pre_permuted pack on pre-permuted input == normal pack on raw input,
    and the folded producer reproduces the permuted chain exactly."""
    from smoothquant_tpu.kernels.pack import fold_input_perm, pack_linear
    from smoothquant_tpu.kernels.real_linear import real_quant_linear

    rng = np.random.default_rng(0)
    c, o, inter = 128, 96, 128
    qcfg = w4a4_group(group_size=16, salient_prop=0.05)
    down = {"weight": jnp.asarray(rng.normal(size=(o, inter)), jnp.float32),
            "bias": None}
    gate_up = {"weight": jnp.asarray(rng.normal(size=(2 * inter, c)),
                                     jnp.float32),
               "bias": None}
    imp = rng.uniform(0.1, 1.0, size=(inter,))
    dp = pack_linear(down, qcfg, importance=imp, nibble=True,
                     compute_dtype=jnp.float32)
    dp_folded, gu_folded = fold_input_perm(dp, gate_up, n_splits=2)
    assert dp_folded.meta.pre_permuted

    x = jnp.asarray(rng.normal(size=(3, c)), jnp.float32)
    gu = x @ gate_up["weight"].T
    gate, up = gu[:, :inter], gu[:, inter:]
    h = jax.nn.silu(gate) * up
    ref = real_quant_linear(dp, h, compute="int", interpret=True)

    gu2 = x @ gu_folded["weight"].T
    gate2, up2 = gu2[:, :inter], gu2[:, inter:]
    h2 = jax.nn.silu(gate2) * up2
    got = real_quant_linear(dp_folded, h2, compute="int", interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_fold_perms_model_parity(setup):
    """pack_model(fold_perms=True) forward == plain fused pack forward."""
    cfg, params, qcfg, feat = setup
    fused = pack_model("llama", params, cfg, qcfg, input_feat=feat,
                       act_scales=feat, compute_dtype=jnp.float32,
                       nibble=True, fuse=True)
    folded = pack_model("llama", params, cfg, qcfg, input_feat=feat,
                        act_scales=feat, compute_dtype=jnp.float32,
                        nibble=True, fuse=True, fold_perms=True)
    assert folded["layers"]["0"]["mlp"]["down_proj"].meta.pre_permuted
    ctx = ForwardContext(quant=qcfg, compute="int", interpret=True)
    ids = jnp.asarray(np.random.default_rng(5).integers(
        0, cfg.vocab_size, size=(2, 6)))
    ref, _ = jllama.forward(fused, ids, cfg, ctx=ctx)
    got, _ = jllama.forward(folded, ids, cfg, ctx=ctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fold_perms_unfused_model_parity(setup):
    cfg, params, qcfg, feat = setup
    plain = pack_model("llama", params, cfg, qcfg, input_feat=feat,
                       act_scales=feat, compute_dtype=jnp.float32,
                       nibble=True)
    folded = pack_model("llama", params, cfg, qcfg, input_feat=feat,
                        act_scales=feat, compute_dtype=jnp.float32,
                        nibble=True, fold_perms=True)
    ctx = ForwardContext(quant=qcfg, compute="int", interpret=True)
    ids = jnp.asarray(np.random.default_rng(6).integers(
        0, cfg.vocab_size, size=(1, 5)))
    ref, _ = jllama.forward(plain, ids, cfg, ctx=ctx)
    got, _ = jllama.forward(folded, ids, cfg, ctx=ctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
