"""Fused SwiGLU-MLP megakernel (kernels/mlp_fused.py) must match the
two-launch rawx composition — same f32 math, one Pallas call."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from smoothquant_tpu.kernels.int4_group_matmul import (
    int4_group_matmul_stacked_rawx,
)
from smoothquant_tpu.kernels.mlp_fused import (
    mlp_fused_supported,
    mlp_swiglu_fused_stacked,
)
from smoothquant_tpu.kernels.pack import fold_input_perm, pack_linear
from smoothquant_tpu.quant import w4a4_group

L = 3


def _build(c=256, inter=256, gs=16, salient_prop=0.05, seed=0,
           scale_dtype="float32"):
    """Stacked gate_up + down packs with the decode-scan layout contract:
    fold_input_perm (down's input perm folded into gate_up rows), gate_up
    marked pre_permuted (shared-basis input)."""
    qcfg = dataclasses.replace(
        w4a4_group(group_size=gs, salient_prop=salient_prop),
        scale_dtype=scale_dtype)
    rng = np.random.default_rng(seed)
    layers_gu, layers_dn = [], []
    for i in range(L):
        gu_lin = {"weight": jnp.asarray(
            rng.normal(size=(2 * inter, c)).astype(np.float32)),
            "bias": None}
        dn_lin = {"weight": jnp.asarray(
            rng.normal(size=(c, inter)).astype(np.float32)), "bias": None}
        imp_c = rng.uniform(0.1, 1.0, size=(c,))
        imp_i = rng.uniform(0.1, 1.0, size=(inter,))
        dn = pack_linear(dn_lin, qcfg, importance=imp_i,
                         compute_dtype=jnp.float32, nibble=True)
        dn, gu_lin = fold_input_perm(dn, gu_lin, n_splits=2)
        gu = pack_linear(gu_lin, qcfg, importance=imp_c, act_absmax=imp_c,
                         compute_dtype=jnp.float32, nibble=True)
        gu = dataclasses.replace(
            gu, meta=dataclasses.replace(gu.meta, pre_permuted=True))
        layers_gu.append(gu)
        layers_dn.append(dn)
    gu_s = jax.tree.map(lambda *xs: jnp.stack(xs), *layers_gu)
    dn_s = jax.tree.map(lambda *xs: jnp.stack(xs), *layers_dn)
    return qcfg, gu_s, dn_s


def _reference(idx, x, norm_w, gu, dn, eps):
    """Two-launch rawx composition in f32 (what the unfused decode does)."""
    y_gu = int4_group_matmul_stacked_rawx(
        idx, x, norm_w, gu.w_qt, gu.w_scales_t, gu.w_sal_t,
        group_size=gu.meta.group_size, act_bits=gu.meta.act_bits,
        num_salient=gu.meta.num_salient, eps=eps, out_dtype=jnp.float32,
        interpret=True)[:, : gu.meta.out_features]
    inter = gu.meta.out_features // 2
    h = jax.nn.silu(y_gu[:, :inter]) * y_gu[:, inter:]
    return int4_group_matmul_stacked_rawx(
        idx, h, None, dn.w_qt, dn.w_scales_t, dn.w_sal_t,
        group_size=dn.meta.group_size, act_bits=dn.meta.act_bits,
        num_salient=dn.meta.num_salient, out_dtype=jnp.float32,
        interpret=True)[:, : dn.meta.out_features]


@pytest.mark.parametrize("salient_prop", [0.0, 0.05])
@pytest.mark.parametrize("fuse_norm", [True, False])
def test_fused_matches_two_launch(salient_prop, fuse_norm):
    qcfg, gu, dn = _build(salient_prop=salient_prop)
    assert mlp_fused_supported(gu.meta, dn.meta, 4)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(4, gu.meta.in_features))
                    .astype(np.float32))
    norm_w = (jnp.asarray(rng.uniform(0.5, 1.5, size=(
        gu.meta.in_features,)).astype(np.float32)) if fuse_norm else None)
    eps = 1e-6 if fuse_norm else 0.0
    idx = jnp.asarray([1], jnp.int32)

    ref = _reference(idx, x, norm_w, gu, dn, eps)
    got = mlp_swiglu_fused_stacked(
        idx, x, norm_w,
        gu.w_qt, gu.w_scales_t, gu.w_sal_t,
        dn.w_qt, dn.w_scales_t, dn.w_sal_t,
        group_size=qcfg.group_size, act_bits=qcfg.effective_act_bits,
        n_sal1=gu.meta.num_salient, n_sal2=dn.meta.num_salient,
        gu_out_true=gu.meta.out_features, dn_out_true=dn.meta.out_features,
        eps=eps, out_dtype=jnp.float32, interpret=True)

    # silu codegen differs ~1 ulp between the fused kernel and the XLA
    # composition; through the group-scale dequant that shows up as ~1e-7
    # RELATIVE noise (abs up to ~1e-3 on 1e3-magnitude outputs).  Real
    # mapping bugs (wrong chunk/layer/group) produce O(1)+ errors.
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-4, atol=5e-3)


def test_layer_selection():
    """The scalar-prefetch layer index must pick the right layer's weights
    in BOTH phases."""
    qcfg, gu, dn = _build(salient_prop=0.05, seed=7)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, gu.meta.in_features))
                    .astype(np.float32))
    outs = []
    for i in range(L):
        idx = jnp.asarray([i], jnp.int32)
        got = mlp_swiglu_fused_stacked(
            idx, x, None,
            gu.w_qt, gu.w_scales_t, gu.w_sal_t,
            dn.w_qt, dn.w_scales_t, dn.w_sal_t,
            group_size=qcfg.group_size, act_bits=qcfg.effective_act_bits,
            n_sal1=gu.meta.num_salient, n_sal2=dn.meta.num_salient,
            gu_out_true=gu.meta.out_features,
            dn_out_true=dn.meta.out_features,
            out_dtype=jnp.float32, interpret=True)
        ref = _reference(idx, x, None, gu, dn, 0.0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=5e-4, atol=5e-3)
        outs.append(np.asarray(got))
    assert not np.allclose(outs[0], outs[1])  # layers genuinely differ


def test_bf16_scales_storage():
    """bf16 weight-group scale storage (bench recipe) flows through the
    fused kernel identically to the rawx composition."""
    qcfg, gu, dn = _build(salient_prop=0.05, scale_dtype="bfloat16", seed=2)
    assert gu.w_scales_t.dtype == jnp.bfloat16
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(4, gu.meta.in_features))
                    .astype(np.float32))
    idx = jnp.asarray([0], jnp.int32)
    ref = _reference(idx, x, None, gu, dn, 0.0)
    got = mlp_swiglu_fused_stacked(
        idx, x, None,
        gu.w_qt, gu.w_scales_t, gu.w_sal_t,
        dn.w_qt, dn.w_scales_t, dn.w_sal_t,
        group_size=qcfg.group_size, act_bits=qcfg.effective_act_bits,
        n_sal1=gu.meta.num_salient, n_sal2=dn.meta.num_salient,
        gu_out_true=gu.meta.out_features, dn_out_true=dn.meta.out_features,
        out_dtype=jnp.float32, interpret=True)
    # silu codegen differs ~1 ulp between the fused kernel and the XLA
    # composition; through the group-scale dequant that shows up as ~1e-7
    # RELATIVE noise (abs up to ~1e-3 on 1e3-magnitude outputs).  Real
    # mapping bugs (wrong chunk/layer/group) produce O(1)+ errors.
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-4, atol=5e-3)


def test_unsupported_shapes_gate_off():
    qcfg, gu, dn = _build()
    assert not mlp_fused_supported(gu.meta, dn.meta, 9)  # too many tokens
    m = dataclasses.replace(gu.meta, pre_permuted=False)
    assert not mlp_fused_supported(m, dn.meta, 4)


def test_model_decode_with_fused_mlp():
    """ctx.fuse_mlp=True routes the prefetch-scan MLP through the megakernel
    and matches the default (two-launch) decode."""
    from smoothquant_tpu.models import ForwardContext, llama as jllama
    from smoothquant_tpu.models.registry import pack_model

    cfg = dataclasses.replace(
        jllama.LlamaConfig.tiny(), hidden_size=256, intermediate_size=256,
        num_attention_heads=2, num_key_value_heads=2, num_hidden_layers=2)
    params = jllama.init_params(jax.random.PRNGKey(0), cfg)
    qcfg = w4a4_group(group_size=16, salient_prop=0.05)
    rng = np.random.default_rng(1)
    feat = {key: rng.uniform(0.1, 1.0, size=(
        cfg.intermediate_size if "down_proj" in key else cfg.hidden_size,))
        for _, key, _ in jllama.quantizable_linears(cfg)}
    packed = pack_model("llama", params, cfg, qcfg, input_feat=feat,
                        compute_dtype=jnp.float32, nibble=True,
                        fuse=True, fold_perms=True,
                        shared_residual_basis=True)
    stacked = jllama.stack_layers(packed, cfg)
    caches = jllama.stacked_caches(cfg, 2, 128, jnp.float32, pos=9,
                                   quant_kv=True)
    tok = jnp.asarray([[3], [7]])

    import smoothquant_tpu.kernels.real_linear as rl
    calls = {"n": 0}
    orig = rl.real_mlp_fused

    def spy(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    rl.real_mlp_fused = spy
    try:
        ref, _ = jllama.forward(
            stacked, tok, cfg, caches=caches,
            ctx=ForwardContext(quant=qcfg, compute="int", interpret=True))
        assert calls["n"] == 0
        got, _ = jllama.forward(
            stacked, tok, cfg, caches=caches,
            ctx=ForwardContext(quant=qcfg, compute="int", interpret=True,
                               fuse_mlp=True))
        assert calls["n"] == 1
    finally:
        rl.real_mlp_fused = orig
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
