"""Block-contiguous stacked weight layout (pack.block_decode_tree) must be
numerically IDENTICAL to the row-strided layout — only the storage order of
the rawx kernel's weight DMAs changes."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from smoothquant_tpu.kernels.int4_group_matmul import (
    block_rawx_weights,
    int4_group_matmul_stacked_rawx,
)
from smoothquant_tpu.kernels.pack import block_decode_tree
from smoothquant_tpu.models import ForwardContext, llama as jllama
from smoothquant_tpu.models.common import QuantKVCache
from smoothquant_tpu.models.registry import pack_model
from smoothquant_tpu.quant import w4a4_group


def test_rawx_blocked_bitwise_parity():
    rng = np.random.default_rng(0)
    l_num, kk, o, gs = 3, 256, 512, 16
    half = kk // 2
    g_total = kk // gs
    k_s = 16
    num_sal = 12
    wp = jnp.asarray(rng.integers(-128, 128, size=(l_num, half, o),
                                  dtype=np.int8))
    ws = jnp.asarray(rng.uniform(0.01, 0.05,
                                 size=(l_num, g_total, o)).astype(np.float32))
    sal = jnp.asarray(rng.normal(size=(l_num, k_s, o)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(4, kk)).astype(np.float32))
    nw = jnp.asarray(rng.uniform(0.5, 1.5, size=(kk,)).astype(np.float32))

    wpb, wsb, salb = block_rawx_weights(wp, ws, sal, gs)
    for i in range(l_num):
        idx = jnp.asarray([i], jnp.int32)
        ref = int4_group_matmul_stacked_rawx(
            idx, x, nw, wp, ws, sal, group_size=gs, act_bits=4,
            num_salient=num_sal, eps=1e-5, norm_kind="rms",
            interpret=True)
        got = int4_group_matmul_stacked_rawx(
            idx, x, nw, wpb, wsb, salb, group_size=gs, act_bits=4,
            num_salient=num_sal, eps=1e-5, norm_kind="rms",
            interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.fixture(scope="module")
def packed_model():
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
                        compute_dtype=jnp.float32, nibble=True)
    return cfg, qcfg, packed


def test_blocked_stacked_decode_bitwise(packed_model):
    cfg, qcfg, packed = packed_model
    ctx = ForwardContext(quant=qcfg, compute="int", interpret=True)
    rng = np.random.default_rng(2)
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(2, 5)))
    caches = [QuantKVCache.create(2, 128, cfg.num_key_value_heads,
                                  cfg.head_dim, jnp.float32)
              for _ in range(cfg.num_hidden_layers)]
    _, caches = jllama.forward(packed, prompt, cfg, ctx=ctx, caches=caches)
    stacked = jllama.stack_layers(packed, cfg)
    blocked = block_decode_tree(stacked)
    # the decoder-body leaves were actually re-laid
    assert blocked["layers"]["stacked"]["self_attn"]["q_proj"].w_qt.ndim == 6
    scache = jax.tree.map(lambda *xs: jnp.stack(xs), *caches)
    tok = jnp.asarray([[7], [9]])
    ref, _ = jllama.forward(stacked, tok, cfg, ctx=ctx, caches=scache)
    got, _ = jllama.forward(blocked, tok, cfg, ctx=ctx, caches=scache)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_rawx_select_mode_matches_external_gather():
    """sal_select (in-kernel gather-as-dot) must be BIT-identical to the
    pre-gathered x_sal path on the identity layout."""
    rng = np.random.default_rng(5)
    l_num, kk, o, gs = 2, 256, 512, 16
    half, g_total, k_s, num_sal = kk // 2, kk // gs, 16, 12
    wp = jnp.asarray(rng.integers(-128, 128, size=(l_num, half, o),
                                  dtype=np.int8))
    ws = jnp.asarray(rng.uniform(0.01, 0.05,
                                 size=(l_num, g_total, o)).astype(np.float32))
    wsal = jnp.asarray(rng.normal(size=(l_num, k_s, o)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(4, kk)).astype(np.float32))
    for i in range(l_num):
        perm = rng.permutation(kk)
        sal_idx = perm[kk - num_sal:]
        mask = np.ones((kk,), np.float32)
        mask[sal_idx] = 0.0
        x_sal = np.zeros((4, k_s), np.float32)
        x_sal[:, :num_sal] = np.asarray(x)[:, sal_idx]
        sel = np.zeros((l_num, kk, k_s), np.float32)
        sel[i, sal_idx, np.arange(num_sal)] = 1.0
        idx = jnp.asarray([i], jnp.int32)
        ref = int4_group_matmul_stacked_rawx(
            idx, x, jnp.asarray(mask), wp, ws, wsal,
            jnp.asarray(x_sal), group_size=gs, act_bits=4,
            num_salient=num_sal, norm_kind="mask", interpret=True)
        got = int4_group_matmul_stacked_rawx(
            idx, x, jnp.asarray(mask), wp, ws, wsal,
            None, jnp.asarray(sel), group_size=gs, act_bits=4,
            num_salient=num_sal, norm_kind="mask", interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
