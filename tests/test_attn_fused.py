"""Fused rope+quantize+cache-write+flash-attention kernel
(kernels/attn_fused.py) vs the three-step composition it replaces."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from smoothquant_tpu.kernels.attn_fused import (
    fused_attn_supported,
    fused_rope_write_attn_stacked,
    fused_virtual_attn_stacked,
)
from smoothquant_tpu.kernels.cache_write import write_quant_cache_stacked
from smoothquant_tpu.kernels.decode_attention import decode_attention_stacked
from smoothquant_tpu.models.common import decode_bias

L, S, D = 3, 128, 128


def _setup(b, h, n_kv, pos, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(b, h, D)).astype(np.float32))
    k_new = jnp.asarray(rng.normal(size=(b, n_kv, D)).astype(np.float32))
    v_new = jnp.asarray(rng.normal(size=(b, n_kv, D)).astype(np.float32))
    cos = jnp.asarray(rng.uniform(-1, 1, size=(b, 1, D)).astype(np.float32))
    sin = jnp.asarray(rng.uniform(-1, 1, size=(b, 1, D)).astype(np.float32))
    k_q = jnp.asarray(rng.integers(-127, 128, size=(L, b, n_kv, S, D),
                                   dtype=np.int8))
    v_q = jnp.asarray(rng.integers(-127, 128, size=(L, b, n_kv, S, D),
                                   dtype=np.int8))
    ks = jnp.asarray(rng.uniform(0.005, 0.02, size=(L, b, n_kv, S))
                     .astype(np.float32))
    vs = jnp.asarray(rng.uniform(0.005, 0.02, size=(L, b, n_kv, S))
                     .astype(np.float32))
    return q, k_new, v_new, cos, sin, k_q, v_q, ks, vs


def _composition(layer, pos, q, k_new, v_new, cos, sin, k_q, v_q, ks, vs,
                 rotary=True, int8_dots=False):
    """What the unfused prefetch-scan does: writer kernel, bias, flash."""
    b, h, d = q.shape
    kq2, vq2, ks2, vs2 = write_quant_cache_stacked(
        layer, pos, k_new, v_new, cos, sin, k_q, v_q, ks, vs,
        rotary=rotary, interpret=True)
    bias = decode_bias(jnp.asarray(pos), b, S, None)
    attn = decode_attention_stacked(
        jnp.asarray(layer, jnp.int32).reshape(1), q, kq2, vq2, bias,
        ks2, vs2, interpret=True, int8_dots=int8_dots)
    return attn, kq2, vq2, ks2, vs2


# int8_dots=False pins the streaming-softmax STRUCTURE tight (both sides
# dequantize to bf16 → f32-rounding-level agreement).  int8_dots=True (an
# opt-in reference-semantics path — every entry point defaults it off,
# it measured slower at decode shapes) additionally requantizes q and the
# probs onto the MXU's int8 path — the reference's BMM_S8T_S8N_S8T prob quantization
# (opt.py:189-190) — whose rounding differs between the fused kernel's
# virtual-tile order and the composition's in-tile order, so parity is
# quant-noise-level (~0.5/127 of the dominant prob).
_DOTS_TOL = {False: 2e-3, True: 4e-2}


@pytest.mark.parametrize("int8_dots", [False, True])
@pytest.mark.parametrize("h,n_kv", [(4, 4), (8, 2)])
@pytest.mark.parametrize("pos", [0, 9, 127])
def test_fused_matches_composition(h, n_kv, pos, int8_dots):
    assert fused_attn_supported(S, h, n_kv, D)
    b = 2
    tol = _DOTS_TOL[int8_dots]
    args = _setup(b, h, n_kv, pos)
    ref_attn, rkq, rvq, rks, rvs = _composition(1, pos, *args,
                                                int8_dots=int8_dots)
    got_attn, gkq, gvq, gks, gvs = fused_rope_write_attn_stacked(
        1, pos, *args, interpret=True, int8_dots=int8_dots)

    # cache bytes must match the separate writer BIT-FOR-BIT
    np.testing.assert_array_equal(np.asarray(gkq), np.asarray(rkq))
    np.testing.assert_array_equal(np.asarray(gvq), np.asarray(rvq))
    np.testing.assert_array_equal(np.asarray(gks), np.asarray(rks))
    np.testing.assert_array_equal(np.asarray(gvs), np.asarray(rvs))
    # attention folds the new position in last instead of inside its
    # S-tile: identical math, different streaming-softmax order
    np.testing.assert_allclose(np.asarray(got_attn), np.asarray(ref_attn),
                               rtol=tol, atol=tol)


@pytest.mark.parametrize("int8_dots", [False, True])
@pytest.mark.parametrize("h,n_kv", [(4, 4), (8, 2)])
@pytest.mark.parametrize("pos", [0, 9, 127])
def test_virtual_matches_composition(h, n_kv, pos, int8_dots):
    """The no-write variant (attention over the OLD cache + new position
    from registers) must produce the same attention output as write-then-
    attend, while leaving the cache untouched."""
    b = 2
    tol = _DOTS_TOL[int8_dots]
    args = _setup(b, h, n_kv, pos, seed=11)
    ref_attn, *_ = _composition(1, pos, *args, int8_dots=int8_dots)
    got_attn = fused_virtual_attn_stacked(1, pos, *args, interpret=True,
                                          int8_dots=int8_dots)
    np.testing.assert_allclose(np.asarray(got_attn), np.asarray(ref_attn),
                               rtol=tol, atol=tol)


def test_non_rotary():
    b, h, n_kv, pos = 2, 4, 4, 33
    args = _setup(b, h, n_kv, pos, seed=3)
    ref_attn, rkq, *_ = _composition(0, pos, *args, rotary=False)
    got_attn, gkq, *_ = fused_rope_write_attn_stacked(
        0, pos, *args, rotary=False, interpret=True, int8_dots=False)
    np.testing.assert_array_equal(np.asarray(gkq), np.asarray(rkq))
    np.testing.assert_allclose(np.asarray(got_attn), np.asarray(ref_attn),
                               rtol=2e-3, atol=2e-3)


def test_model_decode_fused_vs_unfused():
    """Default (fused-attention) prefetch decode vs the fuse_attn="off"
    path on a 1-layer packed model: cache VALUES bit-equal, scales equal to
    1 f32 ulp (XLA fuses the /127 differently), logits within reorder
    noise.  Deeper chaotic random models amplify the streaming-softmax
    reorder through int4 boundaries, so logits parity is pinned at depth 1."""
    import dataclasses

    from smoothquant_tpu.models import ForwardContext, llama as jllama
    from smoothquant_tpu.models.common import QuantKVCache
    from smoothquant_tpu.models.registry import pack_model
    from smoothquant_tpu.quant import w4a4_group

    cfg = dataclasses.replace(
        jllama.LlamaConfig.tiny(), hidden_size=256, intermediate_size=256,
        num_attention_heads=2, num_key_value_heads=2, num_hidden_layers=1)
    params = jllama.init_params(jax.random.PRNGKey(0), cfg)
    qcfg = w4a4_group(group_size=16, salient_prop=0.05)
    rng = np.random.default_rng(1)
    feat = {key: rng.uniform(0.1, 1.0, size=(
        cfg.intermediate_size if "down_proj" in key else cfg.hidden_size,))
        for _, key, _ in jllama.quantizable_linears(cfg)}
    packed = pack_model("llama", params, cfg, qcfg, input_feat=feat,
                        compute_dtype=jnp.float32, nibble=True)
    stacked = jllama.stack_layers(packed, cfg)
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(2, 5)))
    caches = [QuantKVCache.create(2, 128, cfg.num_key_value_heads,
                                  cfg.head_dim, jnp.float32)]
    ctx_off = ForwardContext(quant=qcfg, compute="int", interpret=True,
                             fuse_attn="off")
    ctx_on = ForwardContext(quant=qcfg, compute="int", interpret=True,
                            fuse_attn="fused")
    _, caches = jllama.forward(packed, prompt, cfg, ctx=ctx_off,
                               caches=caches)
    scache = jax.tree.map(lambda *xs: jnp.stack(xs), *caches)

    tok = jnp.asarray([[7], [9]])
    ref, rc = jllama.forward(stacked, tok, cfg, ctx=ctx_off, caches=scache)
    got, gc = jllama.forward(stacked, tok, cfg, ctx=ctx_on, caches=scache)
    np.testing.assert_array_equal(np.asarray(gc.k_q), np.asarray(rc.k_q))
    np.testing.assert_array_equal(np.asarray(gc.v_q), np.asarray(rc.v_q))
    np.testing.assert_allclose(np.asarray(gc.k_scale),
                               np.asarray(rc.k_scale), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)
    assert int(gc.pos[0]) == int(rc.pos[0])

    # default "auto" = virtual-tile attention + the separate aliased writer
    ctx_auto = ForwardContext(quant=qcfg, compute="int", interpret=True)
    gv, gvc = jllama.forward(stacked, tok, cfg, ctx=ctx_auto, caches=scache)
    np.testing.assert_array_equal(np.asarray(gvc.k_q), np.asarray(rc.k_q))
    np.testing.assert_array_equal(np.asarray(gvc.v_q), np.asarray(rc.v_q))
    np.testing.assert_allclose(np.asarray(gv), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_layer_isolation():
    """Only the addressed layer's cache rows change."""
    b, h, n_kv, pos = 2, 4, 4, 40
    args = _setup(b, h, n_kv, pos, seed=5)
    k_q_before = np.asarray(args[5])
    _, gkq, gvq, gks, gvs = fused_rope_write_attn_stacked(
        2, pos, *args, interpret=True)
    gkq = np.asarray(gkq)
    np.testing.assert_array_equal(gkq[:2], k_q_before[:2])
    assert not np.array_equal(gkq[2, :, :, pos], k_q_before[2, :, :, pos])
    np.testing.assert_array_equal(
        np.delete(gkq[2], pos, axis=2), np.delete(k_q_before[2], pos, axis=2))
