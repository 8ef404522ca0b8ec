"""Context parallelism (ring attention) and pipeline parallelism (GPipe)
parity vs the single-device forward, on the virtual 8-device CPU mesh."""

import dataclasses
import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from smoothquant_tpu.models import llama
from smoothquant_tpu.models.common import ForwardContext, attention
from smoothquant_tpu.parallel.cp import (
    CP_AXIS,
    make_cp_mesh,
    make_cp_prefill,
    ring_attention,
)
from smoothquant_tpu.parallel.pp import (
    PP_AXIS,
    make_pp_forward,
    make_pp_mesh,
    stack_pp_stages,
)


def _cfg(layers=2):
    return dataclasses.replace(llama.LlamaConfig.tiny(), dtype="float32",
                               num_hidden_layers=layers)


@pytest.mark.parametrize("h,n_kv", [(4, 4), (8, 2)])
@pytest.mark.parametrize("masked", [False, True])
def test_ring_attention_matches_single(h, n_kv, masked):
    cp = 4
    b, s, d = 2, 32, 16
    sl = s // cp
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, n_kv, s, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, n_kv, s, d)), jnp.float32)
    # position 0 always valid: a row with NO valid keys diverges by design
    # (einsum softmax returns uniform garbage, ring returns zeros)
    mask = (jnp.asarray(rng.random((b, s)) > 0.2, jnp.int32).at[:, 0].set(1)
            if masked else jnp.ones((b, s), jnp.int32))

    ref = attention(q, k, v, attn_mask=mask)

    mesh = make_cp_mesh(cp)

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(None, CP_AXIS, None, None),
                  P(None, None, CP_AXIS, None),
                  P(None, None, CP_AXIS, None), P(None, CP_AXIS)),
        out_specs=P(None, CP_AXIS, None, None),
        check_vma=False,
    )
    def ring(q_, k_, v_, m_):
        return ring_attention(q_, k_, v_, CP_AXIS, attn_mask=m_)

    got = ring(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_cp_prefill_logits_parity():
    cfg = _cfg()
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(2, 32)))

    ref, _ = llama.forward(params, ids, cfg)

    mesh = make_cp_mesh(4)
    fwd = make_cp_prefill(llama, cfg, mesh)(params)
    got = fwd(params, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_cp_prefill_opt():
    from smoothquant_tpu.models import opt

    cfg = dataclasses.replace(opt.OPTConfig.tiny(), dtype="float32")
    params = opt.init_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(2, 32)))

    ref, _ = opt.forward(params, ids, cfg)
    mesh = make_cp_mesh(4)
    fwd = make_cp_prefill(opt, cfg, mesh)(params)
    got = fwd(params, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("microbatches", [2, 4])
def test_pp_forward_parity(microbatches):
    pp = 2
    cfg = _cfg(layers=4)
    params = llama.init_params(jax.random.PRNGKey(4), cfg)
    rng = np.random.default_rng(5)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(4, 16)))

    ref, _ = llama.forward(params, ids, cfg)

    mesh = make_pp_mesh(pp)
    staged = stack_pp_stages(params, cfg, pp)
    fwd = make_pp_forward(llama, cfg, mesh,
                          microbatches=microbatches)(staged)
    got = fwd(staged, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_pp_quantized_stages():
    """PP over SIMULATED-quant per-layer params (quantize_model output).

    Activation quant must be PER-TOKEN (batch-row-independent): the sorted-
    group activation quantizer derives its channel permutation from the
    whole batch, so splitting into microbatches changes the grouping — a
    property of dynamic sorting, not of the pipeline schedule."""
    from smoothquant_tpu.models.registry import quantize_model
    from smoothquant_tpu.quant import w4a4_group

    pp = 2
    cfg = _cfg(layers=2)
    params = llama.init_params(jax.random.PRNGKey(6), cfg)
    qcfg = dataclasses.replace(w4a4_group(group_size=16, salient_prop=0.0),
                               act_quant="per_token")
    qparams = quantize_model("llama", params, cfg, qcfg)
    rng = np.random.default_rng(7)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(2, 16)))

    ctx = ForwardContext(quant=qcfg)
    ref, _ = llama.forward(qparams, ids, cfg, ctx=ctx)

    mesh = make_pp_mesh(pp)
    staged = stack_pp_stages(qparams, cfg, pp)
    fwd = make_pp_forward(llama, cfg, mesh, quant=qcfg)(staged)
    got = fwd(staged, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_pp_v2_vocab_sharded_edges():
    """PP v2 (stack_pp_stages_v2): vocab-parallel embedding + lm_head —
    per-device edge storage drops to V/pp rows and logits still match the
    single-device forward exactly."""
    from smoothquant_tpu.parallel.pp import (
        make_pp_forward,
        make_pp_mesh,
        stack_pp_stages,
        stack_pp_stages_v2,
    )

    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(jax.random.PRNGKey(2), cfg)
    ids = jnp.asarray(np.random.default_rng(3).integers(
        0, cfg.vocab_size, size=(4, 16)))
    ref, _ = llama.forward(params, ids, cfg)

    pp = 2
    mesh = make_pp_mesh(pp)
    staged = stack_pp_stages_v2(params, cfg, pp)
    # edge memory is actually sharded: V/pp rows per stage slice
    assert staged["embed_tokens"]["weight"].shape == (
        pp, cfg.vocab_size // pp, cfg.hidden_size)
    assert staged["lm_head"]["weight"].shape == (
        pp, cfg.vocab_size // pp, cfg.hidden_size)
    fwd = make_pp_forward(llama, cfg, mesh)(staged)
    got = np.asarray(fwd(staged, ids))
    np.testing.assert_allclose(got, np.asarray(ref), rtol=2e-4, atol=2e-4)

    # v1 (replicated edges) still agrees — the two stackings are
    # interchangeable numerically
    staged1 = stack_pp_stages(params, cfg, pp)
    fwd1 = make_pp_forward(llama, cfg, mesh)(staged1)
    got1 = np.asarray(fwd1(staged1, ids))
    np.testing.assert_allclose(got, got1, rtol=2e-4, atol=2e-4)


def test_pp_decode_matches_single_device():
    """PP DECODE (make_pp_decode, VERDICT r4 #7): per-stage KV caches, one
    token hopping over pp ticks — greedy generations must match the
    single-device cached decode exactly."""
    from smoothquant_tpu.models.common import KVCache
    from smoothquant_tpu.parallel.pp import make_pp_decode

    pp = 2
    cfg = _cfg(layers=4)
    params = llama.init_params(jax.random.PRNGKey(8), cfg)
    rng = np.random.default_rng(9)
    b, max_len = 2, 32
    prompt = rng.integers(0, cfg.vocab_size, size=(b, 5))

    # single-device reference: prefill then greedy decode
    caches = [KVCache.create(b, max_len, cfg.num_key_value_heads,
                             cfg.head_dim, jnp.float32)
              for _ in range(cfg.num_hidden_layers)]
    logits, caches = llama.forward(params, jnp.asarray(prompt), cfg,
                                   caches=caches)
    ref_toks = []
    tok = jnp.argmax(logits[:, -1], axis=-1)
    for _ in range(4):
        ref_toks.append(np.asarray(tok))
        logits, caches = llama.forward(params, tok[:, None], cfg,
                                       caches=caches)
        tok = jnp.argmax(logits[:, -1], axis=-1)

    # PP decode: prime with the prompt one token at a time
    mesh = make_pp_mesh(pp)
    staged = stack_pp_stages(params, cfg, pp)
    init_caches, step = make_pp_decode(llama, cfg, mesh)(staged)
    pcaches = init_caches(b, max_len, jnp.float32)
    assert pcaches.k.shape == (pp, cfg.num_hidden_layers // pp, b,
                               cfg.num_key_value_heads, max_len,
                               cfg.head_dim)
    lg = None
    for t in range(prompt.shape[1]):
        lg, pcaches = step(staged, pcaches, jnp.asarray(prompt[:, t]))
    got_toks = []
    tok = jnp.argmax(lg, axis=-1)
    for _ in range(4):
        got_toks.append(np.asarray(tok))
        lg, pcaches = step(staged, pcaches, tok)
        tok = jnp.argmax(lg, axis=-1)

    for r, g in zip(ref_toks, got_toks):
        np.testing.assert_array_equal(g, r)
