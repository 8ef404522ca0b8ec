"""Mistral sliding-window attention parity (VERDICT r3 missing #5).

The reference quantizes Mistral through the Llama-like path
(/root/reference/smoothquant/fake_quant.py:464-561) and inherits HF's
windowed attention mask.  A tiny window (8) on a 32-token sequence makes
the window BIND (unlike the reference's 2048-token evals vs the real
4096 window), so these tests fail loudly if the mask is dropped anywhere:
HF-logits parity for prefill, and cached-decode vs no-cache consistency
for the decode bias path.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from smoothquant_tpu.models import llama as jllama
from smoothquant_tpu.models.common import ForwardContext, KVCache

WINDOW = 8
SEQ = 32


def _state_dict_np(model):
    return {k: v.detach().cpu().float().numpy()
            for k, v in model.state_dict().items()}


@pytest.fixture(scope="module")
def hf_mistral():
    from transformers import MistralConfig, MistralForCausalLM

    cfg = MistralConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-6, rope_theta=10000.0,
        tie_word_embeddings=False, sliding_window=WINDOW,
        attn_implementation="eager",
    )
    torch.manual_seed(3)
    model = MistralForCausalLM(cfg).eval()
    return cfg, model


def test_mistral_sliding_window_logits_parity(hf_mistral):
    hf_cfg, model = hf_mistral
    cfg = jllama.config_from_hf(hf_cfg)
    assert cfg.sliding_window == WINDOW
    params = jllama.params_from_hf_state_dict(_state_dict_np(model), cfg,
                                              dtype="float32")
    rng = np.random.default_rng(7)
    ids = rng.integers(0, 128, size=(2, SEQ))
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.float().numpy()
    got, _ = jllama.forward(params, jnp.asarray(ids), cfg)
    np.testing.assert_allclose(np.asarray(got), ref, atol=3e-4, rtol=2e-3)


def test_window_binds(hf_mistral):
    # the same weights WITHOUT the window must disagree — proves the mask
    # actually changed the computation at SEQ > WINDOW
    hf_cfg, model = hf_mistral
    cfg = jllama.config_from_hf(hf_cfg)
    params = jllama.params_from_hf_state_dict(_state_dict_np(model), cfg,
                                              dtype="float32")
    import dataclasses

    cfg_nw = dataclasses.replace(cfg, sliding_window=None)
    rng = np.random.default_rng(7)
    ids = jnp.asarray(rng.integers(0, 128, size=(2, SEQ)))
    with_w, _ = jllama.forward(params, ids, cfg)
    without_w, _ = jllama.forward(params, ids, cfg_nw)
    assert not np.allclose(np.asarray(with_w), np.asarray(without_w),
                           atol=1e-5)


def test_cached_decode_matches_full_forward(hf_mistral):
    # prefill 16 tokens into a cache, decode 8 more one at a time; logits
    # at each decoded position must match the no-cache forward over the
    # full prefix (window = 8 < 24, so decode steps drop old keys)
    hf_cfg, model = hf_mistral
    cfg = jllama.config_from_hf(hf_cfg)
    params = jllama.params_from_hf_state_dict(_state_dict_np(model), cfg,
                                              dtype="float32")
    rng = np.random.default_rng(11)
    ids = rng.integers(0, 128, size=(1, 24))
    full, _ = jllama.forward(params, jnp.asarray(ids), cfg)

    caches = [KVCache.create(1, 32, cfg.num_key_value_heads, cfg.head_dim,
                             jnp.float32)
              for _ in range(cfg.num_hidden_layers)]
    _, caches = jllama.forward(params, jnp.asarray(ids[:, :16]), cfg,
                               caches=caches)
    for t in range(16, 24):
        logits, caches = jllama.forward(params, jnp.asarray(ids[:, t:t + 1]),
                                        cfg, caches=caches)
        np.testing.assert_allclose(np.asarray(logits[:, 0]),
                                   np.asarray(full[:, t]),
                                   atol=2e-4, rtol=2e-3)


def test_stacked_scan_decode_respects_window():
    # the prefetch-scan (stacked packed) decode must fall back to the
    # decode_bias route and carry the window: parity vs the per-layer
    # cached_attention path, and divergence from a windowless run
    import dataclasses

    import jax

    from smoothquant_tpu.models.common import QuantKVCache
    from smoothquant_tpu.models.registry import pack_model
    from smoothquant_tpu.quant import w4a4_group

    cfg = dataclasses.replace(
        jllama.LlamaConfig.tiny(), hidden_size=256, intermediate_size=256,
        num_attention_heads=2, num_key_value_heads=2, num_hidden_layers=2,
        sliding_window=4)
    params = jllama.init_params(jax.random.PRNGKey(0), cfg)
    qcfg = w4a4_group(group_size=16, salient_prop=0.05)
    rng = np.random.default_rng(1)
    feat = {key: rng.uniform(0.1, 1.0, size=(
        cfg.intermediate_size if "down_proj" in key else cfg.hidden_size,))
        for _, key, _ in jllama.quantizable_linears(cfg)}
    packed = pack_model("llama", params, cfg, qcfg, input_feat=feat,
                        compute_dtype=jnp.float32, nibble=True)
    # cache length 128 (kernel-tileable) selects the prefetch-scan decode;
    # a SHORT (5-token) prefill keeps the chaotic random-weight model from
    # amplifying benign 1-ulp scan-vs-loop fusion differences through int4
    # quantization boundaries (same recipe as test_prefetch_scan); window 4
    # still binds at decode position 5 (keys 2..5 visible)
    ctx = ForwardContext(quant=qcfg, compute="int", interpret=True,
                         fuse_attn="off")
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(2, 5)))
    caches = [QuantKVCache.create(2, 128, cfg.num_key_value_heads,
                                  cfg.head_dim, jnp.float32)
              for _ in range(cfg.num_hidden_layers)]
    _, caches = jllama.forward(packed, prompt, cfg, ctx=ctx, caches=caches)

    stacked = jllama.stack_layers(packed, cfg)
    scache = jax.tree.map(lambda *xs: jnp.stack(xs), *caches)
    tok = jnp.asarray([[3], [5]])
    ref, _ = jllama.forward(packed, tok, cfg, ctx=ctx, caches=caches)
    got, _ = jllama.forward(stacked, tok, cfg, ctx=ctx, caches=scache)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)

    cfg_nw = dataclasses.replace(cfg, sliding_window=None)
    got_nw, _ = jllama.forward(stacked, tok, cfg_nw, ctx=ctx, caches=scache)
    assert not np.allclose(np.asarray(got), np.asarray(got_nw), atol=1e-5)
