"""Forward-pass parity vs HuggingFace transformers (torch CPU).

We can't download pretrained weights (zero egress), but we can instantiate
tiny random HF models from configs, export their state dicts, import them
into our JAX params pytrees, and demand logits parity.  This pins our model
implementations to the exact architecture the reference quantizes.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from smoothquant_tpu.models import llama as jllama
from smoothquant_tpu.models import opt as jopt


def _state_dict_np(model):
    return {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}


@pytest.fixture(scope="module")
def hf_llama():
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-6, rope_theta=10000.0,
        tie_word_embeddings=False, attention_bias=False,
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(cfg).eval()
    return cfg, model


@pytest.fixture(scope="module")
def hf_opt():
    from transformers import OPTConfig, OPTForCausalLM

    cfg = OPTConfig(
        vocab_size=128, hidden_size=64, ffn_dim=128, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=64,
        word_embed_proj_dim=64, do_layer_norm_before=True,
    )
    torch.manual_seed(0)
    model = OPTForCausalLM(cfg).eval()
    return cfg, model


def test_llama_logits_parity(hf_llama):
    hf_cfg, model = hf_llama
    cfg = jllama.config_from_hf(hf_cfg)
    params = jllama.params_from_hf_state_dict(_state_dict_np(model), cfg, dtype="float32")

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 128, size=(2, 17))
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.float().numpy()
    got, _ = jllama.forward(params, jnp.asarray(ids), cfg)
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4, rtol=2e-3)


def test_llama_gqa_heads_differ_from_mha(hf_llama):
    # sanity: our GQA repeat path is exercised (n_kv != n_heads in fixture)
    hf_cfg, _ = hf_llama
    assert hf_cfg.num_key_value_heads != hf_cfg.num_attention_heads


def test_opt_logits_parity(hf_opt):
    hf_cfg, model = hf_opt
    cfg = jopt.config_from_hf(hf_cfg)
    params = jopt.params_from_hf_state_dict(_state_dict_np(model), cfg, dtype="float32")

    rng = np.random.default_rng(1)
    ids = rng.integers(0, 128, size=(2, 13))
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.float().numpy()
    got, _ = jopt.forward(params, jnp.asarray(ids), cfg)
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4, rtol=2e-3)


def test_opt_project_in_out_parity():
    # word_embed_proj_dim != hidden_size (the OPT-350m layout)
    from transformers import OPTConfig, OPTForCausalLM

    hf_cfg = OPTConfig(
        vocab_size=128, hidden_size=64, ffn_dim=128, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=64,
        word_embed_proj_dim=32, do_layer_norm_before=False,
    )
    torch.manual_seed(2)
    model = OPTForCausalLM(hf_cfg).eval()
    cfg = jopt.config_from_hf(hf_cfg)
    params = jopt.params_from_hf_state_dict(_state_dict_np(model), cfg, dtype="float32")

    ids = np.random.default_rng(2).integers(0, 128, size=(1, 9))
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.float().numpy()
    got, _ = jopt.forward(params, jnp.asarray(ids), cfg)
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4, rtol=2e-3)


def test_llama_kv_cache_decode_matches_full_forward(hf_llama):
    hf_cfg, model = hf_llama
    cfg = jllama.config_from_hf(hf_cfg)
    params = jllama.params_from_hf_state_dict(_state_dict_np(model), cfg, dtype="float32")

    from smoothquant_tpu.models.common import KVCache

    ids = np.random.default_rng(3).integers(0, 128, size=(1, 10))
    full_logits, _ = jllama.forward(params, jnp.asarray(ids), cfg)

    caches = [
        KVCache.create(1, 16, cfg.num_key_value_heads, cfg.head_dim, jnp.float32)
        for _ in range(cfg.num_hidden_layers)
    ]
    # prefill on first 6 tokens, then decode one at a time
    logits, caches = jllama.forward(params, jnp.asarray(ids[:, :6]), cfg, caches=caches)
    step_logits = [np.asarray(logits)[:, -1]]
    for t in range(6, 10):
        logits, caches = jllama.forward(params, jnp.asarray(ids[:, t : t + 1]), cfg, caches=caches)
        step_logits.append(np.asarray(logits)[:, -1])

    for i, t in enumerate(range(5, 10)):
        np.testing.assert_allclose(
            step_logits[i], np.asarray(full_logits)[:, t], atol=2e-4, rtol=2e-3
        )
