"""HF logits parity for Mixtral, Falcon (3 layouts), and Bloom."""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from smoothquant_tpu.models import bloom as jbloom
from smoothquant_tpu.models import falcon as jfalcon
from smoothquant_tpu.models import mixtral as jmixtral


def _state_dict_np(model):
    return {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}


def _check(jmod, hf_model, hf_cfg, seed=0, atol=3e-4):
    cfg = jmod.config_from_hf(hf_cfg)
    params = jmod.params_from_hf_state_dict(_state_dict_np(hf_model), cfg,
                                            dtype="float32")
    ids = np.random.default_rng(seed).integers(0, hf_cfg.vocab_size, size=(2, 11))
    with torch.no_grad():
        ref = hf_model(torch.tensor(ids)).logits.float().numpy()
    got, _ = jmod.forward(params, jnp.asarray(ids), cfg)
    np.testing.assert_allclose(np.asarray(got), ref, atol=atol, rtol=3e-3)


def test_mixtral_parity():
    from transformers import MixtralConfig, MixtralForCausalLM

    cfg = MixtralConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=64, rms_norm_eps=1e-5,
    )
    torch.manual_seed(0)
    _check(jmixtral, MixtralForCausalLM(cfg).eval(), cfg)


@pytest.mark.parametrize("layout", ["7b", "40b", "rw"])
def test_falcon_parity(layout):
    from transformers import FalconConfig, FalconForCausalLM

    kw = dict(vocab_size=128, hidden_size=64, num_hidden_layers=2,
              num_attention_heads=4, bias=False, alibi=False)
    if layout == "7b":
        kw.update(multi_query=True, parallel_attn=True,
                  new_decoder_architecture=False)
    elif layout == "40b":
        kw.update(multi_query=False, parallel_attn=True,
                  new_decoder_architecture=True, num_kv_heads=2)
    else:  # rw: sequential
        kw.update(multi_query=False, parallel_attn=False,
                  new_decoder_architecture=False)
    cfg = FalconConfig(**kw)
    torch.manual_seed(1)
    _check(jfalcon, FalconForCausalLM(cfg).eval(), cfg, seed=1)


def test_bloom_parity():
    from transformers import BloomConfig, BloomForCausalLM

    cfg = BloomConfig(vocab_size=128, hidden_size=64, n_layer=2, n_head=4)
    torch.manual_seed(2)
    _check(jbloom, BloomForCausalLM(cfg).eval(), cfg, seed=2)


def test_mixtral_quantize_and_smooth_run():
    import jax

    from smoothquant_tpu.models import ForwardContext
    from smoothquant_tpu.models.registry import quantize_model, smooth_lm
    from smoothquant_tpu.quant import w4a4_group
    from smoothquant_tpu.quant.calibrate import get_act_scales

    cfg = jmixtral.MixtralConfig.tiny()
    params = jmixtral.init_params(jax.random.PRNGKey(0), cfg)
    batches = [jnp.asarray(np.random.default_rng(i).integers(0, 256, size=(1, 16)))
               for i in range(2)]

    def fwd(p, ids, col):
        jmixtral.forward(p, ids, cfg, ctx=ForwardContext(taps=col))

    scales = get_act_scales(fwd, params, batches)
    smoothed = smooth_lm("mixtral", params, cfg, scales, alpha=0.5)
    ids = batches[0]
    ref, _ = jmixtral.forward(params, ids, cfg)
    got, _ = jmixtral.forward(smoothed, ids, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-3)

    qcfg = w4a4_group(group_size=32)
    qparams = quantize_model("mixtral", smoothed, cfg, qcfg)
    out, _ = jmixtral.forward(qparams, ids, cfg, ctx=ForwardContext(quant=qcfg))
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.parametrize("arch,mod,cfg_fn", [
    ("falcon", jfalcon, lambda: jfalcon.FalconConfig.tiny()),
    ("bloom", jbloom, lambda: jbloom.BloomConfig.tiny()),
])
def test_smooth_preserves_outputs(arch, mod, cfg_fn):
    import jax

    from smoothquant_tpu.models import ForwardContext
    from smoothquant_tpu.models.registry import smooth_lm
    from smoothquant_tpu.quant.calibrate import get_act_scales

    cfg = cfg_fn()
    params = mod.init_params(jax.random.PRNGKey(3), cfg)
    batches = [jnp.asarray(np.random.default_rng(i).integers(0, 256, size=(1, 12)))
               for i in range(2)]

    def fwd(p, ids, col):
        mod.forward(p, ids, cfg, ctx=ForwardContext(taps=col))

    scales = get_act_scales(fwd, params, batches)
    smoothed = smooth_lm(arch, params, cfg, scales, alpha=0.5)
    ids = batches[0]
    ref, _ = mod.forward(params, ids, cfg)
    got, _ = mod.forward(smoothed, ids, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-3)


def test_falcon_stacked_scan_parity():
    """stack_layers + lax.scan forward == per-layer loop (both layouts),
    including cached decode over stacked caches."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from smoothquant_tpu.models.common import KVCache

    for kw in (dict(), dict(new_decoder_architecture=True,
                            num_kv_heads=2)):
        cfg = jfalcon.FalconConfig.tiny(**kw)
        params = jfalcon.init_params(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(0)
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(2, 6)))
        ref, _ = jfalcon.forward(params, ids, cfg)
        stacked = jfalcon.stack_layers(params, cfg)
        got, _ = jfalcon.forward(stacked, ids, cfg)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

        # cached decode: prefill per-layer, decode stacked
        caches = [KVCache.create(2, 32, cfg.effective_kv_heads, cfg.head_dim,
                                 jnp.float32)
                  for _ in range(cfg.num_hidden_layers)]
        _, caches = jfalcon.forward(params, ids, cfg, caches=caches)
        scache = jax.tree.map(lambda *xs: jnp.stack(xs), *caches)
        tok = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(2, 1)))
        r2, _ = jfalcon.forward(params, tok, cfg, caches=caches)
        g2, sc2 = jfalcon.forward(stacked, tok, cfg, caches=scache)
        np.testing.assert_allclose(np.asarray(g2), np.asarray(r2),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_array_equal(
            np.asarray(sc2.pos), np.asarray([c.pos for c in caches]) + 1)


def test_bloom_stacked_scan_parity():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from smoothquant_tpu.models.common import KVCache

    cfg = jbloom.BloomConfig.tiny()
    params = jbloom.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(2, 6)))
    ref, _ = jbloom.forward(params, ids, cfg)
    stacked = jbloom.stack_layers(params, cfg)
    got, _ = jbloom.forward(stacked, ids, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)

    caches = [KVCache.create(2, 32, cfg.num_attention_heads, cfg.head_dim,
                             jnp.float32)
              for _ in range(cfg.num_hidden_layers)]
    _, caches = jbloom.forward(params, ids, cfg, caches=caches)
    scache = jax.tree.map(lambda *xs: jnp.stack(xs), *caches)
    tok = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(2, 1)))
    r2, _ = jbloom.forward(params, tok, cfg, caches=caches)
    g2, _ = jbloom.forward(stacked, tok, cfg, caches=scache)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(r2),
                               rtol=2e-4, atol=2e-4)
