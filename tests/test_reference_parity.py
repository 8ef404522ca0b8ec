"""Bit-parity oracle vs the reference torch source (VERDICT r1 item #2).

The reference repository sits read-only at /root/reference with torch
installed, so its quantizers, W4A4Linear, and smooth_lm can serve as a
bit-level oracle for our jnp re-implementations:

  (a) every quantizer primitive in quant/core matches
      /root/reference/smoothquant/fake_quant.py:9-207 bit-for-bit on random
      fp32 tensors, including padding and sorted-group cases;
  (b) quantize_linear_params + quant_linear match W4A4Linear.from_float +
      forward (fake_quant.py:209-374), including salient-column restore;
  (c) registry.smooth_lm matches smooth.smooth_lm (smooth.py:18-160) on
      tiny randomly-initialized HF OPT and Llama models.

The one intentional divergence — the reference's output-side salient mask
reuses the *input*-channel mask on output columns (fake_quant.py:309-314) —
is asserted as such: our salient-agnostic output quantization is pinned to
its own oracle and shown to differ from the reference's masked behavior.
"""

import copy
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")
from smoothquant import fake_quant as ref_fq  # noqa: E402
from smoothquant import smooth as ref_smooth  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from smoothquant_tpu.models import llama as jllama  # noqa: E402
from smoothquant_tpu.models import opt as jopt  # noqa: E402
from smoothquant_tpu.models.registry import smooth_lm as our_smooth_lm  # noqa: E402
from smoothquant_tpu.quant import core  # noqa: E402
from smoothquant_tpu.quant.config import QuantConfig  # noqa: E402
from smoothquant_tpu.quant.linear import (  # noqa: E402
    quant_linear,
    quantize_linear_params,
)


def _state_dict_np(model):
    return {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}


# ---------------------------------------------------------------------------
# (a) quantizer primitives
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n_bits", [4, 8])
@pytest.mark.parametrize("name,kwargs,shape", [
    ("quantize_weight_per_channel_absmax", {}, (24, 96)),
    ("quantize_weight_per_tensor_absmax", {}, (24, 96)),
    ("quantize_weight_per_group_absmax", {"group_size": 32}, (24, 96)),
    ("quantize_weight_per_group_absmax", {"group_size": 32}, (24, 90)),   # pad
    ("quantize_weight_per_group_absmax_sort", {"group_size": 32}, (24, 96)),
    ("quantize_weight_per_group_absmax_sort", {"group_size": 32}, (24, 90)),
    ("quantize_activation_per_token_absmax", {}, (4, 6, 96)),
    ("quantize_activation_per_tensor_absmax", {}, (4, 6, 96)),
    ("quantize_activation_per_group_absmax", {"group_size": 32}, (4, 6, 96)),
    ("quantize_activation_per_group_absmax", {"group_size": 32}, (4, 6, 90)),
    ("quantize_activation_per_group_absmax_sort", {"group_size": 32}, (4, 6, 96)),
    ("quantize_activation_per_group_absmax_sort", {"group_size": 32}, (4, 6, 90)),
])
def test_quantizer_bit_parity(name, kwargs, shape, n_bits):
    rng = np.random.default_rng(sum(shape) + n_bits)
    x = (rng.normal(size=shape) * rng.uniform(0.5, 3.0)).astype(np.float32)
    # reference quantizers mutate in place — hand them their own copy.
    # per-token/per-tensor activation variants return the flattened (N, C)
    # view (fake_quant.py:56-75 never reshape back); values are what matters.
    ref = getattr(ref_fq, name)(torch.tensor(x), n_bits=n_bits, **kwargs)
    ref = ref.numpy().reshape(shape)
    got = np.asarray(getattr(core, name)(jnp.asarray(x), n_bits=n_bits, **kwargs))
    np.testing.assert_allclose(got, ref, atol=1e-6, rtol=0)


def test_quantizer_scale_floor_parity():
    # near-zero rows exercise the clamp(absmax, 1e-5) floor before division
    x = np.full((8, 32), 1e-7, np.float32)
    ref = ref_fq.quantize_weight_per_channel_absmax(torch.tensor(x), 8).numpy()
    got = np.asarray(core.quantize_weight_per_channel_absmax(jnp.asarray(x), 8))
    np.testing.assert_allclose(got, ref, atol=0, rtol=0)


# ---------------------------------------------------------------------------
# (b) W4A4Linear.from_float + forward
# ---------------------------------------------------------------------------


def _make_linear(in_f, out_f, seed, bias=True):
    torch.manual_seed(seed)
    return torch.nn.Linear(in_f, out_f, bias=bias).float().eval()


def _our_params(lin):
    return {
        "weight": jnp.asarray(lin.weight.detach().numpy()),
        "bias": None if lin.bias is None else jnp.asarray(lin.bias.detach().numpy()),
    }


@pytest.mark.parametrize("salient_prop", [0.0, 0.1])
@pytest.mark.parametrize("weight_quant,act_quant,group_size", [
    ("per_channel", "per_token", 128),
    ("per_tensor", "per_tensor", 128),
    ("per_group", "per_group", 32),
])
def test_w4a4_linear_forward_parity(weight_quant, act_quant, group_size,
                                    salient_prop):
    in_f, out_f = 96, 80
    lin = _make_linear(in_f, out_f, seed=3)
    rng = np.random.default_rng(7)
    importance = (rng.uniform(0.01, 1.0, size=(in_f,)).astype(np.float32)
                  if salient_prop else None)

    ref_mod = ref_fq.W4A4Linear.from_float(
        copy.deepcopy(lin), weight_quant=weight_quant, act_quant=act_quant,
        quantize_output=False,
        importance=None if importance is None else torch.tensor(importance),
        salient_prop=salient_prop, quant_bits=4, group_size=group_size,
    )
    x = rng.normal(size=(2, 5, in_f)).astype(np.float32)
    with torch.no_grad():
        ref_y = ref_mod(torch.tensor(x)).numpy()

    cfg = QuantConfig(weight_quant=weight_quant, act_quant=act_quant,
                      quant_bits=4, group_size=group_size,
                      salient_prop=salient_prop)
    qp = quantize_linear_params(_our_params(lin), cfg, importance)
    got = np.asarray(quant_linear(qp, jnp.asarray(x), cfg))
    # Q-DQ values are bit-identical; only fp32 GEMM accumulation order differs
    np.testing.assert_allclose(got, ref_y, atol=2e-5, rtol=2e-5)


def test_w4a4_quantized_weights_bitwise_parity():
    # weight path alone (no GEMM): must be exactly equal incl. salient restore
    in_f, out_f = 90, 64
    lin = _make_linear(in_f, out_f, seed=11)
    importance = np.random.default_rng(1).uniform(0.01, 1.0, size=(in_f,)).astype(np.float32)
    ref_mod = ref_fq.W4A4Linear.from_float(
        copy.deepcopy(lin), weight_quant="per_group", act_quant="per_group",
        importance=torch.tensor(importance), salient_prop=0.1,
        quant_bits=4, group_size=32,
    )
    cfg = QuantConfig(weight_quant="per_group", act_quant="per_group",
                      quant_bits=4, group_size=32, salient_prop=0.1)
    qp = quantize_linear_params(_our_params(lin), cfg, importance)
    np.testing.assert_array_equal(np.asarray(qp["weight"]),
                                  ref_mod.weight.numpy())
    # same salient channels selected
    ref_sal = np.sort(ref_mod.salient_indices.numpy())
    np.testing.assert_array_equal(np.sort(np.asarray(qp["salient_indices"])), ref_sal)


def test_quantize_output_parity_no_salient():
    # quantize_output (simulated quantized BMM input) with no salient set:
    # both sides apply the full activation quantizer to the output
    in_f = out_f = 64
    lin = _make_linear(in_f, out_f, seed=5)
    ref_mod = ref_fq.W4A4Linear.from_float(
        copy.deepcopy(lin), weight_quant="per_channel", act_quant="per_token",
        quantize_output=True, quant_bits=8,
    )
    x = np.random.default_rng(2).normal(size=(4, in_f)).astype(np.float32)
    with torch.no_grad():
        ref_y = ref_mod(torch.tensor(x)).numpy()
    cfg = QuantConfig(weight_quant="per_channel", act_quant="per_token",
                      quant_bits=8, quantize_bmm_input=True)
    qp = quantize_linear_params(_our_params(lin), cfg)
    got = np.asarray(quant_linear(qp, jnp.asarray(x), cfg, quantize_output=True))
    np.testing.assert_allclose(got, ref_y, atol=2e-5, rtol=2e-5)


def test_output_mask_divergence_is_intentional():
    """The reference reuses the INPUT-channel salient mask on OUTPUT columns
    (fake_quant.py:309-314) — only dimensionally valid for square layers and
    conceptually wrong (saliency is an input-channel property).  We do not
    replicate it: our output quantization is salient-agnostic.  This test
    pins both behaviors so the divergence stays documented and deliberate.
    """
    in_f = out_f = 64  # square, so the reference's mask reuse is shape-legal
    lin = _make_linear(in_f, out_f, seed=9)
    importance = np.random.default_rng(3).uniform(0.01, 1.0, size=(in_f,)).astype(np.float32)
    ref_mod = ref_fq.W4A4Linear.from_float(
        copy.deepcopy(lin), weight_quant="per_channel", act_quant="per_token",
        quantize_output=True, importance=torch.tensor(importance),
        salient_prop=0.1, quant_bits=4,
    )
    x = np.random.default_rng(4).normal(size=(4, in_f)).astype(np.float32)
    with torch.no_grad():
        ref_y = ref_mod(torch.tensor(x)).numpy()

    cfg = QuantConfig(weight_quant="per_channel", act_quant="per_token",
                      quant_bits=4, salient_prop=0.1, quantize_bmm_input=True)
    qp = quantize_linear_params(_our_params(lin), cfg, importance)
    got = np.asarray(quant_linear(qp, jnp.asarray(x), cfg, quantize_output=True))

    # our behavior == salient-agnostic oracle: full Q-DQ of the pre-output y
    y_pre = np.asarray(quant_linear(qp, jnp.asarray(x), cfg, quantize_output=False))
    oracle = np.asarray(core.quantize_activation_per_token_absmax(
        jnp.asarray(y_pre), 4))
    np.testing.assert_allclose(got, oracle, atol=2e-5, rtol=2e-5)

    # the reference's masked output keeps salient-indexed OUTPUT columns
    # unquantized — assert the two paths genuinely differ there
    sal = np.sort(ref_mod.salient_indices.numpy())
    assert not np.allclose(got[:, sal], ref_y[:, sal], atol=1e-4)


# ---------------------------------------------------------------------------
# (c) smooth_lm on tiny HF models
# ---------------------------------------------------------------------------


def _smooth_scales(keys, dim, seed):
    rng = np.random.default_rng(seed)
    return {k: rng.uniform(0.05, 4.0, size=(dim,)).astype(np.float32) for k in keys}


def test_smooth_lm_parity_opt():
    from transformers import OPTConfig, OPTForCausalLM

    hf_cfg = OPTConfig(vocab_size=128, hidden_size=64, ffn_dim=128,
                       num_hidden_layers=2, num_attention_heads=4,
                       max_position_embeddings=64, word_embed_proj_dim=64)
    torch.manual_seed(0)
    model = OPTForCausalLM(hf_cfg).float().eval()

    keys = [f"model.decoder.layers.{i}.{s}"
            for i in range(2) for s in ("self_attn.q_proj", "fc1")]
    scales = _smooth_scales(keys, 64, seed=5)

    cfg = jopt.config_from_hf(hf_cfg)
    ours = jopt.params_from_hf_state_dict(_state_dict_np(model), cfg,
                                          dtype="float32")
    ours = our_smooth_lm("opt", ours, cfg, scales, alpha=0.6)

    ref_smooth.smooth_lm(model, {k: torch.tensor(v) for k, v in scales.items()},
                         alpha=0.6)
    ref_params = jopt.params_from_hf_state_dict(_state_dict_np(model), cfg,
                                                dtype="float32")

    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(ours)[0],
        jax.tree_util.tree_flatten_with_path(ref_params)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-6,
            err_msg=str(path))


def test_smooth_lm_parity_llama():
    from transformers import LlamaConfig, LlamaForCausalLM

    hf_cfg = LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=2, max_position_embeddings=64,
                         tie_word_embeddings=False, attention_bias=False)
    torch.manual_seed(1)
    model = LlamaForCausalLM(hf_cfg).float().eval()

    keys = [f"model.layers.{i}.{s}"
            for i in range(2) for s in ("self_attn.q_proj", "mlp.gate_proj")]
    scales = _smooth_scales(keys, 64, seed=6)

    cfg = jllama.config_from_hf(hf_cfg)
    ours = jllama.params_from_hf_state_dict(_state_dict_np(model), cfg,
                                            dtype="float32")
    ours = our_smooth_lm("llama", ours, cfg, scales, alpha=0.85)

    ref_smooth.smooth_lm(model, {k: torch.tensor(v) for k, v in scales.items()},
                         alpha=0.85)
    ref_params = jllama.params_from_hf_state_dict(_state_dict_np(model), cfg,
                                                  dtype="float32")

    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(ours)[0],
        jax.tree_util.tree_flatten_with_path(ref_params)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-6,
            err_msg=str(path))
