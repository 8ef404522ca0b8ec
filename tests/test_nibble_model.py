"""Nibble-packed model path: pack_model(nibble=True) end-to-end."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from smoothquant_tpu.models import ForwardContext, llama as jllama
from smoothquant_tpu.models.registry import pack_model
from smoothquant_tpu.quant import w4a4_group


def test_nibble_model_matches_unpacked():
    cfg = jllama.LlamaConfig.tiny()
    params = jllama.init_params(jax.random.PRNGKey(0), cfg)
    qcfg = w4a4_group(group_size=32)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, size=(1, 8)))

    plain = pack_model("llama", params, cfg, qcfg, compute_dtype=jnp.float32)
    nib = pack_model("llama", params, cfg, qcfg, compute_dtype=jnp.float32,
                     nibble=True)
    # nibble storage is half the bytes
    w_plain = plain["layers"]["0"]["self_attn"]["q_proj"].w_qt
    w_nib = nib["layers"]["0"]["self_attn"]["q_proj"].w_qt
    assert w_nib.shape[0] == w_plain.shape[0] // 2

    ctx_int = ForwardContext(quant=qcfg, compute="int", interpret=True)
    ref, _ = jllama.forward(plain, ids, cfg, ctx=ctx_int)
    got, _ = jllama.forward(nib, ids, cfg, ctx=ctx_int)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-3, rtol=1e-3)


def test_nibble_rejects_8bit():
    from smoothquant_tpu.kernels.pack import pack_linear
    from smoothquant_tpu.quant import QuantConfig

    cfg8 = QuantConfig(weight_quant="per_channel", act_quant="per_token",
                       quant_bits=8)
    with pytest.raises(ValueError):
        pack_linear({"weight": np.zeros((8, 64), np.float32), "bias": None},
                    cfg8, nibble=True)
