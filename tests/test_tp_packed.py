"""Tensor-parallel packed execution on the 8-device virtual CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from smoothquant_tpu.models import ForwardContext, llama as jllama, opt as jopt
from smoothquant_tpu.models.registry import pack_model
from smoothquant_tpu.parallel import make_mesh
from smoothquant_tpu.parallel.tp_packed import assert_tp_divisible, make_tp_forward
from smoothquant_tpu.quant import QuantConfig, w4a4_group


@pytest.fixture(scope="module")
def mesh4():
    return make_mesh(tp=4, dp=2)


class TestTPPacked:
    @pytest.mark.parametrize("qcfg", [
        w4a4_group(group_size=32),
        QuantConfig(weight_quant="per_channel", act_quant="per_token", quant_bits=8),
    ])
    def test_llama_tp_matches_single_device(self, mesh4, qcfg):
        cfg = jllama.LlamaConfig.tiny()
        params = jllama.init_params(jax.random.PRNGKey(0), cfg)
        packed = pack_model("llama", params, cfg, qcfg, compute_dtype=jnp.float32)
        ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, size=(2, 10)))

        ref, _ = jllama.forward(packed, ids, cfg,
                                ctx=ForwardContext(quant=qcfg, interpret=True))
        fwd_tp = make_tp_forward(jllama, cfg, qcfg, mesh4, interpret=True)(packed)
        got = fwd_tp(packed, ids)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-3, rtol=2e-3)

    def test_opt_tp_matches_single_device(self, mesh4):
        cfg = jopt.OPTConfig.tiny()
        params = jopt.init_params(jax.random.PRNGKey(1), cfg)
        qcfg = w4a4_group(group_size=32, salient_prop=0.1)
        feat = {
            key: np.random.default_rng(7).uniform(0.1, 1.0, size=(
                cfg.ffn_dim if "fc2" in key else cfg.hidden_size,))
            for _, key, _ in jopt.quantizable_linears(cfg)
        }
        packed = pack_model("opt", params, cfg, qcfg, input_feat=feat,
                            compute_dtype=jnp.float32)
        ids = jnp.asarray(np.random.default_rng(2).integers(0, 256, size=(1, 8)))
        ref, _ = jopt.forward(packed, ids, cfg,
                              ctx=ForwardContext(quant=qcfg, interpret=True))
        fwd_tp = make_tp_forward(jopt, cfg, qcfg, mesh4, interpret=True)(packed)
        got = fwd_tp(packed, ids)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-3, rtol=2e-3)

    def test_divisibility_guard(self, mesh4):
        cfg = jllama.LlamaConfig.tiny()
        params = jllama.init_params(jax.random.PRNGKey(3), cfg)
        packed = pack_model("llama", params, cfg, w4a4_group(group_size=32),
                            compute_dtype=jnp.float32)
        with pytest.raises(ValueError):
            assert_tp_divisible(packed, 7)
