"""Model-level quantization surgery, smoothing, and calibration tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from smoothquant_tpu.models import ForwardContext, llama as jllama, opt as jopt
from smoothquant_tpu.models.registry import quantize_model, smooth_lm
from smoothquant_tpu.quant import QuantConfig, w4a4_group
from smoothquant_tpu.quant.calibrate import TapCollector, get_act_scales, get_calib_feat


@pytest.fixture(scope="module")
def tiny_llama():
    cfg = jllama.LlamaConfig.tiny()
    params = jllama.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


@pytest.fixture(scope="module")
def tiny_opt():
    cfg = jopt.OPTConfig.tiny()
    params = jopt.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _batches(n, vocab=256, seq=16, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, vocab, size=(1, seq)) for _ in range(n)]


class TestCalibration:
    def test_act_scales_keys_and_shapes(self, tiny_llama):
        cfg, params = tiny_llama

        def fwd(p, ids, col):
            jllama.forward(p, ids, cfg, ctx=ForwardContext(taps=col))

        scales = get_act_scales(fwd, params, [jnp.asarray(b) for b in _batches(2)])
        assert "model.layers.0.self_attn.q_proj" in scales
        assert "model.layers.1.mlp.down_proj" in scales
        assert scales["model.layers.0.self_attn.q_proj"].shape == (cfg.hidden_size,)
        assert scales["model.layers.0.mlp.down_proj"].shape == (cfg.intermediate_size,)
        assert all(np.all(v > 0) for v in scales.values())

    def test_act_scales_running_max(self, tiny_llama):
        cfg, params = tiny_llama

        def fwd(p, ids, col):
            jllama.forward(p, ids, cfg, ctx=ForwardContext(taps=col))

        b = [jnp.asarray(x) for x in _batches(3)]
        all3 = get_act_scales(fwd, params, b)
        first = get_act_scales(fwd, params, b[:1])
        for k in all3:
            assert np.all(all3[k] >= first[k] - 1e-7)

    def test_calib_feat_is_sum_over_batches(self, tiny_llama):
        cfg, params = tiny_llama

        def fwd(p, ids, col):
            jllama.forward(p, ids, cfg, ctx=ForwardContext(taps=col))

        b = [jnp.asarray(x) for x in _batches(2)]
        both = get_calib_feat(fwd, params, b)
        one = get_calib_feat(fwd, params, b[:1])
        other = get_calib_feat(fwd, params, b[1:])
        for k in both:
            np.testing.assert_allclose(both[k], one[k] + other[k], rtol=1e-5)


class TestSmoothing:
    @pytest.mark.parametrize("arch_fixture", ["tiny_llama", "tiny_opt"])
    def test_smoothing_preserves_fp_outputs(self, arch_fixture, request):
        cfg, params = request.getfixturevalue(arch_fixture)
        arch = "llama" if arch_fixture == "tiny_llama" else "opt"
        mod = jllama if arch == "llama" else jopt

        def fwd(p, ids, col):
            mod.forward(p, ids, cfg, ctx=ForwardContext(taps=col))

        batches = [jnp.asarray(b) for b in _batches(2)]
        scales = get_act_scales(fwd, params, batches)
        smoothed = smooth_lm(arch, params, cfg, scales, alpha=0.5)

        ids = jnp.asarray(_batches(1, seed=9)[0])
        ref, _ = mod.forward(params, ids, cfg)
        got, _ = mod.forward(smoothed, ids, cfg)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-3)

    def test_smoothing_moves_outliers_into_weights(self, tiny_llama):
        cfg, params = tiny_llama

        def fwd(p, ids, col):
            jllama.forward(p, ids, cfg, ctx=ForwardContext(taps=col))

        scales = get_act_scales(fwd, params, [jnp.asarray(b) for b in _batches(2)])
        # inflate one channel's act scale: smoothing must boost that weight col
        key = "model.layers.0.self_attn.q_proj"
        scales[key] = scales[key].copy()
        scales[key][7] *= 100.0
        smoothed = smooth_lm("llama", params, cfg, scales, alpha=0.5)
        w_old = np.asarray(params["layers"]["0"]["self_attn"]["q_proj"]["weight"])
        w_new = np.asarray(smoothed["layers"]["0"]["self_attn"]["q_proj"]["weight"])
        assert np.abs(w_new[:, 7]).max() > np.abs(w_old[:, 7]).max() * 3
        ln_old = np.asarray(params["layers"]["0"]["input_layernorm"]["weight"])
        ln_new = np.asarray(smoothed["layers"]["0"]["input_layernorm"]["weight"])
        assert ln_new[7] < ln_old[7]

    def test_missing_scales_key_raises(self, tiny_llama):
        cfg, params = tiny_llama
        with pytest.raises(KeyError):
            smooth_lm("llama", params, cfg, {}, alpha=0.5)


class TestQuantizeModel:
    def test_w8a8_close_to_fp(self, tiny_llama):
        cfg, params = tiny_llama
        qcfg = QuantConfig(weight_quant="per_channel", act_quant="per_token",
                           quant_bits=8, quantize_bmm_input=True)
        qparams = quantize_model("llama", params, cfg, qcfg)
        ids = jnp.asarray(_batches(1)[0])
        ref, _ = jllama.forward(params, ids, cfg)
        got, _ = jllama.forward(qparams, ids, cfg, ctx=ForwardContext(quant=qcfg))
        ref, got = np.asarray(ref), np.asarray(got)
        # 8-bit should track FP closely in logit space
        assert np.abs(got - ref).mean() < 0.05 * np.abs(ref).mean() + 0.05

    def test_w4a4_group_runs_and_degrades_gracefully(self, tiny_opt):
        cfg, params = tiny_opt
        qcfg = w4a4_group(group_size=32, salient_prop=0.1)

        def fwd(p, ids, col):
            jopt.forward(p, ids, cfg, ctx=ForwardContext(taps=col))

        feat = get_calib_feat(fwd, params, [jnp.asarray(b) for b in _batches(2)])
        qparams = quantize_model("opt", params, cfg, qcfg, input_feat=feat)
        # salient metadata present on quantized projections
        assert "salient_indices" in qparams["layers"]["0"]["fc1"]
        ids = jnp.asarray(_batches(1)[0])
        got, _ = jopt.forward(qparams, ids, cfg, ctx=ForwardContext(quant=qcfg))
        assert np.all(np.isfinite(np.asarray(got)))

    def test_salient_restores_weight_columns(self, tiny_llama):
        cfg, params = tiny_llama
        qcfg = QuantConfig(weight_quant="per_channel", act_quant="per_token",
                           quant_bits=4, salient_prop=0.1)
        feat = {
            f"model.layers.{i}.{grp}.{p}": np.random.default_rng(i).uniform(
                0.1, 1.0, size=(cfg.hidden_size if p not in ("down_proj",) else cfg.intermediate_size,)
            )
            for i in range(cfg.num_hidden_layers)
            for grp, ps in (("self_attn", ("q_proj", "k_proj", "v_proj", "o_proj")),
                            ("mlp", ("gate_proj", "up_proj", "down_proj")))
            for p in ps
        }
        qparams = quantize_model("llama", params, cfg, qcfg, input_feat=feat)
        lin_q = qparams["layers"]["0"]["self_attn"]["q_proj"]
        w_orig = np.asarray(params["layers"]["0"]["self_attn"]["q_proj"]["weight"])
        w_q = np.asarray(lin_q["weight"])
        sal = np.asarray(lin_q["salient_indices"])
        np.testing.assert_array_equal(w_q[:, sal], w_orig[:, sal])
        non_sal = np.setdiff1d(np.arange(cfg.hidden_size), sal)
        assert not np.allclose(w_q[:, non_sal], w_orig[:, non_sal])

    def test_quantized_forward_is_jittable(self, tiny_llama):
        cfg, params = tiny_llama
        qcfg = w4a4_group(group_size=32)
        qparams = quantize_model("llama", params, cfg, qcfg)
        fwd = jax.jit(lambda p, ids: jllama.forward(p, ids, cfg, ctx=ForwardContext(quant=qcfg))[0])
        ids = jnp.asarray(_batches(1)[0])
        out1 = fwd(qparams, ids)
        out2 = fwd(qparams, ids)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))
