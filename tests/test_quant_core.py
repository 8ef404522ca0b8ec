"""Golden-value and property tests for the quantization core.

The oracle is an independent numpy implementation of the spec (symmetric
absmax, q_max = 2^(b-1)-1, absmax clamped to 1e-5 before dividing, round to
nearest even, right zero-pad groups, sorted grouping with inverse perm).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from smoothquant_tpu.quant import core


def np_scale(absmax, n_bits):
    return np.maximum(absmax, 1e-5) / (2 ** (n_bits - 1) - 1)


def np_qdq(x, scale):
    # numpy rounds half-to-even, same as jnp.round / torch.round
    return np.round(x / scale) * scale


def np_group_qdq(x2d, n_bits, g):
    n, c = x2d.shape
    ng = -(-c // g)
    pad = ng * g - c
    xp = np.pad(x2d, ((0, 0), (0, pad)))
    xg = xp.reshape(n, ng, g)
    s = np_scale(np.abs(xg).max(-1, keepdims=True), n_bits)
    return np_qdq(xg, s).reshape(n, ng * g)[:, :c]


def np_sorted_group_qdq(x2d, n_bits, g):
    perm = np.argsort(np.abs(x2d).max(0))
    inv = np.argsort(perm)
    return np_group_qdq(x2d[:, perm], n_bits, g)[:, inv]


@pytest.fixture
def rng():
    return np.random.default_rng(0)


class TestGoldenValues:
    def test_per_tensor_hand_computed(self):
        # absmax 7.0, 4 bits -> q_max 7, scale 1.0: values round to integers
        w = jnp.array([[0.4, -1.6, 7.0], [2.5, -2.5, 0.0]], dtype=jnp.float32)
        out = core.quantize_weight_per_tensor_absmax(w, 4)
        # round half to even: 0.4->0, -1.6->-2, 2.5->2, -2.5->-2
        np.testing.assert_allclose(
            np.asarray(out), [[0.0, -2.0, 7.0], [2.0, -2.0, 0.0]]
        )

    def test_per_channel_hand_computed(self):
        w = jnp.array([[1.0, 2.2, 4.0], [8.2, -16.0, 0.5]], dtype=jnp.float32)
        out = core.quantize_weight_per_channel_absmax(w, 4)
        # row scales: 4/7 and 16/7 (away from exact .5 rounding boundaries)
        s0, s1 = 4 / 7, 16 / 7
        expected = [
            [round(1.0 / s0) * s0, round(2.2 / s0) * s0, 4.0],
            [round(8.2 / s1) * s1, -16.0, round(0.5 / s1) * s1],
        ]
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-6)

    def test_small_magnitude_scale_floor(self):
        # absmax below 1e-5 -> scale floor 1e-5/q_max; tiny values quantize to 0
        w = jnp.full((2, 4), 1e-7, dtype=jnp.float32)
        out = core.quantize_weight_per_tensor_absmax(w, 8)
        s = 1e-5 / 127
        np.testing.assert_allclose(np.asarray(out), np.full((2, 4), round(1e-7 / s) * s), rtol=1e-5)


class TestAgainstNumpyOracle:
    @pytest.mark.parametrize("n_bits", [4, 8])
    def test_per_channel(self, rng, n_bits):
        w = rng.normal(size=(16, 48)).astype(np.float32)
        out = core.quantize_weight_per_channel_absmax(jnp.asarray(w), n_bits)
        s = np_scale(np.abs(w).max(-1, keepdims=True), n_bits)
        np.testing.assert_allclose(np.asarray(out), np_qdq(w, s), atol=1e-6)

    @pytest.mark.parametrize("n_bits", [4, 8])
    def test_per_tensor(self, rng, n_bits):
        w = rng.normal(size=(16, 48)).astype(np.float32)
        out = core.quantize_weight_per_tensor_absmax(jnp.asarray(w), n_bits)
        np.testing.assert_allclose(
            np.asarray(out), np_qdq(w, np_scale(np.abs(w).max(), n_bits)), atol=1e-6
        )

    @pytest.mark.parametrize("c,g", [(48, 16), (50, 16), (16, 128)])
    def test_per_group_padding(self, rng, c, g):
        w = rng.normal(size=(8, c)).astype(np.float32)
        out = core.quantize_weight_per_group_absmax(jnp.asarray(w), 4, g)
        np.testing.assert_allclose(np.asarray(out), np_group_qdq(w, 4, g), atol=1e-6)

    @pytest.mark.parametrize("c,g", [(48, 16), (50, 16)])
    def test_per_group_sorted(self, rng, c, g):
        w = rng.normal(size=(8, c)).astype(np.float32)
        out = core.quantize_weight_per_group_absmax_sort(jnp.asarray(w), 4, g)
        np.testing.assert_allclose(np.asarray(out), np_sorted_group_qdq(w, 4, g), atol=1e-6)

    def test_act_per_token_3d(self, rng):
        t = rng.normal(size=(2, 5, 32)).astype(np.float32)
        out = core.quantize_activation_per_token_absmax(jnp.asarray(t), 4)
        t2d = t.reshape(-1, 32)
        s = np_scale(np.abs(t2d).max(-1, keepdims=True), 4)
        np.testing.assert_allclose(np.asarray(out), np_qdq(t2d, s).reshape(t.shape), atol=1e-6)

    def test_act_per_group_sorted_3d(self, rng):
        t = rng.normal(size=(2, 5, 40)).astype(np.float32)
        out = core.quantize_activation_per_group_absmax_sort(jnp.asarray(t), 4, 16)
        expected = np_sorted_group_qdq(t.reshape(-1, 40), 4, 16).reshape(t.shape)
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-6)


class TestProperties:
    def test_idempotent(self, rng):
        w = rng.normal(size=(8, 32)).astype(np.float32)
        q1 = core.quantize_weight_per_channel_absmax(jnp.asarray(w), 4)
        q2 = core.quantize_weight_per_channel_absmax(q1, 4)
        np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), atol=1e-6)

    def test_error_bound_half_scale(self, rng):
        w = rng.normal(size=(8, 128)).astype(np.float32)
        out = np.asarray(core.quantize_weight_per_channel_absmax(jnp.asarray(w), 8))
        s = np_scale(np.abs(w).max(-1, keepdims=True), 8)
        assert np.all(np.abs(out - w) <= s / 2 + 1e-7)

    def test_sorted_output_layout_unchanged(self, rng):
        # sorting only changes grouping; with group_size >= C output equals unsorted
        w = rng.normal(size=(8, 32)).astype(np.float32)
        a = core.quantize_weight_per_group_absmax_sort(jnp.asarray(w), 4, 64)
        b = core.quantize_weight_per_group_absmax(jnp.asarray(w), 4, 64)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_sorted_beats_unsorted_with_outliers(self, rng):
        # a few huge channels: sorting isolates them into their own groups
        w = rng.normal(size=(32, 256)).astype(np.float32)
        outlier_cols = np.arange(0, 256, 16)  # one outlier per unsorted group
        w[:, outlier_cols] *= 100.0
        wj = jnp.asarray(w)
        err_sorted = np.abs(np.asarray(core.quantize_weight_per_group_absmax_sort(wj, 4, 16)) - w).mean()
        err_unsorted = np.abs(np.asarray(core.quantize_weight_per_group_absmax(wj, 4, 16)) - w).mean()
        assert err_sorted < err_unsorted * 0.8

    def test_group_quant_params_matches_qdq(self, rng):
        w = rng.normal(size=(8, 40)).astype(np.float32)
        q, s = core.group_quant_params(jnp.asarray(w), 4, 16)
        deq = (np.asarray(q, dtype=np.float32) * np.asarray(s)).reshape(8, -1)[:, :40]
        ref = np.asarray(core.quantize_weight_per_group_absmax(jnp.asarray(w), 4, 16))
        np.testing.assert_allclose(deq, ref, atol=1e-6)
        assert np.abs(np.asarray(q)).max() <= 7

    def test_bf16_dtype_preserved(self, rng):
        w = jnp.asarray(rng.normal(size=(8, 32)), dtype=jnp.bfloat16)
        out = core.quantize_weight_per_channel_absmax(w, 4)
        assert out.dtype == jnp.bfloat16


class TestW4A8:
    def test_separate_act_bits(self):
        from smoothquant_tpu.quant import w4a8_group

        cfg = w4a8_group(group_size=64)
        assert cfg.quant_bits == 4 and cfg.effective_act_bits == 8

    def test_w4a8_real_path_more_accurate_than_w4a4(self, rng):
        import jax.numpy as jnp

        from smoothquant_tpu.kernels import pack_linear, real_quant_linear
        from smoothquant_tpu.quant import w4a4_group, w4a8_group

        o, c, n = 128, 256, 16
        w = rng.normal(size=(o, c)).astype(np.float32) * 0.05
        x = rng.normal(size=(n, c)).astype(np.float32)
        ref = x @ w.T
        errs = {}
        for name, cfg in [("w4a4", w4a4_group(group_size=64)),
                          ("w4a8", w4a8_group(group_size=64))]:
            p = pack_linear({"weight": w, "bias": None}, cfg,
                            compute_dtype=jnp.float32)
            y = np.asarray(real_quant_linear(p, jnp.asarray(x), cfg,
                                             interpret=True))
            errs[name] = np.abs(y - ref).mean()
        assert errs["w4a8"] < errs["w4a4"]


class TestSortStrategies:
    """README.md:34-37 claims three channel-sorting strategies; the
    reference code implements only 'max'.  All three are selectable here;
    each must (a) be a pure regrouping — the quantized output equals
    manually permute→group-QDQ→inverse-permute — and (b) rank by its
    documented key."""

    @pytest.mark.parametrize("strategy", ["max", "mean_std", "argmax"])
    def test_sorted_quantizer_matches_manual_oracle(self, strategy):
        rng = np.random.default_rng(11)
        w = (rng.normal(size=(24, 90)) * rng.uniform(0.5, 3.0)).astype(np.float32)
        got = np.asarray(core.quantize_weight_per_group_absmax_sort(
            jnp.asarray(w), 4, group_size=32, sort_strategy=strategy))

        key = np.asarray(core.sort_key(jnp.asarray(w), strategy))
        perm = np.argsort(key, kind="stable")
        inv = np.argsort(perm)
        manual = np.asarray(core.quantize_weight_per_group_absmax(
            jnp.asarray(w[:, perm]), 4, group_size=32))[:, inv]
        np.testing.assert_allclose(got, manual, atol=1e-6)

    def test_sort_keys_semantics(self):
        x = np.zeros((4, 3), np.float32)
        x[0, 0] = 5.0   # col 0: max 5 at row 0
        x[3, 1] = 2.0   # col 1: max 2 at row 3
        x[1, 2] = 3.0   # col 2: max 3 at row 1
        k_max = np.asarray(core.sort_key(jnp.asarray(x), "max"))
        np.testing.assert_allclose(k_max, [5.0, 2.0, 3.0])
        k_pos = np.asarray(core.sort_key(jnp.asarray(x), "argmax"))
        np.testing.assert_allclose(k_pos, [0.0, 3.0, 1.0])
        k_ms = np.asarray(core.sort_key(jnp.asarray(x), "mean_std"))
        ax = np.abs(x)
        np.testing.assert_allclose(k_ms, ax.mean(0) + 3 * ax.std(0), rtol=1e-6)

    def test_config_strategy_flows_into_linear(self):
        from smoothquant_tpu.quant.config import QuantConfig
        from smoothquant_tpu.quant.linear import quant_linear, quantize_linear_params

        rng = np.random.default_rng(12)
        w = rng.normal(size=(32, 64)).astype(np.float32)
        x = rng.normal(size=(4, 64)).astype(np.float32)
        outs = {}
        for strat in ("max", "argmax"):
            cfg = QuantConfig(weight_quant="per_group", act_quant="per_group",
                              quant_bits=4, group_size=16, sort_strategy=strat)
            qp = quantize_linear_params({"weight": jnp.asarray(w), "bias": None}, cfg)
            outs[strat] = np.asarray(quant_linear(qp, jnp.asarray(x), cfg))
        # different grouping → different numerics (sanity that the knob acts)
        assert not np.allclose(outs["max"], outs["argmax"])

    def test_invalid_strategy_rejected(self):
        from smoothquant_tpu.quant.config import QuantConfig

        with pytest.raises(ValueError):
            QuantConfig(sort_strategy="bogus")
