"""Mixtral sparse dispatch + expert parallelism.

Oracle: the dense-weighted path (numerically identical to HF routing).
Sparse dispatch must match it exactly when capacity doesn't bind, degrade
gracefully (drops) when it does, and EP over a CPU mesh must match
single-device sparse.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from smoothquant_tpu.models import ForwardContext, mixtral as jmix
from smoothquant_tpu.models.registry import pack_model
from smoothquant_tpu.parallel.ep import make_ep_forward, make_ep_mesh
from smoothquant_tpu.quant import QuantConfig, w4a4_group


@pytest.fixture(scope="module")
def tiny_mixtral():
    cfg = jmix.MixtralConfig.tiny()
    params = jmix.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _ids(cfg, n=6, seed=0):
    return jnp.asarray(np.random.default_rng(seed).integers(
        0, cfg.vocab_size, size=(2, n)))


class TestSparseDispatch:
    def test_capacity_math(self):
        cfg = jmix.MixtralConfig.tiny()  # E=4, topk=2
        # n=12: dense would run 12 tokens through each of 4 experts;
        # capacity-bounded sparse runs at most ceil(2*12*cf/4) each
        assert jmix.moe_capacity(12, cfg, 1.0) == 6
        assert jmix.moe_capacity(12, cfg, 2.0) == 12  # clamped to n
        assert jmix.moe_capacity(12, cfg, 0.25) == 2
        assert jmix.moe_capacity(1, cfg, 1.0) == 1

    def test_sparse_matches_dense_fp(self, tiny_mixtral):
        cfg, params = tiny_mixtral
        ids = _ids(cfg, seed=1)
        ref, _ = jmix.forward(params, ids, cfg)  # dense (default)
        got, _ = jmix.forward(params, ids, cfg,
                              ctx=ForwardContext(moe_dispatch="sparse",
                                                 moe_capacity_factor=4.0))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_sparse_matches_dense_quantized(self, tiny_mixtral):
        cfg, params = tiny_mixtral
        qcfg = QuantConfig(weight_quant="per_channel", act_quant="per_token",
                           quant_bits=8)
        qparams = jmix.quantize_params(params, cfg, qcfg)
        ids = _ids(cfg, seed=2)
        ref, _ = jmix.forward(qparams, ids, cfg, ctx=ForwardContext(quant=qcfg))
        got, _ = jmix.forward(qparams, ids, cfg,
                              ctx=ForwardContext(quant=qcfg,
                                                 moe_dispatch="sparse",
                                                 moe_capacity_factor=4.0))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_sparse_packed_runs(self, tiny_mixtral):
        cfg, params = tiny_mixtral
        qcfg = w4a4_group(group_size=32)
        packed = pack_model("mixtral", params, cfg, qcfg,
                            compute_dtype=jnp.float32)
        ids = _ids(cfg, seed=3)
        got, _ = jmix.forward(packed, ids, cfg,
                              ctx=ForwardContext(quant=qcfg, interpret=True,
                                                 moe_dispatch="sparse",
                                                 moe_capacity_factor=4.0))
        assert np.all(np.isfinite(np.asarray(got)))

    def test_capacity_binding_drops_tokens(self, tiny_mixtral):
        # cf=0.25 → capacity 2 < expected load: overflow assignments are
        # dropped, so the result must differ from dense but stay finite
        cfg, params = tiny_mixtral
        ids = _ids(cfg, seed=4)
        dense, _ = jmix.forward(params, ids, cfg)
        tight, _ = jmix.forward(params, ids, cfg,
                                ctx=ForwardContext(moe_dispatch="sparse",
                                                   moe_capacity_factor=0.25))
        tight = np.asarray(tight)
        assert np.all(np.isfinite(tight))
        assert not np.allclose(tight, np.asarray(dense), atol=1e-5)

    def test_stacked_experts_dense_equal(self, tiny_mixtral):
        cfg, params = tiny_mixtral
        stacked = jmix.stack_experts(params, cfg)
        ids = _ids(cfg, seed=5)
        ref, _ = jmix.forward(params, ids, cfg)
        got, _ = jmix.forward(stacked, ids, cfg)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-6, rtol=1e-6)


class TestExpertParallel:
    def test_ep_matches_single_device_sparse_fp(self, tiny_mixtral):
        cfg, params = tiny_mixtral
        ids = _ids(cfg, seed=6)
        ref, _ = jmix.forward(params, ids, cfg,
                              ctx=ForwardContext(moe_dispatch="sparse",
                                                 moe_capacity_factor=4.0))
        mesh = make_ep_mesh(ep=2)
        stacked = jmix.stack_experts(params, cfg)
        fwd = make_ep_forward(jmix, cfg, mesh, capacity_factor=4.0)(stacked)
        got = fwd(stacked, ids)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_ep_packed(self, tiny_mixtral):
        cfg, params = tiny_mixtral
        qcfg = w4a4_group(group_size=32)
        packed = pack_model("mixtral", params, cfg, qcfg,
                            compute_dtype=jnp.float32)
        ref, _ = jmix.forward(packed, _ids(cfg, seed=7), cfg,
                              ctx=ForwardContext(quant=qcfg, interpret=True,
                                                 moe_dispatch="sparse",
                                                 moe_capacity_factor=4.0))
        mesh = make_ep_mesh(ep=2)
        stacked = jmix.stack_experts(packed, cfg)
        fwd = make_ep_forward(jmix, cfg, mesh, interpret=True,
                              capacity_factor=4.0)(stacked)
        got = fwd(stacked, _ids(cfg, seed=7))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)

    def test_ep_divisibility_guard(self, tiny_mixtral):
        cfg, _ = tiny_mixtral  # 4 experts
        mesh = make_ep_mesh(ep=3)
        with pytest.raises(ValueError):
            make_ep_forward(jmix, cfg, mesh)


def test_mixtral_stacked_scan_parity():
    """stack_layers (experts+layers) + lax.scan forward == per-layer loop,
    dense and sparse dispatch, incl. stacked-cache decode."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from smoothquant_tpu.models import mixtral as jmix
    from smoothquant_tpu.models.common import ForwardContext, KVCache

    cfg = jmix.MixtralConfig.tiny()
    params = jmix.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(2, 6)))
    stacked = jmix.stack_layers(params, cfg)
    for dispatch in ("dense", "sparse"):
        ctx = ForwardContext(moe_dispatch=dispatch)
        ref, _ = jmix.forward(params, ids, cfg, ctx=ctx)
        got, _ = jmix.forward(stacked, ids, cfg, ctx=ctx)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    caches = [KVCache.create(2, 32, cfg.num_key_value_heads, cfg.head_dim,
                             jnp.float32)
              for _ in range(cfg.num_hidden_layers)]
    _, caches = jmix.forward(params, ids, cfg, caches=caches)
    scache = jax.tree.map(lambda *xs: jnp.stack(xs), *caches)
    tok = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(2, 1)))
    r2, _ = jmix.forward(params, tok, cfg, caches=caches)
    g2, _ = jmix.forward(stacked, tok, cfg, caches=scache)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(r2),
                               rtol=2e-4, atol=2e-4)
