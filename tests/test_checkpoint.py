"""Checkpoint roundtrips: fp params, packed models, int8 OPT (covered in
test_cli), plus act-scales IO."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from smoothquant_tpu.models import ForwardContext, llama as jllama
from smoothquant_tpu.models.registry import pack_model
from smoothquant_tpu.quant import w4a4_group
from smoothquant_tpu.utils.checkpoint import (
    load_packed_model,
    load_params,
    save_packed_model,
    save_params,
)
from smoothquant_tpu.utils.hf_import import load_act_scales, save_act_scales


def test_fp_params_roundtrip(tmp_path):
    cfg = jllama.LlamaConfig.tiny()
    params = jllama.init_params(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "fp.npz")
    save_params(params, path)
    loaded = load_params(path)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, size=(1, 8)))
    ref, _ = jllama.forward(params, ids, cfg)
    got, _ = jllama.forward(loaded, ids, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_packed_model_roundtrip(tmp_path):
    cfg = jllama.LlamaConfig.tiny()
    params = jllama.init_params(jax.random.PRNGKey(1), cfg)
    qcfg = w4a4_group(group_size=32, salient_prop=0.1)
    feat = {
        key: np.random.default_rng(5).uniform(0.1, 1.0, size=(
            cfg.intermediate_size if "down_proj" in key else cfg.hidden_size,))
        for _, key, _ in jllama.quantizable_linears(cfg)
    }
    packed = pack_model("llama", params, cfg, qcfg, input_feat=feat,
                        compute_dtype=jnp.float32)
    path = str(tmp_path / "packed.npz")
    save_packed_model(packed, path)
    loaded = load_packed_model(path)

    lin = loaded["layers"]["0"]["self_attn"]["q_proj"]
    orig = packed["layers"]["0"]["self_attn"]["q_proj"]
    assert lin.meta == orig.meta
    np.testing.assert_array_equal(np.asarray(lin.w_qt), np.asarray(orig.w_qt))
    np.testing.assert_array_equal(np.asarray(lin.perm), np.asarray(orig.perm))

    ids = jnp.asarray(np.random.default_rng(2).integers(0, 256, size=(1, 8)))
    ctx = ForwardContext(quant=qcfg, interpret=True)
    ref, _ = jllama.forward(packed, ids, cfg, ctx=ctx)
    got, _ = jllama.forward(loaded, ids, cfg, ctx=ctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_sharded_packed_checkpoint_roundtrip(tmp_path):
    """Per-host shards: local shard == what shard_map hands a device; global
    reassembly == the original pytree (SURVEY.md §5 sharded checkpoints)."""
    from smoothquant_tpu.parallel.tp_packed import pack_model_tp
    from smoothquant_tpu.utils.checkpoint import (
        load_packed_model_sharded,
        save_packed_model_sharded,
    )

    cfg = jllama.LlamaConfig.tiny()
    params = jllama.init_params(jax.random.PRNGKey(3), cfg)
    qcfg = w4a4_group(group_size=16, salient_prop=0.0)
    tp = 2
    packed = pack_model_tp("llama", params, cfg, qcfg, tp=tp,
                           compute_dtype=jnp.float32)
    d = str(tmp_path / "sharded")
    save_packed_model_sharded(packed, d, n_shards=tp)

    # global reassembly is exact
    glob = load_packed_model_sharded(d)
    q0 = packed["layers"]["0"]["self_attn"]["q_proj"]
    g0 = glob["layers"]["0"]["self_attn"]["q_proj"]
    np.testing.assert_array_equal(np.asarray(g0.w_qt), np.asarray(q0.w_qt))
    assert g0.meta == q0.meta

    # local shard 1: column-parallel leaves hold the second O-half, the
    # row-parallel (psum) o_proj holds the second K-half
    loc = load_packed_model_sharded(d, shard=1)
    l_q = loc["layers"]["0"]["self_attn"]["q_proj"]
    o_half = q0.w_qt.shape[1] // tp
    np.testing.assert_array_equal(np.asarray(l_q.w_qt),
                                  np.asarray(q0.w_qt[:, o_half:]))
    o0 = packed["layers"]["0"]["self_attn"]["o_proj"]
    l_o = loc["layers"]["0"]["self_attn"]["o_proj"]
    k_half = o0.w_qt.shape[0] // tp
    np.testing.assert_array_equal(np.asarray(l_o.w_qt),
                                  np.asarray(o0.w_qt[k_half:]))
    # replicated leaves (norms, embeddings) present in every local view
    np.testing.assert_array_equal(
        np.asarray(loc["norm"]["weight"]), np.asarray(packed["norm"]["weight"]))


def test_act_scales_npz_roundtrip(tmp_path):
    scales = {"model.layers.0.self_attn.q_proj":
              np.random.default_rng(0).uniform(0.1, 2.0, size=(64,)).astype(np.float32)}
    path = str(tmp_path / "scales.npz")
    save_act_scales(scales, path)
    loaded = load_act_scales(path)
    np.testing.assert_allclose(loaded["model.layers.0.self_attn.q_proj"],
                               scales["model.layers.0.self_attn.q_proj"])


def test_act_scales_torch_pt_roundtrip(tmp_path):
    pytest.importorskip("torch")
    scales = {"model.decoder.layers.0.fc1":
              np.random.default_rng(1).uniform(0.1, 2.0, size=(32,)).astype(np.float32)}
    path = str(tmp_path / "scales.pt")
    save_act_scales(scales, path)
    loaded = load_act_scales(path)  # the reference's artifact format
    np.testing.assert_allclose(loaded["model.decoder.layers.0.fc1"],
                               scales["model.decoder.layers.0.fc1"])


def test_sharded_checkpoint_drives_tp_mesh_forward(tmp_path):
    """VERDICT r3 #6 close-out: a TP-sharded packed checkpoint loads and
    RUNS under shard_map TP v2 on the 8-device mesh, bit-identical to the
    in-memory pack it was saved from — and the shard files contain no fp
    weight (cold load never materializes the fp tree)."""
    from smoothquant_tpu.parallel import make_mesh
    from smoothquant_tpu.parallel.tp_packed import (
        make_tp_forward_v2,
        pack_model_tp,
    )
    from smoothquant_tpu.utils.checkpoint import (
        load_packed_model_sharded,
        save_packed_model_sharded,
    )

    cfg = jllama.LlamaConfig.tiny()
    params = jllama.init_params(jax.random.PRNGKey(11), cfg)
    qcfg = w4a4_group(group_size=16, salient_prop=0.0)
    tp = 2
    tp_params = pack_model_tp("llama", params, cfg, qcfg, tp=tp,
                              compute_dtype=jnp.float32)
    d = str(tmp_path / "sharded")
    save_packed_model_sharded(tp_params, d, n_shards=tp)

    # no fp weight leaves anywhere in the shard files
    import glob as globmod

    for f in sorted(globmod.glob(f"{d}/shard-*.npz")):
        with np.load(f) as z:
            fp_leaves = [k for k in z.files
                         if k.endswith("/weight") and "embed" not in k
                         and "norm" not in k and "lm_head" not in k]
            assert not fp_leaves, fp_leaves

    loaded = load_packed_model_sharded(d)
    mesh = make_mesh(tp=tp, dp=4)
    ids = jnp.asarray(np.random.default_rng(12).integers(0, 256, size=(2, 8)))
    fwd = make_tp_forward_v2(jllama, cfg, mesh, interpret=True)(loaded)
    got = np.asarray(fwd(loaded, ids))
    ref = np.asarray(make_tp_forward_v2(jllama, cfg, mesh, interpret=True)(
        tp_params)(tp_params, ids))
    np.testing.assert_array_equal(got, ref)
