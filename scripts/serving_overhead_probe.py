"""Isolate ContinuousBatcher per-chunk overhead: step_chunk wall vs the
bare _decode_k device call, 8-layer blocked tree, S-major pool."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"platform={jax.devices()[0].platform}")

    import dataclasses

    from smoothquant_tpu.models import llama
    from smoothquant_tpu.quant import w4a4_group
    from smoothquant_tpu.quant.config import QuantConfig
    from smoothquant_tpu.serve.batching import ContinuousBatcher, Request

    # reuse the probe builder from per_slot_probe_smajor
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    DEPTH, BATCH, CACHE = 8, 4, 512
    qcfg = dataclasses.replace(w4a4_group(group_size=64, salient_prop=0.05),
                               scale_dtype="bfloat16")
    head_qcfg = QuantConfig(weight_quant="per_channel",
                            act_quant="per_token", quant_bits=8)
    cfg = dataclasses.replace(llama.LlamaConfig.llama2_7b(),
                              num_hidden_layers=DEPTH)
    rng = np.random.default_rng(0)

    from smoothquant_tpu.kernels.pack import (fold_input_perm, pack_linear,
                                              permute_output_columns,
                                              block_decode_tree)

    key = jax.random.PRNGKey(2)

    def fuse(*lins):
        return {"weight": jnp.concatenate([l["weight"] for l in lins], 0),
                "bias": None}

    def pk(lin, imp, absmax=None):
        return pack_linear(lin, qcfg, importance=imp, act_absmax=absmax,
                           nibble=True, align_k_groups=8, align_o=2048)

    def mark_prep(p):
        import dataclasses as dc
        return dc.replace(p, meta=dc.replace(p.meta, pre_permuted=True))

    h_dim, i_dim = cfg.hidden_size, cfg.intermediate_size
    shared_imp = rng.uniform(0.1, 1.0, size=(h_dim,))
    shared_perm = None
    layers = {}
    for i in range(DEPTH):
        lp = llama.init_layer_params(jax.random.fold_in(key, i), cfg)
        sa, mlp = lp["self_attn"], lp["mlp"]
        qkv = mark_prep(pk(fuse(sa["q_proj"], sa["k_proj"], sa["v_proj"]),
                           shared_imp, shared_imp))
        if shared_perm is None:
            shared_perm = np.asarray(qkv.perm)
        op = permute_output_columns(
            pack_linear(sa["o_proj"], qcfg,
                        importance=rng.uniform(0.1, 1.0, size=(h_dim,)),
                        nibble=True, identity=True, align_k_groups=8,
                        align_o=2048), shared_perm)
        lp["self_attn"] = {"qkv_proj": qkv, "o_proj": op}
        dp = pk(mlp["down_proj"], rng.uniform(0.1, 1.0, size=(i_dim,)))
        dp, gu_lin = fold_input_perm(
            dp, fuse(mlp["gate_proj"], mlp["up_proj"]), n_splits=2)
        lp["mlp"] = {"gate_up_proj": mark_prep(pk(gu_lin, shared_imp,
                                                  shared_imp)),
                     "down_proj": permute_output_columns(dp, shared_perm)}
        layers[str(i)] = lp
    take = jnp.asarray(shared_perm)
    lm_head = llama._init_lin(jax.random.fold_in(key, 1000), cfg.vocab_size,
                              h_dim, False, jnp.bfloat16)
    perlayer = {
        "embed_tokens": {"weight": jnp.take(jax.random.normal(
            jax.random.fold_in(key, 1001), (cfg.vocab_size, h_dim),
            jnp.bfloat16) * 0.02, take, axis=1)},
        "layers": layers,
        "norm": {"weight": jnp.ones((h_dim,), jnp.bfloat16)},
        "lm_head": pack_linear({"weight": jnp.take(lm_head["weight"], take,
                                                   axis=1), "bias": None},
                               head_qcfg),
    }
    packed = block_decode_tree(llama.stack_layers(perlayer, cfg))
    log("trees ready")

    batcher = ContinuousBatcher(llama, packed, cfg, quant=qcfg,
                                max_batch=BATCH, max_len=CACHE,
                                quant_kv=True, compute="auto",
                                prefill_params=perlayer, smajor=True)
    s_rng = np.random.default_rng(42)

    def reqs(n, uid0):
        return [Request(uid=uid0 + i,
                        prompt=s_rng.integers(0, cfg.vocab_size,
                                              size=(int(s_rng.integers(
                                                  100, 240)),)),
                        max_new_tokens=200)
                for i in range(n)]

    log("warming (prefill + chunk graphs)")
    for r in reqs(4, 0):
        batcher.submit(r)
    for _ in range(3):
        batcher.step_chunk(8)
    log("timing step_chunk(8) x 6, full slots")
    t0 = time.perf_counter()
    for _ in range(6):
        batcher.step_chunk(8)
    wall = (time.perf_counter() - t0) / 6
    log(f"step_chunk(8) wall: {wall*1e3:.1f} ms/chunk "
        f"({wall/8*1e3:.2f} ms/token-step)")

    # bare device call: same args as the batcher's chunk
    fn = batcher._get_decode_chunk(8)
    tok = np.zeros(BATCH, np.int32)
    args = (batcher.params, jnp.asarray(tok), batcher.caches,
            jnp.asarray(batcher.seq_pos), jnp.asarray(batcher.key_valid))
    toks, c2, kv2 = fn(*args)
    np.asarray(toks)
    t0 = time.perf_counter()
    for _ in range(6):
        toks, c2, kv2 = fn(batcher.params, jnp.asarray(tok), c2,
                           jnp.asarray(batcher.seq_pos),
                           jnp.asarray(batcher.key_valid))
        np.asarray(toks)
    wall2 = (time.perf_counter() - t0) / 6
    log(f"bare _decode_k(8) + toks fetch: {wall2*1e3:.1f} ms/chunk")

    t0 = time.perf_counter()
    for _ in range(6):
        toks, c2, kv2 = fn(batcher.params, jnp.asarray(tok), c2,
                           jnp.asarray(batcher.seq_pos),
                           jnp.asarray(batcher.key_valid))
        np.asarray(toks)
        np.asarray(kv2)
    wall3 = (time.perf_counter() - t0) / 6
    log(f"bare _decode_k(8) + toks + kv fetch: {wall3*1e3:.1f} ms/chunk")


if __name__ == "__main__":
    main()
