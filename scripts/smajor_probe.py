"""TPU A/B: S-major batched-head decode vs the head-major virtual-tile
path, in-scan at 8 layers, bench dims (B4, S512, MHA-32, D128)."""

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

    from smoothquant_tpu.kernels.pack import (fold_input_perm, pack_linear,
                                              permute_output_columns,
                                              block_decode_tree)
    from smoothquant_tpu.models import llama
    from smoothquant_tpu.models.common import ForwardContext
    from smoothquant_tpu.quant import w4a4_group
    from smoothquant_tpu.quant.config import QuantConfig
    from smoothquant_tpu.utils.benchtools import time_steps

    DEPTH, BATCH, CACHE = 8, 4, 512
    qcfg = dataclasses.replace(w4a4_group(group_size=64, salient_prop=0.05),
                               scale_dtype="bfloat16")
    head_qcfg = QuantConfig(weight_quant="per_channel",
                            act_quant="per_token", quant_bits=8)
    cfg = dataclasses.replace(llama.LlamaConfig.llama2_7b(),
                              num_hidden_layers=DEPTH)
    rng = np.random.default_rng(0)
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
    packed = {
        "embed_tokens": {"weight": jnp.take(jax.random.normal(
            jax.random.fold_in(key, 1001), (cfg.vocab_size, h_dim),
            jnp.bfloat16) * 0.02, take, axis=1)},
        "layers": layers,
        "norm": {"weight": jnp.ones((h_dim,), jnp.bfloat16)},
        "lm_head": pack_linear({"weight": jnp.take(lm_head["weight"], take,
                                                   axis=1), "bias": None},
                               head_qcfg),
    }
    packed = block_decode_tree(llama.stack_layers(packed, cfg))
    log("packed tree ready")

    ctx = ForwardContext(quant=qcfg, compute="int")
    tok = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(BATCH, 1)))

    def step(t, p, c):
        logits, nc = llama.forward(p, t, cfg, ctx=ctx, caches=c)
        return logits[:, -1], nc

    caches_hm = llama.stacked_caches(cfg, BATCH, CACHE, jnp.bfloat16,
                                     pos=CACHE - 64, quant_kv=True)
    t_hm = time_steps(step, (tok, packed, caches_hm), iters=32, repeats=5,
                      stateful=True)
    log(f"head-major (virtual-tile) decode: {t_hm*1e3:.3f} ms/step")
    del caches_hm

    caches_sm = llama.stacked_caches(cfg, BATCH, CACHE, jnp.bfloat16,
                                     pos=CACHE - 64, quant_kv=True,
                                     smajor=True)
    t_sm = time_steps(step, (tok, packed, caches_sm), iters=32, repeats=5,
                      stateful=True)
    log(f"S-major (batched-head) decode:   {t_sm*1e3:.3f} ms/step "
        f"({(t_hm-t_sm)*1e6/8:.1f} us/layer saved)")

    # sanity: finite logits
    lg, _ = jax.jit(step)(tok, packed, caches_sm)
    log(f"smajor logits finite: {bool(np.isfinite(np.asarray(lg)).all())}")


if __name__ == "__main__":
    main()
