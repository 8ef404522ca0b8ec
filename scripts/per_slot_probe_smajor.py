"""TPU probe: per-slot cache-writer compile check + per-slot scan decode
step time at bench dims (llama2-7B-ish, small depth to keep it quick).

Run:  nohup python scripts/per_slot_probe.py > /tmp/per_slot_probe.log 2>&1 &
"""

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

    # ---- 1. writer kernel per-slot vs jnp reference -----------------------
    from smoothquant_tpu.kernels.cache_write import write_quant_cache_stacked
    from smoothquant_tpu.models.common import QuantKVCache, apply_rotary

    L, B, H, S, D = 3, 4, 8, 512, 128
    rng = np.random.default_rng(0)
    k_new = jnp.asarray(rng.normal(size=(B, H, D)), jnp.bfloat16)
    v_new = jnp.asarray(rng.normal(size=(B, H, D)), jnp.bfloat16)
    cos = jnp.asarray(rng.normal(size=(B, 1, D)), jnp.float32)
    sin = jnp.asarray(rng.normal(size=(B, 1, D)), jnp.float32)
    k_q = jnp.asarray(rng.integers(-127, 127, size=(L, B, H, S, D)), jnp.int8)
    v_q = jnp.asarray(rng.integers(-127, 127, size=(L, B, H, S, D)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.01, 1, size=(L, B, H, S)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.01, 1, size=(L, B, H, S)), jnp.float32)
    pos = jnp.asarray([5, 130, 300, 511], jnp.int32)
    li = jnp.int32(1)

    kq2, vq2, ks2, vs2 = write_quant_cache_stacked(
        li, pos, k_new, v_new, cos, sin, k_q, v_q, ks, vs, rotary=True)

    # jnp reference
    k_rot = apply_rotary(k_new[:, None].astype(jnp.float32),
                         cos, sin)[:, 0]
    def q8(x):
        a = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
        s_ = jnp.maximum(a, 1e-8) / 127.0
        return jnp.round(x / s_).astype(jnp.int8), s_[..., 0]
    kq_ref, ks_ref = q8(k_rot)
    vq_ref, vs_ref = q8(v_new.astype(jnp.float32))

    ok = True
    for b in range(B):
        p = int(pos[b])
        ok &= np.array_equal(np.asarray(kq2[1, b, :, p]), np.asarray(kq_ref[b]))
        ok &= np.array_equal(np.asarray(vq2[1, b, :, p]), np.asarray(vq_ref[b]))
        ok &= np.allclose(np.asarray(ks2[1, b, :, p]), np.asarray(ks_ref[b]),
                          rtol=1e-6)
    # untouched rows intact
    ok &= np.array_equal(np.asarray(kq2[0]), np.asarray(k_q[0]))
    ok &= np.array_equal(np.asarray(kq2[1, 0, :, 6]), np.asarray(k_q[1, 0, :, 6]))
    log(f"writer per-slot parity: {'OK' if ok else 'MISMATCH'}")
    if not ok:
        sys.exit(1)

    # ---- 2. per-slot scan decode step time (8 layers, 7B dims) -----------
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

    # aligned baseline
    caches_a = llama.stacked_caches(cfg, BATCH, CACHE, jnp.bfloat16,
                                    pos=CACHE - 64, quant_kv=True,
                                    smajor=True)

    def step_aligned(t, p, c):
        logits, nc = llama.forward(p, t, cfg, ctx=ctx, caches=c)
        return logits[:, -1], nc

    t_a = time_steps(step_aligned, (tok, packed, caches_a), iters=32,
                     repeats=5, stateful=True)
    log(f"aligned scan decode ({DEPTH}L): {t_a*1e3:.3f} ms/step")

    # per-slot path
    caches_p = llama.stacked_caches(cfg, BATCH, CACHE, jnp.bfloat16,
                                    pos=0, quant_kv=True, per_slot=True,
                                    smajor=True)
    slot_pos = jnp.asarray([CACHE - 64, CACHE - 100, CACHE - 200, 37],
                           jnp.int32)
    caches_p = caches_p._replace(
        pos=jnp.broadcast_to(slot_pos, (DEPTH, BATCH)))
    kv = np.zeros((BATCH, CACHE), bool)
    for b in range(BATCH):
        kv[b, : int(slot_pos[b]) + 1] = True
    mask = jnp.asarray(kv)

    def step_slot(t, p, c):
        logits, nc = llama.forward(p, t, cfg, ctx=ctx, caches=c,
                                   positions=slot_pos[:, None],
                                   attn_mask=mask)
        return logits[:, -1], nc

    t_p = time_steps(step_slot, (tok, packed, caches_p), iters=32,
                     repeats=5, stateful=True)
    log(f"per-slot scan decode ({DEPTH}L): {t_p*1e3:.3f} ms/step "
        f"({t_p/t_a:.2f}x aligned)")

    # numeric sanity: per-slot logits finite
    lg, _ = step_slot(tok, packed, caches_p)
    log(f"per-slot logits finite: {bool(np.isfinite(np.asarray(lg)).all())}")


if __name__ == "__main__":
    main()
