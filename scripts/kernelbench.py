"""Per-kernel microbenchmarks on the real chip — the measurement behind
kernel tuning decisions (decode/prefill crossover, tile sizes, nibble vs
int8 storage, attention path).

Usage:  python scripts/kernelbench.py [experiment ...]
Experiments: decode_bf16 decode_int8 decode_int4 decode_attn prefill int4_native
Prints one JSON line per (experiment, shape, variant) with ms + effective
weight GB/s.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _log(m):
    import time
    print(f"# [{time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


DECODE_N = 4
# per-linear shapes of the llama2-7B layer (K, O)
SHAPES = [(4096, 4096), (4096, 11008), (11008, 4096)]
PREFILL_N = 1024


def emit(exp, shape, variant, t_s, weight_bytes):
    print(json.dumps({
        "exp": exp, "shape": list(shape), "variant": variant,
        "ms": round(t_s * 1e3, 4),
        "weight_gbps": round(weight_bytes / t_s / 1e9, 1),
    }), flush=True)


def make_packed(k, o, qcfg, nibble, rng):
    import jax.numpy as jnp
    from smoothquant_tpu.kernels.pack import pack_linear
    w = (rng.standard_normal((o, k)) * 0.02).astype(np.float32)
    imp = rng.uniform(0.1, 1.0, size=(k,))
    return pack_linear({"weight": jnp.asarray(w, jnp.bfloat16), "bias": None},
                       qcfg, importance=imp, nibble=nibble)


def bench_linear(packed, n, compute, **kw):
    import jax
    import jax.numpy as jnp
    from smoothquant_tpu.kernels.real_linear import real_quant_linear
    from smoothquant_tpu.utils.benchtools import time_steps
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, packed.meta.in_features)),
                    jnp.bfloat16)

    def step(x_):
        return real_quant_linear(packed, x_, compute=compute, **kw)

    iters = 256 if n <= 8 else 32
    return time_steps(jax.jit(step), (x,), iters=iters, repeats=5)


def main(which):
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from smoothquant_tpu.quant import w4a4_group
    from smoothquant_tpu.utils.benchtools import time_steps

    rng = np.random.default_rng(0)
    qcfg = w4a4_group(group_size=64, salient_prop=0.05)

    if "decode_bf16" in which:
        for k, o in SHAPES:
            w = jnp.asarray(rng.standard_normal((k, o)) * 0.02, jnp.bfloat16)
            x = jnp.asarray(rng.standard_normal((DECODE_N, k)), jnp.bfloat16)
            t = time_steps(jax.jit(
                lambda x_, w_=w: jnp.dot(x_, w_,
                                         preferred_element_type=jnp.float32)
                .astype(jnp.bfloat16)), (x,), iters=256, repeats=5)
            emit("decode_bf16", (k, o), "xla_dot", t, k * o * 2)

    if "decode_int8" in which:
        for k, o in SHAPES:
            _log(f"decode_int8 {k}x{o}")
            p = make_packed(k, o, qcfg, False, rng)
            wb = p.w_qt.nbytes + p.w_scales_t.nbytes + p.w_sal_t.nbytes
            t = bench_linear(p, DECODE_N, "int")
            emit("decode_int8", (k, o), "int_group", t, wb)

    if "decode_int4" in which:
        for k, o in SHAPES:
            _log(f"decode_int4 {k}x{o}")
            p = make_packed(k, o, qcfg, True, rng)
            wb = p.w_qt.nbytes + p.w_scales_t.nbytes + p.w_sal_t.nbytes
            t = bench_linear(p, DECODE_N, "int")
            emit("decode_int4", (k, o), "nibble", t, wb)

    if "decode_int4_nosal" in which:
        qns = w4a4_group(group_size=64, salient_prop=0.0)
        for k, o in SHAPES:
            _log(f"decode_int4_nosal {k}x{o}")
            import jax.numpy as jnp2
            from smoothquant_tpu.kernels.pack import pack_linear
            w = (rng.standard_normal((o, k)) * 0.02).astype(np.float32)
            p = pack_linear({"weight": jnp.asarray(w, jnp.bfloat16),
                             "bias": None}, qns, importance=None, nibble=True)
            wb = p.w_qt.nbytes + p.w_scales_t.nbytes
            t = bench_linear(p, DECODE_N, "int")
            emit("decode_int4_nosal", (k, o), "nibble", t, wb)

    if "decode_attn" in which:
        from smoothquant_tpu.models.common import (
            ForwardContext, KVCache, QuantKVCache, cached_attention)
        b, h, s, d = 4, 32, 2048, 128
        for cache_cls, store in ((KVCache, "bf16"), (QuantKVCache, "int8")):
            cache = cache_cls.create(b, s, h, d, jnp.bfloat16)
            kv_new = jnp.asarray(rng.standard_normal((b, s - 1, h, d)),
                                 jnp.bfloat16)
            cache = cache.update(kv_new, kv_new)
            q = jnp.asarray(rng.standard_normal((b, 1, h, d)), jnp.bfloat16)
            kv_bytes = (cache.k.nbytes + cache.v.nbytes if store == "bf16"
                        else cache.k_q.nbytes + cache.v_q.nbytes)
            for mode in ("einsum", "kernel"):
                ctx = ForwardContext(attn=mode)

                def step(q_, cache_=cache, ctx_=ctx):
                    return cached_attention(q_, cache_,
                                            causal_offset=cache_.pos - 1,
                                            ctx=ctx_)

                t = time_steps(jax.jit(step), (q,), iters=128, repeats=5)
                emit("decode_attn", (b, s), f"{store}_{mode}", t, kv_bytes)

    if "prefill" in which:
        n = PREFILL_N
        for k, o in SHAPES:
            w = jnp.asarray(rng.standard_normal((k, o)) * 0.02, jnp.bfloat16)
            x = jnp.asarray(rng.standard_normal((n, k)), jnp.bfloat16)
            t = time_steps(jax.jit(
                lambda x_, w_=w: jnp.dot(x_, w_,
                                         preferred_element_type=jnp.float32)
                .astype(jnp.bfloat16)), (x,), iters=64, repeats=5)
            emit("prefill_bf16", (k, o), "xla_dot", t, k * o * 2)

            _log(f"prefill dequant {k}x{o}")
            p = make_packed(k, o, qcfg, False, rng)
            wb = p.w_qt.nbytes + p.w_scales_t.nbytes + p.w_sal_t.nbytes
            t = bench_linear(p, n, "dequant")
            emit("prefill_dequant", (k, o), "dual_path", t, wb)
            _log(f"prefill int {k}x{o}")
            t = bench_linear(p, n, "int")
            emit("prefill_int", (k, o), "int_group", t, wb)

            # W8A8: per-token act int8 x per-col int8 weight via XLA int8 dot
            w8 = jnp.asarray(
                rng.integers(-127, 128, size=(k, o)), jnp.int8)
            x8 = jnp.asarray(rng.integers(-127, 128, size=(n, k)), jnp.int8)
            sw = jnp.asarray(rng.uniform(0.001, 0.01, size=(o,)), jnp.float32)

            def w8a8(x_, w_=w8, sw_=sw):
                acc = jax.lax.dot_general(
                    x_, w_, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                return (acc.astype(jnp.float32) * sw_[None, :]).astype(jnp.bfloat16)

            t = time_steps(jax.jit(w8a8), (x8,), iters=64, repeats=5)
            emit("prefill_w8a8", (k, o), "xla_int8_dot", t, k * o)

            # the shipped prefill recipe: promote_int8 packed linear through
            # the int kernel (single group, full-depth int8 contraction)
            from smoothquant_tpu.kernels.pack import promote_int8
            p8 = promote_int8(p)
            wb8 = p8.w_qt.nbytes + p8.w_sal_t.nbytes
            t = bench_linear(p8, n, "int")
            emit("prefill_promoted", (k, o), "int_colscale", t, wb8)

    if "layer_decode" in which or "layer_decode_unrolled" in which:
        # full packed decoder-layer decode cost via depth differencing:
        # (t(8L) - t(4L)) / 4 cancels embed/unembed/dispatch constants.
        import dataclasses

        from smoothquant_tpu.models import llama
        from smoothquant_tpu.models.common import ForwardContext
        from smoothquant_tpu.kernels.pack import pack_linear

        batch, cache_len = 4, 512

        def build(depth, attn_mode, stacked=True, quant_kv=False,
                  aligned=True):
            cfg = dataclasses.replace(
                llama.LlamaConfig.llama2_7b(), num_hidden_layers=depth,
                vocab_size=2048, tie_word_embeddings=True)
            key = jax.random.PRNGKey(0)
            layers = {}
            for i in range(depth):
                lp = llama.init_layer_params(jax.random.fold_in(key, i), cfg)
                for grp, names in (("self_attn", llama.ATTN_PROJS),
                                   ("mlp", llama.MLP_PROJS)):
                    for nm in names:
                        lin = lp[grp][nm]
                        imp = rng.uniform(0.1, 1.0, size=(lin["weight"].shape[1],))
                        kw = (dict(align_k_groups=8, align_o=1024)
                              if aligned else {})
                        lp[grp][nm] = pack_linear(lin, qcfg, importance=imp,
                                                  nibble=True, **kw)
                layers[str(i)] = lp
            h = cfg.hidden_size
            params = {
                "embed_tokens": {"weight": jax.random.normal(
                    jax.random.fold_in(key, 999), (cfg.vocab_size, h),
                    jnp.bfloat16) * 0.02},
                "layers": layers,
                "norm": {"weight": jnp.ones((h,), jnp.bfloat16)},
            }
            if stacked:
                params = llama.stack_layers(params, cfg)
                caches = llama.stacked_caches(cfg, batch, cache_len,
                                              jnp.bfloat16, pos=cache_len - 64,
                                              quant_kv=quant_kv)
            else:
                from smoothquant_tpu.models.common import KVCache
                caches = [KVCache.create(batch, cache_len,
                                         cfg.num_key_value_heads,
                                         cfg.head_dim, jnp.bfloat16)
                          ._replace(pos=jnp.asarray(cache_len - 64))
                          for _ in range(depth)]
            ctx = ForwardContext(quant=qcfg, compute="int", attn=attn_mode)

            # params/caches MUST be jit ARGS, not closure constants — XLA
            # constant-folds closed-over weights (GBs) at compile time
            def step(t, p, c):
                logits, _ = llama.forward(p, t, cfg, ctx=ctx, caches=c)
                return logits[:, -1]

            tok = jnp.asarray(rng.integers(0, cfg.vocab_size,
                                           size=(batch, 1)))
            return step, (tok, params, caches)

        lw = (4 * 4096 * 4096 + 3 * 4096 * 11008) // 2
        if "layer_decode" in which:
            # aligned pack + auto attn → the prefetch-scan path; quant_kv
            # adds the int8 cache + stacked flash kernel
            for variant, kw in (("prefetch_bf16kv", dict(quant_kv=False)),
                                ("prefetch_int8kv", dict(quant_kv=True)),
                                ("oldscan_bf16kv",
                                 dict(quant_kv=False, aligned=False))):
                ts = {}
                for depth in (4, 8):
                    _log(f"layer_decode depth {depth} {variant}")
                    step, args = build(depth, "auto", **kw)
                    ts[depth] = time_steps(jax.jit(step), args, iters=64,
                                           repeats=5)
                    emit("layer_decode", (depth, cache_len),
                         f"{variant}", ts[depth], 0)
                per_layer = (ts[8] - ts[4]) / 4
                emit("layer_decode", (1, cache_len),
                     f"per_layer_{variant}", per_layer, lw)

        if "layer_decode_unrolled" in which:
            # hypothesis check: lax.scan must COPY each layer's packed
            # weights into the pallas_call operands (dynamic-slice can't
            # fuse) — the unrolled python-loop forward feeds kernels from
            # resting buffers
            for attn_mode in ("kernel",):
                ts = {}
                for depth in (4, 8):
                    _log(f"layer_decode_unrolled depth {depth} "
                         f"attn={attn_mode}")
                    step, args = build(depth, attn_mode, stacked=False)
                    ts[depth] = time_steps(jax.jit(step), args, iters=64,
                                           repeats=5)
                    emit("layer_decode_unrolled", (depth, cache_len),
                         f"loop_{attn_mode}", ts[depth], 0)
                per_layer = (ts[8] - ts[4]) / 4
                emit("layer_decode_unrolled", (1, cache_len),
                     f"per_layer_{attn_mode}", per_layer, lw)

    if "int4_tiles" in which:
        from smoothquant_tpu.kernels.int4_group_matmul import int4_group_matmul
        from smoothquant_tpu.kernels.pack import (
            quantize_activations_packed_int)

        for k, o in ((4096, 11008), (4096, 4096)):
            p = make_packed(k, o, qcfg, True, rng)
            x = jnp.asarray(rng.standard_normal((DECODE_N, k)), jnp.bfloat16)
            x_perm = jnp.take(x, p.perm, axis=-1)
            x_q, x_s, x_sal = quantize_activations_packed_int(x_perm, p.meta)
            wb = p.w_qt.nbytes + p.w_scales_t.nbytes + p.w_sal_t.nbytes
            for tile_o in (512, 1024, 2048):
                for tile_g in (8, 16):
                    def stepk(x_q_, tile_o=tile_o, tile_g=tile_g):
                        return int4_group_matmul(
                            x_q_, x_s, p.w_qt, p.w_scales_t,
                            x_sal.astype(jnp.bfloat16),
                            p.w_sal_t.astype(jnp.bfloat16),
                            group_size=p.meta.group_size,
                            out_dtype=jnp.bfloat16,
                            tile_o=tile_o, tile_g=tile_g)

                    try:
                        t = time_steps(jax.jit(stepk), (x_q,), iters=256,
                                       repeats=5)
                        emit("int4_tiles", (k, o), f"o{tile_o}_g{tile_g}", t, wb)
                    except Exception as e:  # noqa: BLE001
                        print(json.dumps({"exp": "int4_tiles",
                                          "variant": f"o{tile_o}_g{tile_g}",
                                          "error": str(e)[:120]}), flush=True)

    if "glue" in which:
        # XLA glue costs at decode shapes: the per-linear activation
        # permutation gather, act quantization, rotary
        from smoothquant_tpu.quant.core import compute_scale
        for n in (4, 1024):
            x = jnp.asarray(rng.standard_normal((n, 4096)), jnp.bfloat16)
            perm = jnp.asarray(rng.permutation(4096).astype(np.int32))

            t = time_steps(jax.jit(lambda x_, p_=perm: jnp.take(x_, p_, axis=-1)),
                           (x,), iters=256, repeats=5)
            emit("glue", (n, 4096), "perm_gather", t, n * 4096 * 2)

            def actq(x_):
                xf = x_.astype(jnp.float32)
                s = compute_scale(jnp.max(jnp.abs(xf), -1, keepdims=True), 8)
                return jnp.round(xf / s).astype(jnp.float32) * s

            t = time_steps(jax.jit(actq), (x,), iters=256, repeats=5)
            emit("glue", (n, 4096), "act_quant_pertoken", t, n * 4096 * 2)

            def actq_g(x_):
                xf = x_.astype(jnp.float32).reshape(n, 64, 64)
                s = compute_scale(jnp.max(jnp.abs(xf), -1, keepdims=True), 4)
                return jnp.round(xf / s).astype(jnp.float32) * s

            t = time_steps(jax.jit(actq_g), (x,), iters=256, repeats=5)
            emit("glue", (n, 4096), "act_quant_pergroup", t, n * 4096 * 2)

    if "lm_head" in which:
        # the decode step's single largest weight stream: int8 per-channel
        # lm_head (K=4096, O=32000) — kernel vs promoted-identity XLA path
        from smoothquant_tpu.kernels.pack import pack_linear, promote_int8
        from smoothquant_tpu.quant import QuantConfig
        k, o = 4096, 32000
        head_qcfg = QuantConfig(weight_quant="per_channel",
                                act_quant="per_token", quant_bits=8)
        w = (rng.standard_normal((o, k)) * 0.02).astype(np.float32)
        p = pack_linear({"weight": jnp.asarray(w, jnp.bfloat16),
                         "bias": None}, head_qcfg)
        wb = p.w_qt.nbytes
        t = bench_linear(p, DECODE_N, "int")
        emit("lm_head", (k, o), "int_group_perchan", t, wb)
        p8 = promote_int8(p)
        t = bench_linear(p8, DECODE_N, "auto")
        emit("lm_head", (k, o), "identity_xla", t, p8.w_qt.nbytes)
        wbf = jnp.asarray(rng.standard_normal((k, o)) * 0.02, jnp.bfloat16)
        x = jnp.asarray(rng.standard_normal((DECODE_N, k)), jnp.bfloat16)
        # weight must be a jit ARG, not a closure constant (constant-folding)
        t = time_steps(jax.jit(
            lambda x_, w_: jnp.dot(x_, w_,
                                   preferred_element_type=jnp.float32)),
            (x, wbf), iters=256, repeats=5)
        emit("lm_head", (k, o), "bf16_xla", t, k * o * 2)

    if "packing" in which:
        # cold-start ingestion: host-side native pack (+ transfer of packed
        # bytes) vs device-side pack (transfer fp32 + jit quantize)
        import time as _time

        from smoothquant_tpu.kernels.pack import pack_linear

        k, o = 4096, 11008
        w = (rng.standard_normal((o, k)) * 0.02).astype(np.float32)
        imp = rng.uniform(0.1, 1.0, size=(k,))
        for variant, host in (("device", False), ("host_native", True)):
            ts = []
            for r in range(3):
                t0 = _time.perf_counter()
                # the fp host→device transfer is part of the device-path
                # cold-start cost being compared
                lin = {"weight": w if host else jnp.asarray(w), "bias": None}
                p = pack_linear(lin, qcfg, importance=imp, nibble=True,
                                host_pack=host)
                jax.block_until_ready(p.w_qt)
                np.asarray(p.w_qt[0, :8])  # force fetch → true sync
                ts.append(_time.perf_counter() - t0)
            emit("packing", (k, o), variant, min(ts), k * o // 2)

    if "int4_native" in which:
        # does XLA lower an int4 dot natively on this chip?
        try:
            k, o = 4096, 4096
            w4 = jnp.asarray(rng.integers(-7, 8, size=(k, o)), jnp.int4)
            x8 = jnp.asarray(rng.integers(-127, 128, size=(PREFILL_N, k)), jnp.int8)

            def i4dot(x_, w_=w4):
                return jax.lax.dot_general(
                    x_.astype(jnp.int8), w_.astype(jnp.int8),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)

            t = time_steps(jax.jit(i4dot), (x8,), iters=64, repeats=5)
            emit("int4_native", (k, o), "xla_int4_dot", t, k * o // 2)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"exp": "int4_native", "error": str(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    args = sys.argv[1:] or ["decode_bf16", "decode_int8", "decode_int4",
                            "decode_attn"]
    main(args)
