"""Does the fused MLP megakernel win INSIDE the decode scan?  Times a
32-layer lax.scan over the real matmul chain (qkv -> o -> MLP) with the
MLP as (a) two rawx launches + XLA silu, (b) the fused megakernel —
isolating the launch/pipeline-fill saving in its real context (where XLA
cross-op prefetch and VMEM pressure also act)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

L = 32
B = 4
TO1 = TO2 = None


def main():
    import dataclasses as dc

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from smoothquant_tpu.kernels.pack import fold_input_perm, pack_linear
    from smoothquant_tpu.kernels.real_linear import (
        real_mlp_fused,
        real_quant_linear,
    )
    from smoothquant_tpu.models import llama
    from smoothquant_tpu.quant import w4a4_group
    from smoothquant_tpu.utils.benchtools import time_steps

    qcfg = dc.replace(w4a4_group(group_size=64, salient_prop=0.05),
                      scale_dtype="bfloat16")
    rng = np.random.default_rng(0)
    cfg = llama.LlamaConfig.llama2_7b()
    h, inter = cfg.hidden_size, cfg.intermediate_size

    def pk(o, k, imp):
        lin = {"weight": jnp.asarray(
            rng.normal(size=(o, k)).astype(np.float32) * k ** -0.5,
            jnp.bfloat16), "bias": None}
        return pack_linear(lin, qcfg, importance=imp, act_absmax=imp,
                           nibble=True, align_k_groups=8, align_o=2048)

    def prep(p):
        return dc.replace(p, meta=dc.replace(p.meta, pre_permuted=True))

    imp_h = rng.uniform(0.1, 1.0, size=(h,))
    imp_i = rng.uniform(0.1, 1.0, size=(inter,))
    layers = []
    for i in range(L):
        qkv = prep(pk(3 * h, h, imp_h))
        op = pk(h, h, imp_h)
        dp = pk(h, inter, imp_i)
        gu_lin = {"weight": jnp.asarray(
            rng.normal(size=(2 * inter, h)).astype(np.float32) * h ** -0.5,
            jnp.bfloat16), "bias": None}
        dp, gu_lin = fold_input_perm(dp, gu_lin, n_splits=2)
        gu = prep(pack_linear(gu_lin, qcfg, importance=imp_h,
                              act_absmax=imp_h, nibble=True,
                              align_k_groups=8, align_o=2048))
        layers.append({"qkv": qkv, "o": op, "gu": gu, "dp": dp})
        if i % 8 == 7:
            print(f"# packed {i+1}/{L}", file=sys.stderr, flush=True)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)

    x = jnp.asarray(rng.normal(size=(B, h)), jnp.bfloat16)

    def chain(x, st, fused: bool):
        def body(carry, i):
            y = real_quant_linear(st["qkv"], carry, compute="int",
                                  layer_idx=i)
            y = real_quant_linear(st["o"], y[..., :h].astype(jnp.bfloat16),
                                  compute="int", layer_idx=i)
            xm = y[..., :h].astype(jnp.bfloat16)
            if fused:
                from smoothquant_tpu.kernels.mlp_fused import (
                    mlp_swiglu_fused_stacked,
                )
                gu_, dp_ = st["gu"], st["dp"]
                d = mlp_swiglu_fused_stacked(
                    jnp.asarray(i, jnp.int32).reshape(1), xm, None,
                    gu_.w_qt, gu_.w_scales_t,
                    gu_.w_sal_t.astype(xm.dtype),
                    dp_.w_qt, dp_.w_scales_t,
                    dp_.w_sal_t.astype(xm.dtype),
                    group_size=64, act_bits=4,
                    n_sal1=gu_.meta.num_salient,
                    n_sal2=dp_.meta.num_salient,
                    gu_out_true=gu_.meta.out_features,
                    dn_out_true=dp_.meta.out_features,
                    out_dtype=xm.dtype,
                    tile_o1=TO1, tile_o2=TO2)
            else:
                g = real_quant_linear(st["gu"], xm, compute="int",
                                      layer_idx=i)
                gt = g[..., :inter]
                d = real_quant_linear(
                    st["dp"],
                    (jax.nn.silu(gt) * g[..., inter:2 * inter]
                     ).astype(jnp.bfloat16),
                    compute="int", layer_idx=i)
            return carry + d[..., :h].astype(carry.dtype) * 0.01, None

        out, _ = jax.lax.scan(body, x, jnp.arange(L))
        return out

    global TO1, TO2
    t = time_steps(lambda xx, st: chain(xx, st, False), (x, stacked),
                   iters=16, repeats=5)
    print(f"fused=False: {t*1e3:.3f} ms = {t/L*1e6:.1f} us/layer",
          flush=True)
    for (TO1, TO2) in ((None, None), (1024, 512), (1024, 1024), (512, 512)):
        t = time_steps(lambda xx, st: chain(xx, st, True), (x, stacked),
                       iters=16, repeats=5)
        print(f"fused tiles={TO1},{TO2}: {t*1e3:.3f} ms = "
              f"{t/L*1e6:.1f} us/layer", flush=True)


if __name__ == "__main__":
    main()
