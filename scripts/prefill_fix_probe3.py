"""Verify numerics + deep-chain retime for the to=128 prefill tile pick."""

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

    import dataclasses as dc

    from smoothquant_tpu.kernels.pack import pack_linear, promote_int8
    from smoothquant_tpu.kernels.int8_prefill import int8_prefill_matmul
    from smoothquant_tpu.quant import w4a4_group
    from smoothquant_tpu.quant.core import compute_scale
    from smoothquant_tpu.utils.benchtools import time_steps

    qcfg = dc.replace(w4a4_group(group_size=64, salient_prop=0.05),
                      scale_dtype="bfloat16")

    def setup(N, K, O, seed=7):
        rng = np.random.default_rng(0)
        kx = jax.random.PRNGKey(seed)
        w = jax.random.normal(kx, (O, K), jnp.bfloat16) * 0.02
        x = jax.random.normal(jax.random.fold_in(kx, 1), (N, K),
                              jnp.bfloat16)
        pk = promote_int8(pack_linear(
            {"weight": w, "bias": None}, qcfg,
            importance=rng.uniform(0.1, 1., size=(K,)), nibble=True))
        return x, w, pk

    for (N, K, O) in [(1024, 4096, 11008), (1024, 4096, 4096)]:
        x, w, pk = setup(N, K, O)
        meta = pk.meta
        c = meta.in_features
        sal_idx = pk.perm[c - meta.num_salient:]
        ns = jnp.ones((c,), jnp.float32).at[sal_idx].set(0.0)
        sw_t = pk.w_scales_t.astype(jnp.float32).reshape(1, -1)

        def prologue(xx):
            xf = xx.astype(jnp.float32) * ns[None, :]
            absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
            sx = compute_scale(absmax, 8)
            x_q = jnp.round(xf / sx).astype(jnp.int8)
            x_sal = jnp.zeros((xx.shape[0], pk.w_sal_t.shape[0]),
                              pk.w_sal_t.dtype)
            x_sal = x_sal.at[:, : meta.num_salient].set(
                jnp.take(xx, sal_idx, axis=-1).astype(x_sal.dtype))
            return x_q, sx, x_sal

        @jax.jit
        def ref_fn(xx):
            x_q, sx, x_sal = prologue(xx)
            acc = jax.lax.dot_general(
                x_q, pk.w_qt, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            y = acc.astype(jnp.float32) * sx * sw_t
            y = y + jax.lax.dot_general(
                x_sal, pk.w_sal_t,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return y.astype(jnp.bfloat16)

        @jax.jit
        def kern128(xx):
            x_q, sx, x_sal = prologue(xx)
            return int8_prefill_matmul(x_q, sx, pk.w_qt, sw_t, x_sal,
                                       pk.w_sal_t, out_dtype=jnp.bfloat16,
                                       tile_n=1024, tile_o=128, tile_k=K)

        ref = np.asarray(ref_fn(x), np.float32)
        got = np.asarray(kern128(x), np.float32)
        err = np.max(np.abs(got - ref) / (np.abs(ref) + 1e-3))
        log(f"({N},{K}->{O}) to=128 max rel err vs XLA ref: {err:.2e} "
            f"{'OK' if err < 2e-2 else 'MISMATCH'}")

        def bf16(xx, wt):
            return jnp.dot(xx, wt, preferred_element_type=jnp.float32
                           ).astype(xx.dtype)

        t_bf = time_steps(bf16, (x, w.T), iters=128, repeats=9)
        log(f"({N},{K}->{O}) bf16: {t_bf*1e3:.3f} ms")

        x_q0, sx0, x_sal0 = jax.jit(prologue)(x)
        x_q0.block_until_ready()

        def raw_int8(xx, wq):
            xq = x_q0 + jnp.round(xx[:1, :1] * 0).astype(jnp.int8)
            return jax.lax.dot_general(
                xq, wq, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

        t = time_steps(raw_int8, (x, pk.w_qt), iters=128, repeats=9)
        log(f"({N},{K}->{O}) raw_int8: {t*1e3:.3f} ms")

        def kern_t(xx, wq, to):
            x_q, sx, x_sal = prologue(xx)
            return int8_prefill_matmul(x_q, sx, wq, sw_t, x_sal, pk.w_sal_t,
                                       out_dtype=jnp.bfloat16,
                                       tile_n=1024, tile_o=to, tile_k=K)

        for to in (128, 256):
            t = time_steps(lambda xx, wq, to=to: kern_t(xx, wq, to),
                           (x, pk.w_qt), iters=128, repeats=9)
            log(f"({N},{K}->{O}) kern to={to}: {t*1e3:.3f} ms "
                f"({t_bf/t:.2f}x bf16)")


if __name__ == "__main__":
    main()
