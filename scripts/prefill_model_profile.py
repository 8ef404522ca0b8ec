"""Profile the FULL-MODEL promoted-int8 prefill (1024 tokens, 8 layers):
where do the non-matmul milliseconds go?"""

import collections
import glob
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LAYERS = 8


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"platform={jax.devices()[0].platform}")

    from smoothquant_tpu.kernels.pack import pack_linear, promote_int8
    from smoothquant_tpu.models import llama
    from smoothquant_tpu.models.common import ForwardContext
    from smoothquant_tpu.quant import w4a4_group
    from smoothquant_tpu.quant.config import QuantConfig

    qcfg = dataclasses.replace(w4a4_group(group_size=64, salient_prop=0.05),
                               scale_dtype="bfloat16")
    head_qcfg = QuantConfig(weight_quant="per_channel",
                            act_quant="per_token", quant_bits=8)
    cfg = dataclasses.replace(llama.LlamaConfig.llama2_7b(),
                              num_hidden_layers=LAYERS)
    rng = np.random.default_rng(0)
    key_pf = jax.random.PRNGKey(2)

    def fuse(*lins):
        return {"weight": jnp.concatenate([l["weight"] for l in lins], 0),
                "bias": None}

    imp = rng.uniform(0.1, 1.0, size=(cfg.hidden_size,))
    layers = {}
    for i in range(LAYERS):
        lp = llama.init_layer_params(jax.random.fold_in(key_pf, i), cfg)
        sa, mlp = lp["self_attn"], lp["mlp"]

        def pr(lin, k_in):
            return promote_int8(pack_linear(
                lin, qcfg,
                importance=(imp if k_in == cfg.hidden_size else
                            rng.uniform(0.1, 1.0, size=(k_in,))),
                nibble=True))

        h_ = cfg.hidden_size
        lp["self_attn"] = {"qkv_proj": pr(fuse(sa["q_proj"], sa["k_proj"],
                                               sa["v_proj"]), h_),
                           "o_proj": pr(sa["o_proj"], h_)}
        lp["mlp"] = {"gate_up_proj": pr(fuse(mlp["gate_proj"],
                                             mlp["up_proj"]), h_),
                     "down_proj": pr(mlp["down_proj"],
                                     cfg.intermediate_size)}
        layers[str(i)] = lp
    promoted = {
        "embed_tokens": {"weight": jax.random.normal(
            jax.random.fold_in(key_pf, 1001),
            (cfg.vocab_size, cfg.hidden_size), jnp.bfloat16) * 0.02},
        "layers": layers,
        "norm": {"weight": jnp.ones((cfg.hidden_size,), jnp.bfloat16)},
        "lm_head": pack_linear(
            llama._init_lin(jax.random.fold_in(key_pf, 1000),
                            cfg.vocab_size, cfg.hidden_size, False,
                            jnp.bfloat16), head_qcfg),
    }
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(1, 1024)))
    ctx = ForwardContext(compute="int")

    @jax.jit
    def full_prefill(t, p):
        logits, _ = llama.forward(p, t.astype(jnp.int32), cfg, ctx=ctx)
        return jnp.mean(logits[:, -1])

    x = ids.astype(jnp.float32)
    float(full_prefill(x, promoted))
    t0 = time.perf_counter()
    float(full_prefill(x, promoted))
    log(f"wall {1e3*(time.perf_counter()-t0):.1f} ms (incl RTT)")

    tmpd = tempfile.mkdtemp(prefix="pfm_")
    with jax.profiler.trace(tmpd):
        float(full_prefill(x, promoted))
    xs = glob.glob(os.path.join(tmpd, "**", "*.xplane.pb"), recursive=True)
    pd = jax.profiler.ProfileData.from_file(xs[0])
    agg = collections.defaultdict(float)
    cnt = collections.Counter()
    for plane in pd.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                k = ev.name.split(".")[0]
                agg[k] += ev.duration_ns / 1e3
                cnt[k] += 1
    total = sum(agg.values())
    log(f"device op total {total/1e3:.2f} ms ({LAYERS} layers)")
    for k, us in sorted(agg.items(), key=lambda kv: -kv[1])[:22]:
        log(f"  {us:9.1f} us  x{cnt[k]:4d}  {k[:80]}")


if __name__ == "__main__":
    main()
