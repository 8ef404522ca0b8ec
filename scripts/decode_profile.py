"""Profile the packed prefetch-scan decode step and aggregate device time.

Builds the bench.py flagship config at reduced depth (scan body is identical
per layer, so per-layer shares extrapolate), traces a handful of decode
steps with jax.profiler, then parses the xplane with
jax.profiler.ProfileData and prints per-op-category device time so we can
see where the non-roofline microseconds go (kernel vs XLA glue vs gaps).
"""

from __future__ import annotations

import collections
import glob
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LAYERS = int(os.environ.get("PROF_LAYERS", "8"))
BATCH, CACHE = 4, 512
STEPS = 8


def _log(m):
    import time
    print(f"# [{time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


def build(cfg, qcfg, head_qcfg, rng):
    """Bench-identical packed model (keep in sync with bench.py): fused
    qkv/gate_up, shared residual basis (pre-permuted inputs, zero runtime
    stream gathers), down-perm folded into gate_up rows, o/down outputs in
    the shared basis."""
    import dataclasses as dc

    import jax
    import jax.numpy as jnp
    from smoothquant_tpu.kernels.pack import (fold_input_perm, pack_linear,
                                              permute_output_columns)
    from smoothquant_tpu.models import llama

    key = jax.random.PRNGKey(2)

    def fuse(*lins):
        return {"weight": jnp.concatenate([l["weight"] for l in lins], 0),
                "bias": None}

    def pk(lin, imp, absmax=None):
        return pack_linear(lin, qcfg, importance=imp, act_absmax=absmax,
                           nibble=True, align_k_groups=8, align_o=2048)

    def mark_prep(p):
        return dc.replace(p, meta=dc.replace(p.meta, pre_permuted=True))

    h_dim, i_dim = cfg.hidden_size, cfg.intermediate_size
    shared_imp = rng.uniform(0.1, 1.0, size=(h_dim,))
    shared_perm = None
    layers = {}
    for i in range(cfg.num_hidden_layers):
        lp = llama.init_layer_params(jax.random.fold_in(key, i), cfg)
        sa, mlp = lp["self_attn"], lp["mlp"]
        qkv = mark_prep(pk(fuse(sa["q_proj"], sa["k_proj"], sa["v_proj"]),
                           shared_imp, shared_imp))
        if shared_perm is None:
            shared_perm = np.asarray(qkv.perm)
        # identity layout for o_proj: its input (attention output) cannot
        # arrive pre-permuted, and the full-width activation gather cost
        # ~8 us/layer (profiled); identity packing removes it
        op = permute_output_columns(
            pack_linear({"weight": sa["o_proj"]["weight"],
                         "bias": sa["o_proj"].get("bias")},
                        qcfg, importance=rng.uniform(0.1, 1.0,
                                                     size=(h_dim,)),
                        nibble=True, identity=True, align_k_groups=8,
                        align_o=2048),
            shared_perm)
        lp["self_attn"] = {"qkv_proj": qkv, "o_proj": op}
        dp = pk(mlp["down_proj"], rng.uniform(0.1, 1.0, size=(i_dim,)))
        dp, gu_lin = fold_input_perm(
            dp, fuse(mlp["gate_proj"], mlp["up_proj"]), n_splits=2)
        lp["mlp"] = {
            "gate_up_proj": mark_prep(pk(gu_lin, shared_imp, shared_imp)),
            "down_proj": permute_output_columns(dp, shared_perm),
        }
        layers[str(i)] = lp
    h = cfg.hidden_size
    take = jnp.asarray(shared_perm)
    lm_head = llama._init_lin(jax.random.fold_in(key, 1000), cfg.vocab_size,
                              h, False, jnp.bfloat16)
    lm_head = {"weight": jnp.take(lm_head["weight"], take, axis=1),
               "bias": None}
    packed = {
        "embed_tokens": {"weight": jnp.take(jax.random.normal(
            jax.random.fold_in(key, 1001), (cfg.vocab_size, h),
            jnp.bfloat16) * 0.02, take, axis=1)},
        "layers": layers,
        "norm": {"weight": jnp.ones((h,), jnp.bfloat16)},
        "lm_head": pack_linear(lm_head, head_qcfg),
    }
    stacked = llama.stack_layers(packed, cfg)
    if int(os.environ.get("SMQ_BLOCKED", "1")):
        from smoothquant_tpu.kernels.pack import block_decode_tree

        stacked = block_decode_tree(stacked)
    return stacked


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from smoothquant_tpu.models import llama
    from smoothquant_tpu.models.common import ForwardContext
    from smoothquant_tpu.quant import w4a4_group
    from smoothquant_tpu.quant.config import QuantConfig

    import dataclasses as _dc

    qcfg = _dc.replace(w4a4_group(group_size=64, salient_prop=0.05),
                       scale_dtype="bfloat16")
    head_qcfg = QuantConfig(weight_quant="per_channel", act_quant="per_token",
                            quant_bits=8)
    rng = np.random.default_rng(0)
    cfg = dataclasses.replace(llama.LlamaConfig.llama2_7b(),
                              num_hidden_layers=LAYERS)
    _log(f"building packed model ({LAYERS} layers)")
    packed = build(cfg, qcfg, head_qcfg, rng)
    smajor = bool(int(os.environ.get("PROF_SMAJOR", "0")))
    caches = llama.stacked_caches(cfg, BATCH, CACHE, jnp.bfloat16,
                                  pos=CACHE - 64, quant_kv=True,
                                  smajor=smajor)
    if smajor:
        _log("PROFILING THE S-MAJOR (batched-head) ATTENTION PATH")
    ctx = ForwardContext(quant=qcfg, compute="int")
    tok = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(BATCH, 1)))

    # mirror bench.py's stateful timing: chain STEPS decode steps inside one
    # jit, carrying the cache (in-place updates, no per-step cache copies)
    @jax.jit
    def run(t, p, c):
        def body(i, carry):
            s, cc = carry
            logits, cc = llama.forward(p, t, cfg, ctx=ctx, caches=cc)
            return jnp.mean(logits[:, -1]).astype(jnp.float32), cc
        return jax.lax.fori_loop(0, STEPS, body, (jnp.float32(0.0), c))[0]

    _log("compiling / warming")
    float(run(tok, packed, caches))
    import time
    t0 = time.perf_counter()
    float(run(tok, packed, caches))
    wall = (time.perf_counter() - t0) / STEPS
    _log(f"decode step {wall*1e3:.3f} ms at {LAYERS} layers (chained)")

    tmpd = tempfile.mkdtemp(prefix="smqprof_")
    _log(f"tracing into {tmpd}")
    with jax.profiler.trace(tmpd):
        float(run(tok, packed, caches))

    xs = glob.glob(os.path.join(tmpd, "**", "*.xplane.pb"), recursive=True)
    _log(f"xplane files: {xs}")
    pd = jax.profiler.ProfileData.from_file(xs[0])
    for plane in pd.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        _log(f"plane: {plane.name}")
        agg = collections.defaultdict(float)
        cnt = collections.Counter()
        total = 0.0
        tmin, tmax = float("inf"), 0.0
        for line in plane.lines:
            lname = line.name
            for ev in line.events:
                dur = ev.duration_ns / 1e3  # us
                name = ev.name
                agg[(lname, name)] += dur
                cnt[(lname, name)] += 1
                if "step" not in lname.lower():
                    total += dur
                start = ev.start_ns / 1e3
                tmin = min(tmin, start)
                tmax = max(tmax, start + dur)
        rows = sorted(agg.items(), key=lambda kv: -kv[1])[:60]
        print(json.dumps({"plane": plane.name,
                          "span_us": round(tmax - tmin, 1),
                          "sum_us": round(total, 1)}))
        for (lname, name), us in rows:
            print(f"{us/STEPS:10.1f} us/step  x{cnt[(lname,name)]/STEPS:6.1f}  "
                  f"[{lname}] {name[:110]}")


if __name__ == "__main__":
    main()
