"""Dump a raw per-event timeline of the packed decode step (one scan
window) so inter-op gaps become visible — profiler op durations sum to far
less than the measured wall time at L=32, and this shows where the
unattributed microseconds sit."""

import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LAYERS = int(os.environ.get("PROF_LAYERS", "8"))
BATCH, CACHE = 4, 512
STEPS = 4
WINDOW_US = float(os.environ.get("WINDOW_US", "1200"))


def _log(m):
    import time
    print(f"# [{time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from decode_profile import build

    import dataclasses
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
    caches = llama.stacked_caches(cfg, BATCH, CACHE, jnp.bfloat16,
                                  pos=CACHE - 64, quant_kv=True)
    ctx = ForwardContext(quant=qcfg, compute="int")
    tok = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(BATCH, 1)))

    @jax.jit
    def run(t, p, c):
        def body(i, carry):
            s, cc = carry
            logits, cc = llama.forward(p, t, cfg, ctx=ctx, caches=cc)
            return jnp.mean(logits[:, -1]).astype(jnp.float32), cc
        return jax.lax.fori_loop(0, STEPS, body, (jnp.float32(0.0), c))[0]

    _log("compiling / warming")
    float(run(tok, packed, caches))
    tmpd = tempfile.mkdtemp(prefix="smqtl_")
    with jax.profiler.trace(tmpd):
        float(run(tok, packed, caches))

    xs = glob.glob(os.path.join(tmpd, "**", "*.xplane.pb"), recursive=True)
    pd = jax.profiler.ProfileData.from_file(xs[0])
    evs = []
    for plane in pd.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                evs.append((ev.start_ns / 1e3, ev.duration_ns / 1e3,
                            line.name, ev.name))
    evs.sort()
    # find a mid-run anchor: first event starting after 30% of the span
    t0 = evs[0][0]
    t_end = max(s + d for s, d, _, _ in evs)
    anchor = t0 + 0.5 * (t_end - t0)
    sel = [e for e in evs if anchor <= e[0] <= anchor + WINDOW_US]
    prev_end = {}
    for s, d, ln, name in sel:
        gap = ""
        if ln in prev_end:
            g = s - prev_end[ln]
            if g > 1.0:
                gap = f"  <-- gap {g:7.1f} us"
        prev_end[ln] = s + d
        print(f"{s - anchor:9.1f} +{d:8.1f} [{ln[:18]:18s}] {name[:72]}{gap}")


if __name__ == "__main__":
    main()
