"""Pinned-seed synthetic perplexity goldens (VERDICT r1 weak #9).

The reference's §6 PPL arrays need real weights + WikiText, which don't
exist in-container; these goldens freeze the full eval pipeline (model init
→ optional quantization → Evaluator NLL math) on synthetic tokens so any
numeric drift between rounds — quantizer changes, evaluator changes, model
forward changes — fails loudly.  Recomputed goldens must be justified by an
intentional numerics change.
"""

import numpy as np
import jax

from smoothquant_tpu.eval import Evaluator
from smoothquant_tpu.models import ForwardContext, llama as jllama
from smoothquant_tpu.models.registry import quantize_model
from smoothquant_tpu.quant import w4a4_group

# pinned on CPU (tests force the CPU backend; XLA CPU is deterministic)
GOLDEN_FP = 402.47710995136237
GOLDEN_W4A4_G16 = 428.836482849031


def _setup():
    cfg = jllama.LlamaConfig.tiny()
    params = jllama.init_params(jax.random.PRNGKey(7), cfg)
    tokens = np.random.default_rng(7).integers(
        0, cfg.vocab_size, size=(4096,)).astype(np.int32)
    return cfg, params, Evaluator(tokens, n_samples=3, window=64)


def test_fp_ppl_golden():
    cfg, params, ev = _setup()
    ppl = ev.evaluate(lambda ids: jllama.forward(params, ids, cfg)[0],
                      verbose=False)
    np.testing.assert_allclose(ppl, GOLDEN_FP, rtol=1e-4)


def test_w4a4_ppl_golden():
    cfg, params, ev = _setup()
    qcfg = w4a4_group(group_size=16, salient_prop=0.0)
    qp = quantize_model("llama", params, cfg, qcfg)
    ctx = ForwardContext(quant=qcfg)
    ppl = ev.evaluate(lambda ids: jllama.forward(qp, ids, cfg, ctx=ctx)[0],
                      verbose=False)
    np.testing.assert_allclose(ppl, GOLDEN_W4A4_G16, rtol=1e-4)
    # quantization must cost SOME ppl on a random model, but not explode
    assert GOLDEN_FP < ppl < GOLDEN_FP * 1.25
