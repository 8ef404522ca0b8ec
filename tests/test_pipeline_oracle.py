"""END-TO-END pipeline oracle vs the reference torch code (VERDICT r3 #3).

tests/test_reference_parity.py pins unit-level parity (quantizers, linear,
smoothing).  These tests pin the COMPOSED capability the reference is for:

  (1) the run_experiments sweep cell — the reference's own
      get_calib_feat → quantize_opt/llama_like(per_group sorted, salient)
      → Evaluator chain (/root/reference/run_experiments/run_experiments.py:
      125-190) runs verbatim on a tiny random HF model (its dataset loader
      monkeypatched to synthetic token blocks), against OUR
      cli.run_experiments on the identical token streams;
  (2) the smooth→quantize ppl_eval recipe (/root/reference/smoothquant/
      ppl_eval.py:69-85): reference get_act_scales → smooth_lm →
      quantize_model(per_channel, per_token, bmm) → Evaluator, against OUR
      cli.ppl_eval consuming the reference's own .pt act-scales artifact.

PPL must agree to ~1e-3 relative — accuracy validation at the pipeline
level, which is the only kind this container permits (no real weights).
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

os.environ.setdefault("MPLBACKEND", "Agg")
sys.path.insert(0, "/root/reference")

from smoothquant import calibration as ref_calibration  # noqa: E402
from smoothquant import fake_quant as ref_fq  # noqa: E402
from smoothquant import smooth as ref_smooth  # noqa: E402

REF_RE = "/root/reference/run_experiments/run_experiments.py"


def _load_ref_run_experiments():
    spec = importlib.util.spec_from_file_location("ref_run_experiments",
                                                  REF_RE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


WINDOW = 64
N_WINDOWS = 4
CALIB_BLOCKS = 4


def _streams(vocab: int, seed: int):
    rng = np.random.default_rng(seed)
    eval_tokens = rng.integers(0, vocab, size=(WINDOW * N_WINDOWS,),
                               dtype=np.int64)
    calib_tokens = rng.integers(0, vocab, size=(WINDOW * CALIB_BLOCKS,),
                                dtype=np.int64)
    return eval_tokens, calib_tokens


def _calib_blocks_torch(calib_tokens: np.ndarray):
    return [torch.tensor(calib_tokens[i * WINDOW:(i + 1) * WINDOW][None, :])
            for i in range(CALIB_BLOCKS)]


def _ref_evaluate(re_mod, model, eval_tokens: np.ndarray) -> float:
    """The reference Evaluator.evaluate verbatim, constructed around a
    pre-tokenized stream (its __init__ only tokenizes text)."""
    ev = re_mod.Evaluator.__new__(re_mod.Evaluator)
    ev.dataset = torch.tensor(eval_tokens[None, :])
    ev.device = torch.device("cpu")
    ev.n_samples = N_WINDOWS
    ev.batch_size = WINDOW
    with torch.no_grad():
        return float(re_mod.Evaluator.evaluate(ev, model))


@pytest.fixture(scope="module")
def tiny_opt(tmp_path_factory):
    from transformers import OPTConfig, OPTForCausalLM

    cfg = OPTConfig(
        vocab_size=128, hidden_size=64, ffn_dim=128, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=512,
        word_embed_proj_dim=64, do_layer_norm_before=True,
    )
    torch.manual_seed(0)
    model = OPTForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("opt") / "tiny-opt"
    model.save_pretrained(path)
    return model, str(path)


@pytest.fixture(scope="module")
def tiny_llama(tmp_path_factory):
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=512, tie_word_embeddings=False,
        attention_bias=False,
    )
    torch.manual_seed(1)
    model = LlamaForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("llama") / "tiny-llama"
    model.save_pretrained(path)
    return model, str(path)


def _our_sweep_cell(model_path: str, tmp_path, eval_tokens, calib_tokens,
                    group_size: int, salient_prop: float) -> float:
    from smoothquant_tpu.cli import run_experiments as our_re

    ev_npy = str(tmp_path / "eval.npy")
    cal_npy = str(tmp_path / "calib.npy")
    np.save(ev_npy, eval_tokens.astype(np.int32))
    np.save(cal_npy, calib_tokens.astype(np.int32))
    out_dir = str(tmp_path / "out")
    our_re.main([
        "--model_path", model_path, "--tokens_path", ev_npy,
        "--calib_tokens_path", cal_npy,
        "--group_sizes", str(group_size),
        "--salient_props", str(salient_prop),
        "--n_samples", str(N_WINDOWS), "--window", str(WINDOW),
        "--calib_samples", str(CALIB_BLOCKS), "--calib_seq_len", str(WINDOW),
        "--output_dir", out_dir, "--dtype", "float32",
    ])
    with open(os.path.join(out_dir, "results.json")) as f:
        return float(json.load(f)["results"][0]["ppl"])


@pytest.mark.parametrize("fixture,quantize_fn_name", [
    ("tiny_opt", "quantize_opt"),
    ("tiny_llama", "quantize_llama_like"),
])
def test_sweep_cell_pipeline_parity(fixture, quantize_fn_name, tmp_path,
                                    request):
    """run_experiments.py:146-175 cell vs cli.run_experiments, same tokens."""
    model, model_path = request.getfixturevalue(fixture)
    eval_tokens, calib_tokens = _streams(128, seed=5)
    group_size, salient_prop = 16, 0.1

    re_mod = _load_ref_run_experiments()
    # monkeypatch ONLY the dataset loader (zero egress): the reference's
    # get_calib_feat hook machinery runs verbatim over the same blocks our
    # CLI receives via --calib_tokens_path
    re_mod.get_calib_dataset = (
        lambda tokenizer=None, n_samples=256, block_size=512:
        _calib_blocks_torch(calib_tokens))

    import copy

    ref_model = copy.deepcopy(model).float().eval()
    with torch.no_grad():
        input_feat = re_mod.get_calib_feat(ref_model, None)
        quantize_fn = getattr(ref_fq, quantize_fn_name)
        ref_q = quantize_fn(
            ref_model, weight_quant="per_group", act_quant="per_group",
            input_feat=input_feat, salient_prop=salient_prop,
            group_size=group_size,
        )
        ref_ppl = _ref_evaluate(re_mod, ref_q, eval_tokens)

    our_ppl = _our_sweep_cell(model_path, tmp_path, eval_tokens,
                              calib_tokens, group_size, salient_prop)
    np.testing.assert_allclose(our_ppl, ref_ppl, rtol=2e-3)


class _IntTokenizer:
    """Maps 'space-separated ints' text to ids — lets the reference
    calibration loop (calibration.py:38-46) run verbatim offline."""

    def __call__(self, text, return_tensors="pt", max_length=None,
                 truncation=False):
        ids = [int(t) for t in text.split()]
        if truncation and max_length is not None:
            ids = ids[:max_length]

        class R:
            input_ids = torch.tensor([ids])

        return R()


class _FakeTextDataset:
    def __init__(self, blocks):
        self._rows = [{"text": " ".join(str(int(t)) for t in b)}
                      for b in blocks]

    def shuffle(self, seed=None):
        return self

    def __getitem__(self, i):
        return self._rows[i]


def test_smooth_quantize_recipe_parity(tiny_llama, tmp_path):
    """ppl_eval.py:69-85 recipe: get_act_scales (.pt artifact) → smooth_lm
    → quantize_model(per_channel, per_token, bmm) → PPL, vs cli.ppl_eval
    consuming the reference-produced .pt file.

    Llama, not OPT: the reference's quantize_model with input_feat=None
    unconditionally indexes input_feat for OPT (fake_quant.py:396 KeyError)
    — its no-calibration ppl_eval recipe only actually runs on llama-like
    models."""
    model, model_path = tiny_llama
    eval_tokens, calib_tokens = _streams(128, seed=9)
    blocks = [calib_tokens[i * WINDOW:(i + 1) * WINDOW]
              for i in range(CALIB_BLOCKS)]

    import copy

    ref_model = copy.deepcopy(model).float().eval()
    orig_load = ref_calibration.load_dataset
    ref_calibration.load_dataset = (
        lambda *a, **k: _FakeTextDataset(blocks))
    try:
        scales = ref_calibration.get_act_scales(
            ref_model, _IntTokenizer(), dataset_path="unused",
            num_samples=CALIB_BLOCKS, seq_len=WINDOW)
    finally:
        ref_calibration.load_dataset = orig_load
    pt_path = str(tmp_path / "act_scales.pt")
    torch.save(scales, pt_path)

    with torch.no_grad():
        ref_smooth.smooth_lm(ref_model, scales, alpha=0.5)
        ref_q = ref_fq.quantize_model(
            ref_model, weight_quant="per_channel", act_quant="per_token",
            quantize_bmm_input=True)
    re_mod = _load_ref_run_experiments()
    ref_ppl = _ref_evaluate(re_mod, ref_q, eval_tokens)

    from smoothquant_tpu.cli import ppl_eval as our_ppl_eval

    ev_npy = str(tmp_path / "eval.npy")
    np.save(ev_npy, eval_tokens.astype(np.int32))
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        our_ppl_eval.main([
            "--model_path", model_path, "--tokens_path", ev_npy,
            "--smooth", "--act_scales_path", pt_path, "--quantize",
            "--alpha", "0.5", "--weight_quant", "per_channel",
            "--act_quant", "per_token", "--quantize_bmm_input",
            "--n_samples", str(N_WINDOWS),
            "--window", str(WINDOW), "--dtype", "float32", "--json",
        ])
    our_ppl = json.loads(buf.getvalue().strip().splitlines()[-1])["ppl"]
    np.testing.assert_allclose(our_ppl, ref_ppl, rtol=2e-3)
