"""Evaluator and model-size tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from smoothquant_tpu.eval import Evaluator, get_model_size_bits, bits_to_mib, count_params
from smoothquant_tpu.models import llama as jllama


def test_ppl_uniform_model_equals_vocab_size():
    # uniform logits: per-position NLL = log V; mean × window / (n·window)
    # telescopes to log V, so PPL = V exactly
    vocab, window = 64, 32
    tokens = np.random.default_rng(0).integers(0, vocab, size=(window * 3,))
    ev = Evaluator(tokens, window=window)
    ppl = ev.evaluate(lambda ids: jnp.zeros((1, ids.shape[1], vocab), jnp.float32))
    assert ppl == pytest.approx(vocab, rel=1e-4)


def test_ppl_perfect_model_is_one():
    vocab, window = 16, 32
    tokens = np.random.default_rng(1).integers(0, vocab, size=(window * 2,))
    ev = Evaluator(tokens, window=window)

    def perfect(ids):
        # next-token logits massively favor the true next token
        nxt = jnp.concatenate([ids[:, 1:], ids[:, -1:]], axis=1)
        return jax.nn.one_hot(nxt, vocab) * 100.0

    assert ev.evaluate(perfect) == pytest.approx(1.0, abs=1e-3)


def test_ppl_matches_torch_cross_entropy_math():
    torch = pytest.importorskip("torch")
    vocab, window, n = 32, 16, 2
    rng = np.random.default_rng(2)
    tokens = rng.integers(0, vocab, size=(window * n,))
    logits = rng.normal(size=(n, window, vocab)).astype(np.float32)

    nlls = []
    for i in range(n):
        lg = torch.tensor(logits[i : i + 1])
        ids = torch.tensor(tokens[i * window : (i + 1) * window][None, :])
        loss = torch.nn.functional.cross_entropy(
            lg[:, :-1, :].reshape(-1, vocab), ids[:, 1:].reshape(-1)
        )
        nlls.append(float(loss) * window)
    expected = float(np.exp(np.sum(nlls) / (n * window)))

    table = {i: logits[i] for i in range(n)}
    calls = {"i": -1}

    def from_table(ids):
        calls["i"] += 1
        return jnp.asarray(table[calls["i"]][None])

    # jit would cache; use interpret-style call via no-jit evaluator math
    from smoothquant_tpu.eval.ppl import window_nll

    got_nlls = [
        float(window_nll(jnp.asarray(logits[i][None]),
                         jnp.asarray(tokens[i * window : (i + 1) * window][None]),
                         window))
        for i in range(n)
    ]
    got = float(np.exp(np.sum(got_nlls) / (n * window)))
    assert got == pytest.approx(expected, rel=1e-5)


def test_insufficient_tokens_raises():
    ev = Evaluator(np.arange(10), n_samples=2, window=32)
    with pytest.raises(ValueError):
        ev.evaluate(lambda ids: jnp.zeros((1, ids.shape[1], 4), jnp.float32))


def test_model_size_formula():
    # numel × [(1-p)(4 + 20/g) + p(16 + 20/g)] — model_size.py:5-16
    n = 1000
    assert get_model_size_bits(n, 16) == n * 16
    assert get_model_size_bits(n, 4, 0.0, 128) == pytest.approx(n * (4 + 20 / 128))
    assert get_model_size_bits(n, 4, 0.1, 64) == pytest.approx(
        n * (0.9 * (4 + 20 / 64) + 0.1 * (16 + 20 / 64))
    )


def test_llama2_7b_fp16_size_matches_readme():
    # README.md:48: Llama-2-7B fp16 = 12852 MiB.  (The README's quantized
    # 8193 MiB does NOT follow from the reference's own model_size.py formula,
    # which yields ~4302 MiB at W4 g128 10% salient; we pin to the code.)
    n_params = 6_738_415_616  # Llama-2-7B
    fp16 = bits_to_mib(get_model_size_bits(n_params, 16))
    assert fp16 == pytest.approx(12852, rel=0.01)
    q = bits_to_mib(get_model_size_bits(n_params, 4, 0.10, 128))
    assert q == pytest.approx(4302, rel=0.01)


def test_count_params_tiny_llama():
    cfg = jllama.LlamaConfig.tiny()
    params = jllama.init_params(jax.random.PRNGKey(0), cfg)
    n = count_params(params)
    assert n > 0
    # embed + lm_head dominate: 2 * vocab * hidden
    assert n > 2 * cfg.vocab_size * cfg.hidden_size
