"""Generation + continuous batching tests.

The oracle is teacher-forced full forward: greedy decode through any serving
path must reproduce argmax-of-full-forward token for token.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from smoothquant_tpu.models import llama as jllama, opt as jopt
from smoothquant_tpu.models.registry import quantize_model
from smoothquant_tpu.quant import QuantConfig
from smoothquant_tpu.serve import ContinuousBatcher, GenerationConfig, Generator, Request


@pytest.fixture(scope="module")
def tiny_llama():
    cfg = jllama.LlamaConfig.tiny()
    params = jllama.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def greedy_oracle(mod, params, cfg, prompt, n_new):
    """Reference greedy continuation via repeated full forward."""
    toks = list(prompt)
    for _ in range(n_new):
        logits, _ = mod.forward(params, jnp.asarray([toks]), cfg)
        toks.append(int(jnp.argmax(logits[0, -1])))
    return toks[len(prompt):]


class TestGenerator:
    def test_greedy_matches_full_forward(self, tiny_llama):
        cfg, params = tiny_llama
        prompt = np.random.default_rng(0).integers(0, cfg.vocab_size, size=(7,))
        gen = Generator(jllama, params, cfg, max_len=64)
        out = gen.generate(prompt[None, :], GenerationConfig(max_new_tokens=6))
        expected = greedy_oracle(jllama, params, cfg, list(prompt), 6)
        assert list(out[0, 7:]) == expected

    def test_batch_generation(self, tiny_llama):
        cfg, params = tiny_llama
        prompts = np.random.default_rng(1).integers(0, cfg.vocab_size, size=(3, 5))
        gen = Generator(jllama, params, cfg, max_len=32)
        out = gen.generate(prompts, GenerationConfig(max_new_tokens=4))
        assert out.shape == (3, 9)
        for b in range(3):
            expected = greedy_oracle(jllama, params, cfg, list(prompts[b]), 4)
            assert list(out[b, 5:]) == expected

    def test_quantized_generation(self, tiny_llama):
        cfg, params = tiny_llama
        qcfg = QuantConfig(weight_quant="per_channel", act_quant="per_token", quant_bits=8)
        qparams = quantize_model("llama", params, cfg, qcfg)
        prompt = np.random.default_rng(2).integers(0, cfg.vocab_size, size=(1, 6))
        gen = Generator(jllama, qparams, cfg, quant=qcfg, max_len=32)
        out = gen.generate(prompt, GenerationConfig(max_new_tokens=4))
        assert out.shape == (1, 10)

    def test_max_len_guard(self, tiny_llama):
        cfg, params = tiny_llama
        gen = Generator(jllama, params, cfg, max_len=16)
        with pytest.raises(ValueError):
            gen.generate(np.zeros((1, 10), np.int32),
                         GenerationConfig(max_new_tokens=10))


class TestContinuousBatching:
    def test_mixed_lengths_match_oracle(self, tiny_llama):
        cfg, params = tiny_llama
        rng = np.random.default_rng(3)
        batcher = ContinuousBatcher(jllama, params, cfg, max_batch=2, max_len=128)
        reqs = [
            Request(uid=i, prompt=rng.integers(0, cfg.vocab_size, size=(n,)),
                    max_new_tokens=4)
            for i, n in enumerate([5, 9, 3])  # 3 requests through 2 slots
        ]
        for r in reqs:
            batcher.submit(r)
        done = batcher.run_to_completion()
        assert len(done) == 3
        for r in reqs:
            assert r.done
            expected = greedy_oracle(jllama, params, cfg, list(r.prompt), 4)
            assert r.generated == expected, (r.uid, r.generated, expected)

    def test_mixed_buckets_batched_admission(self, tiny_llama):
        """Admission groups same-bucket prompts into ONE batched prefill;
        mixed buckets admit in separate launches — all oracle-exact."""
        cfg, params = tiny_llama
        rng = np.random.default_rng(11)
        batcher = ContinuousBatcher(jllama, params, cfg, max_batch=4,
                                    max_len=128)
        # buckets: 32, 32, 64, 32 — the three 32s share one prefill
        lens = [5, 9, 40, 12]
        reqs = [
            Request(uid=i, prompt=rng.integers(0, cfg.vocab_size, size=(n,)),
                    max_new_tokens=3)
            for i, n in enumerate(lens)
        ]
        for r in reqs:
            batcher.submit(r)
        done = batcher.run_to_completion()
        assert len(done) == 4
        for r in reqs:
            expected = greedy_oracle(jllama, params, cfg, list(r.prompt), 3)
            assert r.generated == expected, (r.uid, r.generated, expected)

    def test_eos_stops_early(self, tiny_llama):
        cfg, params = tiny_llama
        rng = np.random.default_rng(4)
        prompt = rng.integers(0, cfg.vocab_size, size=(4,))
        expected = greedy_oracle(jllama, params, cfg, list(prompt), 8)
        eos = expected[2]  # force stop at third generated token
        batcher = ContinuousBatcher(jllama, params, cfg, max_batch=1, max_len=64)
        req = Request(uid=0, prompt=prompt, max_new_tokens=8, eos_token_id=eos)
        batcher.submit(req)
        batcher.run_to_completion()
        assert req.generated == expected[:3]

    def test_bucket_padding_near_max_len(self, tiny_llama):
        # regression (ADVICE r1): prompt 30 buckets to 32; with max_len=32 and
        # max_new=2 the bucket padding must not consume cache capacity
        cfg, params = tiny_llama
        rng = np.random.default_rng(7)
        prompt = rng.integers(0, cfg.vocab_size, size=(30,))
        b = ContinuousBatcher(jllama, params, cfg, max_batch=1, max_len=32)
        req = Request(uid=0, prompt=prompt, max_new_tokens=2)
        b.submit(req)
        b.run_to_completion()
        expected = greedy_oracle(jllama, params, cfg, list(prompt), 2)
        assert req.generated == expected

    def test_bucket_larger_than_max_len(self, tiny_llama):
        # bucket(40) = 64 > max_len = 48: scatter must clip bucket-pad rows
        cfg, params = tiny_llama
        rng = np.random.default_rng(8)
        prompt = rng.integers(0, cfg.vocab_size, size=(40,))
        b = ContinuousBatcher(jllama, params, cfg, max_batch=1, max_len=48)
        req = Request(uid=0, prompt=prompt, max_new_tokens=4)
        b.submit(req)
        b.run_to_completion()
        expected = greedy_oracle(jllama, params, cfg, list(prompt), 4)
        assert req.generated == expected

    def test_queue_overflow_guard(self, tiny_llama):
        cfg, params = tiny_llama
        batcher = ContinuousBatcher(jllama, params, cfg, max_batch=1, max_len=32)
        with pytest.raises(ValueError):
            batcher.submit(Request(uid=0, prompt=np.zeros(30, np.int32),
                                   max_new_tokens=10))

    def test_opt_arch_supported(self):
        cfg = jopt.OPTConfig.tiny()
        params = jopt.init_params(jax.random.PRNGKey(5), cfg)
        rng = np.random.default_rng(6)
        prompt = rng.integers(0, cfg.vocab_size, size=(6,))
        batcher = ContinuousBatcher(jopt, params, cfg, max_batch=1, max_len=64)
        req = Request(uid=0, prompt=prompt, max_new_tokens=3)
        batcher.submit(req)
        batcher.run_to_completion()
        expected = greedy_oracle(jopt, params, cfg, list(prompt), 3)
        assert req.generated == expected


class TestPackedServing:
    def test_generator_over_packed_model(self, tiny_llama):
        from smoothquant_tpu.models.registry import pack_model
        from smoothquant_tpu.quant import w4a4_group

        cfg, params = tiny_llama
        qcfg = w4a4_group(group_size=32)
        packed = pack_model("llama", params, cfg, qcfg,
                            compute_dtype=jnp.float32)
        gen = Generator(jllama, packed, cfg, quant=qcfg, max_len=32,
                        interpret=True)
        prompt = np.random.default_rng(11).integers(0, cfg.vocab_size, size=(1, 5))
        out = gen.generate(prompt, GenerationConfig(max_new_tokens=4))
        assert out.shape == (1, 9)

    def test_batcher_over_packed_model(self, tiny_llama):
        from smoothquant_tpu.models.registry import pack_model
        from smoothquant_tpu.quant import w4a4_group

        cfg, params = tiny_llama
        qcfg = w4a4_group(group_size=32)
        packed = pack_model("llama", params, cfg, qcfg,
                            compute_dtype=jnp.float32)
        b = ContinuousBatcher(jllama, packed, cfg, quant=qcfg, max_batch=2,
                              max_len=64, interpret=True)
        rng = np.random.default_rng(12)
        reqs = [Request(uid=i, prompt=rng.integers(0, cfg.vocab_size, size=(n,)),
                        max_new_tokens=3) for i, n in enumerate([4, 6])]
        for r in reqs:
            b.submit(r)
        done = b.run_to_completion()
        assert len(done) == 2 and all(len(r.generated) == 3 for r in reqs)


class TestChunkedDecode:
    """step_chunk(K): K decode steps in one device dispatch must emit the
    SAME tokens as K single steps (greedy), including EOS-mid-chunk and
    slot turnover at chunk boundaries."""

    def test_chunked_matches_oracle_mixed_lengths(self, tiny_llama):
        cfg, params = tiny_llama
        rng = np.random.default_rng(21)
        batcher = ContinuousBatcher(jllama, params, cfg, max_batch=2,
                                    max_len=128)
        reqs = [
            Request(uid=i, prompt=rng.integers(0, cfg.vocab_size, size=(n,)),
                    max_new_tokens=7)
            for i, n in enumerate([5, 9, 3])
        ]
        for r in reqs:
            batcher.submit(r)
        done = batcher.run_to_completion(chunk=4)
        assert len(done) == 3
        for r in reqs:
            expected = greedy_oracle(jllama, params, cfg, list(r.prompt), 7)
            assert r.generated == expected, (r.uid, r.generated, expected)

    def test_chunked_eos_mid_chunk(self, tiny_llama):
        cfg, params = tiny_llama
        rng = np.random.default_rng(22)
        prompt = rng.integers(0, cfg.vocab_size, size=(4,))
        expected = greedy_oracle(jllama, params, cfg, list(prompt), 8)
        eos = expected[2]
        batcher = ContinuousBatcher(jllama, params, cfg, max_batch=1,
                                    max_len=64)
        req = Request(uid=0, prompt=prompt, max_new_tokens=8,
                      eos_token_id=eos)
        batcher.submit(req)
        batcher.run_to_completion(chunk=4)
        assert req.generated == expected[:3]
