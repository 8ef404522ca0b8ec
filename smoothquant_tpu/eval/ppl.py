"""WikiText-2-style perplexity evaluation.

Identical NLL math to the reference Evaluator (ppl_eval.py:32-62): the token
stream is cut into contiguous windows of `window` tokens; per window, the
shifted cross-entropy mean over (window-1) positions is multiplied by
`window`; PPL = exp(sum(nll) / (n_windows * window)).  (The window-vs-
(window-1) multiplier quirk is preserved deliberately for bit-compatibility
with published numbers.)

The model is abstracted as logits_fn(input_ids (1,S)) -> (1,S,V) float32,
jit-compiled once here.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def window_nll(logits: jax.Array, targets: jax.Array, window: int) -> jax.Array:
    """Shifted cross-entropy for one window: mean over S-1 positions × window."""
    shift_logits = logits[:, :-1, :].astype(jnp.float32)
    shift_labels = targets[:, 1:]
    logprobs = jax.nn.log_softmax(shift_logits, axis=-1)
    nll = -jnp.take_along_axis(logprobs, shift_labels[..., None], axis=-1)[..., 0]
    return jnp.mean(nll) * window


class Evaluator:
    """Strided-window perplexity evaluator (ppl_eval.py:32-62).

    tokens: 1-D pre-tokenized stream (the reference joins the dataset's text
    with "\\n\\n" and tokenizes once; tokenization happens upstream here).
    n_samples: number of windows; None → whole stream (len // window).
    """

    def __init__(self, tokens: np.ndarray, n_samples: Optional[int] = None,
                 window: int = 2048):
        self.tokens = np.asarray(tokens).reshape(-1)
        self.window = window
        self.n_samples = n_samples

    def evaluate(self, logits_fn: Callable[[jax.Array], jax.Array],
                 verbose: bool = False) -> float:
        window = self.window
        n = self.n_samples or (self.tokens.shape[0] // window)
        if n * window > self.tokens.shape[0]:
            raise ValueError(
                f"need {n * window} tokens for {n} windows, have {self.tokens.shape[0]}"
            )

        @jax.jit
        def step(ids):
            return window_nll(logits_fn(ids), ids, window)

        nlls = []
        for i in range(n):
            ids = jnp.asarray(self.tokens[i * window : (i + 1) * window][None, :])
            nlls.append(float(step(ids)))
            if verbose:
                running = float(np.exp(np.sum(nlls) / ((i + 1) * window)))
                print(f"  window {i + 1}/{n}  running ppl={running:.4f}", flush=True)
        return float(np.exp(np.sum(nlls) / (n * window)))
