"""Calibration — functional activation-statistics collection.

The reference collects stats with torch forward hooks
(/root/reference/smoothquant/calibration.py:13-130 and the
get_calib_feat variant in run_experiments/run_experiments.py:55-84).  Our
models are our own pure functions, so no hooks are needed: forward passes
accept an optional TapCollector; every quantizable linear call site reports
its input (and output) through `tap`, which reduces the traced activation to
small per-channel / scalar statistics that come back as part of the jitted
output pytree.  The driver loops below accumulate across batches on host.

Three statistics, matching the reference exactly:
  * per-channel absmax of linear inputs  → smoothing scales (get_act_scales)
  * per-channel mean-abs of linear inputs → salience importance
    (get_calib_feat; summed over batches, run_experiments.py:57-64)
  * per-tensor absmax of inputs+outputs  → static INT8 scales
    (get_static_decoder_layer_scales)
"""

from __future__ import annotations

from typing import Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np


class TapCollector:
    """Collects reduced activation statistics during a traced forward pass.

    Modes: "absmax" (per-channel absmax of inputs), "mean_abs" (per-channel
    mean |x| of inputs), "static" (scalar absmax of inputs and outputs).
    """

    def __init__(self, mode: str = "absmax"):
        assert mode in ("absmax", "mean_abs", "static")
        self.mode = mode
        self.stats: dict = {}

    def tap_input(self, name: str, x: jax.Array) -> None:
        x2d = jnp.abs(x.reshape(-1, x.shape[-1]).astype(jnp.float32))
        if self.mode == "absmax":
            self.stats[name] = jnp.max(x2d, axis=0)
        elif self.mode == "mean_abs":
            self.stats[name] = jnp.mean(x2d, axis=0)
        else:
            self.stats.setdefault(name, {})["input"] = jnp.max(x2d)

    def tap_output(self, name: str, y: jax.Array) -> None:
        if self.mode == "static":
            self.stats.setdefault(name, {})["output"] = jnp.max(
                jnp.abs(y.astype(jnp.float32))
            )


def _run_batches(
    forward: Callable,
    params,
    batches: Iterable[jax.Array],
    mode: str,
):
    """Yield per-batch stats dicts from a tapped forward.

    forward(params, input_ids, collector) must route the collector into the
    model and return anything; only collector stats are used.
    """

    def tapped(params, input_ids):
        col = TapCollector(mode)
        forward(params, input_ids, col)
        return col.stats

    tapped_jit = jax.jit(tapped)
    for input_ids in batches:
        yield jax.tree.map(np.asarray, tapped_jit(params, input_ids))


def get_act_scales(forward, params, batches) -> dict:
    """Per-channel absmax of every linear's input, running-max over batches.

    TPU equivalent of calibration.py:13-51.  Returns {name: float32 (C,)}.
    """
    acc: dict = {}
    for stats in _run_batches(forward, params, batches, "absmax"):
        for name, v in stats.items():
            acc[name] = np.maximum(acc[name], v) if name in acc else v
    return acc


def get_calib_feat(forward, params, batches) -> dict:
    """Summed per-channel mean-abs of inputs — the salience importance vector.

    TPU equivalent of get_calib_feat (run_experiments.py:55-84), which stores
    a list of per-batch mean-abs vectors later reduced with sum(); we return
    the sum directly.  Returns {name: float64 (C,)}.
    """
    acc: dict = {}
    for stats in _run_batches(forward, params, batches, "mean_abs"):
        for name, v in stats.items():
            v = v.astype(np.float64)
            acc[name] = acc[name] + v if name in acc else v
    return acc


def get_static_act_dict(forward, params, batches) -> dict:
    """Running per-tensor absmax of each linear's input and output.

    The act_dict half of get_static_decoder_layer_scales
    (calibration.py:54-103).  Returns {name: {"input": float, "output": float}}.
    """
    acc: dict = {}
    for stats in _run_batches(forward, params, batches, "static"):
        for name, io in stats.items():
            slot = acc.setdefault(name, {})
            for k, v in io.items():
                v = float(v)
                slot[k] = max(slot.get(k, 0.0), v)
    return acc


def get_static_decoder_layer_scales_opt(act_dict: dict, num_layers: int) -> list[dict]:
    """OPT per-decoder-layer static scales for the real-INT8 path.

    Mirrors calibration.py:104-130: seven scales per layer, each a running
    per-tensor absmax divided by 127.
    """
    out = []
    for idx in range(num_layers):
        p = f"model.decoder.layers.{idx}"
        out.append(
            {
                "attn_input_scale": act_dict[f"{p}.self_attn.q_proj"]["input"] / 127,
                "q_output_scale": act_dict[f"{p}.self_attn.q_proj"]["output"] / 127,
                "k_output_scale": act_dict[f"{p}.self_attn.k_proj"]["output"] / 127,
                "v_output_scale": act_dict[f"{p}.self_attn.v_proj"]["output"] / 127,
                "out_input_scale": act_dict[f"{p}.self_attn.out_proj"]["input"] / 127,
                "fc1_input_scale": act_dict[f"{p}.fc1"]["input"] / 127,
                "fc2_input_scale": act_dict[f"{p}.fc2"]["input"] / 127,
            }
        )
    return out


def make_calib_batches(
    token_stream: np.ndarray, num_samples: int, seq_len: int
) -> list[np.ndarray]:
    """Cut a 1-D token stream into (1, seq_len) calibration blocks.

    Equivalent of get_calib_dataset's 512-token block construction
    (run_experiments.py:30-53) given pre-tokenized text.
    """
    blocks = []
    for i in range(num_samples):
        lo, hi = i * seq_len, (i + 1) * seq_len
        if hi > token_stream.shape[0]:
            break
        blocks.append(token_stream[lo:hi][None, :])
    return blocks
