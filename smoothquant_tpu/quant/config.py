"""Quantization configuration.

One frozen dataclass carries the reference's full knob set (the loose kwargs
threaded through quantize_model / W4A4Linear in
/root/reference/smoothquant/fake_quant.py:209-221,734-745 plus the smoothing
alpha of smooth.py:19).  Frozen + hashable so it can be closed over by jitted
functions as a static argument.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

WEIGHT_QUANT_CHOICES = ("per_channel", "per_tensor", "per_group", "per_group_unsorted")
ACT_QUANT_CHOICES = ("per_token", "per_tensor", "per_group", "per_group_unsorted")


@dataclasses.dataclass(frozen=True)
class QuantConfig:
    """Full quantization recipe for a model.

    Attributes:
      weight_quant: weight granularity; "per_group" is the sorted variant,
        matching the reference's from_float dispatch (fake_quant.py:348-359).
      act_quant: activation granularity; "per_group" is sorted
        (fake_quant.py:252-254).
      quantize_bmm_input: simulate quantized attention-BMM inputs by also
        quantizing q/k/v projection *outputs* (fake_quant.py:417, 517).
      salient_prop: fraction of input channels kept in high precision,
        ranked by calibrated importance (fake_quant.py:265-270).
      quant_bits: weight bit width b; q_max = 2**(b-1)-1.
      act_bits: activation bit width; None → quant_bits (the reference uses
        one width for both; separate widths enable W4A8 — BASELINE.json
        north star).
      group_size: channels per quantization group.
      alpha: SmoothQuant migration strength (smooth.py:19).
      static_sort: if True, the real execution path uses a calibration-time
        static channel permutation instead of the reference's per-call
        dynamic argsort (SURVEY.md §7 "hard parts"); the simulation path
        always follows the reference's dynamic sort.
    """

    weight_quant: str = "per_channel"
    act_quant: str = "per_token"
    quantize_bmm_input: bool = False
    salient_prop: float = 0.0
    quant_bits: int = 4
    act_bits: Optional[int] = None
    group_size: int = 128
    alpha: float = 0.5
    static_sort: bool = False
    sort_strategy: str = "max"  # sorted-group channel ranking: max |
    #                             mean_std (mean+3·std) | argmax (position);
    #                             README.md:34-37 claims all three, the
    #                             reference code implements only max
    # Storage dtype of the packed per-group weight scales.  The reference
    # stores fp16 scales (fake_quant.py keeps the Q-DQ'd weight in the model
    # dtype); "bfloat16" halves the scale bytes streamed per decode step
    # (scales are 12.5% of the nibble bytes at group_size 64) at <=2^-9
    # relative scale error — second-order next to the int4 quantization
    # error itself.  All kernel math stays f32; only HBM storage narrows.
    scale_dtype: str = "float32"

    def __post_init__(self):
        if self.sort_strategy not in ("max", "mean_std", "argmax"):
            raise ValueError(
                "sort_strategy must be one of ('max', 'mean_std', 'argmax')")
        if self.scale_dtype not in ("float32", "bfloat16"):
            raise ValueError(
                "scale_dtype must be one of ('float32', 'bfloat16')")
        if self.weight_quant not in WEIGHT_QUANT_CHOICES:
            raise ValueError(f"weight_quant must be one of {WEIGHT_QUANT_CHOICES}")
        if self.act_quant not in ACT_QUANT_CHOICES:
            raise ValueError(f"act_quant must be one of {ACT_QUANT_CHOICES}")
        if not 0.0 <= self.salient_prop < 1.0:
            raise ValueError("salient_prop must be in [0, 1)")
        if self.quant_bits < 2:
            raise ValueError("quant_bits must be >= 2")
        if self.group_size < 1:
            raise ValueError("group_size must be >= 1")

    @property
    def q_max(self) -> int:
        return 2 ** (self.quant_bits - 1) - 1

    @property
    def effective_act_bits(self) -> int:
        return self.act_bits if self.act_bits is not None else self.quant_bits

    def num_salient(self, in_features: int) -> int:
        """Number of salient channels: max(1, int(p*C)) when p>0, else 0.

        Matches W4A4Linear.__init__ (fake_quant.py:266-270).
        """
        if self.salient_prop <= 0:
            return 0
        return max(1, int(self.salient_prop * in_features))


def w4a8_group(group_size: int = 128, salient_prop: float = 0.0,
               quantize_bmm_input: bool = False) -> QuantConfig:
    """W4A8: 4-bit group weights, 8-bit activations (north-star config)."""
    return QuantConfig(
        weight_quant="per_group", act_quant="per_group",
        quantize_bmm_input=quantize_bmm_input,
        salient_prop=salient_prop, quant_bits=4, act_bits=8,
        group_size=group_size,
    )


# Named presets mirroring the reference's experiment configs.
W8A8_SMOOTHQUANT = QuantConfig(
    weight_quant="per_channel", act_quant="per_token",
    quantize_bmm_input=True, quant_bits=8, alpha=0.5,
)
W4A4_PER_CHANNEL = QuantConfig(
    weight_quant="per_channel", act_quant="per_token",
    quantize_bmm_input=True, quant_bits=4,
)


def w4a4_group(group_size: int = 128, salient_prop: float = 0.0,
               quantize_bmm_input: bool = False) -> QuantConfig:
    """The run_experiments.py sweep cell config (run_experiments.py:162-169)."""
    return QuantConfig(
        weight_quant="per_group", act_quant="per_group",
        quantize_bmm_input=quantize_bmm_input,
        salient_prop=salient_prop, quant_bits=4, group_size=group_size,
    )
