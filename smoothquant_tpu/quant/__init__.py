from smoothquant_tpu.quant.config import (
    QuantConfig,
    W4A4_PER_CHANNEL,
    W8A8_SMOOTHQUANT,
    w4a4_group,
    w4a8_group,
)
from smoothquant_tpu.quant.core import (
    quantize_activation_per_group_absmax,
    quantize_activation_per_group_absmax_sort,
    quantize_activation_per_tensor_absmax,
    quantize_activation_per_token_absmax,
    quantize_weight_per_channel_absmax,
    quantize_weight_per_group_absmax,
    quantize_weight_per_group_absmax_sort,
    quantize_weight_per_tensor_absmax,
)
from smoothquant_tpu.quant.linear import linear, quant_linear, quantize_linear_params
from smoothquant_tpu.quant.smooth import (
    compute_smoothing_scales,
    smooth_model,
    smooth_norm_linears,
)
