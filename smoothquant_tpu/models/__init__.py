from smoothquant_tpu.models import llama, opt
from smoothquant_tpu.models.common import ForwardContext, KVCache
from smoothquant_tpu.models.registry import get_arch, quantize_model, register_arch, smooth_lm
