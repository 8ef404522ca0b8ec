from smoothquant_tpu.eval.model_size import (
    bits_to_mib,
    count_params,
    get_model_size,
    get_model_size_bits,
)
from smoothquant_tpu.eval.ppl import Evaluator, window_nll
