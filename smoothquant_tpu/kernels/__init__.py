from smoothquant_tpu.kernels.pack import PackedLinear, PackedMeta, pack_linear
from smoothquant_tpu.kernels.quant_matmul import dual_path_matmul
from smoothquant_tpu.kernels.real_linear import real_quant_linear
