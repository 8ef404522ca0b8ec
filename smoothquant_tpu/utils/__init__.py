from smoothquant_tpu.utils.benchtools import time_steps
