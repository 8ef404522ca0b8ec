from smoothquant_tpu.serve.batching import ContinuousBatcher, Request
from smoothquant_tpu.serve.cluster import ClusterFrontend, HostReplica
from smoothquant_tpu.serve.generate import GenerationConfig, Generator, sample_token
