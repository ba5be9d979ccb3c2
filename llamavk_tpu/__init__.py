"""llamavk_tpu — a TPU-native quantized LLM inference engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of nhaehnle/llama.vk
(an early llama.cpp fork with a fully-on-GPU Vulkan decode engine): ggml-style
Q4_0/Q4_1 4-bit block-quantized weights kept packed in HBM with dequantization
fused into Pallas matmul kernels, RMSNorm/RoPE/attention/SiLU-FFN under one jit,
an on-device KV cache, on-device top-k/top-p sampling, and tensor-parallel
sharding over an ICI mesh via shard_map.

Subpackages:
  formats   — GGML/GGMF/GGJT checkpoint IO, Q4_0/Q4_1 codecs, device repack
  models    — LLaMA model configs and the forward pass
  ops       — Pallas kernels + jnp reference implementations
  parallel  — mesh construction and tensor-parallel partition specs
  runtime   — KV cache, decode engine, sampling, batching
  cli       — command-line tools (generate, quantize, perplexity, ...)
"""

__version__ = "0.1.0"
