"""vox_serve_tpu — a TPU-native streaming SpeechLM serving framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of VoxServe
(vox-serve/vox-serve): continuous batching over a paged KV cache, fused
on-device sampling, chunked streaming audio detokenization, deadline-aware
scheduling, incremental text input, DP replicas and LM/detokenizer
disaggregation — designed for TPU (static bucketed shapes, Pallas kernels,
jax.sharding meshes) rather than translated from CUDA.
"""

__version__ = "0.1.0"
