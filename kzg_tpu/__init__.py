"""tpu-kzg: a TPU-native KZG polynomial-commitment framework (JAX/XLA/Pallas).

Functionally equivalent to the Rust CLI/library VGLoic/kzg-poly-commit-exploration,
designed TPU-first: limb-decomposed BLS12-381 field arithmetic on the VPU, batched
Jacobian curve kernels, MSM/NTT pipelines, and shard_map-sharded multi-chip paths.
"""

__version__ = "0.1.0"
