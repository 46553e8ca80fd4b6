"""kzg_tpu — a TPU-native KZG polynomial-commitment framework.

Capabilities mirror VGLoic/kzg-poly-commit-exploration (Rust + blst, CPU):
trusted setup, polynomial commitment, evaluation + Kate proof, pairing
verification, byte-compatible JSON artifacts and a 4-command CLI — but the
compute path is JAX/XLA on TPU: limb-vectorized Montgomery field kernels,
batched Jacobian curve ops, MSM, parallel-prefix polynomial kernels, and an
on-device optimal ate pairing.
"""

import os as _os


def _setup_compilation_cache():
    """Persistent XLA compile cache: kernel programs (MSM ladders, the pairing)
    compile once per machine, not once per process — critical for CLI UX on
    remote TPU backends where a cold pairing compile takes minutes."""
    try:
        import jax

        cache_dir = _os.environ.get(
            "KZG_TPU_COMPILE_CACHE",
            _os.path.expanduser("~/.cache/kzg_tpu_jax_cache"),
        )
        if cache_dir and not jax.config.jax_compilation_cache_dir:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_setup_compilation_cache()

from .scalar import Scalar
from .curves import G1Point, G2Point, bilinear_map
from .polynomial import Polynomial, Evaluation
from .trusted_setup import SetupArtifact, SetupArtifactsGenerator, generate_setup
from .errors import KzgError, SerializationError, ProtocolError, CliError

__version__ = "0.1.0"

__all__ = [
    "Scalar",
    "G1Point",
    "G2Point",
    "bilinear_map",
    "Polynomial",
    "Evaluation",
    "SetupArtifact",
    "SetupArtifactsGenerator",
    "generate_setup",
    "KzgError",
    "SerializationError",
    "ProtocolError",
    "CliError",
    "__version__",
]
