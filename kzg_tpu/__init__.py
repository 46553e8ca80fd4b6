"""kzg_tpu — a TPU-native KZG polynomial-commitment framework.

Capabilities mirror VGLoic/kzg-poly-commit-exploration (Rust + blst, CPU):
trusted setup, polynomial commitment, evaluation + Kate proof, pairing
verification, byte-compatible JSON artifacts and a 4-command CLI — but the
compute path is JAX/XLA on TPU: limb-vectorized Montgomery field kernels,
batched Jacobian curve ops, MSM, parallel-prefix polynomial kernels, and an
on-device optimal ate pairing.
"""

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
