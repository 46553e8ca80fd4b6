"""Artifact persistence — byte-compatible with the reference's JSON files
(./artifacts/{setup,commitment,evaluation}.json; src/main.rs:101-104,310-320).

Schemas (serde_json compact encoding, field order preserved):
  setup.json       = [{"g1": [48 u8], "g2": [96 u8]}, ...]
  commitment.json  = {"polynomial": {"coefficients": [[32 u8 LE] ...]},
                      "commitment": [48 u8]}
  evaluation.json  = {"evaluation": {"point": [32 u8], "result": [32 u8]},
                      "proof": [48 u8]}
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from .curves import G1Point
from .polynomial import Polynomial, Evaluation
from .trusted_setup import SetupArtifact
from .errors import CliError

ARTIFACTS_FOLDER_PATH = "./artifacts"
SETUP_ARTIFACTS_PATH = "./artifacts/setup.json"
COMMITMENT_ARTIFACTS_PATH = "./artifacts/commitment.json"
EVALUATION_ARTIFACTS_PATH = "./artifacts/evaluation.json"
# TPU-native extension (batch opening): a JSON list of evaluation-artifact
# objects, each entry byte-identical in layout to evaluation.json's object.
EVALUATIONS_BATCH_PATH = "./artifacts/evaluations.json"


def _dumps(obj) -> str:
    """serde_json-compatible compact encoding (no whitespace)."""
    return json.dumps(obj, separators=(",", ":"))


def write_file(path: str, content: str):
    """Delete-then-recreate write (reference src/main.rs:117-120,178-182)."""
    folder = os.path.dirname(path) or "."
    if not os.path.exists(folder):
        os.makedirs(folder, exist_ok=True)
    if os.path.exists(path):
        os.remove(path)
    with open(path, "w") as f:
        f.write(content)


@dataclass
class CommitmentArtifact:
    polynomial: Polynomial
    commitment: G1Point

    def to_json(self) -> dict:
        return {"polynomial": self.polynomial.to_json(), "commitment": self.commitment.to_json()}

    @classmethod
    def from_json(cls, data: dict) -> "CommitmentArtifact":
        return cls(
            polynomial=Polynomial.from_json(data["polynomial"]),
            commitment=G1Point.from_json(data["commitment"]),
        )


@dataclass
class EvaluationArtifact:
    evaluation: Evaluation
    proof: G1Point

    def to_json(self) -> dict:
        return {"evaluation": self.evaluation.to_json(), "proof": self.proof.to_json()}

    @classmethod
    def from_json(cls, data: dict) -> "EvaluationArtifact":
        return cls(
            evaluation=Evaluation.from_json(data["evaluation"]),
            proof=G1Point.from_json(data["proof"]),
        )


def save_setup(artifacts: list[SetupArtifact], path: str = SETUP_ARTIFACTS_PATH):
    write_file(path, _dumps([a.to_json() for a in artifacts]))


_BULK_LOAD_MIN = 64  # below this the per-point host path is cheaper than a launch


def load_setup(path: str = SETUP_ARTIFACTS_PATH) -> list[SetupArtifact]:
    if not os.path.exists(path):
        raise CliError("Trusted setup artifacts have not been found, generate them beforehand.")
    with open(path) as f:
        raw = json.load(f)
    if len(raw) < _BULK_LOAD_MIN:
        return [SetupArtifact.from_json(a) for a in raw]
    # Bulk path: device-batched G1/G2 decompression (per-point host sqrt takes
    # minutes at 2^20 scale). Same validation as the per-point path, including
    # the r-order subgroup checks.
    from .curves import G1Point, G2Point
    from .errors import SerializationError
    from .ops import codec, curve as cv

    for a in raw:
        for key, ln in (("g1", 48), ("g2", 96)):
            d = a[key]
            if not isinstance(d, list) or len(d) != ln:
                raise SerializationError(
                    f"Invalid byte array, expected length {ln}, got {len(d) if isinstance(d, list) else type(d)}"
                )
    g1_jac = codec.g1_decompress_batch([bytes(a["g1"]) for a in raw], subgroup_check=True)
    g2_jac = codec.g2_decompress_batch([bytes(a["g2"]) for a in raw], subgroup_check=True)
    g1_aff = cv.g1_from_device(g1_jac)
    g2_aff = cv.g2_from_device(g2_jac)
    return [
        SetupArtifact(g1=G1Point.from_affine(p1), g2=G2Point.from_affine(p2))
        for p1, p2 in zip(g1_aff, g2_aff)
    ]


def save_commitment(artifact: CommitmentArtifact, path: str = COMMITMENT_ARTIFACTS_PATH):
    write_file(path, _dumps(artifact.to_json()))


def load_commitment(path: str = COMMITMENT_ARTIFACTS_PATH) -> CommitmentArtifact:
    if not os.path.exists(path):
        raise CliError("Commitment artifact has not been found, generate it beforehand.")
    with open(path) as f:
        return CommitmentArtifact.from_json(json.load(f))


def save_evaluation(artifact: EvaluationArtifact, path: str = EVALUATION_ARTIFACTS_PATH):
    write_file(path, _dumps(artifact.to_json()))


def load_evaluation(path: str = EVALUATION_ARTIFACTS_PATH) -> EvaluationArtifact:
    if not os.path.exists(path):
        raise CliError("Evaluation artifact has not been found, generate it beforehand.")
    with open(path) as f:
        return EvaluationArtifact.from_json(json.load(f))


def save_evaluations_batch(artifacts: list[EvaluationArtifact],
                           path: str = EVALUATIONS_BATCH_PATH):
    write_file(path, _dumps([a.to_json() for a in artifacts]))


def load_evaluations_batch(path: str = EVALUATIONS_BATCH_PATH) -> list[EvaluationArtifact]:
    if not os.path.exists(path):
        raise CliError("Evaluation artifacts have not been found, generate them beforehand.")
    with open(path) as f:
        return [EvaluationArtifact.from_json(a) for a in json.load(f)]
