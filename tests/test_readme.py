"""Execute the README's Python examples verbatim (the reference runs its doc
examples under `cargo test`, /root/reference/src/polynomial.rs:21-27,45-54 —
this is the equivalent gate for the README snippets).

The code blocks are extracted from README.md at test time, so the README can
never silently rot: if an example stops running, this file fails.
"""

import os
import re

import pytest

README = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "README.md")


def _python_blocks():
    text = open(README, encoding="utf-8").read()
    return re.findall(r"```python\n(.*?)```", text, flags=re.S)


def test_readme_has_python_blocks():
    assert len(_python_blocks()) >= 2


@pytest.mark.slow
def test_readme_library_example():
    """First README block: the reference-mirroring library API round-trip."""
    blocks = _python_blocks()
    ns = {"secret_32_bytes": bytes(range(32))}
    exec(compile(blocks[0], "README.md[0]", "exec"), ns)
    assert ns["evaluation"].verify_proof(ns["proof"], ns["commitment"], ns["setup"])


@pytest.mark.slow
def test_readme_batch_example(tmp_path, monkeypatch):
    """Second README block: the batch serving APIs. The snippet assumes a
    ./artifacts/setup.json plus `p`, `points`, `commitments` in scope — the
    harness provides them the same way the CLI workflow would."""
    from kzg_tpu import Polynomial, Scalar
    from kzg_tpu.artifacts import save_setup
    from kzg_tpu.trusted_setup import SetupArtifactsGenerator

    monkeypatch.chdir(tmp_path)
    setup = SetupArtifactsGenerator(bytes(range(1, 33))).take(6)
    save_setup(setup, "artifacts/setup.json")

    p = Polynomial.from_ints([2, 1, 3])
    points = [Scalar.from_i128(v) for v in (5, 9)]
    commitment = p.commit(setup)
    ns = {
        "p": p,
        "points": points,
        "commitments": [commitment] * len(points),
        "k": 3,
    }
    blocks = _python_blocks()
    exec(compile(blocks[1], "README.md[1]", "exec"), ns)
    assert ns["oks"] == [True] * len(points)
