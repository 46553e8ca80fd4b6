"""Generate the golden artifact fixtures with PURE python-int arithmetic
(utils.hostmath only — no jax, no device code), so artifact-byte parity tests
do not depend on the device stack they are pinning down.

Workload mirrors the reference benches' fixed shapes: secret BE bytes 0..32
(benches/polynomial_commitment.rs:18-19), coefficients 5^i + 10
(benches/polynomial_commitment.rs:32), degree 9 (src/main.rs:106), x = 42.

Run from the repo root: python tests/golden/make_golden.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from kzg_tpu.utils import hostmath as hm  # noqa: E402

OUT = os.path.dirname(os.path.abspath(__file__))

SECRET_BE = bytes(range(32))
COEFFS = [5**i + 10 for i in range(10)]
X_EVAL = 42


def dumps(obj):
    return json.dumps(obj, separators=(",", ":"))


def main():
    s = int.from_bytes(SECRET_BE, "big") % hm.R

    # setup.json: [{g1: s^k G1, g2: s^k G2} for k in 0..9]
    setup = []
    for k in range(10):
        pk = pow(s, k, hm.R)
        setup.append({
            "g1": list(hm.g1_compress(hm.g1_mul(hm.G1_GEN, pk))),
            "g2": list(hm.g2_compress(hm.g2_mul(hm.G2_GEN, pk))),
        })
    with open(os.path.join(OUT, "setup.json"), "w") as f:
        f.write(dumps(setup))

    # commitment.json: C = (sum a_i s^i) G1
    coeffs = [c % hm.R for c in COEFFS]
    c_scalar = sum(a * pow(s, i, hm.R) for i, a in enumerate(coeffs)) % hm.R
    commitment = {
        "polynomial": {
            "coefficients": [list(a.to_bytes(32, "little")) for a in coeffs]
        },
        "commitment": list(hm.g1_compress(hm.g1_mul(hm.G1_GEN, c_scalar))),
    }
    with open(os.path.join(OUT, "commitment.json"), "w") as f:
        f.write(dumps(commitment))

    # evaluation.json: y = P(42), quotient by synthetic division, pi = Q(s) G1
    x = X_EVAL % hm.R
    y = sum(a * pow(x, i, hm.R) for i, a in enumerate(coeffs)) % hm.R
    # q_i = p_{i+1} + x * q_{i+1}, top down
    q = [0] * (len(coeffs) - 1)
    acc = coeffs[-1]
    for i in range(len(coeffs) - 2, -1, -1):
        q[i] = acc
        acc = (coeffs[i] + x * acc) % hm.R
    assert acc == y
    q_scalar = sum(a * pow(s, i, hm.R) for i, a in enumerate(q)) % hm.R
    evaluation = {
        "evaluation": {
            "point": list(x.to_bytes(32, "little")),
            "result": list(y.to_bytes(32, "little")),
        },
        "proof": list(hm.g1_compress(hm.g1_mul(hm.G1_GEN, q_scalar))),
    }
    with open(os.path.join(OUT, "evaluation.json"), "w") as f:
        f.write(dumps(evaluation))
    print("golden fixtures written to", OUT)


if __name__ == "__main__":
    main()
