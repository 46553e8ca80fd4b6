"""External known-answer vectors — literal published BLS12-381 constants.

Every other correctness test in this suite bottoms out in the repo's own
exact-int oracle (`kzg_tpu.utils.hostmath`). These tests break that
circularity: the constants below are LITERALS from public specifications —
the ZCash BLS12-381 specification (also used verbatim by zkcrypto/bls12_381
and supranational/blst test suites) and the IETF pairing-friendly-curves
draft — typed in directly, never computed by repo code. A self-consistent
sign- or endianness-convention bug anywhere in the stack fails here.

Reference analog: the Rust reference trusts blst's audited constants through
FFI (/root/reference/src/curves.rs:355-371, Cargo.toml:10); this file is the
equivalent external trust anchor for the TPU stack. Runs in the fast gate.
"""

import pytest

from kzg_tpu import G1Point, G2Point, Scalar
from kzg_tpu.utils import hostmath as hm
from kzg_tpu.ops import codec

# --- Published field/curve parameters (IETF pairing-friendly-curves, ZCash spec)

P_HEX = (
    "1a0111ea397fe69a4b1ba7b6434bacd764774b84f38512bf"
    "6730d2a0f6b0f6241eabfffeb153ffffb9feffffffffaaab"
)
R_HEX = "73eda753299d7d483339d80809a1d80553bda402fffe5bfeffffffff00000001"
BLS_X = -0xD201000000010000  # the BLS12-381 curve parameter z

# Generator affine coordinates (decimal, as published in the ZCash spec):
G1_X = 3685416753713387016781088315183077757961620795782546409894578378688607592378376318836054947676345821548104185464507
G1_Y = 1339506544944476473020471379941921221584933875938349620426543736416511423956333506472724655353366534992391756441569
G2_X_C0 = 352701069587466618187139116011060144890029952792775240219908644239793785735715026873347600343865175952761926303160
G2_X_C1 = 3059144344244213709971259814753781636986470325476647558659373206291635324768958432433509563104347017837885763365758
G2_Y_C0 = 1985150602287291935568054521177171638300868978215655730859378665066344726373823718423869104263333984641494340347905
G2_Y_C1 = 927553665492332455747201965776037880757740193453592970025027978793976877002675564980949289727957565575433344219582

# ZCash-convention compressed encodings (zkcrypto/bls12_381 test vectors):
G1_GEN_COMPRESSED = bytes.fromhex(
    "97f1d3a73197d7942695638c4fa9ac0fc3688c4f9774b905"
    "a14e3a3f171bac586c55e83ff97a1aeffb3af00adb22c6bb"
)
G1_NEG_GEN_COMPRESSED = bytes.fromhex(
    "b7f1d3a73197d7942695638c4fa9ac0fc3688c4f9774b905"
    "a14e3a3f171bac586c55e83ff97a1aeffb3af00adb22c6bb"
)
G1_INF_COMPRESSED = bytes.fromhex("c0" + "00" * 47)
G2_GEN_COMPRESSED = bytes.fromhex(
    "93e02b6052719f607dacd3a088274f65596bd0d09920b61a"
    "b5da61bbdc7f5049334cf11213945d57e5ac7d055d042b7e"
    "024aa2b2f08f0a91260805272dc51051c6e47ad4fa403b02"
    "b4510b647ae3d1770bac0326a805bbefd48056c8c121bdb8"
)
G2_INF_COMPRESSED = bytes.fromhex("c0" + "00" * 95)


# --- Parameter pins (pure int comparisons, no repo math at all) ---------------


def test_field_moduli_literals():
    assert hm.P == int(P_HEX, 16)
    assert hm.R == int(R_HEX, 16)


def test_parameters_derive_from_bls_x():
    """p and r follow from the BLS12 family polynomials at x = -0xd201000000010000
    (IETF pairing-friendly-curves §4.2.1) — pure python-int arithmetic."""
    x = BLS_X
    r = x**4 - x**2 + 1
    p = (x - 1) ** 2 * r // 3 + x
    assert r == int(R_HEX, 16)
    assert p == int(P_HEX, 16)


def test_generators_on_curve_pure_int():
    """y^2 = x^3 + 4 over Fp, and y^2 = x^3 + 4(u+1) over Fp2 = Fp[u]/(u^2+1),
    checked with nothing but python ints on the published coordinates."""
    p = int(P_HEX, 16)
    assert G1_Y * G1_Y % p == (G1_X**3 + 4) % p
    # Fp2 arithmetic inline: (a0 + a1 u)^2 = a0^2 - a1^2 + 2 a0 a1 u
    x0, x1, y0, y1 = G2_X_C0, G2_X_C1, G2_Y_C0, G2_Y_C1
    y2 = ((y0 * y0 - y1 * y1) % p, 2 * y0 * y1 % p)
    x2 = ((x0 * x0 - x1 * x1) % p, 2 * x0 * x1 % p)
    x3 = ((x2[0] * x0 - x2[1] * x1) % p, (x2[0] * x1 + x2[1] * x0) % p)
    rhs = ((x3[0] + 4) % p, (x3[1] + 4) % p)  # b = 4(u + 1)
    assert y2 == rhs


# --- Oracle vs literals --------------------------------------------------------


def test_oracle_generator_coordinates():
    assert hm.G1_GEN == (G1_X, G1_Y)
    assert hm.G2_GEN == ((G2_X_C0, G2_X_C1), (G2_Y_C0, G2_Y_C1))


def test_oracle_compression_literals():
    assert hm.g1_compress(hm.G1_GEN) == G1_GEN_COMPRESSED
    assert hm.g2_compress(hm.G2_GEN) == G2_GEN_COMPRESSED
    assert hm.g1_compress(None) == G1_INF_COMPRESSED
    assert hm.g2_compress(None) == G2_INF_COMPRESSED
    assert hm.g1_compress((G1_X, hm.P - G1_Y)) == G1_NEG_GEN_COMPRESSED


def test_oracle_decompression_literals():
    assert hm.g1_decompress(G1_GEN_COMPRESSED) == (G1_X, G1_Y)
    assert hm.g1_decompress(G1_NEG_GEN_COMPRESSED) == (G1_X, hm.P - G1_Y)
    assert hm.g1_decompress(G1_INF_COMPRESSED) is None
    assert hm.g2_decompress(G2_GEN_COMPRESSED) == hm.G2_GEN
    assert hm.g2_decompress(G2_INF_COMPRESSED) is None


# --- Device stack vs literals --------------------------------------------------


def test_device_g1_generator_serde():
    g = G1Point.from_i128(1)
    assert g.compress() == G1_GEN_COMPRESSED
    assert g.affine() == (G1_X, G1_Y)
    assert G1Point.from_i128(-1).compress() == G1_NEG_GEN_COMPRESSED
    assert G1Point.from_i128(0).compress() == G1_INF_COMPRESSED
    assert G1Point.decompress(G1_GEN_COMPRESSED) == g


def test_device_g2_generator_serde():
    g = G2Point.from_i128(1)
    assert g.compress() == G2_GEN_COMPRESSED
    assert g.affine() == ((G2_X_C0, G2_X_C1), (G2_Y_C0, G2_Y_C1))
    assert G2Point.from_i128(0).compress() == G2_INF_COMPRESSED
    assert G2Point.decompress(G2_GEN_COMPRESSED) == g


def test_device_batch_codec_literals():
    """The device bulk decompressors (SRS-load path) against the literals."""
    pts = codec.g1_decompress_batch(
        [G1_GEN_COMPRESSED, G1_NEG_GEN_COMPRESSED, G1_INF_COMPRESSED],
        subgroup_check=True,
    )
    from kzg_tpu.ops import curve as cv

    aff = cv.g1_from_device(pts)
    assert aff == [(G1_X, G1_Y), (G1_X, hm.P - G1_Y), None]
    pts2 = codec.g2_decompress_batch([G2_GEN_COMPRESSED], subgroup_check=True)
    aff2 = cv.g2_from_device(pts2)
    assert aff2 == [((G2_X_C0, G2_X_C1), (G2_Y_C0, G2_Y_C1))]


def test_device_scalar_field_semantics():
    """Fr wraps at the published r: device Scalar arithmetic vs literal r,
    including the reference's r - |v| negative mapping (src/scalar.rs:36-47)."""
    r = int(R_HEX, 16)
    assert Scalar.from_i128(-1) == Scalar.from_le_bytes((r - 1).to_bytes(32, "little"))
    # (r - 1) + 1 == 0 and (r - 1) * (r - 1) == 1 mod r
    minus_one = Scalar.from_i128(-1)
    assert minus_one.add(Scalar.from_i128(1)).is_zero()
    assert minus_one.mul(minus_one) == Scalar.from_i128(1)


def test_device_g1_order():
    """[r] G == infinity on the device stack, with r taken from the literal."""
    r = int(R_HEX, 16)
    g = G1Point.from_i128(1)
    assert g.mult(Scalar.from_le_bytes((r - 1).to_bytes(32, "little"))).add(g).is_infinity()
