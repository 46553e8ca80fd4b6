"""Native host codec runtime (native/kzg_host.cpp via utils.native) vs the
exact-arithmetic hostmath oracle.

The reference's host serde layer is native code (blst FFI,
src/curves.rs:99-183); these tests pin the rebuilt native runtime to the same
byte formats and validation rules."""

import numpy as np
import pytest

from kzg_tpu.ops import limbs as lb
from kzg_tpu.utils import hostmath as hm, native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def _limb_arrays(pts):
    xl = lb.ints_to_limbs([p[0] if p else 0 for p in pts], 24)
    yl = lb.ints_to_limbs([p[1] if p else 0 for p in pts], 24)
    inf = np.array([p is None for p in pts], dtype=np.uint8)
    return xl, yl, inf


def test_compress_matches_hostmath(rng):
    pts = [hm.g1_mul(hm.G1_GEN, rng.randrange(1, hm.R)) for _ in range(9)] + [None]
    xl, yl, inf = _limb_arrays(pts)
    blob = native.g1_compress_batch(xl, yl, inf)
    assert blob == b"".join(hm.g1_compress(p) for p in pts)


def test_decompress_round_trip(rng):
    pts = [hm.g1_mul(hm.G1_GEN, rng.randrange(1, hm.R)) for _ in range(7)] + [None]
    xl, yl, inf = _limb_arrays(pts)
    blob = native.g1_compress_batch(xl, yl, inf)
    x2, y2, inf2 = native.g1_decompress_batch(blob, len(pts))
    assert (x2 == xl).all() and (y2 == yl).all()
    assert list(inf2) == [p is None for p in pts]
    ok = native.g1_on_curve_batch(x2, y2, inf2.astype(np.uint8))
    assert ok.all()


def test_parse_matches_decompress(rng):
    pts = [hm.g1_mul(hm.G1_GEN, rng.randrange(1, hm.R)) for _ in range(5)]
    xl, yl, inf = _limb_arrays(pts)
    blob = native.g1_compress_batch(xl, yl, inf)
    xp, sign, infp = native.g1_parse_batch(blob, len(pts))
    assert (xp == xl).all() and not infp.any()
    # sign flag == lexicographically-larger y
    for i, p in enumerate(pts):
        assert bool(sign[i]) == (p[1] > (hm.P - 1) // 2)


def test_malformed_rejection():
    g = hm.G1_GEN
    xl, yl, inf = _limb_arrays([g])
    blob = bytearray(native.g1_compress_batch(xl, yl, inf))
    # x >= p: force the top field bits high (flags keep compressed bit)
    bad = bytes([blob[0] | 0x1F]) + b"\xff" * 47
    with pytest.raises(ValueError, match="index 0"):
        native.g1_decompress_batch(bad, 1)
    # missing compressed flag
    bad2 = bytes([blob[0] & 0x7F]) + bytes(blob[1:])
    with pytest.raises(ValueError):
        native.g1_parse_batch(bad2, 1)
    # malformed infinity (sign bit set)
    bad3 = bytes([0x80 | 0x40 | 0x20]) + b"\x00" * 47
    with pytest.raises(ValueError):
        native.g1_parse_batch(bad3, 1)


def test_g2_parse_matches_hostmath(rng):
    ks = [rng.randrange(1, hm.R) for _ in range(6)]
    pts = [hm.g2_mul(hm.G2_GEN, k) for k in ks] + [None]
    blobs = [hm.g2_compress(p) for p in pts]
    x, sign, inf = native.g2_parse_batch(b"".join(blobs), len(pts))
    assert list(inf) == [p is None for p in pts]
    for i, p in enumerate(pts):
        if p is None:
            assert not x[:, :, i].any() and not sign[i]
            continue
        x0 = sum(int(v) << (16 * k) for k, v in enumerate(x[:, 0, i]))
        x1 = sum(int(v) << (16 * k) for k, v in enumerate(x[:, 1, i]))
        assert (x0, x1) == p[0]
        assert bool(sign[i]) == bool(blobs[i][0] & 0x20)
    # malformed: x1 >= p
    bad = bytes([0x80 | 0x1F]) + b"\xff" * 95
    with pytest.raises(ValueError, match="index 0"):
        native.g2_parse_batch(bad, 1)
    # malformed infinity (nonzero payload)
    bad2 = bytes([0x80 | 0x40]) + b"\x00" * 47 + b"\x01" + b"\x00" * 47
    with pytest.raises(ValueError):
        native.g2_parse_batch(bad2, 1)


def test_fr_codec_round_trip(rng):
    vals = [0, 1, hm.R - 1] + [rng.randrange(hm.R) for _ in range(13)]
    blob = b"".join(v.to_bytes(32, "little") for v in vals)
    limbs = native.fr_from_le_bytes_batch(blob, len(vals))
    assert limbs.tolist() == lb.ints_to_limbs(vals, 16).tolist()
    assert native.fr_to_le_bytes_batch(limbs) == blob
