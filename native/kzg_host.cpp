// kzg_host — native host-side runtime for the TPU KZG framework.
//
// The reference delegates its host-side point serde (48-byte ZCash-flag
// compression, field validation, byte codecs) to the native blst library
// (reference src/curves.rs:99-183 via blst_p1_compress/uncompress). Here the
// equivalent host runtime is this self-contained C++ library: batched G1
// compressed-point parsing/validation, full decompression (Fp square root),
// compression from limb arrays, and Fr byte codecs — operating directly on
// the framework's (24, n)/(16, n) uint32 limb layouts so bulk SRS IO never
// round-trips through Python bignums. The TPU remains the default compute
// path for bulk decompression square roots (ops/codec.py); this library is
// the fast host parser underneath it, the CPU fallback, and an independent
// second oracle for tests.
//
// Everything is written from scratch: 6x64-limb Fp arithmetic with Montgomery
// multiplication (CIOS), sqrt via x^((p+1)/4) (p = 3 mod 4), and the ZCash
// BLS12-381 compressed-point convention.
//
// Build: make -C native   (g++ -O3 -shared -fPIC kzg_host.cpp -o libkzg_host.so)

#include <cstdint>
#include <cstring>
#include <cstddef>

typedef unsigned __int128 u128;
typedef uint64_t u64;
typedef uint32_t u32;
typedef uint8_t u8;

namespace {

// ---------------------------------------------------------------------------
// Fp: the BLS12-381 base field, 381 bits, 6x64 limbs, little-endian limb order
// ---------------------------------------------------------------------------

struct fp { u64 v[6]; };

// p = 0x1a0111ea397fe69a4b1ba7b6434bacd764774b84f38512bf6730d2a0f6b0f6241eabfffeb153ffffb9feffffffffaaab
static const fp P = {{0xb9feffffffffaaabULL, 0x1eabfffeb153ffffULL, 0x6730d2a0f6b0f624ULL,
                      0x64774b84f38512bfULL, 0x4b1ba7b6434bacd7ULL, 0x1a0111ea397fe69aULL}};
// -p^-1 mod 2^64
static const u64 P_INV = 0x89f3fffcfffcfffdULL;
// R^2 mod p (R = 2^384), for to-Montgomery conversion
static const fp R2 = {{0xf4df1f341c341746ULL, 0x0a76e6a609d104f1ULL, 0x8de5476c4c95b6d5ULL,
                       0x67eb88a9939d83c0ULL, 0x9a793e85b519952dULL, 0x11988fe592cae3aaULL}};
// 4 in Montgomery form (the curve constant b), computed at init
static fp B_MONT;
// 1 in Montgomery form
static fp ONE_MONT;

static inline int fp_cmp(const fp &a, const fp &b) {
  for (int i = 5; i >= 0; --i) {
    if (a.v[i] < b.v[i]) return -1;
    if (a.v[i] > b.v[i]) return 1;
  }
  return 0;
}

static inline bool fp_is_zero(const fp &a) {
  u64 z = 0;
  for (int i = 0; i < 6; ++i) z |= a.v[i];
  return z == 0;
}

static inline void fp_sub_p_if_ge(fp &a) {
  if (fp_cmp(a, P) >= 0) {
    u128 borrow = 0;
    for (int i = 0; i < 6; ++i) {
      u128 d = (u128)a.v[i] - P.v[i] - borrow;
      a.v[i] = (u64)d;
      borrow = (d >> 64) & 1;
    }
  }
}

static inline fp fp_add(const fp &a, const fp &b) {
  fp r;
  u128 carry = 0;
  for (int i = 0; i < 6; ++i) {
    u128 s = (u128)a.v[i] + b.v[i] + carry;
    r.v[i] = (u64)s;
    carry = s >> 64;
  }
  // carry can only be set if the sum >= 2^384 > 2p; a,b < p so sum < 2p < 2^384
  fp_sub_p_if_ge(r);
  return r;
}

static inline fp fp_sub(const fp &a, const fp &b) {
  fp r;
  u128 borrow = 0;
  for (int i = 0; i < 6; ++i) {
    u128 d = (u128)a.v[i] - b.v[i] - borrow;
    r.v[i] = (u64)d;
    borrow = (d >> 64) & 1;
  }
  if (borrow) {
    u128 carry = 0;
    for (int i = 0; i < 6; ++i) {
      u128 s = (u128)r.v[i] + P.v[i] + carry;
      r.v[i] = (u64)s;
      carry = s >> 64;
    }
  }
  return r;
}

static inline fp fp_neg(const fp &a) {
  if (fp_is_zero(a)) return a;
  fp r;
  u128 borrow = 0;
  for (int i = 0; i < 6; ++i) {
    u128 d = (u128)P.v[i] - a.v[i] - borrow;
    r.v[i] = (u64)d;
    borrow = (d >> 64) & 1;
  }
  return r;
}

// Montgomery multiplication, CIOS method: r = a*b*R^-1 mod p
static fp fp_mul(const fp &a, const fp &b) {
  u64 t[8] = {0};
  for (int i = 0; i < 6; ++i) {
    u128 carry = 0;
    for (int j = 0; j < 6; ++j) {
      u128 s = (u128)t[j] + (u128)a.v[i] * b.v[j] + carry;
      t[j] = (u64)s;
      carry = s >> 64;
    }
    u128 s = (u128)t[6] + carry;
    t[6] = (u64)s;
    t[7] = (u64)(s >> 64);

    u64 m = t[0] * P_INV;
    carry = ((u128)t[0] + (u128)m * P.v[0]) >> 64;
    for (int j = 1; j < 6; ++j) {
      u128 s2 = (u128)t[j] + (u128)m * P.v[j] + carry;
      t[j - 1] = (u64)s2;
      carry = s2 >> 64;
    }
    s = (u128)t[6] + carry;
    t[5] = (u64)s;
    t[6] = t[7] + (u64)(s >> 64);
    t[7] = 0;
  }
  fp r;
  memcpy(r.v, t, sizeof(r.v));
  // t[6] holds a possible overflow bit; a,b < p keeps the result < 2p
  if (t[6]) {
    u128 borrow = 0;
    for (int i = 0; i < 6; ++i) {
      u128 d = (u128)r.v[i] - P.v[i] - borrow;
      r.v[i] = (u64)d;
      borrow = (d >> 64) & 1;
    }
  } else {
    fp_sub_p_if_ge(r);
  }
  return r;
}

static inline fp fp_sqr(const fp &a) { return fp_mul(a, a); }

static fp fp_to_mont(const fp &a) { return fp_mul(a, R2); }

static fp fp_from_mont(const fp &a) {
  fp one = {{1, 0, 0, 0, 0, 0}};
  return fp_mul(a, one);
}

// a^e for a big-endian byte exponent (Montgomery in/out)
static fp fp_pow_be(const fp &a, const u8 *e, size_t elen) {
  fp r = ONE_MONT;
  for (size_t i = 0; i < elen; ++i) {
    for (int bit = 7; bit >= 0; --bit) {
      r = fp_sqr(r);
      if ((e[i] >> bit) & 1) r = fp_mul(r, a);
    }
  }
  return r;
}

// (p+1)/4 as 48 big-endian bytes (p = 3 mod 4, so x^((p+1)/4) is a sqrt
// candidate; verify by squaring)
static u8 SQRT_EXP[48];

static void init_consts() {
  // (p+1)/4: p+1 = ...aaab + 1 = ...aaac; shift right by 2
  fp pp = P;
  u128 carry = 1;
  for (int i = 0; i < 6 && carry; ++i) {
    u128 s = (u128)pp.v[i] + carry;
    pp.v[i] = (u64)s;
    carry = s >> 64;
  }
  // shift right 2
  for (int i = 0; i < 6; ++i) {
    u64 lo = pp.v[i] >> 2;
    u64 hi = (i < 5) ? (pp.v[i + 1] & 3) : 0;
    pp.v[i] = lo | (hi << 62);
  }
  for (int i = 0; i < 48; ++i)
    SQRT_EXP[i] = (u8)(pp.v[5 - i / 8] >> (56 - 8 * (i % 8)));
  fp four = {{4, 0, 0, 0, 0, 0}};
  B_MONT = fp_to_mont(four);
  fp one = {{1, 0, 0, 0, 0, 0}};
  ONE_MONT = fp_to_mont(one);
}

static bool consts_ready = false;
static void ensure_consts() {
  if (!consts_ready) {
    init_consts();
    consts_ready = true;
  }
}

// sqrt in Fp (Montgomery in/out); returns false if a is a non-residue
static bool fp_sqrt(const fp &a, fp &out) {
  out = fp_pow_be(a, SQRT_EXP, 48);
  fp chk = fp_sqr(out);
  return fp_cmp(fp_from_mont(chk), fp_from_mont(a)) == 0;
}

// -- byte / limb codecs ------------------------------------------------------

static bool fp_from_be(const u8 *in, fp &out) {  // 48 BE bytes -> std form; false if >= p
  for (int i = 0; i < 6; ++i) {
    u64 limb = 0;
    for (int j = 0; j < 8; ++j) limb = (limb << 8) | in[(5 - i) * 8 + j];
    out.v[i] = limb;
  }
  return fp_cmp(out, P) < 0;
}

static void fp_to_be(const fp &a, u8 *out) {  // std form -> 48 BE bytes
  for (int i = 0; i < 6; ++i)
    for (int j = 0; j < 8; ++j) out[(5 - i) * 8 + j] = (u8)(a.v[i] >> (56 - 8 * j));
}

// std-form fp <-> the framework's (24, n) u32 base-2^16 limb-major layout
static void fp_to_u16limbs(const fp &a, u32 *limbs, size_t n, size_t i) {
  for (int k = 0; k < 24; ++k) limbs[(size_t)k * n + i] = (u32)((a.v[k / 4] >> (16 * (k % 4))) & 0xFFFF);
}

static void fp_from_u16limbs(const u32 *limbs, size_t n, size_t i, fp &out) {
  for (int w = 0; w < 6; ++w) out.v[w] = 0;
  for (int k = 0; k < 24; ++k)
    out.v[k / 4] |= (u64)(limbs[(size_t)k * n + i] & 0xFFFF) << (16 * (k % 4));
}

// -- curve helpers -----------------------------------------------------------

// y^2 == x^3 + 4 (Montgomery coords)
static bool g1_on_curve(const fp &xm, const fp &ym) {
  fp y2 = fp_sqr(ym);
  fp x3 = fp_mul(fp_sqr(xm), xm);
  fp rhs = fp_add(x3, B_MONT);
  return fp_cmp(y2, rhs) == 0;
}

static const u8 FLAG_COMPRESSED = 0x80;
static const u8 FLAG_INFINITY = 0x40;
static const u8 FLAG_SIGN = 0x20;

}  // namespace

// ---------------------------------------------------------------------------
// exported API
// ---------------------------------------------------------------------------

extern "C" {

// Parse + validate n compressed G1 points (48B each, ZCash convention).
// Outputs x as std-form (24, n) u16-in-u32 limbs, sign bits, infinity mask.
// Returns 0 on success, or 1-based index of the first malformed blob.
long kzg_g1_parse_batch(const u8 *in, size_t n, u32 *x_limbs, u8 *sign, u8 *inf) {
  ensure_consts();
  for (size_t i = 0; i < n; ++i) {
    const u8 *d = in + 48 * i;
    u8 flags = d[0];
    if (!(flags & FLAG_COMPRESSED)) return (long)(i + 1);
    if (flags & FLAG_INFINITY) {
      if (flags & FLAG_SIGN) return (long)(i + 1);
      if (flags & 0x1F) return (long)(i + 1);
      for (int j = 1; j < 48; ++j)
        if (d[j]) return (long)(i + 1);
      fp zero = {{0}};
      fp_to_u16limbs(zero, x_limbs, n, i);
      sign[i] = 0;
      inf[i] = 1;
      continue;
    }
    u8 buf[48];
    memcpy(buf, d, 48);
    buf[0] = flags & 0x1F;
    fp x;
    if (!fp_from_be(buf, x)) return (long)(i + 1);
    fp_to_u16limbs(x, x_limbs, n, i);
    sign[i] = (flags & FLAG_SIGN) ? 1 : 0;
    inf[i] = 0;
  }
  return 0;
}

// Full decompression on the host: x -> y = sqrt(x^3 + 4) with the
// lexicographically-larger root iff sign flag set. Outputs x/y std-form
// (24, n) limbs + inf mask. Returns 0, or 1-based index of the first blob
// that is malformed / not on the curve.
long kzg_g1_decompress_batch(const u8 *in, size_t n, u32 *x_limbs, u32 *y_limbs, u8 *inf) {
  ensure_consts();
  fp half_p = P;  // (p-1)/2 for the lexicographic test
  half_p.v[0] -= 1;
  for (int i = 0; i < 6; ++i) {
    u64 lo = half_p.v[i] >> 1;
    u64 hi = (i < 5) ? (half_p.v[i + 1] & 1) : 0;
    half_p.v[i] = lo | (hi << 63);
  }
  for (size_t i = 0; i < n; ++i) {
    const u8 *d = in + 48 * i;
    u8 flags = d[0];
    if (!(flags & FLAG_COMPRESSED)) return (long)(i + 1);
    fp zero = {{0}};
    if (flags & FLAG_INFINITY) {
      if ((flags & FLAG_SIGN) || (flags & 0x1F)) return (long)(i + 1);
      for (int j = 1; j < 48; ++j)
        if (d[j]) return (long)(i + 1);
      fp_to_u16limbs(zero, x_limbs, n, i);
      fp_to_u16limbs(zero, y_limbs, n, i);
      inf[i] = 1;
      continue;
    }
    u8 buf[48];
    memcpy(buf, d, 48);
    buf[0] = flags & 0x1F;
    fp x;
    if (!fp_from_be(buf, x)) return (long)(i + 1);
    fp xm = fp_to_mont(x);
    fp rhs = fp_add(fp_mul(fp_sqr(xm), xm), B_MONT);
    fp ym;
    if (!fp_sqrt(rhs, ym)) return (long)(i + 1);
    fp y = fp_from_mont(ym);
    bool is_larger = fp_cmp(y, half_p) > 0;
    bool want_larger = (flags & FLAG_SIGN) != 0;
    if (is_larger != want_larger) y = fp_neg(y);
    fp_to_u16limbs(x, x_limbs, n, i);
    fp_to_u16limbs(y, y_limbs, n, i);
    inf[i] = 0;
  }
  return 0;
}

// Compress n affine points given as std-form (24, n) limb arrays + inf mask.
// Writes 48B per point. Points are trusted (no curve check). Returns 0, or
// the 1-based index of the first coordinate >= p.
long kzg_g1_compress_batch(const u32 *x_limbs, const u32 *y_limbs, const u8 *inf,
                           size_t n, u8 *out) {
  ensure_consts();
  fp half_p = P;
  half_p.v[0] -= 1;
  for (int i = 0; i < 6; ++i) {
    u64 lo = half_p.v[i] >> 1;
    u64 hi = (i < 5) ? (half_p.v[i + 1] & 1) : 0;
    half_p.v[i] = lo | (hi << 63);
  }
  for (size_t i = 0; i < n; ++i) {
    u8 *d = out + 48 * i;
    if (inf && inf[i]) {
      memset(d, 0, 48);
      d[0] = FLAG_COMPRESSED | FLAG_INFINITY;
      continue;
    }
    fp x, y;
    fp_from_u16limbs(x_limbs, n, i, x);
    fp_from_u16limbs(y_limbs, n, i, y);
    if (fp_cmp(x, P) >= 0 || fp_cmp(y, P) >= 0) return (long)(i + 1);
    fp_to_be(x, d);
    d[0] |= FLAG_COMPRESSED;
    if (fp_cmp(y, half_p) > 0) d[0] |= FLAG_SIGN;
  }
  return 0;
}

// Validate that (x, y) std-form limb pairs are on the curve (batch), writing
// a 0/1 result per point. Infinity lanes validate as 1.
void kzg_g1_on_curve_batch(const u32 *x_limbs, const u32 *y_limbs, const u8 *inf,
                           size_t n, u8 *ok) {
  ensure_consts();
  for (size_t i = 0; i < n; ++i) {
    if (inf && inf[i]) {
      ok[i] = 1;
      continue;
    }
    fp x, y;
    fp_from_u16limbs(x_limbs, n, i, x);
    fp_from_u16limbs(y_limbs, n, i, y);
    ok[i] = g1_on_curve(fp_to_mont(x), fp_to_mont(y)) ? 1 : 0;
  }
}

// Parse + validate n compressed G2 points (96B each, ZCash convention: x1
// (imaginary) big-endian with flags in the top byte, then x0 big-endian —
// mirroring the reference's blst_p2_uncompress byte order,
// src/curves.rs:287-303). Outputs x as std-form (24, 2, n) u16-in-u32 limbs
// (component axis in the middle: c0 rows first), sign bits, infinity mask.
// Returns 0 on success, or 1-based index of the first malformed blob.
long kzg_g2_parse_batch(const u8 *in, size_t n, u32 *x_limbs, u8 *sign, u8 *inf) {
  ensure_consts();
  for (size_t i = 0; i < n; ++i) {
    const u8 *d = in + 96 * i;
    u8 flags = d[0];
    if (!(flags & FLAG_COMPRESSED)) return (long)(i + 1);
    if (flags & FLAG_INFINITY) {
      if (flags & FLAG_SIGN) return (long)(i + 1);
      if (flags & 0x1F) return (long)(i + 1);
      for (int j = 1; j < 96; ++j)
        if (d[j]) return (long)(i + 1);
      fp zero = {{0}};
      fp_to_u16limbs(zero, x_limbs, 2 * n, i);          // c0 block
      fp_to_u16limbs(zero, x_limbs + n, 2 * n, i);      // c1 block
      sign[i] = 0;
      inf[i] = 1;
      continue;
    }
    u8 buf[48];
    memcpy(buf, d, 48);
    buf[0] = flags & 0x1F;
    fp x1, x0;
    if (!fp_from_be(buf, x1)) return (long)(i + 1);
    if (!fp_from_be(d + 48, x0)) return (long)(i + 1);
    // target layout (24, 2, n): limb k, component c, point i at k*2n + c*n + i
    fp_to_u16limbs(x0, x_limbs, 2 * n, i);
    fp_to_u16limbs(x1, x_limbs + n, 2 * n, i);
    sign[i] = (flags & FLAG_SIGN) ? 1 : 0;
    inf[i] = 0;
  }
  return 0;
}

// Fr codec: n 32-byte little-endian scalars -> (16, n) u16-in-u32 limbs.
// No modular reduction (callers feed canonical bytes, matching the artifact
// format); returns 0 always.
long kzg_fr_from_le_bytes_batch(const u8 *in, size_t n, u32 *limbs) {
  for (size_t i = 0; i < n; ++i) {
    const u8 *d = in + 32 * i;
    for (int k = 0; k < 16; ++k)
      limbs[(size_t)k * n + i] = (u32)d[2 * k] | ((u32)d[2 * k + 1] << 8);
  }
  return 0;
}

// (16, n) u16-in-u32 limbs -> n 32-byte little-endian scalars.
long kzg_fr_to_le_bytes_batch(const u32 *limbs, size_t n, u8 *out) {
  for (size_t i = 0; i < n; ++i) {
    u8 *d = out + 32 * i;
    for (int k = 0; k < 16; ++k) {
      u32 v = limbs[(size_t)k * n + i];
      d[2 * k] = (u8)(v & 0xFF);
      d[2 * k + 1] = (u8)((v >> 8) & 0xFF);
    }
  }
  return 0;
}

// Library self-test hook (also used by unit tests): sqrt of 4 must be +/-2.
int kzg_selftest() {
  ensure_consts();
  fp four = {{4, 0, 0, 0, 0, 0}};
  fp r;
  if (!fp_sqrt(fp_to_mont(four), r)) return 1;
  fp rs = fp_from_mont(r);
  fp two = {{2, 0, 0, 0, 0, 0}};
  if (fp_cmp(rs, two) != 0 && fp_cmp(rs, fp_neg(two)) != 0) return 2;
  return 0;
}

}  // extern "C"
