// kzg_native — host-side BLS12-381 engine for the TPU-native KZG framework.
//
// Plays the role blst (C + assembly, behind the blstrs fork) plays for the
// Rust reference (SURVEY.md §2.2): fast host field/curve/pairing arithmetic
// and canonical ZCash serialization. The TPU compute path (JAX/Pallas) is
// the primary engine; this library backs
//   * fast host-side (de)serialization incl. decompression sqrts,
//   * the pairing checks in verify_eval* when no device round-trip is wanted,
//   * fast golden-vector generation and differential tests (vs the slow
//     pure-Python oracle in kzg_tpu/oracle).
//
// Implementation is written from the curve/tower specification (the same one
// kzg_tpu/oracle re-derives): Fp2 = Fp[u]/(u^2+1), Fp6 = Fp2[v]/(v^3-(u+1)),
// Fp12 = Fp6[w]/(w^2-v); optimal ate pairing via untwist to E(Fp12).
// No code is taken from blst/blstrs.
//
// Build: make -C native   (g++ -O3 -shared; no external dependencies)
// ABI: plain C functions over byte buffers (see the extern "C" block at the
// bottom); Python binds via ctypes in kzg_tpu/native/__init__.py.

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <vector>

using u64 = uint64_t;
using u128 = unsigned __int128;
using u8 = uint8_t;

// ---------------------------------------------------------------------------
// Fixed-width little-endian bignum helpers
// ---------------------------------------------------------------------------

template <int N>
static inline void bn_zero(u64* x) { for (int i = 0; i < N; i++) x[i] = 0; }

template <int N>
static inline void bn_copy(u64* d, const u64* s) { for (int i = 0; i < N; i++) d[i] = s[i]; }

template <int N>
static inline int bn_cmp(const u64* a, const u64* b) {
  for (int i = N - 1; i >= 0; i--) {
    if (a[i] < b[i]) return -1;
    if (a[i] > b[i]) return 1;
  }
  return 0;
}

template <int N>
static inline bool bn_is_zero(const u64* a) {
  u64 acc = 0;
  for (int i = 0; i < N; i++) acc |= a[i];
  return acc == 0;
}

template <int N>
static inline u64 bn_add(u64* out, const u64* a, const u64* b) {
  u128 c = 0;
  for (int i = 0; i < N; i++) {
    u128 s = (u128)a[i] + b[i] + c;
    out[i] = (u64)s;
    c = s >> 64;
  }
  return (u64)c;
}

template <int N>
static inline u64 bn_sub(u64* out, const u64* a, const u64* b) {
  u128 borrow = 0;
  for (int i = 0; i < N; i++) {
    u128 s = (u128)a[i] - b[i] - borrow;
    out[i] = (u64)s;
    borrow = (s >> 64) & 1;  // 1 if wrapped
  }
  return (u64)borrow;
}

// divide little-endian bignum by a small u64 in place, return remainder
template <int N>
static inline u64 bn_div_u64(u64* x, u64 d) {
  u128 rem = 0;
  for (int i = N - 1; i >= 0; i--) {
    u128 cur = (rem << 64) | x[i];
    x[i] = (u64)(cur / d);
    rem = cur % d;
  }
  return (u64)rem;
}

// shift right by k < 64 bits
template <int N>
static inline void bn_shr(u64* x, int k) {
  if (k == 0) return;
  for (int i = 0; i < N - 1; i++) x[i] = (x[i] >> k) | (x[i + 1] << (64 - k));
  x[N - 1] >>= k;
}

// ---------------------------------------------------------------------------
// Montgomery context (generic over limb count)
// ---------------------------------------------------------------------------

template <int N>
struct MontCtx {
  u64 mod[N];
  u64 n0;       // -mod^-1 mod 2^64
  u64 one[N];   // R mod mod  (Montgomery 1)
  u64 r2[N];    // R^2 mod mod
  u64 inv_exp[N];  // mod - 2 (Fermat inverse exponent)

  void init(const u64* m) {
    bn_copy<N>(mod, m);
    // n0 by Newton on 2-adics
    u64 x = 1;
    for (int i = 0; i < 6; i++) x *= 2 - m[0] * x;
    n0 = (u64)(0 - x);
    // one = 2^(64N) mod m by shift-and-reduce doubling
    bn_zero<N>(one);
    one[0] = 1;
    for (int i = 0; i < 64 * N; i++) dbl_mod(one, one);
    // r2 = 2^(128N) mod m
    bn_copy<N>(r2, one);
    for (int i = 0; i < 64 * N; i++) dbl_mod(r2, r2);
    u64 two[N];
    bn_zero<N>(two);
    two[0] = 2;
    bn_sub<N>(inv_exp, mod, two);
  }

  inline void add_mod(u64* out, const u64* a, const u64* b) const {
    u64 t[N];
    u64 carry = bn_add<N>(t, a, b);
    u64 s[N];
    u64 borrow = bn_sub<N>(s, t, mod);
    bool take_sub = carry || !borrow;
    for (int i = 0; i < N; i++) out[i] = take_sub ? s[i] : t[i];
  }

  inline void dbl_mod(u64* out, const u64* a) const { add_mod(out, a, a); }

  inline void sub_mod(u64* out, const u64* a, const u64* b) const {
    u64 t[N];
    u64 borrow = bn_sub<N>(t, a, b);
    if (borrow) bn_add<N>(t, t, mod);
    bn_copy<N>(out, t);
  }

  inline void neg_mod(u64* out, const u64* a) const {
    if (bn_is_zero<N>(a)) { bn_copy<N>(out, a); return; }
    bn_sub<N>(out, mod, a);
  }

  // Montgomery multiply: out = a*b*R^-1 mod m  (SOS form)
  void mul(u64* out, const u64* a, const u64* b) const {
    u64 t[2 * N + 1];
    for (int i = 0; i < 2 * N + 1; i++) t[i] = 0;
    for (int i = 0; i < N; i++) {
      u64 carry = 0;
      for (int j = 0; j < N; j++) {
        u128 s = (u128)a[i] * b[j] + t[i + j] + carry;
        t[i + j] = (u64)s;
        carry = (u64)(s >> 64);
      }
      t[i + N] = carry;
    }
    // reduce
    for (int i = 0; i < N; i++) {
      u64 m_ = t[i] * n0;
      u64 carry = 0;
      for (int j = 0; j < N; j++) {
        u128 s = (u128)m_ * mod[j] + t[i + j] + carry;
        t[i + j] = (u64)s;
        carry = (u64)(s >> 64);
      }
      int k = i + N;
      while (carry) {
        u128 s = (u128)t[k] + carry;
        t[k] = (u64)s;
        carry = (u64)(s >> 64);
        k++;
      }
    }
    u64* res = t + N;
    while (t[2 * N] || bn_cmp<N>(res, mod) >= 0) {
      u64 borrow = bn_sub<N>(res, res, mod);
      if (borrow) t[2 * N]--;
    }
    bn_copy<N>(out, res);
  }

  inline void sqr(u64* out, const u64* a) const { mul(out, a, a); }

  void to_mont(u64* out, const u64* a) const { mul(out, a, r2); }

  void from_mont(u64* out, const u64* a) const {
    u64 onev[N];
    bn_zero<N>(onev);
    onev[0] = 1;
    mul(out, a, onev);
  }

  // out = base^exp (exp is nexp little-endian words, base/out in Montgomery)
  void pow(u64* out, const u64* base, const u64* exp, int nexp) const {
    u64 acc[N];
    bn_copy<N>(acc, one);
    int top = nexp - 1;
    while (top >= 0 && exp[top] == 0) top--;
    if (top < 0) { bn_copy<N>(out, acc); return; }
    int bits = 64 * top + (64 - __builtin_clzll(exp[top]));
    u64 b[N];
    bn_copy<N>(b, base);
    for (int i = bits - 1; i >= 0; i--) {
      sqr(acc, acc);
      if ((exp[i / 64] >> (i % 64)) & 1) mul(acc, acc, b);
    }
    bn_copy<N>(out, acc);
  }

  void inv(u64* out, const u64* a) const { pow(out, a, inv_exp, N); }
};

static const u64 P_LIMBS[6] = {
    0xb9feffffffffaaabULL, 0x1eabfffeb153ffffULL, 0x6730d2a0f6b0f624ULL,
    0x64774b84f38512bfULL, 0x4b1ba7b6434bacd7ULL, 0x1a0111ea397fe69aULL};
static const u64 R_LIMBS[4] = {
    0xffffffff00000001ULL, 0x53bda402fffe5bfeULL, 0x3339d80809a1d805ULL,
    0x73eda753299d7d48ULL};

static MontCtx<6> FP;
static MontCtx<4> FRX;

// ---------------------------------------------------------------------------
// Fp wrapper with value semantics
// ---------------------------------------------------------------------------

struct Fp {
  u64 v[6];
  static Fp zero() { Fp r; bn_zero<6>(r.v); return r; }
  static Fp one() { Fp r; bn_copy<6>(r.v, FP.one); return r; }
  bool is_zero() const { return bn_is_zero<6>(v); }
  bool operator==(const Fp& o) const { return bn_cmp<6>(v, o.v) == 0; }
  Fp operator+(const Fp& o) const { Fp r; FP.add_mod(r.v, v, o.v); return r; }
  Fp operator-(const Fp& o) const { Fp r; FP.sub_mod(r.v, v, o.v); return r; }
  Fp operator*(const Fp& o) const { Fp r; FP.mul(r.v, v, o.v); return r; }
  Fp operator-() const { Fp r; FP.neg_mod(r.v, v); return r; }
  Fp square() const { Fp r; FP.sqr(r.v, v); return r; }
  Fp inv() const { Fp r; FP.inv(r.v, v); return r; }
  Fp dbl() const { Fp r; FP.dbl_mod(r.v, v); return r; }
  Fp mul3() const { return dbl() + *this; }
};

// big-endian 48-byte <-> Fp (Montgomery)
static bool fp_from_be48(Fp& out, const u8* in) {
  u64 std_[6];
  for (int i = 0; i < 6; i++) {
    u64 w = 0;
    for (int j = 0; j < 8; j++) w = (w << 8) | in[(5 - i) * 8 + j];
    std_[i] = w;
  }
  if (bn_cmp<6>(std_, FP.mod) >= 0) return false;
  FP.to_mont(out.v, std_);
  return true;
}

static void fp_to_be48(const Fp& x, u8* out) {
  u64 std_[6];
  FP.from_mont(std_, x.v);
  for (int i = 0; i < 6; i++) {
    u64 w = std_[i];
    for (int j = 7; j >= 0; j--) {
      out[(5 - i) * 8 + j] = (u8)w;
      w >>= 8;
    }
  }
}

// y lexicographically largest <=> y > p - y (standard form)
static bool fp_lex_largest(const Fp& y) {
  u64 std_[6], neg_[6];
  FP.from_mont(std_, y.v);
  if (bn_is_zero<6>(std_)) return false;
  bn_sub<6>(neg_, FP.mod, std_);
  return bn_cmp<6>(std_, neg_) > 0;
}

// sqrt in Fp: p % 4 == 3 -> cand = a^((p+1)/4)
static bool fp_sqrt(Fp& out, const Fp& a) {
  u64 e[6];
  u64 onev[6];
  bn_zero<6>(onev);
  onev[0] = 1;
  bn_add<6>(e, FP.mod, onev);  // p+1 (no overflow: p < 2^382)
  bn_shr<6>(e, 2);
  FP.pow(out.v, a.v, e, 6);
  Fp chk = out.square();
  return chk == a;
}

// ---------------------------------------------------------------------------
// Tower: Fp2 = Fp[u]/(u^2+1), Fp6 = Fp2[v]/(v^3 - (u+1)), Fp12 = Fp6[w]/(w^2-v)
// (mirrors kzg_tpu/oracle/field.py, which mirrors the zkcrypto tower)
// ---------------------------------------------------------------------------

struct Fp2 {
  Fp a, b;  // a + b*u
  static Fp2 zero() { return {Fp::zero(), Fp::zero()}; }
  static Fp2 one() { return {Fp::one(), Fp::zero()}; }
  bool is_zero() const { return a.is_zero() && b.is_zero(); }
  bool operator==(const Fp2& o) const { return a == o.a && b == o.b; }
  Fp2 operator+(const Fp2& o) const { return {a + o.a, b + o.b}; }
  Fp2 operator-(const Fp2& o) const { return {a - o.a, b - o.b}; }
  Fp2 operator-() const { return {-a, -b}; }
  Fp2 operator*(const Fp2& o) const {
    Fp ac = a * o.a, bd = b * o.b;
    return {ac - bd, (a + b) * (o.a + o.b) - ac - bd};
  }
  Fp2 square() const {
    Fp ab = a * b;
    return {(a + b) * (a - b), ab + ab};
  }
  Fp2 mul_fp(const Fp& s) const { return {a * s, b * s}; }
  Fp2 mul3() const { return {a.mul3(), b.mul3()}; }
  Fp2 conj() const { return {a, -b}; }
  Fp2 mul_xi() const { return {a - b, a + b}; }  // * (1+u)
  Fp2 mul_u() const { return {-b, a}; }          // * u
  Fp2 inv() const {
    Fp ninv = (a.square() + b.square()).inv();
    return {a * ninv, -(b * ninv)};
  }
  Fp2 pow(const u64* e, int nexp) const;
  Fp2 dbl() const { return {a.dbl(), b.dbl()}; }
};

Fp2 Fp2::pow(const u64* e, int nexp) const {
  Fp2 acc = Fp2::one();
  int top = nexp - 1;
  while (top >= 0 && e[top] == 0) top--;
  if (top < 0) return acc;
  int bits = 64 * top + (64 - __builtin_clzll(e[top]));
  for (int i = bits - 1; i >= 0; i--) {
    acc = acc.square();
    if ((e[i / 64] >> (i % 64)) & 1) acc = acc * (*this);
  }
  return acc;
}

// sqrt in Fp2 (p % 4 == 3; Adj–Rodríguez, as in the oracle)
static bool fp2_sqrt(Fp2& out, const Fp2& x) {
  if (x.is_zero()) { out = x; return true; }
  u64 e34[6];  // (p-3)/4
  u64 three[6];
  bn_zero<6>(three);
  three[0] = 3;
  bn_sub<6>(e34, FP.mod, three);
  bn_shr<6>(e34, 2);
  u64 e12[6];  // (p-1)/2
  u64 onev[6];
  bn_zero<6>(onev);
  onev[0] = 1;
  bn_sub<6>(e12, FP.mod, onev);
  bn_shr<6>(e12, 1);

  Fp2 a1 = x.pow(e34, 6);
  Fp2 alpha = a1.square() * x;
  Fp2 x0 = a1 * x;
  Fp2 minus_one = {-Fp::one(), Fp::zero()};
  Fp2 cand;
  if (alpha == minus_one) {
    cand = x0.mul_u();
  } else {
    cand = (alpha + Fp2::one()).pow(e12, 6) * x0;
  }
  if (cand.square() == x) { out = cand; return true; }
  return false;
}

static bool fp2_lex_largest(const Fp2& y) {
  // compare (y.b, y.a) lexicographically against its negation: blstrs sorts
  // by c1 first, then c0
  if (!y.b.is_zero()) return fp_lex_largest(y.b);
  return fp_lex_largest(y.a);
}

struct Fp6 {
  Fp2 c0, c1, c2;
  static Fp6 zero() { return {Fp2::zero(), Fp2::zero(), Fp2::zero()}; }
  static Fp6 one() { return {Fp2::one(), Fp2::zero(), Fp2::zero()}; }
  bool is_zero() const { return c0.is_zero() && c1.is_zero() && c2.is_zero(); }
  bool operator==(const Fp6& o) const { return c0 == o.c0 && c1 == o.c1 && c2 == o.c2; }
  Fp6 operator+(const Fp6& o) const { return {c0 + o.c0, c1 + o.c1, c2 + o.c2}; }
  Fp6 operator-(const Fp6& o) const { return {c0 - o.c0, c1 - o.c1, c2 - o.c2}; }
  Fp6 operator-() const { return {-c0, -c1, -c2}; }
  Fp6 operator*(const Fp6& o) const {
    Fp2 t0 = c0 * o.c0, t1 = c1 * o.c1, t2 = c2 * o.c2;
    Fp2 r0 = t0 + ((c1 + c2) * (o.c1 + o.c2) - t1 - t2).mul_xi();
    Fp2 r1 = (c0 + c1) * (o.c0 + o.c1) - t0 - t1 + t2.mul_xi();
    Fp2 r2 = (c0 + c2) * (o.c0 + o.c2) - t0 - t2 + t1;
    return {r0, r1, r2};
  }
  Fp6 square() const { return (*this) * (*this); }
  Fp6 mul_fp2(const Fp2& s) const { return {c0 * s, c1 * s, c2 * s}; }
  Fp6 mul_v() const { return {c2.mul_xi(), c0, c1}; }
  Fp6 inv() const {
    Fp2 t0 = c0.square() - (c1 * c2).mul_xi();
    Fp2 t1 = c2.square().mul_xi() - c0 * c1;
    Fp2 t2 = c1.square() - c0 * c2;
    Fp2 d = (c0 * t0 + (c2 * t1 + c1 * t2).mul_xi()).inv();
    return {t0 * d, t1 * d, t2 * d};
  }
};

// Frobenius coefficients (computed once at init)
static Fp2 XI_P_13, XI_P_23, XI_P_16;  // xi^((p-1)/3), xi^(2(p-1)/3), xi^((p-1)/6)

static Fp6 fp6_frobenius(const Fp6& x) {
  return {x.c0.conj(), x.c1.conj() * XI_P_13, x.c2.conj() * XI_P_23};
}

struct Fp12 {
  Fp6 c0, c1;
  static Fp12 zero() { return {Fp6::zero(), Fp6::zero()}; }
  static Fp12 one() { return {Fp6::one(), Fp6::zero()}; }
  bool is_zero() const { return c0.is_zero() && c1.is_zero(); }
  bool operator==(const Fp12& o) const { return c0 == o.c0 && c1 == o.c1; }
  Fp12 operator+(const Fp12& o) const { return {c0 + o.c0, c1 + o.c1}; }
  Fp12 operator-(const Fp12& o) const { return {c0 - o.c0, c1 - o.c1}; }
  Fp12 operator-() const { return {-c0, -c1}; }
  Fp12 operator*(const Fp12& o) const {
    Fp6 t0 = c0 * o.c0, t1 = c1 * o.c1;
    return {t0 + t1.mul_v(), (c0 + c1) * (o.c0 + o.c1) - t0 - t1};
  }
  Fp12 square() const { return (*this) * (*this); }
  Fp12 conj() const { return {c0, -c1}; }
  Fp12 inv() const {
    Fp6 d = (c0.square() - c1.square().mul_v()).inv();
    return {c0 * d, -(c1 * d)};
  }
  Fp12 frobenius() const {
    return {fp6_frobenius(c0), fp6_frobenius(c1).mul_fp2(XI_P_16)};
  }
  static Fp12 from_fp(const Fp& x) {
    return {{{x, Fp::zero()}, Fp2::zero(), Fp2::zero()}, Fp6::zero()};
  }
  static Fp12 from_fp2(const Fp2& x) {
    return {{x, Fp2::zero(), Fp2::zero()}, Fp6::zero()};
  }
  Fp12 pow(const u64* e, int nexp) const {
    Fp12 acc = Fp12::one();
    int top = nexp - 1;
    while (top >= 0 && e[top] == 0) top--;
    if (top < 0) return acc;
    int bits = 64 * top + (64 - __builtin_clzll(e[top]));
    for (int i = bits - 1; i >= 0; i--) {
      acc = acc.square();
      if ((e[i / 64] >> (i % 64)) & 1) acc = acc * (*this);
    }
    return acc;
  }
};

// ---------------------------------------------------------------------------
// Generic Jacobian curve arithmetic over field F (y^2 = x^3 + b, a = 0)
// ---------------------------------------------------------------------------

template <typename F>
struct Point {
  F x, y, z;  // z == 0 encodes infinity
  bool is_inf() const { return z.is_zero(); }
  static Point infinity() { return {F::one(), F::one(), F::zero()}; }
};

template <typename F>
static Point<F> pt_dbl(const Point<F>& p) {
  if (p.is_inf()) return p;
  // dbl-2009-l (a = 0) — same formula family as kzg_tpu/curve/ops.py
  F a = p.x.square();
  F b = p.y.square();
  F c = b.square();
  F t = (p.x + b).square();
  F d = t - a - c;
  d = d + d;
  F e = a + a + a;
  F f = e.square();
  F x3 = f - (d + d);
  F c8 = c + c;
  c8 = c8 + c8;
  c8 = c8 + c8;
  F y3 = e * (d - x3) - c8;
  F yz = p.y * p.z;
  return {x3, y3, yz + yz};
}

template <typename F>
static Point<F> pt_add(const Point<F>& p, const Point<F>& q) {
  if (p.is_inf()) return q;
  if (q.is_inf()) return p;
  F z1z1 = p.z.square();
  F z2z2 = q.z.square();
  F u1 = p.x * z2z2;
  F u2 = q.x * z1z1;
  F s1 = p.y * (q.z * z2z2);
  F s2 = q.y * (p.z * z1z1);
  F h = u2 - u1;
  F r = s2 - s1;
  if (h.is_zero()) {
    if (r.is_zero()) return pt_dbl(p);
    return Point<F>::infinity();
  }
  F i = (h + h).square();
  F j = h * i;
  r = r + r;
  F v = u1 * i;
  F x3 = r.square() - j - (v + v);
  F s1j = s1 * j;
  F y3 = r * (v - x3) - (s1j + s1j);
  F zz = (p.z + q.z).square() - z1z1 - z2z2;
  return {x3, y3, zz * h};
}

// mixed add: q affine (z == 1)
template <typename F>
static Point<F> pt_madd(const Point<F>& p, const F& qx, const F& qy) {
  if (p.is_inf()) return {qx, qy, F::one()};
  F z1z1 = p.z.square();
  F u2 = qx * z1z1;
  F s2 = qy * (p.z * z1z1);
  F h = u2 - p.x;
  F r = s2 - p.y;
  if (h.is_zero()) {
    if (r.is_zero()) return pt_dbl(p);
    return Point<F>::infinity();
  }
  F hh = h.square();
  F i = hh + hh;
  i = i + i;
  F j = h * i;
  r = r + r;
  F v = p.x * i;
  F x3 = r.square() - j - (v + v);
  F yj = p.y * j;
  F y3 = r * (v - x3) - (yj + yj);
  F z3 = (p.z + h).square() - z1z1 - hh;
  return {x3, y3, z3};
}

template <typename F>
static void pt_to_affine(const Point<F>& p, F& ax, F& ay, bool& inf) {
  if (p.is_inf()) { inf = true; ax = F::zero(); ay = F::zero(); return; }
  inf = false;
  F zi = p.z.inv();
  F zi2 = zi.square();
  ax = p.x * zi2;
  ay = p.y * (zi2 * zi);
}

// scalar mul by a 256-bit scalar (standard form, little-endian words).
// VARIABLE-TIME: loop length and the add branch depend on the scalar bits.
// Only for public scalars (subgroup checks, test helpers) — secret-scalar
// paths (trusted setup) must use pt_mul_ct below.
template <typename F>
static Point<F> pt_mul(const Point<F>& p, const u64 k[4]) {
  Point<F> acc = Point<F>::infinity();
  int top = 3;
  while (top >= 0 && k[top] == 0) top--;
  if (top < 0) return acc;
  int bits = 64 * top + (64 - __builtin_clzll(k[top]));
  for (int i = bits - 1; i >= 0; i--) {
    acc = pt_dbl(acc);
    if ((k[i / 64] >> (i % 64)) & 1) acc = pt_add(acc, p);
  }
  return acc;
}

// ---------------------------------------------------------------------------
// Constant-time scalar multiplication (for the trusted-setup secret path)
// ---------------------------------------------------------------------------

static inline u64 ct_mask(bool b) { return (u64)0 - (u64)b; }

// out = mask ? a : b with an all-ones/all-zeros mask; T must be a POD of u64
// words (Fp, Fp2, Point<...> all are).
template <typename T>
static inline T ct_sel(u64 mask, const T& a, const T& b) {
  T r;
  const u64* pa = reinterpret_cast<const u64*>(&a);
  const u64* pb = reinterpret_cast<const u64*>(&b);
  u64* pr = reinterpret_cast<u64*>(&r);
  for (size_t i = 0; i < sizeof(T) / sizeof(u64); i++)
    pr[i] = (pa[i] & mask) | (pb[i] & ~mask);
  return r;
}

// dbl-2009-l without the infinity early-return: z == 0 yields z3 = 2yz = 0,
// so any infinity representation stays at infinity through the formulas.
template <typename F>
static Point<F> pt_dbl_ct(const Point<F>& p) {
  F a = p.x.square();
  F b = p.y.square();
  F c = b.square();
  F xb = p.x + b;
  F d = (xb.square() - a - c).dbl();
  F e = a.mul3();
  F f = e.square();
  F x3 = f - d.dbl();
  F c8 = c.dbl().dbl().dbl();
  F y3 = e * (d - x3) - c8;
  F z3 = (p.y * p.z).dbl();
  return {x3, y3, z3};
}

// Branch-free Jacobian add: general add-2007-bl formulas computed
// unconditionally, exceptional cases (either operand infinity, p == q,
// p == -q) resolved by masked selects.
template <typename F>
static Point<F> pt_add_ct(const Point<F>& p, const Point<F>& q) {
  F z1z1 = p.z.square();
  F z2z2 = q.z.square();
  F u1 = p.x * z2z2;
  F u2 = q.x * z1z1;
  F s1 = p.y * (q.z * z2z2);
  F s2 = q.y * (p.z * z1z1);
  F h = u2 - u1;
  F r = s2 - s1;
  F i = (h + h).square();
  F j = h * i;
  F r2 = r + r;
  F v = u1 * i;
  F x3 = r2.square() - j - (v + v);
  F s1j = s1 * j;
  F y3 = r2 * (v - x3) - (s1j + s1j);
  F zz = (p.z + q.z).square() - z1z1 - z2z2;
  Point<F> gen = {x3, y3, zz * h};
  Point<F> dbl = pt_dbl_ct(p);
  u64 m_pinf = ct_mask(p.is_inf());
  u64 m_qinf = ct_mask(q.is_inf());
  u64 m_h0 = ct_mask(h.is_zero());
  u64 m_r0 = ct_mask(r.is_zero());
  Point<F> out = ct_sel(m_h0 & m_r0, dbl, gen);            // p == q
  out = ct_sel(m_h0 & ~m_r0, Point<F>::infinity(), out);   // p == -q
  out = ct_sel(m_pinf, q, out);
  out = ct_sel(m_qinf, p, out);
  return out;
}

// Constant-time scalar mul: fixed 256 iterations, double-and-always-add with
// a masked accumulator select. The trusted setup routes the secret s through
// this (kzgn_g1_powers / kzgn_g1_mul and the G2 twins) — the reference gets
// the same property from blst's constant-time ladders (SURVEY.md §2.2); the
// previous variable-time pt_mul leaked scalar bits to a co-located timing
// observer.
template <typename F>
static Point<F> pt_mul_ct(const Point<F>& p, const u64 k[4]) {
  Point<F> acc = Point<F>::infinity();
  for (int i = 255; i >= 0; i--) {
    acc = pt_dbl_ct(acc);
    Point<F> sum = pt_add_ct(acc, p);
    u64 bit = (k[i / 64] >> (i % 64)) & 1;
    acc = ct_sel(ct_mask(bit != 0), sum, acc);
  }
  return acc;
}

// ---------------------------------------------------------------------------
// Pippenger MSM (host): affine inputs, standard-form 256-bit scalars
// ---------------------------------------------------------------------------

template <typename F>
static Point<F> msm(const F* xs, const F* ys, const u8* infs, const u8* sc /* 32B LE each */,
                    long n) {
  if (n <= 0) return Point<F>::infinity();
  int c = 4;
  if (n >= 32) c = 7;
  if (n >= 256) c = 9;
  if (n >= 4096) c = 12;
  if (n >= 65536) c = 14;
  int windows = (256 + c - 1) / c;
  int nbuckets = (1 << c) - 1;
  std::vector<Point<F>> buckets(nbuckets);
  Point<F> total = Point<F>::infinity();
  for (int w = windows - 1; w >= 0; w--) {
    for (int i = 0; i < c; i++) total = pt_dbl(total);
    for (int i = 0; i < nbuckets; i++) buckets[i] = Point<F>::infinity();
    int bit = w * c;
    for (long j = 0; j < n; j++) {
      if (infs && infs[j]) continue;
      // extract c bits at position `bit` from the 32-byte LE scalar
      int byte = bit >> 3, off = bit & 7;
      u64 window_val = 0;
      for (int t = 0; t < 4 && byte + t < 32; t++)
        window_val |= (u64)sc[j * 32 + byte + t] << (8 * t);
      window_val = (window_val >> off) & ((1u << c) - 1);
      if (window_val == 0) continue;
      buckets[window_val - 1] = pt_madd(buckets[window_val - 1], xs[j], ys[j]);
    }
    // running-sum bucket reduction
    Point<F> run = Point<F>::infinity();
    Point<F> acc = Point<F>::infinity();
    for (int b = nbuckets - 1; b >= 0; b--) {
      run = pt_add(run, buckets[b]);
      acc = pt_add(acc, run);
    }
    total = pt_add(total, acc);
  }
  return total;
}

// ---------------------------------------------------------------------------
// Pairing (optimal ate, via untwist to E(Fp12) — mirrors the Python oracle)
// ---------------------------------------------------------------------------

static Fp12 W_M2, W_M3;  // w^-2, w^-3
static u64 HARD_EXP[20];  // (p^4 - p^2 + 1)/r, 1268 bits
static int HARD_EXP_WORDS = 0;

struct PtFp12 {
  Fp12 x, y;
  bool inf;
};

static Fp12 line_eval(const PtFp12& t, const PtFp12& q, const Fp12& xp, const Fp12& yp) {
  // line through t and q (tangent if t == q), evaluated at (xp, yp)
  if (t.x == q.x && t.y == q.y) {
    Fp12 num = t.x.square();
    num = num + num + num;
    Fp12 lam = num * (t.y + t.y).inv();
    return yp - t.y - lam * (xp - t.x);
  }
  if (t.x == q.x) return xp - t.x;  // vertical
  Fp12 lam = (q.y - t.y) * (q.x - t.x).inv();
  return yp - t.y - lam * (xp - t.x);
}

static PtFp12 ec12_add(const PtFp12& p, const PtFp12& q) {
  if (p.inf) return q;
  if (q.inf) return p;
  Fp12 lam;
  if (p.x == q.x) {
    if (p.y == q.y) {
      if (p.y.is_zero()) return {Fp12::zero(), Fp12::zero(), true};
      Fp12 num = p.x.square();
      num = num + num + num;
      lam = num * (p.y + p.y).inv();
    } else {
      return {Fp12::zero(), Fp12::zero(), true};
    }
  } else {
    lam = (q.y - p.y) * (q.x - p.x).inv();
  }
  Fp12 x3 = lam.square() - p.x - q.x;
  Fp12 y3 = lam * (p.x - x3) - p.y;
  return {x3, y3, false};
}

static const u64 BLS_X_ABS = 0xd201000000010000ULL;  // |x|; x itself is negative

static Fp12 miller_loop(const Fp& px, const Fp& py, bool pinf, const Fp2& qx, const Fp2& qy,
                        bool qinf) {
  if (pinf || qinf) return Fp12::one();
  PtFp12 q = {Fp12::from_fp2(qx) * W_M2, Fp12::from_fp2(qy) * W_M3, false};
  Fp12 xp = Fp12::from_fp(px), yp = Fp12::from_fp(py);
  PtFp12 t = q;
  Fp12 f = Fp12::one();
  int bits = 64 - __builtin_clzll(BLS_X_ABS);
  for (int i = bits - 2; i >= 0; i--) {
    f = f.square() * line_eval(t, t, xp, yp);
    t = ec12_add(t, t);
    if ((BLS_X_ABS >> i) & 1) {
      f = f * line_eval(t, q, xp, yp);
      t = ec12_add(t, q);
    }
  }
  return f.conj();  // x < 0 fixup
}

static Fp12 final_exponentiation(const Fp12& f0) {
  Fp12 f = f0.conj() * f0.inv();          // f^(p^6 - 1)
  f = f.frobenius().frobenius() * f;      // f^(p^2 + 1)
  return f.pow(HARD_EXP, HARD_EXP_WORDS); // hard part
}

// ---------------------------------------------------------------------------
// Initialisation
// ---------------------------------------------------------------------------

static bool g_initialised = false;

static void parse_hex_into(const char* hex, u64* out, int nwords) {
  for (int i = 0; i < nwords; i++) out[i] = 0;
  int len = (int)strlen(hex);
  int nib = 0;
  for (int i = len - 1; i >= 0; i--) {
    char ch = hex[i];
    u64 val = (ch >= '0' && ch <= '9') ? (u64)(ch - '0')
              : (ch >= 'a' && ch <= 'f') ? (u64)(ch - 'a' + 10)
              : (ch >= 'A' && ch <= 'F') ? (u64)(ch - 'A' + 10)
              : 0;
    out[nib / 16] |= val << (4 * (nib % 16));
    nib++;
  }
}

static void ensure_init() {
  if (g_initialised) return;
  FP.init(P_LIMBS);
  FRX.init(R_LIMBS);

  // Frobenius constants: xi^((p-1)/3), xi^(2(p-1)/3), xi^((p-1)/6)
  Fp2 xi = {Fp::one(), Fp::one()};
  u64 e[6], e2[7];
  u64 onev[6];
  bn_zero<6>(onev);
  onev[0] = 1;
  bn_sub<6>(e, FP.mod, onev);  // p-1
  u64 e3[6];
  bn_copy<6>(e3, e);
  bn_div_u64<6>(e3, 3);  // (p-1)/3
  XI_P_13 = xi.pow(e3, 6);
  // 2(p-1)/3
  u64 carry = bn_add<6>(e2, e3, e3);
  e2[6] = carry;
  XI_P_23 = xi.pow(e2, 7);
  u64 e6[6];
  bn_copy<6>(e6, e);
  bn_div_u64<6>(e6, 6);  // (p-1)/6
  XI_P_16 = xi.pow(e6, 6);

  // untwist constants: w^-2 = 1/v = v^2/xi as an Fp6; w^-1 = w * (1/v)
  Fp2 xi_inv = xi.inv();
  Fp6 v2_over_xi = {Fp2::zero(), Fp2::zero(), xi_inv};
  W_M2 = {v2_over_xi, Fp6::zero()};
  Fp12 w_m1 = {Fp6::zero(), v2_over_xi};
  W_M3 = W_M2 * w_m1;

  // hard exponent (p^4 - p^2 + 1)/r — public constant of the curve
  parse_hex_into(
      "f686b3d807d01c0bd38c3195c899ed3cde88eeb996ca394506632528d6a9a2f23006"
      "3cf081517f68f7764c28b6f8ae5a72bce8d63cb9f827eca0ba621315b2076995003f"
      "c77a17988f8761bdc51dc2378b9039096d1b767f17fcbde783765915c97f36c6f182"
      "12ed0b283ed237db421d160aeb6a1e79983774940996754c8c71a2629b0dea236905"
      "ce937335d5b68fa9912aae208ccf1e516c3f438e3ba79",
      HARD_EXP, 20);
  HARD_EXP_WORDS = 20;
  g_initialised = true;
}

// ---------------------------------------------------------------------------
// byte-level point codecs (raw uncompressed: BE coordinates, no flag bits)
// ---------------------------------------------------------------------------

// G1 raw affine: 96 bytes x||y big-endian. G2 raw affine: 192 bytes
// x.c1||x.c0||y.c1||y.c0 (matching the ZCash component order).

static bool g1_from_raw(Point<Fp>& p, const u8* in, bool inf) {
  if (inf) { p = Point<Fp>::infinity(); return true; }
  Fp x, y;
  if (!fp_from_be48(x, in) || !fp_from_be48(y, in + 48)) return false;
  p = {x, y, Fp::one()};
  return true;
}

static void g1_to_raw(const Point<Fp>& p, u8* out, u8* inf) {
  Fp ax, ay;
  bool is_inf;
  pt_to_affine(p, ax, ay, is_inf);
  if (inf) *inf = is_inf ? 1 : 0;
  if (is_inf) { memset(out, 0, 96); return; }
  fp_to_be48(ax, out);
  fp_to_be48(ay, out + 48);
}

static bool fp2_from_raw(Fp2& o, const u8* in) {
  // c1 || c0
  Fp c1, c0;
  if (!fp_from_be48(c1, in) || !fp_from_be48(c0, in + 48)) return false;
  o = {c0, c1};
  return true;
}

static void fp2_to_raw(const Fp2& x, u8* out) {
  fp_to_be48(x.b, out);
  fp_to_be48(x.a, out + 48);
}

static bool g2_from_raw(Point<Fp2>& p, const u8* in, bool inf) {
  if (inf) { p = Point<Fp2>::infinity(); return true; }
  Fp2 x, y;
  if (!fp2_from_raw(x, in) || !fp2_from_raw(y, in + 96)) return false;
  p = {x, y, Fp2::one()};
  return true;
}

static void g2_to_raw(const Point<Fp2>& p, u8* out, u8* inf) {
  Fp2 ax, ay;
  bool is_inf;
  pt_to_affine(p, ax, ay, is_inf);
  if (inf) *inf = is_inf ? 1 : 0;
  if (is_inf) { memset(out, 0, 192); return; }
  fp2_to_raw(ax, out);
  fp2_to_raw(ay, out + 96);
}

static const u64 B_G1_INT = 4;

static bool g1_on_curve(const Point<Fp>& p) {
  if (p.is_inf()) return true;
  // affine check (z == 1 on decode paths)
  Fp b = Fp::zero();
  u64 four[6] = {B_G1_INT, 0, 0, 0, 0, 0};
  FP.to_mont(b.v, four);
  return p.y.square() == p.x.square() * p.x + b;
}

static bool g2_on_curve(const Point<Fp2>& p) {
  if (p.is_inf()) return true;
  Fp b1 = Fp::zero();
  u64 four[6] = {4, 0, 0, 0, 0, 0};
  FP.to_mont(b1.v, four);
  Fp2 b = {b1, b1};  // b' = 4(1+u)
  return p.y.square() == p.x.square() * p.x + b;
}

template <typename F>
static bool in_subgroup(const Point<F>& p) {
  return pt_mul(p, R_LIMBS).is_inf();
}

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------

extern "C" {

int kzgn_version() { return 1; }

// -- G1 ---------------------------------------------------------------------

// pts: n * 96B raw affine; infs: n bytes; scalars: n * 32B LE standard form.
// out: 96B raw affine + out_inf flag. Returns 0 on success.
int kzgn_g1_msm(const u8* pts, const u8* infs, const u8* scalars, long n, u8* out,
                u8* out_inf) {
  ensure_init();
  std::vector<Fp> xs(n), ys(n);
  for (long i = 0; i < n; i++) {
    if (infs[i]) { xs[i] = Fp::zero(); ys[i] = Fp::zero(); continue; }
    if (!fp_from_be48(xs[i], pts + i * 96) || !fp_from_be48(ys[i], pts + i * 96 + 48))
      return -1;
  }
  Point<Fp> r = msm<Fp>(xs.data(), ys.data(), infs, scalars, n);
  g1_to_raw(r, out, out_inf);
  return 0;
}

int kzgn_g2_msm(const u8* pts, const u8* infs, const u8* scalars, long n, u8* out,
                u8* out_inf) {
  ensure_init();
  std::vector<Fp2> xs(n), ys(n);
  for (long i = 0; i < n; i++) {
    if (infs[i]) { xs[i] = Fp2::zero(); ys[i] = Fp2::zero(); continue; }
    if (!fp2_from_raw(xs[i], pts + i * 192) || !fp2_from_raw(ys[i], pts + i * 192 + 96))
      return -1;
  }
  Point<Fp2> r = msm<Fp2>(xs.data(), ys.data(), infs, scalars, n);
  g2_to_raw(r, out, out_inf);
  return 0;
}

// out = p * k  (k: 32B LE standard form)
int kzgn_g1_mul(const u8* p_raw, int p_inf, const u8* k, u8* out, u8* out_inf) {
  ensure_init();
  Point<Fp> p;
  if (!g1_from_raw(p, p_raw, p_inf != 0)) return -1;
  u64 kw[4];
  for (int i = 0; i < 4; i++) {
    u64 w = 0;
    for (int j = 7; j >= 0; j--) w = (w << 8) | k[i * 8 + j];
    kw[i] = w;
  }
  g1_to_raw(pt_mul_ct(p, kw), out, out_inf);
  return 0;
}

int kzgn_g2_mul(const u8* p_raw, int p_inf, const u8* k, u8* out, u8* out_inf) {
  ensure_init();
  Point<Fp2> p;
  if (!g2_from_raw(p, p_raw, p_inf != 0)) return -1;
  u64 kw[4];
  for (int i = 0; i < 4; i++) {
    u64 w = 0;
    for (int j = 7; j >= 0; j--) w = (w << 8) | k[i * 8 + j];
    kw[i] = w;
  }
  g2_to_raw(pt_mul_ct(p, kw), out, out_inf);
  return 0;
}

int kzgn_g1_add(const u8* a_raw, int a_inf, const u8* b_raw, int b_inf, u8* out,
                u8* out_inf) {
  ensure_init();
  Point<Fp> a, b;
  if (!g1_from_raw(a, a_raw, a_inf != 0) || !g1_from_raw(b, b_raw, b_inf != 0)) return -1;
  g1_to_raw(pt_add(a, b), out, out_inf);
  return 0;
}

int kzgn_g2_add(const u8* a_raw, int a_inf, const u8* b_raw, int b_inf, u8* out,
                u8* out_inf) {
  ensure_init();
  Point<Fp2> a, b;
  if (!g2_from_raw(a, a_raw, a_inf != 0) || !g2_from_raw(b, b_raw, b_inf != 0)) return -1;
  g2_to_raw(pt_add(a, b), out, out_inf);
  return 0;
}

// fixed-base power ladder: out[i] = base * s^i for i in 0..n  (SRS generation;
// reference lib.rs:38-55 semantics, done host-side at native speed)
int kzgn_g1_powers(const u8* base_raw, const u8* s /*32B LE*/, long n, u8* out /*96n*/) {
  ensure_init();
  Point<Fp> base;
  if (!g1_from_raw(base, base_raw, false)) return -1;
  u64 sw[4];
  for (int i = 0; i < 4; i++) {
    u64 w = 0;
    for (int j = 7; j >= 0; j--) w = (w << 8) | s[i * 8 + j];
    sw[i] = w;
  }
  Point<Fp> cur = base;
  for (long i = 0; i < n; i++) {
    g1_to_raw(cur, out + i * 96, nullptr);
    if (i + 1 < n) cur = pt_mul_ct(cur, sw);
  }
  return 0;
}

int kzgn_g2_powers(const u8* base_raw, const u8* s, long n, u8* out /*192n*/) {
  ensure_init();
  Point<Fp2> base;
  if (!g2_from_raw(base, base_raw, false)) return -1;
  u64 sw[4];
  for (int i = 0; i < 4; i++) {
    u64 w = 0;
    for (int j = 7; j >= 0; j--) w = (w << 8) | s[i * 8 + j];
    sw[i] = w;
  }
  Point<Fp2> cur = base;
  for (long i = 0; i < n; i++) {
    g2_to_raw(cur, out + i * 192, nullptr);
    if (i + 1 < n) cur = pt_mul_ct(cur, sw);
  }
  return 0;
}

// -- compressed codecs (ZCash format, blstrs-compatible) --------------------

int kzgn_g1_compress(const u8* raw, int inf, u8* out48) {
  ensure_init();
  if (inf) {
    memset(out48, 0, 48);
    out48[0] = 0x80 | 0x40;
    return 0;
  }
  Fp x, y;
  if (!fp_from_be48(x, raw) || !fp_from_be48(y, raw + 48)) return -1;
  fp_to_be48(x, out48);
  out48[0] |= 0x80;
  if (fp_lex_largest(y)) out48[0] |= 0x20;
  return 0;
}

// returns 0 ok (out_inf set), negative on invalid encoding
int kzgn_g1_decompress(const u8* in48, u8* out_raw, u8* out_inf, int subgroup_check) {
  ensure_init();
  u8 b0 = in48[0];
  if (!(b0 & 0x80)) return -2;
  bool inf = b0 & 0x40, sort = b0 & 0x20;
  u8 body[48];
  memcpy(body, in48, 48);
  body[0] &= 0x1F;
  if (inf) {
    for (int i = 0; i < 48; i++)
      if (body[i] || sort) return -3;
    *out_inf = 1;
    memset(out_raw, 0, 96);
    return 0;
  }
  Fp x;
  if (!fp_from_be48(x, body)) return -4;
  // y^2 = x^3 + 4
  u64 four[6] = {4, 0, 0, 0, 0, 0};
  Fp b;
  FP.to_mont(b.v, four);
  Fp rhs = x.square() * x + b;
  Fp y;
  if (!fp_sqrt(y, rhs)) return -5;
  if (fp_lex_largest(y) != sort) y = -y;
  Point<Fp> p = {x, y, Fp::one()};
  if (subgroup_check && !in_subgroup(p)) return -6;
  *out_inf = 0;
  fp_to_be48(x, out_raw);
  fp_to_be48(y, out_raw + 48);
  return 0;
}

int kzgn_g2_compress(const u8* raw, int inf, u8* out96) {
  ensure_init();
  if (inf) {
    memset(out96, 0, 96);
    out96[0] = 0x80 | 0x40;
    return 0;
  }
  Fp2 x, y;
  if (!fp2_from_raw(x, raw) || !fp2_from_raw(y, raw + 96)) return -1;
  fp2_to_raw(x, out96);
  out96[0] |= 0x80;
  if (fp2_lex_largest(y)) out96[0] |= 0x20;
  return 0;
}

int kzgn_g2_decompress(const u8* in96, u8* out_raw, u8* out_inf, int subgroup_check) {
  ensure_init();
  u8 b0 = in96[0];
  if (!(b0 & 0x80)) return -2;
  bool inf = b0 & 0x40, sort = b0 & 0x20;
  u8 body[96];
  memcpy(body, in96, 96);
  body[0] &= 0x1F;
  if (inf) {
    for (int i = 0; i < 96; i++)
      if (body[i] || sort) return -3;
    *out_inf = 1;
    memset(out_raw, 0, 192);
    return 0;
  }
  Fp2 x;
  if (!fp2_from_raw(x, body)) return -4;
  u64 four[6] = {4, 0, 0, 0, 0, 0};
  Fp b1;
  FP.to_mont(b1.v, four);
  Fp2 b = {b1, b1};
  Fp2 rhs = x.square() * x + b;
  Fp2 y;
  if (!fp2_sqrt(y, rhs)) return -5;
  if (fp2_lex_largest(y) != sort) y = -y;
  Point<Fp2> p = {x, y, Fp2::one()};
  if (subgroup_check && !in_subgroup(p)) return -6;
  *out_inf = 0;
  fp2_to_raw(x, out_raw);
  fp2_to_raw(y, out_raw + 96);
  return 0;
}

// -- pairing ----------------------------------------------------------------

// product-of-pairings check: prod e(P_i, Q_i) == 1.
// g1s: n*96B raw, g2s: n*192B raw. Returns 1 (true), 0 (false), <0 error.
int kzgn_pairing_check(const u8* g1s, const u8* g1infs, const u8* g2s, const u8* g2infs,
                       long n) {
  ensure_init();
  Fp12 f = Fp12::one();
  for (long i = 0; i < n; i++) {
    bool i1 = g1infs[i], i2 = g2infs[i];
    Fp px = Fp::zero(), py = Fp::zero();
    Fp2 qx = Fp2::zero(), qy = Fp2::zero();
    if (!i1 && (!fp_from_be48(px, g1s + i * 96) || !fp_from_be48(py, g1s + i * 96 + 48)))
      return -1;
    if (!i2 && (!fp2_from_raw(qx, g2s + i * 192) || !fp2_from_raw(qy, g2s + i * 192 + 96)))
      return -1;
    f = f * miller_loop(px, py, i1, qx, qy, i2);
  }
  return final_exponentiation(f) == Fp12::one() ? 1 : 0;
}

// full pairing value, for Gt equality tests:
// out = 12 * 48B big-endian Fp components in order
// [c0.c0.a, c0.c0.b, c0.c1.a, c0.c1.b, c0.c2.a, c0.c2.b,
//  c1.c0.a, c1.c0.b, c1.c1.a, c1.c1.b, c1.c2.a, c1.c2.b]
int kzgn_pairing(const u8* g1, int inf1, const u8* g2, int inf2, u8* out /*576B*/) {
  ensure_init();
  Fp px = Fp::zero(), py = Fp::zero();
  Fp2 qx = Fp2::zero(), qy = Fp2::zero();
  if (!inf1 && (!fp_from_be48(px, g1) || !fp_from_be48(py, g1 + 48))) return -1;
  if (!inf2 && (!fp2_from_raw(qx, g2) || !fp2_from_raw(qy, g2 + 96))) return -1;
  Fp12 r = final_exponentiation(miller_loop(px, py, inf1 != 0, qx, qy, inf2 != 0));
  const Fp comps[12] = {r.c0.c0.a, r.c0.c0.b, r.c0.c1.a, r.c0.c1.b,
                        r.c0.c2.a, r.c0.c2.b, r.c1.c0.a, r.c1.c0.b,
                        r.c1.c1.a, r.c1.c1.b, r.c1.c2.a, r.c1.c2.b};
  for (int i = 0; i < 12; i++) fp_to_be48(comps[i], out + i * 48);
  return 0;
}

// -- curve predicates -------------------------------------------------------

int kzgn_g1_on_curve(const u8* raw, int inf) {
  ensure_init();
  Point<Fp> p;
  if (!g1_from_raw(p, raw, inf != 0)) return -1;
  return g1_on_curve(p) ? 1 : 0;
}

int kzgn_g2_on_curve(const u8* raw, int inf) {
  ensure_init();
  Point<Fp2> p;
  if (!g2_from_raw(p, raw, inf != 0)) return -1;
  return g2_on_curve(p) ? 1 : 0;
}

int kzgn_g1_in_subgroup(const u8* raw, int inf) {
  ensure_init();
  Point<Fp> p;
  if (!g1_from_raw(p, raw, inf != 0)) return -1;
  return in_subgroup(p) ? 1 : 0;
}

int kzgn_g2_in_subgroup(const u8* raw, int inf) {
  ensure_init();
  Point<Fp2> p;
  if (!g2_from_raw(p, raw, inf != 0)) return -1;
  return in_subgroup(p) ? 1 : 0;
}

}  // extern "C"
