// BN254 Fr field kernels as XLA:CPU FFI custom calls.
//
// Role: the witness models trace to HLO graphs with hundreds of
// Montgomery-multiply call sites; XLA:CPU compile cost is superlinear in
// module size (measured: RollupTx alone ~250s / 93k HLO lines with the
// mul inlined as limb ops). On CPU each field op becomes ONE custom-call
// instruction backed by this library — compile collapses, and the 4x64
// __int128 CIOS is also faster at runtime than XLA's generated 16x16
// limb code. The TPU path is untouched (pure XLA/Pallas limb kernels in
// circuits_tpu/field/fr.py); this is the CPU analogue of the reference's
// ffiasm-generated x86-64 field library
// (reference: tools/helpers/actions.js:207-229).
//
// Data layout: batch-major uint32 arrays of shape (N, 16) — 16
// little-endian 16-bit limbs per element, batch dim leading so the
// targets can be registered as batch-partitionable under GSPMD.

#include <cstdint>
#include <cstring>

#include "xla/ffi/api/ffi.h"

namespace ffi = xla::ffi;

typedef unsigned __int128 u128;
typedef uint64_t u64;
typedef uint32_t u32;

static const u64 Pl[4] = {
    0x43e1f593f0000001ULL, 0x2833e84879b97091ULL,
    0xb85045b68181585dULL, 0x30644e72e131a029ULL};
static const u64 N0 = 0xc2e1f593efffffffULL;

static inline bool geq(const u64* a, const u64* b) {
    for (int i = 3; i >= 0; --i) {
        if (a[i] > b[i]) return true;
        if (a[i] < b[i]) return false;
    }
    return true;
}

static inline void sub4(u64* r, const u64* a, const u64* b) {
    u128 borrow = 0;
    for (int i = 0; i < 4; ++i) {
        u128 d = (u128)a[i] - b[i] - borrow;
        r[i] = (u64)d;
        borrow = (d >> 64) ? 1 : 0;
    }
}

// CIOS Montgomery multiplication: r = a*b*R^-1 mod p (R = 2^256)
static inline void mont_mul4(u64* r, const u64* a, const u64* b) {
    u64 t[6] = {0, 0, 0, 0, 0, 0};
    for (int i = 0; i < 4; ++i) {
        u128 carry = 0;
        for (int j = 0; j < 4; ++j) {
            u128 s = (u128)t[j] + (u128)a[j] * b[i] + carry;
            t[j] = (u64)s;
            carry = s >> 64;
        }
        u128 s = (u128)t[4] + carry;
        t[4] = (u64)s;
        t[5] = (u64)(s >> 64);

        u64 m = t[0] * N0;
        carry = ((u128)t[0] + (u128)m * Pl[0]) >> 64;
        for (int j = 1; j < 4; ++j) {
            u128 s2 = (u128)t[j] + (u128)m * Pl[j] + carry;
            t[j - 1] = (u64)s2;
            carry = s2 >> 64;
        }
        s = (u128)t[4] + carry;
        t[3] = (u64)s;
        t[4] = t[5] + (u64)(s >> 64);
    }
    if (t[4] || geq(t, Pl)) {
        sub4(r, t, Pl);
    } else {
        memcpy(r, t, 32);
    }
}

static inline void add_mod4(u64* r, const u64* a, const u64* b) {
    u128 carry = 0;
    u64 t[5];
    for (int i = 0; i < 4; ++i) {
        u128 s = (u128)a[i] + b[i] + carry;
        t[i] = (u64)s;
        carry = s >> 64;
    }
    t[4] = (u64)carry;
    if (t[4] || geq(t, Pl)) {
        sub4(r, t, Pl);
    } else {
        memcpy(r, t, 32);
    }
}

static inline void sub_mod4(u64* r, const u64* a, const u64* b) {
    if (geq(a, b)) {
        sub4(r, a, b);
    } else {
        u64 t[4];
        sub4(t, b, a);       // b - a
        if (t[0] | t[1] | t[2] | t[3]) {
            sub4(r, Pl, t);  // p - (b - a)
        } else {
            memset(r, 0, 32);
        }
    }
}

// (N,16) uint32 16-bit limbs <-> 4x64
static inline void load_fe(u64* v, const u32* limbs) {
    for (int j = 0; j < 4; ++j) {
        v[j] = (u64)limbs[4 * j] | ((u64)limbs[4 * j + 1] << 16) |
               ((u64)limbs[4 * j + 2] << 32) | ((u64)limbs[4 * j + 3] << 48);
    }
}

static inline void store_fe(u32* limbs, const u64* v) {
    for (int j = 0; j < 4; ++j) {
        limbs[4 * j] = (u32)(v[j] & 0xFFFF);
        limbs[4 * j + 1] = (u32)((v[j] >> 16) & 0xFFFF);
        limbs[4 * j + 2] = (u32)((v[j] >> 32) & 0xFFFF);
        limbs[4 * j + 3] = (u32)((v[j] >> 48) & 0xFFFF);
    }
}

typedef void (*binop4)(u64*, const u64*, const u64*);

static ffi::Error binop_impl(const ffi::Buffer<ffi::U32>& a,
                             const ffi::Buffer<ffi::U32>& b,
                             ffi::ResultBuffer<ffi::U32>& out, binop4 op) {
    const size_t n = a.element_count() / 16;
    const u32* ap = a.typed_data();
    const u32* bp = b.typed_data();
    u32* op_ = out->typed_data();
    for (size_t i = 0; i < n; ++i) {
        u64 av[4], bv[4], rv[4];
        load_fe(av, ap + 16 * i);
        load_fe(bv, bp + 16 * i);
        op(rv, av, bv);
        store_fe(op_ + 16 * i, rv);
    }
    return ffi::Error::Success();
}

static ffi::Error FrMontMulImpl(ffi::Buffer<ffi::U32> a,
                                ffi::Buffer<ffi::U32> b,
                                ffi::ResultBuffer<ffi::U32> out) {
    return binop_impl(a, b, out, mont_mul4);
}

static ffi::Error FrAddImpl(ffi::Buffer<ffi::U32> a, ffi::Buffer<ffi::U32> b,
                            ffi::ResultBuffer<ffi::U32> out) {
    return binop_impl(a, b, out, add_mod4);
}

static ffi::Error FrSubImpl(ffi::Buffer<ffi::U32> a, ffi::Buffer<ffi::U32> b,
                            ffi::ResultBuffer<ffi::U32> out) {
    return binop_impl(a, b, out, sub_mod4);
}

// a^e mod p for a fixed little-endian exponent passed as a u32 bit array
// (shared across the batch): one call replaces a 254-step fori_loop of
// custom calls. Input/output in the Montgomery domain.
static ffi::Error FrPowImpl(ffi::Buffer<ffi::U32> a,
                            ffi::Buffer<ffi::U32> ebits,
                            ffi::ResultBuffer<ffi::U32> out) {
    const size_t n = a.element_count() / 16;
    const size_t nbits = ebits.element_count();
    const u32* ap = a.typed_data();
    const u32* ep = ebits.typed_data();
    u32* op_ = out->typed_data();
    static const u64 R1l[4] = {
        0xac96341c4ffffffbULL, 0x36fc76959f60cd29ULL,
        0x666ea36f7879462eULL, 0x0e0a77c19a07df2fULL};
    for (size_t i = 0; i < n; ++i) {
        u64 base[4], acc[4];
        load_fe(base, ap + 16 * i);
        memcpy(acc, R1l, 32);  // Montgomery one
        for (size_t k = 0; k < nbits; ++k) {
            if (ep[k]) mont_mul4(acc, acc, base);
            mont_mul4(base, base, base);
        }
        store_fe(op_ + 16 * i, acc);
    }
    return ffi::Error::Success();
}

XLA_FFI_DEFINE_HANDLER_SYMBOL(
    FrMontMul, FrMontMulImpl,
    ffi::Ffi::Bind()
        .Arg<ffi::Buffer<ffi::U32>>()
        .Arg<ffi::Buffer<ffi::U32>>()
        .Ret<ffi::Buffer<ffi::U32>>());

XLA_FFI_DEFINE_HANDLER_SYMBOL(
    FrAdd, FrAddImpl,
    ffi::Ffi::Bind()
        .Arg<ffi::Buffer<ffi::U32>>()
        .Arg<ffi::Buffer<ffi::U32>>()
        .Ret<ffi::Buffer<ffi::U32>>());

XLA_FFI_DEFINE_HANDLER_SYMBOL(
    FrSub, FrSubImpl,
    ffi::Ffi::Bind()
        .Arg<ffi::Buffer<ffi::U32>>()
        .Arg<ffi::Buffer<ffi::U32>>()
        .Ret<ffi::Buffer<ffi::U32>>());

XLA_FFI_DEFINE_HANDLER_SYMBOL(
    FrPow, FrPowImpl,
    ffi::Ffi::Bind()
        .Arg<ffi::Buffer<ffi::U32>>()
        .Arg<ffi::Buffer<ffi::U32>>()
        .Ret<ffi::Buffer<ffi::U32>>());
