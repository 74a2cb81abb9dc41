/*
 * C scalar requantization oracles with native int64/float semantics.
 *
 * Independent re-implementation of the requantization math specified by the
 * reference (semantics documented at
 * /root/reference/src/requantization/{q31,precise,fp32,gemmlowp}-scalar.c and
 * src/qnnpack/requantization.h); used by the Python test suite as a
 * third-party cross-check of the numpy oracles and the on-device 32-bit-limb
 * implementations.  Exposed through ctypes (qnnpack_tpu/io/native.py).
 */

#include <math.h>
#include <stdint.h>
#include <string.h>

#define EXPORT __attribute__((visibility("default")))

static inline uint32_t fp32_bits(float x) {
  uint32_t b;
  memcpy(&b, &x, sizeof b);
  return b;
}

/* Q31: rounding-doubling high multiply + remainder-rounded shift. */
EXPORT void qt_requantize_q31(size_t n, const int32_t* input, float scale,
                              uint8_t zero_point, uint8_t qmin, uint8_t qmax,
                              uint8_t* output) {
  const uint32_t scale_bits = fp32_bits(scale);
  const int32_t multiplier =
      (int32_t)(((scale_bits & UINT32_C(0x007FFFFF)) | UINT32_C(0x00800000))
                << 7);
  const int32_t shift = 127 + 31 - 32 - (int32_t)(scale_bits >> 23);
  const int32_t mask = (int32_t)((UINT32_C(1) << shift) - 1);
  const int32_t threshold = (int32_t)((uint32_t)mask >> 1);
  const int32_t smin = (int32_t)qmin - (int32_t)zero_point;
  const int32_t smax = (int32_t)qmax - (int32_t)zero_point;
  for (size_t i = 0; i < n; i++) {
    const int32_t x = input[i];
    const int64_t product = (int64_t)x * (int64_t)multiplier;
    const int32_t q31 =
        (int32_t)(uint32_t)((uint64_t)(product + INT64_C(0x40000000)) >> 31);
    const int32_t rem = (q31 & mask) - (int32_t)(x < 0);
    int32_t v = (q31 >> shift) + (int32_t)(rem > threshold);
    if (v < smin) v = smin;
    if (v > smax) v = smax;
    output[i] = (uint8_t)(v + (int32_t)zero_point);
  }
}

/* Precise: exact 64-bit product, round half away from zero. */
EXPORT void qt_requantize_precise(size_t n, const int32_t* input, float scale,
                                  uint8_t zero_point, uint8_t qmin,
                                  uint8_t qmax, uint8_t* output) {
  const uint32_t scale_bits = fp32_bits(scale);
  const int32_t multiplier =
      ((int32_t)scale_bits & INT32_C(0x007FFFFF)) | INT32_C(0x00800000);
  const uint32_t shift = 127 + 23 - (scale_bits >> 23);
  const int64_t rounding = INT64_C(1) << (shift - 1);
  const int32_t smin = (int32_t)qmin - (int32_t)zero_point;
  const int32_t smax = (int32_t)qmax - (int32_t)zero_point;
  for (size_t i = 0; i < n; i++) {
    const int32_t x = input[i];
    const int64_t product = (int64_t)x * (int64_t)multiplier;
    const int64_t adjusted = product - (int64_t)(x < 0);
    int32_t v = (int32_t)((adjusted + rounding) >> shift);
    if (v < smin) v = smin;
    if (v > smax) v = smax;
    output[i] = (uint8_t)(v + (int32_t)zero_point);
  }
}

/* fp32: float multiply + lrintf (round half to even). */
EXPORT void qt_requantize_fp32(size_t n, const int32_t* input, float scale,
                               uint8_t zero_point, uint8_t qmin, uint8_t qmax,
                               uint8_t* output) {
  const long lmin = (long)((int32_t)qmin - (int32_t)zero_point);
  const long lmax = (long)((int32_t)qmax - (int32_t)zero_point);
  for (size_t i = 0; i < n; i++) {
    const float scaled = (float)input[i] * scale;
    long r = lrintf(scaled);
    if (r < lmin) r = lmin;
    if (r > lmax) r = lmax;
    output[i] = (uint8_t)((int32_t)r + (int32_t)zero_point);
  }
}

/* gemmlowp: sign-dependent nudge, truncating /2^31, threshold-rounded POT
 * divide, clamp after zero point. */
EXPORT void qt_requantize_gemmlowp(size_t n, const int32_t* input, float scale,
                                   uint8_t zero_point, uint8_t qmin,
                                   uint8_t qmax, uint8_t* output) {
  const uint32_t scale_bits = fp32_bits(scale);
  const int32_t multiplier =
      (int32_t)(((scale_bits & UINT32_C(0x007FFFFF)) | UINT32_C(0x00800000))
                << 7);
  const int32_t exponent = (int32_t)(scale_bits >> 23) - 127 - 23 - 7;
  const int32_t shift = -(32 - 1 + exponent);
  for (size_t i = 0; i < n; i++) {
    const int32_t x = input[i];
    const int64_t ab = (int64_t)x * (int64_t)multiplier;
    const int32_t nudge =
        ((x ^ multiplier) >= 0) ? INT32_C(0x40000000) : -INT32_C(0x3FFFFFFF);
    int32_t q = (int32_t)((ab + nudge) / INT64_C(0x80000000));
    if (shift > 0) {
      const int32_t mask = (1 << shift) - 1;
      const int32_t rem = q & mask;
      const int32_t threshold = (mask >> 1) + (int32_t)(q < 0);
      q = (q >> shift) + (int32_t)(rem > threshold);
    }
    int32_t v = q + (int32_t)zero_point;
    if (v < (int32_t)qmin) v = (int32_t)qmin;
    if (v > (int32_t)qmax) v = (int32_t)qmax;
    output[i] = (uint8_t)v;
  }
}
