// Test-only extern "C" shim around the REFERENCE rANS core so pytest can
// drive it through ctypes as a binary interop oracle.
//
// The reference library (/root/reference/src/cpp/rans/rans.cpp) is
// freestanding C++17; its pybind11 layer (py_rans.cpp) only does numpy
// conversion + substream framing, which the tests replicate in Python
// (tests/ref_oracle/__init__.py) against the documented layout
// (py_rans.cpp:91-136).  This file is compiled OUT OF TREE with
//   g++ -I /root/reference/src/cpp/rans shim.cc rans.cpp
// and never ships in the production library.
#include "rans.h"

#include <cstring>
#include <memory>
#include <vector>

namespace {

template <typename T>
std::shared_ptr<std::vector<T>> vec_of(const T *p, long n) {
  return std::make_shared<std::vector<T>>(p, p + n);
}

std::shared_ptr<std::vector<std::vector<int32_t>>>
cdf_matrix(const int32_t *cdfs, int cdf_num, int per_len) {
  auto m = std::make_shared<std::vector<std::vector<int32_t>>>(cdf_num);
  for (int i = 0; i < cdf_num; ++i)
    m->at(i).assign(cdfs + (long)i * per_len, cdfs + (long)(i + 1) * per_len);
  return m;
}

} // namespace

extern "C" {

void *ref_enc_new() { return new RansEncoderLib(); }
void ref_enc_free(void *e) { delete static_cast<RansEncoderLib *>(e); }

int ref_enc_add_cdf(void *e, const int32_t *cdfs, int cdf_num, int per_len,
                    const int32_t *sizes, const int32_t *offsets) {
  return static_cast<RansEncoderLib *>(e)->add_cdf(
      cdf_matrix(cdfs, cdf_num, per_len), vec_of(sizes, cdf_num),
      vec_of(offsets, cdf_num));
}

void ref_enc_encode(void *e, const int16_t *sym, const int16_t *idx, long n,
                    int group) {
  static_cast<RansEncoderLib *>(e)->encode_with_indexes(
      vec_of(sym, n), vec_of(idx, n), group);
}

void ref_enc_reset(void *e) { static_cast<RansEncoderLib *>(e)->reset(); }

// flush + copy out; returns byte count, or -1 if cap is too small.
long ref_enc_flush_get(void *e, uint8_t *out, long cap) {
  auto *enc = static_cast<RansEncoderLib *>(e);
  enc->flush();
  std::vector<uint8_t> s = enc->get_encoded_stream();
  if ((long)s.size() > cap)
    return -1;
  if (!s.empty())
    std::memcpy(out, s.data(), s.size());
  return (long)s.size();
}

void *ref_dec_new() { return new RansDecoderLib(); }
void ref_dec_free(void *d) { delete static_cast<RansDecoderLib *>(d); }

int ref_dec_add_cdf(void *d, const int32_t *cdfs, int cdf_num, int per_len,
                    const int32_t *sizes, const int32_t *offsets) {
  return static_cast<RansDecoderLib *>(d)->add_cdf(
      cdf_matrix(cdfs, cdf_num, per_len), vec_of(sizes, cdf_num),
      vec_of(offsets, cdf_num));
}

void ref_dec_set_stream(void *d, const uint8_t *data, long n) {
  static_cast<RansDecoderLib *>(d)->set_stream(vec_of(data, n));
}

void ref_dec_decode(void *d, const int16_t *idx, long n, int group,
                    int16_t *out) {
  std::vector<int16_t> res = static_cast<RansDecoderLib *>(d)->decode_stream(
      vec_of(idx, n), group);
  if (!res.empty())
    std::memcpy(out, res.data(), res.size() * sizeof(int16_t));
}

} // extern "C"
