// Native self-test: exact-value assertions on the q4 codecs and repack,
// mirroring the reference's tests/test-quantize.c (synthetic ramp, known
// scales/nibbles) plus a repack round-trip. Built by CMake/CI and run under
// the sanitizer matrix (the reference's SANITIZE_{THREAD,ADDRESS,UNDEFINED}
// CI idiom, CMakeLists.txt:50-52 / build.yml:66-100).

#include <cassert>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {
int64_t lvk_quantize_q4_0(const float*, int64_t, uint8_t*, int64_t*, int);
int64_t lvk_quantize_q4_1(const float*, int64_t, uint8_t*, int64_t*, int);
void lvk_dequantize_q4_0(const uint8_t*, int64_t, float*, int);
void lvk_dequantize_q4_1(const uint8_t*, int64_t, float*, int);
void lvk_repack_q4(const uint8_t*, int64_t, int64_t, int, int, int, int8_t*,
                   float*, float*, int);
void lvk_fp16_to_fp32(const uint16_t*, int64_t, float*, int);
}

#define CHECK(cond)                                                      \
  do {                                                                   \
    if (!(cond)) {                                                       \
      std::fprintf(stderr, "FAIL %s:%d: %s\n", __FILE__, __LINE__, #cond); \
      return 1;                                                          \
    }                                                                    \
  } while (0)

int main() {
  // --- q4_0 on a ramp 0..31 (the reference test's synthetic data idiom)
  std::vector<float> src(32);
  for (int i = 0; i < 32; ++i) src[i] = static_cast<float>(i);
  std::vector<uint8_t> blk(20);
  std::vector<int64_t> hist(16, 0);
  int64_t n = lvk_quantize_q4_0(src.data(), 32, blk.data(), hist.data(), 1);
  CHECK(n == 20);
  float d;
  std::memcpy(&d, blk.data(), 4);
  CHECK(std::fabs(d - 31.0f / 7.0f) < 1e-6f);  // scale = max/7
  int64_t hsum = 0;
  for (auto h : hist) hsum += h;
  CHECK(hsum == 32);

  std::vector<float> back(32);
  lvk_dequantize_q4_0(blk.data(), 32, back.data(), 1);
  for (int i = 0; i < 32; ++i) {
    float q = std::round(src[i] / d);
    CHECK(std::fabs(back[i] - q * d) < 1e-5f);
  }

  // --- q4_1 block size + min/scale
  std::vector<uint8_t> blk1(24);
  n = lvk_quantize_q4_1(src.data(), 32, blk1.data(), nullptr, 1);
  CHECK(n == 24);
  float d1, m1;
  std::memcpy(&d1, blk1.data(), 4);
  std::memcpy(&m1, blk1.data() + 4, 4);
  CHECK(std::fabs(d1 - 31.0f / 15.0f) < 1e-6f);  // (max-min)/15
  CHECK(m1 == 0.0f);

  // --- repack round-trip: quantize 4 rows of 64, repack ilv, check planes
  const int64_t N = 4, K = 64, G = K / 32;
  std::vector<float> w(N * K);
  for (int64_t i = 0; i < N * K; ++i) w[i] = 0.01f * static_cast<float>(i % 97) - 0.3f;
  std::vector<uint8_t> stream(N * G * 20);
  for (int64_t r = 0; r < N; ++r)
    lvk_quantize_q4_0(w.data() + r * K, K, stream.data() + r * G * 20, nullptr, 1);
  std::vector<int8_t> packed(K / 2 * N);
  std::vector<float> scales(G * N);
  lvk_repack_q4(stream.data(), N, K, 0, 0, 1, packed.data(), scales.data(),
                nullptr, 2);
  // dequantize both ways and compare: disk blocks vs packed planes
  for (int64_t col = 0; col < N; ++col) {
    std::vector<float> row(K);
    lvk_dequantize_q4_0(stream.data() + col * G * 20, K, row.data(), 1);
    for (int64_t r = 0; r < K / 2; ++r) {
      // ilv perm: storage row r holds original k = (r % G)*32 + r/G
      auto orig = [&](int64_t rr) { return (rr % G) * 32 + rr / G; };
      int lo = ((packed[r * N + col] & 0xF) ^ 8) - 8;  // sign-extend low nibble
      int hi = packed[r * N + col] >> 4;
      float s_lo = scales[(r % G) * N + col];
      float s_hi = scales[((r + K / 2) % G) * N + col];
      CHECK(std::fabs(lo * s_lo - row[orig(r)]) < 1e-5f);
      CHECK(std::fabs(hi * s_hi - row[orig(r + K / 2)]) < 1e-5f);
    }
  }

  // --- fp16: a few known patterns
  uint16_t h16[4] = {0x3C00, 0xC000, 0x0000, 0x7BFF};  // 1, -2, 0, 65504
  float f32[4];
  lvk_fp16_to_fp32(h16, 4, f32, 1);
  CHECK(f32[0] == 1.0f && f32[1] == -2.0f && f32[2] == 0.0f);
  CHECK(std::fabs(f32[3] - 65504.0f) < 1.0f);

  std::printf("native self-test: all checks passed\n");
  return 0;
}
