// llamavk_native — native host-side data plane for the TPU inference engine.
//
// The reference implements its host data plane in C (ggml.c quantize /
// dequantize row codecs, ggml.c:509-1180 and ggml.c:10520-10570), C++ RAII OS
// wrappers (llama_util.h:60-382 mmap/file), and repack compute shaders that
// convert disk Q4_0 blocks into the device-preferred layout
// (vulkan/llama-vk.hlsl:1432-1589 KernelUploadQ4_0_{linear,swz}, driven by the
// pipelined uploader vulkan/llama-vk.cpp:1479-2062).
//
// This library is the TPU framework's native equivalent of those components:
// Python/JAX keeps the control plane (file parsing, pytrees, jit), while the
// load/quantize hot paths — gigabytes of byte shuffling per model — run here,
// multithreaded. Exposed as a plain C ABI consumed via ctypes
// (llamavk_tpu/native.py); every entry point has a NumPy reference
// implementation it is parity-tested against (tests/test_native.py).
//
// Build: make -C native   (g++ -O3 -march=native -shared -fPIC)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <queue>
#include <string>
#include <string_view>
#include <thread>
#include <unordered_map>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr int QK = 32;                    // block size (ggml.c:416)
constexpr int Q4_0_BLOCK_BYTES = 4 + 16;  // f32 d + 16 nibble bytes
constexpr int Q4_1_BLOCK_BYTES = 8 + 16;  // f32 d + f32 m + 16 nibble bytes

int default_threads() {
  unsigned n = std::thread::hardware_concurrency();
  if (n <= 1) {
    // some containers report 1 (or 0) here; trust the scheduler instead
    long sc = sysconf(_SC_NPROCESSORS_ONLN);
    if (sc > 0) n = static_cast<unsigned>(sc);
  }
  return n == 0 ? 4 : static_cast<int>(n);
}

// Fork-join parallel-for over [0, n) split into contiguous ranges.
template <typename F>
void parallel_for(int64_t n, int nthreads, F&& fn) {
  if (nthreads <= 0) nthreads = default_threads();
  nthreads = static_cast<int>(std::min<int64_t>(nthreads, std::max<int64_t>(n, 1)));
  if (nthreads <= 1) {
    fn(int64_t{0}, n);
    return;
  }
  std::vector<std::thread> pool;
  pool.reserve(nthreads - 1);
  int64_t chunk = (n + nthreads - 1) / nthreads;
  for (int t = 1; t < nthreads; ++t) {
    int64_t lo = t * chunk, hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    pool.emplace_back([=, &fn] { fn(lo, hi); });
  }
  fn(int64_t{0}, std::min(n, chunk));
  for (auto& th : pool) th.join();
}

inline float fp16_to_fp32(uint16_t h) {
  // bit-exact IEEE binary16 → binary32 (incl. subnormals, inf, NaN)
  uint32_t sign = static_cast<uint32_t>(h & 0x8000u) << 16;
  uint32_t exp = (h >> 10) & 0x1F;
  uint32_t man = h & 0x3FF;
  uint32_t bits;
  if (exp == 0) {
    if (man == 0) {
      bits = sign;
    } else {  // subnormal: normalize
      int shift = 0;
      while (!(man & 0x400)) {
        man <<= 1;
        ++shift;
      }
      man &= 0x3FF;
      bits = sign | ((127 - 15 - shift + 1) << 23) | (man << 13);
    }
  } else if (exp == 31) {
    bits = sign | 0x7F800000u | (man << 13);
  } else {
    bits = sign | ((exp - 15 + 127) << 23) | (man << 13);
  }
  float out;
  std::memcpy(&out, &bits, 4);
  return out;
}

// C roundf semantics: round half away from zero.
inline float round_away(float x) { return std::roundf(x); }

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// version / capability report (the ggml_cpu_has_* analog, ggml.h:779-790)

int lvk_version() { return 1; }
int lvk_hardware_threads() { return default_threads(); }

// ---------------------------------------------------------------------------
// Quantize: f32 → Q4_0 / Q4_1 block streams (ggml_quantize_q4_0/_q4_1,
// ggml.c:10520-10570, math of quantize_row_q4_{0,1}_reference ggml.c:509,800).
// x: n floats (n % 32 == 0). out: block stream. hist: int64[16] (may be null).
// Returns bytes written.

int64_t lvk_quantize_q4_0(const float* x, int64_t n, uint8_t* out,
                          int64_t* hist, int nthreads) {
  int64_t nb = n / QK;
  std::vector<std::vector<int64_t>> hists;
  std::atomic<int> tcount{0};
  int nt = nthreads <= 0 ? default_threads() : nthreads;
  hists.resize(nt);
  std::atomic<int> next_slot{0};
  parallel_for(nb, nt, [&](int64_t lo, int64_t hi) {
    int slot = next_slot.fetch_add(1);
    auto& h = hists[slot];
    if (hist) h.assign(16, 0);
    for (int64_t b = lo; b < hi; ++b) {
      const float* xb = x + b * QK;
      uint8_t* ob = out + b * Q4_0_BLOCK_BYTES;
      float amax = 0.f;
      for (int i = 0; i < QK; ++i) amax = std::max(amax, std::fabs(xb[i]));
      float d = amax / 7.0f;
      float inv = d != 0.0f ? 1.0f / d : 0.0f;
      std::memcpy(ob, &d, 4);
      for (int i = 0; i < QK; i += 2) {
        int q0 = static_cast<int>(round_away(xb[i] * inv)) + 8;
        int q1 = static_cast<int>(round_away(xb[i + 1] * inv)) + 8;
        q0 = std::clamp(q0, 0, 15);
        q1 = std::clamp(q1, 0, 15);
        ob[4 + i / 2] = static_cast<uint8_t>(q0 | (q1 << 4));
        if (hist) {
          ++h[q0];
          ++h[q1];
        }
      }
    }
    (void)tcount;
  });
  if (hist) {
    std::fill(hist, hist + 16, 0);
    for (auto& h : hists)
      for (size_t i = 0; i < h.size(); ++i) hist[i] += h[i];
  }
  return nb * Q4_0_BLOCK_BYTES;
}

int64_t lvk_quantize_q4_1(const float* x, int64_t n, uint8_t* out,
                          int64_t* hist, int nthreads) {
  int64_t nb = n / QK;
  int nt = nthreads <= 0 ? default_threads() : nthreads;
  std::vector<std::vector<int64_t>> hists(nt);
  std::atomic<int> next_slot{0};
  parallel_for(nb, nt, [&](int64_t lo, int64_t hi) {
    int slot = next_slot.fetch_add(1);
    auto& h = hists[slot];
    if (hist) h.assign(16, 0);
    for (int64_t b = lo; b < hi; ++b) {
      const float* xb = x + b * QK;
      uint8_t* ob = out + b * Q4_1_BLOCK_BYTES;
      float mn = xb[0], mx = xb[0];
      for (int i = 1; i < QK; ++i) {
        mn = std::min(mn, xb[i]);
        mx = std::max(mx, xb[i]);
      }
      float d = (mx - mn) / 15.0f;
      float inv = d != 0.0f ? 1.0f / d : 0.0f;
      std::memcpy(ob, &d, 4);
      std::memcpy(ob + 4, &mn, 4);
      for (int i = 0; i < QK; i += 2) {
        int q0 = static_cast<int>(round_away((xb[i] - mn) * inv));
        int q1 = static_cast<int>(round_away((xb[i + 1] - mn) * inv));
        q0 = std::clamp(q0, 0, 15);
        q1 = std::clamp(q1, 0, 15);
        ob[8 + i / 2] = static_cast<uint8_t>(q0 | (q1 << 4));
        if (hist) {
          ++h[q0];
          ++h[q1];
        }
      }
    }
  });
  if (hist) {
    std::fill(hist, hist + 16, 0);
    for (auto& h : hists)
      for (size_t i = 0; i < h.size(); ++i) hist[i] += h[i];
  }
  return nb * Q4_1_BLOCK_BYTES;
}

// ---------------------------------------------------------------------------
// Dequantize block streams → f32 (dequantize_row_q4_{0,1}, ggml.c:962,1080)

void lvk_dequantize_q4_0(const uint8_t* blocks, int64_t n, float* out,
                         int nthreads) {
  int64_t nb = n / QK;
  parallel_for(nb, nthreads, [&](int64_t lo, int64_t hi) {
    for (int64_t b = lo; b < hi; ++b) {
      const uint8_t* ib = blocks + b * Q4_0_BLOCK_BYTES;
      float d;
      std::memcpy(&d, ib, 4);
      float* ob = out + b * QK;
      for (int i = 0; i < QK; i += 2) {
        uint8_t byte = ib[4 + i / 2];
        ob[i] = (static_cast<int>(byte & 0xF) - 8) * d;
        ob[i + 1] = (static_cast<int>(byte >> 4) - 8) * d;
      }
    }
  });
}

void lvk_dequantize_q4_1(const uint8_t* blocks, int64_t n, float* out,
                         int nthreads) {
  int64_t nb = n / QK;
  parallel_for(nb, nthreads, [&](int64_t lo, int64_t hi) {
    for (int64_t b = lo; b < hi; ++b) {
      const uint8_t* ib = blocks + b * Q4_1_BLOCK_BYTES;
      float d, m;
      std::memcpy(&d, ib, 4);
      std::memcpy(&m, ib + 4, 4);
      float* ob = out + b * QK;
      for (int i = 0; i < QK; i += 2) {
        uint8_t byte = ib[8 + i / 2];
        ob[i] = static_cast<int>(byte & 0xF) * d + m;
        ob[i + 1] = static_cast<int>(byte >> 4) * d + m;
      }
    }
  });
}

// fp16 stream → f32 (the KernelUploadF32toF16 direction inverted; G7 analog)
void lvk_fp16_to_fp32(const uint16_t* in, int64_t n, float* out, int nthreads) {
  parallel_for(n, nthreads, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) out[i] = fp16_to_fp32(in[i]);
  });
}

// ---------------------------------------------------------------------------
// Repack: disk Q4 block stream → TPU device planes (the upload-shader analog,
// vulkan/llama-vk.hlsl:1432-1589; layout contract in formats/repack.py).
//
// Input: `raw` = N rows (output channels) x G blocks of Q4_0/Q4_1.
// Output: packed int8 [K/2, N] split-half nibbles, scales f32 [G, N],
//         bias f32 [G, N] (Q4_1 only; bias = m + 8 d, folding the signed
//         nibble shift). `layout`: 0 = ilv (storage row r holds original
//         k = (r % Gc)*32 + r//Gc per chunk), 1 = lin. `chunks` packs each of
//         the chunks contiguous K-slices independently (TP row shards).

void lvk_repack_q4(const uint8_t* raw, int64_t n_rows, int64_t row_elems,
                   int is_q4_1, int layout, int chunks, int8_t* packed,
                   float* scales, float* bias, int nthreads) {
  const int64_t K = row_elems, N = n_rows;
  const int64_t G = K / QK;
  const int64_t Kc = K / chunks, Gc = Kc / QK;
  const int64_t block_bytes = is_q4_1 ? Q4_1_BLOCK_BYTES : Q4_0_BLOCK_BYTES;
  const int64_t nib_off = is_q4_1 ? 8 : 4;
  const int64_t row_bytes = G * block_bytes;
  const int64_t TILE = 128;  // columns (disk rows) per work item

  int64_t n_tiles = (N + TILE - 1) / TILE;
  parallel_for(n_tiles, nthreads, [&](int64_t t0, int64_t t1) {
    // per-tile scratch: decoded signed nibbles, column-major [tile][K]
    std::vector<int8_t> q(static_cast<size_t>(TILE * K));
    for (int64_t tile = t0; tile < t1; ++tile) {
      int64_t n0 = tile * TILE;
      int64_t tw = std::min(TILE, N - n0);
      // 1) decode this tile's disk rows (sequential reads), emit scales/bias
      for (int64_t c = 0; c < tw; ++c) {
        const uint8_t* row = raw + (n0 + c) * row_bytes;
        int8_t* qr = q.data() + c * K;
        for (int64_t g = 0; g < G; ++g) {
          const uint8_t* blk = row + g * block_bytes;
          float d;
          std::memcpy(&d, blk, 4);
          scales[g * N + n0 + c] = d;
          if (is_q4_1) {
            float m;
            std::memcpy(&m, blk + 4, 4);
            bias[g * N + n0 + c] = m + 8.0f * d;
          }
          const uint8_t* nib = blk + nib_off;
          int8_t* qe = qr + g * QK;
          for (int i = 0; i < QK / 2; ++i) {
            uint8_t byte = nib[i];
            qe[2 * i] = static_cast<int8_t>(static_cast<int>(byte & 0xF) - 8);
            qe[2 * i + 1] = static_cast<int8_t>(static_cast<int>(byte >> 4) - 8);
          }
        }
      }
      // 2) pack: for each chunk, interleave + split-half into [K/2, N]
      for (int64_t c = 0; c < chunks; ++c) {
        const int64_t base_k = c * Kc;
        const int64_t base_r = c * (Kc / 2);
        for (int64_t rh = 0; rh < Kc / 2; ++rh) {
          int64_t k_lo, k_hi;
          if (layout == 0) {  // ilv: perm[r] = (r % Gc)*QK + r/Gc
            k_lo = (rh % Gc) * QK + rh / Gc;
            int64_t r2 = rh + Kc / 2;
            k_hi = (r2 % Gc) * QK + r2 / Gc;
          } else {  // lin
            k_lo = rh;
            k_hi = rh + Kc / 2;
          }
          k_lo += base_k;
          k_hi += base_k;
          int8_t* dst = packed + (base_r + rh) * N + n0;
          for (int64_t col = 0; col < tw; ++col) {
            int lo = q[col * K + k_lo];
            int hi = q[col * K + k_hi];
            dst[col] = static_cast<int8_t>((lo & 0xF) | ((hi & 0xF) << 4));
          }
        }
      }
    }
  });
}

// Embedding-table variant: rows stay rows (gather by token id), split-half
// packed along the embedding dim. packed int8 [V, K/2], scales f32 [V, G],
// bias f32 [V, G] (Q4_1). Mirrors loader._pack_embedding_rows.
void lvk_repack_q4_rows(const uint8_t* raw, int64_t n_rows, int64_t row_elems,
                        int is_q4_1, int8_t* packed, float* scales, float* bias,
                        int nthreads) {
  const int64_t K = row_elems;
  const int64_t G = K / QK;
  const int64_t block_bytes = is_q4_1 ? Q4_1_BLOCK_BYTES : Q4_0_BLOCK_BYTES;
  const int64_t nib_off = is_q4_1 ? 8 : 4;
  const int64_t row_bytes = G * block_bytes;
  parallel_for(n_rows, nthreads, [&](int64_t lo_r, int64_t hi_r) {
    std::vector<int8_t> q(static_cast<size_t>(K));
    for (int64_t r = lo_r; r < hi_r; ++r) {
      const uint8_t* row = raw + r * row_bytes;
      for (int64_t g = 0; g < G; ++g) {
        const uint8_t* blk = row + g * block_bytes;
        float d;
        std::memcpy(&d, blk, 4);
        scales[r * G + g] = d;
        if (is_q4_1) {
          float m;
          std::memcpy(&m, blk + 4, 4);
          bias[r * G + g] = m + 8.0f * d;
        }
        const uint8_t* nib = blk + nib_off;
        for (int i = 0; i < QK / 2; ++i) {
          uint8_t byte = nib[i];
          q[g * QK + 2 * i] = static_cast<int8_t>((byte & 0xF) - 8);
          q[g * QK + 2 * i + 1] = static_cast<int8_t>((byte >> 4) - 8);
        }
      }
      int8_t* dst = packed + r * (K / 2);
      for (int64_t i = 0; i < K / 2; ++i) {
        int lo = q[i];
        int hi = q[i + K / 2];
        dst[i] = static_cast<int8_t>((lo & 0xF) | ((hi & 0xF) << 4));
      }
    }
  });
}

// ---------------------------------------------------------------------------
// mmap file wrappers (llama_mmap, llama_util.h:170-254): map read-only with
// MAP_POPULATE-style prefetch hints so repack streams at disk/page-cache speed.

void* lvk_mmap_open(const char* path, int64_t* size_out) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    close(fd);
    return nullptr;
  }
  void* addr = mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  close(fd);
  if (addr == MAP_FAILED) return nullptr;
#ifdef MADV_WILLNEED
  madvise(addr, st.st_size, MADV_WILLNEED);
#endif
  *size_out = st.st_size;
  return addr;
}

void lvk_mmap_close(void* addr, int64_t size) {
  if (addr) munmap(addr, size);
}

// --- tokenizer: SentencePiece-style greedy bigram merge ---------------------
// Twin of llamavk_tpu/tokenizer.py (itself a behavioral re-implementation of
// the reference tokenizer, llama.cpp:1199-1350). Must stay BIT-IDENTICAL to
// the Python twin: same heap ordering ((-score, left, right, size) ascending
// == score desc, then leftmost pair), same stale-entry skip, same byte
// fallback (id = byte + 3). tests/test_native.py cross-checks.

struct LvkTokenizer {
  std::unordered_map<std::string, int32_t> token_to_id;
  std::vector<float> scores;
};

void* lvk_tokenizer_create(const uint8_t* texts, const int64_t* offsets,
                           const float* scores, int64_t n_vocab) {
  auto* tk = new LvkTokenizer();
  tk->scores.assign(scores, scores + n_vocab);
  tk->token_to_id.reserve((size_t)n_vocab * 2);
  for (int64_t i = 0; i < n_vocab; ++i) {
    // later duplicates overwrite earlier ids (map assignment order)
    tk->token_to_id[std::string((const char*)texts + offsets[i],
                                (size_t)(offsets[i + 1] - offsets[i]))] =
        (int32_t)i;
  }
  return tk;
}

void lvk_tokenizer_free(void* h) { delete (LvkTokenizer*)h; }

int64_t lvk_tokenize(void* h, const uint8_t* data, int64_t n, int32_t* out,
                     int64_t out_cap) {
  static const int kUtf8Len[16] = {1, 1, 1, 1, 1, 1, 1, 1,
                                   1, 1, 1, 1, 2, 2, 3, 4};
  auto* tk = (LvkTokenizer*)h;
  if (n <= 0) return 0;

  std::vector<int64_t> starts, lens, prev, nxt;
  for (int64_t off = 0; off < n;) {
    int64_t len = kUtf8Len[data[off] >> 4];
    if (len > n - off) len = n - off;
    starts.push_back(off);
    lens.push_back(len);
    off += len;
  }
  int64_t count = (int64_t)starts.size();
  prev.resize(count);
  nxt.resize(count);
  for (int64_t i = 0; i < count; ++i) {
    prev[i] = i - 1;
    nxt[i] = i + 1 < count ? i + 1 : -1;
  }

  struct Entry {
    float neg_score;
    int64_t left, right, size;
    bool operator>(const Entry& o) const {  // min-heap on the Python tuple
      if (neg_score != o.neg_score) return neg_score > o.neg_score;
      if (left != o.left) return left > o.left;
      if (right != o.right) return right > o.right;
      return size > o.size;
    }
  };
  std::priority_queue<Entry, std::vector<Entry>, std::greater<Entry>> heap;

  auto try_add = [&](int64_t left, int64_t right) {
    if (left < 0 || right < 0) return;
    int64_t s = starts[left];
    int64_t size = lens[left] + lens[right];
    auto it = tk->token_to_id.find(
        std::string((const char*)data + s, (size_t)size));
    if (it == tk->token_to_id.end()) return;
    heap.push(Entry{-tk->scores[it->second], left, right, size});
  };
  for (int64_t i = 1; i < count; ++i) try_add(i - 1, i);

  while (!heap.empty()) {
    Entry e = heap.top();
    heap.pop();
    if (lens[e.left] == 0 || lens[e.right] == 0 ||
        lens[e.left] + lens[e.right] != e.size)
      continue;  // stale: a symbol was already merged
    lens[e.left] += lens[e.right];
    lens[e.right] = 0;
    nxt[e.left] = nxt[e.right];
    if (nxt[e.right] >= 0) prev[nxt[e.right]] = e.left;
    try_add(prev[e.left], e.left);
    try_add(e.left, nxt[e.left]);
  }

  int64_t m = 0;
  for (int64_t i = 0; i != -1; i = nxt[i]) {
    int64_t s = starts[i], len = lens[i];
    auto it = tk->token_to_id.find(
        std::string((const char*)data + s, (size_t)len));
    if (it == tk->token_to_id.end()) {
      for (int64_t b = 0; b < len; ++b) {
        if (m >= out_cap) return -1;
        out[m++] = (int32_t)data[s + b] + 3;  // byte fallback
      }
    } else {
      if (m >= out_cap) return -1;
      out[m++] = it->second;
    }
  }
  return m;
}

}  // extern "C"
