// Portable RNG: PCG64 (64-bit LCG + XSH-RR 64/32) + Marsaglia polar normals.
//
// C++ twin of terrain_diffusion_tpu/ops/rng_portable.py — the determinism
// contract of the framework's portable noise path.  Stream-compatible with
// the reference's numba implementation (portable_rng.py:45-74), which states
// that C++/Java re-implementation producing identical streams is the design
// goal.  Exposed via a plain C ABI for ctypes.
#include <cstdint>
#include <cmath>
#include <cstddef>

namespace {

constexpr uint64_t kMult = 6364136223846793005ULL;
constexpr uint64_t kInc = 1442695040888963407ULL;

inline uint32_t pcg64_next(uint64_t& state) {
  state = state * kMult + kInc;
  uint32_t x = static_cast<uint32_t>(((state >> 18) ^ state) >> 27);
  uint32_t rot = static_cast<uint32_t>(state >> 59);
  return (x >> rot) | (x << ((32u - rot) & 31u));
}

}  // namespace

extern "C" {

// Fill out[0..n) with standard normals from the (seed)-keyed portable stream.
void td_fill_standard_normal_f32(uint64_t seed, float* out, int64_t n) {
  uint64_t state = seed;
  const double inv_2p32 = 1.0 / 4294967296.0;
  int64_t i = 0;
  while (i < n) {
    uint32_t u1 = pcg64_next(state);
    uint32_t u2 = pcg64_next(state);
    double v1 = 2.0 * (static_cast<double>(u1) + 1.0) * inv_2p32 - 1.0;
    double v2 = 2.0 * (static_cast<double>(u2) + 1.0) * inv_2p32 - 1.0;
    double s = v1 * v1 + v2 * v2;
    if (s > 0.0 && s < 1.0) {
      double f = std::sqrt(-2.0 * std::log(s) / s);
      out[i++] = static_cast<float>(v1 * f);
      if (i < n) out[i++] = static_cast<float>(v2 * f);
    }
  }
}

void td_fill_standard_normal_f64(uint64_t seed, double* out, int64_t n) {
  uint64_t state = seed;
  const double inv_2p32 = 1.0 / 4294967296.0;
  int64_t i = 0;
  while (i < n) {
    uint32_t u1 = pcg64_next(state);
    uint32_t u2 = pcg64_next(state);
    double v1 = 2.0 * (static_cast<double>(u1) + 1.0) * inv_2p32 - 1.0;
    double v2 = 2.0 * (static_cast<double>(u2) + 1.0) * inv_2p32 - 1.0;
    double s = v1 * v1 + v2 * v2;
    if (s > 0.0 && s < 1.0) {
      double f = std::sqrt(-2.0 * std::log(s) / s);
      out[i++] = v1 * f;
      if (i < n) out[i++] = v2 * f;
    }
  }
}

// Portable 64-bit tile seed hash (matches world_pipeline.py:58-63 semantics).
uint64_t td_tile_seed(uint64_t base_seed, int32_t ty, int32_t tx) {
  uint64_t h = base_seed * 0x9E3779B9ULL;
  h = h + (static_cast<uint64_t>(static_cast<uint32_t>(ty)));
  h = h * 0x9E3779B9ULL + (static_cast<uint64_t>(static_cast<uint32_t>(tx)));
  return h;
}

// Fill a (channels, th, tw) tile grid crop: out is (channels, h, w) row-major.
// Assembles the crop from per-tile streams exactly like the Python path.
void td_gaussian_noise_patch_f32(
    uint64_t base_seed, int64_t y0, int64_t x0, int64_t h, int64_t w,
    int64_t channels, int64_t tile_h, int64_t tile_w, float* out,
    float* tile_scratch /* channels*tile_h*tile_w */) {
  auto floordiv = [](int64_t a, int64_t b) {
    int64_t q = a / b;
    if ((a % b != 0) && ((a < 0) != (b < 0))) --q;
    return q;
  };
  int64_t ty0 = floordiv(y0, tile_h), ty1 = floordiv(y0 + h - 1, tile_h);
  int64_t tx0 = floordiv(x0, tile_w), tx1 = floordiv(x0 + w - 1, tile_w);
  for (int64_t ty = ty0; ty <= ty1; ++ty) {
    int64_t tile_y0 = ty * tile_h;
    for (int64_t tx = tx0; tx <= tx1; ++tx) {
      int64_t tile_x0 = tx * tile_w;
      int64_t oy0 = y0 > tile_y0 ? y0 : tile_y0;
      int64_t oy1 = (y0 + h) < (tile_y0 + tile_h) ? (y0 + h) : (tile_y0 + tile_h);
      int64_t ox0 = x0 > tile_x0 ? x0 : tile_x0;
      int64_t ox1 = (x0 + w) < (tile_x0 + tile_w) ? (x0 + w) : (tile_x0 + tile_w);
      uint64_t seed = td_tile_seed(base_seed, static_cast<int32_t>(ty),
                                   static_cast<int32_t>(tx));
      td_fill_standard_normal_f32(seed, tile_scratch, channels * tile_h * tile_w);
      for (int64_t c = 0; c < channels; ++c) {
        for (int64_t y = oy0; y < oy1; ++y) {
          const float* src = tile_scratch + ((c * tile_h + (y - tile_y0)) * tile_w) + (ox0 - tile_x0);
          float* dst = out + ((c * h + (y - y0)) * w) + (ox0 - x0);
          for (int64_t x = 0; x < ox1 - ox0; ++x) dst[x] = src[x];
        }
      }
    }
  }
}

}  // extern "C"
