// Native host-side ray-batch sampler.
//
// Role: the TPU-native equivalent of the reference's torch
// DataLoader/DistributedSampler machinery (reference
// dataparser/datamanager_z.py:226-250) — the host must assemble
// (camera,row,col) index triples plus gathered supervision pixels fast
// enough to keep the chip fed (the device consumes only 12 B/ray of
// indices; the host-side gather of rgb/depth/mask bytes is the remaining
// serial work and is GIL-free here).
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in the image).
// Threading: OpenMP parallel-for over the batch; xorshift128+ PRNG seeded
// per call for reproducibility.
//
// Build: see build.py next to this file (g++ -O3 -fopenmp -shared -fPIC).

#include <cstdint>
#include <cstring>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {

struct XorShift128 {
  uint64_t s0, s1;
  explicit XorShift128(uint64_t seed) {
    // splitmix64 init
    uint64_t z = seed + 0x9e3779b97f4a7c15ULL;
    auto mix = [&z]() {
      z += 0x9e3779b97f4a7c15ULL;
      uint64_t x = z;
      x = (x ^ (x >> 30)) * 0xbf58476d1ce4e5b9ULL;
      x = (x ^ (x >> 27)) * 0x94d049bb133111ebULL;
      return x ^ (x >> 31);
    };
    s0 = mix();
    s1 = mix();
  }
  inline uint64_t next() {
    uint64_t x = s0;
    const uint64_t y = s1;
    s0 = y;
    x ^= x << 23;
    s1 = x ^ y ^ (x >> 17) ^ (y >> 26);
    return s1 + y;
  }
  inline uint32_t below(uint32_t bound) {
    return static_cast<uint32_t>(next() % bound);
  }
};

}  // namespace

extern "C" {

// Sample `batch` random pixels from an image stack.
//   images:  (n, h, w, 3) uint8
//   depths:  (n, h, w) float32 or nullptr
//   masks:   (n, h, w) uint8 (1 = usable) or nullptr; masked-out pixels are
//            rejected and resampled (up to 64 tries, then accepted anyway)
// Outputs (preallocated by the caller):
//   ray_indices: (batch, 3) int32
//   rgb:         (batch, 3) float32 in [0, 1]
//   depth_out:   (batch,) float32 (0 when depths == nullptr)
//   mask_out:    (batch,) float32
void sample_ray_batch(const uint8_t* images, const float* depths,
                      const uint8_t* masks, int64_t n, int64_t h, int64_t w,
                      int64_t batch, uint64_t seed, int32_t* ray_indices,
                      float* rgb, float* depth_out, float* mask_out) {
  const int64_t hw = h * w;
#pragma omp parallel
  {
#if defined(_OPENMP)
    const int tid = omp_get_thread_num();
#else
    const int tid = 0;
#endif
    XorShift128 prng(seed * 0x100000001b3ULL + static_cast<uint64_t>(tid));
#pragma omp for schedule(static)
    for (int64_t i = 0; i < batch; ++i) {
      int64_t cam = 0, row = 0, col = 0;
      float mval = 1.0f;
      for (int attempt = 0; attempt < 64; ++attempt) {
        cam = prng.below(static_cast<uint32_t>(n));
        row = prng.below(static_cast<uint32_t>(h));
        col = prng.below(static_cast<uint32_t>(w));
        if (!masks) break;
        if (masks[cam * hw + row * w + col]) break;
        mval = 0.0f;
      }
      if (masks) mval = masks[cam * hw + row * w + col] ? 1.0f : 0.0f;
      ray_indices[i * 3 + 0] = static_cast<int32_t>(cam);
      ray_indices[i * 3 + 1] = static_cast<int32_t>(row);
      ray_indices[i * 3 + 2] = static_cast<int32_t>(col);
      const uint8_t* px = images + (cam * hw + row * w + col) * 3;
      rgb[i * 3 + 0] = px[0] * (1.0f / 255.0f);
      rgb[i * 3 + 1] = px[1] * (1.0f / 255.0f);
      rgb[i * 3 + 2] = px[2] * (1.0f / 255.0f);
      depth_out[i] = depths ? depths[cam * hw + row * w + col] : 0.0f;
      mask_out[i] = mval;
    }
  }
}

// Fisher-Yates shuffle of an int64 permutation buffer (chunk reshuffling,
// the analog of dataset_z.py:158-160's randperm per pass).
void shuffle_indices(int64_t* indices, int64_t count, uint64_t seed) {
  XorShift128 prng(seed);
  for (int64_t i = count - 1; i > 0; --i) {
    int64_t j = static_cast<int64_t>(prng.next() % static_cast<uint64_t>(i + 1));
    int64_t tmp = indices[i];
    indices[i] = indices[j];
    indices[j] = tmp;
  }
}

// Gather rows from a float32 matrix: out[i] = src[perm[i]] (chunk assembly).
void gather_rows_f32(const float* src, const int64_t* perm, int64_t count,
                     int64_t row_width, float* out) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < count; ++i) {
    std::memcpy(out + i * row_width, src + perm[i] * row_width,
                sizeof(float) * static_cast<size_t>(row_width));
  }
}

int nkt_native_abi_version() { return 1; }

}  // extern "C"
