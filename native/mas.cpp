// Monotonic Alignment Search — native host kernel.
//
// C++/OpenMP counterpart of the on-device JAX/Pallas MAS kernels (see
// personalized_text_to_speech_tpu/ops/mas.py). The reference project's only
// native component is a Cython/OpenMP version of this same Viterbi DP
// (reference monotonic_align/core.pyx); this implementation serves host-side
// pipelines (offline alignment extraction, CPU-only tooling) and acts as an
// independent oracle for kernel tests.
//
// Semantics: for each batch row, forward-accumulate
//     V[y][x] = score[y][x] + max(V[y-1][x] (x<y), V[y-1][x-1])
// over the monotonic band x<=y, then backtrack the hard path.
// value is modified in place; path receives 0/1.
//
// Build: make -C native   (produces libptts_mas.so)

#include <algorithm>
#include <cstdint>

namespace {
constexpr float kNegInf = -1e9f;

void mas_single(int32_t* path, float* value, int t_y, int t_x, int stride) {
  // forward accumulation
  for (int y = 0; y < t_y; ++y) {
    float* row = value + static_cast<int64_t>(y) * stride;
    const float* prev = row - stride;
    const int lo = std::max(0, t_x + y - t_y);
    const int hi = std::min(t_x, y + 1);
    for (int x = lo; x < hi; ++x) {
      const float stay = (x == y) ? kNegInf : prev[x];
      float adv;
      if (x == 0) {
        adv = (y == 0) ? 0.0f : kNegInf;
      } else {
        adv = prev[x - 1];
      }
      row[x] += std::max(stay, adv);
    }
  }
  // backtrack
  int x = t_x - 1;
  for (int y = t_y - 1; y >= 0; --y) {
    path[static_cast<int64_t>(y) * stride + x] = 1;
    if (x != 0 && y > 0) {
      const float* prev = value + static_cast<int64_t>(y - 1) * stride;
      if (x == y || prev[x] < prev[x - 1]) {
        --x;
      }
    }
  }
}
}  // namespace

extern "C" {

// paths:  [b, max_t_y, max_t_x] int32, zero-initialized by the caller
// values: [b, max_t_y, max_t_x] float32 scores (modified in place)
// t_ys, t_xs: [b] per-row valid lengths
void ptts_maximum_path(int32_t* paths, float* values, const int32_t* t_ys,
                       const int32_t* t_xs, int b, int max_t_y, int max_t_x) {
  const int64_t batch_stride = static_cast<int64_t>(max_t_y) * max_t_x;
#pragma omp parallel for schedule(dynamic)
  for (int i = 0; i < b; ++i) {
    mas_single(paths + i * batch_stride, values + i * batch_stride, t_ys[i],
               t_xs[i], max_t_x);
  }
}
}
