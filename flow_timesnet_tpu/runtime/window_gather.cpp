// Native host-side batch assembly for the sliding-window data path.
//
// Fuses the per-batch gathers that feed the device (x window, y horizon,
// validity mask) into one cache-friendly pass, parallelised over samples.
// The Python layer (data/windows.py) falls back to numpy fancy indexing when
// this library is unavailable; semantics are identical.
//
// Build: g++ -O3 -shared -fPIC -fopenmp -o libwindow_gather.so window_gather.cpp

#include <cstdint>
#include <cstring>

#if defined(_OPENMP)
#include <omp.h>
#endif

extern "C" {

// X, M: [T, N] row-major. starts/series: [B]. Outputs: x [B, L], y [B, H],
// m [B, H] row-major (channel dim 1 is implicit).
void gather_windows(const float* X, const float* M, int64_t T, int64_t N,
                    const int64_t* starts, const int64_t* series, int64_t B,
                    int64_t L, int64_t H, float* x_out, float* y_out,
                    float* m_out) {
#pragma omp parallel for schedule(static)
  for (int64_t b = 0; b < B; ++b) {
    const int64_t s = starts[b];
    const int64_t col = series[b];
    const float* xcol = X + col;
    float* xo = x_out + b * L;
    for (int64_t t = 0; t < L; ++t) {
      xo[t] = xcol[(s + t) * N];
    }
    const int64_t e = s + L;
    float* yo = y_out + b * H;
    float* mo = m_out + b * H;
    const float* mcol = M + col;
    for (int64_t t = 0; t < H; ++t) {
      yo[t] = xcol[(e + t) * N];
      mo[t] = mcol[(e + t) * N];
    }
  }
}

// Gather 2D rows of marks [T, F] for B windows of length W starting at
// starts[b]: out [B, W, F].
void gather_marks(const float* marks, int64_t T, int64_t F,
                  const int64_t* starts, int64_t B, int64_t W, float* out) {
#pragma omp parallel for schedule(static)
  for (int64_t b = 0; b < B; ++b) {
    const float* src = marks + starts[b] * F;
    std::memcpy(out + b * W * F, src, sizeof(float) * W * F);
  }
}

int window_gather_abi_version() { return 1; }

}  // extern "C"
