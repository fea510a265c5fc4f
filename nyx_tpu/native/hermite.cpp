// Native ensemble trajectory interpolation.
//
// Host-side counterpart of mc/results.rs's per-run Traj queries: the whole
// [B, G, N] ensemble interpolation in one call instead of a per-lane Python
// loop. Semantics match nyx_tpu/mc/results.py::_hermite_cubic exactly:
// cubic Hermite on the position block (columns 0:3) with the velocity block
// (3:6) as end derivatives, the Hermite derivative for velocity, and linear
// interpolation for every other column. Out-of-range grid times clamp to
// the first/last captured segment (s clipped to [0, 1]).
//
// Compiled on demand by nyx_tpu/native/__init__.py (g++ -O3 -shared); the
// Python path remains as a fallback where no toolchain exists.

#include <cstdint>
#include <algorithm>

extern "C" {

// traj_t: [B, K] relative seconds (valid prefix per lane: traj_len[b])
// traj_y: [B, K, N]
// t_grid: [G] sorted ascending
// out:    [B, G, N]
void hermite_interp_ensemble(const double* traj_t, const double* traj_y,
                             const int32_t* traj_len, const double* t_grid,
                             double* out, int64_t B, int64_t K, int64_t N,
                             int64_t G) {
#pragma omp parallel for schedule(static)
  for (int64_t b = 0; b < B; ++b) {
    const double* ts = traj_t + b * K;
    const double* ys = traj_y + b * K * N;
    double* ob = out + b * G * N;
    const int64_t k = std::max<int64_t>(traj_len[b], 2);
    int64_t i = 1;  // segment upper index; grid is sorted, sweep forward
    for (int64_t g = 0; g < G; ++g) {
      const double t = t_grid[g];
      while (i < k - 1 && ts[i] < t) ++i;
      const double t0 = ts[i - 1], t1 = ts[i];
      const double h = std::max(t1 - t0, 1e-12);
      double s = (t - t0) / h;
      s = std::min(std::max(s, 0.0), 1.0);
      const double s2 = s * s, s3 = s2 * s;
      const double h00 = 2 * s3 - 3 * s2 + 1;
      const double h10 = s3 - 2 * s2 + s;
      const double h01 = -2 * s3 + 3 * s2;
      const double h11 = s3 - s2;
      const double d00 = (6 * s2 - 6 * s) / h;
      const double d10 = 3 * s2 - 4 * s + 1;
      const double d01 = (-6 * s2 + 6 * s) / h;
      const double d11 = 3 * s2 - 2 * s;
      const double* y0 = ys + (i - 1) * N;
      const double* y1 = ys + i * N;
      double* o = ob + g * N;
      for (int64_t c = 0; c < 3 && c < N; ++c) {
        const double r0 = y0[c], r1 = y1[c];
        const double v0 = (c + 3 < N) ? y0[c + 3] : 0.0;
        const double v1 = (c + 3 < N) ? y1[c + 3] : 0.0;
        o[c] = h00 * r0 + h10 * h * v0 + h01 * r1 + h11 * h * v1;
        if (c + 3 < N)
          o[c + 3] = d00 * r0 + d10 * v0 + d01 * r1 + d11 * v1;
      }
      for (int64_t c = 6; c < N; ++c) o[c] = y0[c] + (y1[c] - y0[c]) * s;
    }
  }
}

}  // extern "C"
