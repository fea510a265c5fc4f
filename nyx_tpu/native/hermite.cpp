// Native ensemble trajectory interpolation.
//
// Host-side counterpart of mc/results.rs's per-run Traj queries: the whole
// [B, G, N] ensemble interpolation in one call instead of a per-lane Python
// loop. Semantics match nyx_tpu/mc/results.py::_hermite_quintic_2body
// exactly: QUINTIC Hermite on the position block (columns 0:3) using the
// velocity block (3:6) as end derivatives and the analytic two-body (+J2
// when j2/re > 0) acceleration as end second derivatives (the neglected
// perturbation is then ~1e-6 of a, cutting the interpolation error by
// orders of magnitude vs the plain cubic — a 150 s LEO capture grid then holds velocities to
// ~1e-6 km/s instead of ~5e-4, i.e. metre-level instead of km-level sma
// queries). The quintic's derivative gives velocity; every other column is
// linear. mu <= 0 degrades to zero end accelerations (still exact cubic
// order). Out-of-range grid times clamp to the first/last segment.
//
// Compiled on demand by nyx_tpu/native/__init__.py (g++ -O3 -shared); the
// Python path remains as a fallback where no toolchain exists.

#include <cstdint>
#include <algorithm>
#include <cmath>

extern "C" {

// traj_t: [B, K] relative seconds (valid prefix per lane: traj_len[b])
// traj_y: [B, K, N]
// t_grid: [G] sorted ascending
// out:    [B, G, N]
void hermite_interp_ensemble(const double* traj_t, const double* traj_y,
                             const int32_t* traj_len, const double* t_grid,
                             double* out, double mu, double j2, double re,
                             int64_t B, int64_t K, int64_t N, int64_t G) {
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
      const double* y0 = ys + (i - 1) * N;
      const double* y1 = ys + i * N;
      double* o = ob + g * N;
      if (N >= 6 && mu > 0) {
        // quintic Hermite: two-body (+J2) end accelerations; matches
        // results.py::_two_body_j2_accel exactly
        const double s4 = s3 * s, s5 = s4 * s;
        const double h00 = 1 - 10 * s3 + 15 * s4 - 6 * s5;
        const double h10 = s - 6 * s3 + 8 * s4 - 3 * s5;
        const double h20 = 0.5 * s2 - 1.5 * s3 + 1.5 * s4 - 0.5 * s5;
        const double h01 = 10 * s3 - 15 * s4 + 6 * s5;
        const double h11 = -4 * s3 + 7 * s4 - 3 * s5;
        const double h21 = 0.5 * s3 - s4 + 0.5 * s5;
        const double d00 = (-30 * s2 + 60 * s3 - 30 * s4) / h;
        const double d10 = 1 - 18 * s2 + 32 * s3 - 15 * s4;
        const double d20 = (s - 4.5 * s2 + 6 * s3 - 2.5 * s4) * h;
        const double d01 = (30 * s2 - 60 * s3 + 30 * s4) / h;
        const double d11 = -12 * s2 + 28 * s3 - 15 * s4;
        const double d21 = (1.5 * s2 - 4 * s3 + 2.5 * s4) * h;
        double a0[3], a1[3];
        const double* ends[2] = {y0, y1};
        double* accs[2] = {a0, a1};
        for (int e = 0; e < 2; ++e) {
          const double* y = ends[e];
          const double rm = std::max(
              std::sqrt(y[0] * y[0] + y[1] * y[1] + y[2] * y[2]), 1e-12);
          const double c2b = -mu / (rm * rm * rm);
          for (int c = 0; c < 3; ++c) accs[e][c] = c2b * y[c];
          if (j2 > 0 && re > 0) {
            const double z2_r2 = (y[2] / rm) * (y[2] / rm);
            const double k2 =
                -1.5 * j2 * mu * re * re / (rm * rm * rm * rm * rm);
            accs[e][0] += k2 * (1.0 - 5.0 * z2_r2) * y[0];
            accs[e][1] += k2 * (1.0 - 5.0 * z2_r2) * y[1];
            accs[e][2] += k2 * (3.0 - 5.0 * z2_r2) * y[2];
          }
        }
        for (int c = 0; c < 3; ++c) {
          const double r0 = y0[c], r1 = y1[c];
          const double v0 = y0[c + 3] * h, v1 = y1[c + 3] * h;
          const double w0 = a0[c] * h * h, w1 = a1[c] * h * h;
          o[c] = h00 * r0 + h10 * v0 + h20 * w0 + h01 * r1 + h11 * v1 +
                 h21 * w1;
          o[c + 3] = d00 * r0 + d10 * y0[c + 3] + d20 * a0[c] + d01 * r1 +
                     d11 * y1[c + 3] + d21 * a1[c];
        }
        for (int64_t c = 6; c < N; ++c) o[c] = y0[c] + (y1[c] - y0[c]) * s;
      } else if (N >= 6) {
        // cubic Hermite (mu = 0): matches the numpy fallback's cubic form
        const double h00 = 2 * s3 - 3 * s2 + 1;
        const double h10 = s3 - 2 * s2 + s;
        const double h01 = -2 * s3 + 3 * s2;
        const double h11 = s3 - s2;
        const double d00 = (6 * s2 - 6 * s) / h;
        const double d10 = 3 * s2 - 4 * s + 1;
        const double d01 = (-6 * s2 + 6 * s) / h;
        const double d11 = 3 * s2 - 2 * s;
        for (int c = 0; c < 3; ++c) {
          const double r0 = y0[c], r1 = y1[c];
          const double v0 = y0[c + 3], v1 = y1[c + 3];
          o[c] = h00 * r0 + h10 * h * v0 + h01 * r1 + h11 * h * v1;
          o[c + 3] = d00 * r0 + d10 * v0 + d01 * r1 + d11 * v1;
        }
        for (int64_t c = 6; c < N; ++c) o[c] = y0[c] + (y1[c] - y0[c]) * s;
      } else {
        for (int64_t c = 0; c < N; ++c) o[c] = y0[c] + (y1[c] - y0[c]) * s;
      }
    }
  }
}

}  // extern "C"
