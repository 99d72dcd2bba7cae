// Host-side stored-trajectory runtime: cubic Hermite splines over the MPC
// solution plus the warm-start resampling used between re-solves.
//
// Native equivalent of the reference's StoredTrajectory +
// Interpolator machinery (reference: examples/mpc_controller.cc:99-138
// builds cubic PiecewisePolynomials from the optimizer solution;
// :140-178 resamples them at the simulator rate; :87-97 shifts the warm
// start by sampling at t_now + i*dt).  These run on the host between
// device solves, where a C++ loop beats a JAX dispatch round-trip.
//
// Representation: knots at uniform times t_i = t0 + i*dt with values
// y_i (dim d) and knot derivatives yd_i — a cubic Hermite segment between
// consecutive knots (the same spline family Drake's
// PiecewisePolynomial::CubicHermite produces).
//
// C ABI:
//   idto_spline_eval(T, d, t0, dt, y, yd, nt, ts, out)        — value
//   idto_spline_eval_deriv(T, d, t0, dt, y, yd, nt, ts, out)  — 1st deriv
//   idto_warmstart_shift(T, d, t0, dt, y, yd, t_now, out)     — resample
//       the stored trajectory at t_now + i*dt for i = 0..T (the reference's
//       UpdateInitialGuess, mpc_controller.cc:87-97)

#include <algorithm>
#include <cmath>

namespace {

// Hermite basis on s in [0, 1] over a segment of length h.
inline void hermite(double s, double h, double* c0, double* c1, double* c2,
                    double* c3) {
  const double s2 = s * s, s3 = s2 * s;
  *c0 = 2 * s3 - 3 * s2 + 1;  // y_i
  *c1 = s3 - 2 * s2 + s;      // h * yd_i
  *c2 = -2 * s3 + 3 * s2;     // y_{i+1}
  *c3 = s3 - s2;              // h * yd_{i+1}
  *c1 *= h;
  *c3 *= h;
}

inline void hermite_deriv(double s, double h, double* c0, double* c1,
                          double* c2, double* c3) {
  const double s2 = s * s;
  *c0 = (6 * s2 - 6 * s) / h;
  *c1 = 3 * s2 - 4 * s + 1;
  *c2 = (-6 * s2 + 6 * s) / h;
  *c3 = 3 * s2 - 2 * s;
}

// Clamp t into the spline domain and locate its segment.
inline int segment(double t, double t0, double dt, int T, double* s) {
  double u = (t - t0) / dt;
  u = std::max(0.0, std::min(u, static_cast<double>(T) - 1e-12));
  int i = static_cast<int>(u);
  if (i > T - 1) i = T - 1;
  if (i < 0) i = 0;  // degenerate single-knot store (T = 0)
  *s = u - i;
  return i;
}

}  // namespace

extern "C" {

// y, yd: (T+1, d) row-major knot values/derivatives; ts: (nt,) query times;
// out: (nt, d).
void idto_spline_eval(int T, int d, double t0, double dt, const double* y,
                      const double* yd, int nt, const double* ts,
                      double* out) {
  for (int q = 0; q < nt; ++q) {
    double s;
    const int i = segment(ts[q], t0, dt, T, &s);
    double c0, c1, c2, c3;
    hermite(s, dt, &c0, &c1, &c2, &c3);
    const double* y0 = y + i * d;
    const double* y1 = y + (i + 1) * d;
    const double* d0 = yd + i * d;
    const double* d1 = yd + (i + 1) * d;
    double* o = out + q * d;
    for (int j = 0; j < d; ++j)
      o[j] = c0 * y0[j] + c1 * d0[j] + c2 * y1[j] + c3 * d1[j];
  }
}

void idto_spline_eval_deriv(int T, int d, double t0, double dt,
                            const double* y, const double* yd, int nt,
                            const double* ts, double* out) {
  for (int q = 0; q < nt; ++q) {
    double s;
    const int i = segment(ts[q], t0, dt, T, &s);
    double c0, c1, c2, c3;
    hermite_deriv(s, dt, &c0, &c1, &c2, &c3);
    const double* y0 = y + i * d;
    const double* y1 = y + (i + 1) * d;
    const double* d0 = yd + i * d;
    const double* d1 = yd + (i + 1) * d;
    double* o = out + q * d;
    for (int j = 0; j < d; ++j)
      o[j] = c0 * y0[j] + c1 * d0[j] + c2 * y1[j] + c3 * d1[j];
  }
}

// Resample the stored trajectory at t_now + i*dt, i = 0..T (warm-start
// shift between MPC re-solves).  out: (T+1, d).
void idto_warmstart_shift(int T, int d, double t0, double dt, const double* y,
                          const double* yd, double t_now, double* out) {
  for (int i = 0; i <= T; ++i) {
    const double t = t_now + i * dt;
    double s;
    const int seg = segment(t, t0, dt, T, &s);
    double c0, c1, c2, c3;
    hermite(s, dt, &c0, &c1, &c2, &c3);
    const double* y0 = y + seg * d;
    const double* y1 = y + (seg + 1) * d;
    const double* d0 = yd + seg * d;
    const double* d1 = yd + (seg + 1) * d;
    double* o = out + i * d;
    for (int j = 0; j < d; ++j)
      o[j] = c0 * y0[j] + c1 * d0[j] + c2 * y1[j] + c3 * d1[j];
  }
}

}  // extern "C"
