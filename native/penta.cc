// Host-side block penta-diagonal Thomas solver (C++ runtime component).
//
// Native equivalent of the reference's PentaDiagonalFactorization
// (reference: optimizer/penta_diagonal_solver.h:124-248 — the Benkert &
// Fischer block Thomas algorithm with partial-pivot LU per block).  On TPU
// the hot path is the JAX/Pallas solver in idto_tpu/ops; this C++ build is
// the host runtime's cross-check oracle (the analog of the reference's
// debug_compare_against_dense, trajectory_optimizer.cc:2142-2150) and the
// CPU fallback for host-side MPC harness work where a device round-trip
// would dominate.
//
// Written from scratch: plain C arrays, row-major (n, k, k) bands, own
// partial-pivot LU (block sizes are tiny — k = nq ≤ ~25 — so a dense
// O(k^3) LU per block is optimal).
//
// C ABI (ctypes-friendly):
//   idto_penta_factorize(n, k, A, B, C, D, E, out_lu, out_piv, out_L1,
//                        out_L2, out_Dp, out_Ep) -> 0 on success
//   idto_penta_solve(n, k, lu, piv, L1, L2, Dp, Ep, b_inout) -> 0
//   idto_penta_matvec(n, k, A, B, C, D, E, x, y_out)

#include <cmath>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

// Partial-pivot LU of a k x k matrix in place; piv holds row swaps.
// Returns 0 on success, 1 if a pivot underflows (singular block).
int lu_factor(int k, double* M, int* piv) {
  for (int col = 0; col < k; ++col) {
    int p = col;
    double best = std::fabs(M[col * k + col]);
    for (int r = col + 1; r < k; ++r) {
      double v = std::fabs(M[r * k + col]);
      if (v > best) {
        best = v;
        p = r;
      }
    }
    piv[col] = p;
    if (best == 0.0) return 1;
    if (p != col) {
      for (int j = 0; j < k; ++j) std::swap(M[col * k + j], M[p * k + j]);
    }
    const double d = M[col * k + col];
    for (int r = col + 1; r < k; ++r) {
      const double f = (M[r * k + col] /= d);
      for (int j = col + 1; j < k; ++j) M[r * k + j] -= f * M[col * k + j];
    }
  }
  return 0;
}

// Solve LU x = b for a single right-hand side, in place.  The stored L
// rows are fully permuted (row swaps during factorization move the already
// computed multipliers too), so ALL swaps must be applied to b before the
// triangular solves — interleaving them with elimination uses stale
// multipliers for rows that are swapped later.
void lu_solve_vec(int k, const double* LU, const int* piv, double* b) {
  for (int col = 0; col < k; ++col) {
    if (piv[col] != col) std::swap(b[col], b[piv[col]]);
  }
  for (int col = 0; col < k; ++col) {
    for (int r = col + 1; r < k; ++r) b[r] -= LU[r * k + col] * b[col];
  }
  for (int col = k - 1; col >= 0; --col) {
    b[col] /= LU[col * k + col];
    for (int r = 0; r < col; ++r) b[r] -= LU[r * k + col] * b[col];
  }
}

// X = M * inv(C) given LU(C):  solve C^T Y^T = M^T column-wise, i.e.
// solve (LU)^T for each row of M.  Equivalent: X LU = M  =>  for each row
// m of M, solve LU^T? Simpler: X = M inv(C)  <=>  C^T X^T = M^T.  We
// instead compute via: for each row r of M, x_r solves x_r C = m_r, i.e.
// C^T x_r^T = m_r^T.  Implement a transpose solve.
void lu_solve_transposed_vec(int k, const double* LU, const int* piv,
                             double* b) {
  // Solve C^T x = b where C = P^{-1} L U  =>  C^T = U^T L^T P.
  // First U^T y = b (lower-triangular with diagonal), then L^T z = y
  // (upper-triangular, unit diagonal), then x = P^T z (undo pivots in
  // reverse).
  for (int col = 0; col < k; ++col) {
    b[col] /= LU[col * k + col];
    for (int r = col + 1; r < k; ++r) b[r] -= LU[col * k + r] * b[col];
  }
  for (int col = k - 1; col >= 0; --col) {
    for (int r = 0; r < col; ++r) b[r] -= LU[col * k + r] * b[col];
  }
  for (int col = k - 1; col >= 0; --col) {
    if (piv[col] != col) std::swap(b[col], b[piv[col]]);
  }
}

// X = M @ inv(C): for each row of M solve C^T x^T = m^T.
void right_divide(int k, const double* LU, const int* piv, const double* M,
                  double* X) {
  std::vector<double> tmp(k);
  for (int r = 0; r < k; ++r) {
    for (int j = 0; j < k; ++j) tmp[j] = M[r * k + j];
    lu_solve_transposed_vec(k, LU, piv, tmp.data());
    for (int j = 0; j < k; ++j) X[r * k + j] = tmp[j];
  }
}

// C -= A @ B  (all k x k)
void gemm_sub(int k, const double* A, const double* B, double* C) {
  for (int i = 0; i < k; ++i)
    for (int l = 0; l < k; ++l) {
      const double a = A[i * k + l];
      if (a == 0.0) continue;
      for (int j = 0; j < k; ++j) C[i * k + j] -= a * B[l * k + j];
    }
}

// y -= A @ x  (k x k, k)
void gemv_sub(int k, const double* A, const double* x, double* y) {
  for (int i = 0; i < k; ++i) {
    double acc = 0.0;
    for (int j = 0; j < k; ++j) acc += A[i * k + j] * x[j];
    y[i] -= acc;
  }
}

}  // namespace

extern "C" {

// Forward Thomas sweep.  Inputs: bands (n, k, k) row-major.  Outputs:
//   lu  (n, k, k)  LU factors of the eliminated diagonal blocks C'
//   piv (n, k)     pivot indices
//   L1  (n, k, k)  multiplier of row i-1
//   L2  (n, k, k)  multiplier of row i-2
//   Dp  (n, k, k)  eliminated super-diagonal
//   Ep  (n, k, k)  second super-diagonal (unchanged)
int idto_penta_factorize(int n, int k, const double* A, const double* B,
                         const double* C, const double* D, const double* E,
                         double* lu, int* piv, double* L1, double* L2,
                         double* Dp, double* Ep) {
  const int kk = k * k;
  std::vector<double> Bp(kk);
  for (int i = 0; i < n; ++i) {
    const double* Ai = A + i * kk;
    const double* Bi = B + i * kk;
    const double* Ci = C + i * kk;
    const double* Di = D + i * kk;
    const double* Ei = E + i * kk;
    double* lui = lu + i * kk;
    int* pivi = piv + i * k;
    double* L1i = L1 + i * kk;
    double* L2i = L2 + i * kk;
    double* Dpi = Dp + i * kk;
    double* Epi = Ep + i * kk;

    // L2 = A @ inv(C'_{i-2});  zero for i < 2.
    if (i >= 2) {
      right_divide(k, lu + (i - 2) * kk, piv + (i - 2) * k, Ai, L2i);
    } else {
      std::memset(L2i, 0, sizeof(double) * kk);
    }
    // B' = B - L2 @ D'_{i-2}
    std::memcpy(Bp.data(), Bi, sizeof(double) * kk);
    if (i >= 2) gemm_sub(k, L2i, Dp + (i - 2) * kk, Bp.data());
    // L1 = B' @ inv(C'_{i-1});  zero for i < 1.
    if (i >= 1) {
      right_divide(k, lu + (i - 1) * kk, piv + (i - 1) * k, Bp.data(), L1i);
    } else {
      std::memset(L1i, 0, sizeof(double) * kk);
    }
    // C' = C - L2 @ E'_{i-2} - L1 @ D'_{i-1}
    std::memcpy(lui, Ci, sizeof(double) * kk);
    if (i >= 2) gemm_sub(k, L2i, Ep + (i - 2) * kk, lui);
    if (i >= 1) gemm_sub(k, L1i, Dp + (i - 1) * kk, lui);
    // D' = D - L1 @ E'_{i-1}
    std::memcpy(Dpi, Di, sizeof(double) * kk);
    if (i >= 1) gemm_sub(k, L1i, Ep + (i - 1) * kk, Dpi);
    std::memcpy(Epi, Ei, sizeof(double) * kk);
    if (lu_factor(k, lui, pivi) != 0) return 1;
  }
  return 0;
}

// Forward elimination + back substitution; b (n, k) is overwritten with x.
int idto_penta_solve(int n, int k, const double* lu, const int* piv,
                     const double* L1, const double* L2, const double* Dp,
                     const double* Ep, double* b) {
  const int kk = k * k;
  // y_i = b_i - L1_i y_{i-1} - L2_i y_{i-2}
  for (int i = 0; i < n; ++i) {
    double* bi = b + i * k;
    if (i >= 1) gemv_sub(k, L1 + i * kk, b + (i - 1) * k, bi);
    if (i >= 2) gemv_sub(k, L2 + i * kk, b + (i - 2) * k, bi);
  }
  // x_i = C'_i^{-1} (y_i - D'_i x_{i+1} - E'_i x_{i+2})
  for (int i = n - 1; i >= 0; --i) {
    double* bi = b + i * k;
    if (i + 1 < n) gemv_sub(k, Dp + i * kk, b + (i + 1) * k, bi);
    if (i + 2 < n) gemv_sub(k, Ep + i * kk, b + (i + 2) * k, bi);
    lu_solve_vec(k, lu + i * kk, piv + i * k, bi);
  }
  return 0;
}

// y = H x  (reference: PentaDiagonalMatrix::MultiplyBy,
// penta_diagonal_matrix.cc:180-207)
void idto_penta_matvec(int n, int k, const double* A, const double* B,
                       const double* C, const double* D, const double* E,
                       const double* x, double* y) {
  const int kk = k * k;
  for (int i = 0; i < n; ++i) {
    double* yi = y + i * k;
    for (int j = 0; j < k; ++j) yi[j] = 0.0;
    auto acc = [&](const double* M, const double* xv) {
      for (int r = 0; r < k; ++r) {
        double s = 0.0;
        for (int c = 0; c < k; ++c) s += M[r * k + c] * xv[c];
        yi[r] += s;
      }
    };
    if (i >= 2) acc(A + i * kk, x + (i - 2) * k);
    if (i >= 1) acc(B + i * kk, x + (i - 1) * k);
    acc(C + i * kk, x + i * k);
    if (i + 1 < n) acc(D + i * kk, x + (i + 1) * k);
    if (i + 2 < n) acc(E + i * kk, x + (i + 2) * k);
  }
}

}  // extern "C"
