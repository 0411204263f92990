// Hungarian (Jonker-Volgenant style shortest augmenting path) assignment
// solver for rectangular cost matrices.
//
// Native replacement for the scipy linear_sum_assignment dependency on the
// eval hot path (reference metrics.py:481-488 calls it per evaluation; the
// matrices are num_gt x num_pred, up to a few hundred square for
// overclustering evals). Exposed via a C ABI for ctypes.
//
// Solves min-cost assignment over an n_rows x n_cols cost matrix
// (row-major doubles). Requires n_rows <= n_cols (caller transposes
// otherwise). Writes row_to_col[i] = assigned column for each row.

#include <cmath>
#include <cstdint>
#include <limits>
#include <vector>

extern "C" {

int hungarian_solve(const double* cost, int n_rows, int n_cols,
                    int32_t* row_to_col) {
  if (n_rows <= 0 || n_cols <= 0 || n_rows > n_cols) return -1;
  const double INF = std::numeric_limits<double>::infinity();

  // Potentials and matching; 1-indexed internally per the classic scheme.
  std::vector<double> u(n_rows + 1, 0.0), v(n_cols + 1, 0.0);
  std::vector<int> match(n_cols + 1, 0);  // column -> row (0 = free)
  std::vector<int> way(n_cols + 1, 0);

  for (int i = 1; i <= n_rows; ++i) {
    // Find an augmenting path for row i via Dijkstra over reduced costs.
    std::vector<double> minv(n_cols + 1, INF);
    std::vector<char> used(n_cols + 1, 0);
    int j0 = 0;
    match[0] = i;
    do {
      used[j0] = 1;
      int i0 = match[j0], j1 = -1;
      double delta = INF;
      for (int j = 1; j <= n_cols; ++j) {
        if (used[j]) continue;
        double cur = cost[(i0 - 1) * n_cols + (j - 1)] - u[i0] - v[j];
        if (cur < minv[j]) {
          minv[j] = cur;
          way[j] = j0;
        }
        if (minv[j] < delta) {
          delta = minv[j];
          j1 = j;
        }
      }
      if (j1 < 0) return -2;  // disconnected (all INF) — malformed input
      for (int j = 0; j <= n_cols; ++j) {
        if (used[j]) {
          u[match[j]] += delta;
          v[j] -= delta;
        } else {
          minv[j] -= delta;
        }
      }
      j0 = j1;
    } while (match[j0] != 0);
    // Augment along the path.
    do {
      int j1 = way[j0];
      match[j0] = match[j1];
      j0 = j1;
    } while (j0 != 0);
  }

  for (int j = 1; j <= n_cols; ++j) {
    if (match[j] > 0) row_to_col[match[j] - 1] = j - 1;
  }
  return 0;
}

}  // extern "C"
