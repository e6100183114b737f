// Native planner kernels: fast CSR submatrix gather.
//
// This is the framework's C++ runtime component, capability parity with the
// reference's sparse fancy-indexing replacement (/root/reference/src/mygetindex.jl:
// hashmap/bsearch getindex_I_sorted_* monkey-patched into SparseArrays) - the
// factorization's symbolic hot loop.  The planner extracts every A[I, J] block the
// numeric phase will need; scipy's generic fancy indexing allocates intermediate
// sparse results, while this kernel scatters straight into the padded dense front
// buffers using a column-position map (O(nnz(rows) + |J|) per block).
//
// Build: cc -O3 -shared -fPIC (see build.py); called through ctypes.

#include <complex>
#include <cstdint>

extern "C" {

// colmap: int64 workspace of size >= ncols(A), must hold -1 on entry and is
// restored before returning (stamp-free variant keeps re-entry simple).
void csr_gather_f64(const int64_t *indptr, const int64_t *indices,
                    const double *data, const int64_t *rows, int64_t nrows,
                    const int64_t *cols, int64_t ncols, int64_t *colmap,
                    double *out, int64_t out_stride) {
  for (int64_t j = 0; j < ncols; ++j) colmap[cols[j]] = j;
  for (int64_t i = 0; i < nrows; ++i) {
    const int64_t r = rows[i];
    double *orow = out + i * out_stride;
    for (int64_t p = indptr[r]; p < indptr[r + 1]; ++p) {
      const int64_t k = colmap[indices[p]];
      if (k >= 0) orow[k] = data[p];
    }
  }
  for (int64_t j = 0; j < ncols; ++j) colmap[cols[j]] = -1;
}

void csr_gather_c128(const int64_t *indptr, const int64_t *indices,
                     const std::complex<double> *data, const int64_t *rows,
                     int64_t nrows, const int64_t *cols, int64_t ncols,
                     int64_t *colmap, std::complex<double> *out,
                     int64_t out_stride) {
  for (int64_t j = 0; j < ncols; ++j) colmap[cols[j]] = j;
  for (int64_t i = 0; i < nrows; ++i) {
    const int64_t r = rows[i];
    std::complex<double> *orow = out + i * out_stride;
    for (int64_t p = indptr[r]; p < indptr[r + 1]; ++p) {
      const int64_t k = colmap[indices[p]];
      if (k >= 0) orow[k] = data[p];
    }
  }
  for (int64_t j = 0; j < ncols; ++j) colmap[cols[j]] = -1;
}

// Zero the entries of a dense block whose row and column belong to the same child
// (the extend-add same-child mask, factorization.jl:115-123 semantics), fused here
// to avoid a second Python-level pass.
void mask_same_child_f64(double *blk, int64_t n, const int64_t *child) {
  for (int64_t i = 0; i < n; ++i)
    for (int64_t j = 0; j < n; ++j)
      if (child[i] == child[j]) blk[i * n + j] = 0.0;
}

void mask_same_child_c128(std::complex<double> *blk, int64_t n,
                          const int64_t *child) {
  for (int64_t i = 0; i < n; ++i)
    for (int64_t j = 0; j < n; ++j)
      if (child[i] == child[j]) blk[i * n + j] = 0.0;
}

}  // extern "C"
