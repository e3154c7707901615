// fst_native: C++ host-side setup kernels for fenicssolver_tpu.
//
// The reference delegates its mesh/topology/sparsity machinery to the dolfin
// C++ platform (SURVEY.md §2.2).  Here the performance-sensitive host setup
// paths — CSR sparsity construction from element dofmaps and facet topology
// derivation — are native C++ (the device compute path stays JAX/XLA).
// Loaded via ctypes (fenicssolver_tpu/native.py) with a numpy fallback.
//
// Build: g++ -O3 -march=native -shared -fPIC fst_native.cpp -o libfstnative.so

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// CSR pattern construction.
//
// Inputs: element entry keys key[e] = row*ndof + col for every (cell, i, j)
// entry (n_entries of them), ndof.
// Outputs (caller-allocated):
//   positions[n_entries]  : nnz slot of each input entry (scatter targets)
//   indptr[ndof+1], indices[nnz], rows[nnz]
// Two-phase: call with indices==nullptr to get nnz back (return value), then
// call again with buffers sized nnz.
// ---------------------------------------------------------------------------
int64_t build_csr_pattern(const int64_t* keys, int64_t n_entries, int64_t ndof,
                          int32_t* positions, int32_t* indptr,
                          int32_t* indices, int32_t* rows_out) {
  // argsort the keys
  std::vector<int64_t> order(n_entries);
  std::iota(order.begin(), order.end(), 0);
  std::sort(order.begin(), order.end(),
            [keys](int64_t a, int64_t b) { return keys[a] < keys[b]; });

  // first pass: count unique keys
  int64_t nnz = 0;
  int64_t prev = -1;
  for (int64_t t = 0; t < n_entries; ++t) {
    const int64_t k = keys[order[t]];
    if (k != prev) {
      ++nnz;
      prev = k;
    }
  }
  if (indices == nullptr) return nnz;

  // second pass: fill positions / indices / rows / indptr counts
  std::memset(indptr, 0, sizeof(int32_t) * (ndof + 1));
  int64_t slot = -1;
  prev = -1;
  for (int64_t t = 0; t < n_entries; ++t) {
    const int64_t idx = order[t];
    const int64_t k = keys[idx];
    if (k != prev) {
      ++slot;
      prev = k;
      const int64_t r = k / ndof;
      const int64_t c = k % ndof;
      indices[slot] = static_cast<int32_t>(c);
      rows_out[slot] = static_cast<int32_t>(r);
      indptr[r + 1] += 1;
    }
    positions[idx] = static_cast<int32_t>(slot);
  }
  for (int64_t r = 0; r < ndof; ++r) indptr[r + 1] += indptr[r];
  return nnz;
}

// ---------------------------------------------------------------------------
// Facet topology: enumerate unique facets of a simplex mesh in lexicographic
// sorted-vertex-tuple order (dolfin numbering; see core/mesh.py) and build
// facet->cell adjacency.
//
// cells: (nc, nvc) int32, vertex-sorted.  nvc-1 = facet vertex count.
// Outputs (two-phase like above):
//   facet_id[nc*nvc]      : facet index per (cell, local facet)
//   facet_vertices[nf*(nvc-1)], facet_cells[nf*2], facet_local[nf*2] (-1 pad)
// ---------------------------------------------------------------------------
int64_t build_facets(const int32_t* cells, int64_t nc, int32_t nvc,
                     int64_t* facet_id, int32_t* facet_vertices,
                     int32_t* facet_cells, int32_t* facet_local) {
  const int32_t nlf = nvc;           // facets per cell
  const int32_t fnv = nvc - 1;       // vertices per facet
  const int64_t total = nc * nlf;

  // gather all facet vertex tuples (vertices within a cell are sorted, and
  // dropping one position keeps the tuple sorted)
  std::vector<int32_t> fv(total * fnv);
  for (int64_t c = 0; c < nc; ++c) {
    for (int32_t lf = 0; lf < nlf; ++lf) {
      int32_t* dst = &fv[(c * nlf + lf) * fnv];
      int32_t w = 0;
      for (int32_t v = 0; v < nvc; ++v) {
        if (v == lf) continue;  // facet lf is opposite vertex lf (dolfin)
        dst[w++] = cells[c * nvc + v];
      }
    }
  }

  std::vector<int64_t> order(total);
  std::iota(order.begin(), order.end(), 0);
  auto less = [&fv, fnv](int64_t a, int64_t b) {
    const int32_t* pa = &fv[a * fnv];
    const int32_t* pb = &fv[b * fnv];
    for (int32_t k = 0; k < fnv; ++k) {
      if (pa[k] != pb[k]) return pa[k] < pb[k];
    }
    return false;
  };
  auto equal = [&fv, fnv](int64_t a, int64_t b) {
    const int32_t* pa = &fv[a * fnv];
    const int32_t* pb = &fv[b * fnv];
    for (int32_t k = 0; k < fnv; ++k)
      if (pa[k] != pb[k]) return false;
    return true;
  };
  std::sort(order.begin(), order.end(), less);

  int64_t nf = total > 0 ? 1 : 0;
  for (int64_t t = 1; t < total; ++t)
    if (!equal(order[t], order[t - 1])) ++nf;
  if (facet_vertices == nullptr) return nf;

  for (int64_t i = 0; i < nf * 2; ++i) {
    facet_cells[i] = -1;
    facet_local[i] = -1;
  }
  int64_t fidx = -1;
  for (int64_t t = 0; t < total; ++t) {
    const int64_t e = order[t];
    if (t == 0 || !equal(e, order[t - 1])) {
      ++fidx;
      std::memcpy(&facet_vertices[fidx * fnv], &fv[e * fnv],
                  sizeof(int32_t) * fnv);
    }
    facet_id[(e / nlf) * nlf + (e % nlf)] = fidx;
  }
  // adjacency in natural (cell, local-facet) order so the '+' cell is the
  // lowest-index adjacent cell (matches the numpy/stable-sort reference)
  for (int64_t e = 0; e < total; ++e) {
    const int64_t fi = facet_id[e];
    const int64_t c = e / nlf;
    const int32_t lf = static_cast<int32_t>(e % nlf);
    if (facet_cells[fi * 2] < 0) {
      facet_cells[fi * 2] = static_cast<int32_t>(c);
      facet_local[fi * 2] = lf;
    } else {
      facet_cells[fi * 2 + 1] = static_cast<int32_t>(c);
      facet_local[fi * 2 + 1] = lf;
    }
  }
  return nf;
}

// ---------------------------------------------------------------------------
// ELLPACK structure from a CSR pattern: per-row slot assignment and the
// nnz->ELL slot map (bench.py hot-path setup).
// ---------------------------------------------------------------------------
int64_t build_ell(const int32_t* indptr, const int32_t* indices, int64_t ndof,
                  int32_t* ell_idx /* (W, ndof) col-major by slot */,
                  int32_t* ell_pos /* nnz -> slot*ndof + row */) {
  int64_t W = 0;
  for (int64_t r = 0; r < ndof; ++r) {
    const int64_t c = indptr[r + 1] - indptr[r];
    if (c > W) W = c;
  }
  if (ell_idx == nullptr) return W;
  for (int64_t w = 0; w < W; ++w)
    for (int64_t r = 0; r < ndof; ++r)
      ell_idx[w * ndof + r] = static_cast<int32_t>(r);  // self-index pad
  for (int64_t r = 0; r < ndof; ++r) {
    int64_t slot = 0;
    for (int32_t t = indptr[r]; t < indptr[r + 1]; ++t, ++slot) {
      ell_idx[slot * ndof + r] = indices[t];
      ell_pos[t] = static_cast<int32_t>(slot * ndof + r);
    }
  }
  return W;
}

// ---------------------------------------------------------------------------
// Greedy standard aggregation on a strength graph (smoothed-aggregation AMG
// setup; the PETSc GAMG graph-coarsening analog).  Returns #aggregates.
// ---------------------------------------------------------------------------
int64_t aggregate(const int32_t* indptr, const int32_t* indices, int64_t n,
                  int64_t* agg) {
  for (int64_t i = 0; i < n; ++i) agg[i] = -1;
  int64_t n_agg = 0;
  // pass 1: seed aggregates from fully-unaggregated neighborhoods
  for (int64_t i = 0; i < n; ++i) {
    if (agg[i] >= 0) continue;
    bool clean = true;
    for (int32_t t = indptr[i]; t < indptr[i + 1]; ++t) {
      if (agg[indices[t]] >= 0) {
        clean = false;
        break;
      }
    }
    if (!clean) continue;
    agg[i] = n_agg;
    for (int32_t t = indptr[i]; t < indptr[i + 1]; ++t)
      agg[indices[t]] = n_agg;
    ++n_agg;
  }
  // pass 2: attach leftovers to the most-connected neighboring aggregate
  for (int64_t i = 0; i < n; ++i) {
    if (agg[i] >= 0) continue;
    int64_t best = -1;
    for (int32_t t = indptr[i]; t < indptr[i + 1]; ++t) {
      const int64_t a = agg[indices[t]];
      if (a >= 0) {
        best = a;
        break;
      }
    }
    agg[i] = best >= 0 ? best : n_agg++;
  }
  return n_agg;
}

// ---------------------------------------------------------------------------
// CSR sparse matrix-matrix product C = A(m x k) @ B(k x n) — Gustavson's
// row-merge algorithm with a dense accumulator (the PETSc MatMatMult /
// GAMG-RAP workhorse).  The sort-based numpy formulation in
// la/sparse_algebra.py materializes the full pre-reduction expansion
// (sum_{a in A} deg_B(col(a)) entries) and sorts it; at AMG-setup sizes
// (250k-row RAP) that is minutes of argsort.  Gustavson touches each
// product term once: measured ~60x on the 1M-dof SA hierarchy build.
//
// Two-phase: call with Ci==nullptr for nnz(C) (symbolic, per-row counts
// into Cp[1..m] as a side effect); then with buffers sized nnz (numeric;
// Cp is recomputed and finalized to a cumulative indptr).  Output columns
// are sorted ascending within each row (canonical CSR).
// ---------------------------------------------------------------------------
int64_t csr_spgemm(int64_t m, int64_t n,
                   const int64_t* Ap, const int64_t* Ai, const double* Ax,
                   const int64_t* Bp, const int64_t* Bi, const double* Bx,
                   int64_t* Cp, int64_t* Ci, double* Cx) {
  if (Ci == nullptr) {
    std::vector<int64_t> mark(n, -1);
    int64_t nnz = 0;
    for (int64_t i = 0; i < m; ++i) {
      for (int64_t t = Ap[i]; t < Ap[i + 1]; ++t) {
        const int64_t j = Ai[t];
        for (int64_t s = Bp[j]; s < Bp[j + 1]; ++s) {
          const int64_t col = Bi[s];
          if (mark[col] != i) {
            mark[col] = i;
            ++nnz;
          }
        }
      }
    }
    return nnz;
  }
  std::vector<double> acc(n, 0.0);
  std::vector<char> seen(n, 0);
  std::vector<int64_t> touched;
  touched.reserve(1024);
  int64_t pos = 0;
  Cp[0] = 0;
  for (int64_t i = 0; i < m; ++i) {
    touched.clear();
    for (int64_t t = Ap[i]; t < Ap[i + 1]; ++t) {
      const int64_t j = Ai[t];
      const double a = Ax[t];
      for (int64_t s = Bp[j]; s < Bp[j + 1]; ++s) {
        const int64_t col = Bi[s];
        if (!seen[col]) {
          seen[col] = 1;
          touched.push_back(col);
          acc[col] = a * Bx[s];
        } else {
          acc[col] += a * Bx[s];
        }
      }
    }
    std::sort(touched.begin(), touched.end());
    for (const int64_t col : touched) {
      Ci[pos] = col;
      Cx[pos] = acc[col];
      ++pos;
      seen[col] = 0;
    }
    Cp[i + 1] = pos;
  }
  return pos;
}

}  // extern "C"
