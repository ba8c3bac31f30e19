// kryst_tpu native setup kernels (C++17, no deps; built by native/__init__.py
// with g++ -O3 -shared -fPIC, loaded via ctypes).
//
// The reference (tmathis720/kryst) implements its whole setup path in native
// Rust; here the device compute path is JAX/XLA/Pallas, and this module is
// the native runtime for the HOST-side setup hot spots that are Python-loop
// bound in the fallback implementations:
//   - ILU(0)/ILU(p)/ILUT numeric+symbolic factorization
//     (reference: src/preconditioner/ilu.rs, ilup.rs, ilut.rs)
//   - triangular level scheduling (SURVEY §2.6 item 6)
//   - greedy distance-1/2 graph coloring (reference: src/utils/coloring.rs)
//
// Every function replicates the Python oracle in kryst_tpu/pc/{ilu,coloring}.py
// ARITHMETIC-EXACTLY (same elimination order, same stable tie-breaking), so
// tests/test_native.py can assert bitwise-identical outputs. CSR inputs must
// have ascending column indices per row (CSRMatrix.from_coo guarantees this;
// the Python wrappers verify before dispatching here).
//
// Variable-size outputs (ILUT/ILUp produce unknown-nnz factors) use a
// two-call protocol: the factor call computes and stashes the result
// process-globally and reports sizes; a fetch call copies it into
// caller-allocated numpy buffers and frees the stash. The Python wrapper
// holds a lock-free single-threaded invariant (CPython callers serialize).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// ILU(0): in-place IKJ factorization restricted to A's pattern.
// Replicates pc/ilu.py::_factor_ikj on row dicts built in CSR order:
// for each row i, eliminate pivots k < i in ascending order; updates within
// one pivot touch distinct columns (order-independent), so ascending-k is the
// only ordering that matters for bit-exactness.
// Returns 0 on success, 1+row on zero pivot.
int64_t kn_ilu0(int64_t n, const int64_t* indptr, const int64_t* indices,
                double* data) {
  std::vector<int64_t> pos(n, -1);    // column -> index in row i
  std::vector<int64_t> diag(n, -1);   // row -> index of its diagonal entry
  for (int64_t i = 0; i < n; ++i) {
    const int64_t lo = indptr[i], hi = indptr[i + 1];
    for (int64_t p = lo; p < hi; ++p) {
      pos[indices[p]] = p;
      if (indices[p] == i) diag[i] = p;
    }
    for (int64_t p = lo; p < hi; ++p) {
      const int64_t k = indices[p];
      if (k >= i) break;  // ascending columns: pivots first
      const int64_t dk = diag[k];
      const double akk = (dk >= 0) ? data[dk] : 0.0;
      if (akk == 0.0) {
        for (int64_t q = lo; q < hi; ++q) pos[indices[q]] = -1;
        return 1 + k;
      }
      const double lik = data[p] / akk;
      data[p] = lik;
      for (int64_t q = indptr[k]; q < indptr[k + 1]; ++q) {
        const int64_t j = indices[q];
        if (j <= k) continue;
        const int64_t pj = pos[j];
        if (pj >= 0) data[pj] -= lik * data[q];
      }
    }
    for (int64_t q = lo; q < hi; ++q) pos[indices[q]] = -1;
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Stash for variable-size factor outputs (ILUp symbolic, ILUT).
namespace {
struct FactorStash {
  std::vector<int64_t> l_indptr, l_indices, u_indptr, u_indices;
  std::vector<double> l_data, u_data;
  bool live = false;
};
FactorStash g_stash;

// Sorted-row accumulator replicating a Python dict keyed by column with
// *insertion order* tracked (ILUT's keep-largest tie-breaking is Python's
// stable sort over dict order, so insertion order is semantically load-
// bearing there).
struct Row {
  std::vector<int64_t> cols;   // insertion order
  std::vector<double> vals;
  std::vector<uint8_t> dead;   // tombstones (ILUT deletes small pivots)
  std::vector<int64_t> lookup_cols;  // sorted for binary search
  std::vector<int64_t> lookup_pos;
  int64_t find(int64_t j) const {
    auto it = std::lower_bound(lookup_cols.begin(), lookup_cols.end(), j);
    if (it == lookup_cols.end() || *it != j) return -1;
    int64_t p = lookup_pos[it - lookup_cols.begin()];
    return dead[p] ? -1 : p;
  }
  void insert(int64_t j, double v) {  // j must not be present (live)
    auto it = std::lower_bound(lookup_cols.begin(), lookup_cols.end(), j);
    int64_t p = (int64_t)cols.size();
    cols.push_back(j);
    vals.push_back(v);
    dead.push_back(0);
    int64_t at = it - lookup_cols.begin();
    lookup_cols.insert(lookup_cols.begin() + at, j);
    lookup_pos.insert(lookup_pos.begin() + at, p);
  }
};
}  // namespace

// ---------------------------------------------------------------------------
// ILU(p): symbolic level-of-fill + numeric factorization on the expanded
// pattern. Replicates pc/ilu.py::ilup — dynamic sorted worklist of pivots,
// lev(i,j) = min(lev, lev(i,k)+lev(k,j)+1) capped at `fill`
// (reference ilup.rs:113-122) — then _factor_ikj numeric on the pattern.
// Output: FULL factored rows (L strict + diag + U) in CSR, stashed as the
// "u" slot (single combined matrix); fetch with kn_fetch_u. Returns
// combined nnz, or -(1+row) on zero pivot.
int64_t kn_ilup(int64_t n, const int64_t* indptr, const int64_t* indices,
                const double* data, int64_t fill) {
  // --- symbolic: per-row level maps (sorted vectors) ---
  std::vector<std::vector<int64_t>> pat(n);   // sorted columns
  std::vector<std::vector<int64_t>> lev(n);   // levels aligned with pat
  for (int64_t i = 0; i < n; ++i) {
    const int64_t lo = indptr[i], hi = indptr[i + 1];
    pat[i].reserve(hi - lo + 1);
    bool has_diag = false;
    for (int64_t p = lo; p < hi; ++p) {
      pat[i].push_back(indices[p]);
      if (indices[p] == i) has_diag = true;
    }
    if (!has_diag) {
      auto it = std::lower_bound(pat[i].begin(), pat[i].end(), i);
      pat[i].insert(it, i);
    }
    lev[i].assign(pat[i].size(), 0);
  }
  std::vector<int64_t> levlook;  // dense scratch: column -> level index+1
  levlook.assign(n, 0);
  for (int64_t i = 0; i < n; ++i) {
    auto& pi = pat[i];
    auto& li = lev[i];
    // worklist = pivots k < i in ascending order, with dynamic insertions
    std::vector<int64_t> ks;
    for (int64_t t = 0; t < (int64_t)pi.size() && pi[t] < i; ++t)
      ks.push_back(pi[t]);
    for (size_t idx = 0; idx < ks.size(); ++idx) {
      const int64_t k = ks[idx];
      // locate k's level in row i
      auto itk = std::lower_bound(pi.begin(), pi.end(), k);
      const int64_t lik = li[itk - pi.begin()];
      if (lik > fill) continue;
      auto& pk = pat[k];
      auto& lk = lev[k];
      for (size_t t = 0; t < pk.size(); ++t) {
        const int64_t j = pk[t];
        if (j <= k) continue;
        const int64_t new_lev = lik + lk[t] + 1;
        if (new_lev > fill) continue;
        auto itj = std::lower_bound(pi.begin(), pi.end(), j);
        if (itj != pi.end() && *itj == j) {
          int64_t& cur = li[itj - pi.begin()];
          if (new_lev < cur) cur = new_lev;
        } else {
          int64_t at = itj - pi.begin();
          pi.insert(itj, j);
          li.insert(li.begin() + at, new_lev);
          if (j < i) {
            auto itw = std::lower_bound(ks.begin(), ks.end(), j);
            ks.insert(itw, j);
          }
        }
      }
    }
  }
  // --- numeric: build expanded CSR, zero-fill new entries, run ILU(0) ---
  std::vector<int64_t> xptr(n + 1, 0);
  for (int64_t i = 0; i < n; ++i) xptr[i + 1] = xptr[i] + pat[i].size();
  std::vector<int64_t> xind(xptr[n]);
  std::vector<double> xdat(xptr[n], 0.0);
  for (int64_t i = 0; i < n; ++i)
    std::copy(pat[i].begin(), pat[i].end(), xind.begin() + xptr[i]);
  // scatter A's values onto the pattern
  for (int64_t i = 0; i < n; ++i) {
    const auto base = xind.begin() + xptr[i];
    const auto end = xind.begin() + xptr[i + 1];
    for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) {
      auto it = std::lower_bound(base, end, indices[p]);
      xdat[it - xind.begin()] += data[p];
    }
  }
  int64_t rc = kn_ilu0(n, xptr.data(), xind.data(), xdat.data());
  if (rc != 0) return -rc;
  g_stash.u_indptr = std::move(xptr);
  g_stash.u_indices = std::move(xind);
  g_stash.u_data = std::move(xdat);
  g_stash.l_indptr.clear();
  g_stash.l_indices.clear();
  g_stash.l_data.clear();
  g_stash.live = true;
  return (int64_t)g_stash.u_data.size();
}

// ---------------------------------------------------------------------------
// ILUT(fill, droptol): Saad §10.4 row-wise elimination with dual dropping.
// Replicates pc/ilu.py::ilut(eliminate=True) including:
//  - tau_i = droptol * ||row_i||_2 (computed by summation in CSR order)
//  - pivot drop: |lik| < tau_i deletes the entry (tombstone)
//  - fill-in accepted only when |new| >= tau_i; existing entries always update
//  - dynamic sorted pivot worklist (fill-ins with j < i are eliminated too)
//  - keep `fill` largest in each of the strict-L and strict-U parts, ties
//    broken by INSERTION order (Python stable sort over dict order)
//  - zero diagonal replaced by norm_i * 1e-12
// Stashes L (strict, unit-diag implied) and the D+U upper part separately;
// returns (l_nnz << 32) | u_nnz packed, or -1 on overflow (nnz >= 2^32).
int64_t kn_ilut(int64_t n, const int64_t* indptr, const int64_t* indices,
                const double* data, int64_t fill, double droptol) {
  std::vector<Row> out(n);  // factored rows (post dual-drop), sorted lookup
  std::vector<int64_t> l_ptr(n + 1, 0), u_ptr(n + 1, 0);
  std::vector<std::vector<int64_t>> l_cols(n), u_cols(n);
  std::vector<std::vector<double>> l_vals(n), u_vals(n);

  std::vector<std::pair<double, int64_t>> keep;  // (-|v|, insertion idx)
  for (int64_t i = 0; i < n; ++i) {
    const int64_t lo = indptr[i], hi = indptr[i + 1];
    Row w;
    double nrm2 = 0.0;
    for (int64_t p = lo; p < hi; ++p) {
      w.insert(indices[p], data[p]);
      nrm2 += data[p] * data[p];
    }
    double norm_i = std::sqrt(nrm2);
    if (norm_i == 0.0) norm_i = 1.0;
    const double tau_i = droptol * norm_i;
    // dynamic sorted worklist of live pivots k < i
    std::vector<int64_t> ks;
    for (int64_t p = lo; p < hi && indices[p] < i; ++p)
      ks.push_back(indices[p]);
    for (size_t kidx = 0; kidx < ks.size(); ++kidx) {
      const int64_t k = ks[kidx];
      const Row& rk = out[k];
      const int64_t dkp = rk.find(k);
      const double ukk = (dkp >= 0) ? rk.vals[dkp] : 0.0;
      if (ukk == 0.0) continue;
      const int64_t pk = w.find(k);
      if (pk < 0) continue;  // was dropped earlier
      const double lik = w.vals[pk] / ukk;
      if (std::fabs(lik) < tau_i) {
        w.dead[pk] = 1;
        continue;
      }
      w.vals[pk] = lik;
      // subtract lik * U-part of factored row k (insertion order of rk —
      // updates hit distinct columns, order-independent for existing
      // entries; for FILL-IN creation the insertion order determines w's
      // dict order, and rk rows are stored in their own insertion order,
      // matching the Python dict iteration)
      for (size_t t = 0; t < rk.cols.size(); ++t) {
        if (rk.dead[t]) continue;
        const int64_t j = rk.cols[t];
        if (j <= k) continue;
        const double ukj = rk.vals[t];
        const int64_t pj = w.find(j);
        if (pj >= 0) {
          w.vals[pj] -= lik * ukj;
        } else {
          const double newv = -lik * ukj;
          if (std::fabs(newv) >= tau_i) {
            w.insert(j, newv);
            if (j < i) {
              auto itw = std::lower_bound(ks.begin(), ks.end(), j);
              ks.insert(itw, j);
            }
          }
        }
      }
    }
    // dual dropping: keep `fill` largest (stable by insertion order) in the
    // strict-L and strict-U parts; diagonal always kept
    double diag = 0.0;
    const int64_t pd = w.find(i);
    if (pd >= 0) diag = w.vals[pd];
    Row& o = out[i];
    o.insert(i, diag != 0.0 ? diag : norm_i * 1e-12);
    for (int part = 0; part < 2; ++part) {
      keep.clear();
      for (size_t t = 0; t < w.cols.size(); ++t) {
        if (w.dead[t]) continue;
        const int64_t j = w.cols[t];
        const bool in_part = part == 0 ? (j < i) : (j > i);
        if (in_part) keep.emplace_back(-std::fabs(w.vals[t]), (int64_t)t);
      }
      std::stable_sort(keep.begin(), keep.end(),
                       [](const auto& a, const auto& b) { return a.first < b.first; });
      const size_t m = std::min<size_t>(keep.size(), (size_t)std::max<int64_t>(fill, 0));
      for (size_t t = 0; t < m; ++t) {
        const int64_t p = keep[t].second;
        o.insert(w.cols[p], w.vals[p]);
      }
    }
    // emit CSR rows in SORTED column order (Python _rowdicts_to_LU feeds
    // from_coo which sorts)
    for (size_t a = 0; a < o.lookup_cols.size(); ++a) {
      const int64_t j = o.lookup_cols[a];
      const double v = o.vals[o.lookup_pos[a]];
      if (j < i) {
        l_cols[i].push_back(j);
        l_vals[i].push_back(v);
      } else {
        u_cols[i].push_back(j);
        u_vals[i].push_back(v);
      }
    }
    l_ptr[i + 1] = l_ptr[i] + l_cols[i].size();
    u_ptr[i + 1] = u_ptr[i] + u_cols[i].size();
  }
  const int64_t lnnz = l_ptr[n], unnz = u_ptr[n];
  if (lnnz >= (int64_t(1) << 32) || unnz >= (int64_t(1) << 32)) return -1;
  g_stash.l_indptr = std::move(l_ptr);
  g_stash.u_indptr = std::move(u_ptr);
  g_stash.l_indices.clear(); g_stash.l_indices.reserve(lnnz);
  g_stash.l_data.clear(); g_stash.l_data.reserve(lnnz);
  g_stash.u_indices.clear(); g_stash.u_indices.reserve(unnz);
  g_stash.u_data.clear(); g_stash.u_data.reserve(unnz);
  for (int64_t i = 0; i < n; ++i) {
    g_stash.l_indices.insert(g_stash.l_indices.end(), l_cols[i].begin(), l_cols[i].end());
    g_stash.l_data.insert(g_stash.l_data.end(), l_vals[i].begin(), l_vals[i].end());
    g_stash.u_indices.insert(g_stash.u_indices.end(), u_cols[i].begin(), u_cols[i].end());
    g_stash.u_data.insert(g_stash.u_data.end(), u_vals[i].begin(), u_vals[i].end());
  }
  g_stash.live = true;
  return (lnnz << 32) | unnz;
}

// Fetch the stashed L factor (strict lower). Buffers must be sized from the
// factor call's return. Returns 0, or -1 if no stash is live.
int64_t kn_fetch_l(int64_t n, int64_t* indptr, int64_t* indices, double* data) {
  if (!g_stash.live || (int64_t)g_stash.l_indptr.size() != n + 1) return -1;
  std::memcpy(indptr, g_stash.l_indptr.data(), (n + 1) * sizeof(int64_t));
  std::memcpy(indices, g_stash.l_indices.data(),
              g_stash.l_indices.size() * sizeof(int64_t));
  std::memcpy(data, g_stash.l_data.data(), g_stash.l_data.size() * sizeof(double));
  return 0;
}

// Fetch the stashed U (or combined, for ILUp) factor and release the stash.
int64_t kn_fetch_u(int64_t n, int64_t* indptr, int64_t* indices, double* data) {
  if (!g_stash.live || (int64_t)g_stash.u_indptr.size() != n + 1) return -1;
  std::memcpy(indptr, g_stash.u_indptr.data(), (n + 1) * sizeof(int64_t));
  std::memcpy(indices, g_stash.u_indices.data(),
              g_stash.u_indices.size() * sizeof(int64_t));
  std::memcpy(data, g_stash.u_data.data(), g_stash.u_data.size() * sizeof(double));
  g_stash = FactorStash();
  return 0;
}

// ---------------------------------------------------------------------------
// Level scheduling for triangular patterns (pc/coloring.py::level_schedule_*).
// level[i] = 1 + max(level[deps]) over deps j < i (lower) or j > i (upper,
// processed in reverse). Returns the number of levels.
int64_t kn_level_schedule(int64_t n, const int64_t* indptr,
                          const int64_t* indices, int64_t lower,
                          int64_t* level) {
  std::memset(level, 0, n * sizeof(int64_t));
  int64_t maxlev = 0;
  if (lower) {
    for (int64_t i = 0; i < n; ++i) {
      int64_t m = -1;
      for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) {
        const int64_t j = indices[p];
        if (j < i && level[j] > m) m = level[j];
      }
      level[i] = m + 1;
      if (level[i] > maxlev) maxlev = level[i];
    }
  } else {
    for (int64_t i = n - 1; i >= 0; --i) {
      int64_t m = -1;
      for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) {
        const int64_t j = indices[p];
        if (j > i && level[j] > m) m = level[j];
      }
      level[i] = m + 1;
      if (level[i] > maxlev) maxlev = level[i];
    }
  }
  return n ? maxlev + 1 : 0;
}

// ---------------------------------------------------------------------------
// AMG RAP filtering (pc/amg.py::_filter_rap): drop |a_ij| below
// drop_tol*sqrt(rowmax_i*rowmax_j) (squared form, diagonal always kept),
// compensate each row's dropped mass by adding sum|dropped| to its
// diagonal. Mirrors the scipy construction exactly, including the
// union-with-diags pattern: the output has an explicit diagonal entry in
// EVERY row (scipy's `filtered + sp.diags(lump)` keeps explicit zeros).
// Input must be canonical CSR (sorted, deduped). Result is stashed
// (fetch with kn_fetch_u); returns output nnz. Templated over the index
// type: scipy CSRs carry int32 indices below 2^31 nnz, and converting
// them to int64 on the Python side cost 1.5 s of a 9 s AMG setup.
}  // extern "C" (templates cannot take C linkage)

template <typename I>
static int64_t filter_rap_impl(int64_t n, const I* indptr, const I* indices,
                               const double* data, double drop_tol) {
  std::vector<double> rowmax(n, 0.0);
  for (int64_t i = 0; i < n; ++i) {
    double m = 0.0;
    for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) {
      const double a = std::fabs(data[p]);
      if (a > m) m = a;
    }
    rowmax[i] = m;
  }
  const double tol2 = drop_tol * drop_tol;
  std::vector<int64_t> optr(n + 1, 0);
  std::vector<int64_t> oind;
  std::vector<double> odat;
  oind.reserve(indptr[n] + n);
  odat.reserve(indptr[n] + n);
  for (int64_t i = 0; i < n; ++i) {
    double lump = 0.0;
    const int64_t lo = (int64_t)indptr[i], hi = (int64_t)indptr[i + 1];
    // pass 1 over the row: dropped mass (CSR order, matching bincount)
    for (int64_t p = lo; p < hi; ++p) {
      const int64_t j = indices[p];
      const double a = std::fabs(data[p]);
      const bool keep = (a * a >= tol2 * rowmax[i] * rowmax[j]) || (j == i);
      if (!keep) lump += a;
    }
    // pass 2: emit kept entries with the diagonal inserted/updated
    bool diag_done = false;
    for (int64_t p = lo; p < hi; ++p) {
      const int64_t j = indices[p];
      const double a = std::fabs(data[p]);
      const bool keep = (a * a >= tol2 * rowmax[i] * rowmax[j]) || (j == i);
      if (!diag_done && j > i) {  // diagonal absent in A's row: insert lump
        oind.push_back(i);
        odat.push_back(lump);
        diag_done = true;
      }
      if (j == i) {
        oind.push_back(i);
        odat.push_back(data[p] + lump);
        diag_done = true;
      } else if (keep) {
        oind.push_back(j);
        odat.push_back(data[p]);
      }
    }
    if (!diag_done) {
      oind.push_back(i);
      odat.push_back(lump);
    }
    optr[i + 1] = (int64_t)oind.size();
  }
  const int64_t nnz = optr[n];
  g_stash.u_indptr = std::move(optr);
  g_stash.u_indices = std::move(oind);
  g_stash.u_data = std::move(odat);
  g_stash.l_indptr.clear();
  g_stash.l_indices.clear();
  g_stash.l_data.clear();
  g_stash.live = true;
  return nnz;
}

extern "C" {

int64_t kn_filter_rap(int64_t n, const int64_t* indptr, const int64_t* indices,
                      const double* data, double drop_tol) {
  return filter_rap_impl<int64_t>(n, indptr, indices, data, drop_tol);
}

int64_t kn_filter_rap32(int64_t n, const int32_t* indptr,
                        const int32_t* indices, const double* data,
                        double drop_tol) {
  return filter_rap_impl<int32_t>(n, indptr, indices, data, drop_tol);
}

// ---------------------------------------------------------------------------
// Batched dense principal submatrices (BlockJacobi/ASM setup,
// reference block_jacobi.rs:39-61 / asm.rs:59-65): for each block k with
// (padded, -1-terminated-by-mask) row set idx[k, :], write
// out[k, p, q] = A[idx[k,p], idx[k,q]] over entries present in A
// (duplicates summed, matching CSRMatrix.todense's += semantics).
// out must be ZERO-initialized by the caller; rows/cols not in the block
// are skipped via a stamp lookup. idx values beyond the block length are -1.
void kn_extract_blocks(int64_t n, const int64_t* indptr, const int64_t* indices,
                       const double* data, int64_t nb, int64_t bmax,
                       const int64_t* idx, double* out) {
  std::vector<int64_t> pos(n, -1);
  std::vector<int64_t> stamp(n, -1);
  for (int64_t k = 0; k < nb; ++k) {
    const int64_t* rows = idx + k * bmax;
    for (int64_t p = 0; p < bmax; ++p) {
      const int64_t g = rows[p];
      if (g < 0) break;  // -1 padding is trailing
      pos[g] = p;
      stamp[g] = k;
    }
    double* blk = out + k * bmax * bmax;
    for (int64_t p = 0; p < bmax; ++p) {
      const int64_t g = rows[p];
      if (g < 0) break;
      for (int64_t t = indptr[g]; t < indptr[g + 1]; ++t) {
        const int64_t j = indices[t];
        if (stamp[j] == k) blk[p * bmax + pos[j]] += data[t];
      }
    }
  }
}

// ---------------------------------------------------------------------------
// Greedy graph coloring (pc/coloring.py / reference coloring.rs:39-64).
// distance=1: neighbors only; distance=2: neighbors + neighbors-of-neighbors.
// The diagonal is excluded. Deterministic ascending-row greedy — identical
// to the Python oracle. Returns the number of colors.
int64_t kn_color(int64_t n, const int64_t* indptr, const int64_t* indices,
                 int64_t distance, int64_t* colors) {
  std::fill(colors, colors + n, (int64_t)-1);
  std::vector<int64_t> stamp(n + 1, -1);  // color -> last row that used it
  int64_t ncolors = 0;
  for (int64_t i = 0; i < n; ++i) {
    for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) {
      const int64_t j = indices[p];
      if (j == i) continue;
      if (colors[j] >= 0) stamp[colors[j]] = i;
      if (distance >= 2) {
        for (int64_t q = indptr[j]; q < indptr[j + 1]; ++q) {
          const int64_t j2 = indices[q];
          if (j2 == i || j2 == j) continue;
          if (colors[j2] >= 0) stamp[colors[j2]] = i;
        }
      }
    }
    int64_t c = 0;
    while (stamp[c] == i) ++c;
    colors[i] = c;
    if (c + 1 > ncolors) ncolors = c + 1;
  }
  return ncolors;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// CSR -> DIA conversion (ops/dia.py::scipy_to_dia / csr_to_dia). The numpy
// path costs ~44 s for the five levels of an 8M-dof GMG setup (np.repeat row
// expansion + searchsorted + astype + fancy assignment, each a separate
// O(nnz) pass); this is the same work in one fused pass. Replicates the
// Python arithmetic exactly: the offset list is ascending-unique (bitmap
// scan == np.unique), values are cast f64 -> out dtype with C semantics
// (== numpy astype), and duplicates accumulate in out-dtype in CSR order
// (== np.add.at; for canonical CSR there are no duplicates and += on the
// zero-initialized panel equals direct assignment).

namespace {

template <typename I>
int64_t dia_offsets_impl(int64_t n, const I* indptr, const I* indices,
                         int64_t cap, int64_t* offs_out) {
  if (n <= 0) return 0;  // 2*n-1 would underflow the vector size below
  std::vector<uint8_t> seen(2 * n - 1, 0);
  for (int64_t i = 0; i < n; ++i)
    for (int64_t t = indptr[i]; t < indptr[i + 1]; ++t)
      seen[(int64_t)indices[t] - i + n - 1] = 1;
  int64_t cnt = 0;
  for (int64_t d = 0; d < 2 * n - 1; ++d)
    if (seen[d]) {
      if (cnt < cap) offs_out[cnt] = d - (n - 1);
      ++cnt;
    }
  return cnt;
}

template <typename I, typename F>
void csr_to_dia_impl(int64_t n, const I* indptr, const I* indices,
                     const double* data, int64_t noffs, const int64_t* offs,
                     F* out) {
  if (n <= 0) return;  // 2*n-1 would underflow the vector size below
  // d -> diagonal slot; int32 is enough (noffs <= max_offsets << 2^31)
  std::vector<int32_t> lut(2 * n - 1, -1);
  for (int64_t k = 0; k < noffs; ++k) lut[offs[k] + n - 1] = (int32_t)k;
  for (int64_t i = 0; i < n; ++i)
    for (int64_t t = indptr[i]; t < indptr[i + 1]; ++t) {
      const int64_t k = lut[(int64_t)indices[t] - i + n - 1];
      out[k * n + i] += (F)data[t];
    }
}

}  // namespace

extern "C" {

int64_t kn_dia_offsets(int64_t n, const int64_t* indptr, const int64_t* indices,
                       int64_t cap, int64_t* offs_out) {
  return dia_offsets_impl<int64_t>(n, indptr, indices, cap, offs_out);
}

int64_t kn_dia_offsets32(int64_t n, const int32_t* indptr,
                         const int32_t* indices, int64_t cap,
                         int64_t* offs_out) {
  return dia_offsets_impl<int32_t>(n, indptr, indices, cap, offs_out);
}

void kn_csr_to_dia_f32(int64_t n, const int64_t* indptr, const int64_t* indices,
                       const double* data, int64_t noffs, const int64_t* offs,
                       float* out) {
  csr_to_dia_impl<int64_t, float>(n, indptr, indices, data, noffs, offs, out);
}

void kn_csr_to_dia_f32_i32(int64_t n, const int32_t* indptr,
                           const int32_t* indices, const double* data,
                           int64_t noffs, const int64_t* offs, float* out) {
  csr_to_dia_impl<int32_t, float>(n, indptr, indices, data, noffs, offs, out);
}

void kn_csr_to_dia_f64(int64_t n, const int64_t* indptr, const int64_t* indices,
                       const double* data, int64_t noffs, const int64_t* offs,
                       double* out) {
  csr_to_dia_impl<int64_t, double>(n, indptr, indices, data, noffs, offs, out);
}

void kn_csr_to_dia_f64_i32(int64_t n, const int32_t* indptr,
                           const int32_t* indices, const double* data,
                           int64_t noffs, const int64_t* offs, double* out) {
  csr_to_dia_impl<int32_t, double>(n, indptr, indices, data, noffs, offs, out);
}

}  // extern "C"
