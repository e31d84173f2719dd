// tagrec_tpu native host runtime — C++ implementations of the host-side hot
// paths (file parsing, ELL packing, neighbor-table sampling, rejection
// negative sampling).  The reference has no native code (SURVEY.md §2: its
// perf-critical loops bottom out in prebuilt torch kernels); these are the
// framework's own native runtime components, exposed through a C ABI consumed
// via ctypes (tagrec_tpu/runtime/__init__.py).  Python/numpy fallbacks exist
// for every entry point; golden tests assert equivalence.
//
// Build: g++ -O3 -march=native -shared -fPIC native.cpp -o libtagrec_native.so

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <random>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Fast interaction-file parser: "u i1 i2 ...\n" lines -> flat (u, i) pairs.
// Returns the number of pairs written, or -1 on error.  Two-pass protocol:
// call with out_u == nullptr to get the required capacity.
// ---------------------------------------------------------------------------
int64_t parse_interactions(const char* path, int64_t* out_u, int64_t* out_i,
                           int64_t capacity) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<char> buf(size + 1);
  if (size > 0 && fread(buf.data(), 1, size, f) != (size_t)size) {
    fclose(f);
    return -1;
  }
  fclose(f);
  buf[size] = '\0';

  int64_t n = 0;
  const char* p = buf.data();
  const char* end = p + size;
  while (p < end) {
    // parse one line
    while (p < end && (*p == ' ' || *p == '\r')) p++;
    if (p >= end || *p == '\n') { if (p < end) p++; continue; }
    char* next;
    long long u = strtoll(p, &next, 10);
    if (next == p) { while (p < end && *p != '\n') p++; continue; }
    p = next;
    while (p < end && *p != '\n') {
      while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) p++;
      if (p >= end || *p == '\n') break;
      long long it = strtoll(p, &next, 10);
      if (next == p) break;
      p = next;
      if (out_u) {
        if (n >= capacity) return -2;
        out_u[n] = u;
        out_i[n] = it;
      }
      n++;
    }
    if (p < end && *p == '\n') p++;
  }
  return n;
}

// ---------------------------------------------------------------------------
// Whitespace-separated integer triple parser ("h r t" / "u i t" lines).
// Same two-pass protocol; writes row-major [n, 3].
// ---------------------------------------------------------------------------
int64_t parse_triples(const char* path, int64_t* out, int64_t capacity) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<char> buf(size + 1);
  if (size > 0 && fread(buf.data(), 1, size, f) != (size_t)size) {
    fclose(f);
    return -1;
  }
  fclose(f);
  buf[size] = '\0';

  int64_t n = 0;
  const char* p = buf.data();
  const char* end = p + size;
  long long vals[3];
  while (p < end) {
    int got = 0;
    while (got < 3) {
      while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) p++;
      if (p >= end || *p == '\n') break;
      char* next;
      long long v = strtoll(p, &next, 10);
      if (next == p) break;
      vals[got++] = v;
      p = next;
    }
    while (p < end && *p != '\n') p++;
    if (p < end) p++;
    if (got == 3) {
      if (out) {
        if (n >= capacity) return -2;
        out[3 * n] = vals[0];
        out[3 * n + 1] = vals[1];
        out[3 * n + 2] = vals[2];
      }
      n++;
    }
  }
  return n;
}

// ---------------------------------------------------------------------------
// ELL pack: row-sorted COO (row, col, val) -> fixed-width idx/val tables.
// Caller supplies row-sorted edges, n_rows, width; tables pre-zeroed outside.
// ---------------------------------------------------------------------------
void ell_pack(const int64_t* row, const int64_t* col, const float* val,
              int64_t nnz, int64_t width, int32_t* out_idx, float* out_val,
              int32_t* out_deg) {
  int64_t slot = 0;
  int64_t prev = -1;
  for (int64_t e = 0; e < nnz; e++) {
    int64_t r = row[e];
    if (r != prev) {
      slot = 0;
      prev = r;
    }
    if (slot < width) {
      out_idx[r * width + slot] = (int32_t)col[e];
      out_val[r * width + slot] = val[e];
    }
    slot++;
    out_deg[r] = (int32_t)(slot < width ? slot : width);
  }
}

// ---------------------------------------------------------------------------
// TGCN neighbor-table sampling: for each row of a CSR adjacency, draw k
// neighbors with replacement (ids +1; zero row = padding), plus their
// integer weights (reference data/utils.py:67-106 semantics).
// ---------------------------------------------------------------------------
void neighbor_sample(const int64_t* indptr, const int64_t* cols,
                     const float* vals, int64_t n_rows, int64_t k,
                     uint64_t seed, int32_t* out_idx, int32_t* out_w) {
  std::mt19937_64 rng(seed);
  for (int64_t r = 0; r < n_rows; r++) {
    int64_t lo = indptr[r], hi = indptr[r + 1];
    int64_t deg = hi - lo;
    if (deg == 0) continue;  // leave zeros
    for (int64_t j = 0; j < k; j++) {
      int64_t e = lo + (int64_t)(rng() % (uint64_t)deg);
      out_idx[r * k + j] = (int32_t)(cols[e] + 1);
      out_w[r * k + j] = (int32_t)vals[e];
    }
  }
}

// ---------------------------------------------------------------------------
// Exact rejection negative sampling (reference train_data/utils.py:19-28
// semantics): for each (head) draw uniform ids until one falls outside the
// head's positive set (CSR sorted columns; binary search membership).
// ---------------------------------------------------------------------------
static bool contains_sorted(const int64_t* a, int64_t lo, int64_t hi,
                            int64_t x) {
  while (lo < hi) {
    int64_t mid = (lo + hi) / 2;
    if (a[mid] == x) return true;
    if (a[mid] < x) lo = mid + 1; else hi = mid;
  }
  return false;
}

void sample_negatives(const int64_t* indptr, const int64_t* sorted_cols,
                      const int64_t* heads, int64_t n, int64_t n_ids,
                      uint64_t seed, int64_t* out) {
  std::mt19937_64 rng(seed);
  for (int64_t b = 0; b < n; b++) {
    int64_t h = heads[b];
    int64_t lo = indptr[h], hi = indptr[h + 1];
    for (;;) {
      int64_t cand = (int64_t)(rng() % (uint64_t)n_ids);
      if (!contains_sorted(sorted_cols, lo, hi, cand)) {
        out[b] = cand;
        break;
      }
    }
  }
}

}  // extern "C"
