// Native edge-plan builder for the Pallas SpMV kernel.
//
// C++ counterpart of graphmat_tpu/ops/pallas_spmv.py::build_spmv_plan —
// the graph-construction hot path (the reference's analog is the native
// DCSC tile build, include/GMDP/matrices/DCSCTile.h:241-381).  Sorts edges
// by (receiver block, sender) with a parallel radix-ish bucket sort, forms
// greedy 128-edge rows under the 128-row sender-window constraint, and
// packs the chunk arrays directly into caller-allocated numpy buffers.
//
// Exposed via a C ABI for ctypes (no pybind11 in this image).
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC planner.cpp -o libgmplanner.so

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {

constexpr int kLane = 128;
constexpr int kRowsPerChunk = 8;

struct Plan {
  int64_t e = 0;
  int32_t h = 0, wr = 0, nb = 0, row_e = 128, win = 128;
  int64_t nc = 0;
  // edges sorted by (receiver block, sender)
  std::vector<int32_t> s, r;
  std::vector<float> v;
  // greedy rows: start, stop (into sorted arrays), base, block
  std::vector<int64_t> row_start, row_stop;
  std::vector<int32_t> row_base, row_block;
  std::vector<int64_t> chunk_base_per_block;  // prefix of chunks per block
  std::vector<int64_t> rows_before_block;     // prefix of rows per block
};

}  // namespace

extern "C" {

// Phase 1: sort + row formation.  Returns an opaque handle; *nc_out gets the
// chunk count (so python can allocate the output arrays).
void* gm_plan_create(const int32_t* senders, const int32_t* receivers,
                     const float* vals, int64_t e, int32_t h, int32_t wr,
                     int32_t nb, int32_t row_e, int32_t win,
                     int64_t* nc_out) {
  auto* p = new Plan();
  p->e = e;
  p->h = h;
  p->wr = wr;
  p->nb = nb;
  p->row_e = row_e;
  p->win = win;

  // ---- bucket edges by receiver block (stable counting sort), then sort
  // each block by sender in parallel.
  std::vector<int64_t> counts(nb + 1, 0);
  for (int64_t i = 0; i < e; ++i) counts[receivers[i] / wr + 1]++;
  for (int32_t b = 0; b < nb; ++b) counts[b + 1] += counts[b];
  std::vector<int64_t> cursor(counts.begin(), counts.end() - 1);
  std::vector<int64_t> order(e);
  for (int64_t i = 0; i < e; ++i) order[cursor[receivers[i] / wr]++] = i;

  p->s.resize(e);
  p->r.resize(e);
  p->v.resize(e);
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < e; ++i) {
    const int64_t j = order[i];
    p->s[i] = senders[j];
    p->r[i] = receivers[j];
    p->v[i] = vals[j];
  }

  // per-block sort by sender (receiver order within a block is free; the
  // kernel's scatter one-hot does not require receiver sortedness)
  std::vector<std::vector<int>> dummy;  // keep compilers honest
#pragma omp parallel for schedule(dynamic)
  for (int32_t b = 0; b < nb; ++b) {
    const int64_t lo = counts[b], hi = counts[b + 1];
    if (hi - lo > 1) {
      // sort index range [lo, hi) of (s, r, v) jointly by s
      std::vector<int64_t> idx(hi - lo);
      for (int64_t k = 0; k < hi - lo; ++k) idx[k] = lo + k;
      std::stable_sort(idx.begin(), idx.end(), [&](int64_t a, int64_t c) {
        return p->s[a] < p->s[c];
      });
      std::vector<int32_t> ts(hi - lo), tr(hi - lo);
      std::vector<float> tv(hi - lo);
      for (int64_t k = 0; k < hi - lo; ++k) {
        ts[k] = p->s[idx[k]];
        tr[k] = p->r[idx[k]];
        tv[k] = p->v[idx[k]];
      }
      std::memcpy(&p->s[lo], ts.data(), ts.size() * sizeof(int32_t));
      std::memcpy(&p->r[lo], tr.data(), tr.size() * sizeof(int32_t));
      std::memcpy(&p->v[lo], tv.data(), tv.size() * sizeof(float));
    }
  }

  // ---- greedy rows per block (parallel over blocks; rows appended later
  // in block order)
  std::vector<std::vector<int64_t>> starts(nb), stops(nb);
  std::vector<std::vector<int32_t>> bases(nb);
#pragma omp parallel for schedule(dynamic)
  for (int32_t b = 0; b < nb; ++b) {
    int64_t i = counts[b];
    const int64_t end = counts[b + 1];
    while (i < end) {
      int32_t base = (p->s[i] >> 7) & ~7;
      if (base > h - win) base = h - win;
      const int32_t limit_sender = (base + win) << 7;
      int64_t stop = i;
      const int64_t cap = std::min<int64_t>(i + row_e, end);
      while (stop < cap && p->s[stop] < limit_sender) ++stop;
      starts[b].push_back(i);
      stops[b].push_back(stop);
      bases[b].push_back(base);
      i = stop;
    }
  }

  p->rows_before_block.assign(nb + 1, 0);
  p->chunk_base_per_block.assign(nb + 1, 0);
  for (int32_t b = 0; b < nb; ++b) {
    const int64_t nrow = (int64_t)starts[b].size();
    p->rows_before_block[b + 1] = p->rows_before_block[b] + nrow;
    const int64_t nchunk =
        std::max<int64_t>((nrow + kRowsPerChunk - 1) / kRowsPerChunk, 1);
    p->chunk_base_per_block[b + 1] = p->chunk_base_per_block[b] + nchunk;
  }
  const int64_t nrows = p->rows_before_block[nb];
  p->row_start.resize(nrows);
  p->row_stop.resize(nrows);
  p->row_base.resize(nrows);
  p->row_block.resize(nrows);
#pragma omp parallel for schedule(static)
  for (int32_t b = 0; b < nb; ++b) {
    int64_t off = p->rows_before_block[b];
    for (size_t k = 0; k < starts[b].size(); ++k) {
      p->row_start[off + k] = starts[b][k];
      p->row_stop[off + k] = stops[b][k];
      p->row_base[off + k] = bases[b][k];
      p->row_block[off + k] = b;
    }
  }

  p->nc = p->chunk_base_per_block[nb];
  *nc_out = p->nc;
  return p;
}

// Phase 2: fill caller-allocated [nc]-shaped arrays.
void gm_plan_fill(void* handle, int32_t* blkid, int32_t* hiabs, int32_t* slo,
                  int32_t* rrel, float* vals, float* mask) {
  auto* p = static_cast<Plan*>(handle);
  const int64_t nc = p->nc;
  const int64_t row_e = p->row_e;
  const int64_t chunk_elems = (int64_t)kRowsPerChunk * row_e;

#pragma omp parallel for schedule(static)
  for (int64_t c = 0; c < nc; ++c) {
    std::memset(hiabs + c * chunk_elems, 0, chunk_elems * sizeof(int32_t));
    std::memset(slo + c * chunk_elems, 0, chunk_elems * sizeof(int32_t));
    std::memset(rrel + c * chunk_elems, 0, chunk_elems * sizeof(int32_t));
    std::memset(vals + c * chunk_elems, 0, chunk_elems * sizeof(float));
    std::memset(mask + c * chunk_elems, 0, chunk_elems * sizeof(float));
  }

#pragma omp parallel for schedule(static)
  for (int32_t b = 0; b < p->nb; ++b) {
    const int64_t c0 = p->chunk_base_per_block[b];
    const int64_t c1 = p->chunk_base_per_block[b + 1];
    for (int64_t c = c0; c < c1; ++c) blkid[c] = b;

    const int64_t row0 = p->rows_before_block[b];
    const int64_t nrow = p->rows_before_block[b + 1] - row0;
    for (int64_t k = 0; k < nrow; ++k) {
      const int64_t row = row0 + k;
      const int64_t ci = c0 + k / kRowsPerChunk;
      const int64_t ri = k % kRowsPerChunk;
      int32_t* hi_out = hiabs + (ci * kRowsPerChunk + ri) * row_e;
      int32_t* slo_out = slo + (ci * kRowsPerChunk + ri) * row_e;
      int32_t* rr_out = rrel + (ci * kRowsPerChunk + ri) * row_e;
      float* v_out = vals + (ci * kRowsPerChunk + ri) * row_e;
      float* m_out = mask + (ci * kRowsPerChunk + ri) * row_e;
      const int64_t st = p->row_start[row], sp = p->row_stop[row];
      const int32_t base = p->row_base[row];
      for (int64_t t = 0; t < sp - st; ++t) {
        const int32_t s = p->s[st + t];
        hi_out[t] = s >> 7;
        slo_out[t] = s & 127;
        rr_out[t] = p->r[st + t] - (int64_t)b * p->wr;
        v_out[t] = p->v[st + t];
        m_out[t] = 1.0f;
      }
      for (int64_t t = sp - st; t < row_e; ++t) hi_out[t] = base;
    }
    // chunks with no rows (empty block placeholder) keep hiabs=0
  }
}

void gm_plan_destroy(void* handle) { delete static_cast<Plan*>(handle); }

int gm_omp_threads() {
#if defined(_OPENMP)
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"
