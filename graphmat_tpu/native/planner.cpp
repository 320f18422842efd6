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
#include <array>
#include <cstdio>
#include <cstdlib>
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

// ---------------------------------------------------------------------------
// v2r plan builder — C++ counterpart of pallas_spmv2.py::build_spmv2_plan.
// Routed [rows,128] chunks: per row each sender registers its gather index
// at its own lane (<=1 sender per (row, lane)); slots are lane-free and
// carry the routing lane, so chunks pack to near-perfect fill regardless
// of sender-lane skew.  Output plane pk = hi2 << 21 | slo << 14 | rcf.
// ---------------------------------------------------------------------------

namespace {

constexpr int kRows2 = 16;        // chunk sublanes (default; caller passes)
constexpr int kHubGran = 20;      // mm layout's hub granule count
constexpr int kRcfBits = 14;      // pk bits [0,14) receiver offset
constexpr int kSloShift = kRcfBits;

struct Plan2 {
  int64_t e = 0;
  int32_t h = 0, wr = 0, nb = 0, hub = 0, rows = kRows2;
  std::vector<int32_t> windows;   // ascending, clamped to h
  // per edge (in cell-bucketed, sender-sorted order = edge_order)
  std::vector<int64_t> edge_order;
  std::vector<int32_t> edge_row;  // row index within the edge's cell
  std::vector<int32_t> gidx;      // gather row index (registration value)
  std::vector<int64_t> cell_edge_start;
  // per final cell (in chunk order)
  std::vector<int64_t> cell_half_start;  // global half id per cell
  std::vector<int64_t> cell_nrows;
  std::vector<int32_t> cell_blk;
  // per chunk: half A/B window metadata (chunks pair halves, possibly
  // from different cells of the same block — tail pairing)
  std::vector<int32_t> ck_kind, ck_blk, ck_base, ck_kind2, ck_base2;
  int64_t nc = 0;
  const int32_t* s = nullptr;     // borrowed views (numpy keeps them alive
  const int32_t* r = nullptr;     //  across create/fill on the python side)
  const float* v = nullptr;
};

// Routed row packer for one cell.  Edges arrive sender-sorted (eo points
// into the global edge arrays).  Emits edge_row (row within cell) and the
// cell's row count.  Greedy: senders in descending degree; per-lane stacks
// of candidate rows (row not full + lane unregistered).
struct RoutedPacker {
  std::vector<std::array<uint64_t, 2>> reg;   // per-row lane bitmap
  std::vector<int32_t> nslots;                // per-row slot fill
  std::vector<int32_t> cand[kLane];           // per-lane candidate rows
  std::vector<int64_t> gstart;                // sender-group starts
  std::vector<int64_t> gord;                  // groups by descending size

  int64_t pack(const int64_t* eo, int64_t m, const int32_t* senders,
               int32_t* edge_row_out) {
    reg.clear(); nslots.clear();
    for (int l = 0; l < kLane; ++l) cand[l].clear();
    gstart.clear();
    gstart.push_back(0);
    for (int64_t j = 1; j < m; ++j)
      if (senders[eo[j]] != senders[eo[j - 1]]) gstart.push_back(j);
    gstart.push_back(m);
    const int64_t ng = (int64_t)gstart.size() - 1;
    gord.resize(ng);
    for (int64_t g = 0; g < ng; ++g) gord[g] = g;
    std::stable_sort(gord.begin(), gord.end(),
                     [&](int64_t a, int64_t b) {
                       return gstart[a + 1] - gstart[a]
                              > gstart[b + 1] - gstart[b];
                     });
    for (int64_t gi = 0; gi < ng; ++gi) {
      const int64_t g = gord[gi];
      int64_t ptr = gstart[g];
      const int64_t end = gstart[g + 1];
      const int L = senders[eo[ptr]] & (kLane - 1);
      while (ptr < end) {
        int32_t row = -1;
        auto& st = cand[L];
        while (!st.empty()) {
          const int32_t cr = st.back();
          if (nslots[cr] >= kLane
              || (reg[cr][L >> 6] >> (L & 63)) & 1) {
            st.pop_back();
            continue;
          }
          row = cr;
          break;
        }
        if (row < 0) {
          row = (int32_t)reg.size();
          reg.push_back({0, 0});
          nslots.push_back(0);
          for (int l = 0; l < kLane; ++l) cand[l].push_back(row);
        }
        reg[row][L >> 6] |= 1ull << (L & 63);
        int64_t take = std::min<int64_t>(end - ptr, kLane - nslots[row]);
        nslots[row] += (int32_t)take;
        while (take--) edge_row_out[ptr++] = row;
      }
    }
    return (int64_t)reg.size();
  }
};

}  // namespace

extern "C" {

void* gm_plan2_create(const int32_t* senders, const int32_t* receivers,
                      const float* vals, int64_t e, int32_t h, int32_t wr,
                      int32_t nb, int32_t hub, const int32_t* windows,
                      int32_t nw, int64_t cell_min, int32_t rows,
                      int64_t* nc_out) {
  auto* p = new Plan2();
  p->e = e; p->h = h; p->wr = wr; p->nb = nb; p->hub = hub;
  p->rows = rows;
  p->s = senders; p->r = receivers; p->v = vals;
  for (int32_t k = 0; k < nw; ++k)
    p->windows.push_back(std::min(windows[k], h));

  const int K = (int)p->windows.size();
  // raw cell key per (class, edge): hub -> blk; class k -> blk*nwin + win
  std::vector<int64_t> nwin(K), class_cells_ofs(K + 1, 0);
  for (int k = 0; k < K; ++k) {
    nwin[k] = (h + p->windows[k] - 1) / p->windows[k];
    class_cells_ofs[k + 1] = class_cells_ofs[k] + (int64_t)nb * nwin[k];
  }
  const int64_t hub_cells = nb;
  const int64_t raw_cells = hub_cells + class_cells_ofs[K];

  // ---- classify edges into (kind, raw cell); gidx per edge ---------------
  std::vector<int32_t> kind(e, -1);
  std::vector<int64_t> rawcell(e);
  p->gidx.resize(e);
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < e; ++i) {
    if (senders[i] < hub) {
      kind[i] = 0;
      rawcell[i] = receivers[i] / wr;
      p->gidx[i] = senders[i] >> 7;
    }
  }
  std::vector<int64_t> cellcnt;
  for (int k = 0; k < K; ++k) {
    const bool last = (k == K - 1);
    const int32_t W = p->windows[k];
    cellcnt.assign((size_t)nb * nwin[k], 0);
    if (!last) {
      for (int64_t i = 0; i < e; ++i)
        if (kind[i] < 0)
          cellcnt[(receivers[i] / wr) * nwin[k] + ((senders[i] >> 7) / W)]++;
    }
    for (int64_t i = 0; i < e; ++i) {
      if (kind[i] >= 0) continue;
      const int64_t c =
          (receivers[i] / wr) * nwin[k] + ((senders[i] >> 7) / W);
      if (last || cellcnt[c] >= cell_min) {
        kind[i] = 1 + k;
        rawcell[i] = hub_cells + class_cells_ofs[k] + c;
        int32_t base = (int32_t)((c % nwin[k]) * W);
        if (base > h - W) base = h - W;
        p->gidx[i] = (senders[i] >> 7) - base;
      }
    }
  }

  // ---- active cells, ordered by (blk, kind, win) --------------------------
  std::vector<int64_t> rawcnt(raw_cells, 0);
  for (int64_t i = 0; i < e; ++i) rawcnt[rawcell[i]]++;
  struct Cell { int64_t raw; int32_t blk, kind, win; };
  std::vector<Cell> cells;
  for (int64_t rc = 0; rc < raw_cells; ++rc) {
    if (!rawcnt[rc]) continue;
    Cell cl;
    cl.raw = rc;
    if (rc < hub_cells) {
      cl.blk = (int32_t)rc; cl.kind = 0; cl.win = 0;
    } else {
      int k = 0;
      while (k + 1 < K && rc - hub_cells >= class_cells_ofs[k + 1]) ++k;
      const int64_t c = rc - hub_cells - class_cells_ofs[k];
      cl.blk = (int32_t)(c / nwin[k]);
      cl.kind = 1 + k;
      cl.win = (int32_t)(c % nwin[k]);
    }
    cells.push_back(cl);
  }
  std::stable_sort(cells.begin(), cells.end(),
                   [](const Cell& a, const Cell& b) {
                     if (a.blk != b.blk) return a.blk < b.blk;
                     if (a.kind != b.kind) return a.kind < b.kind;
                     return a.win < b.win;
                   });

  // empty-block coverage: one empty hub cell per uncovered block
  std::vector<char> covered(nb, 0);
  for (const Cell& cl : cells) covered[cl.blk] = 1;
  std::vector<Cell> final_cells;
  std::vector<int64_t> raw_to_cell(raw_cells, -1);
  size_t ci = 0;
  for (int32_t b = 0; b < nb; ++b) {
    if (!covered[b]) {
      Cell cl; cl.raw = -1; cl.blk = b; cl.kind = 0; cl.win = 0;
      final_cells.push_back(cl);
    }
    while (ci < cells.size() && cells[ci].blk == b) {
      raw_to_cell[cells[ci].raw] = (int64_t)final_cells.size();
      final_cells.push_back(cells[ci]);
      ++ci;
    }
  }
  const size_t nfc = final_cells.size();

  // ---- bucket edges by final cell (stable), then sender-sort per cell ----
  std::vector<int32_t> cellid(e);
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < e; ++i)
    cellid[i] = (int32_t)raw_to_cell[rawcell[i]];
  p->cell_edge_start.assign(nfc + 2, 0);
  for (int64_t i = 0; i < e; ++i) p->cell_edge_start[cellid[i] + 2]++;
  for (size_t q = 2; q < p->cell_edge_start.size(); ++q)
    p->cell_edge_start[q] += p->cell_edge_start[q - 1];
  p->edge_order.resize(e);
  for (int64_t i = 0; i < e; ++i)
    p->edge_order[p->cell_edge_start[cellid[i] + 1]++] = i;
  p->cell_edge_start.pop_back();

  // ---- routed packing per cell (parallel; disjoint ranges) ---------------
  p->edge_row.resize(e);
  p->cell_nrows.assign(nfc, 0);
#pragma omp parallel
  {
    RoutedPacker packer;
    std::vector<int64_t> scratch;
#pragma omp for schedule(dynamic, 8)
    for (int64_t q = 0; q < (int64_t)nfc; ++q) {
      const int64_t lo = p->cell_edge_start[q];
      const int64_t m = p->cell_edge_start[q + 1] - lo;
      if (!m) continue;
      int64_t* eo = &p->edge_order[lo];
      // stable sender sort (senders within a cell; counting over map is
      // overkill — comparison sort is fine at cell sizes)
      std::stable_sort(eo, eo + m, [&](int64_t a, int64_t b) {
        return senders[a] < senders[b];
      });
      p->cell_nrows[q] = packer.pack(eo, m, senders, &p->edge_row[lo]);
    }
  }

  // ---- half-chunk assembly --------------------------------------------
  // each chunk = two rows/2-row halves with independent gather windows;
  // cell tails pair across cells of the same block.  Blocks start on
  // even half ids (pad halves mirror the previous half's window so the
  // kernel's same_win skip makes them free).
  const int64_t halfr = p->rows / 2;
  p->cell_half_start.resize(nfc);
  p->cell_blk.resize(nfc);
  std::vector<int32_t> hkind, hbase, hblk;   // per half
  int32_t cur_blk = -1;
  for (size_t q = 0; q < nfc; ++q) {
    const Cell& cl = final_cells[q];
    if (cl.blk != cur_blk) {
      if (hkind.size() & 1) {       // close the previous block
        hkind.push_back(hkind.back());
        hbase.push_back(hbase.back());
        hblk.push_back(hblk.back());
      }
      cur_blk = cl.blk;
    }
    int32_t kv = cl.kind, bv = 0;
    if (cl.kind != 0) {
      const int32_t W = p->windows[cl.kind - 1];
      bv = cl.win * W;
      if (bv > h - W) bv = h - W;
    }
    p->cell_half_start[q] = (int64_t)hkind.size();
    p->cell_blk[q] = cl.blk;
    int64_t nh = (p->cell_nrows[q] + halfr - 1) / halfr;
    if (!nh) nh = 1;                 // empty coverage cell: one pad half
    for (int64_t k = 0; k < nh; ++k) {
      hkind.push_back(kv);
      hbase.push_back(bv);
      hblk.push_back(cl.blk);
    }
  }
  if (hkind.size() & 1) {
    hkind.push_back(hkind.back());
    hbase.push_back(hbase.back());
    hblk.push_back(hblk.back());
  }
  const int64_t nc = (int64_t)hkind.size() / 2;
  p->ck_kind.resize(nc); p->ck_blk.resize(nc); p->ck_base.resize(nc);
  p->ck_kind2.resize(nc); p->ck_base2.resize(nc);
  for (int64_t c = 0; c < nc; ++c) {
    p->ck_kind[c] = hkind[2 * c];
    p->ck_base[c] = hbase[2 * c];
    p->ck_kind2[c] = hkind[2 * c + 1];
    p->ck_base2[c] = hbase[2 * c + 1];
    p->ck_blk[c] = hblk[2 * c];
  }
  p->nc = nc;
  *nc_out = nc;
  return p;
}

void gm_plan2_fill(void* handle, int32_t* kindid, int32_t* blkid,
                   int32_t* baseid, int32_t* kind2, int32_t* base2,
                   int32_t* pk, float* val) {
  auto* p = static_cast<Plan2*>(handle);
  const int64_t nc = p->nc;
  const int64_t chunk_elems = (int64_t)p->rows * kLane;
  const int64_t halfr = p->rows / 2;
  const size_t nfc = p->cell_nrows.size();
  const uint32_t wru = (uint32_t)p->wr;

#pragma omp parallel for schedule(static)
  for (int64_t c = 0; c < nc; ++c) {
    int32_t* pkc = pk + c * chunk_elems;
    for (int64_t t = 0; t < chunk_elems; ++t)
      pkc[t] = (int32_t)wru;           // pad: hi2 0, slo 0, rcf sentinel
    std::memset(val + c * chunk_elems, 0, chunk_elems * sizeof(float));
    kindid[c] = p->ck_kind[c];
    blkid[c] = p->ck_blk[c];
    baseid[c] = p->ck_base[c];
    kind2[c] = p->ck_kind2[c];
    base2[c] = p->ck_base2[c];
  }
  // replay edges per cell: slot fill per row + registration OR (idempotent
  // — same gidx bits for every edge of the sender in that row).  Two
  // cells may share a tail chunk, but their halves own disjoint rows, so
  // the parallel-over-cells writes never collide.
#pragma omp parallel
  {
    std::vector<int32_t> rowfill;
#pragma omp for schedule(dynamic, 8)
    for (int64_t q = 0; q < (int64_t)nfc; ++q) {
      const int64_t lo = p->cell_edge_start[q];
      const int64_t m = p->cell_edge_start[q + 1] - lo;
      if (!m) continue;
      rowfill.assign(p->cell_nrows[q], 0);
      const int64_t wrblk = (int64_t)p->cell_blk[q] * p->wr;
      const int64_t h0 = p->cell_half_start[q];
      for (int64_t j = lo; j < lo + m; ++j) {
        const int64_t i = p->edge_order[j];
        const int32_t row = p->edge_row[j];
        const int32_t slot = rowfill[row]++;
        const int L = p->s[i] & (kLane - 1);
        const int64_t half = h0 + row / halfr;
        const int64_t chunk = half >> 1;
        const int64_t rbase = chunk * chunk_elems
                              + ((half & 1) * halfr + row % halfr) * kLane;
        // slot word: keep hi2 bits, set slo + rcf
        uint32_t w = (uint32_t)pk[rbase + slot];
        w = (w & 0xFFE00000u) | ((uint32_t)L << kSloShift)
            | (uint32_t)(p->r[i] - wrblk);
        pk[rbase + slot] = (int32_t)w;
        val[rbase + slot] = p->v[i];
        // registration word at (row, L): OR the gather index
        pk[rbase + L] = (int32_t)((uint32_t)pk[rbase + L]
                                  | ((uint32_t)p->gidx[i] << 21));
      }
    }
  }
}

// Writes the edge->slot map: eidx[chunk, row, lane] = original edge index
// (-1 for pads / registration-only positions).  Replays gm_plan2_fill's
// deterministic slot assignment, so eidx aligns with the val plane —
// enables in-place edge-value refresh (applyToAllEdges) without replanning
// routing (the reference mutates tile vals in place,
// singlenode/applyedges.h:38-95).
void gm_plan2_eidx(void* handle, int32_t* eidx) {
  auto* p = static_cast<Plan2*>(handle);
  const int64_t nc = p->nc;
  const int64_t chunk_elems = (int64_t)p->rows * kLane;
  const int64_t halfr = p->rows / 2;
  const size_t nfc = p->cell_nrows.size();
#pragma omp parallel for schedule(static)
  for (int64_t c = 0; c < nc; ++c)
    for (int64_t t = 0; t < chunk_elems; ++t)
      eidx[c * chunk_elems + t] = -1;
#pragma omp parallel
  {
    std::vector<int32_t> rowfill;
#pragma omp for schedule(dynamic, 8)
    for (int64_t q = 0; q < (int64_t)nfc; ++q) {
      const int64_t lo = p->cell_edge_start[q];
      const int64_t m = p->cell_edge_start[q + 1] - lo;
      if (!m) continue;
      rowfill.assign(p->cell_nrows[q], 0);
      const int64_t h0 = p->cell_half_start[q];
      for (int64_t j = lo; j < lo + m; ++j) {
        const int64_t i = p->edge_order[j];
        const int32_t row = p->edge_row[j];
        const int32_t slot = rowfill[row]++;
        const int64_t half = h0 + row / halfr;
        const int64_t chunk = half >> 1;
        const int64_t rbase = chunk * chunk_elems
                              + ((half & 1) * halfr + row % halfr) * kLane;
        eidx[rbase + slot] = (int32_t)i;
      }
    }
  }
}

void gm_plan2_destroy(void* handle) { delete static_cast<Plan2*>(handle); }

}  // extern "C"

// ---------------------------------------------------------------------------
// v2m (min/max layout) plan builder — receiver-lane-bound slots, greedy
// first-fit row coloring (both-side lane injectivity per row).  C++
// counterpart of pallas_spmv2.py::build_spmv2m_plan.
// ---------------------------------------------------------------------------

namespace {

struct Plan2m {
  int64_t e = 0;
  int32_t h = 0, wr = 0, nb = 0, hub = 0, rows = kRows2;
  std::vector<int32_t> windows;
  // per edge: chunk-local index within its cell, row, sender-slot lane;
  // row-mode edges (in-degree hubs) use erm=1 and (echunk,erow) indexing
  // the cell's row-mode rows
  std::vector<int32_t> echunk;
  std::vector<int8_t> erow, eslane, erm;
  std::vector<int32_t> gidx;      // gather row index (hi2 value)
  std::vector<int32_t> cellid;
  std::vector<int64_t> edge_order, cell_edge_start;
  std::vector<int64_t> cell_chunk_base;
  std::vector<int32_t> cell_kind, cell_blk, cell_base, cell_ngran;
  std::vector<int32_t> cell_nrmrows;   // row-mode rows per cell
  int64_t nc = 0;
  const int32_t* s = nullptr;
  const int32_t* r = nullptr;
  const float* v = nullptr;
};

constexpr int kRowmodeMin = 129;

}  // namespace

extern "C" {

void* gm_plan2m_create(const int32_t* senders, const int32_t* receivers,
                       const float* vals, int64_t e, int32_t h, int32_t wr,
                       int32_t nb, int32_t hub, const int32_t* windows,
                       int32_t nw, int64_t cell_min, int32_t rows,
                       int64_t* nc_out) {
  auto* p = new Plan2m();
  p->e = e; p->h = h; p->wr = wr; p->nb = nb; p->hub = hub;
  p->rows = rows;
  p->s = senders; p->r = receivers; p->v = vals;
  for (int32_t k = 0; k < nw; ++k)
    p->windows.push_back(std::min(windows[k], h));
  const int K = (int)p->windows.size();
  std::vector<int64_t> nwin(K), class_cells_ofs(K + 1, 0);
  for (int k = 0; k < K; ++k) {
    nwin[k] = (h + p->windows[k] - 1) / p->windows[k];
    class_cells_ofs[k + 1] = class_cells_ofs[k] + (int64_t)nb * nwin[k];
  }
  const int64_t hub_cells = nb;
  const int64_t raw_cells = hub_cells + class_cells_ofs[K];

  std::vector<int32_t> kind(e, -1);
  std::vector<int64_t> rawcell(e);
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < e; ++i) {
    if (senders[i] < hub) {
      kind[i] = 0;
      rawcell[i] = receivers[i] / wr;
    }
  }
  std::vector<int64_t> cellcnt;
  for (int k = 0; k < K; ++k) {
    const bool last = (k == K - 1);
    const int32_t W = p->windows[k];
    cellcnt.assign((size_t)nb * nwin[k], 0);
    if (!last) {
      for (int64_t i = 0; i < e; ++i)
        if (kind[i] < 0)
          cellcnt[(receivers[i] / wr) * nwin[k] + ((senders[i] >> 7) / W)]++;
    }
    for (int64_t i = 0; i < e; ++i) {
      if (kind[i] >= 0) continue;
      const int64_t c =
          (receivers[i] / wr) * nwin[k] + ((senders[i] >> 7) / W);
      if (last || cellcnt[c] >= cell_min) {
        kind[i] = 1 + k;
        rawcell[i] = hub_cells + class_cells_ofs[k] + c;
      }
    }
  }

  // active cells ordered by (blk, kind, win)
  std::vector<int64_t> rawcnt(raw_cells, 0);
  for (int64_t i = 0; i < e; ++i) rawcnt[rawcell[i]]++;
  struct Cell { int64_t raw; int32_t blk, kind, win; };
  std::vector<Cell> cells;
  for (int64_t rc = 0; rc < raw_cells; ++rc) {
    if (!rawcnt[rc]) continue;
    Cell cl; cl.raw = rc;
    if (rc < hub_cells) {
      cl.blk = (int32_t)rc; cl.kind = 0; cl.win = 0;
    } else {
      int k = 0;
      while (k + 1 < K && rc - hub_cells >= class_cells_ofs[k + 1]) ++k;
      const int64_t c = rc - hub_cells - class_cells_ofs[k];
      cl.blk = (int32_t)(c / nwin[k]);
      cl.kind = 1 + k;
      cl.win = (int32_t)(c % nwin[k]);
    }
    cells.push_back(cl);
  }
  std::stable_sort(cells.begin(), cells.end(),
                   [](const Cell& a, const Cell& b) {
                     if (a.blk != b.blk) return a.blk < b.blk;
                     if (a.kind != b.kind) return a.kind < b.kind;
                     return a.win < b.win;
                   });
  std::vector<char> covered(nb, 0);
  for (const Cell& cl : cells) covered[cl.blk] = 1;
  std::vector<Cell> final_cells;
  std::vector<int64_t> raw_to_cell(raw_cells, -1);
  for (int32_t b = 0; b < nb; ++b) {
    if (!covered[b]) {
      Cell cl; cl.raw = -1; cl.blk = b; cl.kind = 0; cl.win = 0;
      final_cells.push_back(cl);
    }
  }
  // interleave empties in block order with real cells
  {
    std::vector<Cell> merged;
    size_t ci = 0, mi = 0;
    for (int32_t b = 0; b < nb; ++b) {
      if (mi < final_cells.size() && final_cells[mi].blk == b) {
        merged.push_back(final_cells[mi++]);
      }
      while (ci < cells.size() && cells[ci].blk == b)
        merged.push_back(cells[ci++]);
    }
    final_cells = std::move(merged);
  }
  const size_t nfc = final_cells.size();
  for (size_t q = 0; q < nfc; ++q)
    if (final_cells[q].raw >= 0) raw_to_cell[final_cells[q].raw] = q;

  p->cellid.resize(e);
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < e; ++i)
    p->cellid[i] = (int32_t)raw_to_cell[rawcell[i]];

  // bucket edges by cell (stable)
  p->cell_edge_start.assign(nfc + 2, 0);
  for (int64_t i = 0; i < e; ++i) p->cell_edge_start[p->cellid[i] + 2]++;
  for (size_t q = 2; q < p->cell_edge_start.size(); ++q)
    p->cell_edge_start[q] += p->cell_edge_start[q - 1];
  p->edge_order.resize(e);
  for (int64_t i = 0; i < e; ++i)
    p->edge_order[p->cell_edge_start[p->cellid[i] + 1]++] = i;
  p->cell_edge_start.pop_back();

  // per-cell packing (parallel; cells independent): row-mode rows for
  // in-degree hub receivers first, then greedy first-fit coloring
  p->echunk.resize(e);
  p->erow.resize(e);
  p->eslane.resize(e);
  p->erm.assign(e, 0);
  p->gidx.resize(e);
  p->cell_nrmrows.assign(nfc, 0);
  std::vector<int64_t> cell_nchunks(nfc, 0);
  p->cell_kind.resize(nfc); p->cell_blk.resize(nfc);
  p->cell_base.resize(nfc); p->cell_ngran.resize(nfc);
#pragma omp parallel for schedule(dynamic, 8)
  for (int64_t q = 0; q < (int64_t)nfc; ++q) {
    const Cell& cl = final_cells[q];
    p->cell_kind[q] = cl.kind;
    p->cell_blk[q] = cl.blk;
    int32_t base = 0, ngran = kHubGran;
    if (cl.kind > 0) {
      const int32_t W = p->windows[cl.kind - 1];
      base = cl.win * W;
      if (base > h - W) base = h - W;
      ngran = W / 8;
    }
    p->cell_base[q] = base;
    p->cell_ngran[q] = ngran;
    const int64_t j0 = p->cell_edge_start[q], j1 = p->cell_edge_start[q + 1];

    // receiver multiplicity within the cell (sort a local index copy)
    std::vector<int64_t> loc(p->edge_order.begin() + j0,
                             p->edge_order.begin() + j1);
    std::stable_sort(loc.begin(), loc.end(), [&](int64_t a, int64_t b) {
      return p->r[a] < p->r[b];
    });
    // row-mode packing per hot receiver run
    int32_t nrm = 0;
    uint64_t rm_send[2] = {0, 0};
    size_t li = 0;
    while (li < loc.size()) {
      size_t lj = li;
      while (lj < loc.size() && p->r[loc[lj]] == p->r[loc[li]]) ++lj;
      if ((int64_t)(lj - li) >= kRowmodeMin) {
        // lane queues: row = per-lane cumcount (free-lane edges fill the
        // least-loaded lanes), rows appended after previous runs' rows
        int32_t cnt[kLane];
        std::memset(cnt, 0, sizeof cnt);
        for (size_t k = li; k < lj; ++k) {
          const int64_t i = loc[k];
          const int32_t sv = p->s[i];
          const bool freelane = (cl.kind == 0 && sv < kLane);
          int sx;
          if (freelane) {
            sx = 0;
            for (int l = 1; l < kLane; ++l)
              if (cnt[l] < cnt[sx]) sx = l;
          } else {
            sx = sv & (kLane - 1);
          }
          const int32_t rr = nrm + cnt[sx]++;
          p->erm[i] = 1;
          p->echunk[i] = rr / p->rows;
          p->erow[i] = (int8_t)(rr % p->rows);
          p->eslane[i] = (int8_t)sx;
          p->gidx[i] = (cl.kind == 0)
                           ? (sv < kLane ? sv : kLane + (sv >> 7))
                           : (sv >> 7) - base;
        }
        int32_t mx = 0;
        for (int l = 0; l < kLane; ++l) mx = std::max(mx, cnt[l]);
        nrm += mx;
      }
      li = lj;
    }
    p->cell_nrmrows[q] = nrm;
    const int64_t rm_chunks = (nrm + p->rows - 1) / p->rows;

    // cold edges: proper bipartite edge coloring (Euler splitting +
    // first-fit class merging).  Per row both the receiver lanes and the
    // sender lanes must be distinct — a bipartite multigraph between the
    // 128 sender-lane and 128 receiver-lane nodes whose chromatic index
    // is its max degree (Koenig).  Greedy first-fit coloring measured
    // fill 0.35; Euler halving to matchings then merging compatible
    // classes reaches ~0.75 (ideal ~0.85).  Free-lane edges (hub top
    // senders, wildcard sender lane) fill leftover slots afterwards.
    std::vector<int64_t> cold, freel;
    for (int64_t j = j0; j < j1; ++j) {
      const int64_t i = p->edge_order[j];
      if (p->erm[i]) continue;
      const int32_t sv = p->s[i];
      p->gidx[i] = (cl.kind == 0)
                       ? (sv < kLane ? sv : kLane + (sv >> 7))
                       : (sv >> 7) - base;
      if (cl.kind == 0 && sv < kLane) freel.push_back(i);
      else cold.push_back(i);
    }
    // --- Euler split to matchings -------------------------------------
    std::vector<std::vector<int64_t>> groups, matchings;
    if (!cold.empty()) groups.push_back(cold);
    std::vector<int32_t> adj_head(256), node_ptr(256);
    while (!groups.empty()) {
      std::vector<int64_t> g = std::move(groups.back());
      groups.pop_back();
      int degS[kLane] = {0}, degR[kLane] = {0};
      for (int64_t i : g) {
        degS[p->s[i] & (kLane - 1)]++;
        degR[p->r[i] & (kLane - 1)]++;
      }
      int mx = 0;
      for (int l = 0; l < kLane; ++l)
        mx = std::max(mx, std::max(degS[l], degR[l]));
      if (mx <= 1) {
        matchings.push_back(std::move(g));
        continue;
      }
      // adjacency: node = sender lane (0..127) / 128 + receiver lane;
      // each edge appears in both endpoint lists
      const int64_t m = (int64_t)g.size();
      std::vector<int32_t> lists(2 * m), nxt(2 * m);
      std::fill(adj_head.begin(), adj_head.end(), -1);
      for (int64_t k = 0; k < m; ++k) {
        const int sn = p->s[g[k]] & (kLane - 1);
        const int rn = 128 + (p->r[g[k]] & (kLane - 1));
        lists[2 * k] = (int32_t)k; nxt[2 * k] = adj_head[sn];
        adj_head[sn] = (int32_t)(2 * k);
        lists[2 * k + 1] = (int32_t)k; nxt[2 * k + 1] = adj_head[rn];
        adj_head[rn] = (int32_t)(2 * k + 1);
      }
      std::vector<char> used(m, 0), color(m, 0);
      auto walk = [&](int v, int c) {
        for (;;) {
          int32_t h = adj_head[v];
          while (h >= 0 && used[lists[h]]) h = nxt[h];
          adj_head[v] = h;
          if (h < 0) return;
          const int32_t k = lists[h];
          used[k] = 1;
          color[k] = (char)c;
          const int64_t i = g[k];
          v = (v < 128) ? 128 + (p->r[i] & (kLane - 1))
                        : (p->s[i] & (kLane - 1));
          c ^= 1;
        }
      };
      // trails from odd-degree nodes first, then circuits
      for (int l = 0; l < kLane; ++l) {
        if (degS[l] & 1) walk(l, 0);
        if (degR[l] & 1) walk(128 + l, 0);
      }
      for (int v = 0; v < 256; ++v) walk(v, 0);
      std::vector<int64_t> h0, h1;
      for (int64_t k = 0; k < m; ++k)
        (color[k] ? h1 : h0).push_back(g[k]);
      if (!h0.empty()) groups.push_back(std::move(h0));
      if (!h1.empty()) groups.push_back(std::move(h1));
    }
    // --- merge compatible matchings (first-fit, descending size) ------
    std::stable_sort(matchings.begin(), matchings.end(),
                     [](const std::vector<int64_t>& a,
                        const std::vector<int64_t>& b) {
                       return a.size() > b.size();
                     });
    struct RowBits { uint64_t s[2] = {0, 0}, r[2] = {0, 0}; int n = 0; };
    std::vector<RowBits> rowb;
    std::vector<int32_t> rowof;   // final colored-row id per matching
    rowof.reserve(matchings.size());
    for (const auto& mt : matchings) {
      uint64_t ms[2] = {0, 0}, mr[2] = {0, 0};
      for (int64_t i : mt) {
        const int sn = p->s[i] & (kLane - 1);
        const int rn = p->r[i] & (kLane - 1);
        ms[sn >> 6] |= 1ull << (sn & 63);
        mr[rn >> 6] |= 1ull << (rn & 63);
      }
      int dst = -1;
      for (size_t ri = 0; ri < rowb.size(); ++ri) {
        RowBits& rb = rowb[ri];
        if (rb.n + (int)mt.size() <= kLane
            && !(rb.s[0] & ms[0]) && !(rb.s[1] & ms[1])
            && !(rb.r[0] & mr[0]) && !(rb.r[1] & mr[1])) {
          dst = (int)ri;
          break;
        }
      }
      if (dst < 0) {
        rowb.push_back(RowBits());
        dst = (int)rowb.size() - 1;
      }
      RowBits& rb = rowb[dst];
      rb.s[0] |= ms[0]; rb.s[1] |= ms[1];
      rb.r[0] |= mr[0]; rb.r[1] |= mr[1];
      rb.n += (int)mt.size();
      rowof.push_back((int32_t)dst);
    }
    for (size_t mi_ = 0; mi_ < matchings.size(); ++mi_) {
      for (int64_t i : matchings[mi_]) {
        const int32_t rr = rowof[mi_];
        p->echunk[i] = rr / p->rows;
        p->erow[i] = (int8_t)(rr % p->rows);
        p->eslane[i] = (int8_t)(p->s[i] & (kLane - 1));
      }
    }
    // --- free-lane edges fill leftover slots --------------------------
    for (int64_t i : freel) {
      const int rn = p->r[i] & (kLane - 1);
      int dst = -1, sx = -1;
      for (size_t ri = 0; ri < rowb.size(); ++ri) {
        RowBits& rb = rowb[ri];
        if (rb.n >= kLane || (rb.r[rn >> 6] >> (rn & 63)) & 1) continue;
        if (~rb.s[0]) sx = __builtin_ctzll(~rb.s[0]);
        else if (~rb.s[1]) sx = 64 + __builtin_ctzll(~rb.s[1]);
        else continue;
        dst = (int)ri;
        break;
      }
      if (dst < 0) {
        rowb.push_back(RowBits());
        dst = (int)rowb.size() - 1;
        sx = 0;
      }
      RowBits& rb = rowb[dst];
      rb.s[sx >> 6] |= 1ull << (sx & 63);
      rb.r[rn >> 6] |= 1ull << (rn & 63);
      rb.n++;
      p->echunk[i] = dst / p->rows;
      p->erow[i] = (int8_t)(dst % p->rows);
      p->eslane[i] = (int8_t)sx;
    }
    int32_t cold_chunks =
        (int32_t)(((int64_t)rowb.size() + p->rows - 1) / p->rows);
    cell_nchunks[q] = rm_chunks + cold_chunks;
    if (cell_nchunks[q] == 0) cell_nchunks[q] = 1;
  }
  p->cell_chunk_base.assign(nfc + 1, 0);
  for (size_t q = 0; q < nfc; ++q)
    p->cell_chunk_base[q + 1] = p->cell_chunk_base[q] + cell_nchunks[q];
  p->nc = p->cell_chunk_base[nfc];
  *nc_out = p->nc;
  return p;
}

void gm_plan2m_fill(void* handle, int32_t* kindid, int32_t* blkid,
                    int32_t* baseid, int32_t* ngran, int32_t* rowmask,
                    int32_t* pk, float* val) {
  auto* p = static_cast<Plan2m*>(handle);
  const int64_t nc = p->nc;
  const int64_t chunk_elems = (int64_t)p->rows * kLane;
  const size_t nfc = p->cell_kind.size();
  const uint32_t wru = (uint32_t)p->wr;

#pragma omp parallel for schedule(static)
  for (int64_t c = 0; c < nc; ++c) {
    int32_t* pkc = pk + c * chunk_elems;
    for (int64_t t = 0; t < chunk_elems; ++t)
      pkc[t] = (int32_t)wru;           // pad: hi2 0, slo 0, rcf sentinel
    std::memset(val + c * chunk_elems, 0, chunk_elems * sizeof(float));
  }
#pragma omp parallel for schedule(static)
  for (int64_t q = 0; q < (int64_t)nfc; ++q) {
    const int32_t nrm = p->cell_nrmrows[q];
    const int64_t rm_chunks = (nrm + p->rows - 1) / p->rows;
    int64_t k = 0;
    for (int64_t c = p->cell_chunk_base[q]; c < p->cell_chunk_base[q + 1];
         ++c, ++k) {
      kindid[c] = p->cell_kind[q];
      blkid[c] = p->cell_blk[q];
      baseid[c] = p->cell_base[q];
      ngran[c] = p->cell_ngran[q];
      if (k < rm_chunks) {
        const int32_t nr = (int32_t)std::min<int64_t>(
            p->rows, nrm - k * (int64_t)p->rows);
        rowmask[c] = (nr >= 32) ? -1 : ((1 << nr) - 1);
      } else {
        rowmask[c] = 0;
      }
    }
  }
#pragma omp parallel for schedule(dynamic, 8)
  for (int64_t q = 0; q < (int64_t)nfc; ++q) {
    const int64_t wrblk = (int64_t)p->cell_blk[q] * p->wr;
    const int64_t rm_chunks =
        (p->cell_nrmrows[q] + p->rows - 1) / p->rows;
    for (int64_t j = p->cell_edge_start[q]; j < p->cell_edge_start[q + 1];
         ++j) {
      const int64_t i = p->edge_order[j];
      const int64_t chunk = p->cell_chunk_base[q]
                            + (p->erm[i] ? 0 : rm_chunks) + p->echunk[i];
      const int64_t rowbase = chunk * chunk_elems
                              + (int64_t)p->erow[i] * kLane;
      const int sx = (int)(uint8_t)p->eslane[i];
      const uint32_t rc = (uint32_t)(p->r[i] - wrblk);
      if (p->erm[i]) {
        // row-mode: slot lane = sender lane; slo identity
        pk[rowbase + sx] = (int32_t)(((uint32_t)p->gidx[i] << 21)
                                     | ((uint32_t)sx << kSloShift) | rc);
        val[rowbase + sx] = p->v[i];
      } else {
        const int rl = p->r[i] & (kLane - 1);
        // slot word at rl: keep any registration bits, set slo + rcf
        uint32_t w = (uint32_t)pk[rowbase + rl];
        w = (w & 0xFFE00000u) | ((uint32_t)sx << kSloShift) | rc;
        pk[rowbase + rl] = (int32_t)w;
        val[rowbase + rl] = p->v[i];
        // registration word at the sender lane: OR the gather index
        pk[rowbase + sx] = (int32_t)((uint32_t)pk[rowbase + sx]
                                     | ((uint32_t)p->gidx[i] << 21));
      }
    }
  }
}

// Edge->slot map for the mm layout (see gm_plan2_eidx).
void gm_plan2m_eidx(void* handle, int32_t* eidx) {
  auto* p = static_cast<Plan2m*>(handle);
  const int64_t nc = p->nc;
  const int64_t chunk_elems = (int64_t)p->rows * kLane;
  const size_t nfc = p->cell_kind.size();
#pragma omp parallel for schedule(static)
  for (int64_t c = 0; c < nc; ++c)
    for (int64_t t = 0; t < chunk_elems; ++t)
      eidx[c * chunk_elems + t] = -1;
#pragma omp parallel for schedule(dynamic, 8)
  for (int64_t q = 0; q < (int64_t)nfc; ++q) {
    const int64_t rm_chunks =
        (p->cell_nrmrows[q] + p->rows - 1) / p->rows;
    for (int64_t j = p->cell_edge_start[q]; j < p->cell_edge_start[q + 1];
         ++j) {
      const int64_t i = p->edge_order[j];
      const int64_t chunk = p->cell_chunk_base[q]
                            + (p->erm[i] ? 0 : rm_chunks) + p->echunk[i];
      const int64_t rowbase = chunk * chunk_elems
                              + (int64_t)p->erow[i] * kLane;
      if (p->erm[i])
        eidx[rowbase + (int)(uint8_t)p->eslane[i]] = (int32_t)i;
      else
        eidx[rowbase + (p->r[i] & (kLane - 1))] = (int32_t)i;
    }
  }
}

void gm_plan2m_destroy(void* handle) { delete static_cast<Plan2m*>(handle); }

}  // extern "C"

// ---------------------------------------------------------------------------
// vec2 (K-wide) plan builder — C++ counterpart of
// pallas_spmv_vec2.py::build_spmv_vec2_plan.  Cells are (aligned receiver
// window, sender-window class, sender window); slots are 32-lane blocks
// keyed by rc % 4 with per-block queues of depth `rows`.
// ---------------------------------------------------------------------------

namespace {

constexpr int kKpad = 32;
constexpr int kSlots = 4;
#ifndef GM_WYK
#define GM_WYK 32
#endif
constexpr int kWyk = GM_WYK;   // per-chunk receiver-window rows

struct PlanV {
  int64_t e = 0;
  int32_t hs = 0, hr = 0, wr = 0, nb = 0, rows = 32, wy = 64;
  std::vector<int32_t> windows;
  // per edge
  std::vector<int32_t> cellid;     // compact cell
  std::vector<int32_t> echunk;     // chunk within cell
  std::vector<int8_t> erow, eblk;  // row, lane-block (rc % 4)
  std::vector<int32_t> gidx;       // sender idx*4 | rotation
  std::vector<int64_t> edge_order, cell_edge_start;
  std::vector<int64_t> cell_chunk_base;
  std::vector<int32_t> cell_kind, cell_blk, cell_sbase;
  std::vector<int32_t> chunk_rbase;   // per GLOBAL chunk (vp window base)
  int64_t nc = 0;
  const int32_t* s = nullptr;
  const int32_t* r = nullptr;
  const float* v = nullptr;
};

}  // namespace

extern "C" {

void* gm_planv_create(const int32_t* senders, const int32_t* receivers,
                      const float* vals, int64_t e, int32_t hs, int32_t hr,
                      int32_t wr, int32_t nb, const int32_t* windows,
                      int32_t nw, int64_t cell_min, int32_t wy,
                      int32_t rows, int64_t* nc_out) {
  auto* p = new PlanV();
  p->e = e; p->hs = hs; p->hr = hr; p->wr = wr; p->nb = nb;
  p->rows = rows; p->wy = wy;
  p->s = senders; p->r = receivers; p->v = vals;
  for (int32_t k = 0; k < nw; ++k)
    p->windows.push_back(std::min(windows[k], hs));
  const int K = (int)p->windows.size();
  const int64_t nrw = (hr + wy - 1) / wy;
  std::vector<int64_t> nsw(K), ofs(K + 1, 0);
  for (int k = 0; k < K; ++k) {
    nsw[k] = (hs + p->windows[k] - 1) / p->windows[k];
    ofs[k + 1] = ofs[k] + nrw * nsw[k];
  }
  const int64_t raw_cells = ofs[K];

  // classify: smallest class whose (rwin, swin) cell has >= cell_min edges
  std::vector<int32_t> kind(e, -1);
  std::vector<int64_t> rawcell(e);
  std::vector<int64_t> cellcnt;
  for (int k = 0; k < K; ++k) {
    const bool last = (k == K - 1);
    const int32_t W = p->windows[k];
    cellcnt.assign((size_t)nrw * nsw[k], 0);
    if (!last) {
      for (int64_t i = 0; i < e; ++i)
        if (kind[i] < 0)
          cellcnt[((int64_t)(receivers[i] / 4) / wy) * nsw[k]
                  + (senders[i] / 4) / W]++;
    }
    for (int64_t i = 0; i < e; ++i) {
      if (kind[i] >= 0) continue;
      const int64_t c = ((int64_t)(receivers[i] / 4) / wy) * nsw[k]
                        + (senders[i] / 4) / W;
      if (last || cellcnt[c] >= cell_min) {
        kind[i] = k;
        rawcell[i] = ofs[k] + c;
      }
    }
  }

  // active cells ordered by (block, kind, swin) — rwin implies the block
  struct Cell { int64_t raw; int32_t blk, kind; int64_t rwin, swin; };
  std::vector<int64_t> rawcnt(raw_cells, 0);
  for (int64_t i = 0; i < e; ++i) rawcnt[rawcell[i]]++;
  std::vector<Cell> cells;
  for (int64_t rc = 0; rc < raw_cells; ++rc) {
    if (!rawcnt[rc]) continue;
    int k = 0;
    while (k + 1 < K && rc >= ofs[k + 1]) ++k;
    const int64_t c = rc - ofs[k];
    Cell cl;
    cl.raw = rc;
    cl.kind = k;
    cl.rwin = c / nsw[k];
    cl.swin = c % nsw[k];
    cl.blk = (int32_t)(cl.rwin * wy * 4 / wr);
    cells.push_back(cl);
  }
  std::stable_sort(cells.begin(), cells.end(),
                   [](const Cell& a, const Cell& b) {
                     if (a.blk != b.blk) return a.blk < b.blk;
                     if (a.rwin != b.rwin) return a.rwin < b.rwin;
                     if (a.kind != b.kind) return a.kind < b.kind;
                     return a.swin < b.swin;
                   });
  std::vector<char> covered(nb, 0);
  for (const Cell& cl : cells) covered[cl.blk] = 1;
  std::vector<Cell> final_cells;
  {
    size_t ci = 0;
    for (int32_t b = 0; b < nb; ++b) {
      if (!covered[b]) {
        Cell cl; cl.raw = -1; cl.kind = 0; cl.blk = b;
        cl.rwin = (int64_t)b * wr / 4 / wy;
        cl.swin = 0;
        final_cells.push_back(cl);
      }
      while (ci < cells.size() && cells[ci].blk == b)
        final_cells.push_back(cells[ci++]);
    }
  }
  const size_t nfc = final_cells.size();
  std::vector<int64_t> raw_to_cell(raw_cells, -1);
  for (size_t q = 0; q < nfc; ++q)
    if (final_cells[q].raw >= 0) raw_to_cell[final_cells[q].raw] = q;

  p->cellid.resize(e);
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < e; ++i)
    p->cellid[i] = (int32_t)raw_to_cell[rawcell[i]];

  p->cell_edge_start.assign(nfc + 2, 0);
  for (int64_t i = 0; i < e; ++i) p->cell_edge_start[p->cellid[i] + 2]++;
  for (size_t q = 2; q < p->cell_edge_start.size(); ++q)
    p->cell_edge_start[q] += p->cell_edge_start[q - 1];
  p->edge_order.resize(e);
  for (int64_t i = 0; i < e; ++i)
    p->edge_order[p->cell_edge_start[p->cellid[i] + 1]++] = i;
  p->cell_edge_start.pop_back();

  // per-cell: receiver-sorted walk with lane-block queues; a chunk closes
  // when any queue fills OR the receiver span exceeds kWyk rows
  p->echunk.resize(e);
  p->erow.resize(e);
  p->eblk.resize(e);
  p->gidx.resize(e);
  p->cell_kind.resize(nfc); p->cell_blk.resize(nfc);
  p->cell_sbase.resize(nfc);
  std::vector<int64_t> cell_nchunks(nfc, 0);
  std::vector<std::vector<int32_t>> cell_cbases(nfc);
#pragma omp parallel for schedule(dynamic, 16)
  for (int64_t q = 0; q < (int64_t)nfc; ++q) {
    const Cell& cl = final_cells[q];
    const int32_t W = p->windows[cl.kind];
    int32_t sbase = (int32_t)std::min<int64_t>(cl.swin * W, hs - W);
    p->cell_kind[q] = cl.kind;
    p->cell_blk[q] = cl.blk;
    p->cell_sbase[q] = sbase;
    const int32_t blk_end = (cl.blk + 1) * (p->wr / 4);
    auto& cbases = cell_cbases[q];
    std::stable_sort(p->edge_order.begin() + p->cell_edge_start[q],
                     p->edge_order.begin() + p->cell_edge_start[q + 1],
                     [&](int64_t a, int64_t b2) {
                       return p->r[a] < p->r[b2];
                     });
    // receiver-sorted walk; one open chunk at a time with per-lane-block
    // counters and an 8-aligned kWyk-row vp window anchored at the
    // chunk's first receiver
    int32_t cnt[kSlots] = {0, 0, 0, 0};
    int32_t base = 0;
    int64_t cur = -1;
    for (int64_t j = p->cell_edge_start[q]; j < p->cell_edge_start[q + 1];
         ++j) {
      const int64_t i = p->edge_order[j];
      const int b = p->r[i] & 3;
      const int32_t rv = p->r[i] / 4;
      if (cur < 0 || cnt[b] == p->rows || rv >= base + kWyk) {
        ++cur;
        cnt[0] = cnt[1] = cnt[2] = cnt[3] = 0;
        base = std::min(rv & ~7, blk_end - kWyk);
        cbases.push_back(base);
      }
      p->echunk[i] = (int32_t)cur;
      p->erow[i] = (int8_t)cnt[b]++;
      p->eblk[i] = (int8_t)b;
      const int rot = ((p->r[i] - p->s[i]) % 4 + 4) & 3;
      p->gidx[i] = ((p->s[i] / 4 - sbase) << 2) | rot;
    }
    if (cbases.empty())
      cbases.push_back(cl.blk * (p->wr / 4));
    cell_nchunks[q] = (int64_t)cbases.size();
  }
  p->cell_chunk_base.assign(nfc + 1, 0);
  for (size_t q = 0; q < nfc; ++q)
    p->cell_chunk_base[q + 1] = p->cell_chunk_base[q] + cell_nchunks[q];
  p->nc = p->cell_chunk_base[nfc];
  p->chunk_rbase.resize(p->nc);
  for (size_t q = 0; q < nfc; ++q)
    for (size_t k = 0; k < cell_cbases[q].size(); ++k)
      p->chunk_rbase[p->cell_chunk_base[q] + k] = cell_cbases[q][k];
  *nc_out = p->nc;
  return p;
}

// Compact-plane fill: pk/valp pack 32 chunks per [rows,128] tile (4 lanes
// per chunk, one per slot block; pk = (gather idx << 13) | rcf) and rcwt
// packs 8 chunks per [8,128] tile (row chunk % 8).
void gm_planv_fill2(void* handle, int32_t* kindid, int32_t* blkid,
                    int32_t* sbase, int32_t* rbase, int32_t* pk,
                    float* valp, int32_t* rcwt) {
  auto* p = static_cast<PlanV*>(handle);
  const int64_t nc = p->nc;
  const int64_t tile_elems = (int64_t)p->rows * kLane;
  const int64_t rcwt_elems = (int64_t)8 * kLane;
  const int64_t npk = (nc + 31) / 32;
  const int64_t nr8 = (nc + 7) / 8;
  const size_t nfc = p->cell_kind.size();
  const int32_t rcf_sentinel = p->wr;   // < 2^13; matches no window row

#pragma omp parallel for schedule(static)
  for (int64_t t = 0; t < npk; ++t) {
    int32_t* pt = pk + t * tile_elems;
    float* vt = valp + t * tile_elems;
    for (int64_t k = 0; k < tile_elems; ++k) {
      pt[k] = rcf_sentinel;   // idx 0, rcf sentinel
      vt[k] = 0.0f;
    }
  }
#pragma omp parallel for schedule(static)
  for (int64_t t = 0; t < nr8; ++t) {
    int32_t* rw = rcwt + t * rcwt_elems;
    for (int64_t k = 0; k < rcwt_elems; ++k) rw[k] = 127;
  }
#pragma omp parallel for schedule(static)
  for (int64_t q = 0; q < (int64_t)nfc; ++q) {
    for (int64_t c = p->cell_chunk_base[q]; c < p->cell_chunk_base[q + 1];
         ++c) {
      kindid[c] = p->cell_kind[q];
      blkid[c] = p->cell_blk[q];
      sbase[c] = p->cell_sbase[q];
      rbase[c] = p->chunk_rbase[c];
    }
  }
#pragma omp parallel for schedule(dynamic, 16)
  for (int64_t q = 0; q < (int64_t)nfc; ++q) {
    const int64_t wrblk = (int64_t)p->cell_blk[q] * p->wr;
    for (int64_t j = p->cell_edge_start[q]; j < p->cell_edge_start[q + 1];
         ++j) {
      const int64_t i = p->edge_order[j];
      const int64_t chunk = p->cell_chunk_base[q] + p->echunk[i];
      const int row = (int)p->erow[i];
      const int b = (int)p->eblk[i];
      const int64_t slot = (chunk / 32) * tile_elems
                           + (int64_t)row * kLane + (chunk % 32) * 4 + b;
      pk[slot] = (p->gidx[i] << 13) | (int32_t)(p->r[i] - wrblk);
      valp[slot] = p->v[i];
      rcwt[(chunk / 8) * rcwt_elems + (chunk % 8) * kLane
           + b * p->rows + row] =
          (int32_t)(p->r[i] / 4 - p->chunk_rbase[chunk]);
    }
  }
}

void gm_planv_destroy(void* handle) { delete static_cast<PlanV*>(handle); }

}  // extern "C"

// ---------------------------------------------------------------------------
// Triangle-counting host prep — C++ counterpart of ops/triangles.py::_prep's
// heavy phase: dedup undirected pairs, degree-orient, CSR-sort by (s, r).
// The numpy version spends ~18 s on three 16M-element sorts; parallel sorts
// bring this to ~1-2 s.
// ---------------------------------------------------------------------------

#include <parallel/algorithm>

namespace {

struct TriPrep {
  int64_t m = 0;                 // deduped oriented edge count
  int32_t n = 0;
  std::vector<int64_t> key;      // sorted s * n + r (CSR order)
  std::vector<int32_t> odeg;
};

}  // namespace

extern "C" {

void* gm_tri_create(const int32_t* u, const int32_t* v, int64_t e,
                    int32_t n, int64_t* m_out) {
  auto* p = new TriPrep();
  p->n = n;
  const int64_t N = n;
  // pack undirected keys, drop self loops
  std::vector<int64_t>& key = p->key;
  key.resize(e);
  std::atomic<int64_t> nk{0};
#pragma omp parallel
  {
    std::vector<int64_t> local;
    local.reserve(e / omp_get_num_threads() + 1);
#pragma omp for nowait
    for (int64_t i = 0; i < e; ++i) {
      if (u[i] == v[i]) continue;
      const int64_t a = std::min(u[i], v[i]);
      const int64_t b = std::max(u[i], v[i]);
      local.push_back(a * N + b);
    }
    const int64_t at = nk.fetch_add((int64_t)local.size());
    std::copy(local.begin(), local.end(), key.begin() + at);
  }
  key.resize(nk.load());
  __gnu_parallel::sort(key.begin(), key.end());
  key.erase(std::unique(key.begin(), key.end()), key.end());

  // degrees over the deduped undirected support
  std::vector<int32_t> deg(n, 0);
  for (const int64_t k : key) {
    ++deg[k / N];
    ++deg[k % N];
  }
  // orient toward the (degree, id)-larger endpoint, re-pack, re-sort
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < (int64_t)key.size(); ++i) {
    const int32_t a = (int32_t)(key[i] / N);
    const int32_t b = (int32_t)(key[i] % N);
    const bool fwd = deg[a] < deg[b] || (deg[a] == deg[b] && a < b);
    const int32_t s = fwd ? a : b;
    const int32_t r = fwd ? b : a;
    key[i] = (int64_t)s * N + r;
  }
  __gnu_parallel::sort(key.begin(), key.end());
  p->m = (int64_t)key.size();
  p->odeg.assign(n, 0);
  for (const int64_t k : key) ++p->odeg[k / N];
  *m_out = p->m;
  return p;
}

// s/r in CSR order, rank of each edge within its sender segment, odeg[n].
void gm_tri_fill(void* handle, int32_t* s_out, int32_t* r_out,
                 int32_t* rank_out, int32_t* odeg_out) {
  auto* p = static_cast<TriPrep*>(handle);
  const int64_t N = p->n;
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < p->m; ++i) {
    s_out[i] = (int32_t)(p->key[i] / N);
    r_out[i] = (int32_t)(p->key[i] % N);
  }
  int32_t rk = 0;
  for (int64_t i = 0; i < p->m; ++i) {
    rk = (i > 0 && s_out[i] == s_out[i - 1]) ? rk + 1 : 0;
    rank_out[i] = rk;
  }
  std::memcpy(odeg_out, p->odeg.data(), (size_t)p->n * sizeof(int32_t));
}

void gm_tri_destroy(void* handle) { delete static_cast<TriPrep*>(handle); }

}  // extern "C"

// ----------------------------------------------------------------------
// Text edge-list parser ("src dst [val]" rows) — the native counterpart
// of the reference's readLine/load_edgelist text path (edgelist.h:89-151),
// ~2.5x numpy.loadtxt's C reader on a 2-core box (scales with cores;
// loadtxt is single-threaded).  Two passes: per-chunk line counting + prefix sum,
// then parallel parse writing at global row offsets.  Returns the number
// of parsed edges (blank lines skipped); -1 on malformed input.
// val_kind: 0 = none (val untouched), 1 = int32, 2 = float32, 3 = float64.

namespace {

inline const char* skip_ws(const char* p, const char* end) {
  while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
  return p;
}

inline const char* parse_i32(const char* p, const char* end, int32_t* out) {
  p = skip_ws(p, end);
  bool neg = false;
  if (p < end && (*p == '-' || *p == '+')) neg = *p++ == '-';
  if (p >= end || *p < '0' || *p > '9') return nullptr;
  int64_t v = 0;
  while (p < end && *p >= '0' && *p <= '9') v = v * 10 + (*p++ - '0');
  *out = (int32_t)(neg ? -v : v);
  return p;
}

inline const char* parse_f64(const char* p, const char* end, double* out) {
  p = skip_ws(p, end);
  char* q = nullptr;
  *out = strtod(p, &q);
  if (q == p) return nullptr;
  return q;
}

}  // namespace

extern "C" {

int64_t gm_parse_text_edges(const char* buf, int64_t len, int32_t val_kind,
                            int32_t* src, int32_t* dst, void* val) {
  const int nthreads =
#if defined(_OPENMP)
      omp_get_max_threads();
#else
      1;
#endif
  // chunk boundaries aligned to line starts
  std::vector<int64_t> starts(nthreads + 1, len);
  starts[0] = 0;
  for (int t = 1; t < nthreads; ++t) {
    int64_t pos = len * t / nthreads;
    while (pos < len && buf[pos] != '\n') ++pos;
    starts[t] = std::min(pos + 1, len);
  }
  starts[nthreads] = len;

  // pass 1: count non-blank lines per chunk
  std::vector<int64_t> cnt(nthreads, 0);
#pragma omp parallel for schedule(static) num_threads(nthreads)
  for (int t = 0; t < nthreads; ++t) {
    const char* p = buf + starts[t];
    const char* end = buf + starts[t + 1];
    int64_t c = 0;
    while (p < end) {
      const char* nl = (const char*)memchr(p, '\n', end - p);
      const char* stop = nl ? nl : end;
      const char* q = skip_ws(p, stop);
      if (q < stop) ++c;
      p = nl ? nl + 1 : end;
    }
    cnt[t] = c;
  }
  std::vector<int64_t> off(nthreads + 1, 0);
  for (int t = 0; t < nthreads; ++t) off[t + 1] = off[t] + cnt[t];

  // pass 2: parse
  std::atomic<bool> bad{false};
#pragma omp parallel for schedule(static) num_threads(nthreads)
  for (int t = 0; t < nthreads; ++t) {
    const char* p = buf + starts[t];
    const char* end = buf + starts[t + 1];
    int64_t i = off[t];
    while (p < end && !bad.load(std::memory_order_relaxed)) {
      const char* nl = (const char*)memchr(p, '\n', end - p);
      const char* stop = nl ? nl : end;
      const char* q = skip_ws(p, stop);
      if (q < stop) {
        q = parse_i32(q, stop, &src[i]);
        if (q) q = parse_i32(q, stop, &dst[i]);
        if (q && val_kind) {
          double d;
          q = parse_f64(q, stop, &d);
          if (q) {
            if (val_kind == 1) ((int32_t*)val)[i] = (int32_t)d;
            else if (val_kind == 2) ((float*)val)[i] = (float)d;
            else ((double*)val)[i] = d;
          }
        }
        if (!q) { bad.store(true, std::memory_order_relaxed); break; }
        ++i;
      }
      p = nl ? nl + 1 : end;
    }
  }
  return bad.load() ? -1 : off[nthreads];
}

}  // extern "C"

// ---------------------------------------------------------------------------
// RMAT generator (Graph500-style recursive bisection).
//
// Native counterpart of graphmat_tpu/utils/generators.py::rmat_edgelist.
// Counter-based: edge i's quadrant choices come from a splitmix64 stream
// seeded by (seed, i), so output is deterministic for a given seed
// regardless of thread count.  Self loops are always dropped; dedup != 0
// additionally sorts by (src, dst) and keeps one edge per pair (the
// python path's remove_duplicate_edges semantics; values are derived from
// the (src, dst) key so the kept edge's weight is order-independent).

#include <parallel/algorithm>

namespace {

inline uint64_t splitmix64(uint64_t x) {
  x += 0x9E3779B97F4A7C15ULL;
  x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9ULL;
  x = (x ^ (x >> 27)) * 0x94D049BB133111EBULL;
  return x ^ (x >> 31);
}

}  // namespace

extern "C" {

// src_out/dst_out/val_out must hold nnz int32 each; returns the edge count
// actually written (after self-loop removal and optional dedup), 1-based ids.
int64_t gm_rmat_gen(int32_t scale, int64_t nnz, double a, double b, double c,
                    uint64_t seed, int32_t dedup, int32_t weight_range,
                    int32_t* src_out, int32_t* dst_out, int32_t* val_out) {
  const double ab = a + b;
  const double c_norm = c / (1.0 - ab);
  // P(dst=1 | src=0) = b/(a+b): threshold r2 against a/ab (using b/ab
  // swapped the a and b quadrants — see generators.py::rmat_edgelist)
  const double a_norm = a / ab;

  std::vector<uint64_t> keys(nnz);
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < nnz; ++i) {
    uint64_t state = splitmix64(seed * 0xD1342543DE82EF95ULL + (uint64_t)i);
    uint32_t s = 0, d = 0;
    for (int32_t lvl = 0; lvl < scale; ++lvl) {
      uint64_t x = state = splitmix64(state);
      double r1 = (uint32_t)(x >> 32) * 0x1.0p-32;
      double r2 = (uint32_t)x * 0x1.0p-32;
      int sb = r1 > ab;
      int db = sb ? (r2 > c_norm) : (r2 > a_norm);
      s = (s << 1) | (uint32_t)sb;
      d = (d << 1) | (uint32_t)db;
    }
    keys[i] = ((uint64_t)s << 32) | d;
  }

  if (dedup) {
    __gnu_parallel::sort(keys.begin(), keys.end());
  }

  // compact (drop self loops; with dedup also drop equal neighbors)
  int nthreads = 1;
#if defined(_OPENMP)
  nthreads = omp_get_max_threads();
#endif
  std::vector<int64_t> cnt(nthreads, 0), off(nthreads + 1, 0);
#pragma omp parallel for schedule(static) num_threads(nthreads)
  for (int t = 0; t < nthreads; ++t) {
    int64_t lo = nnz * t / nthreads, hi = nnz * (t + 1) / nthreads;
    int64_t n = 0;
    for (int64_t i = lo; i < hi; ++i) {
      uint32_t s = (uint32_t)(keys[i] >> 32), d = (uint32_t)keys[i];
      if (s == d) continue;
      if (dedup && i > 0 && keys[i] == keys[i - 1]) continue;
      ++n;
    }
    cnt[t] = n;
  }
  for (int t = 0; t < nthreads; ++t) off[t + 1] = off[t] + cnt[t];
#pragma omp parallel for schedule(static) num_threads(nthreads)
  for (int t = 0; t < nthreads; ++t) {
    int64_t lo = nnz * t / nthreads, hi = nnz * (t + 1) / nthreads;
    int64_t o = off[t];
    for (int64_t i = lo; i < hi; ++i) {
      uint32_t s = (uint32_t)(keys[i] >> 32), d = (uint32_t)keys[i];
      if (s == d) continue;
      if (dedup && i > 0 && keys[i] == keys[i - 1]) continue;
      src_out[o] = (int32_t)s + 1;
      dst_out[o] = (int32_t)d + 1;
      val_out[o] = weight_range > 0
          ? (int32_t)(1 + splitmix64(seed ^ keys[i]) % (uint64_t)weight_range)
          : 1;
      ++o;
    }
  }
  return off[nthreads];
}

}  // extern "C"

// ---------------------------------------------------------------------------
// v2u unified plan (pallas_spmv2u.py) — routed slots + out-lane double-gather.
//
// Same classification / cell bucketing as Plan2; the packer additionally
// binds each (row, out-lane) to at most one receiver with at most kOutK
// slots (min/max duplicate the first via gsel2, sum masks with has2), and
// extracts in-cell in-degree hubs into row-mode rows (whole-row reduce —
// the HybridTile heavy-row split, HybridTile.h:89-133).  Chunks are
// rows/32 SUB-WINDOWS of 32 rows each; per-sub (kind, base) plus the
// window-reuse chain bits ride one packed kb scalar stream.  Block-tail
// pad subs are HUB kind (cheap 2-granule walk).  One plan serves
// sum / min / max / or.
// ---------------------------------------------------------------------------

namespace {

constexpr int kOutK = 2;
constexpr int kSubR = 32;
constexpr int kStiles = kSubR / 8;   // kernel tiles per 32-row sub
constexpr int kBandExtra = 4;        // band overlap granules (see python
                                     // _band_ranges — kept in lockstep)

// Banded-walk geometry for flat cells: tile k of every sub walks only
// granules [starts[k], starts[k] + wgb) of the W-row window.  The
// packer restricts tile k's rows to those granules, so the kernel's
// static band walk replaces the full W/8-granule sweep (uniform-random
// graphs measured 43% of kernel time in the walk, PERF round 5).
static inline void band_ranges(int Wg, int* starts, int* wgb_out) {
  // small windows need wide bands (spill risk at dense flat cells);
  // large windows hold sparse remainder cells — narrow bands (see
  // python _band_ranges)
  int wgb = std::max(Wg / 2, Wg / kStiles + kBandExtra);
  if (wgb > Wg) wgb = Wg;
  for (int k = 0; k < kStiles; ++k)
    starts[k] = (kStiles == 1 || Wg == wgb) ? 0
        : (int)(((int64_t)k * (Wg - wgb) * 2 + (kStiles - 1))
                / (2 * (kStiles - 1)));
  *wgb_out = wgb;
}
// minimum slots for a row-mode rank row to stay row-mode (see the
// hot-extraction comment in gm_plan2u_create); mirrored in
// pallas_spmv2u.ROWMODE_KEEP_MIN
constexpr int kRowmodeKeepMin = 64;
constexpr uint32_t kKbSame = 1u << 22;
constexpr uint32_t kKbPrev = 1u << 23;
constexpr int kKbKindShift = 24;

struct Plan2u {
  int64_t e = 0;
  int32_t h = 0, wr = 0, nb = 0, hub = 0, rows = 128, rowmode_min = 129;
  std::vector<int32_t> windows;
  std::vector<int64_t> edge_order;
  std::vector<int32_t> edge_row;        // row within cell (cold then rm)
  std::vector<int32_t> gidx;
  std::vector<int64_t> cell_edge_start;
  std::vector<int64_t> cell_sub_start;  // global sub id of cell's first sub
  std::vector<int64_t> cell_nrows;      // cold + rm
  std::vector<int64_t> cell_ncold;
  std::vector<int32_t> cell_blk;
  std::vector<int32_t> sub_kind, sub_base;   // per global sub
  std::vector<int32_t> ck_blk;               // per chunk
  std::vector<char> cell_banded;             // per final cell
  int64_t nc = 0;
  const int32_t* s = nullptr;
  const int32_t* r = nullptr;
  const float* v = nullptr;
};

// Greedy packer for one cell's cold edges (sender-sorted, hot skipped).
// Candidate rows are scanned OLDEST-FIRST with an advancing head pointer
// (first-fit bin packing: old rows fill up before new ones open).
struct UPacker {
  std::vector<std::array<uint64_t, 2>> reg;     // per-row registered lanes
  std::vector<int32_t> nslots;
  std::vector<std::array<int32_t, kLane>> outrecv;  // -1 = free
  std::vector<std::array<uint8_t, kLane>> outcnt;
  std::vector<int32_t> cand[kLane];             // rows in creation order
  size_t head[kLane];                           // first maybe-usable row
  std::vector<int32_t> myrows;                  // rows current sender uses
  std::vector<int64_t> gstart, gord;

  bool out_ok(int32_t row, int Lr, int32_t rcf) const {
    const int32_t orc = outrecv[row][Lr];
    return (orc < 0) || (orc == rcf && outcnt[row][Lr] < kOutK);
  }

  int32_t new_row() {
    const int32_t row = (int32_t)reg.size();
    reg.push_back({0, 0});
    nslots.push_back(0);
    outrecv.emplace_back();
    outrecv.back().fill(-1);
    outcnt.emplace_back();
    outcnt.back().fill(0);
    for (int l = 0; l < kLane; ++l) cand[l].push_back(row);
    return row;
  }

  int64_t pack(const int64_t* eo, int64_t m, const char* hot,
               const int32_t* senders, const int32_t* receivers,
               int64_t wrblk, int32_t* edge_row_out) {
    reg.clear(); nslots.clear(); outrecv.clear(); outcnt.clear();
    for (int l = 0; l < kLane; ++l) {
      cand[l].clear();
      head[l] = 0;
    }
    gstart.clear();
    gstart.push_back(0);
    for (int64_t j = 1; j < m; ++j)
      if (senders[eo[j]] != senders[eo[j - 1]]) gstart.push_back(j);
    gstart.push_back(m);
    const int64_t ng = (int64_t)gstart.size() - 1;
    gord.resize(ng);
    for (int64_t g = 0; g < ng; ++g) gord[g] = g;
    std::stable_sort(gord.begin(), gord.end(),
                     [&](int64_t a, int64_t b) {
                       return gstart[a + 1] - gstart[a]
                              > gstart[b + 1] - gstart[b];
                     });
    for (int64_t gi = 0; gi < ng; ++gi) {
      const int64_t g = gord[gi];
      const int64_t end = gstart[g + 1];
      const int L = senders[eo[gstart[g]]] & (kLane - 1);
      myrows.clear();
      for (int64_t j = gstart[g]; j < end; ++j) {
        if (hot[j]) continue;
        const int Lr = receivers[eo[j]] & (kLane - 1);
        const int32_t rcf = (int32_t)(receivers[eo[j]] - wrblk);
        int32_t row = -1;
        for (const int32_t ri : myrows) {
          if (nslots[ri] < kLane && out_ok(ri, Lr, rcf)) {
            row = ri;
            break;
          }
        }
        if (row < 0) {
          auto& st = cand[L];
          size_t& hd = head[L];
          int scan = 0;
          for (size_t t = hd; t < st.size() && scan < 96; ++t, ++scan) {
            const int32_t cr = st[t];
            const bool taken = (reg[cr][L >> 6] >> (L & 63)) & 1;
            if (nslots[cr] >= kLane || taken) {
              if (t == hd) ++hd;      // permanently unusable at this lane
              continue;
            }
            if (!out_ok(cr, Lr, rcf)) continue;
            row = cr;
            break;
          }
          if (row < 0) row = new_row();
          reg[row][L >> 6] |= 1ull << (L & 63);
          myrows.push_back(row);
        }
        edge_row_out[j] = row;
        nslots[row]++;
        if (outrecv[row][Lr] < 0) outrecv[row][Lr] = rcf;
        outcnt[row][Lr]++;
      }
    }
    return (int64_t)reg.size();
  }
};

}  // namespace

extern "C" {

// cell_min is PER WINDOW CLASS (int64[nw]): the flat-degree acceptance
// rule lowers the threshold for small windows so hub-free graphs (whose
// cells never reach the hubby default threshold) still get short walks
// banded_cls (int32[nw], may be null): classes whose cells pack in the
// banded-walk layout (tile k of each sub holds only granules of its
// static band; no row-mode rows).  A flagged cell with a row-mode-hot
// receiver falls back to the normal routed pack for that cell.
static double gm_prof_t0;
static inline void gm_prof(const char* what) {
  if (!getenv("GM_PLAN_PROF")) return;
  const double t = omp_get_wtime();
  if (what) fprintf(stderr, "[plan2u] %-22s %.2fs\n", what,
                    t - gm_prof_t0);
  gm_prof_t0 = t;
}

void* gm_plan2u_create(const int32_t* senders, const int32_t* receivers,
                       const float* vals, int64_t e, int32_t h, int32_t wr,
                       int32_t nb, int32_t hub, const int32_t* windows,
                       int32_t nw, const int64_t* cell_min,
                       const int32_t* banded_cls, int32_t rows,
                       int32_t rowmode_min, int64_t* nc_out) {
  gm_prof(nullptr);
  auto* p = new Plan2u();
  p->e = e; p->h = h; p->wr = wr; p->nb = nb; p->hub = hub;
  p->rows = rows; p->rowmode_min = rowmode_min;
  p->s = senders; p->r = receivers; p->v = vals;
  for (int32_t k = 0; k < nw; ++k)
    p->windows.push_back(std::min(windows[k], h));

  const int K = (int)p->windows.size();
  std::vector<int64_t> nwin(K), class_cells_ofs(K + 1, 0);
  for (int k = 0; k < K; ++k) {
    nwin[k] = (h + p->windows[k] - 1) / p->windows[k];
    class_cells_ofs[k + 1] = class_cells_ofs[k] + (int64_t)nb * nwin[k];
  }
  const int64_t hub_cells = nb;
  const int64_t raw_cells = hub_cells + class_cells_ofs[K];

  std::vector<int32_t> kind(e, -1);
  std::vector<int64_t> rawcell(e);
  p->gidx.resize(e);
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < e; ++i) {
    if (senders[i] < hub) {
      kind[i] = 0;
      rawcell[i] = receivers[i] / wr;
      p->gidx[i] = senders[i] >> 7;
    }
  }
  std::vector<int64_t> cellcnt;
  for (int k = 0; k < K; ++k) {
    const bool last = (k == K - 1);
    const int32_t W = p->windows[k];
    cellcnt.assign((size_t)nb * nwin[k], 0);
    if (!last) {
      // parallel histogram: per-thread partials merged once (the two
      // passes per class over all edges were serial and dominated the
      // classification phase at RMAT-23/24)
#pragma omp parallel
      {
        std::vector<int64_t> local(cellcnt.size(), 0);
#pragma omp for schedule(static) nowait
        for (int64_t i = 0; i < e; ++i)
          if (kind[i] < 0)
            local[(receivers[i] / wr) * nwin[k]
                  + ((senders[i] >> 7) / W)]++;
#pragma omp critical
        for (size_t c = 0; c < cellcnt.size(); ++c)
          cellcnt[c] += local[c];
      }
    }
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < e; ++i) {
      if (kind[i] >= 0) continue;
      const int64_t c =
          (receivers[i] / wr) * nwin[k] + ((senders[i] >> 7) / W);
      if (last || cellcnt[c] >= cell_min[k]) {
        kind[i] = 1 + k;
        rawcell[i] = hub_cells + class_cells_ofs[k] + c;
        int32_t base = (int32_t)((c % nwin[k]) * W);
        if (base > h - W) base = h - W;
        p->gidx[i] = (senders[i] >> 7) - base;
      }
    }
  }

  gm_prof("classify");
  std::vector<int64_t> rawcnt(raw_cells, 0);
#pragma omp parallel
  {
    std::vector<int64_t> local(raw_cells, 0);
#pragma omp for schedule(static) nowait
    for (int64_t i = 0; i < e; ++i) local[rawcell[i]]++;
#pragma omp critical
    for (int64_t c = 0; c < raw_cells; ++c) rawcnt[c] += local[c];
  }
  struct Cell { int64_t raw; int32_t blk, kind, win; };
  std::vector<Cell> cells;
  for (int64_t rc = 0; rc < raw_cells; ++rc) {
    if (!rawcnt[rc]) continue;
    Cell cl;
    cl.raw = rc;
    if (rc < hub_cells) {
      cl.blk = (int32_t)rc; cl.kind = 0; cl.win = 0;
    } else {
      int k = 0;
      while (k + 1 < K && rc - hub_cells >= class_cells_ofs[k + 1]) ++k;
      const int64_t c = rc - hub_cells - class_cells_ofs[k];
      cl.blk = (int32_t)(c / nwin[k]);
      cl.kind = 1 + k;
      cl.win = (int32_t)(c % nwin[k]);
    }
    cells.push_back(cl);
  }
  std::stable_sort(cells.begin(), cells.end(),
                   [](const Cell& a, const Cell& b) {
                     if (a.blk != b.blk) return a.blk < b.blk;
                     if (a.kind != b.kind) return a.kind < b.kind;
                     return a.win < b.win;
                   });

  std::vector<char> covered(nb, 0);
  for (const Cell& cl : cells) covered[cl.blk] = 1;
  std::vector<Cell> final_cells;
  std::vector<int64_t> raw_to_cell(raw_cells, -1);
  size_t ci = 0;
  for (int32_t b = 0; b < nb; ++b) {
    if (!covered[b]) {
      Cell cl; cl.raw = -1; cl.blk = b; cl.kind = 0; cl.win = 0;
      final_cells.push_back(cl);
    }
    while (ci < cells.size() && cells[ci].blk == b) {
      raw_to_cell[cells[ci].raw] = (int64_t)final_cells.size();
      final_cells.push_back(cells[ci]);
      ++ci;
    }
  }
  const size_t nfc = final_cells.size();

  std::vector<int32_t> cellid(e);
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < e; ++i)
    cellid[i] = (int32_t)raw_to_cell[rawcell[i]];
  p->cell_edge_start.assign(nfc + 2, 0);
  for (int64_t i = 0; i < e; ++i) p->cell_edge_start[cellid[i] + 2]++;
  for (size_t q = 2; q < p->cell_edge_start.size(); ++q)
    p->cell_edge_start[q] += p->cell_edge_start[q - 1];
  p->edge_order.resize(e);
  for (int64_t i = 0; i < e; ++i)
    p->edge_order[p->cell_edge_start[cellid[i] + 1]++] = i;
  p->cell_edge_start.pop_back();

  gm_prof("cells+bucket");
  // ---- per-cell packing: hot extraction + routed cold pack ----------------
  p->edge_row.resize(e);
  p->cell_nrows.assign(nfc, 0);
  p->cell_ncold.assign(nfc, 0);
  p->cell_banded.assign(nfc, 0);
#pragma omp parallel
  {
    UPacker packer;
    std::vector<int64_t> rsort;
    std::vector<char> hot;
    std::vector<int32_t> rmrow;      // rm row (local) per edge, -1 cold
    std::vector<int32_t> lanecnt(kLane);
    std::vector<int8_t> bandof;
    std::vector<int64_t> beo;
    std::vector<int32_t> brow;
    std::vector<char> bhot;
#pragma omp for schedule(dynamic, 8)
    for (int64_t q = 0; q < (int64_t)nfc; ++q) {
      const int64_t lo = p->cell_edge_start[q];
      const int64_t m = p->cell_edge_start[q + 1] - lo;
      if (!m) continue;
      int64_t* eo = &p->edge_order[lo];
      std::stable_sort(eo, eo + m, [&](int64_t a, int64_t b) {
        return senders[a] < senders[b];
      });
      const int32_t ckind = final_cells[q].kind;
      if (ckind > 0 && banded_cls && banded_cls[ckind - 1]) {
        // banded eligibility: no row-mode-hot receiver in the cell
        bool any_hot = false;
        if (m >= p->rowmode_min) {
          rsort.assign(eo, eo + m);
          std::stable_sort(rsort.begin(), rsort.end(),
                           [&](int64_t a, int64_t b) {
                             return receivers[a] < receivers[b];
                           });
          int64_t a = 0;
          while (a < (int64_t)m && !any_hot) {
            int64_t b2 = a + 1;
            while (b2 < (int64_t)m
                   && receivers[rsort[b2]] == receivers[rsort[a]]) ++b2;
            if (b2 - a >= p->rowmode_min) any_hot = true;
            a = b2;
          }
        }
        if (!any_hot) {
          const int32_t W = p->windows[ckind - 1];
          int starts[kStiles], wgb;
          band_ranges(W / 8, starts, &wgb);
          // 2-choice band assignment on the BINDING loads: a band's row
          // count is max(per-sender-lane, per-out-lane) occupancy, so
          // the choice among covering bands minimizes that pair (plain
          // total-count balancing measured fill 0.26 — the quartered
          // per-band population makes the binomial lane max/mean ratio
          // the constraint, not the totals)
          bandof.assign(m, 0);
          int32_t sload[kStiles][kLane];
          int32_t rload[kStiles][kLane];
          std::memset(sload, 0, sizeof(sload));
          std::memset(rload, 0, sizeof(rload));
          // pass 1 assigns single-candidate (exclusive-granule) edges
          // so the shared-region balancing sees the forced loads
          int64_t bcnt[kStiles] = {0};
          for (int pass = 0; pass < 2; ++pass) {
            for (int64_t j = 0; j < m; ++j) {
              const int g = p->gidx[eo[j]] >> 3;
              int ncand = 0, cand[kStiles];
              for (int k = 0; k < kStiles; ++k)
                if (starts[k] <= g && g < starts[k] + wgb)
                  cand[ncand++] = k;
              if ((pass == 0) != (ncand <= 1)) continue;
              const int L = senders[eo[j]] & (kLane - 1);
              const int Lr = receivers[eo[j]] & (kLane - 1);
              int best = -1;
              int64_t bestc = 0;
              for (int q2 = 0; q2 < ncand; ++q2) {
                const int k = cand[q2];
                const int32_t ml = std::max(sload[k][L], rload[k][Lr]);
                // >= 8 rows of lane load would spill the cell into a
                // second, mostly-empty sub level: last resort
                const int64_t c = ((int64_t)(ml >= 8) << 40)
                                  | ((int64_t)ml << 24) | bcnt[k];
                if (best < 0 || c < bestc) { best = k; bestc = c; }
              }
              if (best < 0) best = g * kStiles / std::max(W / 8, 1);
              if (best >= kStiles) best = kStiles - 1;
              bandof[j] = (int8_t)best;
              sload[best][L]++;
              rload[best][Lr]++;
              bcnt[best]++;
            }
          }
          const int64_t wrblk = (int64_t)final_cells[q].blk * wr;
          int64_t nsub8 = 1;
          std::vector<int64_t> rows_k(kStiles);
          std::vector<std::vector<int64_t>> bidx(kStiles);
          std::vector<std::vector<int32_t>> brows(kStiles);
          for (int k = 0; k < kStiles; ++k) bidx[k].clear();
          for (int64_t j = 0; j < m; ++j)
            bidx[bandof[j]].push_back(j);
          for (int k = 0; k < kStiles; ++k) {
            const int64_t mk = (int64_t)bidx[k].size();
            if (!mk) { rows_k[k] = 0; continue; }
            beo.resize(mk);
            for (int64_t t = 0; t < mk; ++t) beo[t] = eo[bidx[k][t]];
            bhot.assign(mk, 0);
            brows[k].resize(mk);
            rows_k[k] = packer.pack(beo.data(), mk, bhot.data(),
                                    senders, receivers, wrblk,
                                    brows[k].data());
            const int64_t s8 = (rows_k[k] + 7) / 8;
            if (s8 > nsub8) nsub8 = s8;
          }
          // per-cell fallback: banded only when it costs no extra sub
          // levels vs the normal routed pack (exclusive-granule lane
          // collisions occasionally force a 9th row, which would spill
          // the whole cell into a second, mostly-empty sub)
          bool keep_banded = true;
          if (nsub8 > 1) {
            bhot.assign(m, 0);
            brow.resize(m);
            const int64_t nrows_norm = packer.pack(
                eo, m, bhot.data(), senders, receivers, wrblk,
                brow.data());
            if ((nrows_norm + kSubR - 1) / kSubR < nsub8) {
              keep_banded = false;
              for (int64_t j = 0; j < m; ++j)
                p->edge_row[lo + j] = brow[j];
              p->cell_nrows[q] = nrows_norm;
              p->cell_ncold[q] = nrows_norm;
            }
          }
          if (keep_banded) {
            for (int k = 0; k < kStiles; ++k)
              for (int64_t t = 0; t < (int64_t)bidx[k].size(); ++t) {
                const int32_t rb = brows[k][t];
                p->edge_row[lo + bidx[k][t]] =
                    (int32_t)((rb / 8) * kSubR + k * 8 + rb % 8);
              }
            p->cell_nrows[q] = nsub8 * kSubR;
            p->cell_ncold[q] = p->cell_nrows[q];
            p->cell_banded[q] = 1;
          }
          continue;
        }
      }
      // hot receivers: in-cell degree >= rowmode_min; rm row assignment
      // keyed by edge id in the high bits of a receiver-sorted copy
      rsort.assign(eo, eo + m);
      std::stable_sort(rsort.begin(), rsort.end(),
                       [&](int64_t a, int64_t b) {
                         return receivers[a] < receivers[b];
                       });
      hot.assign(m, 0);
      rmrow.assign(m, -1);
      int32_t nrm = 0;
      {
        int64_t a = 0;
        while (a < m) {
          int64_t b2 = a + 1;
          while (b2 < m && receivers[rsort[b2]] == receivers[rsort[a]]) ++b2;
          if (b2 - a >= p->rowmode_min) {
            // rank-r row size = #lanes with > r senders; sizes decay
            // fast (sender lanes are pinned to sender&127, so ranks
            // follow the lane-collision order statistics) — keep only
            // rank rows at least half full (>= kRowmodeKeepMin slots)
            // and spill the rest to the routed cold pack, whose rows
            // mix receivers at ~0.88 fill.  Measured on a true RMAT-20
            // (in-degree hubs): rank rows averaged 0.37 fill and were
            // 46% of all plan rows before this cut.
            std::fill(lanecnt.begin(), lanecnt.end(), 0);
            for (int64_t t = a; t < b2; ++t)
              lanecnt[senders[rsort[t]] & (kLane - 1)]++;
            int32_t R = 0;
            for (;;) {
              int sz = 0;
              for (int l = 0; l < kLane; ++l) sz += lanecnt[l] > R;
              if (sz >= kRowmodeKeepMin) ++R; else break;
            }
            if (R) {
              std::fill(lanecnt.begin(), lanecnt.end(), 0);
              for (int64_t t = a; t < b2; ++t) {
                const int L = senders[rsort[t]] & (kLane - 1);
                const int32_t rr = lanecnt[L]++;
                if (rr < R)
                  rsort[t] |= ((int64_t)(nrm + rr) + 1) << 40;
              }
              nrm += R;
            }
          }
          a = b2;
        }
      }
      if (nrm) {
        std::sort(rsort.begin(), rsort.end(),
                  [](int64_t a, int64_t b) {
                    return (a & ((1ll << 40) - 1)) < (b & ((1ll << 40) - 1));
                  });
        for (int64_t j = 0; j < m; ++j) {
          const int64_t id = eo[j];
          int64_t lo2 = 0, hi2 = m - 1;
          while (lo2 < hi2) {
            const int64_t mid = (lo2 + hi2) / 2;
            if ((rsort[mid] & ((1ll << 40) - 1)) < id) lo2 = mid + 1;
            else hi2 = mid;
          }
          const int32_t rm = (int32_t)(rsort[lo2] >> 40);
          if (rm > 0) {
            hot[j] = 1;
            rmrow[j] = rm - 1;
          }
        }
      }
      const int64_t wrblk = (int64_t)final_cells[q].blk * wr;
      const int64_t ncold = packer.pack(eo, m, hot.data(), senders,
                                        receivers, wrblk,
                                        &p->edge_row[lo]);
      for (int64_t j = 0; j < m; ++j)
        if (hot[j]) p->edge_row[lo + j] = (int32_t)(ncold + rmrow[j]);
      p->cell_ncold[q] = ncold;
      p->cell_nrows[q] = ncold + nrm;
    }
  }

  gm_prof("pack");
  // ---- sub-window assembly: cells -> 32-row subs; blocks pad to a
  // multiple of S subs with cheap HUB pads; S subs = one chunk ---------
  const int S = rows / kSubR > 0 ? rows / kSubR : 1;
  p->cell_sub_start.resize(nfc);
  p->cell_blk.resize(nfc);
  int32_t cur_blk = -1;   // unused marker
  (void)cur_blk;
  size_t qi = 0;
  for (int32_t b = 0; b < nb; ++b) {
    const size_t nsub0 = p->sub_kind.size();
    while (qi < nfc && final_cells[qi].blk == b) {
      const Cell& cl = final_cells[qi];
      int32_t kv = cl.kind, bv = 0;
      if (cl.kind != 0) {
        const int32_t W = p->windows[cl.kind - 1];
        bv = cl.win * W;
        if (bv > h - W) bv = h - W;
        if (p->cell_banded[qi]) kv = cl.kind + (int32_t)K;
      }
      p->cell_sub_start[qi] = (int64_t)p->sub_kind.size();
      p->cell_blk[qi] = b;
      int64_t nsub = (p->cell_nrows[qi] + kSubR - 1) / kSubR;
      if (!nsub) nsub = 1;
      for (int64_t k = 0; k < nsub; ++k) {
        p->sub_kind.push_back(kv);
        p->sub_base.push_back(bv);
      }
      ++qi;
    }
    if (p->sub_kind.size() == nsub0) {       // empty-block coverage
      p->sub_kind.push_back(0);
      p->sub_base.push_back(0);
    }
    while ((p->sub_kind.size() - nsub0) % S) {
      p->sub_kind.push_back(0);              // cheap hub pad
      p->sub_base.push_back(0);
    }
    const int64_t nchunk = (int64_t)(p->sub_kind.size() - nsub0) / S;
    for (int64_t c2 = 0; c2 < nchunk; ++c2) p->ck_blk.push_back(b);
  }
  p->nc = (int64_t)p->sub_kind.size() / S;
  *nc_out = p->nc;
  gm_prof("assembly");
  return p;
}

void gm_plan2u_fill(void* handle, int32_t* kb, int32_t* blkid,
                    int32_t* pk, int32_t* po, float* val) {
  auto* p = static_cast<Plan2u*>(handle);
  const int64_t nc = p->nc;
  const int64_t chunk_elems = (int64_t)p->rows * kLane;
  const int S = p->rows / kSubR > 0 ? p->rows / kSubR : 1;
  const size_t nfc = p->cell_nrows.size();
  const uint32_t wru = (uint32_t)p->wr;

  // kb: packed per-sub metadata with the window-reuse chain bits
  {
    int64_t last_kind = -1, last_base = -1, last_idx = -1;
    for (int64_t j = 0; j < (int64_t)p->sub_kind.size(); ++j) {
      const int32_t kd = p->sub_kind[j];
      const int32_t bs = p->sub_base[j];
      uint32_t w = ((uint32_t)kd << kKbKindShift)
                   | (uint32_t)(bs >> 3);
      if (kd != 0) {
        if (last_idx >= 0 && last_kind == kd && last_base == bs) {
          const int64_t pc = last_idx / S, mc = j / S;
          if (mc - pc <= 1) {
            w |= kKbSame;
            if (pc == mc - 1) w |= kKbPrev;
          }
        }
        last_kind = kd; last_base = bs; last_idx = j;
      }
      kb[j] = (int32_t)w;
    }
  }

#pragma omp parallel for schedule(static)
  for (int64_t c = 0; c < nc; ++c) {
    int32_t* pkc = pk + c * chunk_elems;
    int32_t* poc = po + c * chunk_elems;
    for (int64_t t = 0; t < chunk_elems; ++t) {
      pkc[t] = (int32_t)wru;
      poc[t] = (int32_t)wru;
    }
    std::memset(val + c * chunk_elems, 0, chunk_elems * sizeof(float));
    blkid[c] = p->ck_blk[c];
  }
#pragma omp parallel
  {
    std::vector<int32_t> rowfill;
#pragma omp for schedule(dynamic, 8)
    for (int64_t q = 0; q < (int64_t)nfc; ++q) {
      const int64_t lo = p->cell_edge_start[q];
      const int64_t m = p->cell_edge_start[q + 1] - lo;
      if (!m) continue;
      rowfill.assign(p->cell_nrows[q], 0);
      const int64_t wrblk = (int64_t)p->cell_blk[q] * p->wr;
      const int64_t s0 = p->cell_sub_start[q];
      const int64_t ncold = p->cell_ncold[q];
      for (int64_t j = lo; j < lo + m; ++j) {
        const int64_t i = p->edge_order[j];
        const int32_t row = p->edge_row[j];
        const int32_t slot = rowfill[row]++;
        const int L = p->s[i] & (kLane - 1);
        const int Lr = p->r[i] & (kLane - 1);
        const uint32_t rcf = (uint32_t)(p->r[i] - wrblk);
        const int64_t sub = s0 + row / kSubR;
        const int64_t chunk = sub / S;
        const int64_t rbase = chunk * chunk_elems
                              + ((sub % S) * kSubR + row % kSubR) * kLane;
        uint32_t w = (uint32_t)pk[rbase + slot];
        w = (w & 0xFFE00000u) | ((uint32_t)L << kSloShift) | rcf;
        pk[rbase + slot] = (int32_t)w;
        val[rbase + slot] = p->v[i];
        pk[rbase + L] = (int32_t)((uint32_t)pk[rbase + L]
                                  | ((uint32_t)p->gidx[i] << 21));
        if (row >= ncold) {
          // row-mode row: mode bit + receiver rcf across all lanes
          if (slot == 0) {
            const int32_t w2 = (int32_t)((1u << 29) | rcf);
            for (int l = 0; l < kLane; ++l) po[rbase + l] = w2;
          }
        } else {
          uint32_t ow = (uint32_t)po[rbase + Lr];
          if ((ow & ((1u << kRcfBits) - 1)) == wru) {
            ow = rcf | ((uint32_t)slot << 21)
                 | ((uint32_t)slot << kSloShift);
          } else {
            ow = (ow & ~(((uint32_t)(kLane - 1)) << kSloShift))
                 | ((uint32_t)slot << kSloShift) | (1u << 28);
          }
          po[rbase + Lr] = (int32_t)ow;
        }
      }
    }
  }
}

void gm_plan2u_eidx(void* handle, int32_t* eidx) {
  auto* p = static_cast<Plan2u*>(handle);
  const int64_t nc = p->nc;
  const int64_t chunk_elems = (int64_t)p->rows * kLane;
  const int S = p->rows / kSubR > 0 ? p->rows / kSubR : 1;
  const size_t nfc = p->cell_nrows.size();
#pragma omp parallel for schedule(static)
  for (int64_t c = 0; c < nc; ++c)
    for (int64_t t = 0; t < chunk_elems; ++t)
      eidx[c * chunk_elems + t] = -1;
#pragma omp parallel
  {
    std::vector<int32_t> rowfill;
#pragma omp for schedule(dynamic, 8)
    for (int64_t q = 0; q < (int64_t)nfc; ++q) {
      const int64_t lo = p->cell_edge_start[q];
      const int64_t m = p->cell_edge_start[q + 1] - lo;
      if (!m) continue;
      rowfill.assign(p->cell_nrows[q], 0);
      const int64_t s0 = p->cell_sub_start[q];
      for (int64_t j = lo; j < lo + m; ++j) {
        const int64_t i = p->edge_order[j];
        const int32_t row = p->edge_row[j];
        const int32_t slot = rowfill[row]++;
        const int64_t sub = s0 + row / kSubR;
        const int64_t chunk = sub / S;
        const int64_t rbase = chunk * chunk_elems
                              + ((sub % S) * kSubR + row % kSubR) * kLane;
        eidx[rbase + slot] = (int32_t)i;
      }
    }
  }
}

void gm_plan2u_destroy(void* handle) { delete static_cast<Plan2u*>(handle); }

}  // extern "C"

// ---------------------------------------------------------------------------
// glibc-compatible rand() and the reference's seeded square-id permutation
// (randomize_edgelist_square, edgelist.h:337-366: srand(5); rval[i] =
// rand() % m; sequential swap mapping[i] <-> mapping[rval[i]]).  The
// generator replicates glibc's TYPE_3 additive-feedback random()
// (31-word ring seeded via Park-Miller/Schrage, 310 warm-up outputs
// discarded) so the produced permutation is byte-identical to the
// reference binaries on the same input.

extern "C" {

void gm_glibc_square_mapping(int64_t m, uint32_t seed, int32_t* mapping) {
  uint32_t r[31];
  long long word = (seed == 0) ? 1 : (long long)seed;
  r[0] = (uint32_t)word;
  for (int i = 1; i < 31; ++i) {
    long long hi = word / 127773, lo = word % 127773;
    word = 16807 * lo - 2836 * hi;
    if (word < 0) word += 2147483647;
    r[i] = (uint32_t)word;
  }
  int f = 3, p = 0;
  for (int i = 0; i < 310; ++i) {
    r[f] += r[p];
    if (++f == 31) f = 0;
    if (++p == 31) p = 0;
  }
  std::vector<int64_t> rval(m);
  for (int64_t i = 0; i < m; ++i) {
    r[f] += r[p];
    rval[i] = (int64_t)((r[f] >> 1) % (uint32_t)m);
    if (++f == 31) f = 0;
    if (++p == 31) p = 0;
  }
  for (int64_t i = 0; i < m; ++i) mapping[i] = (int32_t)i;
  for (int64_t i = 0; i < m; ++i) {
    int64_t j = rval[i];
    int32_t tmp = mapping[i];
    mapping[i] = mapping[j];
    mapping[j] = tmp;
  }
}

}  // extern "C"

// ---------------------------------------------------------------------
// Parallel int64 argsort (stable): the hypersparse-compaction divert
// pass needs two big key sorts (unique (super-block, sender) pairs and
// the per-(group, lane) rank ordering); numpy's introsort is
// single-threaded and dominated graph build at RMAT-23/24 (PERF.md
// round 4).  Mirrors the reference's parallel tile sorts
// (DCSCTile.h:252-309, __gnu_parallel::sort).
#include <parallel/algorithm>

extern "C" void gm_argsort_i64(const int64_t* key, int64_t n,
                               int64_t* order_out) {
  for (int64_t i = 0; i < n; ++i) order_out[i] = i;
  __gnu_parallel::sort(order_out, order_out + n,
                       [&](int64_t a, int64_t b) {
                         return key[a] < key[b]
                                || (key[a] == key[b] && a < b);
                       });
}

// ---------------------------------------------------------------------
// Triangle-counting v2 host prep: core-bitmap + tail-list split.
//
// TPU formulation (ops/triangles.py): common neighbors are split at a
// degree-rank threshold.  Neighbors in the top-h "core" are intersected
// on device as packed uint32 bitmaps (AND + popcount over gathered
// rows); the remaining "tail" neighbors form short per-sender lists
// intersected by the broadcast-equality kernel.  Degree orientation
// closure (out-neighbors always have higher (deg, id) rank) makes the
// split exact: a core vertex has t_of == 0, so every hub-hub
// intersection rides the bitmap path.
//
// This function does everything the host needs in one native pass:
// dedup (optional), degree ranks, orientation, counting sort by sender,
// bitmap fill, tail-list extraction.  Reference analog: the tile
// build + GetNeighbors prep (src/TriangleCounting.cpp:82-111).
// ---------------------------------------------------------------------

namespace {

struct TcPrep {
  int64_t m = 0;    // oriented deduped edge count
  int64_t m2 = 0;   // tail-receiver edges (part-2 list entries)
  int32_t n = 0, h = 0, W = 0, ncr = 0, core_lo = 0;
  std::vector<int32_t> s, r;          // [m] grouped by sender
  std::vector<int64_t> off;           // [n+1] sender CSR offsets
  std::vector<int64_t> t2off;         // [n+1] tail-list offsets
  std::vector<int32_t> odeg, t_of, crow, rank_of;
};

}  // namespace

extern "C" {

// Phase 1.  assume_canonical != 0 promises the caller already passes
// unique undirected pairs with u < v (no self loops required — they are
// still dropped); the dedup sort is skipped entirely.
void* gm_tc_create(const int32_t* u, const int32_t* v, int64_t e,
                   int32_t n, int32_t h, int32_t assume_canonical,
                   int64_t* m_out, int64_t* m2_out, int32_t* ncr_out) {
  auto* p = new TcPrep();
  p->n = n;
  const int64_t N = n;
  std::vector<int64_t> key(e);
  {
    std::atomic<int64_t> nk{0};
#pragma omp parallel
    {
      std::vector<int64_t> local;
      local.reserve(e / (omp_get_max_threads() ? omp_get_max_threads()
                                               : 1) + 1);
#pragma omp for nowait
      for (int64_t i = 0; i < e; ++i) {
        if (u[i] == v[i]) continue;
        const int64_t a = std::min(u[i], v[i]);
        const int64_t b = std::max(u[i], v[i]);
        local.push_back(a * N + b);
      }
      const int64_t at = nk.fetch_add((int64_t)local.size());
      std::copy(local.begin(), local.end(), key.begin() + at);
    }
    key.resize(nk.load());
  }
  if (!assume_canonical) {
    __gnu_parallel::sort(key.begin(), key.end());
    key.erase(std::unique(key.begin(), key.end()), key.end());
  }
  const int64_t m = (int64_t)key.size();
  p->m = m;

  // degrees over the deduped undirected support
  std::vector<int32_t> deg(n, 0);
  for (int64_t i = 0; i < m; ++i) {
    ++deg[key[i] / N];
    ++deg[key[i] % N];
  }

  // degree ranks: rank_of[vtx] = position in (deg, id) ascending order
  p->rank_of.resize(n);
  {
    std::vector<int32_t> ord(n);
    for (int32_t i = 0; i < n; ++i) ord[i] = i;
    __gnu_parallel::sort(ord.begin(), ord.end(),
                         [&](int32_t a, int32_t b) {
                           return deg[a] < deg[b]
                                  || (deg[a] == deg[b] && a < b);
                         });
    for (int32_t i = 0; i < n; ++i) p->rank_of[ord[i]] = i;
  }

  // orient toward the (deg, id)-larger endpoint; histogram by sender
  p->odeg.assign(n, 0);
  p->s.resize(m);
  p->r.resize(m);
#pragma omp parallel
  {
    std::vector<int32_t> part(n, 0);
#pragma omp for
    for (int64_t i = 0; i < m; ++i) {
      const int32_t a = (int32_t)(key[i] / N);
      const int32_t b = (int32_t)(key[i] % N);
      const bool fwd = p->rank_of[a] < p->rank_of[b];
      p->s[i] = fwd ? a : b;   // temporarily unsorted
      p->r[i] = fwd ? b : a;
      ++part[p->s[i]];
    }
#pragma omp critical
    for (int32_t x = 0; x < n; ++x) p->odeg[x] += part[x];
  }

  // counting sort by sender (receiver order within a sender is free)
  p->off.assign(n + 1, 0);
  for (int32_t x = 0; x < n; ++x) p->off[x + 1] = p->off[x] + p->odeg[x];
  {
    std::vector<int32_t> ss(m), rr(m);
    std::vector<int64_t> cur(p->off.begin(), p->off.end() - 1);
    for (int64_t i = 0; i < m; ++i) {
      const int64_t at = cur[p->s[i]]++;
      ss[at] = p->s[i];
      rr[at] = p->r[i];
    }
    p->s.swap(ss);
    p->r.swap(rr);
  }

  // core split
  p->h = std::min<int32_t>(h, n);
  p->core_lo = n - p->h;
  p->W = (p->h + 31) / 32;
  p->t_of.assign(n, 0);
  std::atomic<int64_t> m2{0};
#pragma omp parallel for schedule(dynamic, 4096)
  for (int32_t x = 0; x < n; ++x) {
    int32_t t = 0;
    for (int64_t i = p->off[x]; i < p->off[x + 1]; ++i)
      if (p->rank_of[p->r[i]] < p->core_lo) ++t;
    p->t_of[x] = t;
    if (t) m2.fetch_add(t);
  }
  p->m2 = m2.load();
  p->t2off.assign(n + 1, 0);
  for (int32_t x = 0; x < n; ++x)
    p->t2off[x + 1] = p->t2off[x] + p->t_of[x];

  // compressed bitmap rows: only senders with >= 1 core out-neighbor
  p->crow.assign(n, -1);
  int32_t ncr = 0;
  for (int32_t x = 0; x < n; ++x)
    if (p->odeg[x] - p->t_of[x] > 0) p->crow[x] = ncr++;
  p->ncr = ncr;

  *m_out = p->m;
  *m2_out = p->m2;
  *ncr_out = ncr;
  return p;
}

// Phase 2.  Caller allocates:
//   s_all, r_all, iu_row, iv_row : int32 [m]
//   bitmap                       : uint32 [(ncr+1) * W], ZERO-initialized
//   s2, r2, t2rank               : int32 [m2]
//   t_of_out, odeg_out           : int32 [n]
void gm_tc_fill(void* handle, int32_t* s_all, int32_t* r_all,
                int32_t* iu_row, int32_t* iv_row, uint32_t* bitmap,
                int32_t* s2, int32_t* r2, int32_t* t2rank,
                int32_t* t_of_out, int32_t* odeg_out) {
  auto* p = static_cast<TcPrep*>(handle);
  const int32_t n = p->n, W = p->W, ncr = p->ncr, core_lo = p->core_lo;
#pragma omp parallel for schedule(dynamic, 2048)
  for (int32_t x = 0; x < n; ++x) {
    const int32_t cu = p->crow[x] < 0 ? ncr : p->crow[x];
    int32_t trk = 0;
    int64_t t2 = p->t2off[x];
    for (int64_t i = p->off[x]; i < p->off[x + 1]; ++i) {
      const int32_t rv = p->r[i];
      const int32_t rk = p->rank_of[rv];
      s_all[i] = x;
      r_all[i] = rv;
      iu_row[i] = cu;
      iv_row[i] = p->crow[rv] < 0 ? ncr : p->crow[rv];
      if (rk >= core_lo) {
        const int32_t bit = rk - core_lo;
        bitmap[(int64_t)p->crow[x] * W + (bit >> 5)] |= 1u << (bit & 31);
      } else {
        s2[t2] = x;
        r2[t2] = rv;
        t2rank[t2] = trk++;
        ++t2;
      }
    }
  }
  std::memcpy(t_of_out, p->t_of.data(), (size_t)n * sizeof(int32_t));
  std::memcpy(odeg_out, p->odeg.data(), (size_t)n * sizeof(int32_t));
}

void gm_tc_destroy(void* handle) { delete static_cast<TcPrep*>(handle); }

}  // extern "C"

// Per-ROW consumed-granule spans (gmin/gmax over each row's slots) —
// the numpy recomputation in _sort_rows_tile_bounds (pk decode + a
// 22.8M-element take_along_axis at RMAT-20) cost ~3 s of plan build;
// the fill loop already touches every slot's sender granule.
extern "C" void gm_plan2u_gspan(void* handle, int32_t* gmin_out,
                                int32_t* gmax_out) {
  auto* p = static_cast<Plan2u*>(handle);
  const int S = p->rows / kSubR > 0 ? p->rows / kSubR : 1;
  const int64_t nrows = p->nc * (int64_t)p->rows;
  const size_t nfc = p->cell_nrows.size();
#pragma omp parallel for schedule(static)
  for (int64_t t = 0; t < nrows; ++t) {
    gmin_out[t] = 1 << 14;
    gmax_out[t] = -1;
  }
#pragma omp parallel
  {
#pragma omp for schedule(dynamic, 8)
    for (int64_t q = 0; q < (int64_t)nfc; ++q) {
      const int64_t lo = p->cell_edge_start[q];
      const int64_t m = p->cell_edge_start[q + 1] - lo;
      if (!m) continue;
      const int64_t s0 = p->cell_sub_start[q];
      for (int64_t j = lo; j < lo + m; ++j) {
        const int32_t row = p->edge_row[j];
        const int64_t sub = s0 + row / kSubR;
        const int64_t chunk = sub / S;
        const int64_t fr = chunk * p->rows
                           + (sub % S) * kSubR + row % kSubR;
        const int32_t g = p->gidx[p->edge_order[j]] >> 3;
        if (g < gmin_out[fr]) gmin_out[fr] = g;
        if (g > gmax_out[fr]) gmax_out[fr] = g;
      }
    }
  }
}
