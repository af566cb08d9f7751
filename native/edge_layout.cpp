// Native EdgePlan slot-stream layout for graph_tpu.
//
// Performs the build_plan stages that python does per tile
// (graph_tpu/engine/plan.py): sort edges by (mid, src), then greedily
// cut 1024-slot tiles / 16-tile blocks / 65536-slot sections per mid
// under the K1 gather-window and slice-span budgets, emitting the K1
// metadata (widx, ws, sb), the K2 sort keys (slot destination-locals)
// and optionally slot-ordered edge values.
//
// Constants must match graph_tpu/engine/kernels.py.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 -pthread edge_layout.cpp

#include <atomic>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int64_t TILE = 1024;
constexpr int64_t TPB = 16;
constexpr int64_t BLK = TILE * TPB;
constexpr int64_t SLICE = 32768;
constexpr int64_t NSLICES = 3;
// Candidate (window, staged-slices) configs + cost model (must match
// plan.py WIN_CANDIDATES / _count_slots).  The 16384 window pairs
// with 8 staged slices: the block-span budget (nslices*SLICE)
// otherwise binds pad growth at large src gaps.  (16384, 16) halves
// pad at large src gaps, and (32768, 16) removes the window-driven
// tile splits entirely at scale-24-class gaps (~16 srcs/slot) — the
// per-block classes keep tight blocks on small windows either way.
constexpr int64_t WIN_CANDIDATES[6] = {2048, 4096, 8192, 16384, 16384,
                                       32768};
constexpr int64_t NSLICE_CANDIDATES[6] = {3, 3, 3, 8, 16, 16};
constexpr int64_t WIN_COST_RATIO = 48;
constexpr int64_t SEC = 65536;
constexpr int64_t MID = 65536;

struct Layout {
    int64_t nslots;
    uint16_t* widx;     // nslots
    int32_t* keys;      // nslots (dst-local; -1 lead pad, MID tail pad)
    float* wvals;       // nslots or nullptr
    int32_t* ws;        // nslots / TILE
    int32_t* sb;        // nslots / BLK
};

// Round the per-block max scan rows up to its window class (multiples
// of 8 rows = 1024-slot window granularity, capped at win/128) —
// mirrors engine._k1_classes: each block only pays its own class's
// unrolled window-row scan.
int64_t class_rows(int64_t rows, int64_t win) {
    int64_t c = (rows + 7) / 8 * 8;
    if (c < 8) c = 8;  // minimum window 1024 -> 8 rows
    int64_t cap = win / 128;
    return c < cap ? c : cap;
}

// Greedy layout of one mid (edges sorted by src). Two modes: count-only
// (out == nullptr; optionally accumulates the window-class scan-row
// cost into *rowcost — units: slots x rows, comparable with
// WIN_COST_RATIO * nslots) and fill.  Both modes make IDENTICAL
// row-match decisions (the counts allocate the fill arrays).
//
// Row-matched placement (plan v6, kernels._k1_kernel mode="rowmatch"):
// a tile whose slots can sit in the VREG row matching their window row
// mod 8 (<=128 per row, minus the lead pad in row 0) runs an ~8x
// cheaper K1 gather.  A tile accepts it when the saved scan rows beat
// the pad cost; hub tiles (duplicate runs overflow one row: saved == 0)
// stay packed, and once one tile of a block goes packed the rest of the
// block follows (the engine classes blocks whole).  Pad slots point at
// window position row*128 (row-conformal, always < win, masked by K2).
int64_t layout_mid(const int64_t* src, const int64_t* dstl, const float* val,
                   int64_t m_i, int64_t slot0, Layout* out, int64_t win,
                   int64_t nslices, int64_t* rowcost = nullptr) {
    const int64_t span_budget = win - 1024;
    const int64_t block_span = nslices * SLICE - 1;
    int64_t cur = 0;
    int64_t slot = slot0;
    int64_t block_first = -1;
    int64_t block_rows = 0;  // max scan rows of any tile in this block
    bool block_rm = true;    // every real tile of this block row-matched
    bool rm_allowed = true;
    auto flush_rowcost = [&]() {
        // row-matched blocks pay ~class_rows/8 (one lane taa per 8-row
        // window group instead of 3 VREG ops per row).  Packed blocks
        // are priced at 2x that, NOT the full rowscan: the lanemap
        // repack (plan v7+) claims ~80% of them at ~cr/12 and the rest
        // pay cr, so E[cost] ~ 0.25 cr — flattening the row term moves
        // the auto-pick toward wide windows (less pad), mirroring
        // plan.py _count_slots.
        int64_t cr = class_rows(block_rows, win);
        int64_t c8 = (cr + 7) / 8;
        *rowcost += BLK * (block_rm ? c8 : (cr < 2 * c8 ? cr : 2 * c8));
    };
    for (;;) {
        if (cur >= m_i && slot % SEC == 0 && slot > slot0) break;
        int lead = (slot % SEC == 0) ? 1 : 0;
        if (slot % BLK == 0 && slot > slot0 && rowcost) {
            flush_rowcost();
            block_rows = 0;
        }
        if (slot % BLK == 0) {
            block_first = -1;
            rm_allowed = true;
            block_rm = true;
        }
        int64_t t = slot / TILE;
        int64_t b = slot / BLK;
        if (cur >= m_i) {
            if (out) {
                if (slot % BLK == 0) out->sb[b] = 0;
                out->ws[t] = 0;
                for (int64_t i = 0; i < TILE; i++) {
                    out->widx[slot + i] = (uint16_t)((i >> 7) << 7);
                    out->keys[slot + i] = (int32_t)MID;
                    if (out->wvals) out->wvals[slot + i] = 0.0f;
                }
                if (lead) out->keys[slot] = -1;
            }
            slot += TILE;
            if (slot % SEC == 0) break;
            continue;
        }
        int64_t first = src[cur];
        if (block_first < 0) block_first = first;
        int64_t block_base = (block_first / SLICE) * SLICE;
        if (out && slot % BLK == 0) out->sb[b] = (int32_t)(block_first / SLICE);
        if (first - block_base > block_span) {
            if (out) {
                out->ws[t] = 0;
                for (int64_t i = 0; i < TILE; i++) {
                    out->widx[slot + i] = (uint16_t)((i >> 7) << 7);
                    out->keys[slot + i] = (int32_t)MID;
                    if (out->wvals) out->wvals[slot + i] = 0.0f;
                }
                if (lead) out->keys[slot] = -1;
            }
            slot += TILE;
            continue;
        }
        int64_t hi_span = first + span_budget;
        int64_t hs2 = block_base + block_span;
        if (hs2 < hi_span) hi_span = hs2;
        // hi = upper_bound(src, hi_span)
        int64_t lo = cur, hi = m_i;
        while (lo < hi) {
            int64_t mid = (lo + hi) >> 1;
            if (src[mid] <= hi_span) lo = mid + 1; else hi = mid;
        }
        int64_t k = lo - cur;
        int64_t cap = TILE - lead;
        if (k > cap) k = cap;
        int64_t first_local = first - block_base;
        int64_t ws_t = (first_local / 1024) * 1024;
        int64_t wmax = nslices * SLICE - win;
        if (ws_t > wmax) ws_t = wmax;
        // ---- row-match decision (identical in count and fill modes)
        bool use_rm = false;
        if (rm_allowed) {
            int64_t capc[8] = {128 - lead, 128, 128, 128,
                               128, 128, 128, 128};
            int64_t cnt[8] = {0, 0, 0, 0, 0, 0, 0, 0};
            int64_t k_rm = k;
            for (int64_t i = 0; i < k; i++) {
                int64_t r3 = ((src[cur + i] - block_base - ws_t) >> 7) & 7;
                if (cnt[r3] == capc[r3]) { k_rm = i; break; }
                cnt[r3]++;
            }
            if (k_rm > 0) {
                int64_t rows =
                    (src[cur + k - 1] - block_base - ws_t) / 128 + 1;
                int64_t saved = rows - (rows + 7) / 8;
                if (k_rm * saved >= (k - k_rm) * WIN_COST_RATIO) {
                    use_rm = true;
                    k = k_rm;
                }
            }
            if (!use_rm) rm_allowed = false;
        }
        if (!use_rm) block_rm = false;
        if (!out && rowcost) {
            int64_t rows = (src[cur + k - 1] - block_base - ws_t) / 128 + 1;
            if (rows > block_rows) block_rows = rows;
        }
        if (out) {
            int64_t base = block_base;
            out->ws[t] = (int32_t)ws_t;
            for (int64_t i = 0; i < TILE; i++) {
                out->widx[slot + i] = (uint16_t)((i >> 7) << 7);
                out->keys[slot + i] = (int32_t)MID;
                if (out->wvals) out->wvals[slot + i] = 0.0f;
            }
            if (lead) out->keys[slot] = -1;
            if (use_rm) {
                int64_t rcnt[8] = {lead, 0, 0, 0, 0, 0, 0, 0};
                for (int64_t i = 0; i < k; i++) {
                    int64_t idx = src[cur + i] - base - ws_t;
                    int64_t r3 = (idx >> 7) & 7;
                    int64_t p = r3 * 128 + rcnt[r3]++;
                    out->widx[slot + p] = (uint16_t)idx;
                    out->keys[slot + p] = (int32_t)dstl[cur + i];
                    if (out->wvals) out->wvals[slot + p] = val[cur + i];
                }
            } else {
                for (int64_t i = 0; i < k; i++) {
                    out->widx[slot + lead + i] =
                        (uint16_t)(src[cur + i] - base - ws_t);
                    out->keys[slot + lead + i] = (int32_t)dstl[cur + i];
                    if (out->wvals) out->wvals[slot + lead + i] = val[cur + i];
                }
            }
        }
        cur += k;
        slot += TILE;
    }
    if (rowcost && slot > slot0)  // flush the last block
        flush_rowcost();
    return slot;
}

}  // namespace

extern "C" {

struct GtLayout {
    int64_t nslots;
    int64_t nmid;
    int64_t win;
    int64_t nslices;
    uint16_t* widx;
    int32_t* keys;
    float* wvals;
    int32_t* ws;
    int32_t* sb;
    int32_t* sec_mid;
};

// src/dst: (m,) int64; values: (m,) float or nullptr; n: node count
// of the reduce (dst) domain; n_src: gather-domain size for
// rectangular plans (0 = square, n_src == n).
// Sorts by (mid, src) internally (radix), lays out slots, returns a
// malloc'd GtLayout (free with gt_layout_free).
// win == 0 selects the window automatically (count slots per candidate,
// pick the cost-model argmin).
GtLayout* gt_build_layout(const int64_t* src, const int64_t* dst,
                          const float* values, int64_t m, int64_t n,
                          int64_t win, int64_t nslices, int64_t n_src,
                          int nthreads) {
    int64_t nmid = (n + MID - 1) / MID;
    if (nmid < 1) nmid = 1;
    if (n_src <= 0) n_src = n;

    // ---- stable sort edge ids by (mid, src): LSD radix over src
    // (3 x 11-bit passes cover src < 2^33) then counting by mid.
    std::vector<int64_t> ids(m), tmp(m);
    for (int64_t i = 0; i < m; i++) ids[i] = i;
    {
        int src_bits = 1;
        while ((n_src - 1) >> src_bits) src_bits++;
        for (int shift = 0; shift < src_bits; shift += 11) {
            std::vector<int64_t> cnt(2049, 0);
            for (int64_t i = 0; i < m; i++)
                cnt[((src[ids[i]] >> shift) & 2047) + 1]++;
            for (int k = 1; k <= 2048; k++) cnt[k] += cnt[k - 1];
            for (int64_t i = 0; i < m; i++)
                tmp[cnt[(src[ids[i]] >> shift) & 2047]++] = ids[i];
            ids.swap(tmp);
        }
        std::vector<int64_t> cnt(nmid + 1, 0);
        for (int64_t i = 0; i < m; i++) cnt[dst[ids[i]] / MID + 1]++;
        for (int64_t k = 1; k <= nmid; k++) cnt[k] += cnt[k - 1];
        for (int64_t i = 0; i < m; i++) tmp[cnt[dst[ids[i]] / MID]++] = ids[i];
        ids.swap(tmp);
    }
    std::vector<int64_t> src_s(m), dstl_s(m);
    std::vector<float> val_s(values ? m : 0);
    std::vector<int64_t> mid_start(nmid + 1, 0);
    for (int64_t i = 0; i < m; i++) {
        int64_t e = ids[i];
        src_s[i] = src[e];
        int64_t mid = dst[e] / MID;
        dstl_s[i] = dst[e] - mid * MID;
        if (values) val_s[i] = values[e];
        mid_start[mid + 1]++;
    }
    for (int64_t k = 1; k <= nmid; k++) mid_start[k] += mid_start[k - 1];

    // ---- pass 1: count slots per mid (parallel over mids); win == 0
    // counts all candidates and picks the cost-model argmin.
    std::vector<int64_t> mid_slots(nmid);
    if (win && !nslices) nslices = NSLICES;
    {
        int ncand = win ? 1 : 6;
        std::vector<std::vector<int64_t>> counts(
            ncand, std::vector<int64_t>(nmid));
        std::vector<std::vector<int64_t>> rowcosts(
            ncand, std::vector<int64_t>(nmid, 0));
        std::atomic<int64_t> next{0};
        auto worker = [&]() {
            for (;;) {
                int64_t mi = next.fetch_add(1);
                if (mi >= nmid) return;
                int64_t lo = mid_start[mi];
                for (int c = 0; c < ncand; c++) {
                    int64_t w = win ? win : WIN_CANDIDATES[c];
                    int64_t ns = win ? nslices : NSLICE_CANDIDATES[c];
                    counts[c][mi] = layout_mid(src_s.data() + lo,
                                               dstl_s.data() + lo, nullptr,
                                               mid_start[mi + 1] - lo, 0,
                                               nullptr, w, ns,
                                               &rowcosts[c][mi]);
                }
            }
        };
        std::vector<std::thread> pool;
        for (int t = 0; t < nthreads; t++) pool.emplace_back(worker);
        for (auto& th : pool) th.join();
        if (!win) {
            // cost = fixed per-slot work + the per-BLOCK window-class
            // scan rows actually paid (engine._k1_classes), not the
            // graph-max window — a wide window is nearly free for
            // blocks with tight spans, so pad is no longer bought to
            // shrink windows the scan never runs.
            int64_t cost[6], nsl[6], cmin = -1;
            for (int c = 0; c < ncand; c++) {
                nsl[c] = 0;
                int64_t rc = 0;
                for (int64_t mi = 0; mi < nmid; mi++) {
                    nsl[c] += counts[c][mi];
                    rc += rowcosts[c][mi];
                }
                cost[c] = nsl[c] * WIN_COST_RATIO + rc;
                if (cmin < 0 || cost[c] < cmin) cmin = cost[c];
            }
            // within 5% of the minimum (over win <= 16384 candidates),
            // prefer fewest slots (less pad)
            int best = 0;
            int64_t best_ns = -1;
            cmin = -1;
            for (int c = 0; c < ncand; c++)
                if (WIN_CANDIDATES[c] <= 16384 &&
                    (cmin < 0 || cost[c] < cmin))
                    cmin = cost[c];
            for (int c = 0; c < ncand; c++) {
                if (WIN_CANDIDATES[c] > 16384) continue;
                // fewest slots; on ties prefer fewer staged slices
                if (cost[c] * 20 <= cmin * 21 &&
                    (best_ns < 0 || nsl[c] < best_ns ||
                     (nsl[c] == best_ns &&
                      NSLICE_CANDIDATES[c] < NSLICE_CANDIDATES[best]))) {
                    best = c;
                    best_ns = nsl[c];
                }
            }
            // The 32768 window only pays when it removes substantial
            // pad: its wider K1 classes cost ~+0.01 ns/slot while a
            // slot costs ~0.15 ns end to end — breakeven ~7% fewer
            // slots (mirrors plan.py pick_win; measured v8 scale 22
            // vs 24).
            for (int c = 0; c < ncand; c++)
                if (WIN_CANDIDATES[c] > 16384 &&
                    nsl[c] * 100 < 93 * best_ns)
                    { best = c; best_ns = nsl[c]; }
            win = WIN_CANDIDATES[best];
            nslices = NSLICE_CANDIDATES[best];
            mid_slots = counts[best];
        } else {
            mid_slots = counts[0];
        }
    }
    std::vector<int64_t> slot_off(nmid + 1, 0);
    for (int64_t k = 0; k < nmid; k++) slot_off[k + 1] = slot_off[k] + mid_slots[k];
    int64_t nslots = slot_off[nmid];

    auto* L = (GtLayout*)std::calloc(1, sizeof(GtLayout));
    L->nslots = nslots;
    L->nmid = nmid;
    L->win = win;
    L->nslices = nslices;
    L->widx = (uint16_t*)std::malloc(nslots * sizeof(uint16_t));
    L->keys = (int32_t*)std::malloc(nslots * sizeof(int32_t));
    L->wvals = values ? (float*)std::malloc(nslots * sizeof(float)) : nullptr;
    L->ws = (int32_t*)std::malloc(nslots / TILE * sizeof(int32_t));
    L->sb = (int32_t*)std::malloc(nslots / BLK * sizeof(int32_t));
    L->sec_mid = (int32_t*)std::malloc(nslots / SEC * sizeof(int32_t));

    // ---- pass 2: fill (parallel over mids; disjoint output ranges)
    {
        std::atomic<int64_t> next{0};
        auto worker = [&]() {
            for (;;) {
                int64_t mi = next.fetch_add(1);
                if (mi >= nmid) return;
                int64_t lo = mid_start[mi];
                int64_t s0 = slot_off[mi];
                Layout view;
                view.nslots = nslots;
                view.widx = L->widx;
                view.keys = L->keys;
                view.wvals = L->wvals;
                view.ws = L->ws;
                view.sb = L->sb;
                layout_mid(src_s.data() + lo, dstl_s.data() + lo,
                           values ? val_s.data() + lo : nullptr,
                           mid_start[mi + 1] - lo, s0, &view, win, nslices);
                for (int64_t s = s0 / SEC; s < slot_off[mi + 1] / SEC; s++)
                    L->sec_mid[s] = (int32_t)mi;
            }
        };
        std::vector<std::thread> pool;
        for (int t = 0; t < nthreads; t++) pool.emplace_back(worker);
        for (auto& th : pool) th.join();
    }
    return L;
}

void gt_layout_free(GtLayout* L) {
    if (!L) return;
    std::free(L->widx);
    std::free(L->keys);
    std::free(L->wvals);
    std::free(L->ws);
    std::free(L->sb);
    std::free(L->sec_mid);
    std::free(L);
}
}
