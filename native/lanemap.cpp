// Native lanemap tile packing for graph_tpu.
//
// C++ port of graph_tpu/engine/lanemap.py::lanemap_pack — the
// plan-build pass that permutes slots within each 1024-slot tile so
// every (VREG row, window lane) pair maps to a single window row,
// letting K1 gather a whole 8-row window group with one sublane +
// one lane take_along_axis (kernels.py mode="lanemap").  The pure
// python pass costs ~9 s at scale 19 (~20 min at scale 22); this port
// keeps plan builds device-bound.
//
// Mutates widx / keys / wvals in place (only for blocks where all 16
// tiles fit) and writes the per-block success mask to lm_out.  The
// greedy packing and all tie-breaks mirror the python reference
// exactly (groups by count desc then key asc; candidate rows by free
// capacity desc then row asc; members in original slot order), so a
// plan built natively matches one built in python bit for bit.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 -pthread lanemap.cpp

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int64_t TILE = 1024;
constexpr int64_t TPB = 16;
constexpr int64_t BLK = TILE * TPB;
constexpr int32_t MID = 65536;  // tail-pad key (kernels.py MID)
constexpr int ROWS = 8;
constexpr int LANES = 128;

struct Span {
    int row;
    int take;
};

struct TileResult {
    // staged rewrite for one tile (valid only if the whole block fits)
    int16_t table[ROWS * LANES];     // row table, -1 = unused
    int16_t perm_src[TILE];          // original position of placed slot
    int16_t perm_dst[TILE];          // its new position
    int nplaced;
    int lead;                        // original lead-pad count (0/1+)
};

// Pack one tile: pos[k] window positions (< win), real[k] original
// positions.  Returns false when the tile cannot lanemap.
bool pack_tile(const uint16_t* pos, const int16_t* real, int k,
               TileResult* out) {
    // group slots by key = lane*512 + row (lane = pos & 127,
    // row = pos >> 7 < 512); stable sort of (key, original order)
    // reproduces np.unique group order (key asc) and in-group
    // original-slot order.
    int16_t sorted_real[TILE];
    uint32_t key[TILE];
    {
        int16_t idx[TILE];
        for (int i = 0; i < k; i++) idx[i] = (int16_t)i;
        uint32_t kv[TILE];
        for (int i = 0; i < k; i++) {
            uint32_t p = pos[i];
            kv[i] = ((p & 127) << 9) | (p >> 7);
        }
        std::stable_sort(idx, idx + k,
                         [&](int16_t a, int16_t b) { return kv[a] < kv[b]; });
        for (int i = 0; i < k; i++) {
            sorted_real[i] = real[idx[i]];
            key[i] = kv[idx[i]];
        }
    }
    // (kv packs lane << 9 | row; row uses 9 bits so win up to 65536
    // round-trips — the emitted widx stores the table << 7 instead)
    // group boundaries
    int g_start[TILE + 1];
    int g_lane[TILE], g_row[TILE], g_count[TILE];
    int ng = 0;
    for (int i = 0; i < k;) {
        int j = i + 1;
        while (j < k && key[j] == key[i]) j++;
        g_start[ng] = i;
        g_lane[ng] = (int)(key[i] >> 9);
        g_row[ng] = (int)(key[i] & 511);
        g_count[ng] = j - i;
        ng++;
        i = j;
    }
    g_start[ng] = k;
    // per-lane distinct-row check
    {
        int per_lane[LANES] = {0};
        for (int g = 0; g < ng; g++)
            if (++per_lane[g_lane[g]] > ROWS) return false;
    }
    // greedy: big groups first (stable by key asc, i.e. group index)
    int order[TILE];
    for (int g = 0; g < ng; g++) order[g] = g;
    std::stable_sort(order, order + ng,
                     [&](int a, int b) { return g_count[a] > g_count[b]; });

    int16_t(&table)[ROWS * LANES] = out->table;
    std::memset(table, 0xff, sizeof(out->table));  // -1 everywhere
    int cap[ROWS];
    for (int r = 0; r < ROWS; r++) cap[r] = LANES;
    Span spans[TILE][ROWS > 8 ? ROWS : 8];  // per group, <= 8 spans
    int nspan[TILE];
    for (int oi = 0; oi < ng; oi++) {
        int g = order[oi];
        int l = g_lane[g], h = g_row[g], c = g_count[g];
        // candidate rows whose lane-l entry is free, snapshotted now,
        // visited by capacity desc then row asc
        int cand[ROWS], nc = 0;
        for (int r = 0; r < ROWS; r++)
            if (table[r * LANES + l] == -1) cand[nc++] = r;
        std::stable_sort(cand, cand + nc,
                         [&](int a, int b) { return cap[a] > cap[b]; });
        int ns = 0;
        for (int ci = 0; ci < nc && c > 0; ci++) {
            int r = cand[ci];
            if (cap[r] == 0) continue;
            int take = cap[r] < c ? cap[r] : c;
            spans[g][ns].row = r;
            spans[g][ns].take = take;
            ns++;
            table[r * LANES + l] = (int16_t)h;
            cap[r] -= take;
            c -= take;
        }
        if (c) return false;
        nspan[g] = ns;
    }
    // place: groups in key order, members in original order
    int row_ptr[ROWS] = {0};
    int outp = 0;
    for (int g = 0; g < ng; g++) {
        int at = g_start[g];
        for (int s = 0; s < nspan[g]; s++) {
            int r = spans[g][s].row, take = spans[g][s].take;
            for (int i = 0; i < take; i++) {
                out->perm_src[outp] = sorted_real[at + i];
                out->perm_dst[outp] = (int16_t)(r * LANES + row_ptr[r] + i);
                outp++;
            }
            row_ptr[r] += take;
            at += take;
        }
    }
    out->nplaced = outp;
    return true;
}

// Process one block; returns 1 and rewrites its 16 tiles when every
// tile fits, else 0 (block untouched).
int pack_block(uint16_t* widx, int32_t* keys, float* wvals) {
    TileResult res[TPB];
    for (int t = 0; t < TPB; t++) {
        const int32_t* kt = keys + t * TILE;
        const uint16_t* wt = widx + t * TILE;
        uint16_t pos[TILE];
        int16_t real[TILE];
        int k = 0, lead = 0;
        for (int i = 0; i < TILE; i++) {
            int32_t kv = kt[i];
            if (kv >= 0 && kv < MID) {
                pos[k] = wt[i];
                real[k] = (int16_t)i;
                k++;
            } else if (kv == -1) {
                lead++;
            }
        }
        res[t].lead = lead;
        res[t].nplaced = 0;
        if (k == 0) {
            std::memset(res[t].table, 0xff, sizeof(res[t].table));
            continue;
        }
        if (!pack_tile(pos, real, k, &res[t])) return 0;
    }
    for (int t = 0; t < TPB; t++) {
        int32_t* kt = keys + t * TILE;
        uint16_t* wt = widx + t * TILE;
        float* vt = wvals ? wvals + t * TILE : nullptr;
        uint16_t new_w[TILE];
        int32_t new_k[TILE];
        float new_v[TILE];
        bool used[TILE];
        for (int i = 0; i < TILE; i++) {
            int16_t h = res[t].table[i];
            new_w[i] = (uint16_t)((h < 0 ? 0 : h) << 7);
            new_k[i] = MID;
            used[i] = false;
        }
        if (vt)
            for (int i = 0; i < TILE; i++) new_v[i] = 0.0f;
        for (int i = 0; i < res[t].nplaced; i++) {
            int s = res[t].perm_src[i], d = res[t].perm_dst[i];
            new_w[d] |= (uint16_t)(wt[s] & 127);
            new_k[d] = kt[s];
            if (vt) new_v[d] = vt[s];
            used[d] = true;
        }
        if (res[t].lead) {  // keep the section's lead pad in its tile
            for (int i = 0; i < TILE; i++)
                if (!used[i]) {
                    new_k[i] = -1;
                    break;
                }
        }
        std::memcpy(wt, new_w, sizeof(new_w));
        std::memcpy(kt, new_k, sizeof(new_k));
        if (vt) std::memcpy(vt, new_v, sizeof(new_v));
    }
    return 1;
}

// ---- two-table variant (round 4; mirrors lanemap.py::lanemap2_pack)

struct Span2 {
    int row;
    int take;
    int tab;
};

struct TileResult2 {
    int16_t table1[ROWS * LANES];
    int16_t table2[ROWS * LANES];
    int16_t perm_src[TILE];
    int16_t perm_dst[TILE];
    uint8_t sel[TILE];
    int nplaced;
    int lead;
};

// Pack one tile with TWO row-table entries per (row, lane).  Table-2
// entries are 8-bit (win <= 32768 callers only).  Greedy order and all
// tie-breaks mirror lanemap.py::_pack_tile2 bit for bit.
bool pack_tile2(const uint16_t* pos, const int16_t* real, int k,
                TileResult2* out) {
    int16_t sorted_real[TILE];
    uint32_t key[TILE];
    {
        int16_t idx[TILE];
        for (int i = 0; i < k; i++) idx[i] = (int16_t)i;
        uint32_t kv[TILE];
        for (int i = 0; i < k; i++) {
            uint32_t p = pos[i];
            kv[i] = ((p & 127) << 9) | (p >> 7);
        }
        std::stable_sort(idx, idx + k,
                         [&](int16_t a, int16_t b) { return kv[a] < kv[b]; });
        for (int i = 0; i < k; i++) {
            sorted_real[i] = real[idx[i]];
            key[i] = kv[idx[i]];
        }
    }
    int g_start[TILE + 1];
    int g_lane[TILE], g_row[TILE], g_count[TILE];
    int ng = 0;
    for (int i = 0; i < k;) {
        int j = i + 1;
        while (j < k && key[j] == key[i]) j++;
        g_start[ng] = i;
        g_lane[ng] = (int)(key[i] >> 9);
        g_row[ng] = (int)(key[i] & 511);
        if (g_row[ng] > 255) return false;  // uint8 table-2 stream
        g_count[ng] = j - i;
        ng++;
        i = j;
    }
    g_start[ng] = k;
    {
        int per_lane[LANES] = {0};
        for (int g = 0; g < ng; g++)
            if (++per_lane[g_lane[g]] > 2 * ROWS) return false;
    }
    int order[TILE];
    for (int g = 0; g < ng; g++) order[g] = g;
    std::stable_sort(order, order + ng,
                     [&](int a, int b) { return g_count[a] > g_count[b]; });

    int16_t(&t1)[ROWS * LANES] = out->table1;
    int16_t(&t2)[ROWS * LANES] = out->table2;
    std::memset(t1, 0xff, sizeof(out->table1));
    std::memset(t2, 0xff, sizeof(out->table2));
    int cap[ROWS];
    for (int r = 0; r < ROWS; r++) cap[r] = LANES;
    Span2 spans[TILE][2 * ROWS > 16 ? 2 * ROWS : 16];
    int nspan[TILE];
    for (int oi = 0; oi < ng; oi++) {
        int g = order[oi];
        int l = g_lane[g], h = g_row[g], c = g_count[g];
        int cand[ROWS], nc = 0;
        for (int r = 0; r < ROWS; r++)
            if (t1[r * LANES + l] == -1 || t2[r * LANES + l] == -1)
                cand[nc++] = r;
        std::stable_sort(cand, cand + nc,
                         [&](int a, int b) { return cap[a] > cap[b]; });
        int ns = 0;
        for (int ci = 0; ci < nc && c > 0; ci++) {
            int r = cand[ci];
            if (cap[r] == 0) continue;
            int tab = (t1[r * LANES + l] == -1) ? 0 : 1;
            int take = cap[r] < c ? cap[r] : c;
            spans[g][ns].row = r;
            spans[g][ns].take = take;
            spans[g][ns].tab = tab;
            ns++;
            (tab == 0 ? t1 : t2)[r * LANES + l] = (int16_t)h;
            cap[r] -= take;
            c -= take;
        }
        if (c) return false;
        nspan[g] = ns;
    }
    int row_ptr[ROWS] = {0};
    int outp = 0;
    for (int g = 0; g < ng; g++) {
        int at = g_start[g];
        for (int s = 0; s < nspan[g]; s++) {
            int r = spans[g][s].row, take = spans[g][s].take;
            int tab = spans[g][s].tab;
            for (int i = 0; i < take; i++) {
                out->perm_src[outp] = sorted_real[at + i];
                out->perm_dst[outp] = (int16_t)(r * LANES + row_ptr[r] + i);
                out->sel[outp] = (uint8_t)tab;
                outp++;
            }
            row_ptr[r] += take;
            at += take;
        }
    }
    out->nplaced = outp;
    return true;
}

int pack_block2(uint16_t* widx, int32_t* keys, float* wvals, uint8_t* wt2) {
    std::vector<TileResult2> res(TPB);
    for (int t = 0; t < TPB; t++) {
        const int32_t* kt = keys + t * TILE;
        const uint16_t* wt = widx + t * TILE;
        uint16_t pos[TILE];
        int16_t real[TILE];
        int k = 0, lead = 0;
        for (int i = 0; i < TILE; i++) {
            int32_t kv = kt[i];
            if (kv >= 0 && kv < MID) {
                pos[k] = wt[i];
                real[k] = (int16_t)i;
                k++;
            } else if (kv == -1) {
                lead++;
            }
        }
        res[t].lead = lead;
        res[t].nplaced = 0;
        if (k == 0) {
            std::memset(res[t].table1, 0xff, sizeof(res[t].table1));
            std::memset(res[t].table2, 0xff, sizeof(res[t].table2));
            continue;
        }
        if (!pack_tile2(pos, real, k, &res[t])) return 0;
    }
    for (int t = 0; t < TPB; t++) {
        int32_t* kt = keys + t * TILE;
        uint16_t* wt = widx + t * TILE;
        float* vt = wvals ? wvals + t * TILE : nullptr;
        uint8_t* w2t = wt2 + t * TILE;
        uint16_t new_w[TILE];
        int32_t new_k[TILE];
        float new_v[TILE];
        bool used[TILE];
        for (int i = 0; i < TILE; i++) {
            int16_t h1 = res[t].table1[i];
            int16_t h2 = res[t].table2[i];
            new_w[i] = (uint16_t)((h1 < 0 ? 0 : h1) << 7);
            w2t[i] = (uint8_t)(h2 < 0 ? 0 : h2);
            new_k[i] = MID;
            used[i] = false;
        }
        if (vt)
            for (int i = 0; i < TILE; i++) new_v[i] = 0.0f;
        for (int i = 0; i < res[t].nplaced; i++) {
            int s = res[t].perm_src[i], d = res[t].perm_dst[i];
            new_w[d] |= (uint16_t)((wt[s] & 127)
                                   | ((uint16_t)res[t].sel[i] << 15));
            new_k[d] = kt[s];
            if (vt) new_v[d] = vt[s];
            used[d] = true;
        }
        if (res[t].lead) {
            for (int i = 0; i < TILE; i++)
                if (!used[i]) {
                    new_k[i] = -1;
                    break;
                }
        }
        std::memcpy(wt, new_w, sizeof(new_w));
        std::memcpy(kt, new_k, sizeof(new_k));
        if (vt) std::memcpy(vt, new_v, sizeof(new_v));
    }
    return 1;
}

}  // namespace

extern "C" int gt_lanemap2_pack(uint16_t* widx, int32_t* keys, float* wvals,
                                int64_t nslots, int64_t win,
                                const uint8_t* skip, uint8_t* lm2_out,
                                uint8_t* wt2_out, int nthreads) {
    if (win > 32768 || nslots % BLK) return -1;  // uint8 table-2 stream
    int64_t nblocks = nslots / BLK;
    if (nthreads < 1) nthreads = 1;
    if (nthreads > nblocks) nthreads = (int)(nblocks ? nblocks : 1);
    std::atomic<int64_t> next(0);
    auto work = [&]() {
        for (;;) {
            int64_t b = next.fetch_add(1);
            if (b >= nblocks) return;
            if (skip[b]) {
                lm2_out[b] = 0;
                continue;
            }
            lm2_out[b] = (uint8_t)pack_block2(
                widx + b * BLK, keys + b * BLK,
                wvals ? wvals + b * BLK : nullptr, wt2_out + b * BLK);
        }
    };
    std::vector<std::thread> pool;
    for (int i = 1; i < nthreads; i++) pool.emplace_back(work);
    work();
    for (auto& th : pool) th.join();
    return 0;
}

extern "C" int gt_lanemap_pack(uint16_t* widx, int32_t* keys, float* wvals,
                               int64_t nslots, int64_t win, uint8_t* lm_out,
                               int nthreads) {
    // 9-bit row table (table << 7 at bits 7..15): win up to 65536
    if (win > 65536 || nslots % BLK) return -1;
    int64_t nblocks = nslots / BLK;
    if (nthreads < 1) nthreads = 1;
    if (nthreads > nblocks) nthreads = (int)(nblocks ? nblocks : 1);
    std::atomic<int64_t> next(0);
    auto work = [&]() {
        for (;;) {
            int64_t b = next.fetch_add(1);
            if (b >= nblocks) return;
            lm_out[b] = (uint8_t)pack_block(
                widx + b * BLK, keys + b * BLK,
                wvals ? wvals + b * BLK : nullptr);
        }
    };
    if (nthreads == 1) {
        work();
    } else {
        std::vector<std::thread> ts;
        for (int i = 0; i < nthreads; i++) ts.emplace_back(work);
        for (auto& t : ts) t.join();
    }
    return 0;
}
