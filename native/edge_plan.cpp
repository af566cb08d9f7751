// Native EdgePlan section routing for graph_tpu.
//
// Per 64K-slot section this computes what the reference resolves at
// runtime with atomic CAS (crates/algos/src/dss.rs:148-150) and what
// graph_tpu/engine/route.py computes in python: a stable sort of the
// section by destination key, TWO Clos/Benes stage decompositions via
// recursive Euler-split bipartite edge coloring (route 1: slot order ->
// destination-sorted; route 2: segment-end positions -> destination
// output positions, with a per-output present bit), and the segment
// start positions for the in-kernel segmented scan.  Layout must match
// graph_tpu/engine/plan.py and kernels.py (SEC=65536, R=512, R1=4,
// MID=65536).  (Window selection lives in edge_layout.cpp.)
//
// Build: g++ -O3 -shared -fPIC -std=c++17 -pthread edge_plan.cpp

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int SEC = 65536;
constexpr int R = 512;
constexpr int R1 = 4;  // R / 128
constexpr int MID = 65536;

struct Scratch {
    // euler split / coloring scratch, sized for the largest call
    std::vector<int32_t> ladj, radj, lcnt, rcnt, lptr, rptr;
    std::vector<uint8_t> used, half;
    std::vector<int32_t> sub_ids[2];
    std::vector<int32_t> ids_stack;  // flattened recursion buffers
    // section-level
    std::vector<int32_t> order, target, cnt;
    std::vector<int32_t> l_buf, r_buf, ids0;
    std::vector<uint8_t> color;
    std::vector<int32_t> qinv;
    std::vector<uint8_t> color2;
    std::vector<int32_t> l2, r2, ids2;
};

// Split a d-regular bipartite multigraph (nodes [0,n) on both sides,
// edges ids[0..e) indexing l/r) into two d/2-regular halves.
void euler_split(const int32_t* l, const int32_t* r, int n, int d,
                 const int32_t* ids, int e, uint8_t* half_out, Scratch& s) {
    s.ladj.assign((size_t)n * d, 0);
    s.radj.assign((size_t)n * d, 0);
    s.lcnt.assign(n, 0);
    s.rcnt.assign(n, 0);
    for (int i = 0; i < e; i++) {
        int32_t eid = ids[i];
        s.ladj[(size_t)l[eid] * d + s.lcnt[l[eid]]++] = i;
        s.radj[(size_t)r[eid] * d + s.rcnt[r[eid]]++] = i;
    }
    s.used.assign(e, 0);
    s.lptr.assign(n, 0);
    s.rptr.assign(n, 0);
    for (int i0 = 0; i0 < e; i0++) {
        if (s.used[i0]) continue;
        int i = i0;
        uint8_t h = 0;
        for (;;) {
            s.used[i] = 1;
            half_out[i] = h;
            h ^= 1;
            int rn = r[ids[i]];
            int32_t* rp = &s.rptr[rn];
            while (*rp < d && s.used[s.radj[(size_t)rn * d + *rp]]) (*rp)++;
            if (*rp == d) break;
            i = s.radj[(size_t)rn * d + *rp];
            s.used[i] = 1;
            half_out[i] = h;
            h ^= 1;
            int ln = l[ids[i]];
            int32_t* lp = &s.lptr[ln];
            while (*lp < d && s.used[s.ladj[(size_t)ln * d + *lp]]) (*lp)++;
            if (*lp == d) break;
            i = s.ladj[(size_t)ln * d + *lp];
        }
    }
}

// d-edge-coloring (d = power of two) by recursive Euler splits.
// colors[eid] gets a value in [0, d).
void edge_color(const int32_t* l, const int32_t* r, int n, int d,
                int32_t* ids, int e, uint8_t* colors, Scratch& s,
                std::vector<uint8_t>& half_buf) {
    if (d == 1) {
        for (int i = 0; i < e; i++) colors[ids[i]] = 0;
        return;
    }
    half_buf.resize(e);
    euler_split(l, r, n, d, ids, e, half_buf.data(), s);
    // stable partition ids by half (in place using a temp)
    std::vector<int32_t> tmp(e);
    int n0 = 0;
    for (int i = 0; i < e; i++)
        if (half_buf[i] == 0) tmp[n0++] = ids[i];
    int n1 = n0;
    for (int i = 0; i < e; i++)
        if (half_buf[i] == 1) tmp[n1++] = ids[i];
    std::memcpy(ids, tmp.data(), sizeof(int32_t) * e);
    std::vector<uint8_t> hb2;
    edge_color(l, r, n, d / 2, ids, n0, colors, s, hb2);
    for (int i = 0; i < n0; i++) colors[ids[i]] = colors[ids[i]] * 2 + 0;
    edge_color(l, r, n, d / 2, ids + n0, e - n0, colors, s, hb2);
    for (int i = n0; i < e; i++) colors[ids[i]] = colors[ids[i]] * 2 + 1;
}

// Clos/Benes-decompose one permutation (target[i] = output position of
// input position i) and pack the stages into wa/wb.  flags (SEC uint16
// of 0/1, may be null) sets bit 15 of wa at its own array position —
// the kernel reads it at the input layout for route 1 (pad bit) and at
// the output layout for route 2 (present bit), so the caller indexes
// flags accordingly.
void route_perm(const int32_t* target, const uint16_t* flags,
                uint16_t* wa, uint16_t* wb, Scratch& s) {
    // ---- outer Clos: grid (R=512 rows, 128 cols)
    s.l_buf.resize(SEC);
    s.r_buf.resize(SEC);
    s.ids0.resize(SEC);
    s.color.assign(SEC, 0);
    for (int i = 0; i < SEC; i++) {
        s.l_buf[i] = i >> 7;
        s.r_buf[i] = target[i] >> 7;
        s.ids0[i] = i;
    }
    std::vector<uint8_t> hb;
    edge_color(s.l_buf.data(), s.r_buf.data(), R, 128, s.ids0.data(), SEC,
               s.color.data(), s, hb);

    // A at input layout, E at output layout
    std::vector<uint8_t> A(SEC), E(SEC);
    for (int i = 0; i < SEC; i++) {
        int r_in = i >> 7, c_in = i & 127, k = s.color[i];
        int t = target[i];
        A[(size_t)r_in * 128 + k] = (uint8_t)c_in;
        E[(size_t)(t >> 7) * 128 + (t & 127)] = (uint8_t)k;
    }
    for (int i = 0; i < SEC; i++)
        wa[i] = (uint16_t)A[i] | ((uint16_t)E[i] << 7);
    if (flags) {
        for (int i = 0; i < SEC; i++)
            wa[i] |= (uint16_t)(flags[i] ? 1 : 0) << 15;
    }

    // ---- inner routes, one per intermediate column
    // qinv_all[col][r_in] = r_out, one pass (each row has each color once)
    s.qinv.resize((size_t)128 * R);
    for (int i = 0; i < SEC; i++)
        s.qinv[(size_t)s.color[i] * R + (i >> 7)] = target[i] >> 7;
    s.color2.assign(R, 0);
    s.l2.resize(R);
    s.r2.resize(R);
    s.ids2.resize(R);
    std::vector<uint8_t> B(SEC), C(SEC), D(SEC);
    for (int col = 0; col < 128; col++) {
        const int32_t* qinv = &s.qinv[(size_t)col * R];
        for (int v = 0; v < R; v++) {
            s.l2[v] = v >> 7;            // g_in
            s.r2[v] = qinv[v] >> 7;      // g_out
            s.ids2[v] = v;
        }
        edge_color(s.l2.data(), s.r2.data(), R1, 128, s.ids2.data(), R,
                   s.color2.data(), s, hb);
        for (int v = 0; v < R; v++) {
            int g_in = v >> 7, lane_in = v & 127;
            int t = qinv[v];
            int g_out = t >> 7, lane_out = t & 127;
            int k2 = s.color2[v];
            B[((size_t)col * R1 + g_in) * 128 + k2] = (uint8_t)lane_in;
            C[((size_t)col * R1 + g_out) * 128 + k2] = (uint8_t)g_in;
            D[((size_t)col * R1 + g_out) * 128 + lane_out] = (uint8_t)k2;
        }
    }
    for (int i = 0; i < SEC; i++)
        wb[i] = (uint16_t)B[i] | ((uint16_t)C[i] << 7) | ((uint16_t)D[i] << 9);
}

// Route one section. keys: SEC int32 (-1 lead pad, MID tail pad).
void build_one_section(const int32_t* keys, uint16_t* wa, uint16_t* wb,
                       uint16_t* sstart, uint16_t* wa2, uint16_t* wb2,
                       Scratch& s) {
    // ---- stable counting sort by key (+1 -> [0, MID+2))
    s.cnt.assign(MID + 3, 0);
    for (int i = 0; i < SEC; i++) s.cnt[keys[i] + 2]++;
    for (int k = 1; k < MID + 3; k++) s.cnt[k] += s.cnt[k - 1];
    // cnt[k+1] is now inclusive prefix; build target (input -> sorted pos)
    s.target.resize(SEC);
    {
        std::vector<int32_t> cursor(s.cnt.begin(), s.cnt.end() - 1);
        for (int i = 0; i < SEC; i++) {
            int32_t t = cursor[keys[i] + 1]++;
            s.target[i] = t;
            // first sorted position of this key = segment start
            sstart[t] = (uint16_t)s.cnt[keys[i] + 1];
        }
    }

    // ---- route 1: slot order -> destination-sorted; pad bit at input
    std::vector<uint16_t> flags(SEC);
    for (int i = 0; i < SEC; i++)
        flags[i] = (keys[i] == -1 || keys[i] == MID) ? 1 : 0;
    route_perm(s.target.data(), flags.data(), wa, wb, s);

    // ---- route 2: segment-end position e_d -> output position d for
    // every present destination (injective: ends are distinct); other
    // positions fill the remaining outputs in order (masked garbage).
    // count(keys <= d) = cnt[d + 2]; e_d = cnt[d + 2] - 1 (>= 0: lead pad).
    std::vector<int32_t> target2(SEC, -1);
    for (int d = 0; d < MID; d++) {
        flags[d] = (s.cnt[d + 2] > s.cnt[d + 1]) ? 1 : 0;  // present
        if (flags[d]) target2[s.cnt[d + 2] - 1] = d;
    }
    {
        int out = 0;
        for (int p = 0; p < SEC; p++) {
            if (target2[p] >= 0) continue;
            while (flags[out]) out++;  // skip outputs taken by real dsts
            target2[p] = out++;
        }
    }
    route_perm(target2.data(), flags.data(), wa2, wb2, s);
}

}  // namespace

extern "C" {

// keys: (nsec, 65536) int32; wa/wb/sstart/wa2/wb2: (nsec, 65536) uint16.
// Returns 0 on success.
int gt_build_sections(const int32_t* keys, int64_t nsec, uint16_t* wa,
                      uint16_t* wb, uint16_t* sstart, uint16_t* wa2,
                      uint16_t* wb2, int nthreads) {
    if (nthreads < 1) nthreads = 1;
    std::vector<std::thread> pool;
    std::atomic<int64_t> next{0};
    auto worker = [&]() {
        Scratch s;
        for (;;) {
            int64_t i = next.fetch_add(1);
            if (i >= nsec) return;
            build_one_section(keys + i * SEC, wa + i * SEC, wb + i * SEC,
                              sstart + i * SEC, wa2 + i * SEC,
                              wb2 + i * SEC, s);
        }
    };
    for (int t = 0; t < nthreads; t++) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
    return 0;
}
}
