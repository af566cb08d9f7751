// Hub-pair greedy placement (plan v10) — C++ port of
// graph_tpu/engine/pair.py place_mid_pairs/encode_tiles, bit-for-bit.
//
// One slot carries TWO same-destination hub edges, gathered in K1
// through two independent lanemap streams.  Per (VREG row, window
// lane, stream) a tile holds ONE row-table entry, so a pair lands in a
// row only when its same-lane sources agree with that row's tables; a
// pool of open tiles gives each pair tile_pool*8 candidate rows times
// two stream assignments.  The reference has no analog — it visits
// every edge individually (crates/algos/src/page_rank.rs:143-146);
// pairing is a plan-time transform unlocked by resolving all conflicts
// at build time.
//
// The python implementation in pair.py is the semantic reference; a
// unit test (tests/test_engine.py) asserts this port matches it
// array-for-array on random inputs.

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

constexpr int TILE = 1024;
constexpr int32_t MID = 65536;

struct Tile {
  int16_t t1[8][128];
  int16_t t2[8][128];
  int32_t fill[8];
  std::vector<int32_t> lane1[8], lane2[8], key[8];
  Tile() {
    std::memset(t1, 0xff, sizeof t1);  // -1 = unset table entry
    std::memset(t2, 0xff, sizeof t2);
    std::memset(fill, 0, sizeof fill);
    fill[0] = 1;  // (0, 0) reserved for the section-lead pad
  }
};

}  // namespace

extern "C" int64_t gt_pair_place(const int32_t* s1, const int32_t* s2,
                                 const int32_t* dstl, int64_t npairs,
                                 int32_t tile_pool, uint16_t** widx_out,
                                 uint16_t** widx2_out, int32_t** keys_out) {
  std::vector<Tile*> tiles;
  std::vector<int32_t> open_idx;  // insertion order, like the python list

  for (int64_t i = 0; i < npairs; i++) {
    const int32_t a1 = s1[i] & 127, b1 = s1[i] >> 7;
    const int32_t a2 = s2[i] & 127, b2 = s2[i] >> 7;
    bool placed = false;
    for (int32_t ti : open_idx) {
      Tile& t = *tiles[ti];
      for (int r = 0; r < 8; r++) {
        if (t.fill[r] >= 128) continue;
        const int16_t e1 = t.t1[r][a1], e2 = t.t2[r][a2];
        if ((e1 < 0 || e1 == b1) && (e2 < 0 || e2 == b2)) {
          t.t1[r][a1] = (int16_t)b1;
          t.t2[r][a2] = (int16_t)b2;
          t.lane1[r].push_back(a1);
          t.lane2[r].push_back(a2);
          t.key[r].push_back(dstl[i]);
          t.fill[r]++;
          placed = true;
          break;
        }
        // swapped stream assignment
        const int16_t f1 = t.t1[r][a2], f2 = t.t2[r][a1];
        if ((f1 < 0 || f1 == b2) && (f2 < 0 || f2 == b1)) {
          t.t1[r][a2] = (int16_t)b2;
          t.t2[r][a1] = (int16_t)b1;
          t.lane1[r].push_back(a2);
          t.lane2[r].push_back(a1);
          t.key[r].push_back(dstl[i]);
          t.fill[r]++;
          placed = true;
          break;
        }
      }
      if (placed) break;
    }
    if (!placed) {
      if ((int32_t)open_idx.size() >= tile_pool) {
        // close the fullest open tile (first maximum, python max())
        size_t best = 0;
        int64_t bestfill = -1;
        for (size_t j = 0; j < open_idx.size(); j++) {
          int64_t f = 0;
          for (int r = 0; r < 8; r++) f += tiles[open_idx[j]]->fill[r];
          if (f > bestfill) {
            bestfill = f;
            best = j;
          }
        }
        open_idx.erase(open_idx.begin() + (int64_t)best);
      }
      tiles.push_back(new Tile());
      open_idx.push_back((int32_t)tiles.size() - 1);
      Tile& t = *tiles.back();
      t.t1[0][a1] = (int16_t)b1;
      t.t2[0][a2] = (int16_t)b2;
      t.lane1[0].push_back(a1);
      t.lane2[0].push_back(a2);
      t.key[0].push_back(dstl[i]);
      t.fill[0]++;
    }
  }

  // ---- encode (mirrors pair.py encode_tiles)
  const int64_t ntiles = (int64_t)tiles.size();
  uint16_t* widx = (uint16_t*)std::calloc((size_t)(ntiles * TILE), 2);
  uint16_t* widx2 = (uint16_t*)std::calloc((size_t)(ntiles * TILE), 2);
  int32_t* keys = (int32_t*)std::malloc((size_t)(ntiles * TILE) * 4);
  if (!widx || !widx2 || !keys) {
    std::free(widx);
    std::free(widx2);
    std::free(keys);
    for (Tile* t : tiles) delete t;
    return -1;
  }
  for (int64_t i = 0; i < ntiles * TILE; i++) keys[i] = MID;
  for (int64_t ti = 0; ti < ntiles; ti++) {
    Tile& t = *tiles[ti];
    for (int r = 0; r < 8; r++) {
      const int base = (r == 0) ? 1 : 0;
      const int64_t off = ti * TILE + (int64_t)r * 128;
      for (int c = 0; c < 128; c++) {
        const uint16_t v1 = t.t1[r][c] < 0 ? 0 : (uint16_t)t.t1[r][c];
        const uint16_t v2 = t.t2[r][c] < 0 ? 0 : (uint16_t)t.t2[r][c];
        widx[off + c] = (uint16_t)(v1 << 7);
        widx2[off + c] = (uint16_t)(v2 << 7);
      }
      for (size_t j = 0; j < t.lane1[r].size(); j++) {
        widx[off + base + (int64_t)j] |= (uint16_t)t.lane1[r][j];
        widx2[off + base + (int64_t)j] |= (uint16_t)t.lane2[r][j];
        keys[off + base + (int64_t)j] = t.key[r][j];
      }
    }
    delete tiles[ti];
  }
  *widx_out = widx;
  *widx2_out = widx2;
  *keys_out = keys;
  return ntiles;
}

extern "C" void gt_pair_free(uint16_t* w, uint16_t* w2, int32_t* k) {
  std::free(w);
  std::free(w2);
  std::free(k);
}
