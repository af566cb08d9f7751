// Hub-quad greedy placement (plan v11) — C++ port of
// graph_tpu/engine/pair.py place_mid_quads, bit-for-bit.
//
// One slot carries FOUR same-destination hub edges, gathered in K1
// through four independent lanemap streams.  Per (VREG row, window
// lane, stream) a tile holds ONE row-table entry; a quad lands in a
// row when some cyclic rotation of its stream assignment agrees with
// all four tables.  The reference has no analog — it visits every
// edge individually (crates/algos/src/page_rank.rs:143-146).
//
// The python implementation in pair.py is the semantic reference; a
// unit test (tests/test_engine.py) asserts this port matches it
// array-for-array.

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

constexpr int TILE = 1024;
constexpr int32_t MID = 65536;

struct Tile {
  int16_t tab[4][8][128];
  int32_t fill[8];
  std::vector<int32_t> lane[4][8];
  std::vector<int32_t> key[8];
  Tile() {
    std::memset(tab, 0xff, sizeof tab);
    std::memset(fill, 0, sizeof fill);
    fill[0] = 1;  // (0, 0) reserved for the section-lead pad
  }
};

}  // namespace

extern "C" int64_t gt_quad_place(const int32_t* q1, const int32_t* q2,
                                 const int32_t* q3, const int32_t* q4,
                                 const int32_t* dstl, int64_t nq,
                                 int32_t tile_pool, int32_t nperm,
                                 uint16_t** w_out /* [4] */,
                                 int32_t** keys_out) {
  const int32_t* qs[4] = {q1, q2, q3, q4};
  std::vector<Tile*> tiles;
  std::vector<int32_t> open_idx;

  for (int64_t i = 0; i < nq; i++) {
    int32_t ls[4], hs[4];
    for (int k = 0; k < 4; k++) {
      ls[k] = qs[k][i] & 127;
      hs[k] = qs[k][i] >> 7;
    }
    bool placed = false;
    for (int32_t ti : open_idx) {
      Tile& t = *tiles[ti];
      for (int r = 0; r < 8 && !placed; r++) {
        if (t.fill[r] >= 128) continue;
        for (int rot = 0; rot < nperm && !placed; rot++) {
          bool ok = true;
          for (int k = 0; k < 4; k++) {
            const int p = (k + rot) & 3;  // perm[k] = (k + rot) % 4
            const int16_t e = t.tab[k][r][ls[p]];
            if (e >= 0 && e != hs[p]) {
              ok = false;
              break;
            }
          }
          if (!ok) continue;
          for (int k = 0; k < 4; k++) {
            const int p = (k + rot) & 3;
            t.tab[k][r][ls[p]] = (int16_t)hs[p];
            t.lane[k][r].push_back(ls[p]);
          }
          t.key[r].push_back(dstl[i]);
          t.fill[r]++;
          placed = true;
        }
      }
      if (placed) break;
    }
    if (!placed) {
      if ((int32_t)open_idx.size() >= tile_pool) {
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
      for (int k = 0; k < 4; k++) {
        t.tab[k][0][ls[k]] = (int16_t)hs[k];
        t.lane[k][0].push_back(ls[k]);
      }
      t.key[0].push_back(dstl[i]);
      t.fill[0]++;
    }
  }

  const int64_t ntiles = (int64_t)tiles.size();
  uint16_t* w[4];
  for (int k = 0; k < 4; k++) {
    w[k] = (uint16_t*)std::calloc((size_t)(ntiles * TILE), 2);
  }
  int32_t* keys = (int32_t*)std::malloc((size_t)(ntiles * TILE) * 4);
  if (!w[0] || !w[1] || !w[2] || !w[3] || !keys) {
    for (int k = 0; k < 4; k++) std::free(w[k]);
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
      for (int k = 0; k < 4; k++) {
        for (int c = 0; c < 128; c++) {
          const uint16_t v = t.tab[k][r][c] < 0 ? 0 : (uint16_t)t.tab[k][r][c];
          w[k][off + c] = (uint16_t)(v << 7);
        }
        for (size_t j = 0; j < t.lane[k][r].size(); j++) {
          w[k][off + base + (int64_t)j] |= (uint16_t)t.lane[k][r][j];
        }
      }
      for (size_t j = 0; j < t.key[r].size(); j++) {
        keys[off + base + (int64_t)j] = t.key[r][j];
      }
    }
    delete tiles[ti];
  }
  for (int k = 0; k < 4; k++) w_out[k] = w[k];
  *keys_out = keys;
  return ntiles;
}

extern "C" void gt_quad_free(uint16_t** w, int32_t* keys) {
  for (int k = 0; k < 4; k++) std::free(w[k]);
  std::free(keys);
}
