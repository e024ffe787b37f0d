// bwasw_core.cpp — native (C++) BWA-SW DP core over the dense occ-checkpoint
// FM-index.  Exact re-implementation of align/bwasw.py (modeled on the
// reference bwa-sw.c:329-526), including khashl bucket iteration order,
// klib heap semantics and quickselect, so PAF / e2e / hapdiv outputs stay
// byte-identical to the reference binary.  The Python DP is the semantic
// spec; this file exists because the per-cell heap/candset logic is scalar
// and walls the Python interpreter (PERF_NOTES.md).  Loaded via ctypes
// (native/__init__.py); align/bwasw.py falls back to Python when absent or
// when debug streams are requested.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <thread>
#include <utility>
#include <vector>

namespace {

constexpr int BLOCK_SHIFT = 6;   // index/dense.py BLOCK = 64
constexpr int SUPER_SHIFT = 16;  // index/dense.py SUPER = 1 << 16
constexpr uint32_t SW_F_UNSET = 0x3FFFFFFu;
constexpr uint32_t U32MAX = 0xFFFFFFFFu;
constexpr int SW_FROM_H = 0, SW_FROM_E = 1, SW_FROM_F = 2;
constexpr int SW_FROM_OPEN = 0, SW_FROM_EXT = 1;

struct Opt {
  int32_t flag, n_best, min_sc, end_len, match, mis, e2e_drop, gap_open, gap_ext;
};

struct Fmi {
  const uint8_t* bwt;
  const uint16_t* occ_block;  // [n_blocks+1][6] counts in [super_start, block_start)
  const int64_t* occ_super;   // [n_supers+1][6] counts before superblock
  const int64_t* acc;         // [7]
  int64_t n;
};

struct Cell {  // bwa-sw.c:39-45 sw_cell_t analog (align/bwasw.py Cell)
  int64_t lo, hi, lo_rc;
  int32_t H, E, F, rlen, qlen;
  uint32_t H_from_pos, E_from_pos, F_from_off;
  uint8_t H_from, E_from, F_from, F_off_set, flt;
};

static inline Cell cell_zero() {
  Cell c;
  std::memset(&c, 0, sizeof(c));
  return c;
}

// ---- khashl semantics (align/khashl_compat.py) ---------------------------

static inline uint32_t kh_hash_u64(uint64_t x) {
  x ^= x >> 30;
  x *= 0xBF58476D1CE4E5B9ULL;
  x ^= x >> 27;
  x *= 0x94D049BB133111EBULL;
  x ^= x >> 31;
  return (uint32_t)x;
}
static inline uint32_t cell_hash(const Cell& c) {
  return kh_hash_u64((uint64_t)c.lo) + kh_hash_u64((uint64_t)c.hi);
}
static inline bool cell_eq(const Cell& a, const Cell& b) { return a.lo == b.lo && a.hi == b.hi; }
static inline uint32_t h2b(uint32_t h, int bits) { return (h * 2654435769u) >> (32 - bits); }
static inline uint32_t kh_max_count(uint32_t cap) { return (cap >> 1) + (cap >> 2); }

struct CellSet {
  int bits = 0;
  uint32_t count = 0;
  std::vector<Cell> keys;
  std::vector<uint8_t> used;

  uint32_t n_buckets() const { return keys.empty() ? 0u : (1u << bits); }
  uint32_t end() const { return n_buckets(); }

  void clear() {
    count = 0;
    std::fill(used.begin(), used.end(), 0);
  }

  void resize(uint32_t new_n_buckets) {
    uint32_t x = new_n_buckets;
    int j = 0;
    while (x >> 1) {
      x >>= 1;
      ++j;
    }
    if (new_n_buckets & (new_n_buckets - 1)) ++j;
    int new_bits = j > 2 ? j : 2;
    uint32_t new_n = 1u << new_bits;
    if (count > kh_max_count(new_n)) return;
    std::vector<uint8_t> new_used(new_n, 0);
    uint32_t nb = n_buckets();
    if (nb < new_n) keys.resize(new_n);
    uint32_t mask = new_n - 1;
    for (uint32_t j2 = 0; j2 < nb; ++j2) {
      if (!used[j2]) continue;
      Cell key = keys[j2];
      used[j2] = 0;
      for (;;) {  // kick-out rehash
        uint32_t i = h2b(cell_hash(key), new_bits);
        while (new_used[i]) i = (i + 1) & mask;
        new_used[i] = 1;
        if (i < nb && used[i]) {
          std::swap(keys[i], key);
          used[i] = 0;
        } else {
          keys[i] = key;
          break;
        }
      }
    }
    if (nb > new_n) keys.resize(new_n);
    used.swap(new_used);
    bits = new_bits;
  }

  // returns (bucket, absent); on absent the key is stored
  std::pair<uint32_t, bool> put(const Cell& key) {
    uint32_t nb = n_buckets();
    if (count >= kh_max_count(nb)) {
      resize(nb + 1);
      nb = 1u << bits;
    }
    uint32_t mask = nb - 1;
    uint32_t i = h2b(cell_hash(key), bits), last = i;
    while (used[i] && !cell_eq(keys[i], key)) {
      i = (i + 1) & mask;
      if (i == last) break;
    }
    if (!used[i]) {
      keys[i] = key;
      used[i] = 1;
      ++count;
      return {i, true};
    }
    return {i, false};
  }

  uint32_t get(const Cell& key) const {
    uint32_t nb = n_buckets();
    if (nb == 0) return 0;
    uint32_t mask = nb - 1;
    uint32_t i = h2b(cell_hash(key), bits), last = i;
    while (used[i] && !cell_eq(keys[i], key)) {
      i = (i + 1) & mask;
      if (i == last) return nb;
    }
    return used[i] ? i : nb;
  }
};

// ---- klib heap on (score<<32 | id) with reversed comparator --------------
// (ks_heap* of khashl_compat.py; heap[0] is the MIN packed value)

static void heapup(std::vector<uint64_t>& h) {
  size_t k = h.size() - 1;
  uint64_t tmp = h[k];
  while (k) {
    size_t i = (k - 1) >> 1;
    if (tmp > h[i]) break;
    h[k] = h[i];
    k = i;
  }
  h[k] = tmp;
}

static void heapdown(std::vector<uint64_t>& h, size_t i, size_t n) {
  size_t k = i;
  uint64_t tmp = h[i];
  for (;;) {
    k = (k << 1) + 1;
    if (k >= n) break;
    if (k != n - 1 && h[k] > h[k + 1]) ++k;
    if (h[k] > tmp) break;
    h[i] = h[k];
    i = k;
  }
  h[i] = tmp;
}

static void heapsort_desc(std::vector<uint64_t>& h) {  // descending by packed value
  for (size_t i = h.size(); i-- > 1;) {
    std::swap(h[0], h[i]);
    heapdown(h, 0, i);
  }
}

static int heap_insert1(std::vector<uint64_t>& h, uint32_t maxn, int64_t score, uint32_t id) {
  uint64_t x = ((uint64_t)score << 32) | id;
  if (h.size() < maxn) {
    h.push_back(x);
    heapup(h);
    return 1;
  }
  if (x > h[0]) {
    h[0] = x;
    heapdown(h, 0, h.size());
    return 1;
  }
  return 0;
}

// klib ks_ksmall with lt = (a > b): k-th LARGEST (quickselect); signed
// indices so `high = hh - 1` can go negative exactly like the Python spec.
static int32_t ksmall_gt(std::vector<int32_t>& a, int64_t kk) {
  int64_t low = 0, high = (int64_t)a.size() - 1, k = kk;
  for (;;) {
    if (high <= low) return a[k];
    if (high == low + 1) {
      if (a[high] > a[low]) std::swap(a[low], a[high]);
      return a[k];
    }
    int64_t mid = low + (high - low) / 2;
    if (a[high] > a[mid]) std::swap(a[mid], a[high]);
    if (a[high] > a[low]) std::swap(a[low], a[high]);
    if (a[low] > a[mid]) std::swap(a[mid], a[low]);
    std::swap(a[mid], a[low + 1]);
    int64_t ll = low + 1, hh = high;
    for (;;) {
      do ++ll; while (a[ll] > a[low]);
      do --hh; while (a[low] > a[hh]);
      if (hh < ll) break;
      std::swap(a[ll], a[hh]);
    }
    std::swap(a[low], a[hh]);
    if (hh <= k) low = ll;
    if (hh >= k) high = hh - 1;
  }
}

// ---- dense rank / bidirectional extend (index/dense.py semantics) --------

struct RankCache {  // direct-mapped pos -> occ[6]; pure speed, no output effect
  static constexpr uint32_t CBITS = 16;
  static constexpr uint32_t CSZ = 1u << CBITS;
  std::vector<int64_t> pos;
  std::vector<int64_t> occ;
  RankCache() : pos(CSZ, -1), occ((size_t)CSZ * 6) {}
};

static void rank1a(const Fmi& f, int64_t k, int64_t out[6], RankCache& rc) {
  if (k > f.n) k = f.n;
  uint32_t slot = kh_hash_u64((uint64_t)k) & (RankCache::CSZ - 1);
  if (rc.pos[slot] == k) {
    std::memcpy(out, &rc.occ[(size_t)slot * 6], 6 * sizeof(int64_t));
    return;
  }
  const int64_t* sup = f.occ_super + (size_t)(k >> SUPER_SHIFT) * 6;
  const uint16_t* blk = f.occ_block + (size_t)(k >> BLOCK_SHIFT) * 6;
  for (int c = 0; c < 6; ++c) out[c] = sup[c] + blk[c];
  for (int64_t i = (k >> BLOCK_SHIFT) << BLOCK_SHIFT; i < k; ++i) ++out[f.bwt[i]];
  rc.pos[slot] = k;
  std::memcpy(&rc.occ[(size_t)slot * 6], out, 6 * sizeof(int64_t));
}

struct Ext {
  int64_t lo[6], rc[6], sz[6];
};

// backward extend with the exact complement-order prefix sums of rld_extend
// (rld0.c:486-502; index/dense.py DenseFMIndex.extend with is_back=True)
static void extend_back(const Fmi& f, int64_t lo, int64_t lo_rc, int64_t size, Ext& e, RankCache& rc) {
  int64_t tk[6], tl[6];
  rank1a(f, lo, tk, rc);
  rank1a(f, lo + size, tl, rc);
  for (int c = 0; c < 6; ++c) {
    e.sz[c] = tl[c] - tk[c];
    e.lo[c] = f.acc[c] + tk[c];
  }
  int64_t o = lo_rc;
  e.rc[0] = o;
  o += e.sz[0]; e.rc[4] = o;
  o += e.sz[4]; e.rc[3] = o;
  o += e.sz[3]; e.rc[2] = o;
  o += e.sz[2]; e.rc[1] = o;
  o += e.sz[1]; e.rc[5] = o;
}

// ---- DP engine (align/bwasw.py sw_core_multi, one window) ----------------

struct Dawg {
  int32_t n_node;
  const int32_t* c;        // edge symbol into node (root: unused)
  const int32_t* pre_off;  // [n_node+1]
  const int32_t* pre;      // flattened predecessor ids
};

struct Engine {
  Fmi f;
  Opt o;
  CellSet h;
  std::vector<std::vector<Cell>> rows;
  std::vector<std::pair<int64_t, int64_t>> fpar;
  std::vector<uint64_t> heap;
  std::vector<Cell> fstack;
  std::vector<Cell> row0;
  RankCache cache;
  int64_t best_pos = 0;
  int32_t best_score = 0;

  std::pair<uint32_t, int> update_candset(const Cell& p) {  // bwa-sw.c:265-284
    auto pr = h.put(p);
    uint32_t itr = pr.first;
    if (!pr.second) {
      Cell& q = h.keys[itr];
      q.rlen = std::max(q.rlen, p.rlen);
      q.qlen = std::max(q.qlen, p.qlen);
      int changed = 0;
      if (q.E < p.E) {
        q.E = p.E;
        q.E_from = p.E_from;
        q.E_from_pos = p.E_from_pos;
        changed |= 1 << 1;
      }
      if (q.F < p.F) {
        q.F = p.F;
        q.F_from = p.F_from;
        changed |= 1 << 2;
      }
      if (q.H < p.H) {
        q.H = p.H;
        q.H_from = p.H_from;
        changed |= 1 << 0;
        if (p.H_from == SW_FROM_H) q.H_from_pos = p.H_from_pos;
      }
      return {itr, changed};
    }
    return {itr, 7};
  }

  void track_F(std::vector<Cell>& row) {  // bwa-sw.c:301-324
    h.clear();
    for (size_t j = 0; j < row.size(); ++j) {
      Cell r = row[j];
      r.H = (int32_t)j;  // reuse H as index
      h.put(r);
    }
    for (Cell& p : row) {
      if (p.F == 0 || p.F_from_off == SW_F_UNSET) continue;
      Cell key = cell_zero();
      key.lo = fpar[p.F_from_off].first;
      key.hi = fpar[p.F_from_off].second;
      uint32_t k = h.get(key);
      if (k != h.end()) {
        p.F_from_off = (uint32_t)h.keys[k].H;
        p.F_off_set = 1;
      } else {
        p.F_from_off = SW_F_UNSET;
      }
    }
  }

  static void cell_dedup(std::vector<Cell>& row) {  // bwa-sw.c:197-216
    if (row.size() <= 1) return;
    std::vector<size_t> a = {0};
    for (size_t i = 1; i < row.size(); ++i) {
      Cell& p = row[i];
      bool contained = false;
      for (size_t j : a) {
        const Cell& q = row[j];
        if (q.lo_rc <= p.lo_rc && q.lo_rc + (q.hi - q.lo) >= p.lo_rc + (p.hi - p.lo)) {
          contained = true;
          break;
        }
        if (q.lo <= p.lo && q.hi >= p.hi) {
          contained = true;
          break;
        }
      }
      if (!contained) a.push_back(i);
      else p.flt = 1;
    }
  }

  void run(const Dawg& g) {
    int n_col = o.n_best;
    rows.assign(g.n_node, {});
    fpar.clear();
    h = CellSet();
    h.resize((uint32_t)o.n_best * 4);
    best_pos = 0;
    best_score = 0;
    Cell root = cell_zero();
    root.hi = f.acc[6];
    rows[0].push_back(root);
    Cell last_p = root;  // reference keeps the last visited predecessor cell

    for (int32_t i = 1; i < g.n_node; ++i) {
      h.clear();
      int32_t max_min_sc = 0;
      int32_t np = g.pre_off[i + 1] - g.pre_off[i];
      const int32_t* pre = g.pre + g.pre_off[i];
      if (np > 1) {  // k-smallest pruning bound (bwa-sw.c:368-386)
        size_t n_cell = 0;
        for (int32_t pj = 0; pj < np; ++pj) n_cell += rows[pre[pj]].size();
        if (n_cell > (size_t)o.n_best) {
          std::vector<int32_t> ks_a;
          ks_a.reserve(n_cell);
          for (int32_t pj = 0; pj < np; ++pj)
            for (const Cell& cc : rows[pre[pj]]) ks_a.push_back(cc.H);
          max_min_sc = ksmall_gt(ks_a, o.n_best);
        }
        max_min_sc -= std::max(o.gap_open + o.gap_ext, o.mis);
        if (max_min_sc < 0) max_min_sc = 0;
      }
      int32_t tc = g.c[i];

      // H and E from predecessor rows (bwa-sw.c:388-426)
      for (int32_t pj = 0; pj < np; ++pj) {
        int32_t pid = pre[pj];
        std::vector<Cell>& prow = rows[pid];
        for (size_t k = 0; k < prow.size(); ++k) {
          const Cell p = prow[k];
          last_p = p;
          if (p.H + o.match < max_min_sc) continue;
          Ext e;
          extend_back(f, p.lo, p.lo_rc, p.hi - p.lo, e, cache);
          Cell r = cell_zero();
          r.F_from_off = SW_F_UNSET;
          r.H_from = SW_FROM_H;
          r.H_from_pos = (uint32_t)((int64_t)pid * n_col + (int64_t)k);
          r.E_from_pos = U32MAX;
          for (int c = 1; c < 6; ++c) {
            int32_t sc = (c == tc && c != 5) ? o.match : -o.mis;
            if (e.sz[c] == 0) continue;
            if (p.H + sc <= 0 || p.H + sc < max_min_sc) continue;
            if (c != tc && p.qlen < o.end_len) continue;
            r.lo = e.lo[c];
            r.hi = e.lo[c] + e.sz[c];
            r.lo_rc = e.rc[c];
            r.H = p.H + sc;
            r.rlen = p.rlen + 1;
            r.qlen = p.qlen + 1;
            update_candset(r);
          }
          if (p.H - o.gap_open > p.E) {
            r.E_from = SW_FROM_OPEN;
            r.E = p.H - o.gap_open;
          } else {
            r.E_from = SW_FROM_EXT;
            r.E = p.E;
          }
          r.E -= o.gap_ext;
          if (r.E > 0 && r.E >= max_min_sc && p.qlen >= o.end_len) {
            // only lo/hi updated; lo_rc keeps the stale value (bwa-sw.c:418)
            r.lo = p.lo;
            r.hi = p.hi;
            r.H = r.E;
            r.H_from = SW_FROM_E;
            r.E_from_pos = (uint32_t)((int64_t)pid * n_col + (int64_t)k);
            r.H_from_pos = U32MAX;
            r.rlen = p.rlen;
            r.qlen = p.qlen + 1;
            update_candset(r);
          }
        }
      }

      if (h.count == 0) {
        rows[i].clear();
        continue;
      }

      // top-n selection (bwa-sw.c:428-443)
      heap.clear();
      for (uint32_t itr = 0; itr < h.n_buckets(); ++itr)
        if (h.used[itr]) heap_insert1(heap, o.n_best, h.keys[itr].H, itr);
      heapsort_desc(heap);
      row0.clear();
      for (uint64_t x : heap) row0.push_back(h.keys[(uint32_t)x]);
      std::reverse(heap.begin(), heap.end());  // sorted ascending = valid heap

      // F (deletion) closure DFS (bwa-sw.c:445-483)
      size_t fpar_base = fpar.size();
      uint32_t n_fpar = 0;
      fstack.clear();
      if (last_p.qlen >= o.end_len)
        for (size_t j = row0.size(); j-- > 0;)
          if (row0[j].H > o.gap_open + o.gap_ext) fstack.push_back(row0[j]);
      while (!fstack.empty()) {
        Cell z = fstack.back();
        fstack.pop_back();
        int64_t minv = heap.size() < (size_t)o.n_best ? 0 : (int64_t)(heap[0] >> 32);
        Cell r = cell_zero();
        r.H_from_pos = r.E_from_pos = U32MAX;
        r.F_from_off = SW_F_UNSET;
        if (z.H - o.gap_open > z.F) {
          r.F_from = SW_FROM_OPEN;
          r.F = z.H - o.gap_open;
        } else {
          r.F_from = SW_FROM_EXT;
          r.F = z.F;
        }
        r.F -= o.gap_ext;
        r.H = r.F;
        r.H_from = SW_FROM_F;
        r.rlen = z.rlen + 1;
        r.qlen = z.qlen;
        if (r.H <= minv) continue;
        Ext e;
        extend_back(f, z.lo, z.lo_rc, z.hi - z.lo, e, cache);
        for (int c = 1; c < 6; ++c) {
          if (e.sz[c] == 0) continue;
          r.lo = e.lo[c];
          r.hi = e.lo[c] + e.sz[c];
          r.lo_rc = e.rc[c];
          auto uc = update_candset(r);
          if (uc.second & (1 << 2)) {  // q->F updated
            heap_insert1(heap, o.n_best, r.H, U32MAX);
            fpar.emplace_back(z.lo, z.hi);
            h.keys[uc.first].F_from = r.F_from;
            h.keys[uc.first].F_from_off = (uint32_t)(fpar_base + n_fpar);
            ++n_fpar;
            // compares against the heap min captured at pop time (bwa-sw.c:453,476)
            if (r.H - o.gap_ext > minv) fstack.push_back(h.keys[uc.first]);
          }
        }
      }

      // rebuild heap/row, track F, best, dedup
      heap.clear();
      for (uint32_t itr = 0; itr < h.n_buckets(); ++itr)
        if (h.used[itr]) heap_insert1(heap, o.n_best, h.keys[itr].H, itr);
      heapsort_desc(heap);
      rows[i].clear();
      for (uint64_t x : heap) rows[i].push_back(h.keys[(uint32_t)x]);
      if (n_fpar > 0) track_F(rows[i]);
      if (rows[i][0].H > best_score) {
        best_score = rows[i][0].H;
        best_pos = (int64_t)i * n_col;
      }
      if (i == g.n_node - 1) cell_dedup(rows[i]);
    }
  }
};

// ---- hapdiv annotation (sw_backtrack want_anno; bwa-sw.c:218-259) --------

static int ref_base(const int64_t* acc, int64_t lo) {
  for (int c = 1; c < 7; ++c)
    if (acc[c] > lo) return c - 1;
  return 5;
}

// length-only backtrack returning the edit distance (bwa-sw.c:60-115 walk)
static int backtrack_ed(const Opt& o, const Fmi& f, const Dawg& g,
                        const std::vector<std::vector<Cell>>& rows, int64_t pos) {
  int n_col = o.n_best;
  int last = 0, ed = 0;
  while (pos > 0) {
    int64_t r = pos / n_col;
    const Cell& p = rows[r][pos % n_col];
    int x = p.H_from | (p.E_from << 2) | (p.F_from << 3);
    int state = last == 0 ? (x & 3) : last;
    int ext = (state == 1 || state == 2) ? (x >> (state + 1)) & 1 : 0;
    int c = ref_base(f.acc, p.lo);
    if (state == SW_FROM_H) {
      pos = p.H_from_pos;
      ed += (c != g.c[r]);
    } else if (state == SW_FROM_E) {
      pos = p.E_from_pos;
      ++ed;
    } else {
      pos = r * n_col + p.F_from_off;
      ++ed;
    }
    last = ((state == 1 || state == 2) && ext) ? state : 0;
  }
  return ed;
}

// one hapdiv window over its linear-chain DAWG (dawg.c:230-250 layout:
// node j>=1 carries seq[k-j], single predecessor j-1)
static void hapdiv_one(Engine& eng, const uint8_t* seq, int64_t k, int64_t* out10) {
  std::vector<int32_t> cbuf((size_t)k + 1), pre((size_t)k), pre_off((size_t)k + 2);
  cbuf[0] = -1;
  pre_off[0] = pre_off[1] = 0;
  for (int64_t j = 1; j <= k; ++j) {
    cbuf[j] = seq[k - j];
    pre[j - 1] = (int32_t)(j - 1);
    pre_off[j + 1] = (int32_t)j;
  }
  Dawg g{(int32_t)(k + 1), cbuf.data(), pre_off.data(), pre.data()};
  eng.run(g);
  out10[0] = eng.best_score;
  int64_t n_al = 0, max_ed = 0;
  int64_t n_hap[7] = {0, 0, 0, 0, 0, 0, 0};
  const std::vector<Cell>& prow = eng.rows[k];
  if (!prow.empty()) {
    int32_t H0 = prow[0].H;
    for (size_t idx = 0; idx < prow.size(); ++idx) {
      const Cell& q = prow[idx];
      if (q.flt || q.H_from != SW_FROM_H || q.H < eng.o.min_sc) continue;
      if (eng.o.e2e_drop >= 0 && H0 - q.H > eng.o.e2e_drop) continue;
      ++n_al;
      int ed = backtrack_ed(eng.o, eng.f, g, eng.rows, (int64_t)k * eng.o.n_best + (int64_t)idx);
      if (ed > max_ed) max_ed = ed;
      n_hap[ed < 6 ? ed : 6] += q.hi - q.lo;
    }
  }
  out10[1] = n_al;
  out10[2] = max_ed;
  for (int i = 0; i < 7; ++i) out10[3 + i] = n_hap[i];
}

}  // namespace

extern "C" {

// Full DP for one DAWG; rows exported for the Python backtrack.
// opt9 = [flag, n_best, min_sc, end_len, match, mis, e2e_drop, gap_open, gap_ext]
void rb3t_sw_dp(const uint8_t* bwt, const uint16_t* occ_block, const int64_t* occ_super,
                const int64_t* acc, int64_t n, const int32_t* opt9, int32_t n_node,
                const int32_t* node_c, const int32_t* pre_off, const int32_t* pre_flat,
                int32_t* row_len, int64_t* out_i64, int32_t* out_i32, uint32_t* out_u32,
                uint8_t* out_u8, int64_t* out_best) {
  Fmi f{bwt, occ_block, occ_super, acc, n};
  Opt o{opt9[0], opt9[1], opt9[2], opt9[3], opt9[4], opt9[5], opt9[6], opt9[7], opt9[8]};
  Engine eng;
  eng.f = f;
  eng.o = o;
  Dawg g{n_node, node_c, pre_off, pre_flat};
  eng.run(g);
  int n_col = o.n_best;
  for (int32_t i = 0; i < n_node; ++i) {
    const std::vector<Cell>& row = eng.rows[i];
    row_len[i] = (int32_t)row.size();
    for (size_t j = 0; j < row.size(); ++j) {
      size_t b = (size_t)i * n_col + j;
      const Cell& c = row[j];
      out_i64[b * 3 + 0] = c.lo;
      out_i64[b * 3 + 1] = c.hi;
      out_i64[b * 3 + 2] = c.lo_rc;
      out_i32[b * 5 + 0] = c.H;
      out_i32[b * 5 + 1] = c.E;
      out_i32[b * 5 + 2] = c.F;
      out_i32[b * 5 + 3] = c.rlen;
      out_i32[b * 5 + 4] = c.qlen;
      out_u32[b * 3 + 0] = c.H_from_pos;
      out_u32[b * 3 + 1] = c.E_from_pos;
      out_u32[b * 3 + 2] = c.F_from_off;
      out_u8[b * 5 + 0] = c.H_from;
      out_u8[b * 5 + 1] = c.E_from;
      out_u8[b * 5 + 2] = c.F_from;
      out_u8[b * 5 + 3] = c.F_off_set;
      out_u8[b * 5 + 4] = c.flt;
    }
  }
  out_best[0] = eng.best_pos;
  out_best[1] = eng.best_score;
}

// Batched hapdiv windows (equal length k, nt6-coded), threaded.
// out[w*10] = [best_score, n_al, max_ed, n_hap[0..6]]
void rb3t_hapdiv_batch(const uint8_t* bwt, const uint16_t* occ_block, const int64_t* occ_super,
                       const int64_t* acc, int64_t n, const int32_t* opt9, const uint8_t* seqs,
                       int64_t n_win, int64_t k, int32_t n_threads, int64_t* out) {
  Fmi f{bwt, occ_block, occ_super, acc, n};
  Opt o{opt9[0], opt9[1], opt9[2], opt9[3], opt9[4], opt9[5], opt9[6], opt9[7], opt9[8]};
  if (n_threads < 1) n_threads = 1;
  auto work = [&](int64_t w0, int64_t w1) {
    Engine eng;
    eng.f = f;
    eng.o = o;
    for (int64_t w = w0; w < w1; ++w) hapdiv_one(eng, seqs + w * k, k, out + w * 10);
  };
  if (n_threads == 1 || n_win < 2) {
    work(0, n_win);
    return;
  }
  std::vector<std::thread> th;
  int64_t per = (n_win + n_threads - 1) / n_threads;
  for (int32_t t = 0; t < n_threads; ++t) {
    int64_t w0 = (int64_t)t * per, w1 = std::min(n_win, w0 + per);
    if (w0 >= w1) break;
    th.emplace_back(work, w0, w1);
  }
  for (std::thread& t : th) t.join();
}

}  // extern "C"
