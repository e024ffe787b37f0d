// Native suffix-array construction for batch BWT building.
//
// rb3t_gsa_bwt computes the multi-string BWT of a 0-separated nt6
// concatenation with the generalized-suffix-array order of the reference's
// libsais_gsa path (sais-ss.c:50-56): each separator compares as a distinct
// symbol, ordered by position, smaller than every regular symbol; the output
// is B[i] = T[SA[i]-1] with wraparound at 0 (sais-ss.c:23-26).
//
// The algorithm is SA-IS (induced sorting) over an integer alphabet: the
// input is remapped so separator #j becomes symbol 1+j and regular symbol c
// becomes 1+m-1+c (m = number of separators), a unique smallest sentinel 0 is
// appended, and a standard recursive SA-IS runs on the integer string.
// Because every suffix contains a (distinct) separator, appending the
// sentinel never changes the relative order of original suffixes, so
// SA[1..n] of the extended string is exactly the GSA.  This is an original
// implementation of the textbook algorithm (Nong, Zhang & Chan 2009), not a
// port of the reference's vendored libsais.
//
// Perf structure (the induce passes are random-access bound):
//  - symbol and S/L-type are packed into ONE array comb[i] = (s[i]<<1)|t[i],
//    so each induced entry costs a single random read instead of two;
//  - two-stage software prefetch in the induce loops: the comb line of the
//    entry PD1 iterations ahead, then the SA write target (bucket cursor) of
//    the entry PD2 ahead once its comb word is cheap to read;
//  - round-parallel induce (induce_par): in the L pass every write lands at a
//    bucket cursor strictly ahead of the read frontier, and the only slots
//    that can still change are the cursors of buckets whose L-region is
//    incomplete.  So [frontier, cursor of first incomplete bucket) is stable
//    and can be *gathered* by all threads at once (the random comb reads are
//    the bound resource; threading multiplies memory-level parallelism);
//    emissions are then slot-assigned sequentially in source order (exactly
//    the order the scalar loop would write) and scattered in parallel.  The
//    S pass is the mirror image.  Output is bit-identical to the scalar
//    loops by construction; rounds smaller than a threshold fall back to the
//    scalar code path.
//
// Equivalence with the Python spec (construct/sa.py prefix-doubling) is
// property-tested in tests/test_jax_engine.py.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <chrono>
#include <functional>
#include <mutex>
#include <thread>
#include <vector>

#define SAIS_STATS (getenv("RB3T_SAIS_STATS") != nullptr)
static double now_s() {
  return std::chrono::duration<double>(std::chrono::steady_clock::now().time_since_epoch()).count();
}

namespace {

static int sais_threads() {
  static int t = [] {
    const char *e = getenv("RB3T_SAIS_THREADS");
    int v = e ? atoi(e) : (int)std::thread::hardware_concurrency();
    if (v < 1) v = 1;
    if (v > 16) v = 16;
    return v;
  }();
  return t;
}

static int64_t sais_round_min() {  // below this, an induce round runs scalar
  static int64_t v = [] {
    const char *e = getenv("RB3T_SAIS_ROUND_MIN");
    return e ? atoll(e) : (int64_t)(1 << 15);
  }();
  return v;
}

// Persistent worker pool: the round-parallel induce runs THOUSANDS of short
// parallel rounds per build (one per stable frontier range); spawning
// std::threads per round cost ~0.1 ms each and made rounds below ~32k
// entries a loss (round-3: lowering the scalar threshold measured SLOWER).
// With resident workers the dispatch is a condvar wake, so small rounds can
// go parallel too.  par_chunks is only ever called from the main thread
// (the algorithm is sequential between parallel sections), so one pool per
// process suffices.
struct SaisPool {
  int T;
  std::vector<std::thread> ws;
  std::mutex mu;
  std::condition_variable cv, cv_done;
  uint64_t gen = 0;
  int n_done = 0, active_T = 0;
  std::function<void(int)> job;
  bool stop = false;

  explicit SaisPool(int t) : T(t) {
    for (int i = 1; i < T; ++i) ws.emplace_back([this, i] { worker(i); });
  }
  ~SaisPool() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stop = true;
    }
    cv.notify_all();
    for (auto &w : ws) w.join();
  }
  static SaisPool &get() {
    static SaisPool p(sais_threads());
    return p;
  }
  void worker(int id) {
    uint64_t seen = 0;
    for (;;) {
      std::unique_lock<std::mutex> lk(mu);
      cv.wait(lk, [&] { return stop || gen != seen; });
      if (stop) return;
      seen = gen;
      bool run_it = id < active_T && job != nullptr;
      auto j = job;  // keep the callable alive past unlock
      lk.unlock();
      if (run_it) j(id);
      lk.lock();
      if (++n_done == T - 1) cv_done.notify_one();
    }
  }
  template <typename G>
  void run(int useT, const G &g) {
    {
      std::lock_guard<std::mutex> lk(mu);
      job = std::function<void(int)>([&g](int t) { g(t); });
      active_T = useT;
      n_done = 0;
      ++gen;
    }
    cv.notify_all();
    g(0);
    std::unique_lock<std::mutex> lk(mu);
    cv_done.wait(lk, [&] { return n_done == T - 1; });
    job = nullptr;
  }
};

// run f(t, lo_t, hi_t) for T contiguous chunks of [lo, hi) on T threads
template <typename I, typename F>
static void par_chunks(int T, I lo, I hi, F f) {
  I len = hi - lo;
  if (T <= 1 || len < (I)T) {
    f(0, lo, hi);
    return;
  }
  SaisPool &pool = SaisPool::get();
  if (pool.T <= 1) {
    f(0, lo, hi);
    return;
  }
  pool.run(T <= pool.T ? T : pool.T, [&](int t) {
    I a = lo + (I)((int64_t)len * t / T), b = lo + (I)((int64_t)len * (t + 1) / T);
    if (t < T && a < b) f(t, a, b);
  });
}

template <typename I, typename CC>
struct SaisLevel {
  // CC holds (symbol<<1)|type; uint16 at the top level when the remapped
  // alphabet permits, else uint32/I.  One array -> one random stream in the
  // induce passes (the hot loops).
  I *SA;
  I n;  // length including the level's sentinel at comb[n-1]
  I K;  // alphabet size; symbols in [0, K), s[n-1] == 0 unique

  std::vector<CC> comb;  // (s[i]<<1) | t[i];  t: 1 = S-type, 0 = L-type
  std::vector<I> cnt;    // per-symbol counts, size K (computed once)
  std::vector<I> cntL;   // per-symbol L-type counts (for induce_par bounds)
  std::vector<I> bkt;    // bucket boundaries, size K+1

  int threads = 1;

  bool is_lms(I i) const { return i > 0 && (comb[i] & 1) && !(comb[i - 1] & 1); }

  template <typename CT>
  void classify(const CT *s) {
    comb.resize(n);
    comb[n - 1] = (CC)((s[n - 1] << 1) | 1);
    if (threads > 1 && n >= (I)(1 << 22)) {
      // each chunk [a, b) derives type(b) read-only (scan forward through the
      // equal-run at b: an equal run shares the type of its last element),
      // then fills its own range backward — no cross-chunk writes
      par_chunks<I>(threads, (I)0, n - 1, [&](int, I a, I b) {
        CC tnext;
        if (b == n - 1) {
          tnext = 1;  // sentinel
        } else {
          I k = b;
          while (k + 1 < n && s[k] == s[k + 1]) k++;
          tnext = (k == n - 1) ? (CC)1 : (CC)(s[k] < s[k + 1] ? 1 : 0);
        }
        for (I i = b - 1; i >= a; i--) {
          CC tb = (s[i] < s[i + 1] || (s[i] == s[i + 1] && tnext)) ? 1 : 0;
          comb[i] = (CC)((s[i] << 1) | tb);
          tnext = tb;
        }
      });
    } else {
      for (I i = n - 2; i >= 0; i--) {
        CC tb = (s[i] < s[i + 1] || (s[i] == s[i + 1] && (comb[i + 1] & 1))) ? 1 : 0;
        comb[i] = (CC)((s[i] << 1) | tb);
      }
    }
  }

  void count_symbols() {
    cnt.assign(K, 0);
    cntL.assign(K, 0);
    if (threads > 1 && n >= (I)(1 << 22) && K <= (I)(1 << 20)) {
      int T = threads;
      std::vector<std::vector<I>> loc(T), locL(T);
      par_chunks<I>(T, (I)0, n, [&](int t, I a, I b) {
        loc[t].assign(K, 0);
        locL[t].assign(K, 0);
        for (I i = a; i < b; i++) {
          CC c = comb[i];
          loc[t][c >> 1]++;
          if (!(c & 1)) locL[t][c >> 1]++;
        }
      });
      for (int t = 0; t < T; t++)
        for (I c = 0; c < K; c++) {
          cnt[c] += loc[t][c];
          cntL[c] += locL[t][c];
        }
    } else {
      for (I i = 0; i < n; i++) {
        CC c = comb[i];
        cnt[c >> 1]++;
        if (!(c & 1)) cntL[c >> 1]++;
      }
    }
  }

  void bucket_bounds(bool ends) {
    // bkt[c] = head of bucket c (ends=false) or one-past-end (ends=true)
    bkt.resize(K + 1);
    I sum = 0;
    for (I c = 0; c < K; c++) {
      bkt[c] = ends ? sum + cnt[c] : sum;
      sum += cnt[c];
    }
  }

  static constexpr I PD1 = 64;  // comb-line prefetch distance
  static constexpr I PD2 = 16;  // SA write-target prefetch distance

  // scalar L-pass over [i0, i1) with live cursors in bkt — resumable
  void induce_L_scalar(I i0, I i1) {
    const CC *cb = comb.data();
    for (I i = i0; i < i1; i++) {
      if (i + PD1 < n) {
        I jp = SA[i + PD1];
        if (jp > 0) __builtin_prefetch(&cb[jp - 1], 0, 0);
      }
      if (i + PD2 < n) {
        I jp = SA[i + PD2];
        if (jp > 0) {
          CC c = cb[jp - 1];
          if (!(c & 1)) __builtin_prefetch(&SA[bkt[c >> 1]], 1, 0);
        }
      }
      I j = SA[i];
      if (j <= 0) continue;  // -1 empty or j == 0 (no predecessor)
      j--;
      CC c = cb[j];
      if (!(c & 1)) SA[bkt[c >> 1]++] = j;
    }
  }

  void induce_S_scalar(I i0, I i1) {  // scans i1-1 down to i0, cursors in bkt
    const CC *cb = comb.data();
    for (I i = i1 - 1; i >= i0; i--) {
      if (i - PD1 >= 0) {
        I jp = SA[i - PD1];
        if (jp > 0) __builtin_prefetch(&cb[jp - 1], 0, 0);
      }
      if (i - PD2 >= 0) {
        I jp = SA[i - PD2];
        if (jp > 0) {
          CC c = cb[jp - 1];
          if (c & 1) __builtin_prefetch(&SA[bkt[c >> 1] - 1], 1, 0);
        }
      }
      I j = SA[i];
      if (j <= 0) continue;
      j--;
      CC c = cb[j];
      if (c & 1) SA[--bkt[c >> 1]] = j;
    }
  }

  void induce() {
    bucket_bounds(false);  // heads
    induce_L_scalar(0, n);
    bucket_bounds(true);  // ends
    induce_S_scalar(0, n);
  }

  static constexpr I ROUND_CAP = 1 << 21;  // emission-buffer bound per round

  struct EmBuf {
    std::vector<I> pos;
    std::vector<CC> sym;
    std::vector<I> slot;
  };

  void induce_par() {
    const CC *cb = comb.data();
    const int T = threads;
    std::vector<EmBuf> em(T);
    int64_t st_rounds = 0, st_par = 0, st_scal = 0;
    double t0 = now_s();
    // ---------------- L pass: left-to-right, writes land at/above cursors
    bucket_bounds(false);
    {
      std::vector<I> lend(K);
      for (I c = 0; c < K; c++) lend[c] = bkt[c] + cntL[c];
      I f = 0, cinc = 0;
      while (f < n) {
        while (cinc < K && bkt[cinc] >= lend[cinc]) cinc++;
        I e = (cinc < K) ? bkt[cinc] : n;
        if (e <= f) {  // unreachable by the write-ahead invariant; stay safe
          induce_L_scalar(f, n);
          break;
        }
        if (e - f > ROUND_CAP) e = f + ROUND_CAP;
        st_rounds++;
        if (e - f < (I)sais_round_min()) {
          st_scal += e - f;
          induce_L_scalar(f, e);
          f = e;
          continue;
        }
        st_par += e - f;
        // parallel gather of (source-order) emissions from the stable range
        par_chunks<I>(T, f, e, [&](int t, I a, I b) {
          auto &eb = em[t];
          eb.pos.clear();
          eb.sym.clear();
          for (I i = a; i < b; i++) {
            if (i + PD1 < b) {
              I jp = SA[i + PD1];
              if (jp > 0) __builtin_prefetch(&cb[jp - 1], 0, 0);
            }
            I j = SA[i];
            if (j <= 0) continue;
            j--;
            CC c = cb[j];
            if (!(c & 1)) {
              eb.pos.push_back(j);
              eb.sym.push_back((CC)(c >> 1));
            }
          }
        });
        // slot assignment in exact scalar write order: chunk t's slots for
        // symbol c follow chunks < t's — per-chunk per-symbol counts plus an
        // exclusive prefix make it parallel when K is small enough to count
        if (K <= (I)(1 << 16) && (threads >= 8 || getenv("RB3T_SAIS_PAR_ASSIGN"))) {
          // parallel slot assignment: measured NEUTRAL on this 4-core host
          // (the sequential pass streams cache-resident em buffers); enabled
          // by default only at >= 8 threads where its serialization shows
          std::vector<std::vector<I>> rcnt(T);
          par_chunks<int>(T, 0, T, [&](int, int a0, int b0) {
            for (int t = a0; t < b0; t++) {
              rcnt[t].assign(K, 0);
              for (CC cc : em[t].sym) rcnt[t][cc]++;
            }
          });
          std::vector<std::vector<I>> rcur(T);
          for (int t = 0; t < T; t++) {
            rcur[t] = bkt;
            for (int u = 0; u < t; u++)
              for (I c = 0; c < K; c++) rcur[t][c] += rcnt[u][c];
          }
          for (int t = 0; t < T; t++)
            for (I c = 0; c < K; c++) bkt[c] += rcnt[t][c];
          par_chunks<int>(T, 0, T, [&](int, int a0, int b0) {
            for (int t = a0; t < b0; t++) {
              auto &eb = em[t];
              auto &cu = rcur[t];
              size_t m = eb.pos.size();
              eb.slot.resize(m);
              for (size_t k = 0; k < m; k++) eb.slot[k] = cu[eb.sym[k]]++;
            }
          });
        } else {
          for (int t = 0; t < T; t++) {
            auto &eb = em[t];
            size_t m = eb.pos.size();
            eb.slot.resize(m);
            for (size_t k = 0; k < m; k++) eb.slot[k] = bkt[eb.sym[k]]++;
          }
        }
        // parallel scatter
        par_chunks<int>(T, 0, T, [&](int, int a, int b) {
          for (int t = a; t < b; t++) {
            auto &eb = em[t];
            size_t m = eb.pos.size();
            for (size_t k = 0; k < m; k++) {
              if (k + 8 < m) __builtin_prefetch(&SA[eb.slot[k + 8]], 1, 0);
              SA[eb.slot[k]] = eb.pos[k];
            }
          }
        });
        f = e;
      }
    }
    if (SAIS_STATS) {
      fprintf(stderr, "[sais] n=%lld K=%lld L-pass: rounds=%lld par=%lld scal=%lld %.2fs\n",
              (long long)n, (long long)K, (long long)st_rounds, (long long)st_par,
              (long long)st_scal, now_s() - t0);
      st_rounds = st_par = st_scal = 0;
      t0 = now_s();
    }
    // ---------------- S pass: right-to-left, writes land strictly below
    bucket_bounds(true);
    {
      std::vector<I> send(K);
      for (I c = 0; c < K; c++) send[c] = bkt[c] - (cnt[c] - cntL[c]);
      I f = n, cinc = K - 1;
      while (f > 0) {
        while (cinc >= 0 && bkt[cinc] <= send[cinc]) cinc--;
        I e = (cinc >= 0) ? bkt[cinc] : 0;
        if (e >= f) {
          induce_S_scalar(0, f);
          break;
        }
        if (f - e > ROUND_CAP) e = f - ROUND_CAP;
        st_rounds++;
        if (f - e < (I)sais_round_min()) {
          st_scal += f - e;
          induce_S_scalar(e, f);
          f = e;
          continue;
        }
        st_par += f - e;
        // chunks processed high-to-low; within a chunk, high-to-low
        par_chunks<I>(T, e, f, [&](int t, I a, I b) {
          auto &eb = em[t];
          eb.pos.clear();
          eb.sym.clear();
          for (I i = b - 1; i >= a; i--) {
            if (i - PD1 >= a) {
              I jp = SA[i - PD1];
              if (jp > 0) __builtin_prefetch(&cb[jp - 1], 0, 0);
            }
            I j = SA[i];
            if (j <= 0) continue;
            j--;
            CC c = cb[j];
            if (c & 1) {
              eb.pos.push_back(j);
              eb.sym.push_back((CC)(c >> 1));
            }
          }
        });
        // scan order is highest chunk first; chunk t's (descending) slots
        // for symbol c sit below chunks > t's — mirror-image parallel prefix
        if (K <= (I)(1 << 16) && (threads >= 8 || getenv("RB3T_SAIS_PAR_ASSIGN"))) {
          // parallel slot assignment: measured NEUTRAL on this 4-core host
          // (the sequential pass streams cache-resident em buffers); enabled
          // by default only at >= 8 threads where its serialization shows
          std::vector<std::vector<I>> rcnt(T);
          par_chunks<int>(T, 0, T, [&](int, int a0, int b0) {
            for (int t = a0; t < b0; t++) {
              rcnt[t].assign(K, 0);
              for (CC cc : em[t].sym) rcnt[t][cc]++;
            }
          });
          std::vector<std::vector<I>> rcur(T);
          for (int t = T - 1; t >= 0; t--) {
            rcur[t] = bkt;
            for (int u = T - 1; u > t; u--)
              for (I c = 0; c < K; c++) rcur[t][c] -= rcnt[u][c];
          }
          for (int t = 0; t < T; t++)
            for (I c = 0; c < K; c++) bkt[c] -= rcnt[t][c];
          par_chunks<int>(T, 0, T, [&](int, int a0, int b0) {
            for (int t = a0; t < b0; t++) {
              auto &eb = em[t];
              auto &cu = rcur[t];
              size_t m = eb.pos.size();
              eb.slot.resize(m);
              for (size_t k = 0; k < m; k++) eb.slot[k] = --cu[eb.sym[k]];
            }
          });
        } else {
          for (int t = T - 1; t >= 0; t--) {  // highest chunk first = scan order
            auto &eb = em[t];
            size_t m = eb.pos.size();
            eb.slot.resize(m);
            for (size_t k = 0; k < m; k++) eb.slot[k] = --bkt[eb.sym[k]];
          }
        }
        par_chunks<int>(T, 0, T, [&](int, int a, int b) {
          for (int t = a; t < b; t++) {
            auto &eb = em[t];
            size_t m = eb.pos.size();
            for (size_t k = 0; k < m; k++) {
              if (k + 8 < m) __builtin_prefetch(&SA[eb.slot[k + 8]], 1, 0);
              SA[eb.slot[k]] = eb.pos[k];
            }
          }
        });
        f = e;
      }
    }
    if (SAIS_STATS)
      fprintf(stderr, "[sais] n=%lld K=%lld S-pass: rounds=%lld par=%lld scal=%lld %.2fs\n",
              (long long)n, (long long)K, (long long)st_rounds, (long long)st_par,
              (long long)st_scal, now_s() - t0);
  }

  void induce_any() {
    if (threads > 1 && n >= (I)(1 << 22))
      induce_par();
    else
      induce();
  }

  template <typename CT>
  void run(const CT *s) {
    classify(s);
    count_symbols();
    core();
  }

  // compare LMS substrings at pos/prev; true if they differ.  Comparing each
  // entry against its immediate predecessor is equivalent to the classic
  // "previous distinct" formulation because equality is transitive over the
  // full (symbol, type) sequence up to the common LMS end.
  bool lms_diff(I pos, I prev) const {
    for (I d = 0;; d++) {
      if (comb[pos + d] != comb[prev + d]) return true;
      if (d > 0) {
        bool l1 = is_lms(pos + d), l2 = is_lms(prev + d);
        if (l1 || l2) return !(l1 && l2);
      }
    }
  }

  void core() {
    bool stats = SAIS_STATS && n >= (I)(1 << 22);
    const bool par = threads > 1 && n >= (I)(1 << 22);
    const bool parK = par && K <= (I)(1 << 20);
    const int T = threads;
    double t0 = now_s();
    // ---- step 1: sort LMS suffixes by induced sorting of LMS substrings
    memset(SA, 0xFF, (size_t)n * sizeof(I));  // fill with -1
    bucket_bounds(true);
    if (parK) {
      // order-preserving parallel placement: the scalar loop scans i
      // descending, so chunk t's entries for symbol c occupy the slots just
      // below those of chunks > t; per-chunk per-symbol counts give each
      // chunk an exact private cursor.
      std::vector<std::vector<I>> cnts(T);
      par_chunks<I>(T, (I)1, n, [&](int t, I a, I b) {
        cnts[t].assign(K, 0);
        for (I i = a; i < b; i++)
          if (is_lms(i)) cnts[t][comb[i] >> 1]++;
      });
      std::vector<std::vector<I>> cur(T);
      for (int t = T - 1; t >= 0; t--) {
        cur[t] = bkt;  // bucket ends minus counts of higher chunks
        for (int u = T - 1; u > t; u--)
          for (I c = 0; c < K; c++) cur[t][c] -= cnts[u][c];
      }
      par_chunks<I>(T, (I)1, n, [&](int t, I a, I b) {
        auto &cu = cur[t];
        for (I i = b - 1; i >= a; i--)
          if (is_lms(i)) SA[--cu[comb[i] >> 1]] = i;
      });
      for (I c = 0; c < K; c++) bkt[c] = cur[0][c];
    } else {
      for (I i = n - 1; i > 0; i--)
        if (is_lms(i)) SA[--bkt[comb[i] >> 1]] = i;
    }
    induce_any();
    if (stats) { fprintf(stderr, "[sais] n=%lld step1 %.2fs\n", (long long)n, now_s() - t0); t0 = now_s(); }

    // ---- step 2: name sorted LMS substrings
    I n1 = 0;
    if (par) {
      // compact LMS entries to the front via chunk buffers (order kept)
      std::vector<std::vector<I>> buf(T);
      par_chunks<I>(T, (I)0, n, [&](int t, I a, I b) {
        auto &v = buf[t];
        v.clear();
        for (I i = a; i < b; i++) {
          if (i + PD1 < b) {
            I jp = SA[i + PD1];
            if (jp > 0) __builtin_prefetch(&comb[jp - 1], 0, 0);
          }
          I j = SA[i];
          if (j > 0 && (comb[j] & 1) && !(comb[j - 1] & 1)) v.push_back(j);
        }
      });
      std::vector<I> off(T + 1, 0);
      for (int t = 0; t < T; t++) off[t + 1] = off[t] + (I)buf[t].size();
      n1 = off[T];
      par_chunks<int>(T, 0, T, [&](int, int a, int b) {
        for (int t = a; t < b; t++)
          if (!buf[t].empty()) memcpy(SA + off[t], buf[t].data(), buf[t].size() * sizeof(I));
      });
    } else {
      for (I i = 0; i < n; i++)
        if (is_lms(SA[i])) SA[n1++] = SA[i];
    }
    memset(SA + n1, 0xFF, (size_t)(n - n1) * sizeof(I));
    I name = 0;
    if (par && n1 > (I)(T * 4)) {
      // parallel diff flags vs immediate predecessor, then prefix names
      std::vector<uint8_t> diff(n1);
      diff[0] = 1;
      par_chunks<I>(T, (I)1, n1, [&](int, I a, I b) {
        for (I i = a; i < b; i++) {
          if (i + 8 < b) {
            __builtin_prefetch(&comb[SA[i + 8]], 0, 0);
          }
          diff[i] = lms_diff(SA[i], SA[i - 1]) ? 1 : 0;
        }
      });
      std::vector<I> nbase(T + 1, 0);
      std::vector<std::pair<I, I>> rng(T);
      {
        I len = n1;
        for (int t = 0; t < T; t++)
          rng[t] = {(I)((int64_t)len * t / T), (I)((int64_t)len * (t + 1) / T)};
      }
      par_chunks<int>(T, 0, T, [&](int, int a0, int b0) {
        for (int t = a0; t < b0; t++) {
          I s = 0;
          for (I i = rng[t].first; i < rng[t].second; i++) s += diff[i];
          nbase[t + 1] = s;
        }
      });
      for (int t = 0; t < T; t++) nbase[t + 1] += nbase[t];
      name = nbase[T];
      par_chunks<int>(T, 0, T, [&](int, int a0, int b0) {
        for (int t = a0; t < b0; t++) {
          I nm = nbase[t];
          for (I i = rng[t].first; i < rng[t].second; i++) {
            nm += diff[i];
            SA[n1 + SA[i] / 2] = nm - 1;
          }
        }
      });
    } else {
      I prev = -1;
      for (I i = 0; i < n1; i++) {
        I pos = SA[i];
        bool d = prev < 0 || lms_diff(pos, prev);
        if (d) { name++; prev = pos; }
        SA[n1 + pos / 2] = name - 1;
      }
    }
    if (par) {
      // compact the scattered names to the tail (order kept, right packed)
      std::vector<std::vector<I>> buf(T);
      par_chunks<I>(T, n1, n, [&](int t, I a, I b) {
        auto &v = buf[t];
        v.clear();
        for (I i = a; i < b; i++)
          if (SA[i] >= 0) v.push_back(SA[i]);
      });
      std::vector<I> off(T + 1, 0);
      for (int t = 0; t < T; t++) off[t + 1] = off[t] + (I)buf[t].size();
      I total = off[T];
      par_chunks<int>(T, 0, T, [&](int, int a, int b) {
        for (int t = a; t < b; t++)
          if (!buf[t].empty()) memcpy(SA + (n - total) + off[t], buf[t].data(), buf[t].size() * sizeof(I));
      });
    } else {
      for (I i = n - 1, j = n - 1; i >= n1; i--)
        if (SA[i] >= 0) SA[j--] = SA[i];
    }

    if (stats) { fprintf(stderr, "[sais] n=%lld step2 %.2fs (n1=%lld name=%lld)\n", (long long)n, now_s() - t0, (long long)n1, (long long)name); t0 = now_s(); }
    // ---- step 3: recurse if names are not yet unique
    I *s1 = SA + n - n1;
    if (name < n1) {
      SaisLevel<I, I> sub;
      sub.SA = SA;
      sub.n = n1;
      sub.K = name;
      sub.threads = threads;
      sub.run(s1);  // own scratch; our comb/cnt stay valid
    } else {
      for (I i = 0; i < n1; i++) SA[s1[i]] = i;
    }

    if (stats) { fprintf(stderr, "[sais] n=%lld step3 %.2fs\n", (long long)n, now_s() - t0); t0 = now_s(); }
    // ---- step 4: induce the full SA from the sorted LMS order
    // rewrite s1 to hold LMS positions left-to-right
    if (par) {
      std::vector<I> loff(T + 1, 0);
      std::vector<std::pair<I, I>> rng(T);
      for (int t = 0; t < T; t++)
        rng[t] = {(I)1 + (I)((int64_t)(n - 1) * t / T), (I)1 + (I)((int64_t)(n - 1) * (t + 1) / T)};
      par_chunks<int>(T, 0, T, [&](int, int a0, int b0) {
        for (int t = a0; t < b0; t++) {
          I c = 0;
          for (I i = rng[t].first; i < rng[t].second; i++)
            if (is_lms(i)) c++;
          loff[t + 1] = c;
        }
      });
      for (int t = 0; t < T; t++) loff[t + 1] += loff[t];
      par_chunks<int>(T, 0, T, [&](int, int a0, int b0) {
        for (int t = a0; t < b0; t++) {
          I j = loff[t];
          for (I i = rng[t].first; i < rng[t].second; i++)
            if (is_lms(i)) s1[j++] = i;
        }
      });
      par_chunks<I>(T, (I)0, n1, [&](int, I a, I b) {
        for (I i = a; i < b; i++) SA[i] = s1[SA[i]];
      });
    } else {
      for (I i = 1, j = 0; i < n; i++)
        if (is_lms(i)) s1[j++] = i;
      for (I i = 0; i < n1; i++) SA[i] = s1[SA[i]];
    }
    memset(SA + n1, 0xFF, (size_t)(n - n1) * sizeof(I));
    bucket_bounds(true);
    if (parK && n1 >= (I)(1 << 18)) {
      // buffered parallel placement: gather each chunk's (pos, sym) with the
      // random comb reads parallelized, then place with exact per-chunk
      // cursors (descending scan order, as in step 1)
      std::vector<std::vector<I>> cnts(T), syms(T);
      std::vector<std::pair<I, I>> rng(T);
      for (int t = 0; t < T; t++)
        rng[t] = {(I)((int64_t)n1 * t / T), (I)((int64_t)n1 * (t + 1) / T)};
      par_chunks<int>(T, 0, T, [&](int, int a0, int b0) {
        for (int t = a0; t < b0; t++) {
          cnts[t].assign(K, 0);
          auto &sy = syms[t];
          sy.resize(rng[t].second - rng[t].first);
          for (I i = rng[t].first; i < rng[t].second; i++) {
            if (i + PD1 < rng[t].second) __builtin_prefetch(&comb[SA[i + PD1]], 0, 0);
            I c = (I)(comb[SA[i]] >> 1);
            sy[i - rng[t].first] = c;
            cnts[t][c]++;
          }
        }
      });
      std::vector<std::vector<I>> cur(T);
      for (int t = T - 1; t >= 0; t--) {
        cur[t] = bkt;
        for (int u = T - 1; u > t; u--)
          for (I c = 0; c < K; c++) cur[t][c] -= cnts[u][c];
      }
      // snapshot sources: placements may overwrite SA[0..n1) slots of other
      // chunks, so buffer each chunk's positions first
      std::vector<std::vector<I>> poss(T);
      par_chunks<int>(T, 0, T, [&](int, int a0, int b0) {
        for (int t = a0; t < b0; t++) {
          poss[t].assign(SA + rng[t].first, SA + rng[t].second);
        }
      });
      memset(SA, 0xFF, (size_t)n1 * sizeof(I));
      par_chunks<int>(T, 0, T, [&](int, int a0, int b0) {
        for (int t = a0; t < b0; t++) {
          auto &cu = cur[t];
          auto &sy = syms[t];
          auto &po = poss[t];
          for (I i = (I)po.size() - 1; i >= 0; i--) SA[--cu[sy[i]]] = po[i];
        }
      });
    } else {
      for (I i = n1 - 1; i >= 0; i--) {
        I j = SA[i];
        SA[i] = -1;
        SA[--bkt[comb[j] >> 1]] = j;
      }
    }
    induce_any();
  }
};

template <typename I, typename CT, typename CC>
static int gsa_bwt_top(const uint8_t *seq, int64_t n, int64_t m, uint8_t *out) {
  int T = sais_threads();
  // remap: separator #j -> 1+j, regular c -> 1+m-1+c; append sentinel 0
  std::vector<CT> s(n + 1);
  {
    // separator ordinals via a sequential scan would serialize; count
    // separators per chunk first, then remap chunks in parallel
    std::vector<int64_t> sep_before(T + 1, 0);
    std::vector<std::pair<int64_t, int64_t>> bounds(T);
    for (int t = 0; t < T; t++)
      bounds[t] = {n * t / T, n * (t + 1) / T};
    par_chunks<int64_t>(T, 0, (int64_t)T, [&](int, int64_t a0, int64_t b0) {
      for (int64_t t = a0; t < b0; t++) {
        int64_t c = 0;
        for (int64_t i = bounds[t].first; i < bounds[t].second; i++)
          if (seq[i] == 0) c++;
        sep_before[t + 1] = c;
      }
    });
    for (int t = 0; t < T; t++) sep_before[t + 1] += sep_before[t];
    par_chunks<int64_t>(T, 0, (int64_t)T, [&](int, int64_t a0, int64_t b0) {
      for (int64_t t = a0; t < b0; t++) {
        int64_t j = sep_before[t];
        for (int64_t i = bounds[t].first; i < bounds[t].second; i++)
          s[i] = seq[i] == 0 ? (CT)(1 + j++) : (CT)(m + seq[i]);
      }
    });
    s[n] = 0;
  }
  std::vector<I> SA(n + 1);
  SaisLevel<I, CC> top;
  top.SA = SA.data();
  top.n = (I)(n + 1);
  top.K = (I)(m + 6);
  top.threads = T;
  top.classify(s.data());
  { std::vector<CT>().swap(s); }  // comb supersedes s; free n*sizeof(CT)
  top.count_symbols();
  top.core();
  // SA[0] is the sentinel suffix; SA[1..n] is the GSA of seq.
  par_chunks<int64_t>(T, 0, n, [&](int, int64_t a, int64_t b) {
    for (int64_t i = a; i < b; i++) {
      if (i + 32 < b) {
        I pp = SA[i + 33];
        __builtin_prefetch(&seq[pp == 0 ? n - 1 : pp - 1], 0, 0);
      }
      I p = SA[i + 1];
      out[i] = seq[p == 0 ? n - 1 : p - 1];
    }
  });
  return 0;
}

template <typename I>
static int gsa_bwt_impl(const uint8_t *seq, int64_t n, uint8_t *out) {
  int64_t m = 0;
  for (int64_t i = 0; i < n; i++)
    if (seq[i] == 0) m++;
  if (m == 0 || seq[n - 1] != 0) return -1;
  // narrowest comb type that fits (alphabet m+6, one extra type bit)
  if (m + 6 <= 256) return gsa_bwt_top<I, uint8_t, uint16_t>(seq, n, m, out);
  if (2 * (m + 6) <= 65536) return gsa_bwt_top<I, uint16_t, uint16_t>(seq, n, m, out);
  if (2 * (m + 6) <= (int64_t)1 << 32) return gsa_bwt_top<I, uint32_t, uint32_t>(seq, n, m, out);
  return gsa_bwt_top<I, I, I>(seq, n, m, out);
}

}  // namespace

extern "C" {

int rb3t_gsa_bwt(const uint8_t *seq, int64_t n, uint8_t *out) {
  if (n <= 0) return 0;
  if (n + 1 < (int64_t)1 << 31) return gsa_bwt_impl<int32_t>(seq, n, out);
  return gsa_bwt_impl<int64_t>(seq, n, out);
}

}
