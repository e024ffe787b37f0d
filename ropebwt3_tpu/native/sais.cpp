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
//    the entry PD2 ahead once its comb word is cheap to read.
//
// Equivalence with the Python spec (construct/sa.py prefix-doubling) is
// property-tested in tests/test_jax_engine.py.

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

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
  std::vector<I> bkt;    // bucket boundaries, size K+1

  bool is_lms(I i) const { return i > 0 && (comb[i] & 1) && !(comb[i - 1] & 1); }

  template <typename CT>
  void classify(const CT *s) {
    comb.resize(n);
    comb[n - 1] = (CC)((s[n - 1] << 1) | 1);
    for (I i = n - 2; i >= 0; i--) {
      CC tb = (s[i] < s[i + 1] || (s[i] == s[i + 1] && (comb[i + 1] & 1))) ? 1 : 0;
      comb[i] = (CC)((s[i] << 1) | tb);
    }
  }

  void count_symbols() {
    cnt.assign(K, 0);
    for (I i = 0; i < n; i++) cnt[comb[i] >> 1]++;
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

  void induce() {
    const CC *cb = comb.data();
    // induce L-type from sorted LMS/S placements
    bucket_bounds(false);  // heads
    for (I i = 0; i < n; i++) {
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
    // induce S-type
    bucket_bounds(true);  // ends
    for (I i = n - 1; i >= 0; i--) {
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

  template <typename CT>
  void run(const CT *s) {
    classify(s);
    count_symbols();
    core();
  }

  void core() {
    // ---- step 1: sort LMS suffixes by induced sorting of LMS substrings
    for (I i = 0; i < n; i++) SA[i] = -1;
    bucket_bounds(true);
    for (I i = n - 1; i > 0; i--)
      if (is_lms(i)) SA[--bkt[comb[i] >> 1]] = i;
    induce();

    // ---- step 2: name sorted LMS substrings
    I n1 = 0;
    for (I i = 0; i < n; i++)
      if (is_lms(SA[i])) SA[n1++] = SA[i];
    for (I i = n1; i < n; i++) SA[i] = -1;
    I name = 0, prev = -1;
    for (I i = 0; i < n1; i++) {
      I pos = SA[i];
      bool diff = false;
      if (prev < 0) {
        diff = true;
      } else {
        for (I d = 0;; d++) {
          if (comb[pos + d] != comb[prev + d]) {  // symbol or type differs
            diff = true;
            break;
          }
          if (d > 0) {
            bool l1 = is_lms(pos + d), l2 = is_lms(prev + d);
            if (l1 || l2) { diff = !(l1 && l2); break; }
          }
        }
      }
      if (diff) { name++; prev = pos; }
      SA[n1 + pos / 2] = name - 1;
    }
    for (I i = n - 1, j = n - 1; i >= n1; i--)
      if (SA[i] >= 0) SA[j--] = SA[i];

    // ---- step 3: recurse if names are not yet unique
    I *s1 = SA + n - n1;
    if (name < n1) {
      SaisLevel<I, I> sub;
      sub.SA = SA;
      sub.n = n1;
      sub.K = name;
      sub.run(s1);  // own scratch; our comb/cnt stay valid
    } else {
      for (I i = 0; i < n1; i++) SA[s1[i]] = i;
    }

    // ---- step 4: induce the full SA from the sorted LMS order
    // rewrite s1 to hold LMS positions left-to-right
    for (I i = 1, j = 0; i < n; i++)
      if (is_lms(i)) s1[j++] = i;
    for (I i = 0; i < n1; i++) SA[i] = s1[SA[i]];
    for (I i = n1; i < n; i++) SA[i] = -1;
    bucket_bounds(true);
    for (I i = n1 - 1; i >= 0; i--) {
      I j = SA[i];
      SA[i] = -1;
      SA[--bkt[comb[j] >> 1]] = j;
    }
    induce();
  }
};

template <typename I, typename CT, typename CC>
static int gsa_bwt_top(const uint8_t *seq, int64_t n, int64_t m, uint8_t *out) {
  // remap: separator #j -> 1+j, regular c -> 1+m-1+c; append sentinel 0
  std::vector<CT> s(n + 1);
  int64_t j = 0;
  for (int64_t i = 0; i < n; i++)
    s[i] = seq[i] == 0 ? (CT)(1 + j++) : (CT)(m + seq[i]);
  s[n] = 0;
  std::vector<I> SA(n + 1);
  SaisLevel<I, CC> top;
  top.SA = SA.data();
  top.n = (I)(n + 1);
  top.K = (I)(m + 6);
  top.classify(s.data());
  { std::vector<CT>().swap(s); }  // comb supersedes s; free n*sizeof(CT)
  top.count_symbols();
  top.core();
  // SA[0] is the sentinel suffix; SA[1..n] is the GSA of seq.
  for (int64_t i = 0; i < n; i++) {
    I p = SA[i + 1];
    out[i] = seq[p == 0 ? n - 1 : p - 1];
  }
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
