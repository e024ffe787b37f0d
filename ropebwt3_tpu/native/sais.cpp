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
// Equivalence with the Python spec (construct/sa.py prefix-doubling) is
// property-tested in tests/test_jax_engine.py.

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

template <typename I, typename CT>
struct SaisLevel {
  const CT *s;  // string values in [0, K); CT is uint8/uint16 at the top
                // level when the alphabet permits (the big bandwidth lever:
                // induce passes random-read s[j] for every SA entry)
  I *SA;
  I n;  // length including the level's sentinel at s[n-1]
  I K;  // alphabet size; values in [0, K), s[n-1] == 0 unique

  std::vector<uint8_t> t;    // 1 = S-type, 0 = L-type
  std::vector<I> cnt;        // per-symbol counts, size K (computed once)
  std::vector<I> bkt;        // bucket boundaries, size K+1

  bool is_lms(I i) const { return i > 0 && t[i] && !t[i - 1]; }

  void classify() {
    t.assign(n, 0);
    t[n - 1] = 1;
    for (I i = n - 2; i >= 0; i--)
      t[i] = (s[i] < s[i + 1] || (s[i] == s[i + 1] && t[i + 1])) ? 1 : 0;
  }

  void count_symbols() {
    cnt.assign(K, 0);
    for (I i = 0; i < n; i++) cnt[s[i]]++;
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

  void induce() {
    // induce L-type from sorted LMS/S placements
    bucket_bounds(false);  // heads
    for (I i = 0; i < n; i++) {
      I j = SA[i];
      if (j <= 0) continue;  // -1 empty or j == 0 (no predecessor)
      j--;
      if (!t[j]) SA[bkt[s[j]]++] = j;
    }
    // induce S-type
    bucket_bounds(true);  // ends
    for (I i = n - 1; i >= 0; i--) {
      I j = SA[i];
      if (j <= 0) continue;
      j--;
      if (t[j]) SA[--bkt[s[j]]] = j;
    }
  }

  void run() {
    classify();
    count_symbols();
    // ---- step 1: sort LMS suffixes by induced sorting of LMS substrings
    for (I i = 0; i < n; i++) SA[i] = -1;
    bucket_bounds(true);
    for (I i = n - 1; i > 0; i--)
      if (is_lms(i)) SA[--bkt[s[i]]] = i;
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
          if (s[pos + d] != s[prev + d] || t[pos + d] != t[prev + d]) {
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
      sub.s = s1;
      sub.SA = SA;
      sub.n = n1;
      sub.K = name;
      sub.run();  // own scratch; our t/cnt stay valid
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
      SA[--bkt[s[j]]] = j;
    }
    induce();
  }
};

template <typename I, typename CT>
static int gsa_bwt_top(const uint8_t *seq, int64_t n, int64_t m, uint8_t *out) {
  // remap: separator #j -> 1+j, regular c -> 1+m-1+c; append sentinel 0
  std::vector<CT> s(n + 1);
  int64_t j = 0;
  for (int64_t i = 0; i < n; i++)
    s[i] = seq[i] == 0 ? (CT)(1 + j++) : (CT)(m + seq[i]);
  s[n] = 0;
  std::vector<I> SA(n + 1);
  SaisLevel<I, CT> top;
  top.s = s.data();
  top.SA = SA.data();
  top.n = (I)(n + 1);
  top.K = (I)(m + 6);
  top.run();
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
  // narrowest character type that fits the remapped alphabet m+6
  if (m + 6 <= 256) return gsa_bwt_top<I, uint8_t>(seq, n, m, out);
  if (m + 6 <= 65536) return gsa_bwt_top<I, uint16_t>(seq, n, m, out);
  return gsa_bwt_top<I, I>(seq, n, m, out);
}

}  // namespace

extern "C" {

int rb3t_gsa_bwt(const uint8_t *seq, int64_t n, uint8_t *out) {
  if (n <= 0) return 0;
  if (n + 1 < (int64_t)1 << 31) return gsa_bwt_impl<int32_t>(seq, n, out);
  return gsa_bwt_impl<int64_t>(seq, n, out);
}

}
