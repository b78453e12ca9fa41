// ravvent_tpu native host kernels.
//
// C++ replacements for the reference's external native dependencies
// (SURVEY.md §2.2): Biopython pairwise2 local alignment (merger overlaps),
// a minimap2-style identity fallback (banded global alignment), and the
// Scrappie-derived event detector's hot per-sample scan.
//
// Built as a plain shared library (no pybind11), loaded via ctypes from
// ravvent_tpu/ops/native.py. All semantics mirror the Python reference
// implementations in this repo, which are themselves behavior-parity ports
// of the upstream reference (see ravvent_tpu/data/event_detector.py and
// ravvent_tpu/assembly/alignment.py); parity is enforced by tests.

#include <cstdint>
#include <string>
#include <cstring>
#include <cmath>
#include <vector>
#include <algorithm>
#include <limits>

namespace {

constexpr double kFltMin = 1.17549435e-38;
constexpr double kFltMax = 3.40282347e38;
constexpr double kNeg = -1e30;

inline uint32_t u32(int64_t v) { return static_cast<uint32_t>(v); }
inline int32_t i32(int64_t v) { return static_cast<int32_t>(static_cast<uint32_t>(v)); }

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// Event detection: faithful streaming scan (parity with
// ravvent_tpu.data.event_detector.StreamingEventDetector).
// Writes (start, length, mean, stdv) quadruples into `out` (4 * max_events
// doubles); returns the number of events.
// ---------------------------------------------------------------------------
long rv_detect_events(const double* raw, long n, int w1, int w2,
                      double threshold1, double threshold2, double peak_height,
                      double* out, long max_events) {
  const int BUF_LEN = 1 + 2 * w2;
  std::vector<double> sum(BUF_LEN, 0.0), sumsq(BUF_LEN, 0.0);

  uint32_t t = 1;
  uint32_t evt_st = 0;
  double evt_st_sum = 0.0, evt_st_sumsq = 0.0;
  uint32_t buf_mid = 0;

  struct Det {
    double threshold;
    int window_length;
    uint32_t masked_to;
    int32_t peak_pos;
    double peak_value;
    bool valid_peak;
  };
  Det sd{threshold1, w1, 0, -1, kFltMax, false};
  Det ld{threshold2, w2, 0, -1, kFltMax, false};

  long n_events = 0;

  auto compute_tstat = [&](int w) -> double {
    if (t <= static_cast<uint32_t>(2 * w) || w < 2) return 0.0;
    double wf = static_cast<double>(w);
    uint32_t i = buf_mid % BUF_LEN;
    uint32_t st = u32(static_cast<int64_t>(buf_mid) - w) % BUF_LEN;
    uint32_t en = u32(static_cast<int64_t>(buf_mid) + w) % BUF_LEN;
    double sum1 = sum[i] - sum[st];
    double sumsq1 = sumsq[i] - sumsq[st];
    double sum2 = sum[en] - sum[i];
    double sumsq2 = sumsq[en] - sumsq[i];
    double mean1 = sum1 / wf, mean2 = sum2 / wf;
    double comb = sumsq1 / wf - mean1 * mean1 + sumsq2 / wf - mean2 * mean2;
    comb = std::max(comb, kFltMin);
    return std::fabs(mean2 - mean1) / std::sqrt(comb / wf);
  };

  auto detect_peak = [&](double value, Det& det) -> bool {
    if (det.masked_to >= buf_mid) return false;
    if (det.peak_pos == -1) {
      if (value < det.peak_value) {
        det.peak_value = value;
      } else if (value - det.peak_value > peak_height) {
        det.peak_value = value;
        det.peak_pos = i32(buf_mid);
      }
    } else {
      if (value > det.peak_value) {
        det.peak_value = value;
        det.peak_pos = i32(buf_mid);
      }
      if (det.window_length == sd.window_length) {  // short detector masks long
        if (det.peak_value > det.threshold) {
          ld.masked_to = u32(static_cast<int64_t>(det.peak_pos) + det.window_length);
          ld.peak_pos = -1;
          ld.peak_value = kFltMax;
          ld.valid_peak = false;
        }
      }
      if (det.peak_value - value > peak_height && det.peak_value > det.threshold)
        det.valid_peak = true;
      // u32 - i32 comparison done in double like Python ints (values small
      // in practice; wraparound cases use the same arithmetic as Python)
      double dist = static_cast<double>(buf_mid) - static_cast<double>(det.peak_pos);
      if (det.valid_peak && dist > det.window_length / 2.0) {
        det.peak_pos = -1;
        det.peak_value = value;
        det.valid_peak = false;
        return true;
      }
    }
    return false;
  };

  auto create_event = [&](int64_t evt_en_raw) -> bool {
    uint32_t evt_en = u32(evt_en_raw);
    uint32_t evt_en_buf = evt_en % BUF_LEN;
    double length = static_cast<double>(evt_en) - static_cast<double>(evt_st);
    if (length < kFltMin) return false;
    double mean = (sum[evt_en_buf] - evt_st_sum) / length;
    double deltasqr = sumsq[evt_en_buf] - evt_st_sumsq;
    double stdv = std::sqrt(std::max(deltasqr / length - mean * mean, kFltMin));
    if (n_events < max_events) {
      out[4 * n_events + 0] = static_cast<double>(evt_st);
      out[4 * n_events + 1] = std::trunc(length);
      out[4 * n_events + 2] = mean;
      out[4 * n_events + 3] = stdv;
      ++n_events;
    }
    evt_st = evt_en;
    evt_st_sum = sum[evt_en_buf];
    evt_st_sumsq = sumsq[evt_en_buf];
    return true;
  };

  for (long k = 0; k < n; ++k) {
    double s = raw[k];
    uint32_t t_mod = t % BUF_LEN;
    uint32_t prev = t_mod > 0 ? t_mod - 1 : BUF_LEN - 1;
    sum[t_mod] = sum[prev] + s;
    sumsq[t_mod] = sumsq[prev] + s * s;
    t = u32(static_cast<int64_t>(t) + 1);
    buf_mid = u32(static_cast<int64_t>(t) - BUF_LEN / 2 - 1);
    double t1v = compute_tstat(w1);
    double t2v = compute_tstat(w2);
    bool p1 = detect_peak(t1v, sd);
    bool p2 = detect_peak(t2v, ld);
    if (p1 || p2) {
      create_event(static_cast<int64_t>(buf_mid) - w1 + 1);
    }
  }
  return n_events;
}

// ---------------------------------------------------------------------------
// Local alignment (Smith-Waterman-Gotoh, pairwise2 conventions).
// Returns the gapped length (0 => no positive alignment). out1/out2 must
// hold len1+len2+1 chars. Tie-breaking identical to the Python oracle:
// H-candidates in order diag > up(F) > left(E) with strict '>' against the
// running best (initialized to the restart value); within E/F, extension
// wins only on '>'.
//
// Positional prior (offset_w > 0): restarting a local alignment on diagonal
// d = i - j costs offset_w * |d - exp_offset| instead of 0 — alignments are
// biased toward a known expected offset. On (near-)periodic sequence the
// maximum-score local alignment is systematically the WRONG period shift
// (it aligns more columns than the true overlap), so the overlap merge
// deletes one period per junction; the prior makes the geometrically
// expected shift win unless the data strongly contradicts it.
// offset_w <= 0 reproduces plain Smith-Waterman exactly.
// ---------------------------------------------------------------------------
long rv_local_align(const char* s1, long n, const char* s2, long m,
                    double match, double mismatch,
                    double gap_open, double gap_extend,
                    const double* submat /* 16 doubles ACGT x ACGT or null */,
                    double exp_offset, double offset_w,
                    char* out1, char* out2,
                    double* score_out, long* begin_out, long* end_out) {
  if (n == 0 || m == 0) return 0;
  auto sub = [&](char a, char b) -> double {
    if (!submat) return a == b ? match : mismatch;
    auto idx = [](char c) -> int {
      switch (c) {
        case 'A': case 'a': return 0;
        case 'C': case 'c': return 1;
        case 'G': case 'g': return 2;
        case 'T': case 't': return 3;
      }
      return 0;
    };
    return submat[idx(a) * 4 + idx(b)];
  };

  const bool use_prior = offset_w > 0.0;
  auto restart = [&](long i, long j) -> double {
    return use_prior ? -offset_w * std::abs((double)(i - j) - exp_offset) : 0.0;
  };
  const long W = m + 1;
  std::vector<double> H((n + 1) * W, 0.0), E((n + 1) * W, kNeg), F((n + 1) * W, kNeg);
  std::vector<int8_t> TB((n + 1) * W, 0), TE((n + 1) * W, 0), TF((n + 1) * W, 0);
  if (use_prior) {
    for (long j = 0; j <= m; ++j) H[j] = restart(0, j);
    for (long i = 1; i <= n; ++i) H[i * W] = restart(i, 0);
  }

  double best_score = 0.0;
  long bi = 0, bj = 0;
  for (long i = 1; i <= n; ++i) {
    double e = kNeg;
    for (long j = 1; j <= m; ++j) {
      const long c = i * W + j;
      double f_open = H[(i - 1) * W + j] + gap_open;
      double f_ext = F[(i - 1) * W + j] + gap_extend;
      if (f_ext > f_open) { F[c] = f_ext; TF[c] = 1; } else { F[c] = f_open; TF[c] = 0; }
      double e_open = H[c - 1] + gap_open;
      double e_ext = e + gap_extend;
      if (e_ext > e_open) { e = e_ext; TE[c] = 1; } else { e = e_open; TE[c] = 0; }
      E[c] = e;
      double bestv = restart(i, j);
      int8_t tb = 0;
      double d = H[(i - 1) * W + (j - 1)] + sub(s1[i - 1], s2[j - 1]);
      if (d > bestv) { bestv = d; tb = 1; }
      if (F[c] > bestv) { bestv = F[c]; tb = 2; }
      if (e > bestv) { bestv = e; tb = 3; }
      H[c] = bestv;
      TB[c] = tb;
      if (bestv > best_score) { best_score = bestv; bi = i; bj = j; }
    }
  }
  if (best_score <= 0.0) return 0;

  // traceback
  std::vector<char> c1, c2;
  long i = bi, j = bj;
  int state = 0;  // 0=H, 1=F, 2=E
  while (i > 0 || j > 0) {
    const long c = i * W + j;
    if (state == 0) {
      int8_t tb = TB[c];
      if (tb == 0) break;
      if (tb == 1) { c1.push_back(s1[i - 1]); c2.push_back(s2[j - 1]); --i; --j; }
      else if (tb == 2) state = 1;
      else state = 2;
    } else if (state == 1) {
      c1.push_back(s1[i - 1]); c2.push_back('-');
      int8_t ext = TF[c];
      --i;
      state = ext ? 1 : 0;
    } else {
      c1.push_back('-'); c2.push_back(s2[j - 1]);
      int8_t ext = TE[c];
      --j;
      state = ext ? 2 : 0;
    }
  }
  long st1 = i, st2 = j;
  std::reverse(c1.begin(), c1.end());
  std::reverse(c2.begin(), c2.end());

  // pairwise2-style full-length layout
  long pos = 0;
  auto put = [&](char* o1, char* o2, char a, char b) { o1[pos] = a; o2[pos] = b; ++pos; };
  for (long k = 0; k < st1; ++k) put(out1, out2, s1[k], '-');
  for (long k = 0; k < st2; ++k) put(out1, out2, '-', s2[k]);
  long begin = pos;
  for (size_t k = 0; k < c1.size(); ++k) put(out1, out2, c1[k], c2[k]);
  long end = pos;
  for (long k = bi; k < n; ++k) put(out1, out2, s1[k], '-');
  for (long k = bj; k < m; ++k) put(out1, out2, '-', s2[k]);
  out1[pos] = '\0';
  out2[pos] = '\0';
  *score_out = best_score;
  *begin_out = begin;
  *end_out = end;
  return pos;
}

}  // extern "C"

namespace {

// Banded global alignment (Gotoh affine, pairwise2 gap convention) with
// traceback-based (matches, columns) counting. Core shared by the
// whole-read identity fallback (rv_banded_global) and the seed-chain-extend
// mapper's per-chain extension (rv_map_read).
// Returns 1 on success (path stayed representable), 0 on failure.
int banded_global_core(const char* q, long n, const char* r, long m,
                       double match, double mismatch,
                       double gap_open, double gap_extend, long band,
                       long* matches_out, long* cols_out, double* score_out) {
  if (n == 0 || m == 0) {
    *matches_out = 0; *cols_out = std::max(n, m); *score_out = 0.0;
    return 1;
  }
  if (band <= 0) band = std::max<long>(128, std::labs(n - m) + 128);
  const long W = 2 * band + 1;
  auto center = [&](long i) -> long { return (i * m) / n; };

  std::vector<double> H(W, kNeg), E(W, kNeg), F(W, kNeg);
  std::vector<double> Hn(W), En(W), Fn(W);
  // packed traceback: 2 bits move (0 diag, 1 up, 2 left, 3 none) + E/F ext bits
  std::vector<uint8_t> TBall((n + 1) * W, 3 << 0);

  // row 0
  {
    long c0 = center(0);
    for (long k = 0; k < W; ++k) {
      long j = c0 - band + k;
      if (j < 0 || j > m) continue;
      if (j == 0) H[k] = 0.0;
      else {
        H[k] = gap_open + (j - 1) * gap_extend;
        E[k] = H[k];
        TBall[k] = 2;  // left
      }
    }
  }

  for (long i = 1; i <= n; ++i) {
    long ci = center(i), cp = center(i - 1);
    long shift = ci - cp;
    std::fill(Hn.begin(), Hn.end(), kNeg);
    std::fill(En.begin(), En.end(), kNeg);
    std::fill(Fn.begin(), Fn.end(), kNeg);
    double e = kNeg;
    uint8_t* TBrow = &TBall[i * W];
    for (long k = 0; k < W; ++k) {
      long j = ci - band + k;
      if (j < 0 || j > m) { e = kNeg; continue; }
      long kp = k + shift;       // (i-1, j) position in previous row coords
      long kpd = k + shift - 1;  // (i-1, j-1)
      double h_up = (kp >= 0 && kp < W) ? H[kp] : kNeg;
      double f_up = (kp >= 0 && kp < W) ? F[kp] : kNeg;
      double h_dg = (kpd >= 0 && kpd < W) ? H[kpd] : kNeg;

      double f_open = h_up + gap_open;
      double f_ext = f_up + gap_extend;
      uint8_t f_bit = 0;
      double f;
      if (f_ext > f_open) { f = f_ext; f_bit = 1; } else { f = f_open; }
      Fn[k] = f;

      double e_open = (k > 0 ? Hn[k - 1] : kNeg) + gap_open;
      double e_ext = e + gap_extend;
      uint8_t e_bit = 0;
      if (e_ext > e_open) { e = e_ext; e_bit = 1; } else { e = e_open; }
      En[k] = e;

      double d = kNeg;
      bool can_d = (j >= 1);
      if (can_d && h_dg > kNeg / 2) d = h_dg + ((q[i - 1] == r[j - 1]) ? match : mismatch);

      double bestv = d;
      uint8_t mv = 0;
      if (f > bestv) { bestv = f; mv = 1; }
      if (e > bestv) { bestv = e; mv = 2; }
      Hn[k] = bestv;
      TBrow[k] = static_cast<uint8_t>(mv | (e_bit << 2) | (f_bit << 3));
    }
    H.swap(Hn); E.swap(En); F.swap(Fn);
  }

  long kf = m - center(n) + band;
  if (kf < 0 || kf >= W || H[kf] < kNeg / 2) return 0;
  *score_out = H[kf];

  // traceback counting matches/columns
  long i = n, k = kf;
  long matches = 0, cols = 0;
  int state = 0;  // 0 H, 1 F(up), 2 E(left)
  while (i > 0 || (center(i) - band + k) > 0) {
    long j = center(i) - band + k;
    if (j < 0) return 0;
    if (i == 0) {  // only left moves remain
      matches += 0; cols += j;
      break;
    }
    if (j == 0) {  // only up moves remain
      cols += i;
      break;
    }
    uint8_t tb = TBall[i * W + k];
    uint8_t mv = state == 0 ? (tb & 3) : (state == 1 ? 1 : 2);
    if (state == 1) { /* in F run */ }
    if (mv == 0) {
      if (q[i - 1] == r[j - 1]) ++matches;
      ++cols;
      long shift = center(i) - center(i - 1);
      k = k + shift - 1;
      --i;
      state = 0;
    } else if (mv == 1) {
      ++cols;
      uint8_t ext = (tb >> 3) & 1;
      long shift = center(i) - center(i - 1);
      k = k + shift;
      --i;
      state = ext ? 1 : 0;
    } else if (mv == 2) {
      ++cols;
      uint8_t ext = (tb >> 2) & 1;
      k = k - 1;
      state = ext ? 2 : 0;
    } else {
      return 0;  // hit an uninitialized cell
    }
    if (k < 0 || k >= W) return 0;
  }
  *matches_out = matches;
  *cols_out = cols;
  return 1;
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// Banded global alignment — the built-in whole-read identity metric used
// when minimap2 is unavailable (thin wrapper over banded_global_core).
// ---------------------------------------------------------------------------
int rv_banded_global(const char* q, long n, const char* r, long m,
                     double match, double mismatch,
                     double gap_open, double gap_extend, long band,
                     long* matches_out, long* cols_out, double* score_out) {
  return banded_global_core(q, n, r, m, match, mismatch, gap_open, gap_extend,
                            band, matches_out, cols_out, score_out);
}

}  // extern "C"

namespace {

// Internal Smith-Waterman-Gotoh core (pairwise2 conventions) returning the
// full-length gapped pair. Tie-breaking matches the Python oracle exactly
// (see rv_local_align docs). Returns gapped length, 0 if no positive score.
// `meta4` (optional): writes {st1, st2, bi, bj} — the aligned block spans
// s1[st1:bi] and s2[st2:bj] — so callers can reason about alignment
// geometry (the merge fold's arbitration gate) without re-parsing the
// gapped strings.
long local_align_core(const char* s1, long n, const char* s2, long m,
                      double match, double mismatch,
                      double gap_open, double gap_extend,
                      const double* submat,
                      double exp_offset, double offset_w,
                      std::string& o1, std::string& o2, double* score_out,
                      long* meta4 = nullptr) {
  if (n == 0 || m == 0) return 0;
  const bool use_prior = offset_w > 0.0;
  auto restart = [&](long i, long j) -> double {
    return use_prior ? -offset_w * std::abs((double)(i - j) - exp_offset) : 0.0;
  };
  auto sub = [&](char a, char b) -> double {
    if (!submat) return a == b ? match : mismatch;
    auto idx = [](char c) -> int {
      switch (c) {
        case 'A': case 'a': return 0;
        case 'C': case 'c': return 1;
        case 'G': case 'g': return 2;
        case 'T': case 't': return 3;
      }
      return 0;
    };
    return submat[idx(a) * 4 + idx(b)];
  };
  const long W = m + 1;
  // This runs once per snippet in the merge fold (~3k calls per read), so
  // per-call heap churn dominates the 25x25 DP itself: score rows roll
  // (only H/F of the previous row are ever read back; E is a running
  // register), and the traceback lives in thread-local scratch with only
  // its row-0/col-0 boundaries cleared. Traceback is packed into one byte
  // per cell (bits 0-1: H move, bit 2: E-extend, bit 3: F-extend) — one
  // store per cell instead of three.
  static thread_local std::vector<uint8_t> tb_buf;
  static thread_local std::vector<double> row_buf;
  const size_t cells = (size_t)(n + 1) * W;
  if (tb_buf.size() < cells) tb_buf.resize(cells);
  if (row_buf.size() < (size_t)(4 * W)) row_buf.resize(4 * W);
  uint8_t* TB = tb_buf.data();
  double* Hprev = row_buf.data();
  double* Hcur = Hprev + W;
  double* Fprev = Hcur + W;
  double* Fcur = Fprev + W;
  for (long j = 0; j < W; ++j) { Hprev[j] = restart(0, j); Fprev[j] = kNeg; }
  std::memset(TB, 0, W);  // row 0: traceback stops
  double best_score = 0.0;
  long bi = 0, bj = 0;
  for (long i = 1; i <= n; ++i) {
    double e = kNeg;
    Hcur[0] = restart(i, 0);
    Fcur[0] = kNeg;
    TB[i * W] = 0;  // col 0 boundary
    const char a = s1[i - 1];
    // Branchless cell update: every comparison here is ~50/50 on real data,
    // so the naive if-chains pay constant mispredicts (~16ns/cell measured);
    // ternaries compile to cmov/maxsd. Tie-breaking (strict '>') is
    // identical to the Python oracle.
    for (long j = 1; j <= m; ++j) {
      const double f_open = Hprev[j] + gap_open;
      const double f_ext = Fprev[j] + gap_extend;
      const bool fx = f_ext > f_open;
      const double f = fx ? f_ext : f_open;
      Fcur[j] = f;
      const double e_open = Hcur[j - 1] + gap_open;
      const double e_ext = e + gap_extend;
      const bool ex = e_ext > e_open;
      e = ex ? e_ext : e_open;
      const double d = Hprev[j - 1] + sub(a, s2[j - 1]);
      const double r = restart(i, j);
      double bestv = d > r ? d : r;
      uint8_t tb = d > r ? 1 : 0;
      const bool bf = f > bestv;
      bestv = bf ? f : bestv;
      tb = bf ? 2 : tb;
      const bool be = e > bestv;
      bestv = be ? e : bestv;
      tb = be ? 3 : tb;
      Hcur[j] = bestv;
      TB[i * W + j] = tb | (uint8_t)(ex ? 4 : 0) | (uint8_t)(fx ? 8 : 0);
      const bool bb = bestv > best_score;
      best_score = bb ? bestv : best_score;
      bi = bb ? i : bi;
      bj = bb ? j : bj;
    }
    std::swap(Hprev, Hcur);
    std::swap(Fprev, Fcur);
  }
  if (best_score <= 0.0) return 0;
  std::vector<char> c1, c2;
  long i = bi, j = bj;
  int state = 0;
  while (i > 0 || j > 0) {
    const uint8_t cell = TB[i * W + j];
    if (state == 0) {
      uint8_t tb = cell & 3;
      if (tb == 0) break;
      if (tb == 1) { c1.push_back(s1[i - 1]); c2.push_back(s2[j - 1]); --i; --j; }
      else if (tb == 2) state = 1;
      else state = 2;
    } else if (state == 1) {
      c1.push_back(s1[i - 1]); c2.push_back('-');
      --i;
      state = (cell & 8) ? 1 : 0;
    } else {
      c1.push_back('-'); c2.push_back(s2[j - 1]);
      --j;
      state = (cell & 4) ? 2 : 0;
    }
  }
  long st1 = i, st2 = j;
  if (meta4) { meta4[0] = st1; meta4[1] = st2; meta4[2] = bi; meta4[3] = bj; }
  std::reverse(c1.begin(), c1.end());
  std::reverse(c2.begin(), c2.end());
  o1.clear(); o2.clear();
  o1.reserve(n + m); o2.reserve(n + m);
  for (long k = 0; k < st1; ++k) { o1.push_back(s1[k]); o2.push_back('-'); }
  for (long k = 0; k < st2; ++k) { o1.push_back('-'); o2.push_back(s2[k]); }
  for (size_t k = 0; k < c1.size(); ++k) { o1.push_back(c1[k]); o2.push_back(c2[k]); }
  for (long k = bi; k < n; ++k) { o1.push_back(s1[k]); o2.push_back('-'); }
  for (long k = bj; k < m; ++k) { o1.push_back('-'); o2.push_back(s2[k]); }
  *score_out = best_score;
  return (long)o1.size();
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// Whole-read overlap merge (the Merger.merge fold, reference merger.py:155-248)
// executed natively: snippet sequences concatenated in `seqs` with
// `offsets[n+1]` boundaries, per-base scores concatenated in `logits`.
// Writes merged sequence/logits; returns merged length (caller provides
// out_cap >= total chars + 26).
// ---------------------------------------------------------------------------
// `exp_overlaps` (null or n_snippets-1 doubles): expected number of
// overlapping BASES between snippet i and i+1 (from the snippet raw-span
// geometry). With `offset_w > 0` each pairwise alignment gets a positional
// prior anchored at that overlap (see local_align_core) — the fix for
// period-shifted merges on repetitive sequence. A negative entry disables
// the prior for that pair.
// `geom_tol` (>= 0 enables; < 0 reproduces the reference fold exactly):
// geometry-arbitration gate — a junction alignment is accepted only when
// the implied overlap start matches the geometric expectation within
// `geom_tol` bases AND it consumes ~the expected number of shared bases of
// the appended snippet; otherwise the junction splices geometrically
// (drop round(expected_overlap) bases of the appended snippet). Mirrors
// Merger.merge's python gate bit-for-bit (banker's rounding via nearbyint).
long rv_merge_read(const char* seqs, const long* offsets, const double* logits,
                   long n_snippets,
                   double match, double mismatch,
                   double gap_open, double gap_extend,
                   const double* submat, long overlap_len,
                   const double* exp_overlaps, double offset_w,
                   double geom_tol,
                   char* out_seq, double* out_logits, long out_cap) {
  if (n_snippets <= 0) return 0;
  std::string merged(seqs + offsets[0], seqs + offsets[1]);
  std::vector<double> mlog(logits + offsets[0], logits + offsets[1]);
  bool merge_flag = false;
  std::string a1, a2;
  for (long i = 1; i < n_snippets; ++i) {
    const char* app = seqs + offsets[i];
    long app_len = offsets[i + 1] - offsets[i];
    const double* app_log = logits + offsets[i];
    long ov1 = std::min<long>(overlap_len, (long)merged.size());
    long ov2 = std::min<long>(overlap_len, app_len);
    const char* s1 = merged.data() + merged.size() - ov1;
    const double* l1 = mlog.data() + mlog.size() - ov1;
    double score;
    double w = 0.0, exp_off = 0.0;
    const bool has_eo = exp_overlaps && exp_overlaps[i - 1] >= 0.0;
    if (has_eo && offset_w > 0.0) {
      double o = exp_overlaps[i - 1];
      if (o > (double)ov1) o = (double)ov1;
      exp_off = (double)ov1 - o;
      w = offset_w;
    }
    long meta[4] = {0, 0, 0, 0};
    long glen = local_align_core(s1, ov1, app, ov2, match, mismatch,
                                 gap_open, gap_extend, submat, exp_off, w,
                                 a1, a2, &score, meta);
    const bool arb = geom_tol >= 0.0 && has_eo;
    if (glen > 0 && arb) {
      // aligned block spans s1[st1:bi], s2[st2:bj] (see local_align_core)
      const double eo_c = std::min(exp_overlaps[i - 1],
                                   (double)std::min(ov1, ov2));
      const long implied = ov1 - meta[0];
      const long consumed2 = meta[3] - meta[1];
      if (std::abs((double)implied - eo_c) > geom_tol ||
          (double)consumed2 < eo_c - geom_tol)
        glen = 0;  // unusable -> geometric splice below
    }
    if (glen == 0 && arb) {
      long k = (long)std::nearbyint(exp_overlaps[i - 1]);
      if (k > app_len) k = app_len;
      if (k < 0) k = 0;
      merged.append(app + k, app + app_len);
      mlog.insert(mlog.end(), app_log + k, app_log + app_len);
      merge_flag = true;
      continue;
    }
    if (glen == 0) {
      if (!merge_flag) {
        merged.assign(app, app + app_len);
        mlog.assign(app_log, app_log + app_len);
        continue;
      } else {
        break;  // reference returns the accumulated merge immediately
      }
    }
    merge_flag = true;
    // gap-align logits and resolve columns by higher score
    std::string mseq;
    std::vector<double> mlg;
    std::vector<long> gapcols;  // columns only one window voted for
    mseq.reserve(glen);
    mlg.reserve(glen);
    long i1 = 0, i2 = 0;
    for (long k = 0; k < glen; ++k) {
      char n1 = a1[k], n2 = a2[k];
      double g1 = (n1 == '-') ? -1.0 : l1[i1++];
      double g2 = (n2 == '-') ? -1.0 : app_log[i2++];
      if (n1 == '-' || n2 == '-') gapcols.push_back(k);
      if (n1 == '-') { mseq.push_back(n2); mlg.push_back(g2); }
      else if (n2 == '-') { mseq.push_back(n1); mlg.push_back(g1); }
      else if (g2 > g1) { mseq.push_back(n2); mlg.push_back(g2); }
      else { mseq.push_back(n1); mlg.push_back(g1); }
    }
    if (arb && !gapcols.empty()) {
      // Length-constrained splice (mirrors Merger.merge, incl. the 1-column
      // TRIM_SLACK): geometry fixes the junction's true length at
      // ov1+ov2-round(overlap); drop the lowest-scoring gap-column bases
      // until the union is within the slack of it.
      const long kTrimSlack = 1;
      const double eo_c = std::min(exp_overlaps[i - 1],
                                   (double)std::min(ov1, ov2));
      const long target = ov1 + ov2 - (long)std::nearbyint(eo_c);
      long excess = (long)mseq.size() - target - kTrimSlack;
      if (excess > 0) {
        if (excess > (long)gapcols.size()) excess = (long)gapcols.size();
        std::stable_sort(gapcols.begin(), gapcols.end(),
                         [&](long x, long y) { return mlg[x] < mlg[y]; });
        std::vector<char> dropm(mseq.size(), 0);
        for (long k = 0; k < excess; ++k) dropm[gapcols[k]] = 1;
        std::string so;
        std::vector<double> lo;
        so.reserve(mseq.size());
        lo.reserve(mseq.size());
        for (size_t k = 0; k < mseq.size(); ++k)
          if (!dropm[k]) { so.push_back(mseq[k]); lo.push_back(mlg[k]); }
        mseq.swap(so);
        mlg.swap(lo);
      }
    }
    merged.resize(merged.size() - ov1);
    mlog.resize(mlog.size() - ov1);
    merged += mseq;
    merged.append(app + ov2, app + app_len);
    mlog.insert(mlog.end(), mlg.begin(), mlg.end());
    mlog.insert(mlog.end(), app_log + ov2, app_log + app_len);
  }
  long out_len = std::min<long>((long)merged.size(), out_cap - 1);
  std::memcpy(out_seq, merged.data(), out_len);
  out_seq[out_len] = '\0';
  std::memcpy(out_logits, mlog.data(), out_len * sizeof(double));
  return out_len;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Seed-chain-extend read mapper: the minimap2 substitute for the accuracy
// metric when minimap2 is not installed (reference invokes
// `minimap2 -x map-ont -c` at ravvent_mapping_evaluator.py:85-88 and sums
// PAF (matches, block_len) over all mapping lines at :90-108). Pipeline:
// minimizer seeds -> colinear anchor chaining (integer DP) -> per-chain
// banded affine (Gotoh) extension between the chain's terminal anchors.
// Query tails outside a chain are soft-clipped — NOT charged to block_len —
// which is the map-ont behavior the whole-read banded-global fallback could
// not reproduce (a garbage tail pays full gap cost under global alignment).
// Forward strand only (the caller maps the reverse complement separately).
// Semantics are mirrored exactly by the numpy oracle in
// ravvent_tpu/assembly/sce_mapper.py; parity is enforced by tests.
// ---------------------------------------------------------------------------

namespace {

// SplitMix64 finalizer: decorrelates k-mer codes so minimizer sampling is
// uniform (lexicographic minima would oversample poly-A).
inline uint64_t mix64(uint64_t x) {
  x += 0x9E3779B97F4A7C15ULL;
  x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9ULL;
  x = (x ^ (x >> 27)) * 0x94D049BB133111EBULL;
  return x ^ (x >> 31);
}

inline int base_code(char c) {
  switch (c) {
    case 'A': case 'a': return 0;
    case 'C': case 'c': return 1;
    case 'G': case 'g': return 2;
    case 'T': case 't': return 3;
  }
  return -1;
}

// (hash, position) minimizers of seq with window w: for each window of w
// consecutive k-mers keep the smallest hash (leftmost on ties), deduped.
// Windows containing a non-ACGT character are skipped.
void minimizers(const char* s, long n, int k, int w,
                std::vector<std::pair<uint64_t, long>>& out) {
  out.clear();
  if (n < k) return;
  const long nk = n - k + 1;
  std::vector<uint64_t> hash(nk, UINT64_MAX);  // UINT64_MAX = invalid k-mer
  uint64_t val = 0;
  const uint64_t mask = (k < 32) ? ((1ULL << (2 * k)) - 1) : ~0ULL;
  long run = 0;  // consecutive valid bases ending at i
  for (long i = 0; i < n; ++i) {
    int c = base_code(s[i]);
    if (c < 0) { run = 0; val = 0; continue; }
    val = ((val << 2) | (uint64_t)c) & mask;
    ++run;
    if (run >= k) hash[i - k + 1] = mix64(val);
  }
  if (nk < w) return;
  long last_pos = -1;
  for (long i = 0; i + w <= nk; ++i) {
    // leftmost minimum of hash[i : i+w] (rescan per window: k/w are small
    // and this runs on ~10-60kb read pairs, not genomes)
    long best = i;
    for (long j = i + 1; j < i + w; ++j)
      if (hash[j] < hash[best]) best = j;
    if (hash[best] == UINT64_MAX) continue;
    if (best != last_pos) {
      out.emplace_back(hash[best], best);
      last_pos = best;
    }
  }
}

inline int ilog2_u32(uint32_t v) {
  int r = 0;
  while (v >>= 1) ++r;
  return r;
}

struct ChainRow {
  long matches, cols, q_start, q_end, t_start, t_end;
};

// Full mapper on one strand; returns chains found (best first).
long map_read_core(const char* q, long n, const char* t, long m,
                   int k, int w, int max_occ,
                   long min_chain_score, int min_chain_anchors,
                   double a_match, double a_mismatch,
                   double a_gap_open, double a_gap_extend,
                   std::vector<ChainRow>& chains, long max_chains) {
  chains.clear();
  std::vector<std::pair<uint64_t, long>> tmin, qmin;
  minimizers(t, m, k, w, tmin);
  minimizers(q, n, k, w, qmin);
  if (tmin.empty() || qmin.empty()) return 0;

  // index target minimizers: sort by hash, then binary-search per query seed
  std::sort(tmin.begin(), tmin.end());

  // anchors (q_pos, t_pos), built in query order
  std::vector<std::pair<long, long>> anchors;
  for (auto& [h, qp] : qmin) {
    auto lo = std::lower_bound(tmin.begin(), tmin.end(),
                               std::make_pair(h, (long)-1));
    auto hi = lo;
    while (hi != tmin.end() && hi->first == h) ++hi;
    if (hi - lo > max_occ) continue;  // repetitive seed: drop entirely
    for (auto it = lo; it != hi; ++it) anchors.emplace_back(qp, it->second);
  }
  if (anchors.empty()) return 0;

  // chain DP over anchors sorted by (t, q) — minimap2-style but with pure
  // integer scoring so the numpy oracle can match bit-for-bit
  std::sort(anchors.begin(), anchors.end(),
            [](const auto& a, const auto& b) {
              return a.second != b.second ? a.second < b.second
                                          : a.first < b.first;
            });
  const long A = (long)anchors.size();
  const long MAX_DIST = 5000, MAX_BW = 500;
  const int WINDOW = 64;
  std::vector<long> f(A), parent(A, -1);
  for (long i = 0; i < A; ++i) {
    f[i] = k;
    const long qi = anchors[i].first, ti = anchors[i].second;
    for (long j = i - 1; j >= 0 && j >= i - WINDOW; --j) {
      const long dq = qi - anchors[j].first, dt = ti - anchors[j].second;
      if (dq <= 0 || dt <= 0) continue;
      if (dq > MAX_DIST || dt > MAX_DIST) continue;
      const long gap = std::labs(dq - dt);
      if (gap > MAX_BW) continue;
      const long gain = std::min<long>(std::min(dq, dt), k);
      const long cost = gap ? gap / 8 + ilog2_u32((uint32_t)gap) / 2 + 1 : 0;
      const long cand = f[j] + gain - cost;
      if (cand > f[i]) { f[i] = cand; parent[i] = j; }
    }
  }

  // greedy chain extraction: best remaining score, backtrack until a used
  // anchor; drop chains mostly inside an already-mapped query region
  std::vector<long> order(A);
  for (long i = 0; i < A; ++i) order[i] = i;
  std::sort(order.begin(), order.end(),
            [&](long a, long b) { return f[a] > f[b]; });
  std::vector<uint8_t> used(A, 0);
  std::vector<std::pair<long, long>> covered;  // mapped query spans
  for (long oi = 0; oi < A && (long)chains.size() < max_chains; ++oi) {
    const long tail = order[oi];
    if (used[tail] || f[tail] < min_chain_score) continue;
    // backtrack
    long i = tail, n_anchors = 0;
    long qs = anchors[tail].first, ts = anchors[tail].second;
    long max_drift = 0;
    const long diag_end = anchors[tail].first - anchors[tail].second;
    while (i >= 0 && !used[i]) {
      used[i] = 1;
      ++n_anchors;
      qs = anchors[i].first;
      ts = anchors[i].second;
      const long drift = std::labs((anchors[i].first - anchors[i].second) -
                                   diag_end);
      max_drift = std::max(max_drift, drift);
      i = parent[i];
    }
    if (n_anchors < min_chain_anchors) continue;
    const long qe = anchors[tail].first + k, te = anchors[tail].second + k;
    // secondary suppression: >50% query overlap with an accepted chain
    const long span = qe - qs;
    bool secondary = false;
    for (auto& [cs, ce] : covered) {
      const long ov = std::min(qe, ce) - std::max(qs, cs);
      if (2 * ov > span) { secondary = true; break; }
    }
    if (secondary) continue;
    covered.emplace_back(qs, qe);

    // extend: banded affine global alignment across the chained region
    long matches = 0, cols = 0;
    double score = 0.0;
    const long band = std::max<long>(64, max_drift + 64);
    if (!banded_global_core(q + qs, qe - qs, t + ts, te - ts,
                            a_match, a_mismatch, a_gap_open, a_gap_extend,
                            band, &matches, &cols, &score)) {
      // band blew up (shouldn't happen for a real chain); widen once
      if (!banded_global_core(q + qs, qe - qs, t + ts, te - ts,
                              a_match, a_mismatch, a_gap_open, a_gap_extend,
                              std::labs((qe - qs) - (te - ts)) + 256,
                              &matches, &cols, &score))
        continue;
    }
    chains.push_back({matches, cols, qs, qe, ts, te});
  }
  return (long)chains.size();
}

}  // namespace

extern "C" {

// out: max_chains rows of 6 longs (matches, block_len, q_start, q_end,
// t_start, t_end). Returns the number of chains written.
long rv_map_read(const char* q, long n, const char* t, long m,
                 int k, int w, int max_occ,
                 long min_chain_score, int min_chain_anchors,
                 double a_match, double a_mismatch,
                 double a_gap_open, double a_gap_extend,
                 long* out, long max_chains) {
  std::vector<ChainRow> chains;
  long nc = map_read_core(q, n, t, m, k, w, max_occ, min_chain_score,
                          min_chain_anchors, a_match, a_mismatch, a_gap_open,
                          a_gap_extend, chains, max_chains);
  for (long i = 0; i < nc; ++i) {
    out[6 * i + 0] = chains[i].matches;
    out[6 * i + 1] = chains[i].cols;
    out[6 * i + 2] = chains[i].q_start;
    out[6 * i + 3] = chains[i].q_end;
    out[6 * i + 4] = chains[i].t_start;
    out[6 * i + 5] = chains[i].t_end;
  }
  return nc;
}

}  // extern "C"
