// Standalone CPU frame encoder: float32 frame -> container bytes, no JAX.
//
// This is the forward twin of ebcc_cpu_decoder.cc and the piece that makes
// the HDF5 filter plugin write-capable (the ecosystem role the reference's
// C encoder plays: /root/reference/src/h5z_j2k.c:124-136 compresses on a
// plain H5Dwrite).  It replicates the device pipeline
// (ebcc_tpu/codec/pipeline.py _encode_error_bounded / _encode_rate_targeted
// + ebcc_tpu/api.py _assemble_frame) operation for operation:
//
//   minmax -> u16 scale -> mirror pad -> DC subtract -> CDF 9/7 forward
//   lifting -> per-subband synthesis-peak weighting -> integer bitplane
//   analysis -> closed-form truncation search against the error bound
//   (coarse per-plane scan + fine per-chunk scan, feasibility quantile +
//   pure-base fallback, j2k_codec.h:562-695 semantics) -> residual layer ->
//   native bitplane packing (ebcc_coder.cc) -> zstd -> container
//   (codec/container.py v3 layout).
//
// The search evaluates real reconstructions (inverse transform per
// candidate), exactly like the device path; with early exit it costs
// ~15-40 inverse DWTs per frame — the same order as the reference's
// ~6-9 J2K re-encodes + ~15 SPIHT decodes per frame.
//
// XLA-parity arithmetic (load-bearing for the byte-identity guarantee,
// tests/test_cpu_encoder.py): every lifting step uses std::fma exactly
// where XLA contracts a multiply-add, constant divisions are reciprocal
// multiplies, and the unscale is the reassociated fma(y, recip*rng, mn).
// Error-bounded encodes are byte-identical to api.compress on the CPU
// backend; rate-targeted modes agree structurally but can differ in the
// residual stream (it embeds raw reconstruction values, and LLVM's FMA
// choices inside XLA's fused inverse-lifting kernels are not replicable
// op-by-op).

#include <zstd.h>

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <memory>
#include <mutex>
#include <thread>
#include <vector>

extern "C" {
void ebcc_cpu_idwt2d_multi(float* x, int H, int W, int levels);
void ebcc_cpu_idwt2d_multi_cols(float* x, int H, int W, int levels);
void ebcc_cpu_idwt1d_row(float* row, int W, float* tmp);
void ebcc_cpu_weight_plane(int hp, int wp, int levels, float* out);
void ebcc_coder_encode_batch(const int32_t* coef, int n, int h, int w, int g,
                             int nplanes, int nchunks,
                             const int64_t* trunc_bits, uint8_t* out,
                             int64_t cap_bytes);
}

namespace {

constexpr float ALPHA = -1.586134342f;
constexpr float BETA = -0.05298011854f;
constexpr float GAMMA = 0.8829110762f;
constexpr float DELTA = 0.44355068522f;
constexpr float XI = 1.149604398f;
constexpr float U16_MAX = 65535.0f;
constexpr float RESID_SCALE = 255.0f;
constexpr size_t MIN_RESID_BYTES = 16;  // j2k_codec.h:653 semantics
// Tier-0 of the early pure decision (api.py TIER0_MAX_EXTRA_BITS): pure's
// extra base bits below this cannot pay for the residual part's fixed
// container overhead, so pure wins without building the residual layer.
constexpr int64_t TIER0_MAX_EXTRA_BITS = 128;
// XLA strength-reduces division by a compile-time constant into a multiply
// by the f32-rounded reciprocal; match it exactly (verified op-by-op
// against jitted XLA CPU kernels)
constexpr float RECIP_XI = (float)(1.0 / (double)XI);
constexpr float RECIP_U16 = (float)(1.0 / (double)U16_MAX);
constexpr float RECIP_RS = (float)(1.0 / (double)RESID_SCALE);

// residual-mode enum (codec/config.py, j2k_codec.h:168-175)
enum { MODE_NONE = 0, MODE_SPARS = 1, MODE_MAX_ERR = 2, MODE_REL_ERR = 3,
       MODE_POINTWISE = 5 };

int padded(int n, int levels) {
  int m = 1 << (levels + 1);
  return (n + m - 1) / m * m;
}

// ---- stage profiling counters (ebcc_cpu_prof_fetch; timing only, never
// alters any computation).  The encoder is single-threaded per frame, so
// plain globals suffice; scripts/profile_stages.py reads them. ----
struct ProfCounters {
  double t_transform = 0, t_recon = 0, t_idwt = 0, t_scan = 0, t_pack = 0;
  double n_eval = 0, n_evalm = 0;
};
ProfCounters g_prof;

double prof_now() {
  return std::chrono::duration<double>(
             std::chrono::steady_clock::now().time_since_epoch())
      .count();
}

// ---- forward CDF 9/7 lifting (ops/dwt.py dwt1d order) ----

// XLA CPU compiles each lifting step "a + C * (b1 + b2)" as a fused
// multiply-add of the f32 sum; std::fma reproduces it bit-for-bit
// (verified elementwise against jitted XLA kernels)
void fdwt1d(float* x, int n, float* tmp) {
  int n2 = n / 2;
  float* s = tmp;       // even -> approximation
  float* d = tmp + n2;  // odd -> detail
  for (int i = 0; i < n2; ++i) {
    s[i] = x[2 * i];
    d[i] = x[2 * i + 1];
  }
  // Boundary iterations peeled so the middle loops vectorise (identical
  // per-element arithmetic; see idwt1d in ebcc_cpu_decoder.cc).
  // d = odd + ALPHA * (even + edge_next(even))
  for (int i = 0; i + 1 < n2; ++i)
    d[i] = std::fma(ALPHA, s[i] + s[i + 1], d[i]);
  d[n2 - 1] = std::fma(ALPHA, s[n2 - 1] + s[n2 - 1], d[n2 - 1]);
  // s = even + BETA * (d + reflect_prev(d))
  s[0] = std::fma(BETA, d[0] + d[1], s[0]);
  for (int i = 1; i < n2; ++i)
    s[i] = std::fma(BETA, d[i] + d[i - 1], s[i]);
  // d += GAMMA * (s + reflect_next(s))
  for (int i = 0; i + 1 < n2; ++i)
    d[i] = std::fma(GAMMA, s[i] + s[i + 1], d[i]);
  d[n2 - 1] = std::fma(GAMMA, s[n2 - 1] + s[n2 - 2], d[n2 - 1]);
  // s += DELTA * (d + reflect_prev(d))
  s[0] = std::fma(DELTA, d[0] + d[1], s[0]);
  for (int i = 1; i < n2; ++i)
    s[i] = std::fma(DELTA, d[i] + d[i - 1], s[i]);
  for (int i = 0; i < n2; ++i) {
    x[i] = s[i] * XI;
    x[n2 + i] = d[i] * RECIP_XI;  // x / XI, as XLA compiles it
  }
}

// forward column lifting on a BLOCK of bc contiguous columns (rows
// strided W apart): same per-element arithmetic as fdwt1d along axis 0,
// restructured so each cache line is touched once per step (the
// col-by-col gather/scatter dominated the transform cost).  tmp must
// hold n*bc floats.
void fdwt1d_cols_block(float* x, int n, int W, int bc, float* tmp) {
  int n2 = n / 2;
  float* s = tmp;            // even rows -> approximation
  float* d = tmp + (size_t)n2 * bc;
  for (int i = 0; i < n2; ++i) {
    memcpy(s + (size_t)i * bc, x + (size_t)(2 * i) * W,
           bc * sizeof(float));
    memcpy(d + (size_t)i * bc, x + (size_t)(2 * i + 1) * W,
           bc * sizeof(float));
  }
  for (int i = 0; i < n2; ++i) {
    const float* en = s + (size_t)(i + 1 < n2 ? i + 1 : n2 - 1) * bc;
    float* di = d + (size_t)i * bc;
    const float* si = s + (size_t)i * bc;
    for (int c = 0; c < bc; ++c)
      di[c] = std::fma(ALPHA, si[c] + en[c], di[c]);
  }
  for (int i = 0; i < n2; ++i) {
    const float* dp = d + (size_t)(i == 0 ? 1 : i - 1) * bc;
    float* si = s + (size_t)i * bc;
    const float* di = d + (size_t)i * bc;
    for (int c = 0; c < bc; ++c)
      si[c] = std::fma(BETA, di[c] + dp[c], si[c]);
  }
  for (int i = 0; i < n2; ++i) {
    const float* sn = s + (size_t)(i + 1 < n2 ? i + 1 : n2 - 2) * bc;
    float* di = d + (size_t)i * bc;
    const float* si = s + (size_t)i * bc;
    for (int c = 0; c < bc; ++c)
      di[c] = std::fma(GAMMA, si[c] + sn[c], di[c]);
  }
  for (int i = 0; i < n2; ++i) {
    const float* dp = d + (size_t)(i == 0 ? 1 : i - 1) * bc;
    float* si = s + (size_t)i * bc;
    const float* di = d + (size_t)i * bc;
    for (int c = 0; c < bc; ++c)
      si[c] = std::fma(DELTA, di[c] + dp[c], si[c]);
  }
  for (int i = 0; i < n2; ++i) {
    float* lo = x + (size_t)i * W;
    float* hi = x + (size_t)(n2 + i) * W;
    const float* si = s + (size_t)i * bc;
    const float* di = d + (size_t)i * bc;
    for (int c = 0; c < bc; ++c) {
      lo[c] = si[c] * XI;
      hi[c] = di[c] * RECIP_XI;
    }
  }
}

// one forward 2-D level on the top-left (hh, ww) region: rows then columns
// (ops/dwt.py dwt2d)
void fdwt2d_level(float* x, int hh, int ww, int W, float* tmp,
                  float* coltmp) {
  for (int r = 0; r < hh; ++r) fdwt1d(x + (size_t)r * W, ww, tmp);
  constexpr int BC = 128;
  for (int c0 = 0; c0 < ww; c0 += BC)
    fdwt1d_cols_block(x + c0, hh, W, std::min(BC, ww - c0), coltmp);
}

void fdwt2d_multi(float* x, int H, int W, int levels) {
  std::vector<float> tmp(std::max(H, W));
  std::vector<float> coltmp((size_t)H * 128);
  for (int i = 0; i < levels; ++i)
    fdwt2d_level(x, H >> i, W >> i, W, tmp.data(), coltmp.data());
}

// ---- framing (ops/frame.py) ----

// mirror pad [h, w] -> [hp, wp] (pad_symmetric: right pad mirrors the last
// columns, bottom pad mirrors the last rows of the original region,
// bottom-right corner is zero)
void pad_symmetric(const float* x, int h, int w, int hp, int wp, float* out) {
  int ex = wp - w, ey = hp - h;
  for (int r = 0; r < h; ++r) {
    const float* src = x + (size_t)r * w;
    float* dst = out + (size_t)r * wp;
    memcpy(dst, src, w * sizeof(float));
    for (int j = 0; j < ex; ++j) dst[w + j] = src[w - 1 - j];
  }
  for (int i = 0; i < ey; ++i) {
    const float* src = x + (size_t)(h - 1 - i) * w;
    float* dst = out + (size_t)(h + i) * wp;
    memcpy(dst, src, w * sizeof(float));
    for (int j = 0; j < ex; ++j) dst[w + j] = 0.0f;
  }
}

float dc_floor_mean(const float* x, size_t n) {
  double s = 0.0;
  for (size_t i = 0; i < n; ++i) s += x[i];
  return std::floor((float)(s / (double)n));
}

// u16 scaling, trunc toward zero (frame.py scale_to_u16 /
// j2k_codec.h:523-526)
std::vector<float> scale_u16(const float* data, size_t n, float mn,
                             float rng) {
  std::vector<float> u(n);
  for (size_t i = 0; i < n; ++i) {
    float y = (data[i] - mn) / rng * U16_MAX;
    u[i] = truncf(std::min(std::max(y, 0.0f), U16_MAX));
  }
  return u;
}

// u16 scaling + dequantised error reference + per-frame quantisation
// error, shared by the in-process encoder below and the exported batch
// helper (api._scale_u16_host) — both sides MUST produce the same maxq or
// device/CPU containers drift apart (tests/test_cpu_encoder.py).
// dq[i] = fma(y, RECIP_U16 * rng, mn) is the arithmetic XLA compiles for
// frame.unscale_from_u16, the device pipeline's hostq error reference
// (pipeline._hostq_prelude).  The returned maxq is padded by 4 ulps of
// the largest frame magnitude so ulp-level fma-association differences
// between XLA targets cannot push the true error past the user bound.
float scale_u16_ref(const float* data, size_t n, float mn, float rng,
                    float* uf_out, float* dq_out, uint16_t* u16_out) {
  const float safe = rng > 0.0f ? rng : 1.0f;
  const float unscale_c = RECIP_U16 * rng;
  float maxq = 0.0f;
  for (size_t i = 0; i < n; ++i) {
    float y = (data[i] - mn) / safe * U16_MAX;
    y = truncf(std::min(std::max(y, 0.0f), U16_MAX));
    if (uf_out) uf_out[i] = y;
    if (u16_out) u16_out[i] = (uint16_t)y;
    float dq = std::fma(y, unscale_c, mn);
    if (dq_out) dq_out[i] = dq;
    maxq = std::max(maxq, std::fabs(data[i] - dq));
  }
  float mag = std::max(std::fabs(mn), std::fabs(mn + rng));
  return maxq + std::ldexp(mag, -21);
}

int msb_of(uint32_t v) { return v ? 31 - __builtin_clz(v) : -1; }

// Per-geometry synthesis-peak weight plane, computed once and shared:
// every frame of a batch (and every HDF5 chunk of a dataset) uses the same
// (h, w, levels), and the per-coefficient subband lookup is a measurable
// per-frame cost.  Entries live for the process lifetime; unique_ptr
// storage keeps returned pointers stable across cache growth.  Mutex:
// the HDF5 filter runs the encoder from multiple threads.
const float* cached_weight_plane(int h, int w, int levels) {
  struct Entry {
    int h, w, levels;
    std::unique_ptr<float[]> plane;
  };
  static std::mutex mu;
  static std::vector<Entry> cache;
  std::lock_guard<std::mutex> lk(mu);
  for (auto& e : cache)
    if (e.h == h && e.w == w && e.levels == levels) return e.plane.get();
  Entry e{h, w, levels,
          std::unique_ptr<float[]>(new float[(size_t)h * w])};
  ebcc_cpu_weight_plane(h, w, levels, e.plane.get());
  cache.push_back(std::move(e));
  return cache.back().plane.get();
}

// ---- per-layer encoder state ----

struct LayerEnc {
  int h, w;         // padded dims
  int levels, g, P, J, S;
  std::vector<int32_t> ci;
  std::vector<uint32_t> mag;
  std::vector<uint8_t> neg;
  std::vector<int8_t> msb;
  std::vector<int8_t> row_max;  // max msb per row (recon row skipping)
  // per-row columns in msb-descending order (counting sort) + suffix
  // counts: cnt_ge(r, d) columns of row r have msb >= d and they are
  // exactly the first cnt_ge entries of sorted_cols[row] — recon visits
  // only those (~6% at typical selection depths) over a memset row
  std::vector<int32_t> sorted_cols;
  std::vector<int32_t> msb_cnt;  // [h][33]: #cols with msb >= d-1 at [d]

  int cnt_ge(int r, int d) const {  // #cols with msb >= d, d in [0, 31]
    return msb_cnt[(size_t)r * 33 + d + 1];
  }
  std::vector<std::vector<int8_t>> smax;  // [1..g]
  int max_step = 0;
  const float* wplane = nullptr;  // cached per geometry (weight cache)
  // counts[b][s] and derived cumulative tables
  std::vector<int64_t> counts;       // P * S
  std::vector<int64_t> before;       // bits of planes above b
  std::vector<int64_t> group_bits;   // per b
  std::vector<int64_t> sigpair_cum;  // P * J (inclusive prefix over stripes)
  std::vector<int64_t> ref_cum;      // P * J
  int64_t total_bits = 0;

  int stripe(int r) const { return (int)(((int64_t)r * J) / h); }

  void init(int h_orig, int w_orig, int lv, int nplanes, int nchunks) {
    levels = lv;
    g = lv + 1;
    P = nplanes;
    J = nchunks;
    h = padded(h_orig, lv);
    w = padded(w_orig, lv);
    wplane = cached_weight_plane(h, w, lv);
  }

  // transform + quantize: padded data-domain plane (DC already removed) ->
  // weighted int coefficients; builds the analysis pyramid + count tables
  void analyze(std::vector<float>&& plane) {
    size_t n = (size_t)h * w;
    fdwt2d_multi(plane.data(), h, w, levels);
    ci.resize(n);
    mag.resize(n);
    neg.resize(n);
    msb.resize(n);
    for (size_t i = 0; i < n; ++i) {
      // jnp.trunc(coef * w) in float32, then int32 (pipeline.py)
      float v = truncf(plane[i] * wplane[i]);
      int32_t iv = (int32_t)v;
      ci[i] = iv;
      uint32_t m = (uint32_t)(iv < 0 ? -(int64_t)iv : iv);
      mag[i] = m;
      neg[i] = iv < 0;
      msb[i] = (int8_t)msb_of(m);
    }
    row_max.assign(h, -1);
    sorted_cols.resize(n);
    msb_cnt.assign((size_t)h * 33, 0);
    for (int r = 0; r < h; ++r) {
      const int8_t* mr = msb.data() + (size_t)r * w;
      int8_t rm = -1;
      int cnt[33] = {0};  // bucket = msb + 1 in [0, 31]
      for (int c = 0; c < w; ++c) {
        rm = std::max(rm, mr[c]);
        ++cnt[mr[c] + 1];
      }
      row_max[r] = rm;
      // suffix[b] = #cols in buckets >= b; bucket bb starts (descending
      // order) at suffix[bb + 1]
      int suffix[35];
      suffix[34] = 0;
      suffix[33] = 0;
      for (int b2 = 32; b2 >= 0; --b2)
        suffix[b2] = suffix[b2 + 1] + (b2 <= 31 ? cnt[b2] : 0);
      int32_t* mc = msb_cnt.data() + (size_t)r * 33;
      for (int j = 0; j < 33; ++j) mc[j] = suffix[j];
      int cur[33];
      for (int b2 = 0; b2 < 33; ++b2) cur[b2] = suffix[b2 + 1];
      int32_t* sc = sorted_cols.data() + (size_t)r * w;
      for (int c = 0; c < w; ++c) sc[cur[mr[c] + 1]++] = c;
    }
    smax.assign(g + 1, {});
    // level 0 view is msb itself; build 1..g by 2x2 max pooling
    const int8_t* prev = msb.data();
    int wp_prev = w;
    for (int k = 1; k <= g; ++k) {
      int hk = h >> k, wk = w >> k;
      smax[k].resize((size_t)hk * wk);
      for (int r = 0; r < hk; ++r)
        for (int c = 0; c < wk; ++c) {
          int8_t a = prev[(size_t)(2 * r) * wp_prev + 2 * c];
          int8_t b2 = prev[(size_t)(2 * r) * wp_prev + 2 * c + 1];
          int8_t c2 = prev[(size_t)(2 * r + 1) * wp_prev + 2 * c];
          int8_t d = prev[(size_t)(2 * r + 1) * wp_prev + 2 * c + 1];
          int8_t m = std::max(std::max(a, b2), std::max(c2, d));
          smax[k][(size_t)r * wk + c] = m;
        }
      prev = smax[k].data();
      wp_prev = wk;
    }
    int8_t gm = -1;
    for (size_t i = 0; i < n; ++i) gm = std::max(gm, msb[i]);
    max_step = std::max((int)gm, 0);
    build_counts();
  }

  // pad + DC-remove + transform + analyze an [h_orig, w_orig] field;
  // returns the DC offset
  float transform(const float* field, int h_orig, int w_orig) {
    std::vector<float> plane((size_t)h * w);
    pad_symmetric(field, h_orig, w_orig, h, w, plane.data());
    float dc = dc_floor_mean(plane.data(), plane.size());
    for (auto& v : plane) v -= dc;
    analyze(std::move(plane));
    return dc;
  }

  // segment order per plane (ops/bitplane.py segment_counts): group levels
  // g..1, then (sig_j, sign_j) per stripe, then refine_j per stripe
  void build_counts() {
    S = g + 3 * J;
    std::vector<int64_t> diff((size_t)(P + 1) * S, 0);
    auto add_range = [&](int s, int lo, int hi) {
      if (hi < lo) return;
      diff[(size_t)lo * S + s] += 1;
      diff[(size_t)(hi + 1) * S + s] -= 1;
    };
    // group levels: node at level k emits at planes [max(smax_k,0),
    // min(parent, P-1)] (parent = max_step at k == g)
    for (int k = g; k >= 1; --k) {
      int s = g - k;
      int hk = h >> k, wk = w >> k;
      const int8_t* sk = smax[k].data();
      for (int r = 0; r < hk; ++r)
        for (int c = 0; c < wk; ++c) {
          int pv = (k == g) ? max_step
                            : smax[k + 1][(size_t)(r >> 1) * (wk >> 1) +
                                          (c >> 1)];
          add_range(s, std::max((int)sk[(size_t)r * wk + c], 0),
                    std::min(pv, P - 1));
        }
    }
    // level 0: sig at [max(msb,0), min(parent1, P-1)], sign at msb,
    // refine at [0, min(msb-1, P-1)]
    int w1 = w >> 1;
    for (int r = 0; r < h; ++r) {
      int jj = stripe(r);
      int s_sig = g + 2 * jj, s_sign = g + 2 * jj + 1, s_ref = g + 2 * J + jj;
      for (int c = 0; c < w; ++c) {
        int m = msb[(size_t)r * w + c];
        int pv = smax[1][(size_t)(r >> 1) * w1 + (c >> 1)];
        add_range(s_sig, std::max(m, 0), std::min(pv, P - 1));
        if (m >= 0 && m <= P - 1) add_range(s_sign, m, m);
        if (m >= 1) add_range(s_ref, 0, std::min(m - 1, P - 1));
      }
    }
    counts.assign((size_t)P * S, 0);
    std::vector<int64_t> acc(S, 0);
    for (int b = 0; b < P; ++b) {
      for (int s = 0; s < S; ++s) {
        acc[s] += diff[(size_t)b * S + s];
        counts[(size_t)b * S + s] = acc[s];
      }
    }
    // derived cumulative tables
    before.assign(P, 0);
    group_bits.assign(P, 0);
    sigpair_cum.assign((size_t)P * J, 0);
    ref_cum.assign((size_t)P * J, 0);
    std::vector<int64_t> plane_total(P, 0);
    for (int b = 0; b < P; ++b) {
      const int64_t* cb = &counts[(size_t)b * S];
      int64_t gbits = 0;
      for (int s = 0; s < g; ++s) gbits += cb[s];
      group_bits[b] = gbits;
      int64_t cum = 0;
      for (int jj = 0; jj < J; ++jj) {
        cum += cb[g + 2 * jj] + cb[g + 2 * jj + 1];
        sigpair_cum[(size_t)b * J + jj] = cum;
      }
      int64_t rcum = 0;
      for (int jj = 0; jj < J; ++jj) {
        rcum += cb[g + 2 * J + jj];
        ref_cum[(size_t)b * J + jj] = rcum;
      }
      plane_total[b] = gbits + cum + rcum;
    }
    // planes are processed top-down: bits before plane b = planes above it
    int64_t run = 0;
    for (int b = P - 1; b >= 0; --b) {
      before[b] = run;
      run += plane_total[b];
    }
    total_bits = run;
  }

  // cumulative stream length at fine candidate k of plane b
  // (ops/bitplane.py candidate_bits): k < J -> after sig+sign chunk k;
  // else after refine chunk k - J
  int64_t candidate(int b, int k) const {
    int64_t v = before[b] + group_bits[b];
    if (k < J) return v + sigpair_cum[(size_t)b * J + k];
    return v + sigpair_cum[(size_t)b * J + (J - 1)] +
           ref_cum[(size_t)b * J + (k - J)];
  }

  // stream length with plane b's chunks masked to the ``keep`` bitmask
  // (format v4; ops/bitplane.py mask_segments semantics)
  int64_t masked_bits(int b, uint32_t keep) const {
    int64_t v = before[b] + group_bits[b];
    int64_t prev = 0;
    for (int jj = 0; jj < J; ++jj) {
      int64_t cur = sigpair_cum[(size_t)b * J + jj];
      if ((keep >> jj) & 1u) v += cur - prev;
      prev = cur;
    }
    prev = 0;
    for (int jj = 0; jj < J; ++jj) {
      int64_t cur = ref_cum[(size_t)b * J + jj];
      if ((keep >> jj) & 1u) v += cur - prev;
      prev = cur;
    }
    return v;
  }

  int64_t plane_end(int b) const { return candidate(b, 2 * J - 1); }

  // rows of stripe jj: [ceil(jj*h/J), ceil((jj+1)*h/J))
  void stripe_rows(int jj, int* r0, int* r1) const {
    *r0 = (int)(((int64_t)jj * h + J - 1) / J);
    *r1 = (int)(((int64_t)(jj + 1) * h + J - 1) / J);
  }

  // true when stripe jj holds no coefficient with msb >= b: its plane-b
  // sign count (#msb == b) and refine count (#msb >= b+1) are both zero.
  // Dropping such a chunk leaves the reconstruction bit-identical (every
  // element's q is 0 at depth b and b+1 alike).
  bool chunk_inert(int b, int jj) const {
    const int64_t* cb = &counts[(size_t)b * S];
    return cb[g + 2 * jj + 1] == 0 && cb[g + 2 * J + jj] == 0;
  }

  // plane-b bits chunk jj contributes (sig+sign and refine chunk sizes —
  // the per-chunk entries of bp.mask_segments)
  int64_t chunk_bits(int b, int jj) const {
    int64_t s = sigpair_cum[(size_t)b * J + jj] -
                (jj ? sigpair_cum[(size_t)b * J + jj - 1] : 0);
    int64_t rf = ref_cum[(size_t)b * J + jj] -
                 (jj ? ref_cum[(size_t)b * J + jj - 1] : 0);
    return s + rf;
  }

  // closed-form reconstruction with per-stripe drops at plane b
  // (ops/bitplane.py recon_masked): dropped stripes stay at plane b + 1
  // precision, kept stripes complete plane b.  ``wdiv`` (optional) fuses
  // layer_recon's per-coefficient weight division into this pass —
  // (-v)/w == -(v/w) and 0/w == 0 exactly in IEEE f32, so the fusion is
  // byte-identity-safe.
  // one row of the masked recon at depth d: memset, then visit only the
  // columns with msb >= d (the first cnt_ge entries of the row's
  // msb-descending column list — ~6% of columns at typical selection
  // depths).  Identical values in identical positions to a full scan
  // (all skipped columns are exactly the q == 0 ones, written 0.0f).
  void recon_row(size_t i0, int d, float* out, const float* wdiv) const {
    int r = (int)(i0 / w);
    memset(out + i0, 0, (size_t)w * sizeof(float));
    if (row_max[r] < d) return;
    float half = d > 0 ? (float)((1u << d) - 1) * 0.5f : 0.0f;
    const int32_t* sc = sorted_cols.data() + i0;
    int cnt = cnt_ge(r, d);
    for (int k = 0; k < cnt; ++k) {
      size_t i = i0 + sc[k];
      uint32_t q = (mag[i] >> d) << d;
      float v = (float)q + half;
      if (wdiv) v /= wdiv[i];
      out[i] = neg[i] ? -v : v;
    }
  }

  void recon_coef_masked(int b, uint32_t drop, float* out,
                         const float* wdiv = nullptr) const {
    for (int r = 0; r < h; ++r)
      recon_row((size_t)r * w, b + (int)((drop >> stripe(r)) & 1u), out,
                wdiv);
  }

  // rows [r0, r1) only — the mask search's greedy candidates differ from
  // the running plane in exactly one stripe's depth
  void recon_rows_masked(int r0, int r1, int d, float* out,
                         const float* wdiv = nullptr) const {
    for (int r = r0; r < r1; ++r) recon_row((size_t)r * w, d, out, wdiv);
  }

  // mixed-depth row of the fine reconstruction: "old" coefficients
  // (msb > b, equivalently (mag >> (b+1)) << (b+1) != 0) appear at depth
  // ``old_d`` (b when the row's refine chunk is kept, b+1 otherwise);
  // "new" ones (msb == b) appear at depth b iff ``new_vis``.  Branchless
  // per element; values match the original branchy form bit-for-bit (see
  // recon_row's exactness notes).
  void recon_row_fine(size_t i0, int b, bool new_vis, int old_d, float* out,
                      const float* wdiv) const {
    int r = (int)(i0 / w);
    memset(out + i0, 0, (size_t)w * sizeof(float));
    if (row_max[r] < b) return;  // nothing visible below msb b
    float half_new = b > 0 ? (float)((1u << b) - 1) * 0.5f : 0.0f;
    float half_old = old_d > 0 ? (float)((1u << old_d) - 1) * 0.5f : 0.0f;
    const int32_t* sc = sorted_cols.data() + i0;
    // the first cnt_ge(r, b+1) listed columns are the "old" (msb > b)
    // coefficients, the next cnt_ge(r, b) - that the "new" (msb == b)
    int n_old = cnt_ge(r, b + 1);
    int n_vis = cnt_ge(r, b);
    for (int k = 0; k < n_old; ++k) {
      size_t i = i0 + sc[k];
      uint32_t q = (mag[i] >> old_d) << old_d;
      float v = (float)q + half_old;
      if (wdiv) v /= wdiv[i];
      out[i] = neg[i] ? -v : v;
    }
    if (!new_vis) return;
    for (int k = n_old; k < n_vis; ++k) {
      size_t i = i0 + sc[k];
      uint32_t q = (mag[i] >> b) << b;
      float v = (float)q + half_new;
      if (wdiv) v /= wdiv[i];
      out[i] = neg[i] ? -v : v;
    }
  }

  // closed-form coefficient reconstruction at a truncation point
  // (ops/bitplane.py recon_truncated); fine == false means plane b complete
  void recon_coef(int b, int js, int jr, bool fine, float* out,
                  const float* wdiv = nullptr) const {
    for (int r = 0; r < h; ++r) {
      size_t i0 = (size_t)r * w;
      if (!fine) {
        // coarse: depth-b recon (q == 0 exactly when msb < b)
        recon_row(i0, b, out, wdiv);
        continue;
      }
      int sid = stripe(r);
      bool new_vis = sid < js;
      int old_d = sid >= jr ? b + 1 : b;
      if (new_vis && old_d == b)
        recon_row(i0, b, out, wdiv);  // fully refined + new visible
      else if (!new_vis && old_d == b + 1)
        recon_row(i0, b + 1, out, wdiv);  // only old, coarse depth
      else
        recon_row_fine(i0, b, new_vis, old_d, out, wdiv);
    }
  }
};

// data-domain reconstruction of one layer from a coefficient recon:
// /weights -> idwt -> +dc -> clamp [0, hi] (pipeline.py _base_recon /
// _resid_recon before crop/unscale)
void layer_recon(const LayerEnc& L, const float* coef, float dc,
                 float clamp_hi, float* plane) {
  size_t n = (size_t)L.h * L.w;
  for (size_t i = 0; i < n; ++i) plane[i] = coef[i] / L.wplane[i];
  ebcc_cpu_idwt2d_multi(plane, L.h, L.w, L.levels);
  for (size_t i = 0; i < n; ++i)
    plane[i] = std::min(std::max(plane[i] + dc, 0.0f), clamp_hi);
}

// base reconstruction in the DATA domain at a chosen fine truncation
// (pipeline.py _recon_at + _base_recon; unscale is the reassociated
// fma(y, recip * rng, mn) exactly as XLA compiles it).  When ``masked``
// the chosen truncation is the chunk-masked plane bstar with stripes in
// ``drop`` dropped (recon_coef_masked) — the decoder's v4 view.
void base_rec_at(const LayerEnc& base, int bstar, int kstar, float dc,
                 float mn, float unscale_c, int h, int w, float* coef_buf,
                 float* rec_buf, float* out, bool masked = false,
                 uint32_t drop = 0) {
  if (masked) {
    base.recon_coef_masked(bstar, drop, coef_buf);
  } else {
    int js = kstar < base.J ? kstar + 1 : base.J;
    int jr = kstar < base.J ? 0 : kstar - base.J + 1;
    base.recon_coef(bstar, js, jr, true, coef_buf);
  }
  layer_recon(base, coef_buf, dc, U16_MAX, rec_buf);
  for (int r = 0; r < h; ++r)
    for (int c = 0; c < w; ++c)
      out[(size_t)r * w + c] =
          std::fma(rec_buf[(size_t)r * base.w + c], unscale_c, mn);
}

// residual field -> normalised, transformed layer
// (pipeline.py _resid_transform); returns (rmin, rmax, dc_r)
struct ResidSetup {
  float rmn, rmx, dc_r;
};

ResidSetup make_resid_layer(LayerEnc& resid, const float* data,
                            const float* base_rec, int h, int w, int levels,
                            int nplanes, int nchunks) {
  size_t n = (size_t)h * w;
  std::vector<float> rs(n);
  for (size_t i = 0; i < n; ++i) rs[i] = data[i] - base_rec[i];
  float rmn = rs[0], rmx = rs[0];
  for (size_t i = 0; i < n; ++i) {
    rmn = std::min(rmn, rs[i]);
    rmx = std::max(rmx, rs[i]);
  }
  float rrng = rmx > rmn ? rmx - rmn : 1.0f;
  for (size_t i = 0; i < n; ++i)
    rs[i] = (rs[i] - rmn) / rrng * RESID_SCALE;
  resid.init(h, w, levels, nplanes, nchunks);
  float dc = resid.transform(rs.data(), h, w);
  return {rmn, rmx, dc};
}

struct ErrStats {
  float maxd;   // max over points of |err| - target
  double viol;  // fraction of points violating
};

// ---- vectorisable per-row error scans ----
//
// maxd is a pure float max-reduction (exactly associative and commutative
// — only the sign of a 0.0 tie can differ between scalar and vector
// order, and every consumer tests sign or feasibility only) and nv an
// integer sum, so letting the compiler vectorise these cannot change any
// encoder verdict.  __restrict: the scan buffers never alias.

struct RowStats {
  float maxd;
  int64_t nv;
};

// shared reduction tail: both loops vectorise (the fused
// compute+max+count form defeats the vectoriser's reduction matching)
RowStats reduce_row(const float* __restrict e, int w) {
  float maxd = -std::numeric_limits<float>::infinity();
  for (int c = 0; c < w; ++c) maxd = std::max(maxd, e[c]);
  uint32_t nv = 0;
  for (int c = 0; c < w; ++c) nv += e[c] > 0.0f;
  return {maxd, (int64_t)nv};
}

// base layer: rec = fma(clamp(coef + dc, 0, hi), cc, c1); ebuf is a
// >= w scratch row
RowStats scan_row_base(const float* __restrict coef,
                       const float* __restrict dq, float* __restrict ebuf,
                       float dc, float hi, float cc, float c1, float tgt,
                       int w) {
  for (int c = 0; c < w; ++c) {
    float y = std::min(std::max(coef[c] + dc, 0.0f), hi);
    ebuf[c] = std::fabs(dq[c] - std::fma(y, cc, c1)) - tgt;
  }
  return reduce_row(ebuf, w);
}

RowStats scan_row_base_pw(const float* __restrict coef,
                          const float* __restrict dq,
                          const float* __restrict tpw, float tq,
                          float* __restrict ebuf, float dc, float hi,
                          float cc, float c1, int w) {
  for (int c = 0; c < w; ++c) {
    float y = std::min(std::max(coef[c] + dc, 0.0f), hi);
    ebuf[c] = std::fabs(dq[c] - std::fma(y, cc, c1)) - (tpw[c] - tq);
  }
  return reduce_row(ebuf, w);
}

// residual layer: rec = addin + fma(clamp(coef + dc, 0, hi), cc, c1)
RowStats scan_row_resid(const float* __restrict coef,
                        const float* __restrict dq,
                        const float* __restrict addin,
                        float* __restrict ebuf, float dc, float hi,
                        float cc, float c1, float tgt, int w) {
  for (int c = 0; c < w; ++c) {
    float y = std::min(std::max(coef[c] + dc, 0.0f), hi);
    float rec = addin[c] + std::fma(y, cc, c1);
    ebuf[c] = std::fabs(dq[c] - rec) - tgt;
  }
  return reduce_row(ebuf, w);
}

RowStats scan_row_resid_pw(const float* __restrict coef,
                           const float* __restrict dq,
                           const float* __restrict addin,
                           const float* __restrict tpw, float tq,
                           float* __restrict ebuf, float dc, float hi,
                           float cc, float c1, int w) {
  for (int c = 0; c < w; ++c) {
    float y = std::min(std::max(coef[c] + dc, 0.0f), hi);
    float rec = addin[c] + std::fma(y, cc, c1);
    ebuf[c] = std::fabs(dq[c] - rec) - (tpw[c] - tq);
  }
  return reduce_row(ebuf, w);
}

struct SearchResult {
  int64_t bits = 0;
  bool feasible = false;
  float maxd = 0.0f;
  int bstar = 0;
  int kstar = 0;
};

// Truncation search for one layer, mirroring pipeline.py
// _search_truncation: feasibility is monotone in coded depth, so both the
// plane and the fine-chunk selections are first-feasible BISECTIONS —
// the exact rule of pipeline.py _bisect (lo=0, hi=n-1, mid=(lo+hi)/2,
// converged-index clamp), so both implementations pick identical
// truncations even where monotonicity is imperfect.  eval(b, js, jr,
// fine) returns error stats of the reconstruction truncated there; a
// small memo avoids repeating the verification evaluations.
template <typename EvalFn>
void search_truncation(const LayerEnc& L, float qallow, EvalFn&& eval,
                       SearchResult* out_q, SearchResult* out_pure) {
  const int P = L.P, J = L.J;
  std::vector<std::pair<int64_t, ErrStats>> memo;
  // Memo entries are shared across the q and pure selects.  Early-exited
  // stats (see the eval lambdas) stay conclusive because selects run in
  // nonincreasing-qa order: an entry proving "violations exceed the
  // q-select's threshold" is a fortiori infeasible for the pure select.
  auto eval_m = [&](int b, int js, int jr, bool fine, float qa) {
    int64_t key = ((int64_t)b << 20) | (js << 12) | (jr << 4) | (int)fine;
    for (auto& kv : memo)
      if (kv.first == key) return kv.second;
    ErrStats e = eval(b, js, jr, fine, qa);
    memo.emplace_back(key, e);
    return e;
  };
  auto ok_rule = [&](const ErrStats& e, float qa) {
    return qa > 0.0f ? e.viol <= (double)qa : e.maxd <= 0.0f;
  };
  auto bisect = [&](int n, auto&& feas) {
    int lo = 0, hi = n - 1;
    while (lo < hi) {
      int mid = (lo + hi) / 2;
      if (feas(mid))
        hi = mid;
      else
        lo = mid + 1;
    }
    return std::min(lo, n - 1);
  };
  auto select = [&](float qa) {
    SearchResult r;
    int pstar = bisect(P, [&](int idx) {
      return ok_rule(eval_m(P - 1 - idx, 0, 0, false, qa), qa);
    });
    r.bstar = P - 1 - pstar;
    ErrStats coarse = eval_m(r.bstar, 0, 0, false, qa);
    bool any_ok = ok_rule(coarse, qa);
    auto fine = [&](int k) {
      int js = k < J ? k + 1 : J;
      int jr = k < J ? 0 : k - J + 1;
      return eval_m(r.bstar, js, jr, true, qa);
    };
    r.kstar = bisect(2 * J, [&](int k) { return ok_rule(fine(k), qa); });
    ErrStats f = fine(r.kstar);
    if (any_ok) {
      r.bits = L.candidate(r.bstar, r.kstar);
      r.maxd = f.maxd;
      r.feasible = true;
    } else {
      // no feasible truncation: take the full stream; maxd is the
      // plane-0-complete figure (the best the layer can do)
      r.bits = L.total_bits;
      r.maxd = coarse.maxd;
      r.feasible = false;
    }
    return r;
  };
  *out_q = select(qallow);
  if (out_pure != nullptr)
    *out_pure = (qallow <= 0.0f) ? *out_q : select(0.0f);
}

// ---- chunk-mask search (format v4) ----
//
// Mirrors pipeline.py _search_mask exactly: after the prefix search picks
// plane bstar, greedily try dropping each final-plane chunk (ascending j);
// a drop is accepted iff the reconstruction with all so-far-accepted drops
// still satisfies the feasibility rule.  The mask wins only when at least
// one chunk dropped AND the masked stream is strictly shorter than the
// prefix.  evalm(b, drop_mask, qa) -> ErrStats of the masked recon.

struct MaskResult {
  bool use = false;
  uint32_t keep = 0;   // keep bitmask (valid when use)
  int64_t mbits = 0;   // final stream bits (masked, or the prefix length)
  float maxd = 0.0f;   // max excess at the final choice
  int bstar = 0;       // the selection's (= masked) plane
};

// Memo shareable across the q and pure mask searches of one layer (keyed
// by (plane, drop-set)).  Sharing is conclusive because the searches run in
// nonincreasing-qa order (qbase, then 0): an entry whose scan early-exited
// at the larger qa has maxd > 0, which the stricter pure rule reads as
// infeasible — the same verdict a full scan would reach — and any entry a
// pure select ACCEPTS had no violations, so its scan ran to completion and
// its stats are exact.
using MaskMemo = std::vector<std::pair<uint64_t, ErrStats>>;

// ``use_chunk_mask``: 0 = masking off, 1 = greedy accept scan, 2 = the
// "union" rule (pipeline.py mask_search="union"): every single-drop
// candidate judged independently, then their feasible union, falling back
// to the best feasible single (by final-plane bit saving, ties -> lowest
// chunk) when the union violates the rule.
template <typename EvalM>
MaskResult search_mask(const LayerEnc& L, float qa, const SearchResult& sel,
                       int use_chunk_mask, EvalM&& evalm,
                       MaskMemo* shared_memo = nullptr) {
  MaskResult m;
  m.mbits = sel.bits;
  m.maxd = sel.maxd;
  m.bstar = sel.bstar;
  if (!use_chunk_mask || L.J > 16 || !sel.feasible) return m;
  auto ok_rule = [&](const ErrStats& e) {
    return qa > 0.0f ? e.viol <= (double)qa : e.maxd <= 0.0f;
  };
  MaskMemo local;
  MaskMemo& memo = shared_memo ? *shared_memo : local;
  auto eval_m = [&](uint32_t dr) {
    uint64_t key = ((uint64_t)(uint32_t)sel.bstar << 32) | dr;
    for (auto& kv : memo)
      if (kv.first == key) return kv.second;
    ErrStats e = evalm(sel.bstar, dr, qa);
    memo.emplace_back(key, e);
    return e;
  };
  const uint32_t all = (1u << L.J) - 1;
  // prune: masked_bits is monotone decreasing in the drop set, so when
  // even keeping nothing cannot get below the prefix length, ``use`` is
  // certainly false — every output is then independent of the evals
  // (JAX runs them; the bytes agree because the mask is unused)
  if (L.masked_bits(sel.bstar, 0u) >= sel.bits) return m;
  uint32_t drop = 0;
  if (use_chunk_mask == 2) {  // union rule
    uint32_t fmask = 0;
    for (int jj = 0; jj < L.J; ++jj) {
      // inert chunk: recon unchanged -> the accepted-set (feasible)
      // stats; JAX evaluates and reaches the same verdict
      if (L.chunk_inert(sel.bstar, jj) ||
          ok_rule(eval_m(1u << jj)))
        fmask |= 1u << jj;
    }
    if (fmask != 0) {
      if (ok_rule(eval_m(fmask))) {
        drop = fmask;
      } else {
        int bestj = 0;
        int64_t best = -1;
        for (int jj = 0; jj < L.J; ++jj)
          if ((fmask >> jj) & 1u) {
            int64_t s = L.chunk_bits(sel.bstar, jj);
            if (s > best) {
              best = s;
              bestj = jj;
            }
          }
        drop = 1u << bestj;
      }
    }
  } else {  // greedy accept scan
    for (int jj = 0; jj < L.J; ++jj) {
      if (L.chunk_inert(sel.bstar, jj)) {
        drop |= 1u << jj;
        continue;
      }
      uint32_t rest = all & (~0u << jj);
      if (L.masked_bits(sel.bstar, all & ~(drop | rest)) >= sel.bits)
        break;
      uint32_t cand = drop | (1u << jj);
      if (ok_rule(eval_m(cand))) drop = cand;
    }
  }
  uint32_t keep = ((1u << L.J) - 1) & ~drop;
  int64_t mb = L.masked_bits(sel.bstar, keep);
  if (drop != 0 && mb < sel.bits) {
    m.use = true;
    m.keep = keep;
    m.mbits = mb;
    m.maxd = eval_m(drop).maxd;  // accepted set: full (non-early-exit) scan
  }
  return m;
}

// ---- host bit splice (bp.splice_masked_stream layout) ----

// copy n bits from src starting at bit s_pos into dst at bit d_pos
// (MSB-first in both); dst must be zeroed
void copy_bits(const uint8_t* src, int64_t s_pos, uint8_t* dst,
               int64_t d_pos, int64_t n) {
  for (int64_t k = 0; k < n; ++k) {
    int64_t sb = s_pos + k;
    if ((src[sb >> 3] >> (7 - (sb & 7))) & 1) {
      int64_t db = d_pos + k;
      dst[db >> 3] |= (uint8_t)(0x80u >> (db & 7));
    }
  }
}

// splice the chunk-masked stream of plane b out of the prefix arena:
// [planes above + groups] ++ kept sig+sign chunks ++ kept refine chunks
std::vector<uint8_t> splice_masked(const uint8_t* arena, const LayerEnc& L,
                                   int b, uint32_t keep) {
  int64_t out_bits = L.masked_bits(b, keep);
  std::vector<uint8_t> out(((size_t)out_bits + 7) / 8, 0);
  int64_t head = L.before[b] + L.group_bits[b];
  copy_bits(arena, 0, out.data(), 0, head);
  int64_t dpos = head;
  int64_t spos = head;
  int64_t prev = 0;
  for (int jj = 0; jj < L.J; ++jj) {
    int64_t cur = L.sigpair_cum[(size_t)b * L.J + jj];
    if ((keep >> jj) & 1u) {
      copy_bits(arena, spos, out.data(), dpos, cur - prev);
      dpos += cur - prev;
    }
    spos += cur - prev;
    prev = cur;
  }
  prev = 0;
  for (int jj = 0; jj < L.J; ++jj) {
    int64_t cur = L.ref_cum[(size_t)b * L.J + jj];
    if ((keep >> jj) & 1u) {
      copy_bits(arena, spos, out.data(), dpos, cur - prev);
      dpos += cur - prev;
    }
    spos += cur - prev;
    prev = cur;
  }
  return out;
}

// ---- container serialization (codec/container.py v3 layout) ----

struct Blob {
  std::vector<uint8_t> b;
  void raw(const void* p, size_t n) {
    const uint8_t* q = (const uint8_t*)p;
    b.insert(b.end(), q, q + n);
  }
  template <typename T>
  void le(T v) {
    raw(&v, sizeof(T));  // x86: little-endian in-memory layout
  }
};

constexpr unsigned FLAG_CONST = 1, FLAG_RESID = 2, FLAG_POINTWISE = 4,
                   FLAG_BASE_Z = 8;

struct Geom {
  uint8_t base_levels, resid_levels, nchunks, base_nplanes, resid_nplanes;
};

constexpr uint8_t MASK_NONE = 0xFF;  // mask_plane sentinel (container.py)

void pack_header(Blob& o, unsigned flags, uint16_t mode, uint32_t h,
                 uint32_t w, float mn, float mx, float dc_b,
                 uint32_t base_nbits, uint8_t max_step_b, const Geom& g,
                 uint8_t base_mask_plane, uint16_t base_keep_mask) {
  o.raw("EBT1", 4);
  o.le<uint8_t>(4);  // version (4 = chunk-masked last-plane truncation)
  o.le<uint8_t>((uint8_t)flags);
  o.le<uint16_t>(mode);
  o.le<uint32_t>(h);
  o.le<uint32_t>(w);
  o.le<float>(mn);
  o.le<float>(mx);
  o.le<float>(dc_b);
  o.le<uint32_t>(base_nbits);
  o.le<uint8_t>(max_step_b);
  o.le<uint8_t>(g.base_levels);
  o.le<uint8_t>(g.resid_levels);
  o.le<uint8_t>(g.nchunks);
  o.le<uint8_t>(g.base_nplanes);
  o.le<uint8_t>(g.resid_nplanes);
  o.le<uint8_t>(base_mask_plane);
  o.le<uint16_t>(base_keep_mask);
}

std::vector<uint8_t> zstd_pack(const uint8_t* p, size_t n, int level) {
  std::vector<uint8_t> out(ZSTD_compressBound(n));
  size_t r = ZSTD_compress(out.data(), out.size(), p, n, level);
  if (ZSTD_isError(r)) return {};
  out.resize(r);
  return out;
}

struct ResidPart {
  bool present = false;
  float rmin = 0, rmax = 0, dc_r = 0;
  uint8_t max_step_r = 0;
  uint32_t nbits = 0;
  uint8_t mask_plane = MASK_NONE;  // format v4 chunk mask of the last plane
  uint16_t keep_mask = 0;
  std::vector<uint8_t> zblob;
};

std::vector<uint8_t> pack_variant(uint16_t mode, int h, int w, float mn,
                                  float mx, float dc_b, uint8_t max_step_b,
                                  const Geom& geom, int64_t bits,
                                  const uint8_t* base_stream,
                                  uint8_t base_mask_plane,
                                  uint16_t base_keep_mask,
                                  const ResidPart* rp, bool pointwise,
                                  int zstd_level) {
  size_t nbytes = (size_t)((bits + 7) / 8);
  // zero the dangling bits of the final byte: a stream trimmed out of a
  // longer prefix arena must not carry the arena's next bits — the
  // emitted bytes depend on the selection alone (api._mask_tail mirror)
  std::vector<uint8_t> bs(base_stream, base_stream + nbytes);
  int pad = (int)((8 - (bits & 7)) & 7);
  if (pad && nbytes) bs.back() &= (uint8_t)(0xFFu << pad);
  base_stream = bs.data();
  // final entropy stage on the base stream (api.py pack_variant)
  std::vector<uint8_t> z =
      zstd_pack(base_stream, nbytes, std::min(zstd_level, 10));
  bool base_z = !z.empty() && z.size() < nbytes;
  unsigned flags = (pointwise ? FLAG_POINTWISE : 0) |
                   (base_z ? FLAG_BASE_Z : 0);
  if (rp && rp->present) flags |= FLAG_RESID;
  Blob o;
  pack_header(o, flags, mode, h, w, mn, mx, dc_b, (uint32_t)bits, max_step_b,
              geom, base_mask_plane, base_keep_mask);
  if (rp && rp->present) {
    o.le<float>(rp->rmin);
    o.le<float>(rp->rmax);
    o.le<float>(rp->dc_r);
    o.le<uint8_t>(rp->max_step_r);
    o.le<uint32_t>(rp->nbits);
    o.le<uint64_t>(rp->zblob.size());
    o.le<uint8_t>(rp->mask_plane);
    o.le<uint16_t>(rp->keep_mask);
    o.raw(rp->zblob.data(), rp->zblob.size());
  }
  if (base_z)
    o.raw(z.data(), z.size());
  else
    o.raw(base_stream, nbytes);
  return std::move(o.b);
}

// native bitplane packing of one frame's coefficients up to trunc bits
std::vector<uint8_t> encode_stream(const LayerEnc& L, int64_t trunc) {
  int64_t cap = std::max<int64_t>(8, (trunc + 7) / 8);
  std::vector<uint8_t> arena(cap, 0);
  ebcc_coder_encode_batch(L.ci.data(), 1, L.h, L.w, L.g, L.P, L.J, &trunc,
                          arena.data(), cap);
  return arena;
}

}  // namespace

extern "C" {

// debug/test hook: the quantised base-layer coefficient plane as the
// encoder computes it (u16 scale -> pad -> DC -> fDWT -> weights -> trunc);
// out must hold padded(h)*padded(w) int32.  Returns the DC offset.
float ebcc_cpu_debug_base_coef(const float* data, int h, int w, int levels,
                               int32_t* out) {
  const size_t n = (size_t)h * w;
  float mn = data[0], mx = data[0];
  for (size_t i = 0; i < n; ++i) {
    mn = std::min(mn, data[i]);
    mx = std::max(mx, data[i]);
  }
  std::vector<float> u16 = scale_u16(data, n, mn, mx - mn);
  LayerEnc base;
  base.init(h, w, levels, 30, 8);
  float dc = base.transform(u16.data(), h, w);
  memcpy(out, base.ci.data(), base.ci.size() * sizeof(int32_t));
  return dc;
}

// debug/test hook: data-domain base reconstruction at a truncation point
// (out: [h, w] floats)
void ebcc_cpu_debug_base_rec(const float* data, int h, int w, int levels,
                             int nplanes, int nchunks, int b, int js, int jr,
                             int fine, float* out) {
  const size_t n = (size_t)h * w;
  float mn = data[0], mx = data[0];
  for (size_t i = 0; i < n; ++i) {
    mn = std::min(mn, data[i]);
    mx = std::max(mx, data[i]);
  }
  float rng = mx - mn;
  std::vector<float> u16 = scale_u16(data, n, mn, rng);
  LayerEnc base;
  base.init(h, w, levels, nplanes, nchunks);
  float dc = base.transform(u16.data(), h, w);
  std::vector<float> coef((size_t)base.h * base.w);
  std::vector<float> rec((size_t)base.h * base.w);
  base.recon_coef(b, js, jr, fine != 0, coef.data());
  layer_recon(base, coef.data(), dc, U16_MAX, rec.data());
  float uc = RECIP_U16 * rng;
  for (int r = 0; r < h; ++r)
    for (int c = 0; c < w; ++c)
      out[(size_t)r * w + c] = std::fma(rec[(size_t)r * base.w + c], uc, mn);
}

// Encode ONE [h, w] float32 frame into a container (docs/FORMAT.md v3).
//
// mode/error/base_cr/residual_cr: codec config (codec/config.py).
// target: per-point error targets [h, w] for POINTWISE mode (already scaled
// by ratio * (1 - eps)); NULL otherwise.
// qbase: base-layer feasibility quantile (EBCC_INIT_BASE_ERROR_QUANTILE).
// use_chunk_mask: 0 = off, 1 = greedy mask search, 2 = union rule
// (config.mask_search; see search_mask above).
// Returns bytes written to out, or -1 bad input / -2 out_cap too small /
// -3 coefficient overflow (nplanes too small for this data).
int64_t ebcc_cpu_encode_frame(
    const float* data, const float* target_pw, int h, int w,
    int mode, float error, float base_cr, float residual_cr,
    float qbase, int disable_pure_fallback, int use_chunk_mask,
    int base_levels, int resid_levels, int nchunks,
    int base_nplanes, int resid_nplanes, int zstd_level,
    uint8_t* out, int64_t out_cap) {
  if (h < 4 || w < 4 || (int64_t)h * w > (1ll << 28) || nchunks < 1 ||
      nchunks > 64 || base_nplanes < 1 || base_nplanes > 30 ||
      resid_nplanes < 1 || resid_nplanes > 30)
    return -1;
  if (mode == MODE_POINTWISE && target_pw == nullptr) return -1;
  // levels clamp (api.compress semantics: max_lv from the frame geometry,
  // and the format-wide MAX_LEVELS = 8 cap shared with the decoders)
  int max_lv =
      std::max(0, 32 - __builtin_clz((unsigned)(std::min(h, w) - 1)) - 2);
  base_levels = std::min(std::max(base_levels, 0), std::min(max_lv, 8));
  resid_levels = std::min(std::max(resid_levels, 0), std::min(max_lv, 8));

  const size_t n = (size_t)h * w;
  float mn = data[0], mx = data[0];
  for (size_t i = 0; i < n; ++i) {
    float v = data[i];
    if (!std::isfinite(v)) return -1;  // j2k_codec.h:451-458
    mn = std::min(mn, v);
    mx = std::max(mx, v);
  }
  Geom geom{(uint8_t)base_levels, (uint8_t)resid_levels, (uint8_t)nchunks,
            (uint8_t)base_nplanes, (uint8_t)resid_nplanes};
  bool pointwise = mode == MODE_POINTWISE;
  uint16_t mode16 = (uint16_t)mode;

  if (mn == mx) {  // constant field shortcut (j2k_codec.h:515,731-735)
    Blob o;
    pack_header(o, FLAG_CONST | (pointwise ? FLAG_POINTWISE : 0), mode16, h,
                w, mn, mx, 0.0f, 0, 0, geom, MASK_NONE, 0);
    o.le<uint64_t>((uint64_t)n);  // tot_size
    if ((int64_t)o.b.size() > out_cap) return -2;
    memcpy(out, o.b.data(), o.b.size());
    return (int64_t)o.b.size();
  }

  // ---- base layer transform ----
  // The error reference is the u16-DEQUANTISED field and every target is
  // tightened by the frame's quantisation error maxq — mirroring the
  // device hostq path (pipeline._hostq_prelude + api._scale_u16_host),
  // whose error scans can only see the dequantised field (the original
  // f32 frames never cross the host->device link).  The end-to-end bound
  // on the ORIGINAL data holds by the triangle inequality:
  // |x - dec| <= |x - dataq| + |dataq - dec| <= maxq + (target - maxq).
  float rng = mx - mn;
  double tp0 = prof_now();
  std::vector<float> u16(n), dataq(n);
  const float maxq = scale_u16_ref(data, n, mn, rng, u16.data(),
                                   dataq.data(), nullptr);
  LayerEnc base;
  base.init(h, w, base_levels, base_nplanes, nchunks);
  float dc_b = base.transform(u16.data(), h, w);
  g_prof.t_transform += prof_now() - tp0;
  u16.clear();
  u16.shrink_to_fit();
  if (base.max_step > base.P - 1) return -3;

  // scratch buffers for candidate evaluation
  std::vector<float> coef_buf((size_t)base.h * base.w);
  std::vector<float> rec_buf((size_t)base.h * base.w);

  // Largest violation count still feasible under quantile qa — the scan
  // may stop once nv exceeds it: the verdict (infeasible) is then certain,
  // the partial maxd is > 0 (a violation was seen), and every consumer of
  // these stats uses only the verdict or the SIGN of maxd, so early exit
  // cannot change any selection (and therefore not the stream bytes).
  // The search's memo consults entries only at equal-or-lower qa (q-select
  // runs before the pure select), where "nv exceeded a larger threshold"
  // stays conclusive.
  auto exit_thresh = [n](float qa) -> size_t {
    if (qa <= 0.0f) return 0;
    size_t t = (size_t)((double)qa * (double)n);
    while ((double)(t + 1) / (double)n <= (double)qa) ++t;
    while (t > 0 && (double)t / (double)n > (double)qa) --t;
    return t;
  };

  // y / 65535 * rng + mn, reassociated + fused the way XLA compiles it.
  // Search evals fuse layer_recon into the pipeline: the weight division
  // rides the coefficient recon, the idwt runs in place on coef_buf with
  // its level-0 row pass DEFERRED, and each row is completed on demand
  // right before its error scan (scan_row_*) — rows past an infeasible
  // early exit are never row-lifted.  Same ops in the same order as the
  // full idwt + scan for every row that contributes to a verdict.
  const float unscale_c = RECIP_U16 * rng;
  const float tconst =
      (mode == MODE_REL_ERR ? error * rng : error) - maxq;
  std::vector<float> rowtmp(base.w);
  auto base_scan_fused = [&](float qa) -> ErrStats {
    float maxd = -std::numeric_limits<float>::infinity();
    int64_t nv = 0;
    const size_t T = exit_thresh(qa);
    for (int r = 0; r < h; ++r) {
      float* row = coef_buf.data() + (size_t)r * base.w;
      if (base.levels > 0) ebcc_cpu_idwt1d_row(row, base.w, rowtmp.data());
      const float* dqr = dataq.data() + (size_t)r * w;
      RowStats s =
          pointwise
              ? scan_row_base_pw(row, dqr, target_pw + (size_t)r * w, maxq,
                                 rowtmp.data(), dc_b, U16_MAX, unscale_c,
                                 mn, w)
              : scan_row_base(row, dqr, rowtmp.data(), dc_b, U16_MAX,
                              unscale_c, mn, tconst, w);
      maxd = std::max(maxd, s.maxd);
      nv += s.nv;
      if ((size_t)nv > T) break;  // infeasible for sure; maxd already > 0
    }
    return {maxd, (double)nv / (double)n};
  };
  auto base_eval = [&](int b, int js, int jr, bool fine,
                       float qa) -> ErrStats {
    double t0 = prof_now();
    base.recon_coef(b, js, jr, fine, coef_buf.data(), base.wplane);
    double t1 = prof_now();
    ebcc_cpu_idwt2d_multi_cols(coef_buf.data(), base.h, base.w,
                               base.levels);
    double t2 = prof_now();
    ErrStats e = base_scan_fused(qa);
    double t3 = prof_now();
    g_prof.t_recon += t1 - t0;
    g_prof.t_idwt += t2 - t1;
    g_prof.t_scan += t3 - t2;
    g_prof.n_eval += 1;
    return e;
  };
  // Masked evals keep a persistent coefficient plane: successive greedy
  // candidates differ in at most a few stripes' depths, so only the
  // XOR-diff stripes are recomputed (each element's value depends only on
  // its own (mag, depth, weight) — identical bits to a full rebuild) and
  // the plane is memcpy'd into coef_buf for the in-place IDWT.
  std::vector<float> cm_base;
  int cmb_b = -1;
  uint32_t cmb_drop = 0;
  auto base_evalm = [&](int b, uint32_t drop, float qa) -> ErrStats {
    double t0 = prof_now();
    size_t np = (size_t)base.h * base.w;
    if (cm_base.size() != np) cm_base.resize(np);
    if (cmb_b != b) {
      base.recon_coef_masked(b, drop, cm_base.data(), base.wplane);
    } else {
      uint32_t diff = cmb_drop ^ drop;
      for (int jj = 0; jj < base.J; ++jj)
        if ((diff >> jj) & 1u) {
          int r0, r1;
          base.stripe_rows(jj, &r0, &r1);
          base.recon_rows_masked(r0, r1, b + (int)((drop >> jj) & 1u),
                                 cm_base.data(), base.wplane);
        }
    }
    cmb_b = b;
    cmb_drop = drop;
    memcpy(coef_buf.data(), cm_base.data(), np * sizeof(float));
    double t1 = prof_now();
    ebcc_cpu_idwt2d_multi_cols(coef_buf.data(), base.h, base.w,
                               base.levels);
    double t2 = prof_now();
    ErrStats e = base_scan_fused(qa);
    double t3 = prof_now();
    g_prof.t_recon += t1 - t0;
    g_prof.t_idwt += t2 - t1;
    g_prof.t_scan += t3 - t2;
    g_prof.n_evalm += 1;
    return e;
  };

  SearchResult q, pure;
  MaskResult mq, mpure, mr;
  int64_t bits_b = 0, bits_pure_b = 0, bits_r = 0;
  bool skip_residual = false, resid_feasible = false, feasible_pure = false;
  bool error_bounded = mode == MODE_MAX_ERR || mode == MODE_REL_ERR ||
                       mode == MODE_POINTWISE;

  LayerEnc resid;
  ResidSetup rset{0, 0, 0};
  std::vector<float> base_rec;  // [h, w] data-domain chosen reconstruction
  bool decided_pure = false;    // early pure selection (api._decide_pure)

  if (error_bounded) {
    search_truncation(base, qbase, base_eval, &q, &pure);
    bits_b = q.bits;
    bits_pure_b = pure.bits;
    feasible_pure = pure.feasible;
    MaskMemo base_mask_memo;  // shared q -> pure (nonincreasing qa)
    mq = search_mask(base, qbase, q, use_chunk_mask, base_evalm,
                     &base_mask_memo);
    mpure = search_mask(base, 0.0f, pure, use_chunk_mask, base_evalm,
                        &base_mask_memo);
    // "Skip Residual" (j2k_codec.h:584) against the decoder's v4 view
    skip_residual = mq.maxd <= 0.0f;

    // Tier-0 of the early pure decision (api.py::_decide_pure, mirrored
    // for byte identity): pure's extra base bits cannot pay for even the
    // residual part's fixed container overhead, so pure wins regardless
    // of what the residual would compress to.  Needs no residual
    // quantities — the whole residual layer (build + truncation + mask
    // searches, the bulk of this encoder's time) is skipped.
    if (!skip_residual && feasible_pure && !disable_pure_fallback &&
        mpure.mbits - mq.mbits <= TIER0_MAX_EXTRA_BITS)
      decided_pure = true;
  }
  if (error_bounded && !skip_residual && !decided_pure) {
    double tr0 = prof_now();
    base_rec.resize(n);
    base_rec_at(base, q.bstar, q.kstar, dc_b, mn, unscale_c, h, w,
                coef_buf.data(), rec_buf.data(), base_rec.data(),
                mq.use, mq.use ? (((1u << base.J) - 1) & ~mq.keep) : 0);
    rset = make_resid_layer(resid, dataq.data(), base_rec.data(), h, w,
                            resid_levels, resid_nplanes, nchunks);
    g_prof.t_transform += prof_now() - tr0;
    if (resid.max_step > resid.P - 1) return -3;

    std::vector<float> rcoef((size_t)resid.h * resid.w);
    float rc0 = RECIP_RS * (rset.rmx - rset.rmn);
    // fused eval pipeline, same shape as the base layer's (see above)
    std::vector<float> rrowtmp(resid.w);
    auto resid_scan_fused = [&](float qa) -> ErrStats {
      float maxd = -std::numeric_limits<float>::infinity();
      int64_t nv = 0;
      const size_t T = exit_thresh(qa);
      for (int r = 0; r < h; ++r) {
        float* row = rcoef.data() + (size_t)r * resid.w;
        if (resid.levels > 0)
          ebcc_cpu_idwt1d_row(row, resid.w, rrowtmp.data());
        const float* dqr = dataq.data() + (size_t)r * w;
        const float* br = base_rec.data() + (size_t)r * w;
        RowStats s =
            pointwise
                ? scan_row_resid_pw(row, dqr, br, target_pw + (size_t)r * w,
                                    maxq, rrowtmp.data(), rset.dc_r,
                                    RESID_SCALE, rc0, rset.rmn, w)
                : scan_row_resid(row, dqr, br, rrowtmp.data(), rset.dc_r,
                                 RESID_SCALE, rc0, rset.rmn, tconst, w);
        maxd = std::max(maxd, s.maxd);
        nv += s.nv;
        if ((size_t)nv > T) break;  // infeasible for sure
      }
      return {maxd, (double)nv / (double)n};
    };
    auto resid_eval = [&](int b, int js2, int jr2, bool fine,
                          float qa) -> ErrStats {
      double t0 = prof_now();
      resid.recon_coef(b, js2, jr2, fine, rcoef.data(),
                       resid.wplane);
      double t1 = prof_now();
      ebcc_cpu_idwt2d_multi_cols(rcoef.data(), resid.h, resid.w,
                                 resid.levels);
      double t2 = prof_now();
      ErrStats e = resid_scan_fused(qa);
      double t3 = prof_now();
      g_prof.t_recon += t1 - t0;
      g_prof.t_idwt += t2 - t1;
      g_prof.t_scan += t3 - t2;
      g_prof.n_eval += 1;
      return e;
    };
    std::vector<float> cm_resid;
    int cmr_b = -1;
    uint32_t cmr_drop = 0;
    auto resid_evalm = [&](int b, uint32_t drop, float qa) -> ErrStats {
      double t0 = prof_now();
      size_t np = (size_t)resid.h * resid.w;
      if (cm_resid.size() != np) cm_resid.resize(np);
      if (cmr_b != b) {
        resid.recon_coef_masked(b, drop, cm_resid.data(),
                                resid.wplane);
      } else {
        uint32_t diff = cmr_drop ^ drop;
        for (int jj = 0; jj < resid.J; ++jj)
          if ((diff >> jj) & 1u) {
            int r0, r1;
            resid.stripe_rows(jj, &r0, &r1);
            resid.recon_rows_masked(r0, r1, b + (int)((drop >> jj) & 1u),
                                    cm_resid.data(), resid.wplane);
          }
      }
      cmr_b = b;
      cmr_drop = drop;
      memcpy(rcoef.data(), cm_resid.data(), np * sizeof(float));
      double t1 = prof_now();
      ebcc_cpu_idwt2d_multi_cols(rcoef.data(), resid.h, resid.w,
                                 resid.levels);
      double t2 = prof_now();
      ErrStats e = resid_scan_fused(qa);
      double t3 = prof_now();
      g_prof.t_recon += t1 - t0;
      g_prof.t_idwt += t2 - t1;
      g_prof.t_scan += t3 - t2;
      g_prof.n_evalm += 1;
      return e;
    };
    SearchResult rq;
    search_truncation(resid, 0.0f, resid_eval, &rq, nullptr);
    bits_r = rq.bits;
    resid_feasible = rq.feasible;
    mr = search_mask(resid, 0.0f, rq, use_chunk_mask, resid_evalm);
  }
  if (!error_bounded) {
    // NONE / SPARSIFICATION_FACTOR: rate-targeted truncation
    // (pipeline.py _encode_rate_targeted)
    auto pick = [&](const LayerEnc& L, int64_t budget, SearchResult* r) {
      // last candidate <= budget over the flattened (plane desc, k asc)
      // order; candidates are monotone nondecreasing
      int idx = -1;
      int total = L.P * 2 * L.J;
      for (int f = 0; f < total; ++f) {
        int b = L.P - 1 - f / (2 * L.J);
        int k = f % (2 * L.J);
        if (L.candidate(b, k) <= budget)
          idx = f;
        else
          break;
      }
      idx = std::max(idx, 0);
      r->bstar = L.P - 1 - idx / (2 * L.J);
      r->kstar = idx % (2 * L.J);
      r->bits = L.candidate(r->bstar, r->kstar);
      r->feasible = true;
    };
    pick(base, (int64_t)(32.0 * h * w / base_cr), &q);
    bits_b = bits_pure_b = q.bits;
    mq.mbits = mpure.mbits = q.bits;  // rate modes: no masking
    bool use_resid = mode == MODE_SPARS;
    skip_residual = !use_resid;
    resid_feasible = use_resid;
    if (use_resid) {
      base_rec.resize(n);
      base_rec_at(base, q.bstar, q.kstar, dc_b, mn, unscale_c, h, w,
                  coef_buf.data(), rec_buf.data(), base_rec.data());
      rset = make_resid_layer(resid, dataq.data(), base_rec.data(), h, w,
                              resid_levels, resid_nplanes, nchunks);
      if (resid.max_step > resid.P - 1) return -3;
      SearchResult rq;
      pick(resid, (int64_t)(8.0 * h * w / residual_cr), &rq);
      bits_r = rq.bits;
      mr.mbits = bits_r;
    }
  }

  // Remaining tiers of the early pure-base decision (api.py::_decide_pure
  // — the selection rule is mirrored bit-for-bit so both encoders keep
  // emitting byte-identical containers).  When any tier fires, the
  // residual arena/zstd and the combined variant are never built: pure is
  // either *required* (residual dropped or infeasible) or certainly
  // smaller (its extra base bits cost at most 2/5 of the residual
  // stream's raw bits; zstd never compresses these near-random streams
  // 2.5x).  Undecided frames keep the exact post-zstd byte comparison
  // below.
  if (error_bounded && !decided_pure) {
    bool present_pred = !skip_residual && mr.mbits > 0 &&
                        (size_t)((mr.mbits + 7) / 8) > MIN_RESID_BYTES;
    if (!skip_residual && (!present_pred || !resid_feasible))
      decided_pure = true;  // pure_required, known before packing
    else if (!disable_pure_fallback && present_pred && resid_feasible &&
             feasible_pure && (mpure.mbits - mq.mbits) * 5 <= mr.mbits * 2)
      decided_pure = true;
  }

  // ---- streams + container (api.py _pack_streams / _assemble_frame) ----
  // arena coverage: a masked selection splices kept refine chunks from
  // its plane's tail, so the arena must reach that plane's end (decided
  // frames emit only the pure variant, so only its coverage is needed)
  double tk0 = prof_now();
  int64_t arena_q = mq.use ? base.plane_end(q.bstar) : bits_b;
  int64_t arena_p = mpure.use ? base.plane_end(pure.bstar) : bits_pure_b;
  std::vector<uint8_t> base_arena = encode_stream(
      base, decided_pure ? arena_p : std::max(arena_q, arena_p));
  std::vector<uint8_t> base_q_spliced, base_pure_spliced;
  const uint8_t* base_q_ptr = base_arena.data();
  const uint8_t* base_pure_ptr = base_arena.data();
  if (mq.use && !decided_pure) {  // decided: arena may not cover q's plane
    base_q_spliced = splice_masked(base_arena.data(), base, q.bstar, mq.keep);
    base_q_ptr = base_q_spliced.data();
  }
  if (mpure.use) {
    base_pure_spliced =
        splice_masked(base_arena.data(), base, pure.bstar, mpure.keep);
    base_pure_ptr = base_pure_spliced.data();
  }
  ResidPart rp;
  if (!decided_pure && !skip_residual && mr.mbits > 0 && !resid.ci.empty()) {
    int64_t arena_r = mr.use ? resid.plane_end(mr.bstar) : bits_r;
    std::vector<uint8_t> rraw = encode_stream(resid, arena_r);
    if (mr.use)
      rraw = splice_masked(rraw.data(), resid, mr.bstar, mr.keep);
    size_t rbytes = (size_t)((mr.mbits + 7) / 8);
    if (rbytes > MIN_RESID_BYTES) {
      rp.zblob = zstd_pack(rraw.data(), rbytes, zstd_level);
      if (!rp.zblob.empty()) {
        rp.present = true;
        rp.rmin = rset.rmn;
        rp.rmax = rset.rmx;
        rp.dc_r = rset.dc_r;
        rp.max_step_r = (uint8_t)resid.max_step;
        rp.nbits = (uint32_t)mr.mbits;
        if (mr.use) {
          rp.mask_plane = (uint8_t)mr.bstar;
          rp.keep_mask = (uint16_t)mr.keep;
        }
      }
    }
  }

  std::vector<uint8_t> combined;
  if (!decided_pure)
    combined = pack_variant(
        mode16, h, w, mn, mx, dc_b, (uint8_t)base.max_step, geom, mq.mbits,
        base_q_ptr, mq.use ? (uint8_t)q.bstar : MASK_NONE,
        mq.use ? (uint16_t)mq.keep : 0, &rp, pointwise, zstd_level);
  std::vector<uint8_t>* chosen = &combined;
  std::vector<uint8_t> pure_blob;
  if (error_bounded) {
    // pure-base fallback comparison (j2k_codec.h:663-695, api.py)
    bool pure_required = !skip_residual && (!rp.present || !resid_feasible);
    if (decided_pure || !(disable_pure_fallback && !pure_required)) {
      pure_blob = pack_variant(
          mode16, h, w, mn, mx, dc_b, (uint8_t)base.max_step, geom,
          mpure.mbits, base_pure_ptr,
          mpure.use ? (uint8_t)pure.bstar : MASK_NONE,
          mpure.use ? (uint16_t)mpure.keep : 0, nullptr, pointwise,
          zstd_level);
      if (decided_pure || pure_required ||
          (feasible_pure && pure_blob.size() < combined.size()))
        chosen = &pure_blob;
    }
  }
  if ((int64_t)chosen->size() > out_cap) return -2;
  memcpy(out, chosen->data(), chosen->size());
  g_prof.t_pack += prof_now() - tk0;
  return (int64_t)chosen->size();
}

// Stage-profiling counters accumulated by ebcc_cpu_encode_frame since the
// last fetch: out[7] = {transform_s, recon_s, idwt_s, scan_s, pack_s,
// n_eval, n_evalm}.  Fetch-and-reset; timing-only (no computation depends
// on it).
void ebcc_cpu_prof_fetch(double* out) {
  out[0] = g_prof.t_transform;
  out[1] = g_prof.t_recon;
  out[2] = g_prof.t_idwt;
  out[3] = g_prof.t_scan;
  out[4] = g_prof.t_pack;
  out[5] = g_prof.n_eval;
  out[6] = g_prof.n_evalm;
  g_prof = ProfCounters();
}

// Host-side u16 quantisation of a frame batch for the device hostq encode
// (api._scale_u16_host): per frame writes the uint16 plane and returns
// (mn, mx, maxq), where maxq bounds |data - dequantise(u)| via the SAME
// arithmetic (scale_u16_ref) the in-process encoder above uses — keeping
// device and CPU containers byte-identical.  Threaded per frame.
void ebcc_scale_u16_batch(const float* data, int nframes, int h, int w,
                          uint16_t* u_out, float* mn_out, float* mx_out,
                          float* maxq_out) {
  const size_t n = (size_t)h * w;
  auto work = [&](int f) {
    const float* d = data + (size_t)f * n;
    float mn = d[0], mx = d[0];
    for (size_t i = 0; i < n; ++i) {
      mn = std::min(mn, d[i]);
      mx = std::max(mx, d[i]);
    }
    mn_out[f] = mn;
    mx_out[f] = mx;
    maxq_out[f] = scale_u16_ref(d, n, mn, mx - mn, nullptr, nullptr,
                                u_out + (size_t)f * n);
  };
  int nt = (int)std::thread::hardware_concurrency();
  if (nt < 1) nt = 1;
  if (nt > nframes) nt = nframes;
  if (nt <= 1) {
    for (int f = 0; f < nframes; ++f) work(f);
    return;
  }
  std::vector<std::thread> ts;
  ts.reserve(nt);
  for (int t = 0; t < nt; ++t)
    ts.emplace_back([&, t]() {
      for (int f = t; f < nframes; f += nt) work(f);
    });
  for (auto& th : ts) th.join();
}

}  // extern "C"
