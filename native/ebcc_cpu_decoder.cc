// Standalone CPU frame decoder: container streams -> float32 frame,
// no JAX required.
//
// Replicates the device reconstruction path (ebcc_tpu/codec/pipeline.py
// _recon_stage and ops/dwt.py) in C++: structural bitstream decode
// (decode_core, shared with the host coder), per-subband synthesis-peak
// weights (ops/weights.py semantics), CDF 9/7 inverse lifting with the
// reference's boundary rules (dwt.h:113-144 / ops/dwt.py), DC add, clamp,
// crop, min-max unscale, residual add.  This is the piece that lets plain
// CPU readers (e.g. an HDF5 filter plugin) decode EBCC-TPU frames —
// the ecosystem role the reference's C library plays.
//
// Numerical note: float32 lifting here may differ from XLA's by last-ulp
// rounding; agreement with the JAX decoder is ~1e-3 in data units on ERA5
// scales (verified in tests/test_cpu_decoder.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <map>
#include <mutex>
#include <vector>

namespace {

constexpr float ALPHA = -1.586134342f;
constexpr float BETA = -0.05298011854f;
constexpr float GAMMA = 0.8829110762f;
constexpr float DELTA = 0.44355068522f;
constexpr float XI = 1.149604398f;
constexpr float U16_MAX = 65535.0f;
constexpr float RESID_SCALE = 255.0f;
// XLA strength-reduces division by a compile-time constant into a multiply
// by the f32-rounded reciprocal, and compiles each lifting step
// "a - C * (b1 + b2)" as a fused multiply-add of the f32 sum; std::fma /
// reciprocal multiplies below reproduce the XLA CPU arithmetic bit-for-bit
// (verified elementwise against jitted kernels)
constexpr float RECIP_XI = (float)(1.0 / (double)XI);
constexpr float RECIP_U16 = (float)(1.0 / (double)U16_MAX);
constexpr float RECIP_RS = (float)(1.0 / (double)RESID_SCALE);

// in-place inverse lifting of one contiguous length-n sequence ([s | d]).
// The boundary iterations are PEELED out of each lifting loop so the
// middle loops carry no conditionals and vectorise (same formula on the
// same operands per element — bit-identical to the unswitched form).
void idwt1d(float* x, int n, float* tmp) {
  int n2 = n / 2;
  float* s = tmp;
  float* d = tmp + n2;
  for (int i = 0; i < n2; ++i) s[i] = x[i] * RECIP_XI;  // x / XI
  for (int i = 0; i < n2; ++i) d[i] = x[n2 + i] * XI;
  // s -= DELTA * (d + reflect_prev(d))
  s[0] = std::fma(-DELTA, d[0] + d[1 < n2 ? 1 : 0], s[0]);
  for (int i = 1; i < n2; ++i)
    s[i] = std::fma(-DELTA, d[i] + d[i - 1], s[i]);
  // d -= GAMMA * (s + reflect_next(s))
  for (int i = 0; i + 1 < n2; ++i)
    d[i] = std::fma(-GAMMA, s[i] + s[i + 1], d[i]);
  d[n2 - 1] = std::fma(-GAMMA, s[n2 - 1] + s[n2 >= 2 ? n2 - 2 : 0],
                       d[n2 - 1]);
  // even = s - BETA * (d + reflect_prev(d))
  s[0] = std::fma(-BETA, d[0] + d[1 < n2 ? 1 : 0], s[0]);
  for (int i = 1; i < n2; ++i)
    s[i] = std::fma(-BETA, d[i] + d[i - 1], s[i]);  // s now holds even
  // odd = d - ALPHA * (even + edge_next(even))
  for (int i = 0; i + 1 < n2; ++i)
    d[i] = std::fma(-ALPHA, s[i] + s[i + 1], d[i]);
  d[n2 - 1] = std::fma(-ALPHA, s[n2 - 1] + s[n2 - 1], d[n2 - 1]);
  for (int i = 0; i < n2; ++i) {
    x[2 * i] = s[i];
    x[2 * i + 1] = d[i];
  }
}

// inverse column lifting on a BLOCK of bc contiguous columns (rows are
// strided W floats apart): same per-element arithmetic as idwt1d applied
// along axis 0, but each cache line is touched once per step instead of
// once per element (the col-by-col gather/scatter was the decoder's
// dominant cost).  tmp must hold n*bc floats.
void idwt1d_cols_block(float* x, int n, int W, int bc, float* tmp) {
  int n2 = n / 2;
  float* s = tmp;            // [n2][bc]
  float* d = tmp + (size_t)n2 * bc;
  for (int i = 0; i < n2; ++i)
    for (int c = 0; c < bc; ++c) s[(size_t)i * bc + c] =
        x[(size_t)i * W + c] * RECIP_XI;
  for (int i = 0; i < n2; ++i)
    for (int c = 0; c < bc; ++c) d[(size_t)i * bc + c] =
        x[(size_t)(n2 + i) * W + c] * XI;
  for (int i = 0; i < n2; ++i) {
    const float* dp = d + (size_t)(i == 0 ? (1 < n2 ? 1 : 0) : i - 1) * bc;
    float* si = s + (size_t)i * bc;
    const float* di = d + (size_t)i * bc;
    for (int c = 0; c < bc; ++c)
      si[c] = std::fma(-DELTA, di[c] + dp[c], si[c]);
  }
  for (int i = 0; i < n2; ++i) {
    const float* sn = s + (size_t)(i + 1 < n2 ? i + 1 : n2 - 2) * bc;
    float* di = d + (size_t)i * bc;
    const float* si = s + (size_t)i * bc;
    for (int c = 0; c < bc; ++c)
      di[c] = std::fma(-GAMMA, si[c] + sn[c], di[c]);
  }
  for (int i = 0; i < n2; ++i) {
    const float* dp = d + (size_t)(i == 0 ? (1 < n2 ? 1 : 0) : i - 1) * bc;
    float* si = s + (size_t)i * bc;
    const float* di = d + (size_t)i * bc;
    for (int c = 0; c < bc; ++c)
      si[c] = std::fma(-BETA, di[c] + dp[c], si[c]);  // s now holds even
  }
  for (int i = 0; i < n2; ++i) {
    const float* en = s + (size_t)(i + 1 < n2 ? i + 1 : n2 - 1) * bc;
    float* di = d + (size_t)i * bc;
    const float* si = s + (size_t)i * bc;
    for (int c = 0; c < bc; ++c)
      di[c] = std::fma(-ALPHA, si[c] + en[c], di[c]);  // d now holds odd
  }
  for (int i = 0; i < n2; ++i) {
    memcpy(x + (size_t)(2 * i) * W, s + (size_t)i * bc,
           bc * sizeof(float));
    memcpy(x + (size_t)(2 * i + 1) * W, d + (size_t)i * bc,
           bc * sizeof(float));
  }
}

// one inverse 2-D level over the top-left (hh, ww) region of an [H, W]
// plane: columns first, then rows (ops/dwt.py idwt2d)
void idwt2d_level(float* x, int hh, int ww, int W, float* tmp,
                  float* coltmp) {
  constexpr int BC = 128;
  for (int c0 = 0; c0 < ww; c0 += BC)
    idwt1d_cols_block(x + c0, hh, W, std::min(BC, ww - c0), coltmp);
  for (int r = 0; r < hh; ++r) idwt1d(x + (size_t)r * W, ww, tmp);
}

void idwt2d_multi(float* x, int H, int W, int levels) {
  std::vector<float> tmp(std::max(H, W));
  std::vector<float> coltmp((size_t)H * 128);
  for (int i = levels - 1; i >= 0; --i)
    idwt2d_level(x, H >> i, W >> i, W, tmp.data(), coltmp.data());
}

// ---- per-subband weights (ops/weights.py semantics) ----

// subband id per coefficient: 0 = deepest LL; per decomposition i (0 =
// shallowest): HL=3i+1, LH=3i+2, HH=3i+3
int subband_id(int r, int c, int h, int w, int levels) {
  for (int i = 0; i < levels; ++i) {
    int hh = h >> i, ww = w >> i;
    if (r < hh / 2 && c >= ww / 2 && c < ww) return 3 * i + 1;
    if (r >= hh / 2 && r < hh && c < ww / 2) return 3 * i + 2;
    if (r >= hh / 2 && r < hh && c >= ww / 2 && c < ww) return 3 * i + 3;
  }
  return 0;
}

std::mutex g_peaks_mu;
std::map<int, std::vector<float>> g_peaks;  // levels -> per-sid peak

const std::vector<float>& synthesis_peaks(int levels) {
  std::lock_guard<std::mutex> lk(g_peaks_mu);
  auto it = g_peaks.find(levels);
  if (it != g_peaks.end()) return it->second;
  int n = 1 << (levels + 3);
  int nsid = 3 * levels + 1;
  std::vector<float> peaks(nsid, 0.0f);
  std::vector<float> grid((size_t)n * n);
  for (int sid = 0; sid < nsid; ++sid) {
    // central coefficient of the subband in row-major order
    long count = 0;
    for (int r = 0; r < n; ++r)
      for (int c = 0; c < n; ++c)
        if (subband_id(r, c, n, n, levels) == sid) ++count;
    long target = count / 2, seen = 0;
    int cy = 0, cx = 0;
    for (int r = 0; r < n && seen <= target; ++r)
      for (int c = 0; c < n; ++c)
        if (subband_id(r, c, n, n, levels) == sid) {
          if (seen == target) {
            cy = r;
            cx = c;
            seen++;
            break;
          }
          seen++;
        }
    std::fill(grid.begin(), grid.end(), 0.0f);
    grid[(size_t)cy * n + cx] = 1.0f;
    idwt2d_multi(grid.data(), n, n, levels);
    float mx = 0.0f;
    for (float v : grid) mx = std::max(mx, std::fabs(v));
    // 1/1024-grid quantisation: must match ops/weights.py synthesis_peaks
    // exactly so the JAX and native weight tables are bit-identical
    peaks[sid] = (float)(std::nearbyint((double)mx * 1024.0) / 1024.0);
  }
  float mn = peaks[0];
  for (float& p : peaks) p = std::min(std::max(p, 0.125f), 8.0f);
  mn = *std::min_element(peaks.begin(), peaks.end());
  for (float& p : peaks) p /= mn;
  auto res = g_peaks.emplace(levels, std::move(peaks));
  return res.first->second;
}

}  // namespace

// structural decode (shared with the host coder, ebcc_coder.cc)
namespace {
struct SpecFwd {
  int h, w, g, nplanes, nchunks;
};
}
// forward declaration of the dispatcher defined in ebcc_coder.cc —
// signature must match (anonymous-namespace there, so we re-declare the
// C-visible batch API instead and decode via it)
extern "C" void ebcc_coder_decode_batch(const uint8_t* bytes,
                                        const int64_t* offsets,
                                        const int64_t* nbits,
                                        const int32_t* max_step,
                                        const int32_t* mask_plane,
                                        const uint32_t* keep_mask, int n,
                                        int h, int w, int g, int nplanes,
                                        int nchunks, float* out);

namespace {

// decode one layer: bitstream -> weighted coeffs -> /weights -> idwt ->
// + dc -> clamp -> (caller crops/unscales)
void decode_layer(const uint8_t* stream, int64_t nbits, int max_step,
                  int hp, int wp, int levels, int nplanes, int nchunks,
                  int mask_plane, uint32_t keep_mask,
                  float dc, float clamp_hi, float* plane) {
  int64_t off = 0;
  int32_t ms = max_step;
  int32_t mp = mask_plane;
  uint32_t km = keep_mask;
  ebcc_coder_decode_batch(stream, &off, &nbits, &ms, &mp, &km, 1, hp, wp,
                          levels + 1, nplanes, nchunks, plane);
  const auto& peaks = synthesis_peaks(levels);
  for (int r = 0; r < hp; ++r)
    for (int c = 0; c < wp; ++c)
      plane[(size_t)r * wp + c] /=
          peaks[subband_id(r, c, hp, wp, levels)];
  idwt2d_multi(plane, hp, wp, levels);
  for (size_t i = 0; i < (size_t)hp * wp; ++i)
    plane[i] = std::min(std::max(plane[i] + dc, 0.0f), clamp_hi);
}

int padded(int n, int levels) {
  int m = 1 << (levels + 1);
  return (n + m - 1) / m * m;
}

}  // namespace

extern "C" {

// shared helpers for the CPU encoder (ebcc_cpu_encoder.cc): inverse
// transform and the per-coefficient synthesis-peak weight plane
void ebcc_cpu_idwt2d_multi(float* x, int H, int W, int levels) {
  idwt2d_multi(x, H, W, levels);
}

// All inverse levels except the LAST level's row pass (level 0 stops after
// its column lifting).  The encoder's eval pipeline completes each row
// on demand with ebcc_cpu_idwt1d_row and fuses the error scan in — rows
// past an early feasibility exit are never row-lifted at all.  Completing
// every row reproduces ebcc_cpu_idwt2d_multi bit-for-bit (the row pass is
// per-row independent).
void ebcc_cpu_idwt2d_multi_cols(float* x, int H, int W, int levels) {
  if (levels <= 0) return;
  std::vector<float> tmp(std::max(H, W));
  std::vector<float> coltmp((size_t)H * 128);
  for (int i = levels - 1; i >= 1; --i)
    idwt2d_level(x, H >> i, W >> i, W, tmp.data(), coltmp.data());
  constexpr int BC = 128;
  for (int c0 = 0; c0 < W; c0 += BC)
    idwt1d_cols_block(x + c0, H, W, std::min(BC, W - c0), coltmp.data());
}

// one row of the deferred level-0 row pass (tmp must hold >= W floats)
void ebcc_cpu_idwt1d_row(float* row, int W, float* tmp) {
  idwt1d(row, W, tmp);
}

void ebcc_cpu_weight_plane(int hp, int wp, int levels, float* out) {
  const auto& peaks = synthesis_peaks(levels);
  for (int r = 0; r < hp; ++r)
    for (int c = 0; c < wp; ++c)
      out[(size_t)r * wp + c] = peaks[subband_id(r, c, hp, wp, levels)];
}

// Decode one frame to float32 [h, w] with no JAX involvement.
// base/resid streams are the raw (already un-zstd'd) bitstreams.
// has_resid: 0/1.  base/resid_mask_plane < 0 (or 0xFF from the container)
// disables the format-v4 chunk masking of the layer's final plane.
// Returns 0 on success.
int ebcc_cpu_decode_frame(
    const uint8_t* base_stream, int64_t base_nbits, int max_step_b,
    float mn, float mx, float dc_b,
    int h, int w, int base_levels, int base_nplanes, int nchunks,
    int base_mask_plane, uint32_t base_keep_mask,
    int has_resid, const uint8_t* resid_stream, int64_t resid_nbits,
    int max_step_r, float rmin, float rmax, float dc_r, int resid_levels,
    int resid_nplanes, int resid_mask_plane, uint32_t resid_keep_mask,
    float* out) {
  int hb = padded(h, base_levels), wb = padded(w, base_levels);
  std::vector<float> base((size_t)hb * wb);
  decode_layer(base_stream, base_nbits, max_step_b, hb, wb, base_levels,
               base_nplanes, nchunks, base_mask_plane, base_keep_mask,
               dc_b, U16_MAX, base.data());
  // y / 65535 * rng + mn, reassociated + fused the way XLA compiles it:
  // fma(y, recip * rng, mn)
  float c0 = RECIP_U16 * (mx - mn);
  for (int r = 0; r < h; ++r)
    for (int c = 0; c < w; ++c)
      out[(size_t)r * w + c] =
          std::fma(base[(size_t)r * wb + c], c0, mn);

  if (has_resid) {
    int hr = padded(h, resid_levels), wr = padded(w, resid_levels);
    std::vector<float> resid((size_t)hr * wr);
    decode_layer(resid_stream, resid_nbits, max_step_r, hr, wr,
                 resid_levels, resid_nplanes, nchunks, resid_mask_plane,
                 resid_keep_mask, dc_r, RESID_SCALE, resid.data());
    float c1 = RECIP_RS * (rmax - rmin);
    for (int r = 0; r < h; ++r)
      for (int c = 0; c < w; ++c)
        out[(size_t)r * w + c] +=
            std::fma(resid[(size_t)r * wr + c], c1, rmin);
  }
  return 0;
}

}  // extern "C"
