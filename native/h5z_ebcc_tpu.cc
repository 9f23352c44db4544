// HDF5 filter plugins for EBCC-TPU compressed datasets (encode + decode).
//
// Ecosystem-parity equivalent of the reference's filter plugins
// (/root/reference/src/h5z_j2k.c filter 308 + J2KEMU 309,
// src/h5z_j2k_pointwise.c filter 310): any HDF5 writer/reader that loads
// these plugins (HDF5_PLUGIN_PATH) compresses on a plain H5Dwrite and sees
// a normal float32 dataset on read.  Each chunk holds one self-describing
// EBCC-TPU frame container (docs/FORMAT.md), or an EBTB blob of per-frame
// containers when the chunk carries several frames; both directions run
// through the standalone CPU codec (ebcc_cpu_encoder.cc /
// ebcc_cpu_decoder.cc) — no JAX.
//
// Three build variants of this translation unit (native/Makefile), one
// filter id per shared library as the HDF5 plugin ABI requires:
//   (default)              id 33076 — standard filter (ref 308)
//   -DEBCC_PLUGIN_POINTWISE id 33077 — pointwise filter: chunk carries
//       [data ‖ error_bound] per frame; reads re-expand with a zeroed
//       bound plane (ref 310, h5z_j2k_pointwise.c:96-98, j2k_codec.h:1204)
//   -DEBCC_PLUGIN_EMULATE  id 33078 — emulation filter: the forward pass
//       compresses + decompresses in one step and stores the lossy floats,
//       for error-injection studies (ref 309, h5z_j2k.c:139-163)
//
// cd_values layout (matches the reference's filter config surface,
// ebcc_wrapper/filter_wrapper.py:19-58): [height, width,
// base_cr (float bit-cast), residual mode, parameter (float bit-cast)].
// Leading chunk dims are inferred from the chunk byte count (h5z_j2k.c:52).
//
// The HDF5 plugin ABI is declared inline (public, stable C ABI) because
// this image ships no libhdf5 headers; the plugins never call into
// libhdf5, they only export the two discovery hooks.

#include <zstd.h>

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

// ---- minimal, stable HDF5 plugin ABI declarations ----
extern "C" {
typedef int H5Z_filter_t;
typedef size_t (*H5Z_func_t)(unsigned int flags, size_t cd_nelmts,
                             const unsigned int cd_values[], size_t nbytes,
                             size_t* buf_size, void** buf);
typedef struct H5Z_class2_t {
  int version;                   // H5Z_CLASS_T_VERS == 1
  H5Z_filter_t id;
  unsigned encoder_present;
  unsigned decoder_present;
  const char* name;
  void* can_apply;               // H5Z_can_apply_func_t (unused -> NULL)
  void* set_local;               // H5Z_set_local_func_t (unused -> NULL)
  H5Z_func_t filter;
} H5Z_class2_t;
#define H5Z_FLAG_REVERSE 0x0100u
typedef enum { H5PL_TYPE_ERROR = -1, H5PL_TYPE_FILTER = 0 } H5PL_type_t;

int ebcc_cpu_decode_frame(
    const uint8_t* base_stream, int64_t base_nbits, int max_step_b,
    float mn, float mx, float dc_b,
    int h, int w, int base_levels, int base_nplanes, int nchunks,
    int base_mask_plane, uint32_t base_keep_mask,
    int has_resid, const uint8_t* resid_stream, int64_t resid_nbits,
    int max_step_r, float rmin, float rmax, float dc_r, int resid_levels,
    int resid_nplanes, int resid_mask_plane, uint32_t resid_keep_mask,
    float* out);

int64_t ebcc_cpu_encode_frame(
    const float* data, const float* target_pw, int h, int w,
    int mode, float error, float base_cr, float residual_cr,
    float qbase, int disable_pure_fallback, int use_chunk_mask,
    int base_levels, int resid_levels, int nchunks,
    int base_nplanes, int resid_nplanes, int zstd_level,
    uint8_t* out, int64_t out_cap);
}

namespace {

#if defined(EBCC_PLUGIN_POINTWISE)
constexpr H5Z_filter_t kFilterId = 33077;
constexpr const char* kName = "EBCC-TPU pointwise error-bounded compressor";
#elif defined(EBCC_PLUGIN_EMULATE)
constexpr H5Z_filter_t kFilterId = 33078;
constexpr const char* kName = "EBCC-TPU compressor (emulation: lossy store)";
#else
constexpr H5Z_filter_t kFilterId = 33076;
constexpr const char* kName = "EBCC-TPU error-bounded climate compressor";
#endif

// little-endian readers (container.py layouts)
template <typename T>
T rd(const uint8_t* p) {
  T v;
  memcpy(&v, p, sizeof(T));
  return v;
}

float u32_to_float(unsigned int v) {
  float f;
  memcpy(&f, &v, sizeof(f));
  return f;
}

constexpr unsigned FLAG_CONST = 1, FLAG_RESID = 2, FLAG_BASE_Z = 8;
constexpr size_t HDR3_SIZE = 4 + 1 + 1 + 2 + 4 + 4 + 4 + 4 + 4 + 4 + 1 + 5;
constexpr size_t HDR_SIZE = HDR3_SIZE + 1 + 2;  // v4: + mask_plane, keep
constexpr size_t RES3_SIZE = 4 + 4 + 4 + 1 + 4 + 8;
constexpr size_t RES_SIZE = RES3_SIZE + 1 + 2;
constexpr int MASK_NONE = 0xFF;

// codec geometry defaults (codec/config.py EBCCConfig); the container is
// self-describing so readers never depend on these
constexpr int kBaseLevels = 5, kResidLevels = 3, kNchunks = 8;
constexpr int kBaseNplanes = 22, kResidNplanes = 14, kZstdLevel = 19;

// decode ONE frame container at p[0..len) into out (resized); returns
// false on any malformed input
bool decode_one_frame(const uint8_t* p, size_t len, std::vector<float>& out,
                      uint32_t* oh, uint32_t* ow) {
  if (len < HDR3_SIZE || memcmp(p, "EBT1", 4) != 0 ||
      (p[4] != 3 && p[4] != 4))
    return false;
  const bool v4 = p[4] == 4;
  const size_t hdr_size = v4 ? HDR_SIZE : HDR3_SIZE;
  const size_t res_size = v4 ? RES_SIZE : RES3_SIZE;
  if (len < hdr_size) return false;
  unsigned flags = p[5];
  uint32_t h = rd<uint32_t>(p + 8), w = rd<uint32_t>(p + 12);
  float mn = rd<float>(p + 16), mx = rd<float>(p + 20);
  float dc_b = rd<float>(p + 24);
  uint32_t base_nbits = rd<uint32_t>(p + 28);
  int max_step_b = p[32];
  int base_levels = p[33], resid_levels = p[34], nchunks = p[35];
  int base_nplanes = p[36], resid_nplanes = p[37];
  int base_mask_plane = -1;
  uint32_t base_keep = 0;
  if (v4 && p[38] != MASK_NONE) {
    base_mask_plane = p[38];
    base_keep = rd<uint16_t>(p + 39);
    if (base_mask_plane >= base_nplanes) return false;
  }

  // the header is untrusted file content: bound every field that sizes an
  // allocation, a shift, or a read.  levels <= 8 (legit frames never exceed
  // max_lv = bit_length(min(h,w)-1)-2 <= 14, and the codec defaults to 5;
  // larger values make synthesis_peaks allocate multi-GiB grids), and the
  // declared stream bit counts may not exceed 64 bits/px (zstd-bomb guard).
  if (h == 0 || w == 0 || h > 65536 || w > 65536 ||
      (uint64_t)h * w > (1ull << 28) || base_levels > 8 ||
      resid_levels > 8 || nchunks < 1 || nchunks > 64 ||
      base_nplanes < 1 || base_nplanes > 30 || resid_nplanes > 30 ||
      max_step_b > 30 ||
      (uint64_t)base_nbits > 64ull * h * w)
    return false;

  *oh = h;
  *ow = w;
  out.resize((size_t)h * w);

  if (flags & FLAG_CONST) {
    for (auto& v : out) v = mn;
    return true;
  }

  size_t off = hdr_size;
  float rmin = 0, rmax = 0, dc_r = 0;
  int max_step_r = 0;
  uint32_t resid_nbits = 0;
  int resid_mask_plane = -1;
  uint32_t resid_keep = 0;
  std::vector<uint8_t> resid_raw;
  if (flags & FLAG_RESID) {
    if (len < off + res_size) return false;
    rmin = rd<float>(p + off);
    rmax = rd<float>(p + off + 4);
    dc_r = rd<float>(p + off + 8);
    max_step_r = p[off + 12];
    resid_nbits = rd<uint32_t>(p + off + 13);
    uint64_t zlen = rd<uint64_t>(p + off + 17);
    if (v4 && p[off + 25] != MASK_NONE) {
      resid_mask_plane = p[off + 25];
      resid_keep = rd<uint16_t>(p + off + 26);
      if (resid_mask_plane >= resid_nplanes) return false;
    }
    off += res_size;
    if (zlen > len - off ||  // off <= len; no overflow
        max_step_r > 30 || (uint64_t)resid_nbits > 64ull * h * w)
      return false;
    resid_raw.resize((resid_nbits + 7) / 8);
    size_t r = ZSTD_decompress(resid_raw.data(), resid_raw.size(), p + off,
                               zlen);
    if (ZSTD_isError(r) || r * 8 < resid_nbits) return false;
    off += zlen;
  }
  std::vector<uint8_t> base_raw;
  const uint8_t* base_ptr = p + off;
  size_t base_len = len - off;
  if (flags & FLAG_BASE_Z) {
    base_raw.resize((base_nbits + 7) / 8);
    size_t r = ZSTD_decompress(base_raw.data(), base_raw.size(), base_ptr,
                               base_len);
    if (ZSTD_isError(r) || r * 8 < base_nbits) return false;
    base_ptr = base_raw.data();
  } else if (base_len * 8 < base_nbits) {
    return false;  // declared bits not backed by bytes
  }
  return ebcc_cpu_decode_frame(
             base_ptr, base_nbits, max_step_b, mn, mx, dc_b, (int)h, (int)w,
             base_levels, base_nplanes, nchunks, base_mask_plane, base_keep,
             (flags & FLAG_RESID) ? 1 : 0, resid_raw.data(), resid_nbits,
             max_step_r, rmin, rmax, dc_r, resid_levels, resid_nplanes,
             resid_mask_plane, resid_keep, out.data()) == 0;
}

// decode a chunk payload: a bare EBT1 frame or an EBTB multi-frame blob;
// frames concatenate into out
bool decode_payload(const uint8_t* p, size_t nbytes, std::vector<float>& out,
                    uint32_t* oh, uint32_t* ow, uint32_t* od) {
  if (nbytes >= 8 && memcmp(p, "EBTB", 4) == 0) {
    uint32_t nf = rd<uint32_t>(p + 4);
    if (nf == 0 || nf > 65536) return false;
    size_t off = 8;
    if (nbytes < off + 8ull * nf) return false;
    std::vector<uint64_t> lens(nf);
    for (uint32_t i = 0; i < nf; ++i)
      lens[i] = rd<uint64_t>(p + off + 8ull * i);
    off += 8ull * nf;
    std::vector<float> frame;
    uint32_t h = 0, w = 0;
    for (uint32_t i = 0; i < nf; ++i) {
      if (lens[i] > nbytes - off) return false;
      uint32_t fh, fw;
      if (!decode_one_frame(p + off, lens[i], frame, &fh, &fw)) return false;
      if (i == 0) {
        h = fh;
        w = fw;
        out.reserve((size_t)nf * h * w);
      } else if (fh != h || fw != w) {
        return false;
      }
      out.insert(out.end(), frame.begin(), frame.end());
      off += lens[i];
    }
    *oh = h;
    *ow = w;
    *od = nf;
    return true;
  }
  *od = 1;
  return decode_one_frame(p, nbytes, out, oh, ow);
}

struct EncCfg {
  uint32_t h = 0, w = 0;
  float base_cr = 100.0f;
  int mode = 3;  // relative_error default (filter_wrapper.py:116-118)
  float param = 0.01f;
  float qbase = 1e-6f;
  int disable_pure_fallback = 0;
};

bool parse_cd(size_t cd_nelmts, const unsigned int* cd_values, EncCfg* c) {
  if (cd_nelmts < 5) return false;
  c->h = cd_values[0];
  c->w = cd_values[1];
  c->base_cr = u32_to_float(cd_values[2]);
  c->mode = (int)cd_values[3];
  c->param = u32_to_float(cd_values[4]);
  if (c->h < 4 || c->w < 4 || c->h > 65536 || c->w > 65536) return false;
  if (!(c->base_cr > 0.0f) || !std::isfinite(c->base_cr)) return false;
  if (c->mode == 4 || c->mode > 5 || c->mode < 0) return false;  // QUANTILE
  if (!std::isfinite(c->param)) return false;
  // env config, matching codec/config.py base_error_quantile /
  // pure_fallback_disabled (j2k_codec.h:471-487)
  if (const char* q = getenv("EBCC_INIT_BASE_ERROR_QUANTILE")) {
    char* end = nullptr;
    float v = strtof(q, &end);
    if (end != q && std::isfinite(v)) c->qbase = v;
  }
  if (getenv("EBCC_DISABLE_PURE_JP2_FALLBACK")) c->disable_pure_fallback = 1;
  return true;
}

// encode d frames (multi-frame chunks fan out over host threads);
// returns the chunk payload (bare frame or EBTB blob)
bool encode_frames(const float* data, const float* targets, uint32_t d,
                   uint32_t h, uint32_t w, const EncCfg& c,
                   std::vector<uint8_t>& out) {
  size_t n = (size_t)h * w;
  int64_t cap = (int64_t)8 * n + 65536;
  std::vector<std::vector<uint8_t>> parts(d);
  float error = 0.0f, residual_cr = 10.0f;
  if (c.mode == 2 || c.mode == 3) error = c.param;
  if (c.mode == 1) residual_cr = c.param;
  std::atomic<bool> ok{true};
  auto run = [&](uint32_t i) {
    if (!ok) return;  // a sibling frame already failed: stop early
    // exceptions must not escape a worker thread (std::terminate would
    // abort the whole host process; the filter entry's catch can't help)
    try {
      std::vector<uint8_t> frame(cap);
      int64_t sz = ebcc_cpu_encode_frame(
          data + (size_t)i * n, targets ? targets + (size_t)i * n : nullptr,
          (int)h, (int)w, c.mode, error, c.base_cr, residual_cr, c.qbase,
          c.disable_pure_fallback, /*use_chunk_mask=*/1, kBaseLevels,
          kResidLevels, kNchunks, kBaseNplanes, kResidNplanes, kZstdLevel,
          frame.data(), cap);
      if (sz < 0) {
        ok = false;
        return;
      }
      parts[i].assign(frame.begin(), frame.begin() + sz);
    } catch (...) {
      ok = false;
    }
  };
  unsigned nthreads = std::min<unsigned>(
      d, std::max(1u, std::thread::hardware_concurrency()));
  if (nthreads <= 1) {
    for (uint32_t i = 0; i < d; ++i) run(i);
  } else {
    std::vector<std::thread> ts;
    for (unsigned t = 0; t < nthreads; ++t)
      ts.emplace_back([&, t]() {
        for (uint32_t i = t; i < d; i += nthreads) run(i);
      });
    for (auto& th : ts) th.join();
  }
  if (!ok) return false;
  if (d == 1) {
    out = std::move(parts[0]);
    return true;
  }
  out.clear();
  out.insert(out.end(), {'E', 'B', 'T', 'B'});
  uint32_t nf = d;
  out.insert(out.end(), (uint8_t*)&nf, (uint8_t*)&nf + 4);
  for (auto& pt : parts) {
    uint64_t ln = pt.size();
    out.insert(out.end(), (uint8_t*)&ln, (uint8_t*)&ln + 8);
  }
  for (auto& pt : parts) out.insert(out.end(), pt.begin(), pt.end());
  return true;
}

// replace *buf with a malloc'd copy of v
[[maybe_unused]] size_t emit(const std::vector<uint8_t>& v, size_t* buf_size,
                             void** buf) {
  void* p = malloc(v.size());
  if (!p) return 0;
  memcpy(p, v.data(), v.size());
  free(*buf);
  *buf = p;
  *buf_size = v.size();
  return v.size();
}

size_t emit_f(const std::vector<float>& v, size_t* buf_size, void** buf) {
  size_t n = v.size() * sizeof(float);
  void* p = malloc(n);
  if (!p) return 0;
  memcpy(p, v.data(), n);
  free(*buf);
  *buf = p;
  *buf_size = n;
  return n;
}

[[maybe_unused]] size_t decode_chunk(size_t nbytes, size_t* buf_size,
                                     void** buf) {
  const uint8_t* p = (const uint8_t*)*buf;
  std::vector<float> out;
  uint32_t h, w, d;
  if (!decode_payload(p, nbytes, out, &h, &w, &d)) return 0;
#if defined(EBCC_PLUGIN_POINTWISE)
  // re-expand to [d, 2, h, w] with a zeroed error-bound plane so the HDF5
  // chunk shape round-trips (j2k_codec.h:1204-1214)
  std::vector<float> wide((size_t)d * 2 * h * w, 0.0f);
  for (uint32_t i = 0; i < d; ++i)
    memcpy(wide.data() + (size_t)i * 2 * h * w,
           out.data() + (size_t)i * h * w, (size_t)h * w * sizeof(float));
  return emit_f(wide, buf_size, buf);
#else
  return emit_f(out, buf_size, buf);
#endif
}

size_t encode_chunk(size_t cd_nelmts, const unsigned int* cd_values,
                    size_t nbytes, size_t* buf_size, void** buf) {
  EncCfg c;
  if (!parse_cd(cd_nelmts, cd_values, &c)) return 0;
  size_t n = (size_t)c.h * c.w;
  size_t nfloats = nbytes / sizeof(float);
  const float* p = (const float*)*buf;
#if defined(EBCC_PLUGIN_POINTWISE)
  // chunk is [d, 2, h, w]: per frame, data plane then error-bound plane
  // (the reference's (…, 2, H, W) chunking, filter_wrapper.py:52; its
  // nbytes/2 split, h5z_j2k_pointwise.c:96-98, is the d == 1 case)
  if (c.mode != 5) return 0;  // pointwise filter demands POINTWISE mode
  if (nfloats == 0 || nfloats % (2 * n) != 0) return 0;
  uint32_t d = (uint32_t)(nfloats / (2 * n));
  std::vector<float> data((size_t)d * n), tgt((size_t)d * n);
  float ratio = c.param > 0.0f ? c.param : 1.0f;
  for (uint32_t i = 0; i < d; ++i) {
    memcpy(data.data() + (size_t)i * n, p + (size_t)i * 2 * n,
           n * sizeof(float));
    const float* eb = p + (size_t)i * 2 * n + n;
    float* t = tgt.data() + (size_t)i * n;
    // per-point target with the drift-absorbing safety margin: one u16
    // quantum of the frame range, floored at half the scaled bound —
    // mirrors api.pointwise_targets exactly (j2k_codec.h:842-845
    // semantics; the reference's 1-1e-8 margin rounds to 1.0f)
    const float* fd = data.data() + (size_t)i * n;
    float mn = fd[0], mx = fd[0];
    for (size_t k = 1; k < n; ++k) {
      mn = std::min(mn, fd[k]);
      mx = std::max(mx, fd[k]);
    }
    float slack = (mx - mn) * (float)(1.0 / 65535.0);  // == np.float32(1/65535)
    for (size_t k = 0; k < n; ++k) {
      float t0 = eb[k] * ratio;
      t[k] = std::max(t0 - slack, t0 * 0.5f);
    }
  }
  std::vector<uint8_t> payload;
  if (!encode_frames(data.data(), tgt.data(), d, c.h, c.w, c, payload))
    return 0;
#else
  if (c.mode == 5) return 0;  // pointwise mode needs the pointwise filter
  if (nfloats == 0 || nfloats % n != 0) return 0;
  uint32_t d = (uint32_t)(nfloats / n);
  std::vector<uint8_t> payload;
  if (!encode_frames(p, nullptr, d, c.h, c.w, c, payload)) return 0;
#endif
#if defined(EBCC_PLUGIN_EMULATE)
  // emulation: store the LOSSY floats, not the compressed stream
  // (h5z_j2k.c:139-163)
  std::vector<float> lossy;
  uint32_t oh, ow, od;
  if (!decode_payload(payload.data(), payload.size(), lossy, &oh, &ow, &od))
    return 0;
  return emit_f(lossy, buf_size, buf);
#else
  return emit(payload, buf_size, buf);
#endif
}

size_t filter_fn(unsigned int flags, size_t cd_nelmts,
                 const unsigned int* cd_values, size_t nbytes,
                 size_t* buf_size, void** buf) {
  // allocation failure (std::bad_alloc) must not escape the extern "C"
  // filter callback — it would abort the host HDF5 process
  try {
#if defined(EBCC_PLUGIN_EMULATE)
    if (flags & H5Z_FLAG_REVERSE) return nbytes;  // stored data is plain f32
#else
    if (flags & H5Z_FLAG_REVERSE) return decode_chunk(nbytes, buf_size, buf);
#endif
    return encode_chunk(cd_nelmts, cd_values, nbytes, buf_size, buf);
  } catch (...) {
    return 0;
  }
}

const H5Z_class2_t kClass = {
    1,  // H5Z_CLASS_T_VERS
    kFilterId,
    1,  // encoder_present
    1,  // decoder_present
    kName,
    nullptr,
    nullptr,
    filter_fn,
};

}  // namespace

extern "C" {
H5PL_type_t H5PLget_plugin_type(void) { return H5PL_TYPE_FILTER; }
const void* H5PLget_plugin_info(void) { return &kClass; }
}
