// HDF5 filter plugin for EBCC-TPU compressed datasets (decode side).
//
// Ecosystem-parity equivalent of the reference's filter plugin
// (/root/reference/src/h5z_j2k.c, filter 308): any HDF5 reader that loads
// this plugin (HDF5_PLUGIN_PATH) sees a normal float32 dataset.  Each chunk
// holds one self-describing EBCC-TPU frame container (docs/FORMAT.md);
// decoding runs through the standalone CPU decoder
// (ebcc_cpu_decoder.cc) — no JAX.
//
// The write direction is intentionally not implemented in the filter: the
// encoder runs on the TPU and the Python writer stores pre-compressed
// chunks with H5Dwrite_chunk (ebcc_tpu/wrappers/hdf5.py,
// write_filtered_dataset).  encoder_present = 0 advertises this.
//
// The HDF5 plugin ABI is declared inline (public, stable C ABI) because
// this image ships no libhdf5 headers; the plugin itself never calls into
// libhdf5, it only exports the two discovery hooks.

#include <zstd.h>

#include <cstdint>
#include <cstdlib>
#include <cstring>
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
    int has_resid, const uint8_t* resid_stream, int64_t resid_nbits,
    int max_step_r, float rmin, float rmax, float dc_r, int resid_levels,
    int resid_nplanes, float* out);
}

namespace {

constexpr H5Z_filter_t kFilterId = 33076;  // EBCC-TPU (user-range id)

// little-endian readers (container.py layouts)
template <typename T>
T rd(const uint8_t* p) {
  T v;
  memcpy(&v, p, sizeof(T));
  return v;
}

constexpr unsigned FLAG_CONST = 1, FLAG_RESID = 2, FLAG_BASE_Z = 8;
constexpr size_t HDR_SIZE = 4 + 1 + 1 + 2 + 4 + 4 + 4 + 4 + 4 + 4 + 1 + 5;
constexpr size_t RES_SIZE = 4 + 4 + 4 + 1 + 4 + 8;

// RAII holder for the malloc'd output buffer (HDF5 frees it with free())
struct OutBuf {
  float* p = nullptr;
  explicit OutBuf(size_t n) : p((float*)malloc(n)) {}
  ~OutBuf() { free(p); }
  float* release() {
    float* q = p;
    p = nullptr;
    return q;
  }
};

size_t decode_chunk_impl(size_t nbytes, size_t* buf_size, void** buf) {
  const uint8_t* p = (const uint8_t*)*buf;
  if (nbytes < HDR_SIZE || memcmp(p, "EBT1", 4) != 0 || p[4] != 2) return 0;
  unsigned flags = p[5];
  // u16 mode at 6..8 (unused for decode)
  uint32_t h = rd<uint32_t>(p + 8), w = rd<uint32_t>(p + 12);
  float mn = rd<float>(p + 16), mx = rd<float>(p + 20);
  float dc_b = rd<float>(p + 24);
  uint32_t base_nbits = rd<uint32_t>(p + 28);
  int max_step_b = p[32];
  int base_levels = p[33], resid_levels = p[34], nchunks = p[35];
  int base_nplanes = p[36], resid_nplanes = p[37];

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
    return 0;

  size_t out_bytes = (size_t)h * w * sizeof(float);
  OutBuf out(out_bytes);
  if (!out.p) return 0;

  if (flags & FLAG_CONST) {
    for (size_t i = 0; i < (size_t)h * w; ++i) out.p[i] = mn;
    free(*buf);
    *buf = out.release();
    *buf_size = out_bytes;
    return out_bytes;
  }

  size_t off = HDR_SIZE;
  float rmin = 0, rmax = 0, dc_r = 0;
  int max_step_r = 0;
  uint32_t resid_nbits = 0;
  std::vector<uint8_t> resid_raw;
  if (flags & FLAG_RESID) {
    if (nbytes < off + RES_SIZE) return 0;
    rmin = rd<float>(p + off);
    rmax = rd<float>(p + off + 4);
    dc_r = rd<float>(p + off + 8);
    max_step_r = p[off + 12];
    resid_nbits = rd<uint32_t>(p + off + 13);
    uint64_t zlen = rd<uint64_t>(p + off + 17);
    off += RES_SIZE;
    if (zlen > nbytes - off ||  // off <= nbytes; no overflow
        max_step_r > 30 || (uint64_t)resid_nbits > 64ull * h * w)
      return 0;
    resid_raw.resize((resid_nbits + 7) / 8);
    size_t r = ZSTD_decompress(resid_raw.data(), resid_raw.size(),
                               p + off, zlen);
    if (ZSTD_isError(r) || r * 8 < resid_nbits) return 0;
    off += zlen;
  }
  std::vector<uint8_t> base_raw;
  const uint8_t* base_ptr = p + off;
  size_t base_len = nbytes - off;
  if (flags & FLAG_BASE_Z) {
    base_raw.resize((base_nbits + 7) / 8);
    size_t r = ZSTD_decompress(base_raw.data(), base_raw.size(), base_ptr,
                               base_len);
    if (ZSTD_isError(r) || r * 8 < base_nbits) return 0;
    base_ptr = base_raw.data();
  } else if (base_len * 8 < base_nbits) {
    return 0;  // declared bits not backed by bytes
  }
  int rc = ebcc_cpu_decode_frame(
      base_ptr, base_nbits, max_step_b, mn, mx, dc_b, (int)h, (int)w,
      base_levels, base_nplanes, nchunks,
      (flags & FLAG_RESID) ? 1 : 0, resid_raw.data(), resid_nbits,
      max_step_r, rmin, rmax, dc_r, resid_levels, resid_nplanes, out.p);
  if (rc != 0) return 0;
  free(*buf);
  *buf = out.release();
  *buf_size = out_bytes;
  return out_bytes;
}

size_t decode_chunk(size_t nbytes, size_t* buf_size, void** buf) {
  // allocation failure (std::bad_alloc) must not escape the extern "C"
  // filter callback — it would abort the host HDF5 reader process
  try {
    return decode_chunk_impl(nbytes, buf_size, buf);
  } catch (...) {
    return 0;
  }
}

size_t filter_fn(unsigned int flags, size_t /*cd_nelmts*/,
                 const unsigned int* /*cd_values*/, size_t nbytes,
                 size_t* buf_size, void** buf) {
  if (flags & H5Z_FLAG_REVERSE) return decode_chunk(nbytes, buf_size, buf);
  // Write path: chunks are stored pre-compressed via H5Dwrite_chunk
  // (which bypasses the pipeline).  A normal H5Dwrite reaching this point
  // means the caller tried to let HDF5 encode — fail loudly rather than
  // store something the decoder can't read.
  return 0;
}

const H5Z_class2_t kClass = {
    1,            // H5Z_CLASS_T_VERS
    kFilterId,
    // encoder "present" so dataset CREATION succeeds with the plugin
    // loaded; the forward pass itself errors (see filter_fn) because
    // writes go through H5Dwrite_chunk
    1,
    1,            // decoder_present
    "EBCC-TPU error-bounded climate compressor",
    nullptr,
    nullptr,
    filter_fn,
};

}  // namespace

extern "C" {
H5PL_type_t H5PLget_plugin_type(void) { return H5PL_TYPE_FILTER; }
const void* H5PLget_plugin_info(void) { return &kClass; }
}
