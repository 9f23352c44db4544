// Word-parallel bitplane coder (BMI2 PEXT/PDEP fast path).
//
// Same stream format as the scalar coder in ebcc_coder.cc (and the JAX
// packer, ops/bitplane.py) — see that file for the layout.  The key
// observation making word-parallelism possible: within every pass the
// emission mask depends only on PRE-pass state (each cell is visited once
// per pass; updates affect later passes only), so for each 64-cell word we
// can compute the emit mask with a handful of bit ops, compact the value
// bits with PEXT (encode) or expand freshly-read bits with PDEP (decode),
// and advance the stream by popcount(emit).  Work is O(words scanned +
// bits emitted) instead of O(cells x planes).
//
// Bit-significance bookkeeping per level is kept as per-plane "eq" bitmask
// tables (eq[b] bit i <=> msb(cell i) == b) plus a running "gt" mask
// (msb > current plane), built once per frame.
//
// Compiled with -mbmi2; callers must gate on cpu_has_bmi2().

#include <immintrin.h>

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace ebcc_fast {

struct Spec {
  int h, w, g, nplanes, nchunks;
};

bool cpu_has_bmi2() { return __builtin_cpu_supports("bmi2"); }

namespace {

// ---------------- bit I/O ----------------

struct BitWriter {
  uint8_t* buf;
  int64_t cap;  // truncation in bits; positions beyond are dropped
  int64_t pos = 0;

  // append k bits of w (bit j of w = j-th appended bit) to the MSB-first
  // stream
  inline void push(uint64_t w, int k) {
    if (k <= 0) return;
    int64_t p = pos;
    pos += k;
    if (p >= cap) return;
    if (p + k > cap) k = (int)(cap - p);
    int j = 0;
    while (j < k) {
      int64_t bit = p + j;
      int off = (int)(bit & 7);
      int take = std::min(8 - off, k - j);
      uint8_t chunk = 0;
      for (int t = 0; t < take; ++t)
        chunk |= (uint8_t)((w >> (j + t)) & 1) << (7 - off - t);
      buf[bit >> 3] |= chunk;
      j += take;
    }
  }
};

struct BitReader {
  const uint8_t* buf;
  int64_t nbits;
  int64_t pos = 0;

  // read k bits (LSB-order in the returned word); bits past nbits are 0;
  // *n_in receives how many of the k were inside the stream
  inline uint64_t pull(int k, int* n_in) {
    int64_t p = pos;
    pos += k;
    int64_t avail = nbits - p;
    if (avail < 0) avail = 0;
    int n = (int)std::min<int64_t>(k, avail);
    *n_in = n;
    uint64_t w = 0;
    for (int j = 0; j < n; ++j) {
      int64_t bit = p + j;
      w |= (uint64_t)((buf[bit >> 3] >> (7 - (bit & 7))) & 1) << j;
    }
    return w;
  }
};

// expand 32 parent bits (starting at parent bit index cw*32) to a 64-bit
// child mask (each parent bit duplicated)
static inline uint64_t expand_parent(const uint64_t* parent_row, int cw) {
  uint64_t pw = parent_row[cw >> 1];
  uint32_t m32 = (uint32_t)(pw >> ((cw & 1) * 32));
  uint64_t e = _pdep_u64((uint64_t)m32, 0x5555555555555555ULL);
  return e | (e << 1);
}

// per-level bitmask plane layout
struct Level {
  int hk, wk, stride;           // rows, cols, words per row
  uint64_t lastmask;            // valid-bit mask of the last word in a row
  std::vector<uint64_t> gt;     // running: value > current plane
  // eq[b] tables, flattened [nplanes][hk*stride]
  std::vector<uint64_t> eq;
  int nplanes;

  uint64_t* eqp(int b) { return eq.data() + (size_t)b * hk * stride; }

  void init(int hk_, int wk_, int nplanes_) {
    hk = hk_;
    wk = wk_;
    nplanes = nplanes_;
    stride = (wk + 63) / 64;
    int tail = wk - (stride - 1) * 64;
    lastmask = tail == 64 ? ~0ULL : ((1ULL << tail) - 1);
    gt.assign((size_t)hk * stride, 0);
    eq.assign((size_t)nplanes * hk * stride, 0);
  }
};

static inline int msb_of(uint32_t v) { return v ? 31 - __builtin_clz(v) : -1; }

struct FramePlan {
  Spec s;
  std::vector<Level> lv;        // lv[0] = coefficients, lv[k] = group level k
  std::vector<uint64_t> negm;   // sign mask, level-0 layout
  std::vector<uint32_t> mag;    // magnitudes (for refinement values)
  int max_step = 0;

  // build all tables from int32 coefficients
  void build(const int32_t* coef, const Spec& spec) {
    s = spec;
    const int h = s.h, w = s.w, g = s.g;
    lv.resize(g + 1);
    for (int k = 0; k <= g; ++k) lv[k].init(h >> k, w >> k, s.nplanes);
    negm.assign((size_t)lv[0].hk * lv[0].stride, 0);
    mag.resize((size_t)h * w);

    // level-0: msb eq masks + neg + mag; and an int8 msb plane for pooling
    std::vector<int8_t> msb((size_t)h * w);
    max_step = 0;
    for (int r = 0; r < h; ++r) {
      uint64_t* nrow = negm.data() + (size_t)r * lv[0].stride;
      for (int c = 0; c < w; ++c) {
        size_t i = (size_t)r * w + c;
        int32_t v = coef[i];
        uint32_t m = (uint32_t)(v < 0 ? -(int64_t)v : v);
        mag[i] = m;
        int b = msb_of(m);
        msb[i] = (int8_t)b;
        if (b > max_step) max_step = b;
        if (b >= 0)
          lv[0].eqp(b)[(size_t)r * lv[0].stride + (c >> 6)] |=
              1ULL << (c & 63);
        if (v < 0) nrow[c >> 6] |= 1ULL << (c & 63);
      }
    }
    // group levels: pool msb, then set eq bits
    std::vector<int8_t> cur = std::move(msb);
    int cw_ = w;
    for (int k = 1; k <= g; ++k) {
      int hk = s.h >> k, wk = s.w >> k;
      std::vector<int8_t> nxt((size_t)hk * wk);
      for (int r = 0; r < hk; ++r)
        for (int c = 0; c < wk; ++c) {
          int8_t a = cur[(size_t)(2 * r) * cw_ + 2 * c];
          int8_t b2 = cur[(size_t)(2 * r) * cw_ + 2 * c + 1];
          int8_t c2 = cur[(size_t)(2 * r + 1) * cw_ + 2 * c];
          int8_t d = cur[(size_t)(2 * r + 1) * cw_ + 2 * c + 1];
          int8_t m = std::max(std::max(a, b2), std::max(c2, d));
          nxt[(size_t)r * wk + c] = m;
          if (m >= 0)
            lv[k].eqp(m)[(size_t)r * lv[k].stride + (c >> 6)] |=
                1ULL << (c & 63);
        }
      cur = std::move(nxt);
      cw_ = wk;
    }
  }
};

static inline void chunk_rows(int j, int h, int J, int* r0, int* r1) {
  *r0 = (j * h + J - 1) / J;
  *r1 = ((j + 1) * h + J - 1) / J;
}

}  // namespace

// ---------------- encoder ----------------

void encode_one_fast(const int32_t* coef, const Spec& s, int64_t trunc_bits,
                     uint8_t* out) {
  FramePlan fp;
  fp.build(coef, s);
  const int g = s.g, J = s.nchunks;
  BitWriter bw{out, trunc_bits};

  for (int b = s.nplanes - 1; b >= 0 && bw.pos < trunc_bits; --b) {
    // group levels g..1
    for (int k = g; k >= 1; --k) {
      Level& L = fp.lv[k];
      const uint64_t* eqb = L.eqp(b);
      if (k == g) {
        if (fp.max_step >= b) {
          for (int r = 0; r < L.hk; ++r) {
            const uint64_t* gtr = L.gt.data() + (size_t)r * L.stride;
            const uint64_t* eqr = eqb + (size_t)r * L.stride;
            for (int cw = 0; cw < L.stride; ++cw) {
              uint64_t full =
                  cw == L.stride - 1 ? L.lastmask : ~0ULL;
              uint64_t emit = full & ~gtr[cw];
              int cnt = (int)_mm_popcnt_u64(emit);
              if (cnt) bw.push(_pext_u64(eqr[cw], emit), cnt);
            }
          }
        }
      } else {
        Level& P = fp.lv[k + 1];
        const uint64_t* peq = P.eqp(b);
        for (int r = 0; r < L.hk; ++r) {
          const uint64_t* pgt = P.gt.data() + (size_t)(r >> 1) * P.stride;
          const uint64_t* peqr = peq + (size_t)(r >> 1) * P.stride;
          const uint64_t* gtr = L.gt.data() + (size_t)r * L.stride;
          const uint64_t* eqr = eqb + (size_t)r * L.stride;
          for (int cw = 0; cw < L.stride; ++cw) {
            // parent significant at >= b: gt | eq[b], expanded to children
            uint64_t pw = pgt[cw >> 1] | peqr[cw >> 1];
            uint32_t m32 = (uint32_t)(pw >> ((cw & 1) * 32));
            if (!m32) continue;
            uint64_t par = _pdep_u64((uint64_t)m32, 0x5555555555555555ULL);
            par |= par << 1;
            uint64_t emit = par & ~gtr[cw];
            if (cw == L.stride - 1) emit &= L.lastmask;
            int cnt = (int)_mm_popcnt_u64(emit);
            if (cnt) bw.push(_pext_u64(eqr[cw], emit), cnt);
          }
        }
      }
    }
    // level-0 passes
    Level& L0 = fp.lv[0];
    Level& L1 = fp.lv[1];
    const uint64_t* eq0 = L0.eqp(b);
    const uint64_t* eq1 = L1.eqp(b);
    for (int j = 0; j < J; ++j) {
      int r0, r1;
      chunk_rows(j, L0.hk, J, &r0, &r1);
      // significance
      for (int r = r0; r < r1; ++r) {
        const uint64_t* p1g = L1.gt.data() + (size_t)(r >> 1) * L1.stride;
        const uint64_t* p1e = eq1 + (size_t)(r >> 1) * L1.stride;
        const uint64_t* gtr = L0.gt.data() + (size_t)r * L0.stride;
        const uint64_t* eqr = eq0 + (size_t)r * L0.stride;
        for (int cw = 0; cw < L0.stride; ++cw) {
          uint64_t pw = p1g[cw >> 1] | p1e[cw >> 1];
          uint32_t m32 = (uint32_t)(pw >> ((cw & 1) * 32));
          if (!m32) continue;
          uint64_t par = _pdep_u64((uint64_t)m32, 0x5555555555555555ULL);
          par |= par << 1;
          uint64_t emit = par & ~gtr[cw];
          if (cw == L0.stride - 1) emit &= L0.lastmask;
          int cnt = (int)_mm_popcnt_u64(emit);
          if (cnt) bw.push(_pext_u64(eqr[cw], emit), cnt);
        }
      }
      // signs of newly-significant cells
      for (int r = r0; r < r1; ++r) {
        const uint64_t* eqr = eq0 + (size_t)r * L0.stride;
        const uint64_t* ngr = fp.negm.data() + (size_t)r * L0.stride;
        for (int cw = 0; cw < L0.stride; ++cw) {
          uint64_t nw = eqr[cw];
          int cnt = (int)_mm_popcnt_u64(nw);
          if (cnt) bw.push(_pext_u64(ngr[cw], nw), cnt);
        }
      }
    }
    // refinement passes
    for (int j = 0; j < J; ++j) {
      int r0, r1;
      chunk_rows(j, L0.hk, J, &r0, &r1);
      for (int r = r0; r < r1; ++r) {
        const uint64_t* gtr = L0.gt.data() + (size_t)r * L0.stride;
        for (int cw = 0; cw < L0.stride; ++cw) {
          uint64_t emit = gtr[cw];
          if (!emit) continue;
          uint64_t vw = 0;
          int jj = 0;
          uint64_t m = emit;
          size_t base = (size_t)r * s.w + (size_t)cw * 64;
          while (m) {
            int c = __builtin_ctzll(m);
            m &= m - 1;
            vw |= (uint64_t)((fp.mag[base + c] >> b) & 1) << jj;
            ++jj;
          }
          bw.push(vw, jj);
        }
      }
    }
    // fold eq[b] into the running gt masks
    for (int k = 0; k <= g; ++k) {
      Level& L = fp.lv[k];
      const uint64_t* eqb = L.eqp(b);
      size_t nw = (size_t)L.hk * L.stride;
      for (size_t i = 0; i < nw; ++i) L.gt[i] |= eqb[i];
    }
  }
}

// ---------------- decoder ----------------

// structural decode into (mag, neg, last) + sig0 mask; returns b_end.
// Chunk masking (format v4): at plane mask_plane, level-0 chunk j is
// absent from the stream unless bit j of keep_mask is set; mask_plane < 0
// disables (see ebcc_coder.cc decode_core_scalar).
int decode_core_fast(const uint8_t* bytes, int64_t nbits, int max_step,
                     const Spec& s, int mask_plane, uint32_t keep_mask,
                     uint32_t* mag, uint8_t* neg,
                     int16_t* last, uint8_t* sig0_out) {
  const int h = s.h, w = s.w, g = s.g, J = s.nchunks;
  const size_t n = (size_t)h * w;
  memset(mag, 0, n * sizeof(uint32_t));
  memset(neg, 0, n);
  for (size_t i = 0; i < n; ++i) last[i] = (int16_t)s.nplanes;

  struct DLevel {
    int hk, wk, stride;
    uint64_t lastmask;
    std::vector<uint64_t> sig;
  };
  std::vector<DLevel> lv(g + 1);
  for (int k = 0; k <= g; ++k) {
    lv[k].hk = h >> k;
    lv[k].wk = w >> k;
    lv[k].stride = (lv[k].wk + 63) / 64;
    int tail = lv[k].wk - (lv[k].stride - 1) * 64;
    lv[k].lastmask = tail == 64 ? ~0ULL : ((1ULL << tail) - 1);
    lv[k].sig.assign((size_t)lv[k].hk * lv[k].stride, 0);
  }
  std::vector<uint64_t> newm((size_t)lv[0].hk * lv[0].stride, 0);

  BitReader br{bytes, nbits};
  int b_end = s.nplanes;
  for (int b = s.nplanes - 1; b >= 0 && br.pos < nbits; --b) {
    b_end = b;
    // group levels
    for (int k = g; k >= 1; --k) {
      DLevel& L = lv[k];
      if (k == g) {
        if (max_step >= b) {
          for (int r = 0; r < L.hk; ++r) {
            uint64_t* sr = L.sig.data() + (size_t)r * L.stride;
            for (int cw = 0; cw < L.stride; ++cw) {
              uint64_t full = cw == L.stride - 1 ? L.lastmask : ~0ULL;
              uint64_t emit = full & ~sr[cw];
              int cnt = (int)_mm_popcnt_u64(emit);
              if (!cnt) continue;
              int n_in;
              uint64_t bits = br.pull(cnt, &n_in);
              sr[cw] |= _pdep_u64(bits, emit);
            }
          }
        }
      } else {
        DLevel& P = lv[k + 1];
        for (int r = 0; r < L.hk; ++r) {
          const uint64_t* pr = P.sig.data() + (size_t)(r >> 1) * P.stride;
          uint64_t* sr = L.sig.data() + (size_t)r * L.stride;
          for (int cw = 0; cw < L.stride; ++cw) {
            uint64_t par = expand_parent(pr, cw);
            uint64_t emit = par & ~sr[cw];
            if (cw == L.stride - 1) emit &= L.lastmask;
            int cnt = (int)_mm_popcnt_u64(emit);
            if (!cnt) continue;
            int n_in;
            uint64_t bits = br.pull(cnt, &n_in);
            sr[cw] |= _pdep_u64(bits, emit);
          }
        }
      }
    }
    // level-0 sig + signs, per chunk
    DLevel& L0 = lv[0];
    DLevel& L1 = lv[1];
    std::fill(newm.begin(), newm.end(), 0);
    for (int j = 0; j < J; ++j) {
      if (b == mask_plane && !((keep_mask >> j) & 1u)) continue;
      int r0, r1;
      chunk_rows(j, L0.hk, J, &r0, &r1);
      for (int r = r0; r < r1; ++r) {
        const uint64_t* pr = L1.sig.data() + (size_t)(r >> 1) * L1.stride;
        uint64_t* sr = L0.sig.data() + (size_t)r * L0.stride;
        uint64_t* nr = newm.data() + (size_t)r * L0.stride;
        for (int cw = 0; cw < L0.stride; ++cw) {
          uint64_t par = expand_parent(pr, cw);
          uint64_t emit = par & ~sr[cw];
          if (cw == L0.stride - 1) emit &= L0.lastmask;
          int cnt = (int)_mm_popcnt_u64(emit);
          if (!cnt) continue;
          int n_in;
          uint64_t bits = br.pull(cnt, &n_in);
          uint64_t nw = _pdep_u64(bits, emit);
          sr[cw] |= nw;
          nr[cw] |= nw;
          uint64_t m = nw;
          size_t base = (size_t)r * w + (size_t)cw * 64;
          while (m) {
            int c = __builtin_ctzll(m);
            m &= m - 1;
            mag[base + c] = 1u << b;
            last[base + c] = (int16_t)b;
          }
        }
      }
      // signs
      for (int r = r0; r < r1; ++r) {
        const uint64_t* nr = newm.data() + (size_t)r * L0.stride;
        for (int cw = 0; cw < L0.stride; ++cw) {
          uint64_t nw = nr[cw];
          int cnt = (int)_mm_popcnt_u64(nw);
          if (!cnt) continue;
          int n_in;
          uint64_t bits = br.pull(cnt, &n_in);
          uint64_t negw = _pdep_u64(bits, nw);
          uint64_t m = negw;
          size_t base = (size_t)r * w + (size_t)cw * 64;
          while (m) {
            int c = __builtin_ctzll(m);
            m &= m - 1;
            neg[base + c] = 1;
          }
        }
      }
    }
    // refinement, per chunk
    for (int j = 0; j < J; ++j) {
      if (b == mask_plane && !((keep_mask >> j) & 1u)) continue;
      int r0, r1;
      chunk_rows(j, L0.hk, J, &r0, &r1);
      for (int r = r0; r < r1; ++r) {
        const uint64_t* sr = L0.sig.data() + (size_t)r * L0.stride;
        const uint64_t* nr = newm.data() + (size_t)r * L0.stride;
        for (int cw = 0; cw < L0.stride; ++cw) {
          uint64_t emit = sr[cw] & ~nr[cw];
          int cnt = (int)_mm_popcnt_u64(emit);
          if (!cnt) continue;
          int n_in;
          int64_t p0 = br.pos;
          uint64_t bits = br.pull(cnt, &n_in);
          (void)p0;
          uint64_t m = emit;
          int jj = 0;
          size_t base = (size_t)r * w + (size_t)cw * 64;
          while (m) {
            int c = __builtin_ctzll(m);
            m &= m - 1;
            if (jj < n_in) {
              mag[base + c] |= (uint32_t)((bits >> jj) & 1) << b;
              last[base + c] = (int16_t)b;
            }
            ++jj;
          }
        }
      }
    }
  }
  // export sig0 as a byte mask
  DLevel& L0 = lv[0];
  memset(sig0_out, 0, n);
  for (int r = 0; r < L0.hk; ++r) {
    const uint64_t* sr = L0.sig.data() + (size_t)r * L0.stride;
    size_t base = (size_t)r * w;
    for (int cw = 0; cw < L0.stride; ++cw) {
      uint64_t m = sr[cw];
      while (m) {
        int c = __builtin_ctzll(m);
        m &= m - 1;
        sig0_out[base + cw * 64 + c] = 1;
      }
    }
  }
  return b_end;
}

}  // namespace ebcc_fast
