// treelearn_tpu native LASzip codec
// ---------------------------------
// Standalone C++ implementation of the LASzip v2 point-record compression
// scheme (chunked arithmetic coding), built for this framework because the
// environment ships neither laspy+lazrs nor libLASzip.  Replaces the
// reference's laspy/lazrs dependency (reference tree_learn/util/
// data_preparation.py:28-33 reads .laz; util/pipeline.py:349-384 writes .laz).
//
// Scope: LASzip 2.x "chunked" compressor, record items POINT10 v2,
// GPSTIME11 v2, RGB12 v2 and BYTE v2 (covers LAS 1.2 point formats 0-3 with
// extra bytes — everything the TreeLearn datasets and outputs use).
//
// The algorithms follow the published LASzip design (Isenburg, "LASzip:
// lossless compression of LiDAR data", PE&RS 2013) and the public LASzip
// stream/model layout: an Amir-Said-style range coder (FastAC) with adaptive
// bit/symbol models, k-bit integer correctors, streaming-median XYZ
// prediction with return-context tables, multi-sequence GPS time deltas,
// low/high-byte RGB deltas, and per-byte difference models for extra bytes.
// Self-consistency (compress -> decompress) is covered by tests; see
// tests/test_laz.py.
//
// Exposed as a small C ABI consumed from Python via ctypes (io/laz.py).

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <cstdlib>
#include <string>
#include <vector>

typedef uint8_t  U8;
typedef uint16_t U16;
typedef uint32_t U32;
typedef uint64_t U64;
typedef int8_t   I8;
typedef int16_t  I16;
typedef int32_t  I32;
typedef int64_t  I64;

// ---------------------------------------------------------------------------
// Arithmetic coder (FastAC range coder, as used by LASzip)
// ---------------------------------------------------------------------------

static const U32 AC_MIN_LENGTH = 0x01000000u;
static const U32 AC_MAX_LENGTH = 0xFFFFFFFFu;

static const U32 BM_LENGTH_SHIFT = 13;          // bit-model length bits
static const U32 BM_MAX_COUNT    = 1u << BM_LENGTH_SHIFT;
static const U32 DM_LENGTH_SHIFT = 15;          // data-model length bits
static const U32 DM_MAX_COUNT    = 1u << DM_LENGTH_SHIFT;

struct BitModel {
  U32 bit_0_prob, bit_0_count, bit_count;
  U32 update_cycle, bits_until_update;

  void init() {
    bit_0_count = 1;
    bit_count = 2;
    bit_0_prob = 1u << (BM_LENGTH_SHIFT - 1);
    update_cycle = bits_until_update = 4;
  }
  void update() {
    if ((bit_count += update_cycle) > BM_MAX_COUNT) {
      bit_count = (bit_count + 1) >> 1;
      bit_0_count = (bit_0_count + 1) >> 1;
      if (bit_0_count == bit_count) ++bit_count;
    }
    U32 scale = 0x80000000u / bit_count;
    bit_0_prob = (bit_0_count * scale) >> (31 - BM_LENGTH_SHIFT);
    update_cycle = (5 * update_cycle) >> 2;
    if (update_cycle > 64) update_cycle = 64;
    bits_until_update = update_cycle;
  }
};

struct SymbolModel {
  std::vector<U32> distribution;   // scaled cumulative distribution
  std::vector<U32> symbol_count;
  U32 symbols = 0;
  U32 total_count = 0, update_cycle = 0, symbols_until_update = 0;
  U32 last_symbol = 0;
  bool compress = false;

  void init(U32 n, bool for_compressor) {
    symbols = n;
    compress = for_compressor;
    last_symbol = n - 1;
    distribution.assign(n, 0);
    symbol_count.assign(n, 1);
    total_count = 0;
    update_cycle = n;
    update();
    symbols_until_update = update_cycle = (n + 6) >> 1;
  }
  void update() {
    if ((total_count += update_cycle) > DM_MAX_COUNT) {
      total_count = 0;
      for (U32 k = 0; k < symbols; k++)
        total_count += (symbol_count[k] = (symbol_count[k] + 1) >> 1);
    }
    U32 sum = 0;
    U32 scale = 0x80000000u / total_count;
    for (U32 k = 0; k < symbols; k++) {
      distribution[k] = (scale * sum) >> (31 - DM_LENGTH_SHIFT);
      sum += symbol_count[k];
    }
    update_cycle = (5 * update_cycle) >> 2;
    U32 max_cycle = (symbols + 6) << 3;
    if (update_cycle > max_cycle) update_cycle = max_cycle;
    symbols_until_update = update_cycle;
  }
};

struct Encoder {
  std::vector<U8>* out = nullptr;
  size_t start = 0;           // first byte of this coder's output in *out
  U32 base = 0, length = AC_MAX_LENGTH;

  void init(std::vector<U8>* o) {
    out = o;
    start = o->size();
    base = 0;
    length = AC_MAX_LENGTH;
  }
  void propagate_carry() {
    size_t p = out->size();
    while (p > start && (*out)[p - 1] == 0xFF) (*out)[--p] = 0;
    if (p > start) ++(*out)[p - 1];
  }
  void renorm() {
    do {
      out->push_back((U8)(base >> 24));
      base <<= 8;
    } while ((length <<= 8) < AC_MIN_LENGTH);
  }
  void encode_bit(BitModel& m, U32 bit) {
    U32 x = m.bit_0_prob * (length >> BM_LENGTH_SHIFT);
    if (!bit) {
      length = x;
      ++m.bit_0_count;
    } else {
      U32 init_base = base;
      base += x;
      length -= x;
      if (init_base > base) propagate_carry();
    }
    if (length < AC_MIN_LENGTH) renorm();
    if (--m.bits_until_update == 0) m.update();
  }
  void encode_symbol(SymbolModel& m, U32 sym) {
    U32 x, init_base = base;
    if (sym == m.last_symbol) {
      x = m.distribution[sym] * (length >> DM_LENGTH_SHIFT);
      base += x;
      length -= x;
    } else {
      x = m.distribution[sym] * (length >>= DM_LENGTH_SHIFT);
      base += x;
      length = m.distribution[sym + 1] * length - x;
    }
    if (init_base > base) propagate_carry();
    if (length < AC_MIN_LENGTH) renorm();
    ++m.symbol_count[sym];
    if (--m.symbols_until_update == 0) m.update();
  }
  void write_bits(U32 bits, U32 sym) {  // raw bits, bits <= 32
    if (bits > 19) {
      write_short(sym & 0xFFFF);
      sym >>= 16;
      bits -= 16;
    }
    U32 init_base = base;
    base += sym * (length >>= bits);
    if (init_base > base) propagate_carry();
    if (length < AC_MIN_LENGTH) renorm();
  }
  void write_short(U32 sym) {
    U32 init_base = base;
    base += sym * (length >>= 16);
    if (init_base > base) propagate_carry();
    if (length < AC_MIN_LENGTH) renorm();
  }
  void write_int(U32 sym) { write_short(sym & 0xFFFF); write_short(sym >> 16); }
  void done() {
    U32 init_base = base;
    if (length > 2 * AC_MIN_LENGTH) {
      base += AC_MIN_LENGTH;
      length = AC_MIN_LENGTH >> 1;
    } else {
      base += AC_MIN_LENGTH >> 1;
      length = AC_MIN_LENGTH >> 9;
    }
    if (init_base > base) propagate_carry();
    renorm();
    // pad so a decoder's 4-byte init + renorms never starve (the reference
    // laszip writer pads the same way "to be on the safe side")
    out->push_back(0);
    out->push_back(0);
    out->push_back(0);
  }
};

struct Decoder {
  const U8* buf = nullptr;
  size_t len = 0, pos = 0;
  U32 value = 0, length = 0;

  U8 get_byte() { return pos < len ? buf[pos++] : 0; }  // EOF-tolerant
  void init(const U8* b, size_t n) {
    buf = b;
    len = n;
    pos = 0;
    value = ((U32)get_byte() << 24) | ((U32)get_byte() << 16) |
            ((U32)get_byte() << 8) | (U32)get_byte();
    length = AC_MAX_LENGTH;
  }
  void renorm() {
    do {
      value = (value << 8) | get_byte();
    } while ((length <<= 8) < AC_MIN_LENGTH);
  }
  U32 decode_bit(BitModel& m) {
    U32 x = m.bit_0_prob * (length >> BM_LENGTH_SHIFT);
    U32 bit = (value >= x);
    if (!bit) {
      length = x;
      ++m.bit_0_count;
    } else {
      value -= x;
      length -= x;
    }
    if (length < AC_MIN_LENGTH) renorm();
    if (--m.bits_until_update == 0) m.update();
    return bit;
  }
  U32 decode_symbol(SymbolModel& m) {
    U32 x = 0, s = 0;
    U32 y = length;
    U32 n = m.symbols;
    length >>= DM_LENGTH_SHIFT;
    U32 mid = n >> 1;
    do {  // binary search over the scaled cumulative distribution
      U32 z = length * m.distribution[mid];
      if (z > value) {
        n = mid;
        y = z;
      } else {
        s = mid;
        x = z;
      }
    } while ((mid = (s + n) >> 1) != s);
    value -= x;
    length = y - x;
    if (length < AC_MIN_LENGTH) renorm();
    ++m.symbol_count[s];
    if (--m.symbols_until_update == 0) m.update();
    return s;
  }
  U32 read_bits(U32 bits) {
    if (bits > 19) {
      U32 lo = read_short();
      U32 hi = read_bits(bits - 16);
      return (hi << 16) | lo;
    }
    U32 sym = value / (length >>= bits);
    value -= length * sym;
    if (length < AC_MIN_LENGTH) renorm();
    return sym;
  }
  U32 read_short() {
    U32 sym = value / (length >>= 16);
    value -= length * sym;
    if (length < AC_MIN_LENGTH) renorm();
    return sym;
  }
  U32 read_int() {
    U32 lo = read_short();
    U32 hi = read_short();
    return (hi << 16) | lo;
  }
};

// ---------------------------------------------------------------------------
// Integer compressor: k-bit corrector coding of prediction residuals
// ---------------------------------------------------------------------------

struct IntegerCompressor {
  U32 bits, contexts, bits_high;
  U32 corr_bits;
  U32 corr_range;
  I32 corr_min, corr_max;
  U32 k = 0;  // bits of the last corrector (context chaining, e.g. dx -> dy)

  std::vector<SymbolModel> m_bits;        // one per context: symbol = k
  BitModel m_corr0;                       // k == 0: corrector is 0 or 1
  std::vector<SymbolModel> m_corr;        // k = 1..corr_bits-1

  void setup(U32 bits_, U32 contexts_, U32 bits_high_ = 8) {
    bits = bits_;
    contexts = contexts_;
    bits_high = bits_high_;
    if (bits && bits < 32) {
      corr_bits = bits;
      corr_range = 1u << bits;
      corr_min = -(I32)(corr_range / 2);
      corr_max = corr_min + (I32)corr_range - 1;
    } else {
      corr_bits = 32;
      corr_range = 0;
      corr_min = INT32_MIN;
      corr_max = INT32_MAX;
    }
  }
  void init(bool for_compressor) {
    m_bits.resize(contexts);
    for (U32 c = 0; c < contexts; c++) m_bits[c].init(corr_bits + 1, for_compressor);
    m_corr0.init();
    m_corr.resize(corr_bits);
    for (U32 i = 1; i < corr_bits; i++)
      m_corr[i].init(i <= bits_high ? (1u << i) : (1u << bits_high),
                     for_compressor);
  }

  I32 read_corrector(Decoder& dec, SymbolModel& mbits) {
    I32 c;
    k = dec.decode_symbol(mbits);
    if (k) {
      if (k < 32) {
        U32 cu;
        if (k <= bits_high) {
          cu = dec.decode_symbol(m_corr[k]);
        } else {
          U32 k1 = k - bits_high;
          cu = dec.decode_symbol(m_corr[k]);
          U32 c1 = dec.read_bits(k1);
          cu = (cu << k1) | c1;
        }
        // translate the k-bit code back into the corrector interval
        if (cu >= (1u << (k - 1)))
          c = (I32)cu + 1;                       // [2^(k-1), 2^k - 1] -> [2^(k-1)+1, 2^k]
        else
          c = (I32)cu - (I32)((1u << k) - 1);    // [0, 2^(k-1)-1] -> [-(2^k-1), -2^(k-1)]
      } else {
        c = corr_min;
      }
    } else {
      c = (I32)dec.decode_bit(m_corr0);
    }
    return c;
  }
  void write_corrector(Encoder& enc, I32 c, SymbolModel& mbits) {
    // find the tightest interval [-(2^k - 1), 2^k] containing c
    U32 c1 = (c <= 0) ? (U32)(-(I64)c) : (U32)(c - 1);
    k = 0;
    while (c1) {
      c1 >>= 1;
      k++;
    }
    enc.encode_symbol(mbits, k);
    if (k) {
      if (k < 32) {
        U32 cu;
        if (c < 0)
          cu = (U32)((I64)c + ((1u << k) - 1));  // negatives -> [0, 2^(k-1)-1]
        else
          cu = (U32)(c - 1);                     // positives -> [2^(k-1), 2^k-1]
        if (k <= bits_high) {
          enc.encode_symbol(m_corr[k], cu);
        } else {
          U32 k1 = k - bits_high;
          enc.encode_symbol(m_corr[k], cu >> k1);
          enc.write_bits(k1, cu & ((1u << k1) - 1));
        }
      }
    } else {
      enc.encode_bit(m_corr0, (U32)c);
    }
  }

  I32 decompress(Decoder& dec, I32 pred, U32 context = 0) {
    I32 real = pred + read_corrector(dec, m_bits[context]);
    if (corr_range) {
      if (real < 0)
        real += (I32)corr_range;
      else if ((U32)real >= corr_range)
        real -= (I32)corr_range;
    }
    return real;
  }
  void compress(Encoder& enc, I32 pred, I32 real, U32 context = 0) {
    I64 corr = (I64)real - (I64)pred;
    if (corr_range) {
      if (corr < corr_min)
        corr += corr_range;
      else if (corr > corr_max)
        corr -= corr_range;
    }
    write_corrector(enc, (I32)corr, m_bits[context]);
  }
};

// ---------------------------------------------------------------------------
// Streaming median-of-5 predictor (point10 dx/dy)
// ---------------------------------------------------------------------------

struct StreamingMedian5 {
  I32 values[5];
  bool high;

  void init() {
    values[0] = values[1] = values[2] = values[3] = values[4] = 0;
    high = true;
  }
  void add(I32 v) {
    if (high) {
      if (v < values[2]) {
        values[4] = values[3];
        values[3] = values[2];
        if (v < values[0]) {
          values[2] = values[1];
          values[1] = values[0];
          values[0] = v;
        } else if (v < values[1]) {
          values[2] = values[1];
          values[1] = v;
        } else {
          values[2] = v;
        }
      } else {
        if (v < values[3]) {
          values[4] = values[3];
          values[3] = v;
        } else {
          values[4] = v;
        }
        high = false;
      }
    } else {
      if (values[2] < v) {
        values[0] = values[1];
        values[1] = values[2];
        if (values[4] < v) {
          values[2] = values[3];
          values[3] = values[4];
          values[4] = v;
        } else if (values[3] < v) {
          values[2] = values[3];
          values[3] = v;
        } else {
          values[2] = v;
        }
      } else {
        if (values[1] < v) {
          values[0] = values[1];
          values[1] = v;
        } else {
          values[0] = v;
        }
        high = true;
      }
    }
  }
  I32 get() const { return values[2]; }
};

// ---------------------------------------------------------------------------
// POINT10 v2 item codec (20-byte LAS point record core)
// ---------------------------------------------------------------------------

// return-number/number-of-returns context tables (LASzip common v2)
static const U8 number_return_map[8][8] = {
    {15, 14, 13, 12, 11, 10, 9, 8},
    {14, 0, 1, 3, 6, 10, 10, 9},
    {13, 1, 2, 4, 7, 11, 11, 10},
    {12, 3, 4, 5, 8, 12, 12, 11},
    {11, 6, 7, 8, 9, 13, 13, 12},
    {10, 10, 11, 12, 13, 14, 14, 13},
    {9, 10, 11, 12, 13, 14, 15, 14},
    {8, 9, 10, 11, 12, 13, 14, 15}};
static const U8 number_return_level[8][8] = {
    {0, 1, 2, 3, 4, 5, 6, 7},
    {1, 0, 1, 2, 3, 4, 5, 6},
    {2, 1, 0, 1, 2, 3, 4, 5},
    {3, 2, 1, 0, 1, 2, 3, 4},
    {4, 3, 2, 1, 0, 1, 2, 3},
    {5, 4, 3, 2, 1, 0, 1, 2},
    {6, 5, 4, 3, 2, 1, 0, 1},
    {7, 6, 5, 4, 3, 2, 1, 0}};

struct Point10 {
  I32 x, y, z;
  U16 intensity;
  U8 flags;  // returns/dir/edge
  U8 classification;
  I8 scan_angle_rank;
  U8 user_data;
  U16 point_source;

  void from_bytes(const U8* p) {
    memcpy(&x, p, 4);
    memcpy(&y, p + 4, 4);
    memcpy(&z, p + 8, 4);
    memcpy(&intensity, p + 12, 2);
    flags = p[14];
    classification = p[15];
    scan_angle_rank = (I8)p[16];
    user_data = p[17];
    memcpy(&point_source, p + 18, 2);
  }
  void to_bytes(U8* p) const {
    memcpy(p, &x, 4);
    memcpy(p + 4, &y, 4);
    memcpy(p + 8, &z, 4);
    memcpy(p + 12, &intensity, 2);
    p[14] = flags;
    p[15] = classification;
    p[16] = (U8)scan_angle_rank;
    p[17] = user_data;
    memcpy(p + 18, &point_source, 2);
  }
};

struct Point10V2 {
  SymbolModel m_changed_values;
  std::vector<SymbolModel> m_bit_byte;         // 256, lazily initialized
  std::vector<SymbolModel> m_classification;   // 256, lazily initialized
  std::vector<SymbolModel> m_user_data;        // 256, lazily initialized
  SymbolModel m_scan_angle_rank[2];
  std::vector<bool> have_bit_byte, have_classification, have_user_data;
  IntegerCompressor ic_intensity, ic_point_source, ic_dx, ic_dy, ic_z;

  Point10 last;
  U16 last_intensity[16];
  StreamingMedian5 last_x_diff_median5[16], last_y_diff_median5[16];
  I32 last_height[8];
  bool compress_mode = false;

  void init(const U8* first_item, bool for_compressor) {
    compress_mode = for_compressor;
    m_changed_values.init(64, for_compressor);
    m_bit_byte.assign(256, SymbolModel());
    m_classification.assign(256, SymbolModel());
    m_user_data.assign(256, SymbolModel());
    have_bit_byte.assign(256, false);
    have_classification.assign(256, false);
    have_user_data.assign(256, false);
    m_scan_angle_rank[0].init(256, for_compressor);
    m_scan_angle_rank[1].init(256, for_compressor);
    ic_intensity.setup(16, 4);
    ic_intensity.init(for_compressor);
    ic_point_source.setup(16, 1);
    ic_point_source.init(for_compressor);
    ic_dx.setup(32, 2);
    ic_dx.init(for_compressor);
    ic_dy.setup(32, 22);
    ic_dy.init(for_compressor);
    ic_z.setup(32, 20);
    ic_z.init(for_compressor);

    last.from_bytes(first_item);
    for (int i = 0; i < 16; i++) {
      last_x_diff_median5[i].init();
      last_y_diff_median5[i].init();
      last_intensity[i] = last.intensity;
    }
    for (int i = 0; i < 8; i++) last_height[i] = last.z;
  }

  SymbolModel& bit_byte_model(U8 ctx) {
    if (!have_bit_byte[ctx]) {
      m_bit_byte[ctx].init(256, compress_mode);
      have_bit_byte[ctx] = true;
    }
    return m_bit_byte[ctx];
  }
  SymbolModel& classification_model(U8 ctx) {
    if (!have_classification[ctx]) {
      m_classification[ctx].init(256, compress_mode);
      have_classification[ctx] = true;
    }
    return m_classification[ctx];
  }
  SymbolModel& user_data_model(U8 ctx) {
    if (!have_user_data[ctx]) {
      m_user_data[ctx].init(256, compress_mode);
      have_user_data[ctx] = true;
    }
    return m_user_data[ctx];
  }

  void write(Encoder& enc, const U8* item) {
    Point10 cur;
    cur.from_bytes(item);
    U32 r = cur.flags & 7;
    U32 n = (cur.flags >> 3) & 7;
    U32 m = number_return_map[n][r];
    U32 l = number_return_level[n][r];

    U32 changed = ((cur.flags != last.flags) ? 32u : 0u) |
                  ((cur.intensity != last_intensity[m]) ? 16u : 0u) |
                  ((cur.classification != last.classification) ? 8u : 0u) |
                  ((cur.scan_angle_rank != last.scan_angle_rank) ? 4u : 0u) |
                  ((cur.user_data != last.user_data) ? 2u : 0u) |
                  ((cur.point_source != last.point_source) ? 1u : 0u);
    enc.encode_symbol(m_changed_values, changed);
    if (changed & 32) enc.encode_symbol(bit_byte_model(last.flags), cur.flags);
    if (changed & 16) {
      ic_intensity.compress(enc, last_intensity[m], cur.intensity,
                            m < 3 ? m : 3u);
      last_intensity[m] = cur.intensity;
    }
    if (changed & 8)
      enc.encode_symbol(classification_model(last.classification),
                        cur.classification);
    if (changed & 4)
      enc.encode_symbol(m_scan_angle_rank[(cur.flags >> 6) & 1],
                        (U8)(cur.scan_angle_rank - last.scan_angle_rank));
    if (changed & 2)
      enc.encode_symbol(user_data_model(last.user_data), cur.user_data);
    if (changed & 1)
      ic_point_source.compress(enc, last.point_source, cur.point_source);

    // x: median-of-5 prediction over the return context
    I32 median = last_x_diff_median5[m].get();
    I32 diff = cur.x - last.x;
    ic_dx.compress(enc, median, diff, n == 1 ? 1 : 0);
    last_x_diff_median5[m].add(diff);

    // y: context chains on the x corrector's bit width
    median = last_y_diff_median5[m].get();
    diff = cur.y - last.y;
    U32 k_bits = ic_dx.k;
    ic_dy.compress(enc, median, diff,
                   (n == 1 ? 1u : 0u) + (k_bits < 20 ? (k_bits & ~1u) : 20u));
    last_y_diff_median5[m].add(diff);

    // z: predicted from the last height at this return level
    k_bits = (ic_dx.k + ic_dy.k) / 2;
    ic_z.compress(enc, last_height[l], cur.z,
                  (n == 1 ? 1u : 0u) + (k_bits < 18 ? (k_bits & ~1u) : 18u));
    last_height[l] = cur.z;

    last = cur;
    last.intensity = cur.intensity;  // note: last_intensity[m] governs coding
  }

  void read(Decoder& dec, U8* item) {
    U32 changed = dec.decode_symbol(m_changed_values);
    if (changed & 32)
      last.flags = (U8)dec.decode_symbol(bit_byte_model(last.flags));
    U32 r = last.flags & 7;
    U32 n = (last.flags >> 3) & 7;
    U32 m = number_return_map[n][r];
    U32 l = number_return_level[n][r];

    if (changed & 16) {
      last.intensity =
          (U16)ic_intensity.decompress(dec, last_intensity[m], m < 3 ? m : 3u);
      last_intensity[m] = last.intensity;
    } else {
      last.intensity = last_intensity[m];
    }
    if (changed & 8)
      last.classification =
          (U8)dec.decode_symbol(classification_model(last.classification));
    if (changed & 4)
      last.scan_angle_rank =
          (I8)(U8)(dec.decode_symbol(m_scan_angle_rank[(last.flags >> 6) & 1]) +
                   (U8)last.scan_angle_rank);
    if (changed & 2)
      last.user_data = (U8)dec.decode_symbol(user_data_model(last.user_data));
    if (changed & 1)
      last.point_source =
          (U16)ic_point_source.decompress(dec, last.point_source);

    I32 median = last_x_diff_median5[m].get();
    I32 diff = ic_dx.decompress(dec, median, n == 1 ? 1 : 0);
    last.x += diff;
    last_x_diff_median5[m].add(diff);

    median = last_y_diff_median5[m].get();
    U32 k_bits = ic_dx.k;
    diff = ic_dy.decompress(
        dec, median, (n == 1 ? 1u : 0u) + (k_bits < 20 ? (k_bits & ~1u) : 20u));
    last.y += diff;
    last_y_diff_median5[m].add(diff);

    k_bits = (ic_dx.k + ic_dy.k) / 2;
    last.z = ic_z.decompress(
        dec, last_height[l],
        (n == 1 ? 1u : 0u) + (k_bits < 18 ? (k_bits & ~1u) : 18u));
    last_height[l] = last.z;

    last.to_bytes(item);
  }
};

// ---------------------------------------------------------------------------
// GPSTIME11 v2 item codec (8-byte double, coded as i64 bits)
// ---------------------------------------------------------------------------

static const I32 LASZIP_GPSTIME_MULTI = 500;
static const I32 LASZIP_GPSTIME_MULTI_MINUS = -10;
static const U32 LASZIP_GPSTIME_MULTI_UNCHANGED =
    (U32)(LASZIP_GPSTIME_MULTI - LASZIP_GPSTIME_MULTI_MINUS + 1);  // 511
static const U32 LASZIP_GPSTIME_MULTI_CODE_FULL =
    (U32)(LASZIP_GPSTIME_MULTI - LASZIP_GPSTIME_MULTI_MINUS + 2);  // 512
static const U32 LASZIP_GPSTIME_MULTI_TOTAL =
    (U32)(LASZIP_GPSTIME_MULTI - LASZIP_GPSTIME_MULTI_MINUS + 6);  // 516

struct GpsTime11V2 {
  SymbolModel m_gpstime_multi, m_gpstime_0diff;
  IntegerCompressor ic_gpstime;
  U32 last_seq = 0, next_seq = 0;
  U64 last_gpstime[4];
  I32 last_gpstime_diff[4];
  I32 multi_extreme_counter[4];

  void init(const U8* first_item, bool for_compressor) {
    m_gpstime_multi.init(LASZIP_GPSTIME_MULTI_TOTAL, for_compressor);
    m_gpstime_0diff.init(6, for_compressor);
    ic_gpstime.setup(32, 9);
    ic_gpstime.init(for_compressor);
    last_seq = next_seq = 0;
    memset(last_gpstime, 0, sizeof(last_gpstime));
    memset(last_gpstime_diff, 0, sizeof(last_gpstime_diff));
    memset(multi_extreme_counter, 0, sizeof(multi_extreme_counter));
    memcpy(&last_gpstime[0], first_item, 8);
  }

  void write(Encoder& enc, const U8* item) {
    U64 cur;
    memcpy(&cur, item, 8);
    if (last_gpstime_diff[last_seq] == 0) {  // no previous in-sequence delta
      if (cur == last_gpstime[last_seq]) {
        enc.encode_symbol(m_gpstime_0diff, 0);  // unchanged
      } else {
        I64 diff64 = (I64)cur - (I64)last_gpstime[last_seq];
        I32 diff32 = (I32)diff64;
        if ((I64)diff32 == diff64) {  // fits 32 bits
          enc.encode_symbol(m_gpstime_0diff, 1);
          ic_gpstime.compress(enc, 0, diff32, 0);
          last_gpstime_diff[last_seq] = diff32;
          multi_extreme_counter[last_seq] = 0;
          last_gpstime[last_seq] = cur;
        } else {
          // does the time fit an older sequence?
          for (U32 i = 1; i < 4; i++) {
            U32 other = (last_seq + i) & 3;
            I64 od = (I64)cur - (I64)last_gpstime[other];
            if (od == (I64)(I32)od) {
              enc.encode_symbol(m_gpstime_0diff, i + 2);  // 3/4/5: switch
              last_seq = other;
              write(enc, item);
              return;
            }
          }
          enc.encode_symbol(m_gpstime_0diff, 2);  // full 64-bit value
          ic_gpstime.compress(enc, (I32)(last_gpstime[last_seq] >> 32),
                              (I32)(cur >> 32), 8);
          enc.write_int((U32)cur);
          next_seq = (next_seq + 1) & 3;
          last_seq = next_seq;
          last_gpstime_diff[last_seq] = 0;
          multi_extreme_counter[last_seq] = 0;
          last_gpstime[last_seq] = cur;
        }
      }
    } else {  // in-sequence delta prediction with multipliers
      if (cur == last_gpstime[last_seq]) {
        enc.encode_symbol(m_gpstime_multi, LASZIP_GPSTIME_MULTI_UNCHANGED);
      } else {
        I64 diff64 = (I64)cur - (I64)last_gpstime[last_seq];
        I32 diff32 = (I32)diff64;
        if ((I64)diff32 == diff64) {
          // rounded multiplier of the last in-sequence delta
          I32 base_diff = last_gpstime_diff[last_seq];
          I32 multi = (I32)((double)diff32 / (double)base_diff + 0.5);
          if (multi >= 1 && multi < LASZIP_GPSTIME_MULTI) {
            if (multi == 1) {  // the common case
              enc.encode_symbol(m_gpstime_multi, 1);
              ic_gpstime.compress(enc, base_diff, diff32, 1);
              multi_extreme_counter[last_seq] = 0;
            } else if (multi < 10) {
              enc.encode_symbol(m_gpstime_multi, (U32)multi);
              ic_gpstime.compress(enc, multi * base_diff, diff32, 2);
            } else {
              enc.encode_symbol(m_gpstime_multi, (U32)multi);
              ic_gpstime.compress(enc, multi * base_diff, diff32, 3);
            }
          } else if (multi >= LASZIP_GPSTIME_MULTI) {
            enc.encode_symbol(m_gpstime_multi, (U32)LASZIP_GPSTIME_MULTI);
            ic_gpstime.compress(enc, LASZIP_GPSTIME_MULTI * base_diff, diff32,
                                4);
            if (++multi_extreme_counter[last_seq] > 3) {
              last_gpstime_diff[last_seq] = diff32;
              multi_extreme_counter[last_seq] = 0;
            }
          } else if (multi < 0 && multi > LASZIP_GPSTIME_MULTI_MINUS) {
            enc.encode_symbol(m_gpstime_multi,
                              (U32)(LASZIP_GPSTIME_MULTI - multi));
            ic_gpstime.compress(enc, multi * base_diff, diff32, 5);
          } else if (multi <= LASZIP_GPSTIME_MULTI_MINUS) {
            enc.encode_symbol(
                m_gpstime_multi,
                (U32)(LASZIP_GPSTIME_MULTI - LASZIP_GPSTIME_MULTI_MINUS));
            ic_gpstime.compress(
                enc, LASZIP_GPSTIME_MULTI_MINUS * base_diff, diff32, 6);
            if (++multi_extreme_counter[last_seq] > 3) {
              last_gpstime_diff[last_seq] = diff32;
              multi_extreme_counter[last_seq] = 0;
            }
          } else {  // multi == 0
            enc.encode_symbol(m_gpstime_multi, 0);
            ic_gpstime.compress(enc, 0, diff32, 7);
            if (++multi_extreme_counter[last_seq] > 3) {
              last_gpstime_diff[last_seq] = diff32;
              multi_extreme_counter[last_seq] = 0;
            }
          }
          last_gpstime[last_seq] = cur;
        } else {
          for (U32 i = 1; i < 4; i++) {
            U32 other = (last_seq + i) & 3;
            I64 od = (I64)cur - (I64)last_gpstime[other];
            if (od == (I64)(I32)od) {
              enc.encode_symbol(m_gpstime_multi,
                                LASZIP_GPSTIME_MULTI_CODE_FULL + i);
              last_seq = other;
              write(enc, item);
              return;
            }
          }
          enc.encode_symbol(m_gpstime_multi, LASZIP_GPSTIME_MULTI_CODE_FULL);
          ic_gpstime.compress(enc, (I32)(last_gpstime[last_seq] >> 32),
                              (I32)(cur >> 32), 8);
          enc.write_int((U32)cur);
          next_seq = (next_seq + 1) & 3;
          last_seq = next_seq;
          last_gpstime_diff[last_seq] = 0;
          multi_extreme_counter[last_seq] = 0;
          last_gpstime[last_seq] = cur;
        }
      }
    }
  }

  void read(Decoder& dec, U8* item) {
    if (last_gpstime_diff[last_seq] == 0) {
      U32 multi = dec.decode_symbol(m_gpstime_0diff);
      if (multi == 1) {
        I32 d = ic_gpstime.decompress(dec, 0, 0);
        last_gpstime_diff[last_seq] = d;
        last_gpstime[last_seq] = (U64)((I64)last_gpstime[last_seq] + d);
        multi_extreme_counter[last_seq] = 0;
      } else if (multi == 2) {
        next_seq = (next_seq + 1) & 3;
        I32 hi = ic_gpstime.decompress(
            dec, (I32)(last_gpstime[last_seq] >> 32), 8);
        U64 v = ((U64)(U32)hi) << 32;
        v |= dec.read_int();
        last_seq = next_seq;
        last_gpstime[last_seq] = v;
        last_gpstime_diff[last_seq] = 0;
        multi_extreme_counter[last_seq] = 0;
      } else if (multi > 2) {
        last_seq = (last_seq + multi - 2) & 3;
        read(dec, item);
        return;
      }
      // multi == 0: unchanged
    } else {
      U32 multi = dec.decode_symbol(m_gpstime_multi);
      I32 base_diff = last_gpstime_diff[last_seq];
      if (multi == 1) {
        I32 d = ic_gpstime.decompress(dec, base_diff, 1);
        last_gpstime[last_seq] = (U64)((I64)last_gpstime[last_seq] + d);
        multi_extreme_counter[last_seq] = 0;
      } else if (multi < LASZIP_GPSTIME_MULTI_UNCHANGED) {
        I32 d;
        if (multi == 0) {
          d = ic_gpstime.decompress(dec, 0, 7);
          if (++multi_extreme_counter[last_seq] > 3) {
            last_gpstime_diff[last_seq] = d;
            multi_extreme_counter[last_seq] = 0;
          }
        } else if (multi < (U32)LASZIP_GPSTIME_MULTI) {
          if (multi < 10)
            d = ic_gpstime.decompress(dec, (I32)multi * base_diff, 2);
          else
            d = ic_gpstime.decompress(dec, (I32)multi * base_diff, 3);
        } else if (multi == (U32)LASZIP_GPSTIME_MULTI) {
          d = ic_gpstime.decompress(dec, LASZIP_GPSTIME_MULTI * base_diff, 4);
          if (++multi_extreme_counter[last_seq] > 3) {
            last_gpstime_diff[last_seq] = d;
            multi_extreme_counter[last_seq] = 0;
          }
        } else {
          I32 neg_multi = LASZIP_GPSTIME_MULTI - (I32)multi;  // -1..-10
          if (neg_multi > LASZIP_GPSTIME_MULTI_MINUS) {
            d = ic_gpstime.decompress(dec, neg_multi * base_diff, 5);
          } else {
            d = ic_gpstime.decompress(
                dec, LASZIP_GPSTIME_MULTI_MINUS * base_diff, 6);
            if (++multi_extreme_counter[last_seq] > 3) {
              last_gpstime_diff[last_seq] = d;
              multi_extreme_counter[last_seq] = 0;
            }
          }
        }
        last_gpstime[last_seq] = (U64)((I64)last_gpstime[last_seq] + d);
      } else if (multi == LASZIP_GPSTIME_MULTI_UNCHANGED) {
        // unchanged
      } else if (multi == LASZIP_GPSTIME_MULTI_CODE_FULL) {
        next_seq = (next_seq + 1) & 3;
        I32 hi = ic_gpstime.decompress(
            dec, (I32)(last_gpstime[last_seq] >> 32), 8);
        U64 v = ((U64)(U32)hi) << 32;
        v |= dec.read_int();
        last_seq = next_seq;
        last_gpstime[last_seq] = v;
        last_gpstime_diff[last_seq] = 0;
        multi_extreme_counter[last_seq] = 0;
      } else {  // switch sequence then re-read
        last_seq = (last_seq + multi - LASZIP_GPSTIME_MULTI_CODE_FULL) & 3;
        read(dec, item);
        return;
      }
    }
    memcpy(item, &last_gpstime[last_seq], 8);
  }
};

// ---------------------------------------------------------------------------
// RGB12 v2 item codec (3 x u16)
// ---------------------------------------------------------------------------

struct Rgb12V2 {
  SymbolModel m_byte_used;
  SymbolModel m_rgb_diff[6];  // low/high byte of r, g, b
  U16 last[3];

  void init(const U8* first_item, bool for_compressor) {
    m_byte_used.init(128, for_compressor);
    for (int i = 0; i < 6; i++) m_rgb_diff[i].init(256, for_compressor);
    memcpy(last, first_item, 6);
  }

  void write(Encoder& enc, const U8* item) {
    U16 cur[3];
    memcpy(cur, item, 6);
    U32 sym = 0;
    I32 diff_l = 0, diff_h = 0;
    if ((cur[0] & 0x00FF) != (last[0] & 0x00FF)) sym |= 1;
    if ((cur[0] & 0xFF00) != (last[0] & 0xFF00)) sym |= 2;
    if ((cur[1] & 0x00FF) != (last[1] & 0x00FF)) sym |= 4;
    if ((cur[1] & 0xFF00) != (last[1] & 0xFF00)) sym |= 8;
    if ((cur[2] & 0x00FF) != (last[2] & 0x00FF)) sym |= 16;
    if ((cur[2] & 0xFF00) != (last[2] & 0xFF00)) sym |= 32;
    // bit 6: are g and b different from r (otherwise gray-ish: deltas reuse r)
    bool sym7 = ((cur[0] & 0x00FF) != (cur[1] & 0x00FF)) ||
                ((cur[0] & 0x00FF) != (cur[2] & 0x00FF)) ||
                ((cur[0] & 0xFF00) != (cur[1] & 0xFF00)) ||
                ((cur[0] & 0xFF00) != (cur[2] & 0xFF00));
    if (sym7) sym |= 64;
    enc.encode_symbol(m_byte_used, sym);
    if (sym & 1) {
      diff_l = (I32)(cur[0] & 255) - (last[0] & 255);
      enc.encode_symbol(m_rgb_diff[0], (U8)diff_l);
    }
    if (sym & 2) {
      diff_h = (I32)(cur[0] >> 8) - (last[0] >> 8);
      enc.encode_symbol(m_rgb_diff[1], (U8)diff_h);
    }
    if (sym & 64) {
      if (sym & 4) {
        I32 corr = (I32)(cur[1] & 255) - ((diff_l + (last[1] & 255)) & 255);
        enc.encode_symbol(m_rgb_diff[2], (U8)corr);
      }
      if (sym & 16) {
        diff_l = (diff_l + (cur[1] & 255) - (last[1] & 255)) / 2;
        I32 corr = (I32)(cur[2] & 255) - ((diff_l + (last[2] & 255)) & 255);
        enc.encode_symbol(m_rgb_diff[4], (U8)corr);
      }
      if (sym & 8) {
        I32 corr = (I32)(cur[1] >> 8) - ((diff_h + (last[1] >> 8)) & 255);
        enc.encode_symbol(m_rgb_diff[3], (U8)corr);
      }
      if (sym & 32) {
        diff_h = (diff_h + (cur[1] >> 8) - (last[1] >> 8)) / 2;
        I32 corr = (I32)(cur[2] >> 8) - ((diff_h + (last[2] >> 8)) & 255);
        enc.encode_symbol(m_rgb_diff[5], (U8)corr);
      }
    }
    memcpy(last, cur, 6);
  }

  void read(Decoder& dec, U8* item) {
    U16 cur[3];
    U32 sym = dec.decode_symbol(m_byte_used);
    I32 diff_l = 0, diff_h = 0;
    U8 corr;
    if (sym & 1) {
      corr = (U8)dec.decode_symbol(m_rgb_diff[0]);
      cur[0] = (U8)(corr + (last[0] & 255));
      diff_l = (I32)(cur[0] & 255) - (last[0] & 255);
    } else {
      cur[0] = last[0] & 255;
    }
    if (sym & 2) {
      corr = (U8)dec.decode_symbol(m_rgb_diff[1]);
      cur[0] |= ((U16)(U8)(corr + (last[0] >> 8))) << 8;
      diff_h = (I32)(cur[0] >> 8) - (last[0] >> 8);
    } else {
      cur[0] |= last[0] & 0xFF00;
    }
    if (sym & 64) {
      if (sym & 4) {
        corr = (U8)dec.decode_symbol(m_rgb_diff[2]);
        cur[1] = (U8)(corr + ((diff_l + (last[1] & 255)) & 255));
      } else {
        cur[1] = last[1] & 255;
      }
      if (sym & 16) {
        I32 dl = (diff_l + (cur[1] & 255) - (last[1] & 255)) / 2;
        corr = (U8)dec.decode_symbol(m_rgb_diff[4]);
        cur[2] = (U8)(corr + ((dl + (last[2] & 255)) & 255));
      } else {
        cur[2] = last[2] & 255;
      }
      if (sym & 8) {
        corr = (U8)dec.decode_symbol(m_rgb_diff[3]);
        cur[1] |= ((U16)(U8)(corr + ((diff_h + (last[1] >> 8)) & 255))) << 8;
      } else {
        cur[1] |= last[1] & 0xFF00;
      }
      if (sym & 32) {
        I32 dh = (diff_h + (cur[1] >> 8) - (last[1] >> 8)) / 2;
        corr = (U8)dec.decode_symbol(m_rgb_diff[5]);
        cur[2] |= ((U16)(U8)(corr + ((dh + (last[2] >> 8)) & 255))) << 8;
      } else {
        cur[2] |= last[2] & 0xFF00;
      }
    } else {
      cur[1] = cur[0];
      cur[2] = cur[0];
    }
    memcpy(last, cur, 6);
    memcpy(item, cur, 6);
  }
};

// ---------------------------------------------------------------------------
// BYTE v2 item codec (extra bytes: per-byte difference models)
// ---------------------------------------------------------------------------

struct ByteV2 {
  std::vector<SymbolModel> m_byte;
  std::vector<U8> last;

  void init(const U8* first_item, U32 n, bool for_compressor) {
    m_byte.resize(n);
    for (U32 i = 0; i < n; i++) m_byte[i].init(256, for_compressor);
    last.assign(first_item, first_item + n);
  }
  void write(Encoder& enc, const U8* item) {
    for (size_t i = 0; i < last.size(); i++) {
      enc.encode_symbol(m_byte[i], (U8)(item[i] - last[i]));
      last[i] = item[i];
    }
  }
  void read(Decoder& dec, U8* item) {
    for (size_t i = 0; i < last.size(); i++) {
      last[i] = (U8)(dec.decode_symbol(m_byte[i]) + last[i]);
      item[i] = last[i];
    }
  }
};

// ---------------------------------------------------------------------------
// Record schema: an ordered list of items sharing one coder stream per chunk
// ---------------------------------------------------------------------------

enum ItemType : U16 {
  ITEM_BYTE = 0,
  ITEM_POINT10 = 6,
  ITEM_GPSTIME11 = 7,
  ITEM_RGB12 = 8,
};

struct RecordCodec {
  std::vector<U16> types, sizes;
  U32 point_size = 0;
  Point10V2 point10;
  GpsTime11V2 gpstime;
  Rgb12V2 rgb;
  ByteV2 bytes;

  bool set_schema(const U16* t, const U16* s, U32 n, std::string* err) {
    types.assign(t, t + n);
    sizes.assign(s, s + n);
    point_size = 0;
    for (U32 i = 0; i < n; i++) {
      point_size += s[i];
      switch (t[i]) {
        case ITEM_POINT10:
          if (s[i] != 20) { *err = "POINT10 item size must be 20"; return false; }
          break;
        case ITEM_GPSTIME11:
          if (s[i] != 8) { *err = "GPSTIME11 item size must be 8"; return false; }
          break;
        case ITEM_RGB12:
          if (s[i] != 6) { *err = "RGB12 item size must be 6"; return false; }
          break;
        case ITEM_BYTE:
          break;
        default:
          *err = "unsupported LASzip item type " + std::to_string(t[i]);
          return false;
      }
    }
    return true;
  }
  void init_models(const U8* first_record, bool for_compressor) {
    const U8* p = first_record;
    for (size_t i = 0; i < types.size(); i++) {
      switch (types[i]) {
        case ITEM_POINT10: point10.init(p, for_compressor); break;
        case ITEM_GPSTIME11: gpstime.init(p, for_compressor); break;
        case ITEM_RGB12: rgb.init(p, for_compressor); break;
        case ITEM_BYTE: bytes.init(p, sizes[i], for_compressor); break;
      }
      p += sizes[i];
    }
  }
  void write_record(Encoder& enc, const U8* record) {
    const U8* p = record;
    for (size_t i = 0; i < types.size(); i++) {
      switch (types[i]) {
        case ITEM_POINT10: point10.write(enc, p); break;
        case ITEM_GPSTIME11: gpstime.write(enc, p); break;
        case ITEM_RGB12: rgb.write(enc, p); break;
        case ITEM_BYTE: bytes.write(enc, p); break;
      }
      p += sizes[i];
    }
  }
  void read_record(Decoder& dec, U8* record) {
    U8* p = record;
    for (size_t i = 0; i < types.size(); i++) {
      switch (types[i]) {
        case ITEM_POINT10: point10.read(dec, p); break;
        case ITEM_GPSTIME11: gpstime.read(dec, p); break;
        case ITEM_RGB12: rgb.read(dec, p); break;
        case ITEM_BYTE: bytes.read(dec, p); break;
      }
      p += sizes[i];
    }
  }
};

// ---------------------------------------------------------------------------
// Chunked stream framing
//
// Layout of the LAZ point-data block (LASzip chunked compressor):
//   i64  chunk_table_offset  (absolute file offset in real files; here we
//        receive the point-data block with `base_offset` = its file offset,
//        so table position = chunk_table_offset - base_offset)
//   per chunk: [raw first record][arith-coded remaining records]
//   chunk table: u32 version(0), u32 number_chunks, then per-chunk byte
//        sizes coded with IntegerCompressor(32 bits, 2 contexts, context 1),
//        each predicted from the previous size.
// ---------------------------------------------------------------------------

static bool read_chunk_table(const U8* data, U64 data_len, U64 base_offset,
                             U64 num_points, U32 chunk_size,
                             std::vector<U64>* chunk_bytes, std::string* err) {
  if (data_len < 8) { *err = "point data too short for chunk table offset"; return false; }
  I64 table_off_abs;
  memcpy(&table_off_abs, data, 8);
  U32 n_chunks = (U32)((num_points + chunk_size - 1) / chunk_size);
  if (num_points == 0) { chunk_bytes->clear(); return true; }
  if (table_off_abs == -1) {
    *err = "chunk table offset -1 (table at EOF) not supported";
    return false;
  }
  U64 table_pos = (U64)table_off_abs - base_offset;
  if (table_pos + 8 > data_len) { *err = "chunk table offset out of range"; return false; }
  U32 version, n_stored;
  memcpy(&version, data + table_pos, 4);
  memcpy(&n_stored, data + table_pos + 4, 4);
  if (version != 0) { *err = "unsupported chunk table version"; return false; }
  if (n_stored != n_chunks) {
    // trust the table when it disagrees (files with early termination)
    n_chunks = n_stored;
  }
  Decoder dec;
  dec.init(data + table_pos + 8, data_len - table_pos - 8);
  IntegerCompressor ic;
  ic.setup(32, 2);
  ic.init(false);
  chunk_bytes->resize(n_chunks);
  I32 pred = 0;
  for (U32 i = 0; i < n_chunks; i++) {
    I32 v = ic.decompress(dec, pred, 1);
    (*chunk_bytes)[i] = (U32)v;
    pred = v;
  }
  return true;
}

static void write_chunk_table(std::vector<U8>* out, U64 base_offset,
                              size_t offset_field_pos,
                              const std::vector<U64>& chunk_bytes) {
  I64 table_off_abs = (I64)(base_offset + out->size());
  memcpy(out->data() + offset_field_pos, &table_off_abs, 8);
  U32 version = 0, n = (U32)chunk_bytes.size();
  out->insert(out->end(), (U8*)&version, (U8*)&version + 4);
  out->insert(out->end(), (U8*)&n, (U8*)&n + 4);
  Encoder enc;
  enc.init(out);
  IntegerCompressor ic;
  ic.setup(32, 2);
  ic.init(true);
  I32 pred = 0;
  for (U32 i = 0; i < n; i++) {
    ic.compress(enc, pred, (I32)chunk_bytes[i], 1);
    pred = (I32)chunk_bytes[i];
  }
  enc.done();
}

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------

static void set_err(char* errbuf, U32 errlen, const std::string& msg) {
  if (errbuf && errlen) {
    snprintf(errbuf, errlen, "%s", msg.c_str());
  }
}

extern "C" {

// Decompress a LAZ point-data block into raw point records.
// data/data_len: the point-data block (from offset_to_point_data to EOF).
// base_offset: file offset of `data` (chunk table offsets are absolute).
// Returns 0 on success.
int tl_laz_decompress(const U8* data, U64 data_len, U64 base_offset,
                      U64 num_points, U32 chunk_size, const U16* item_types,
                      const U16* item_sizes, U32 num_items, U8* dst,
                      char* errbuf, U32 errlen) {
  std::string err;
  RecordCodec codec;
  if (!codec.set_schema(item_types, item_sizes, num_items, &err)) {
    set_err(errbuf, errlen, err);
    return 1;
  }
  if (chunk_size == 0) chunk_size = 50000;
  std::vector<U64> chunk_bytes;
  if (!read_chunk_table(data, data_len, base_offset, num_points, chunk_size,
                        &chunk_bytes, &err)) {
    set_err(errbuf, errlen, err);
    return 1;
  }
  U64 pos = 8;  // past the chunk table offset field
  U64 done = 0;
  U32 psz = codec.point_size;
  for (size_t c = 0; c < chunk_bytes.size() && done < num_points; c++) {
    U64 in_chunk = num_points - done;
    if (in_chunk > chunk_size) in_chunk = chunk_size;
    if (pos + psz > data_len) {
      set_err(errbuf, errlen, "truncated chunk (raw first record)");
      return 1;
    }
    // first record raw
    memcpy(dst + done * psz, data + pos, psz);
    codec.init_models(data + pos, false);
    U64 coded_start = pos + psz;
    U64 coded_len = chunk_bytes[c] >= psz ? chunk_bytes[c] - psz : 0;
    if (coded_start + coded_len > data_len) coded_len = data_len - coded_start;
    Decoder dec;
    if (in_chunk > 1) dec.init(data + coded_start, coded_len);
    for (U64 i = 1; i < in_chunk; i++)
      codec.read_record(dec, dst + (done + i) * psz);
    done += in_chunk;
    pos += chunk_bytes[c];
  }
  if (done != num_points) {
    set_err(errbuf, errlen, "chunk table covers fewer points than expected");
    return 1;
  }
  return 0;
}

// Compress raw point records into a LAZ point-data block (chunked).
// base_offset: file offset where this block will be placed.
// dst receives a malloc'd buffer (free with tl_laz_free); *dst_len its size.
int tl_laz_compress(const U8* src, U64 num_points, U32 chunk_size,
                    const U16* item_types, const U16* item_sizes,
                    U32 num_items, U64 base_offset, U8** dst, U64* dst_len,
                    char* errbuf, U32 errlen) {
  std::string err;
  RecordCodec codec;
  if (!codec.set_schema(item_types, item_sizes, num_items, &err)) {
    set_err(errbuf, errlen, err);
    return 1;
  }
  if (chunk_size == 0) chunk_size = 50000;
  U32 psz = codec.point_size;
  std::vector<U8> out;
  out.reserve((size_t)(num_points * psz / 4 + 1024));
  I64 placeholder = 0;
  out.insert(out.end(), (U8*)&placeholder, (U8*)&placeholder + 8);

  std::vector<U64> chunk_bytes;
  U64 done = 0;
  while (done < num_points) {
    U64 in_chunk = num_points - done;
    if (in_chunk > chunk_size) in_chunk = chunk_size;
    size_t chunk_start = out.size();
    const U8* first = src + done * psz;
    out.insert(out.end(), first, first + psz);  // first record raw
    codec.init_models(first, true);
    if (in_chunk > 1) {
      Encoder enc;
      enc.init(&out);
      for (U64 i = 1; i < in_chunk; i++)
        codec.write_record(enc, src + (done + i) * psz);
      enc.done();
    }
    chunk_bytes.push_back(out.size() - chunk_start);
    done += in_chunk;
  }
  write_chunk_table(&out, base_offset, 0, chunk_bytes);

  U8* buf = (U8*)malloc(out.size());
  if (!buf) {
    set_err(errbuf, errlen, "malloc failed");
    return 1;
  }
  memcpy(buf, out.data(), out.size());
  *dst = buf;
  *dst_len = out.size();
  return 0;
}

void tl_laz_free(U8* p) { free(p); }

int tl_laz_abi_version() { return 1; }

}  // extern "C"
