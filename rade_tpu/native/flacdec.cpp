// flacdec.cpp — minimal FLAC decoder for the rade_tpu data loader.
//
// The reference reads ASVspoof .flac files through soundfile/libsndfile
// (/root/reference/src/data_utils.py:165); this image ships no FLAC library,
// so the loader decodes natively.  Implements the FLAC bitstream subset that
// covers real-world encoder output: STREAMINFO parsing, frames with
// constant / verbatim / fixed(0-4) / LPC(1-32) subframes, Rice residual
// partitions (methods 0 and 1, escape codes), wasted bits, and
// left-side / right-side / mid-side channel decorrelation.  CRCs are not
// verified (decode speed over integrity checking; corrupt files surface as
// decode errors, which the dataset layer maps to zero-padding like the
// reference does).
//
// C ABI (ctypes):
//   flac_stream_info(data, size, &sample_rate, &channels, &bps, &total)
//   flac_decode(data, size, out_int32, out_capacity_samples)
//     -> samples-per-channel decoded (interleaved), or negative error code.
//
// Build: python -m rade_tpu.native.build  (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct BitReader {
    const uint8_t* data;
    int64_t size;     // bytes
    int64_t pos;      // byte position
    int bit;          // bit position within byte (0 = MSB)

    bool eof() const { return pos >= size; }

    // read up to 32 bits MSB-first
    uint32_t read_bits(int n) {
        uint32_t v = 0;
        while (n > 0) {
            if (pos >= size) return v << n;  // truncated stream
            int avail = 8 - bit;
            int take = n < avail ? n : avail;
            uint8_t cur = data[pos];
            uint8_t chunk = (uint8_t)((cur >> (avail - take)) & ((1u << take) - 1));
            v = (v << take) | chunk;
            bit += take;
            if (bit == 8) { bit = 0; ++pos; }
            n -= take;
        }
        return v;
    }

    uint64_t read_bits64(int n) {
        if (n <= 32) return read_bits(n);
        uint64_t hi = read_bits(n - 32);
        uint64_t lo = read_bits(32);
        return (hi << 32) | lo;
    }

    int32_t read_signed(int n) {
        uint32_t v = read_bits(n);
        if (n == 0) return 0;
        if (n < 32 && (v & (1u << (n - 1)))) v |= ~((1u << n) - 1);
        return (int32_t)v;
    }

    // unary: count 0 bits until the terminating 1
    uint32_t read_unary() {
        uint32_t q = 0;
        while (!eof()) {
            if (read_bits(1)) return q;
            ++q;
            if (q > 1u << 24) return q;  // corrupt-stream guard
        }
        return q;
    }

    void align_byte() {
        if (bit) { bit = 0; ++pos; }
    }
};

struct StreamInfo {
    uint32_t sample_rate = 0;
    int channels = 0;
    int bps = 0;
    uint64_t total_samples = 0;
    int64_t frames_start = 0;
};

bool parse_streaminfo(const uint8_t* data, int64_t size, StreamInfo* si) {
    if (size < 42 || memcmp(data, "fLaC", 4) != 0) return false;
    int64_t pos = 4;
    bool last = false;
    while (!last && pos + 4 <= size) {
        uint8_t hdr = data[pos];
        last = hdr & 0x80;
        int type = hdr & 0x7f;
        uint32_t len = ((uint32_t)data[pos + 1] << 16) | ((uint32_t)data[pos + 2] << 8) |
                       data[pos + 3];
        pos += 4;
        if (type == 0) {  // STREAMINFO
            if (pos + 34 > size) return false;
            const uint8_t* p = data + pos;
            si->sample_rate = ((uint32_t)p[10] << 12) | ((uint32_t)p[11] << 4) | (p[12] >> 4);
            si->channels = ((p[12] >> 1) & 0x7) + 1;
            si->bps = (((p[12] & 0x1) << 4) | (p[13] >> 4)) + 1;
            si->total_samples = ((uint64_t)(p[13] & 0x0f) << 32) | ((uint64_t)p[14] << 24) |
                                ((uint64_t)p[15] << 16) | ((uint64_t)p[16] << 8) | p[17];
        }
        pos += len;
    }
    if (pos > size || si->sample_rate == 0) return false;
    si->frames_start = pos;
    return true;
}

// FLAC's UTF-8-style coded number (frame/sample index), up to 7 bytes
bool read_utf8_number(BitReader* br, uint64_t* out) {
    uint32_t b0 = br->read_bits(8);
    int follow;
    uint64_t v;
    if ((b0 & 0x80) == 0) { *out = b0; return true; }
    else if ((b0 & 0xE0) == 0xC0) { follow = 1; v = b0 & 0x1F; }
    else if ((b0 & 0xF0) == 0xE0) { follow = 2; v = b0 & 0x0F; }
    else if ((b0 & 0xF8) == 0xF0) { follow = 3; v = b0 & 0x07; }
    else if ((b0 & 0xFC) == 0xF8) { follow = 4; v = b0 & 0x03; }
    else if ((b0 & 0xFE) == 0xFC) { follow = 5; v = b0 & 0x01; }
    else if (b0 == 0xFE) { follow = 6; v = 0; }
    else return false;
    for (int i = 0; i < follow; ++i) {
        uint32_t b = br->read_bits(8);
        if ((b & 0xC0) != 0x80) return false;
        v = (v << 6) | (b & 0x3F);
    }
    *out = v;
    return true;
}

// Rice / verbatim residual decoding into res[pred_order .. blocksize)
bool decode_residual(BitReader* br, int64_t* res, uint32_t blocksize, int pred_order) {
    uint32_t method = br->read_bits(2);
    if (method > 1) return false;
    int plen = method == 0 ? 4 : 5;
    uint32_t escape = method == 0 ? 0xF : 0x1F;
    uint32_t part_order = br->read_bits(4);
    uint32_t parts = 1u << part_order;
    if (blocksize % parts != 0) return false;
    uint32_t psize = blocksize >> part_order;
    uint32_t idx = pred_order;
    for (uint32_t p = 0; p < parts; ++p) {
        uint32_t count = psize - (p == 0 ? (uint32_t)pred_order : 0);
        uint32_t param = br->read_bits(plen);
        if (param == escape) {
            uint32_t nbits = br->read_bits(5);
            for (uint32_t i = 0; i < count; ++i) res[idx++] = br->read_signed(nbits);
        } else {
            for (uint32_t i = 0; i < count; ++i) {
                uint32_t q = br->read_unary();
                uint32_t lowbits = param ? br->read_bits(param) : 0;
                uint64_t u = ((uint64_t)q << param) | lowbits;
                res[idx++] = (int64_t)(u >> 1) ^ -(int64_t)(u & 1);
            }
        }
        if (br->eof() && p + 1 < parts) return false;
    }
    return idx == blocksize;
}

bool decode_subframe(BitReader* br, int64_t* out, uint32_t blocksize, int bps) {
    if (br->read_bits(1) != 0) return false;  // mandatory zero pad bit
    uint32_t type = br->read_bits(6);
    int wasted = 0;
    if (br->read_bits(1)) wasted = (int)br->read_unary() + 1;
    int ebps = bps - wasted;

    if (type == 0) {  // CONSTANT
        int64_t v = br->read_signed(ebps);
        for (uint32_t i = 0; i < blocksize; ++i) out[i] = v;
    } else if (type == 1) {  // VERBATIM
        for (uint32_t i = 0; i < blocksize; ++i) out[i] = br->read_signed(ebps);
    } else if ((type & 0x38) == 0x08 && (type & 0x07) <= 4) {  // FIXED 001xxx
        int order = type & 0x07;
        for (int i = 0; i < order; ++i) out[i] = br->read_signed(ebps);
        if (!decode_residual(br, out, blocksize, order)) return false;
        for (uint32_t i = order; i < blocksize; ++i) {
            switch (order) {
                case 0: break;
                case 1: out[i] += out[i - 1]; break;
                case 2: out[i] += 2 * out[i - 1] - out[i - 2]; break;
                case 3: out[i] += 3 * out[i - 1] - 3 * out[i - 2] + out[i - 3]; break;
                case 4:
                    out[i] += 4 * out[i - 1] - 6 * out[i - 2] + 4 * out[i - 3] - out[i - 4];
                    break;
            }
        }
    } else if (type & 0x20) {  // LPC 1xxxxx
        int order = (type & 0x1F) + 1;
        for (int i = 0; i < order; ++i) out[i] = br->read_signed(ebps);
        uint32_t prec = br->read_bits(4);
        if (prec == 0xF) return false;
        prec += 1;
        int shift = br->read_signed(5);
        if (shift < 0) return false;
        int64_t coeffs[32];
        for (int i = 0; i < order; ++i) coeffs[i] = br->read_signed(prec);
        if (!decode_residual(br, out, blocksize, order)) return false;
        for (uint32_t i = order; i < blocksize; ++i) {
            int64_t acc = 0;
            for (int j = 0; j < order; ++j) acc += coeffs[j] * out[i - 1 - j];
            out[i] += acc >> shift;
        }
    } else {
        return false;
    }
    if (wasted)
        for (uint32_t i = 0; i < blocksize; ++i) out[i] <<= wasted;
    return true;
}

}  // namespace

extern "C" {

// Parse STREAMINFO. Returns 0 on success, negative on error.
int flac_stream_info(const uint8_t* data, int64_t size, int* sample_rate,
                     int* channels, int* bps, int64_t* total_samples) {
    StreamInfo si;
    if (!parse_streaminfo(data, size, &si)) return -1;
    *sample_rate = (int)si.sample_rate;
    *channels = si.channels;
    *bps = si.bps;
    *total_samples = (int64_t)si.total_samples;
    return 0;
}

// Decode all frames into interleaved int32 samples.
// Returns samples-per-channel decoded, or negative error code.
int64_t flac_decode(const uint8_t* data, int64_t size, int32_t* out,
                    int64_t out_capacity) {
    StreamInfo si;
    if (!parse_streaminfo(data, size, &si)) return -1;
    BitReader br{data, size, si.frames_start, 0};
    const int max_block = 65536;
    // thread_local std::vector so the scratch is destroyed at thread exit —
    // loader.cpp spawns fresh worker threads per batch, and a raw
    // thread_local pointer would leak its allocation on every thread exit.
    static thread_local std::vector<int64_t> chan_scratch;
    int64_t need = (int64_t)max_block * si.channels;
    if ((int64_t)chan_scratch.size() < need) chan_scratch.resize((size_t)need);
    int64_t* chan_buf = chan_scratch.data();

    int64_t written = 0;  // samples per channel
    while (true) {
        br.align_byte();
        // skip any padding to the next frame sync (14-bit 0b11111111111110)
        while (br.pos + 2 <= br.size) {
            if (data[br.pos] == 0xFF && (data[br.pos + 1] & 0xFC) == 0xF8) break;
            ++br.pos;
        }
        if (br.pos + 2 > br.size) break;

        br.read_bits(14);                       // sync
        br.read_bits(1);                        // reserved
        br.read_bits(1);                        // blocking strategy
        uint32_t bs_code = br.read_bits(4);
        uint32_t sr_code = br.read_bits(4);
        uint32_t ch_code = br.read_bits(4);
        uint32_t ss_code = br.read_bits(3);
        br.read_bits(1);                        // reserved
        uint64_t frame_no;
        if (!read_utf8_number(&br, &frame_no)) return written ? written : -2;

        uint32_t blocksize;
        if (bs_code == 0) return written ? written : -3;
        else if (bs_code == 1) blocksize = 192;
        else if (bs_code <= 5) blocksize = 576u << (bs_code - 2);
        else if (bs_code == 6) blocksize = br.read_bits(8) + 1;
        else if (bs_code == 7) blocksize = br.read_bits(16) + 1;
        else blocksize = 256u << (bs_code - 8);

        if (sr_code == 12) br.read_bits(8);
        else if (sr_code == 13 || sr_code == 14) br.read_bits(16);

        int bps = si.bps;
        switch (ss_code) {
            case 1: bps = 8; break;
            case 2: bps = 12; break;
            case 4: bps = 16; break;
            case 5: bps = 20; break;
            case 6: bps = 24; break;
            case 7: bps = 32; break;
            default: break;  // 0: from streaminfo
        }
        br.read_bits(8);  // CRC-8 (unverified)

        if (blocksize > (uint32_t)max_block) return written ? written : -4;

        int nch = si.channels;
        int assign = -1;  // 0=left/side 1=right/side 2=mid/side
        if (ch_code <= 7) nch = (int)ch_code + 1;
        else if (ch_code == 8) { nch = 2; assign = 0; }
        else if (ch_code == 9) { nch = 2; assign = 1; }
        else if (ch_code == 10) { nch = 2; assign = 2; }
        else return written ? written : -5;

        for (int c = 0; c < nch; ++c) {
            int sub_bps = bps;
            if ((assign == 0 && c == 1) || (assign == 1 && c == 0) ||
                (assign == 2 && c == 1))
                sub_bps += 1;  // side channel carries one extra bit
            if (!decode_subframe(&br, chan_buf + (int64_t)c * max_block, blocksize,
                                 sub_bps))
                return written ? written : -6;
        }
        br.align_byte();
        br.read_bits(16);  // CRC-16 (unverified)

        // undo inter-channel decorrelation
        if (assign == 0) {  // left/side: r = l - s
            for (uint32_t i = 0; i < blocksize; ++i)
                chan_buf[max_block + i] = chan_buf[i] - chan_buf[max_block + i];
        } else if (assign == 1) {  // right/side: l = s + r
            for (uint32_t i = 0; i < blocksize; ++i)
                chan_buf[i] = chan_buf[i] + chan_buf[max_block + i];
        } else if (assign == 2) {  // mid/side
            for (uint32_t i = 0; i < blocksize; ++i) {
                int64_t mid = chan_buf[i];
                int64_t side = chan_buf[max_block + i];
                mid = (mid << 1) | (side & 1);
                chan_buf[i] = (mid + side) >> 1;
                chan_buf[max_block + i] = (mid - side) >> 1;
            }
        }

        if ((written + blocksize) * nch > out_capacity) return -7;
        for (uint32_t i = 0; i < blocksize; ++i)
            for (int c = 0; c < nch; ++c)
                out[(written + i) * nch + c] = (int32_t)chan_buf[(int64_t)c * max_block + i];
        written += blocksize;
        if (si.total_samples && (uint64_t)written >= si.total_samples) break;
    }
    return written;
}

}  // extern "C"
