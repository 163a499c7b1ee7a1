// flacenc.cpp — fast FLAC encoder for synthetic dataset generation.
//
// Benchmarking the data pipeline at real dataset scale (the LA train set is
// 25,380 FLAC utterances) needs tens of thousands of realistic FLAC files;
// the reference downloads them (utils/download_dataset.py), but this
// environment has no network, so rade_tpu/tools/synth_dataset.py synthesizes
// them.  A pure-Python encoder takes ~40 s per 4-second utterance — this
// C++ encoder does the same in ~1 ms so a full-size dataset builds in
// seconds.
//
// Output subset: mono, 16-bit, fixed-predictor (order chosen 0-2 per frame)
// subframes, one Rice partition per frame (method 0, escape code for
// pathological residuals), correct CRC-8/CRC-16 — decodable by flacdec.cpp
// and by any standard FLAC decoder.
//
// C ABI (ctypes):
//   flac_encode16(samples_i16, n, sample_rate, blocksize, out, out_capacity)
//     -> bytes written, or negative error code (-1 capacity, -2 args).
//
// Build: python -m rade_tpu.native.build (part of librade_loader.so).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct BitWriter {
    uint8_t* out;
    int64_t cap;
    int64_t pos = 0;  // bytes fully written
    uint64_t acc = 0;
    int nbits = 0;
    bool overflow = false;

    void write(uint64_t v, int n) {
        if (n < 64) v &= ((uint64_t)1 << n) - 1;
        while (n > 0) {
            int take = n < 32 ? n : 32;
            uint32_t chunk = (uint32_t)(v >> (n - take));
            acc = (acc << take) | chunk;
            nbits += take;
            n -= take;
            while (nbits >= 8) {
                nbits -= 8;
                if (pos >= cap) { overflow = true; return; }
                out[pos++] = (uint8_t)((acc >> nbits) & 0xFF);
            }
            acc &= (nbits ? (((uint64_t)1 << nbits) - 1) : 0);
        }
    }

    void write_unary(uint32_t q) {
        while (q >= 32) { write(0, 32); q -= 32; }
        write(1, (int)q + 1);  // q zeros then a one
    }

    void align() {
        if (nbits) write(0, 8 - nbits);
    }
};

uint8_t crc8(const uint8_t* d, int64_t n) {
    uint8_t c = 0;
    for (int64_t i = 0; i < n; ++i) {
        c ^= d[i];
        for (int b = 0; b < 8; ++b)
            c = (uint8_t)((c & 0x80) ? (c << 1) ^ 0x07 : (c << 1));
    }
    return c;
}

uint16_t crc16(const uint8_t* d, int64_t n) {
    uint16_t c = 0;
    for (int64_t i = 0; i < n; ++i) {
        c ^= (uint16_t)d[i] << 8;
        for (int b = 0; b < 8; ++b)
            c = (uint16_t)((c & 0x8000) ? (c << 1) ^ 0x8005 : (c << 1));
    }
    return c;
}

void utf8_number(BitWriter* bw, uint64_t n) {
    if (n < 0x80) {
        bw->write(n, 8);
    } else if (n < 0x800) {
        bw->write(0xC0 | (n >> 6), 8);
        bw->write(0x80 | (n & 0x3F), 8);
    } else if (n < 0x10000) {
        bw->write(0xE0 | (n >> 12), 8);
        bw->write(0x80 | ((n >> 6) & 0x3F), 8);
        bw->write(0x80 | (n & 0x3F), 8);
    } else {
        bw->write(0xF0 | (n >> 18), 8);
        bw->write(0x80 | ((n >> 12) & 0x3F), 8);
        bw->write(0x80 | ((n >> 6) & 0x3F), 8);
        bw->write(0x80 | (n & 0x3F), 8);
    }
}

// Sum of |residual| for a fixed-predictor order over a block.
uint64_t fixed_cost(const int16_t* x, int64_t bs, int order) {
    uint64_t s = 0;
    for (int64_t i = order; i < bs; ++i) {
        int64_t r;
        if (order == 0) r = x[i];
        else if (order == 1) r = (int64_t)x[i] - x[i - 1];
        else r = (int64_t)x[i] - 2 * (int64_t)x[i - 1] + x[i - 2];
        s += (uint64_t)(r < 0 ? -r : r);
    }
    return s;
}

}  // namespace

extern "C" {

int64_t flac_encode16(const int16_t* x, int64_t n, int sample_rate,
                      int blocksize, uint8_t* out, int64_t cap) {
    if (n <= 0 || blocksize < 16 || blocksize > 65535 || !x || !out)
        return -2;
    BitWriter bw{out, cap};

    // --- fLaC + STREAMINFO (last metadata block) ---
    bw.write(0x664C6143u, 32);  // "fLaC"
    bw.write(1, 1);             // last metadata block
    bw.write(0, 7);             // STREAMINFO
    bw.write(34, 24);
    bw.write((uint32_t)blocksize, 16);  // min blocksize
    bw.write((uint32_t)blocksize, 16);  // max blocksize
    bw.write(0, 24);                    // min frame size (unknown)
    bw.write(0, 24);                    // max frame size (unknown)
    bw.write((uint32_t)sample_rate, 20);
    bw.write(0, 3);   // channels - 1 (mono)
    bw.write(15, 5);  // bps - 1 (16)
    bw.write((uint64_t)n, 36);
    for (int i = 0; i < 16; ++i) bw.write(0, 8);  // MD5 (unset)

    std::vector<int64_t> res((size_t)blocksize);
    uint64_t frame_no = 0;
    for (int64_t start = 0; start < n; start += blocksize, ++frame_no) {
        int64_t bs = n - start < blocksize ? n - start : blocksize;
        const int16_t* blk = x + start;

        int64_t header_pos = bw.pos;
        if (bw.nbits != 0) return -3;  // frames are byte-aligned

        // --- frame header ---
        bw.write(0x3FFE, 14);  // sync
        bw.write(0, 1);        // reserved
        bw.write(0, 1);        // fixed-blocksize stream
        bw.write(7, 4);        // blocksize: 16-bit value at header end
        bw.write(0, 4);        // sample rate: from STREAMINFO
        bw.write(0, 4);        // channels: mono
        bw.write(4, 3);        // sample size: 16 bps
        bw.write(0, 1);        // reserved
        utf8_number(&bw, frame_no);
        bw.write((uint32_t)(bs - 1), 16);
        if (bw.nbits != 0) return -3;
        bw.write(crc8(out + header_pos, bw.pos - header_pos), 8);

        // --- choose the cheapest fixed-predictor order for this block ---
        int order = 0;
        uint64_t best = ~0ull;
        for (int o = 0; o <= 2 && o < bs; ++o) {
            uint64_t c = fixed_cost(blk, bs, o);
            if (c < best) { best = c; order = o; }
        }

        // --- subframe header: fixed(order), no wasted bits ---
        bw.write(0, 1);
        bw.write(0x08 | order, 6);
        bw.write(0, 1);

        // warmup samples
        for (int i = 0; i < order; ++i)
            bw.write((uint32_t)(uint16_t)blk[i], 16);

        // residuals
        int64_t nres = bs - order;
        uint64_t abs_sum = 0;
        for (int64_t i = 0; i < nres; ++i) {
            int64_t j = i + order;
            int64_t r;
            if (order == 0) r = blk[j];
            else if (order == 1) r = (int64_t)blk[j] - blk[j - 1];
            else r = (int64_t)blk[j] - 2 * (int64_t)blk[j - 1] + blk[j - 2];
            res[(size_t)i] = r;
            abs_sum += (uint64_t)(r < 0 ? -r : r);
        }

        // Rice parameter: E|r| ~ 2^(k-1) is optimal for Laplacian residuals.
        int k = 0;
        if (nres > 0) {
            uint64_t mean = abs_sum / (uint64_t)nres + 1;
            while ((1ull << k) < mean && k < 30) ++k;
        }

        // residual coding: method 0 (4-bit Rice), partition order 0
        bw.write(0, 2);  // method 0
        bw.write(0, 4);  // partition order 0
        if (k <= 14) {
            bw.write((uint32_t)k, 4);
            for (int64_t i = 0; i < nres; ++i) {
                int64_t r = res[(size_t)i];
                uint64_t z = r >= 0 ? ((uint64_t)r << 1)
                                    : (((uint64_t)(-r) << 1) - 1);  // zigzag
                bw.write_unary((uint32_t)(z >> k));
                if (k) bw.write(z, k);
            }
        } else {
            // escape: raw fixed-width residuals (18 bits covers order<=2 @16bps)
            bw.write(0xF, 4);
            bw.write(18, 5);
            for (int64_t i = 0; i < nres; ++i)
                bw.write((uint64_t)res[(size_t)i], 18);
        }

        bw.align();
        bw.write(crc16(out + header_pos, bw.pos - header_pos), 16);
        if (bw.overflow) return -1;
    }
    return bw.overflow ? -1 : bw.pos;
}

}  // extern "C"
