// loader.cpp — native batched audio loader for the rade_tpu data pipeline.
//
// The reference feeds its models through torch.utils.data.DataLoader worker
// processes (/root/reference/src/main.py:914-953): each worker reads a FLAC
// file with libsndfile, converts to float and pads/crops to the fixed 64600-
// sample window.  This is the TPU-native runtime equivalent: one C++ thread
// pool that, per batch, reads each file, decodes it (FLAC via flacdec.cpp,
// PCM WAV via the RIFF parser below), converts to mono float and writes the
// padded/cropped row straight into the caller's preallocated (N, T) float32
// buffer — no Python objects, no GIL, no intermediate copies.
//
// Padding semantics mirror rade_tpu/data/padding.py exactly:
//   - u_starts == NULL  -> eval `pad`:   head-crop if n >= T, tile if short.
//   - u_starts given    -> train `pad_random`: start = floor(u * (n - T))
//     when n > T (same uniform distribution as rng.randint(n - T)), tile if
//     short.
//
// Build: python -m rade_tpu.native.build  (g++ -O3 -shared -fPIC -pthread,
// linked together with flacdec.cpp into librade_loader.so).

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {
// from flacdec.cpp (same shared object)
int flac_stream_info(const uint8_t* data, int64_t size, int* sample_rate,
                     int* channels, int* bps, int64_t* total_samples);
int64_t flac_decode(const uint8_t* data, int64_t size, int32_t* out,
                    int64_t out_capacity);
}

namespace {

uint32_t rd_u32le(const uint8_t* p) {
    return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
           ((uint32_t)p[3] << 24);
}
uint16_t rd_u16le(const uint8_t* p) {
    return (uint16_t)((uint32_t)p[0] | ((uint32_t)p[1] << 8));
}

// Decode a PCM RIFF/WAVE stream into mono float64 (same conversion rules as
// data/audio_io.py::read_wav: i16/32768, i32/2^31, (u8-128)/128, channel
// mean).  Returns samples per channel, or a negative error code.
int64_t wav_decode_mono(const uint8_t* data, int64_t size,
                        std::vector<double>* mono) {
    if (size < 12 || memcmp(data, "RIFF", 4) || memcmp(data + 8, "WAVE", 4))
        return -20;
    int channels = 0, sampwidth = 0, fmt = 0;
    const uint8_t* pcm = nullptr;
    int64_t pcm_size = 0;
    int64_t pos = 12;
    while (pos + 8 <= size) {
        const uint8_t* id = data + pos;
        int64_t csize = rd_u32le(data + pos + 4);
        const uint8_t* body = data + pos + 8;
        if (pos + 8 + csize > size) csize = size - pos - 8;
        if (!memcmp(id, "fmt ", 4) && csize >= 16) {
            fmt = rd_u16le(body);
            channels = rd_u16le(body + 2);
            sampwidth = rd_u16le(body + 14) / 8;
            // WAVE_FORMAT_EXTENSIBLE: the real format is the first two bytes
            // of the SubFormat GUID in the fmt-chunk extension (stdlib wave —
            // the Python fallback in data/audio_io.py — accepts these too).
            if (fmt == 0xFFFE && csize >= 40) fmt = rd_u16le(body + 24);
        } else if (!memcmp(id, "data", 4)) {
            pcm = body;
            pcm_size = csize;
        }
        pos += 8 + csize + (csize & 1);  // chunks are word-aligned
    }
    if (fmt != 1 || channels <= 0 || !pcm) return -21;  // PCM only
    if (sampwidth != 1 && sampwidth != 2 && sampwidth != 4) return -22;
    int64_t n = pcm_size / (channels * sampwidth);
    if (n <= 0) return -23;
    mono->resize(n);
    for (int64_t i = 0; i < n; ++i) {
        double acc = 0.0;
        for (int c = 0; c < channels; ++c) {
            const uint8_t* s = pcm + (i * channels + c) * sampwidth;
            if (sampwidth == 2) {
                acc += (double)(int16_t)rd_u16le(s) / 32768.0;
            } else if (sampwidth == 4) {
                acc += (double)(int32_t)rd_u32le(s) / 2147483648.0;
            } else {
                acc += ((double)s[0] - 128.0) / 128.0;
            }
        }
        (*mono)[i] = acc / channels;
    }
    return n;
}

// Decode a FLAC stream into mono float64.  Returns samples per channel or a
// negative error code.
int64_t flac_decode_mono(const uint8_t* data, int64_t size,
                         std::vector<double>* mono) {
    int sr, ch, bps;
    int64_t total;
    if (flac_stream_info(data, size, &sr, &ch, &bps, &total) != 0) return -10;
    if (total == 0) total = size;  // unknown length: bound by compressed size
    int64_t cap = (total + 65536) * ch;
    std::vector<int32_t> pcm((size_t)cap);
    int64_t n = flac_decode(data, size, pcm.data(), cap);
    if (n <= 0) return n ? n : -11;
    double scale = 1.0 / (double)(1u << (bps - 1));
    mono->resize(n);
    for (int64_t i = 0; i < n; ++i) {
        double acc = 0.0;
        for (int c = 0; c < ch; ++c) acc += (double)pcm[i * ch + c];
        (*mono)[i] = (acc / ch) * scale;
    }
    return n;
}

// Read a whole file into buf.  Returns size or negative errno-ish code.
int64_t read_file(const char* path, std::vector<uint8_t>* buf) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    fseek(f, 0, SEEK_END);
    long sz = ftell(f);
    fseek(f, 0, SEEK_SET);
    if (sz <= 0) {
        fclose(f);
        return -2;
    }
    buf->resize((size_t)sz);
    size_t got = fread(buf->data(), 1, (size_t)sz, f);
    fclose(f);
    return got == (size_t)sz ? (int64_t)sz : -3;
}

// Write one padded/cropped row (semantics of data/padding.py).
void emit_row(const std::vector<double>& mono, int64_t n, float* row,
              int64_t T, const double* u) {
    if (n >= T) {
        int64_t start = 0;
        if (u != nullptr && n > T) {
            start = (int64_t)(*u * (double)(n - T));
            if (start < 0) start = 0;
            if (start > n - T) start = n - T;
        }
        for (int64_t i = 0; i < T; ++i) row[i] = (float)mono[start + i];
    } else {
        for (int64_t i = 0; i < T; ++i) row[i] = (float)mono[i % n];
    }
}

}  // namespace

extern "C" {

// Load n audio files into out (n x T float32, preallocated).
//   paths:    n C strings (FLAC or PCM WAV; sniffed by magic bytes).
//   u_starts: per-item uniform [0,1) crop draws (train pad_random), or NULL
//             for deterministic eval padding.
//   lengths:  out, per item: decoded samples (>0) or a negative error code
//             (row is zero-filled on error; the caller decides whether that
//             is fatal — the 2021-eval path keeps zero rows by design).
//   threads:  worker thread count (<=1 runs inline).
// Returns the number of failed items.
int64_t rade_batch_load(const char* const* paths, int64_t n,
                        const double* u_starts, float* out, int64_t T,
                        int64_t threads, int64_t* lengths) {
    std::atomic<int64_t> next(0), failed(0);
    auto worker = [&]() {
        std::vector<uint8_t> buf;
        std::vector<double> mono;
        while (true) {
            int64_t i = next.fetch_add(1);
            if (i >= n) break;
            float* row = out + i * T;
            int64_t sz = read_file(paths[i], &buf);
            int64_t got = -30;
            if (sz >= 4) {
                if (!memcmp(buf.data(), "fLaC", 4))
                    got = flac_decode_mono(buf.data(), sz, &mono);
                else if (!memcmp(buf.data(), "RIFF", 4))
                    got = wav_decode_mono(buf.data(), sz, &mono);
            } else if (sz < 0) {
                got = sz - 100;  // file read error
            }
            lengths[i] = got;
            if (got <= 0) {
                memset(row, 0, sizeof(float) * (size_t)T);
                failed.fetch_add(1);
                continue;
            }
            emit_row(mono, got, row, T, u_starts ? u_starts + i : nullptr);
        }
    };
    int64_t k = threads;
    if (k > n) k = n;
    if (k <= 1) {
        worker();
    } else {
        std::vector<std::thread> pool;
        pool.reserve((size_t)k);
        for (int64_t t = 0; t < k; ++t) pool.emplace_back(worker);
        for (auto& th : pool) th.join();
    }
    return failed.load();
}

}  // extern "C"
