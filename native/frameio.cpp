// frameio — threaded native frame I/O for the video pipeline.
//
// The TPU-native equivalent of the reference's C-side data path
// (ppm_rw.c / bmp_rw.c + the sequential frame loop in
// extra/video_convert.c): while the reference reads, converts and writes
// one frame at a time on one thread, this library decodes/encodes whole
// frame batches in parallel worker threads into caller-owned canonical
// RGB buffers, so host I/O overlaps device compute.
//
// C ABI only (consumed via ctypes from ntsc_crt_tpu/utils/native_io.py).
// Formats: binary PPM (P6, maxval<=255) and uncompressed 24/32-bit BMP.

#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <atomic>
#include <thread>
#include <vector>

namespace {

struct Buf {
    std::vector<uint8_t> data;
    bool ok = false;
};

bool read_file(const char* path, std::vector<uint8_t>& out) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return false;
    std::fseek(f, 0, SEEK_END);
    long n = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    if (n <= 0) { std::fclose(f); return false; }
    out.resize(static_cast<size_t>(n));
    size_t rd = std::fread(out.data(), 1, out.size(), f);
    std::fclose(f);
    return rd == out.size();
}

// ---- PPM ------------------------------------------------------------------

int ppm_token(const std::vector<uint8_t>& d, size_t& pos, char* tok, size_t cap) {
    while (pos < d.size()) {
        if (d[pos] == '#') {
            while (pos < d.size() && d[pos] != '\n') pos++;
        } else if (isspace(d[pos])) {
            pos++;
        } else {
            break;
        }
    }
    size_t i = 0;
    while (pos < d.size() && !isspace(d[pos]) && i + 1 < cap) tok[i++] = d[pos++];
    tok[i] = 0;
    return i > 0;
}

bool decode_ppm(const std::vector<uint8_t>& d, uint8_t* rgb, int h, int w) {
    size_t pos = 0;
    char tok[32];
    if (!ppm_token(d, pos, tok, sizeof tok) || std::strcmp(tok, "P6") != 0)
        return false;
    if (!ppm_token(d, pos, tok, sizeof tok)) return false;
    int fw = std::atoi(tok);
    if (!ppm_token(d, pos, tok, sizeof tok)) return false;
    int fh = std::atoi(tok);
    if (!ppm_token(d, pos, tok, sizeof tok)) return false;
    int maxc = std::atoi(tok);
    if (fw != w || fh != h || maxc <= 0 || maxc > 255) return false;
    pos++;  // single whitespace after maxval
    size_t need = static_cast<size_t>(w) * h * 3;
    // overflow-safe: pos can be d.size()+1 when the file ends right after
    // the maxval digits; d.size() - pos would underflow (size_t)
    if (pos > d.size() || d.size() - pos < need) return false;
    const uint8_t* src = d.data() + pos;
    if (maxc == 255) {
        std::memcpy(rgb, src, need);
    } else {
        for (size_t i = 0; i < need; i++)
            rgb[i] = static_cast<uint8_t>((src[i] * 255 + maxc / 2) / maxc);
    }
    return true;
}

// ---- BMP ------------------------------------------------------------------

uint32_t rd32(const uint8_t* p) {
    return p[0] | (p[1] << 8) | (p[2] << 16) |
           (static_cast<uint32_t>(p[3]) << 24);
}

bool decode_bmp(const std::vector<uint8_t>& d, uint8_t* rgb, int h, int w) {
    if (d.size() < 54 || d[0] != 'B' || d[1] != 'M') return false;
    uint32_t off = rd32(&d[10]);
    int32_t fw = static_cast<int32_t>(rd32(&d[18]));
    int32_t fh = static_cast<int32_t>(rd32(&d[22]));
    uint16_t depth = static_cast<uint16_t>(d[28] | (d[29] << 8));
    uint32_t comp = rd32(&d[30]);
    bool flip = fh > 0;
    fh = fh < 0 ? -fh : fh;
    if (fw != w || fh != h || comp != 0 || (depth != 24 && depth != 32))
        return false;
    int bypp = depth / 8;
    size_t stride = (static_cast<size_t>(w) * bypp + 3) & ~size_t(3);
    if (d.size() < off + stride * h) return false;
    for (int row = 0; row < h; row++) {
        const uint8_t* line = d.data() + off + stride * row;
        int dst = flip ? (h - 1 - row) : row;
        uint8_t* out = rgb + static_cast<size_t>(dst) * w * 3;
        for (int x = 0; x < w; x++) {
            out[x * 3 + 0] = line[x * bypp + 2];
            out[x * 3 + 1] = line[x * bypp + 1];
            out[x * 3 + 2] = line[x * bypp + 0];
        }
    }
    return true;
}

void wr32(uint8_t* p, uint32_t v) {
    p[0] = v & 0xff; p[1] = (v >> 8) & 0xff;
    p[2] = (v >> 16) & 0xff; p[3] = (v >> 24) & 0xff;
}

bool encode_bmp(const char* path, const uint8_t* rgb, int h, int w) {
    size_t img = static_cast<size_t>(w) * h * 4;
    std::vector<uint8_t> out(54 + img);
    uint8_t* p = out.data();
    p[0] = 'B'; p[1] = 'M';
    wr32(p + 2, static_cast<uint32_t>(54 + img));
    wr32(p + 10, 54);
    wr32(p + 14, 40);
    wr32(p + 18, static_cast<uint32_t>(w));
    wr32(p + 22, static_cast<uint32_t>(h));
    p[26] = 1; p[28] = 32;
    wr32(p + 34, static_cast<uint32_t>(img));
    wr32(p + 38, 2835); wr32(p + 42, 2835);
    for (int row = 0; row < h; row++) {
        const uint8_t* src = rgb + static_cast<size_t>(h - 1 - row) * w * 3;
        uint8_t* line = p + 54 + static_cast<size_t>(row) * w * 4;
        for (int x = 0; x < w; x++) {
            line[x * 4 + 0] = src[x * 3 + 2];
            line[x * 4 + 1] = src[x * 3 + 1];
            line[x * 4 + 2] = src[x * 3 + 0];
            line[x * 4 + 3] = 0xff;
        }
    }
    FILE* f = std::fopen(path, "wb");
    if (!f) return false;
    size_t wrn = std::fwrite(out.data(), 1, out.size(), f);
    std::fclose(f);
    return wrn == out.size();
}

template <typename Fn>
void parallel_for(int n, Fn fn) {
    unsigned hw = std::thread::hardware_concurrency();
    int nthreads = static_cast<int>(hw ? hw : 4);
    if (nthreads > n) nthreads = n > 0 ? n : 1;
    std::atomic<int> next(0);
    std::vector<std::thread> pool;
    for (int t = 0; t < nthreads; t++) {
        pool.emplace_back([&] {
            for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1))
                fn(i);
        });
    }
    for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// Read n images (PPM P6 or BMP, auto-detected) of identical (h, w) into a
// caller buffer of n*h*w*3 canonical RGB bytes.  Returns the number decoded
// successfully; failed slots are zero-filled.
int frameio_read_batch(const char** paths, int n, uint8_t* rgb,
                       int h, int w) {
    std::atomic<int> okcnt(0);
    parallel_for(n, [&](int i) {
        uint8_t* dst = rgb + static_cast<size_t>(i) * h * w * 3;
        std::vector<uint8_t> d;
        bool ok = read_file(paths[i], d);
        if (ok) {
            if (d.size() >= 2 && d[0] == 'P' && d[1] == '6')
                ok = decode_ppm(d, dst, h, w);
            else
                ok = decode_bmp(d, dst, h, w);
        }
        if (!ok)
            std::memset(dst, 0, static_cast<size_t>(h) * w * 3);
        else
            okcnt.fetch_add(1);
    });
    return okcnt.load();
}

// Write n canonical-RGB frames as 32-bit BMPs in parallel.
int frameio_write_batch(const char** paths, int n, const uint8_t* rgb,
                        int h, int w) {
    std::atomic<int> okcnt(0);
    parallel_for(n, [&](int i) {
        const uint8_t* src = rgb + static_cast<size_t>(i) * h * w * 3;
        if (encode_bmp(paths[i], src, h, w)) okcnt.fetch_add(1);
    });
    return okcnt.load();
}

}  // extern "C"
