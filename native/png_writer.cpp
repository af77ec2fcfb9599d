// Threaded PNG encoder/writer for the sampling pipelines.
//
// The FID-50k path (pipelines/sample.py, reference inference.py:224-226)
// and the generate-and-filter loop dump tens of thousands of PNGs; PIL
// encodes them one-at-a-time on the GIL. This writer fans a uint8 NHWC
// batch out over a thread pool: each thread zlib-compresses the filtered
// scanlines and writes signature/IHDR/IDAT/IEND directly.
//
// Exposed C ABI (consumed via ctypes from vavae_tpu/utils/png_native.py):
//   png_write_batch(images, n, h, w, paths, level, n_threads) -> #failures
//
// RGB8 only (what the pipelines emit). zlib level 1 by default: PNG size
// matters little for FID scratch output, wall-clock does.

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>
#include <zlib.h>

namespace {

void put_u32(std::vector<uint8_t>& buf, uint32_t v) {
    buf.push_back(v >> 24);
    buf.push_back(v >> 16);
    buf.push_back(v >> 8);
    buf.push_back(v);
}

void put_chunk(std::vector<uint8_t>& out, const char type[4],
               const uint8_t* data, size_t len) {
    put_u32(out, static_cast<uint32_t>(len));
    size_t start = out.size();
    out.insert(out.end(), type, type + 4);
    if (len) out.insert(out.end(), data, data + len);
    uint32_t crc = crc32(0L, out.data() + start, static_cast<uInt>(len + 4));
    put_u32(out, crc);
}

bool encode_png(const uint8_t* rgb, int h, int w, int level,
                std::vector<uint8_t>& out) {
    // raw stream: per row, filter byte 0 + w*3 bytes
    const size_t row = static_cast<size_t>(w) * 3;
    std::vector<uint8_t> raw((row + 1) * h);
    for (int y = 0; y < h; ++y) {
        raw[y * (row + 1)] = 0;  // filter: None
        std::memcpy(&raw[y * (row + 1) + 1], rgb + y * row, row);
    }
    uLongf bound = compressBound(static_cast<uLong>(raw.size()));
    std::vector<uint8_t> z(bound);
    if (compress2(z.data(), &bound, raw.data(), static_cast<uLong>(raw.size()),
                  level) != Z_OK)
        return false;

    out.clear();
    static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
    out.insert(out.end(), sig, sig + 8);
    uint8_t ihdr[13];
    ihdr[0] = static_cast<uint8_t>(w >> 24); ihdr[1] = static_cast<uint8_t>(w >> 16);
    ihdr[2] = static_cast<uint8_t>(w >> 8);  ihdr[3] = static_cast<uint8_t>(w);
    ihdr[4] = static_cast<uint8_t>(h >> 24); ihdr[5] = static_cast<uint8_t>(h >> 16);
    ihdr[6] = static_cast<uint8_t>(h >> 8);  ihdr[7] = static_cast<uint8_t>(h);
    ihdr[8] = 8;   // bit depth
    ihdr[9] = 2;   // color type: truecolor RGB
    ihdr[10] = 0;  // compression
    ihdr[11] = 0;  // filter
    ihdr[12] = 0;  // interlace
    put_chunk(out, "IHDR", ihdr, 13);
    put_chunk(out, "IDAT", z.data(), bound);
    put_chunk(out, "IEND", nullptr, 0);
    return true;
}

}  // namespace

extern "C" {

// images: (n, h, w, 3) uint8 contiguous; paths: n C strings.
// Returns the number of images that FAILED to encode/write (0 = success).
int png_write_batch(const uint8_t* images, int n, int h, int w,
                    const char** paths, int level, int n_threads) {
    if (n <= 0) return 0;
    if (level < 0 || level > 9) level = 1;
    int threads = n_threads > 0 ? n_threads : static_cast<int>(
        std::thread::hardware_concurrency());
    if (threads > n) threads = n;
    if (threads < 1) threads = 1;

    std::atomic<int> next(0), failures(0);
    const size_t img_bytes = static_cast<size_t>(h) * w * 3;

    auto worker = [&]() {
        std::vector<uint8_t> buf;
        for (;;) {
            int i = next.fetch_add(1);
            if (i >= n) break;
            if (!encode_png(images + static_cast<size_t>(i) * img_bytes, h, w,
                            level, buf)) {
                failures.fetch_add(1);
                continue;
            }
            FILE* f = std::fopen(paths[i], "wb");
            if (!f) {
                failures.fetch_add(1);
                continue;
            }
            size_t written = std::fwrite(buf.data(), 1, buf.size(), f);
            std::fclose(f);
            if (written != buf.size()) failures.fetch_add(1);
        }
    };

    std::vector<std::thread> pool;
    pool.reserve(threads);
    for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
    return failures.load();
}

}  // extern "C"
