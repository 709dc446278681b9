// Native frame loader: threaded JPEG decode + bilinear resize + background
// compositing for the tracking data pipeline.
//
// Role: the reference feeds its tracker through torch DataLoader worker
// processes doing PIL decode/resize/composite (vhap/data/video_dataset.py:
// 209-323). Here the host-side hot path is a small C++ library driven via
// ctypes (vhap_tpu/data/native_loader.py): one call decodes a whole batch
// of frames (and alpha maps) into a preallocated buffer using a thread
// pool — on NeRSemble-sized inputs (16 x 3208x2200 JPEG per timestep) this
// keeps the single-host CPU ahead of the TPU step time.
//
// Build: g++ -O3 -shared -fPIC -o libframeloader.so frameloader.cpp -ljpeg -lpthread

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

struct Image {
    std::vector<uint8_t> data;
    int h = 0, w = 0, c = 0;
};

bool decode_jpeg(const char* path, Image* out) {
    FILE* f = fopen(path, "rb");
    if (!f) return false;

    jpeg_decompress_struct cinfo;
    jpeg_error_mgr jerr;
    cinfo.err = jpeg_std_error(&jerr);
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, f);
    if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
        jpeg_destroy_decompress(&cinfo);
        fclose(f);
        return false;
    }
    jpeg_start_decompress(&cinfo);

    out->w = cinfo.output_width;
    out->h = cinfo.output_height;
    out->c = cinfo.output_components;
    out->data.resize(size_t(out->h) * out->w * out->c);

    while (cinfo.output_scanline < cinfo.output_height) {
        uint8_t* row = out->data.data()
            + size_t(cinfo.output_scanline) * out->w * out->c;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return true;
}

// bilinear resize (HWC uint8), matching PIL.Image.BILINEAR closely enough
// for training data (the reference resizes with PIL at
// vhap/data/video_dataset.py:272-275)
void resize_bilinear(const Image& src, int oh, int ow, uint8_t* dst) {
    const int c = src.c;
    const float sy = float(src.h) / oh;
    const float sx = float(src.w) / ow;
    for (int y = 0; y < oh; ++y) {
        float fy = (y + 0.5f) * sy - 0.5f;
        int y0 = int(fy);
        if (fy < 0) { fy = 0; y0 = 0; }
        int y1 = y0 + 1 < src.h ? y0 + 1 : src.h - 1;
        float wy = fy - y0;
        for (int x = 0; x < ow; ++x) {
            float fx = (x + 0.5f) * sx - 0.5f;
            int x0 = int(fx);
            if (fx < 0) { fx = 0; x0 = 0; }
            int x1 = x0 + 1 < src.w ? x0 + 1 : src.w - 1;
            float wx = fx - x0;
            for (int k = 0; k < c; ++k) {
                float v00 = src.data[(size_t(y0) * src.w + x0) * c + k];
                float v01 = src.data[(size_t(y0) * src.w + x1) * c + k];
                float v10 = src.data[(size_t(y1) * src.w + x0) * c + k];
                float v11 = src.data[(size_t(y1) * src.w + x1) * c + k];
                float v = (v00 * (1 - wx) + v01 * wx) * (1 - wy)
                        + (v10 * (1 - wx) + v11 * wx) * wy;
                dst[(size_t(y) * ow + x) * c + k] = uint8_t(v + 0.5f);
            }
        }
    }
}

void parallel_for(int n, int n_threads, const std::function<void(int)>& fn) {
    if (n_threads <= 1 || n <= 1) {
        for (int i = 0; i < n; ++i) fn(i);
        return;
    }
    std::atomic<int> next{0};
    std::vector<std::thread> pool;
    int workers = n_threads < n ? n_threads : n;
    for (int t = 0; t < workers; ++t) {
        pool.emplace_back([&]() {
            for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) fn(i);
        });
    }
    for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// Decode n JPEG files into out (n, oh, ow, 3) uint8, resizing as needed.
// Returns the number of successfully decoded frames.
int fl_decode_batch(const char** paths, int n, uint8_t* out, int oh, int ow,
                    int n_threads) {
    std::atomic<int> ok{0};
    parallel_for(n, n_threads, [&](int i) {
        Image img;
        if (!decode_jpeg(paths[i], &img) || img.c != 3) return;
        uint8_t* dst = out + size_t(i) * oh * ow * 3;
        if (img.h == oh && img.w == ow) {
            std::memcpy(dst, img.data.data(), size_t(oh) * ow * 3);
        } else {
            resize_bilinear(img, oh, ow, dst);
        }
        ok.fetch_add(1);
    });
    return ok.load();
}

// Decode rgb+alpha JPEG pairs, resize both, composite onto a constant
// background (the dataset's apply_background_color,
// vhap/data/video_dataset.py:305-323), and emit float32 rgb in [0,1]
// plus float32 alpha in [0,1].
int fl_decode_composite_batch(const char** rgb_paths, const char** alpha_paths,
                              int n, float* out_rgb, float* out_alpha,
                              int oh, int ow, float bg_r, float bg_g,
                              float bg_b, int n_threads) {
    std::atomic<int> ok{0};
    const float bg[3] = {bg_r, bg_g, bg_b};
    parallel_for(n, n_threads, [&](int i) {
        Image rgb, alpha;
        if (!decode_jpeg(rgb_paths[i], &rgb) || rgb.c != 3) return;
        std::vector<uint8_t> rgb_r(size_t(oh) * ow * 3);
        if (rgb.h == oh && rgb.w == ow) {
            std::memcpy(rgb_r.data(), rgb.data.data(), rgb_r.size());
        } else {
            resize_bilinear(rgb, oh, ow, rgb_r.data());
        }

        bool has_alpha = alpha_paths && alpha_paths[i] && alpha_paths[i][0]
            && decode_jpeg(alpha_paths[i], &alpha);
        std::vector<uint8_t> a_r;
        if (has_alpha) {
            a_r.resize(size_t(oh) * ow * alpha.c);
            if (alpha.h == oh && alpha.w == ow) {
                std::memcpy(a_r.data(), alpha.data.data(), a_r.size());
            } else {
                resize_bilinear(alpha, oh, ow, a_r.data());
            }
        }

        float* dst = out_rgb + size_t(i) * oh * ow * 3;
        float* dsta = out_alpha ? out_alpha + size_t(i) * oh * ow : nullptr;
        for (size_t p = 0; p < size_t(oh) * ow; ++p) {
            float a = has_alpha
                ? a_r[p * alpha.c] * (1.0f / 255.0f) : 1.0f;
            for (int k = 0; k < 3; ++k) {
                float fg = rgb_r[p * 3 + k] * (1.0f / 255.0f);
                dst[p * 3 + k] = bg_r < 0.0f
                    ? fg                      // bg < 0 => no compositing
                    : a * fg + (1.0f - a) * bg[k];
            }
            if (dsta) dsta[p] = a;
        }
        ok.fetch_add(1);
    });
    return ok.load();
}

}  // extern "C"
