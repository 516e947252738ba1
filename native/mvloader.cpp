// Native data-loading kernels for the MV-Video training pipeline.
//
// Replaces the reference's decord C++ decoder + 32-worker DataLoader
// (train.py:391-410, animatediff/data/dataset.py:4,61) for image-sequence
// datasets: parallel PNG/JPEG decode -> bilinear resize -> [-1,1] float32,
// called from Python via ctypes (the GIL is released for the whole batch,
// so a single Python prefetch thread overlaps decode with TPU steps).
//
// Build: make -C native   (g++ -O3 -shared, links system libpng/libjpeg)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <csetjmp>
#include <atomic>

namespace {

struct Image {
    std::vector<uint8_t> rgb;  // H*W*3
    int h = 0, w = 0;
    bool ok = false;
};

Image decode_png(FILE* f) {
    Image im;
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                             nullptr, nullptr);
    if (!png) return im;
    png_infop info = png_create_info_struct(png);
    if (!info) {
        png_destroy_read_struct(&png, nullptr, nullptr);
        return im;
    }
    if (setjmp(png_jmpbuf(png))) {
        png_destroy_read_struct(&png, &info, nullptr);
        return im;
    }
    png_init_io(png, f);
    png_read_info(png, info);
    png_set_expand(png);            // palette/gray->8-bit
    png_set_strip_16(png);
    png_set_strip_alpha(png);       // conditioning frames: RGB over white? no —
                                    // training inputs are RGB; alpha dropped
    png_set_gray_to_rgb(png);
    png_read_update_info(png, info);
    im.w = png_get_image_width(png, info);
    im.h = png_get_image_height(png, info);
    im.rgb.resize(size_t(im.h) * im.w * 3);
    std::vector<png_bytep> rows(im.h);
    for (int y = 0; y < im.h; ++y) rows[y] = im.rgb.data() + size_t(y) * im.w * 3;
    png_read_image(png, rows.data());
    png_destroy_read_struct(&png, &info, nullptr);
    im.ok = true;
    return im;
}

Image decode_jpeg(FILE* f) {
    Image im;
    jpeg_decompress_struct cinfo;
    jpeg_error_mgr jerr;
    cinfo.err = jpeg_std_error(&jerr);
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, f);
    if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
        jpeg_destroy_decompress(&cinfo);
        return im;
    }
    cinfo.out_color_space = JCS_RGB;
    jpeg_start_decompress(&cinfo);
    im.w = cinfo.output_width;
    im.h = cinfo.output_height;
    im.rgb.resize(size_t(im.h) * im.w * 3);
    while (cinfo.output_scanline < cinfo.output_height) {
        uint8_t* row = im.rgb.data() + size_t(cinfo.output_scanline) * im.w * 3;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    im.ok = true;
    return im;
}

Image decode_file(const char* path) {
    Image im;
    FILE* f = std::fopen(path, "rb");
    if (!f) return im;
    uint8_t magic[4] = {0};
    if (std::fread(magic, 1, 4, f) != 4) {
        std::fclose(f);
        return im;
    }
    std::rewind(f);
    if (magic[0] == 0x89 && magic[1] == 'P') {
        im = decode_png(f);
    } else if (magic[0] == 0xFF && magic[1] == 0xD8) {
        im = decode_jpeg(f);
    }
    std::fclose(f);
    return im;
}

// area-average downscale + normalize (box filter — antialiased like PIL's
// adaptive downscale filters; exact for integer factors)
void downscale_normalize(const Image& im, int size, float* out) {
    const double sx = double(im.w) / size;
    const double sy = double(im.h) / size;
    for (int y = 0; y < size; ++y) {
        double fy0 = y * sy, fy1 = (y + 1) * sy;
        int iy0 = int(fy0), iy1 = int(fy1 - 1e-9);
        for (int x = 0; x < size; ++x) {
            double fx0 = x * sx, fx1 = (x + 1) * sx;
            int ix0 = int(fx0), ix1 = int(fx1 - 1e-9);
            double acc[3] = {0, 0, 0}, wsum = 0;
            for (int yy = iy0; yy <= iy1 && yy < im.h; ++yy) {
                double wy = 1.0;
                if (yy == iy0) wy -= fy0 - iy0;
                if (yy == iy1) wy -= (iy1 + 1) - fy1;
                for (int xx = ix0; xx <= ix1 && xx < im.w; ++xx) {
                    double wx = 1.0;
                    if (xx == ix0) wx -= fx0 - ix0;
                    if (xx == ix1) wx -= (ix1 + 1) - fx1;
                    const uint8_t* p = im.rgb.data() + (size_t(yy) * im.w + xx) * 3;
                    double w = wx * wy;
                    for (int c = 0; c < 3; ++c) acc[c] += w * p[c];
                    wsum += w;
                }
            }
            float* dst = out + (size_t(y) * size + x) * 3;
            for (int c = 0; c < 3; ++c)
                dst[c] = float(acc[c] / wsum) * (2.0f / 255.0f) - 1.0f;
        }
    }
}

// bilinear resize + normalize to [-1, 1], PIL-style half-pixel sampling
// (upscale path; downscale uses the antialiased box filter above)
void resize_normalize(const Image& im, int size, float* out) {
    if (im.w >= size && im.h >= size && (im.w != size || im.h != size)) {
        downscale_normalize(im, size, out);
        return;
    }
    const float sx = float(im.w) / size;
    const float sy = float(im.h) / size;
    for (int y = 0; y < size; ++y) {
        float fy = (y + 0.5f) * sy - 0.5f;
        int y0 = fy < 0 ? 0 : int(fy);
        int y1 = y0 + 1 < im.h ? y0 + 1 : im.h - 1;
        float wy = fy - y0;
        if (wy < 0) wy = 0;
        for (int x = 0; x < size; ++x) {
            float fx = (x + 0.5f) * sx - 0.5f;
            int x0 = fx < 0 ? 0 : int(fx);
            int x1 = x0 + 1 < im.w ? x0 + 1 : im.w - 1;
            float wx = fx - x0;
            if (wx < 0) wx = 0;
            const uint8_t* p00 = im.rgb.data() + (size_t(y0) * im.w + x0) * 3;
            const uint8_t* p01 = im.rgb.data() + (size_t(y0) * im.w + x1) * 3;
            const uint8_t* p10 = im.rgb.data() + (size_t(y1) * im.w + x0) * 3;
            const uint8_t* p11 = im.rgb.data() + (size_t(y1) * im.w + x1) * 3;
            float* dst = out + (size_t(y) * size + x) * 3;
            for (int c = 0; c < 3; ++c) {
                float v = (1 - wy) * ((1 - wx) * p00[c] + wx * p01[c]) +
                          wy * ((1 - wx) * p10[c] + wx * p11[c]);
                dst[c] = v * (2.0f / 255.0f) - 1.0f;
            }
        }
    }
}

}  // namespace

extern "C" {

// Decode `count` image files in parallel into `out` (count, size, size, 3)
// float32 in [-1, 1]. `paths` is a '\n'-joined byte string. Returns the
// number of successfully decoded files (failures leave zeros).
int mv_decode_images(const char* paths_joined, int count, int size,
                     int n_threads, float* out) {
    std::vector<std::string> paths;
    paths.reserve(count);
    const char* p = paths_joined;
    for (int i = 0; i < count; ++i) {
        const char* nl = std::strchr(p, '\n');
        size_t len = nl ? size_t(nl - p) : std::strlen(p);
        paths.emplace_back(p, len);
        p = nl ? nl + 1 : p + len;
    }
    if (n_threads < 1) n_threads = 1;
    std::vector<int> ok(count, 0);
    const size_t stride = size_t(size) * size * 3;
    std::vector<std::thread> workers;
    std::atomic_int next{0};
    for (int t = 0; t < n_threads; ++t) {
        workers.emplace_back([&]() {
            for (int i = next.fetch_add(1); i < count; i = next.fetch_add(1)) {
                Image im = decode_file(paths[i].c_str());
                if (!im.ok) {
                    std::memset(out + stride * i, 0, stride * sizeof(float));
                    continue;
                }
                resize_normalize(im, size, out + stride * i);
                ok[i] = 1;
            }
        });
    }
    for (auto& w : workers) w.join();
    int n_ok = 0;
    for (int v : ok) n_ok += v;
    return n_ok;
}

}  // extern "C"
