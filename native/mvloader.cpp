// Native data-loading kernels for the MV-Video training pipeline.
//
// Replaces the reference's decord C++ decoder + 32-worker DataLoader
// (train.py:391-410, animatediff/data/dataset.py:4,61):
//   * image sequences: parallel PNG/JPEG decode -> bilinear resize ->
//     [-1,1] float32;
//   * MP4/container clips: libavformat/libavcodec demux+decode with
//     swscale area-filtered resize (mv_decode_video), the direct decord
//     VideoReader.get_batch equivalent (dataset.py:61-65);
//   * mv_encode_video encodes synthetic clips (mpeg4) so tests can
//     round-trip without shipping binary fixtures.
// Called from Python via ctypes (the GIL is released for the whole batch,
// so a single Python prefetch thread overlaps decode with TPU steps).
//
// Build: make -C native   (g++ -O3 -shared, links system libpng/libjpeg/ffmpeg libs)

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
#include <algorithm>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libswscale/swscale.h>
}

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

// ---------------------------------------------------------------------------
// Video (MP4 etc.) via libavformat/libavcodec — the decord replacement's
// container half. Frames are decoded sequentially (no seeking: training
// clips are short, 48 frames, and stride sampling touches most of the clip
// anyway); each decoded frame that matches one or more wanted indices is
// sws_scale'd (area filter) straight to RGB24 at (size × size), then
// normalized to [-1, 1] float32.

struct VideoOut {
    float* out;       // (n_indices, size, size, 3)
    int size;
};

void normalize_rgb24(const uint8_t* rgb, int stride, int size, float* dst) {
    for (int y = 0; y < size; ++y) {
        const uint8_t* row = rgb + size_t(y) * stride;
        float* d = dst + size_t(y) * size * 3;
        for (int i = 0; i < size * 3; ++i)
            d[i] = row[i] * (2.0f / 255.0f) - 1.0f;
    }
}

}  // namespace

extern "C" {

// Decode the frames at `indices` (any order, duplicates allowed) from a
// video container into `out` (n_indices, size, size, 3) float32 in [-1, 1].
// Indices past the end of the stream clamp to the last decoded frame
// (mirrors the Python image-sequence clamp). Returns the number of index
// slots filled, or -1 when the file/codec cannot be opened.
int mv_decode_video(const char* path, const int* indices, int n_indices,
                    int size, float* out) {
    if (n_indices <= 0) return 0;
    int max_idx = 0;
    for (int i = 0; i < n_indices; ++i) max_idx = std::max(max_idx, indices[i]);

    AVFormatContext* fmt = nullptr;
    if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) return -1;
    if (avformat_find_stream_info(fmt, nullptr) < 0) {
        avformat_close_input(&fmt);
        return -1;
    }
    const AVCodec* dec = nullptr;
    int vstream = av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &dec, 0);
    if (vstream < 0 || !dec) {
        avformat_close_input(&fmt);
        return -1;
    }
    AVCodecContext* ctx = avcodec_alloc_context3(dec);
    if (!ctx || avcodec_parameters_to_context(
                    ctx, fmt->streams[vstream]->codecpar) < 0 ||
        avcodec_open2(ctx, dec, nullptr) < 0) {
        if (ctx) avcodec_free_context(&ctx);
        avformat_close_input(&fmt);
        return -1;
    }

    AVPacket* pkt = av_packet_alloc();
    AVFrame* frame = av_frame_alloc();
    SwsContext* sws = nullptr;
    std::vector<uint8_t> rgb(size_t(size) * size * 3);
    uint8_t* rgb_planes[4] = {rgb.data(), nullptr, nullptr, nullptr};
    int rgb_stride[4] = {size * 3, 0, 0, 0};
    std::vector<float> last(size_t(size) * size * 3, 0.0f);
    bool have_any = false;
    int frame_no = 0, filled = 0;

    auto handle_frame = [&]() {
        if (!sws) {
            sws = sws_getContext(frame->width, frame->height,
                                 (AVPixelFormat)frame->format, size, size,
                                 AV_PIX_FMT_RGB24,
                                 frame->width > size ? SWS_AREA : SWS_BILINEAR,
                                 nullptr, nullptr, nullptr);
        }
        bool wanted = frame_no <= max_idx;
        if (sws && wanted) {
            sws_scale(sws, frame->data, frame->linesize, 0, frame->height,
                      rgb_planes, rgb_stride);
            normalize_rgb24(rgb.data(), size * 3, size, last.data());
            have_any = true;
            for (int i = 0; i < n_indices; ++i) {
                if (indices[i] == frame_no) {
                    std::memcpy(out + size_t(i) * last.size(), last.data(),
                                last.size() * sizeof(float));
                    ++filled;
                }
            }
        }
        ++frame_no;
    };

    bool done = false;
    while (!done && av_read_frame(fmt, pkt) >= 0) {
        if (pkt->stream_index == vstream &&
            avcodec_send_packet(ctx, pkt) >= 0) {
            while (avcodec_receive_frame(ctx, frame) >= 0) handle_frame();
        }
        av_packet_unref(pkt);
        if (frame_no > max_idx) done = true;
    }
    if (!done) {  // drain
        avcodec_send_packet(ctx, nullptr);
        while (avcodec_receive_frame(ctx, frame) >= 0) handle_frame();
    }
    // clamp: any index past the stream end gets the last decoded frame
    if (have_any) {
        for (int i = 0; i < n_indices; ++i) {
            if (indices[i] >= frame_no) {
                std::memcpy(out + size_t(i) * last.size(), last.data(),
                            last.size() * sizeof(float));
                ++filled;
            }
        }
    }

    if (sws) sws_freeContext(sws);
    av_frame_free(&frame);
    av_packet_free(&pkt);
    avcodec_free_context(&ctx);
    avformat_close_input(&fmt);
    return filled;
}

// Number of decodable frames in a video container (len(VideoReader) parity,
// reference dataset.py:57). Returns -1 when the file cannot be opened.
int mv_video_frame_count(const char* path) {
    AVFormatContext* fmt = nullptr;
    if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) return -1;
    if (avformat_find_stream_info(fmt, nullptr) < 0) {
        avformat_close_input(&fmt);
        return -1;
    }
    const AVCodec* dec = nullptr;
    int vstream = av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &dec, 0);
    if (vstream < 0 || !dec) {
        avformat_close_input(&fmt);
        return -1;
    }
    // fast path: container metadata
    int64_t nb = fmt->streams[vstream]->nb_frames;
    if (nb > 0) {
        avformat_close_input(&fmt);
        return int(nb);
    }
    // slow path: decode and count
    AVCodecContext* ctx = avcodec_alloc_context3(dec);
    int n = -1;
    if (ctx && avcodec_parameters_to_context(
                   ctx, fmt->streams[vstream]->codecpar) >= 0 &&
        avcodec_open2(ctx, dec, nullptr) >= 0) {
        AVPacket* pkt = av_packet_alloc();
        AVFrame* frame = av_frame_alloc();
        n = 0;
        while (av_read_frame(fmt, pkt) >= 0) {
            if (pkt->stream_index == vstream &&
                avcodec_send_packet(ctx, pkt) >= 0)
                while (avcodec_receive_frame(ctx, frame) >= 0) ++n;
            av_packet_unref(pkt);
        }
        avcodec_send_packet(ctx, nullptr);
        while (avcodec_receive_frame(ctx, frame) >= 0) ++n;
        av_frame_free(&frame);
        av_packet_free(&pkt);
    }
    if (ctx) avcodec_free_context(&ctx);
    avformat_close_input(&fmt);
    return n;
}

// Encode (count, h, w, 3) uint8 RGB frames to an MP4 (mpeg4 codec) at `fps`.
// Test/tooling helper so clip round-trips need no binary fixtures. h and w
// must be even (yuv420p). Returns 0 on success, negative on failure.
int mv_encode_video(const char* path, const uint8_t* rgb, int count, int h,
                    int w, int fps) {
    if (count <= 0 || (h | w) & 1) return -2;
    AVFormatContext* fmt = nullptr;
    if (avformat_alloc_output_context2(&fmt, nullptr, nullptr, path) < 0 ||
        !fmt)
        return -1;
    const AVCodec* enc = avcodec_find_encoder(AV_CODEC_ID_MPEG4);
    if (!enc) enc = avcodec_find_encoder(fmt->oformat->video_codec);
    if (!enc) {
        avformat_free_context(fmt);
        return -1;
    }
    AVStream* st = avformat_new_stream(fmt, nullptr);
    AVCodecContext* ctx = avcodec_alloc_context3(enc);
    int rc = -1;
    SwsContext* sws = nullptr;
    AVFrame* yuv = nullptr;
    AVPacket* pkt = nullptr;
    do {
        if (!st || !ctx) break;
        ctx->width = w;
        ctx->height = h;
        ctx->time_base = AVRational{1, fps};
        ctx->framerate = AVRational{fps, 1};
        ctx->pix_fmt = AV_PIX_FMT_YUV420P;
        ctx->bit_rate = int64_t(24) * w * h * fps;  // generous: tests want fidelity
        ctx->qmin = 1;
        ctx->qmax = 2;
        ctx->gop_size = 8;
        if (fmt->oformat->flags & AVFMT_GLOBALHEADER)
            ctx->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
        if (avcodec_open2(ctx, enc, nullptr) < 0) break;
        if (avcodec_parameters_from_context(st->codecpar, ctx) < 0) break;
        st->time_base = ctx->time_base;
        if (!(fmt->oformat->flags & AVFMT_NOFILE) &&
            avio_open(&fmt->pb, path, AVIO_FLAG_WRITE) < 0)
            break;
        if (avformat_write_header(fmt, nullptr) < 0) break;

        sws = sws_getContext(w, h, AV_PIX_FMT_RGB24, w, h, AV_PIX_FMT_YUV420P,
                             SWS_BILINEAR, nullptr, nullptr, nullptr);
        yuv = av_frame_alloc();
        pkt = av_packet_alloc();
        if (!sws || !yuv || !pkt) break;
        yuv->format = AV_PIX_FMT_YUV420P;
        yuv->width = w;
        yuv->height = h;
        if (av_frame_get_buffer(yuv, 0) < 0) break;

        auto pump = [&](bool flush) {
            if (avcodec_send_frame(ctx, flush ? nullptr : yuv) < 0 && !flush)
                return false;
            while (avcodec_receive_packet(ctx, pkt) >= 0) {
                pkt->duration = 1;  // in ctx->time_base: one frame — without
                // this the muxer writes the LAST sample with duration 0 and
                // the demuxer never emits it back
                av_packet_rescale_ts(pkt, ctx->time_base, st->time_base);
                pkt->stream_index = st->index;
                av_interleaved_write_frame(fmt, pkt);
            }
            return true;
        };

        bool ok = true;
        for (int i = 0; i < count && ok; ++i) {
            av_frame_make_writable(yuv);
            const uint8_t* src[4] = {rgb + size_t(i) * h * w * 3, nullptr,
                                     nullptr, nullptr};
            int src_stride[4] = {w * 3, 0, 0, 0};
            sws_scale(sws, src, src_stride, 0, h, yuv->data, yuv->linesize);
            yuv->pts = i;
            ok = pump(false);
        }
        if (!ok) break;
        pump(true);
        av_write_trailer(fmt);
        rc = 0;
    } while (false);

    if (sws) sws_freeContext(sws);
    if (yuv) av_frame_free(&yuv);
    if (pkt) av_packet_free(&pkt);
    if (ctx) avcodec_free_context(&ctx);
    if (fmt) {
        if (!(fmt->oformat->flags & AVFMT_NOFILE) && fmt->pb)
            avio_closep(&fmt->pb);
        avformat_free_context(fmt);
    }
    return rc;
}

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
