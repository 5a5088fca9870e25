// relaxtpu native video decoder.
//
// In-process libavformat/libavcodec demux+decode with ffmpeg-select frame
// sampling semantics, replacing the reference's ffmpeg *subprocess* + PNG
// round-trip (reference: src/video_frames_extract.py:6-100 shells out twice
// per video and writes PNGs to disk).  Frames are written as BGR24 straight
// into a caller-provided (numpy) buffer, so the host->TPU path is
// file -> decoder -> uint8 host array -> device, with no intermediate
// encode/decode or filesystem traffic.
//
// The selected-frame rule matches ffmpeg's select='not(mod(n,interval))'
// exactly: frames are counted in decode order from 0 and kept when their
// index appears in the caller's (sorted) index list.
//
// Build: native/build.sh -> librelaxdecode.so; Python binding via ctypes
// (relaxtpu/io/native.py); the ctypes call releases the GIL, so host decode
// overlaps accelerator compute in the evaluator's prefetch threads.

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libavutil/pixdesc.h>
#include <libswscale/swscale.h>
}

#include <cstdint>
#include <cstdio>
#include <cstring>

namespace {

struct Decoder {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* codec = nullptr;
  SwsContext* sws = nullptr;
  SwsContext* sws_yuv = nullptr;
  int stream_index = -1;
  int width = 0;
  int height = 0;
  double fps = 0.0;
  int64_t nb_frames = 0;  // container hint; may be 0 for some formats
  int bitdepth = 0;       // bits per raw sample (ffprobe bits_per_raw_sample)
  int64_t bitrate = 0;    // stream bitrate, container fallback
  char pixfmt[64] = {0};  // pixel format name (e.g. "yuv420p")
};

}  // namespace

extern "C" {

void* relax_open(const char* path) {
  auto* d = new Decoder();
  if (avformat_open_input(&d->fmt, path, nullptr, nullptr) < 0) {
    delete d;
    return nullptr;
  }
  if (avformat_find_stream_info(d->fmt, nullptr) < 0) {
    avformat_close_input(&d->fmt);
    delete d;
    return nullptr;
  }
  d->stream_index =
      av_find_best_stream(d->fmt, AVMEDIA_TYPE_VIDEO, -1, -1, nullptr, 0);
  if (d->stream_index < 0) {
    avformat_close_input(&d->fmt);
    delete d;
    return nullptr;
  }
  AVStream* st = d->fmt->streams[d->stream_index];
  const AVCodec* dec = avcodec_find_decoder(st->codecpar->codec_id);
  d->codec = avcodec_alloc_context3(dec);
  avcodec_parameters_to_context(d->codec, st->codecpar);
  d->codec->thread_count = 0;  // auto
  if (avcodec_open2(d->codec, dec, nullptr) < 0) {
    avcodec_free_context(&d->codec);
    avformat_close_input(&d->fmt);
    delete d;
    return nullptr;
  }
  d->width = d->codec->width;
  d->height = d->codec->height;
  AVRational r = st->avg_frame_rate.num ? st->avg_frame_rate : st->r_frame_rate;
  d->fps = r.den ? static_cast<double>(r.num) / r.den : 0.0;
  d->nb_frames = st->nb_frames;
  // metadata parity with ffprobe stream=pix_fmt,bits_per_raw_sample,bit_rate
  // (reference extract_metadata_NR.py:28-51)
  AVPixelFormat pf = static_cast<AVPixelFormat>(st->codecpar->format);
  const char* pfname = av_get_pix_fmt_name(pf);
  if (pfname) snprintf(d->pixfmt, sizeof(d->pixfmt), "%s", pfname);
  d->bitdepth = st->codecpar->bits_per_raw_sample;
  if (d->bitdepth == 0) {
    const AVPixFmtDescriptor* desc = av_pix_fmt_desc_get(pf);
    if (desc && desc->nb_components > 0) d->bitdepth = desc->comp[0].depth;
  }
  d->bitrate = st->codecpar->bit_rate ? st->codecpar->bit_rate : d->fmt->bit_rate;
  return d;
}

// Open a raw .yuv elementary stream (LIVE-Qualcomm style): geometry, pixel
// format, and framerate must be supplied (reference passes -s/-pix_fmt/
// -framerate to ffmpeg, video_frames_extract.py:29-49).
void* relax_open_raw(const char* path, int width, int height,
                     const char* pixfmt, double fps) {
  auto* d = new Decoder();
  const AVInputFormat* ifmt = av_find_input_format("rawvideo");
  AVDictionary* opts = nullptr;
  char buf[64];
  snprintf(buf, sizeof(buf), "%dx%d", width, height);
  av_dict_set(&opts, "video_size", buf, 0);
  av_dict_set(&opts, "pixel_format", pixfmt && pixfmt[0] ? pixfmt : "yuv420p", 0);
  snprintf(buf, sizeof(buf), "%.6f", fps > 0 ? fps : 30.0);
  av_dict_set(&opts, "framerate", buf, 0);
  int rc = avformat_open_input(&d->fmt, path, ifmt, &opts);
  av_dict_free(&opts);
  if (rc < 0) {
    delete d;
    return nullptr;
  }
  if (avformat_find_stream_info(d->fmt, nullptr) < 0) {
    avformat_close_input(&d->fmt);
    delete d;
    return nullptr;
  }
  d->stream_index =
      av_find_best_stream(d->fmt, AVMEDIA_TYPE_VIDEO, -1, -1, nullptr, 0);
  AVStream* st = d->fmt->streams[d->stream_index];
  const AVCodec* dec = avcodec_find_decoder(st->codecpar->codec_id);
  d->codec = avcodec_alloc_context3(dec);
  avcodec_parameters_to_context(d->codec, st->codecpar);
  if (avcodec_open2(d->codec, dec, nullptr) < 0) {
    avcodec_free_context(&d->codec);
    avformat_close_input(&d->fmt);
    delete d;
    return nullptr;
  }
  d->width = d->codec->width;
  d->height = d->codec->height;
  d->fps = fps > 0 ? fps : 30.0;
  d->nb_frames = st->nb_frames;
  AVPixelFormat pf = static_cast<AVPixelFormat>(st->codecpar->format);
  const char* pfname = av_get_pix_fmt_name(pf);
  if (pfname) snprintf(d->pixfmt, sizeof(d->pixfmt), "%s", pfname);
  const AVPixFmtDescriptor* desc = av_pix_fmt_desc_get(pf);
  if (desc && desc->nb_components > 0) d->bitdepth = desc->comp[0].depth;
  return d;
}

int relax_info(void* handle, int* w, int* h, double* fps, int64_t* nframes) {
  auto* d = static_cast<Decoder*>(handle);
  if (!d) return -1;
  *w = d->width;
  *h = d->height;
  *fps = d->fps;
  *nframes = d->nb_frames;
  return 0;
}

// Extended stream metadata: pixel-format name, bit depth, bitrate.
int relax_info_ex(void* handle, char* pixfmt, int pixfmt_len, int* bitdepth,
                  int64_t* bitrate) {
  auto* d = static_cast<Decoder*>(handle);
  if (!d) return -1;
  if (pixfmt && pixfmt_len > 0) snprintf(pixfmt, pixfmt_len, "%s", d->pixfmt);
  if (bitdepth) *bitdepth = d->bitdepth;
  if (bitrate) *bitrate = d->bitrate;
  return 0;
}

// Decode frames whose decode-order index is in `indices` (sorted ascending,
// n entries); write BGR24 rows into `out` (n * height * width * 3 bytes).
// Returns the number of frames written (may be < n at stream end).
int64_t relax_decode_selected(void* handle, const int64_t* indices, int64_t n,
                              uint8_t* out) {
  auto* d = static_cast<Decoder*>(handle);
  if (!d || n <= 0) return 0;

  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  int64_t count = 0;   // decode-order frame counter
  int64_t next_i = 0;  // position in the index list
  int64_t written = 0;
  bool failed = false;  // unconvertible pixel format (sws_getContext null)
  const int64_t frame_bytes = static_cast<int64_t>(d->height) * d->width * 3;

  auto handle_frame = [&](AVFrame* f) {
    if (!failed && next_i < n && count == indices[next_i]) {
      if (!d->sws) {
        d->sws = sws_getContext(d->width, d->height,
                                static_cast<AVPixelFormat>(f->format),
                                d->width, d->height, AV_PIX_FMT_BGR24,
                                SWS_BILINEAR, nullptr, nullptr, nullptr);
      }
      if (!d->sws) {  // exotic source format swscale cannot convert:
        failed = true;  // fail cleanly instead of segfaulting in sws_scale
        return;
      }
      uint8_t* dst[1] = {out + written * frame_bytes};
      int dst_stride[1] = {d->width * 3};
      sws_scale(d->sws, f->data, f->linesize, 0, d->height, dst, dst_stride);
      ++written;
      ++next_i;
    }
    ++count;
  };

  while (!failed && next_i < n && av_read_frame(d->fmt, pkt) >= 0) {
    if (pkt->stream_index == d->stream_index) {
      if (avcodec_send_packet(d->codec, pkt) >= 0) {
        while (avcodec_receive_frame(d->codec, frame) >= 0) {
          handle_frame(frame);
        }
      }
    }
    av_packet_unref(pkt);
  }
  // drain
  avcodec_send_packet(d->codec, nullptr);
  while (!failed && next_i < n && avcodec_receive_frame(d->codec, frame) >= 0) {
    handle_frame(frame);
  }

  av_frame_free(&frame);
  av_packet_free(&pkt);
  return failed ? -1 : written;
}

// Decode selected frames as frame-contiguous I420 (per frame: H*W luma then
// (H/2)*(W/2) U then V — the standard I420 byte order) into ONE buffer of
// n * H*W*3/2 bytes.  This is the decoder-native layout at 1.5 bytes/px;
// one contiguous buffer means ONE host->device transfer for the whole stack
// (per-transfer round-trips dominate on tunneled links).  Sources in any
// other pixel format (yuvj420p full-range, 444, 10-bit, ...) are converted
// to limited-range yuv420p by swscale, so downstream BT.601-limited math
// stays correct.  Device-side unpack + conversion:
// relaxtpu.ops.colorspace.{unpack_i420, yuv420_to_bgr}.
int64_t relax_decode_selected_yuv(void* handle, const int64_t* indices,
                                  int64_t n, uint8_t* out) {
  auto* d = static_cast<Decoder*>(handle);
  if (!d || n <= 0) return 0;
  if ((d->width % 2) || (d->height % 2)) return -1;  // I420 needs even dims

  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  int64_t count = 0, next_i = 0, written = 0;
  bool failed = false;  // unconvertible pixel format (sws_getContext null)
  const int cw = d->width / 2, ch = d->height / 2;
  const int64_t y_bytes = static_cast<int64_t>(d->height) * d->width;
  const int64_t c_bytes = static_cast<int64_t>(ch) * cw;
  const int64_t frame_bytes = y_bytes + 2 * c_bytes;

  auto handle_frame = [&](AVFrame* f) {
    if (!failed && next_i < n && count == indices[next_i]) {
      auto src_fmt = static_cast<AVPixelFormat>(f->format);
      uint8_t* base = out + written * frame_bytes;
      uint8_t* dst[3] = {base, base + y_bytes, base + y_bytes + c_bytes};
      int dst_stride[3] = {d->width, cw, cw};
      if (src_fmt == AV_PIX_FMT_YUV420P) {
        // plane copy, no conversion
        for (int r = 0; r < d->height; ++r)
          memcpy(dst[0] + static_cast<int64_t>(r) * d->width,
                 f->data[0] + static_cast<int64_t>(r) * f->linesize[0], d->width);
        for (int p = 1; p <= 2; ++p)
          for (int r = 0; r < ch; ++r)
            memcpy(dst[p] + static_cast<int64_t>(r) * cw,
                   f->data[p] + static_cast<int64_t>(r) * f->linesize[p], cw);
      } else {
        if (!d->sws_yuv) {
          d->sws_yuv = sws_getContext(d->width, d->height, src_fmt, d->width,
                                      d->height, AV_PIX_FMT_YUV420P,
                                      SWS_BILINEAR, nullptr, nullptr, nullptr);
        }
        if (!d->sws_yuv) {  // fail cleanly: Python raises, caller falls back
          failed = true;    // to BGR ingest instead of segfaulting here
          return;
        }
        sws_scale(d->sws_yuv, f->data, f->linesize, 0, d->height, dst, dst_stride);
      }
      ++written;
      ++next_i;
    }
    ++count;
  };

  while (!failed && next_i < n && av_read_frame(d->fmt, pkt) >= 0) {
    if (pkt->stream_index == d->stream_index) {
      if (avcodec_send_packet(d->codec, pkt) >= 0) {
        while (avcodec_receive_frame(d->codec, frame) >= 0) handle_frame(frame);
      }
    }
    av_packet_unref(pkt);
  }
  avcodec_send_packet(d->codec, nullptr);
  while (!failed && next_i < n && avcodec_receive_frame(d->codec, frame) >= 0) {
    handle_frame(frame);
  }

  av_frame_free(&frame);
  av_packet_free(&pkt);
  return failed ? -1 : written;
}

void relax_close(void* handle) {
  auto* d = static_cast<Decoder*>(handle);
  if (!d) return;
  if (d->sws) sws_freeContext(d->sws);
  if (d->sws_yuv) sws_freeContext(d->sws_yuv);
  if (d->codec) avcodec_free_context(&d->codec);
  if (d->fmt) avformat_close_input(&d->fmt);
  delete d;
}

}  // extern "C"
