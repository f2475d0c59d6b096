// Native video decode shim for the offline preprocessing stage.
//
// Replaces the reference's cv2-based frame loop + thread/queue pipeline
// (reference: src/preprocessing/prefetch_loader.py:50-76 InputGen,
// :93-115 threaded feeders): libavformat/libavcodec demux+decode,
// libswscale resize + RGB24 conversion, exposed through a minimal C ABI
// consumed via ctypes (sasvqa_tpu/data/video_decode.py).
//
// Also covers the PTS-window selective decode behavior of the
// reference's PyAV path (src/datasets/decoder.py:105-200) via
// vd_read_window's seek + bounded decode.
//
// Build: make -C native   (produces libvideodecode.so)

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libswscale/swscale.h>
}

#include <cstdint>
#include <cstring>
#include <memory>

namespace {

struct Decoder {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* codec = nullptr;
  SwsContext* sws = nullptr;
  int stream_index = -1;
  int sws_w = 0, sws_h = 0;
  // sequential-read state (vd_read_frames_seq): decoded-frame counter for
  // the keep-every-interval-th rule, and whether the EOF flush packet has
  // been sent (sending it twice is an error on some codecs)
  int64_t seen = 0;
  bool sent_eof = false;
};

int open_stream(Decoder* d, const char* path) {
  if (avformat_open_input(&d->fmt, path, nullptr, nullptr) < 0) return -1;
  if (avformat_find_stream_info(d->fmt, nullptr) < 0) return -2;
  d->stream_index =
      av_find_best_stream(d->fmt, AVMEDIA_TYPE_VIDEO, -1, -1, nullptr, 0);
  if (d->stream_index < 0) return -3;
  AVStream* st = d->fmt->streams[d->stream_index];
  const AVCodec* dec = avcodec_find_decoder(st->codecpar->codec_id);
  if (!dec) return -4;
  d->codec = avcodec_alloc_context3(dec);
  if (!d->codec) return -5;
  if (avcodec_parameters_to_context(d->codec, st->codecpar) < 0) return -6;
  if (avcodec_open2(d->codec, dec, nullptr) < 0) return -7;
  return 0;
}

bool ensure_sws(Decoder* d, int out_w, int out_h) {
  if (d->sws && d->sws_w == out_w && d->sws_h == out_h) return true;
  if (d->sws) sws_freeContext(d->sws);
  d->sws = sws_getContext(d->codec->width, d->codec->height,
                          d->codec->pix_fmt, out_w, out_h, AV_PIX_FMT_RGB24,
                          SWS_BILINEAR, nullptr, nullptr, nullptr);
  d->sws_w = out_w;
  d->sws_h = out_h;
  return d->sws != nullptr;
}

}  // namespace

extern "C" {

void* vd_open(const char* path) {
  auto* d = new Decoder();
  if (open_stream(d, path) != 0) {
    // open_stream can fail partway (e.g. avcodec_open2 on a corrupt
    // file) with fmt/codec contexts already allocated — free them like
    // vd_close would, or every bad video in a dataset leaks both
    if (d->codec) avcodec_free_context(&d->codec);
    if (d->fmt) avformat_close_input(&d->fmt);
    delete d;
    return nullptr;
  }
  return d;
}

void vd_close(void* handle) {
  auto* d = static_cast<Decoder*>(handle);
  if (!d) return;
  if (d->sws) sws_freeContext(d->sws);
  if (d->codec) avcodec_free_context(&d->codec);
  if (d->fmt) avformat_close_input(&d->fmt);
  delete d;
}

// width/height of the coded stream; fps as a double; nb_frames may be 0
// when the container does not record it.
int vd_info(void* handle, int* width, int* height, double* fps,
            int64_t* nb_frames) {
  auto* d = static_cast<Decoder*>(handle);
  if (!d) return -1;
  AVStream* st = d->fmt->streams[d->stream_index];
  *width = d->codec->width;
  *height = d->codec->height;
  AVRational r = st->avg_frame_rate.num ? st->avg_frame_rate : st->r_frame_rate;
  *fps = r.den ? static_cast<double>(r.num) / r.den : 0.0;
  *nb_frames = st->nb_frames;
  return 0;
}

namespace {

// Pull-model decode: receive-first loop that returns the moment the
// output buffer fills WITHOUT dropping frames — any frames the codec
// has already decoded but not yet surrendered stay buffered inside the
// codec until the next call, which makes back-to-back calls a lossless
// chunked stream (vd_read_frames_seq).  The old feed-first loop drained
// whole packets into a full buffer and lost the surplus.
int read_some(Decoder* d, int interval, int max_frames, int out_w,
              int out_h, uint8_t* out) {
  if (!ensure_sws(d, out_w, out_h)) return -2;
  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  int written = 0;
  int errors = 0;
  const int frame_bytes = out_w * out_h * 3;
  uint8_t* planes[1];
  int strides[1] = {out_w * 3};

  while (written < max_frames) {
    int ret = avcodec_receive_frame(d->codec, frame);
    if (ret == 0) {
      if (d->seen % interval == 0) {
        planes[0] = out + static_cast<int64_t>(written) * frame_bytes;
        sws_scale(d->sws, frame->data, frame->linesize, 0,
                  d->codec->height, planes, strides);
        ++written;
      }
      ++d->seen;
      continue;
    }
    if (ret == AVERROR_EOF) break;
    if (ret != AVERROR(EAGAIN)) {
      // mid-stream decode error (e.g. one corrupted GOP): skip it and
      // keep feeding packets — cv2's read loop likewise ignores bad
      // frames instead of truncating the stream at the first error.
      // Cannot spin: the feed path below consumes a packet or reaches
      // EOF every iteration; the counter bounds pathological codecs.
      if (++errors > 4096 || d->sent_eof) break;
    }
    // codec wants input
    if (d->sent_eof) break;
    if (av_read_frame(d->fmt, pkt) < 0) {
      avcodec_send_packet(d->codec, nullptr);  // start the EOF flush
      d->sent_eof = true;
      continue;
    }
    if (pkt->stream_index == d->stream_index)
      avcodec_send_packet(d->codec, pkt);
    av_packet_unref(pkt);
  }

  av_frame_free(&frame);
  av_packet_free(&pkt);
  return written;
}

}  // namespace

// Sequentially decode, keep every `interval`-th frame, scale to
// (out_w, out_h) RGB24 into `out` (capacity max_frames*out_h*out_w*3).
// Returns the number of frames written, or <0 on error.
// Mirrors the keep-every-intv-th loop of the reference InputGen
// (prefetch_loader.py:57-67).  Always restarts from the first frame;
// use vd_read_frames_seq for lossless chunked continuation.
int vd_read_frames(void* handle, int interval, int max_frames, int out_w,
                   int out_h, uint8_t* out) {
  auto* d = static_cast<Decoder*>(handle);
  if (!d || interval < 1 || max_frames < 1) return -1;
  // rewind: a handle previously drained by read_frames/read_window would
  // otherwise resume at EOF and return 0 frames, silently diverging from
  // the stateless cv2 fallback (fresh VideoCapture per call).  Best
  // effort — unseekable streams keep the old first-call-only behavior.
  AVStream* rst = d->fmt->streams[d->stream_index];
  int64_t first_ts =
      rst->start_time != AV_NOPTS_VALUE ? rst->start_time : 0;
  if (av_seek_frame(d->fmt, d->stream_index, first_ts,
                    AVSEEK_FLAG_BACKWARD) >= 0)
    avcodec_flush_buffers(d->codec);
  d->seen = 0;
  d->sent_eof = false;
  return read_some(d, interval, max_frames, out_w, out_h, out);
}

// Continue decoding from the current stream position (chunked reads for
// bounded memory: decode a long video at native resolution without ever
// buffering it whole).  First call after vd_open starts at frame 0; the
// keep-every-interval-th counter carries across calls.  Returns 0 at
// EOF, <0 on error.
int vd_read_frames_seq(void* handle, int interval, int max_frames,
                       int out_w, int out_h, uint8_t* out) {
  auto* d = static_cast<Decoder*>(handle);
  if (!d || interval < 1 || max_frames < 1) return -1;
  return read_some(d, interval, max_frames, out_w, out_h, out);
}

// Selective window decode: seek near start_sec, decode until end_sec,
// keep up to max_frames frames evenly (every `interval`-th decoded frame
// inside the window).  PTS-window behavior of the reference PyAV path
// (decoder.py:105-200).
int vd_read_window(void* handle, double start_sec, double end_sec,
                   int interval, int max_frames, int out_w, int out_h,
                   uint8_t* out) {
  auto* d = static_cast<Decoder*>(handle);
  if (!d || interval < 1 || max_frames < 1) return -1;
  if (!ensure_sws(d, out_w, out_h)) return -2;
  AVStream* st = d->fmt->streams[d->stream_index];
  double tb = av_q2d(st->time_base);
  // window times are STREAM-RELATIVE (matching the cv2 fallback's
  // CAP_PROP_POS_MSEC clock): containers with edit lists / leading audio
  // have nonzero start_time, which must offset both the seek target and
  // the per-frame timestamps or the window silently shifts
  int64_t start_off =
      st->start_time != AV_NOPTS_VALUE ? st->start_time : 0;
  int64_t start_ts = static_cast<int64_t>(start_sec / tb) + start_off;
  av_seek_frame(d->fmt, d->stream_index, start_ts, AVSEEK_FLAG_BACKWARD);
  avcodec_flush_buffers(d->codec);
  d->sent_eof = false;  // flush_buffers resets codec draining state

  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  int written = 0;
  int64_t seen = 0;
  const int frame_bytes = out_w * out_h * 3;
  uint8_t* planes[1];
  int strides[1] = {out_w * 3};
  bool past_end = false;

  double last_t = start_sec;  // monotonic fallback for NOPTS frames
  auto consume = [&](AVFrame* f) {
    double t = f->best_effort_timestamp == AV_NOPTS_VALUE
                   ? last_t  // unknown pts: assume it follows its
                             // neighbor rather than dropping the frame
                   : (f->best_effort_timestamp - start_off) * tb;
    last_t = t;
    if (t > end_sec) {
      past_end = true;
      return;
    }
    if (t >= start_sec) {
      if (seen % interval == 0 && written < max_frames) {
        planes[0] = out + static_cast<int64_t>(written) * frame_bytes;
        sws_scale(d->sws, f->data, f->linesize, 0, d->codec->height,
                  planes, strides);
        ++written;
      }
      ++seen;
    }
  };

  while (!past_end && written < max_frames &&
         av_read_frame(d->fmt, pkt) >= 0) {
    if (pkt->stream_index == d->stream_index &&
        avcodec_send_packet(d->codec, pkt) == 0) {
      while (!past_end && avcodec_receive_frame(d->codec, frame) == 0)
        consume(frame);
    }
    av_packet_unref(pkt);
  }
  // drain the codec at EOF like vd_read_frames: B-frame reorder delay
  // keeps the last few decoded frames buffered, and windows reaching
  // the end of the stream would silently lose them otherwise
  if (!past_end) {
    avcodec_send_packet(d->codec, nullptr);
    while (!past_end && written < max_frames &&
           avcodec_receive_frame(d->codec, frame) == 0)
      consume(frame);
  }
  av_frame_free(&frame);
  av_packet_free(&pkt);
  return written;
}

}  // extern "C"
