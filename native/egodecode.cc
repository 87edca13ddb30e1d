// egodecode: native video frame-extraction runtime for the TPU input
// pipeline.
//
// Replaces the reference's decord/OpenCV python readers
// (/root/reference/base/base_dataset.py:220-405) with a single C++
// random-access decoder: open -> seek -> decode -> swscale (short-side
// resize + center crop) -> tightly packed RGB24, so the Python host loop
// only moves fixed-size uint8 buffers. Exposed as a C ABI consumed via
// ctypes (egovlp_tpu/data/native.py).
//
// Build: make -C native (links libavformat/libavcodec/libavutil/libswscale).

#include <atomic>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <ctime>
#include <string>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libswscale/swscale.h>
}

namespace {

// Process-global per-phase profile counters (nanoseconds / event counts),
// read via ed_stats() from Python (scripts/decode_profile.py).  Atomics so
// the Loader's decode threads can accumulate concurrently; the per-frame
// overhead is two clock_gettime calls per phase (~50 ns each), invisible
// next to ms-scale decode work.
std::atomic<long long> g_open_ns{0}, g_seek_ns{0}, g_decode_ns{0},
    g_sws_ns{0};
std::atomic<long long> g_n_open{0}, g_n_seek{0}, g_n_frames_decoded{0},
    g_n_frames_out{0}, g_n_frames_skipped{0};

// Thread CPU time, not wall time: with many decode threads per core the
// wall numbers inflate by scheduler contention; CPU time is the honest
// per-phase cost (open is the exception — it includes disk I/O wait, but
// chunk files are page-cached in steady state).
struct PhaseTimer {
  struct timespec t0;
  PhaseTimer() { clock_gettime(CLOCK_THREAD_CPUTIME_ID, &t0); }
  long long ns() const {
    struct timespec t1;
    clock_gettime(CLOCK_THREAD_CPUTIME_ID, &t1);
    return (t1.tv_sec - t0.tv_sec) * 1000000000LL + (t1.tv_nsec - t0.tv_nsec);
  }
};

struct Decoder {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* codec = nullptr;
  int stream_index = -1;
  AVStream* stream = nullptr;
  AVFrame* frame = nullptr;
  AVPacket* pkt = nullptr;
  SwsContext* sws = nullptr;
  int sws_src_w = 0, sws_src_h = 0, sws_dst_w = 0, sws_dst_h = 0;
  AVPixelFormat sws_src_fmt = AV_PIX_FMT_NONE;
  int64_t frame_count = 0;
  double fps = 0.0;
  int64_t last_decoded_index = -2;  // for sequential fast path
  // NONREF skip-roll margin: stop skipping this many frames before the
  // target (see decode_to).  Derived per stream from the real reorder
  // depth at open; ED_SKIP_MARGIN overrides for A/B.
  int64_t skip_margin = 16;
  // Set once any decoded frame lacks a pts: frame indexing then falls back
  // to last_index+1, which UNDERCOUNTS frames the codec dropped — the
  // NONREF skip-roll would silently deliver a later frame as the target,
  // so skipping is permanently disabled for this stream.
  bool no_pts_seen = false;
  std::string error;
};

int64_t guess_frame_count(Decoder* d) {
  AVStream* st = d->stream;
  if (st->nb_frames > 0) return st->nb_frames;
  if (st->duration > 0 && d->fps > 0) {
    double secs = st->duration * av_q2d(st->time_base);
    return (int64_t)(secs * d->fps + 0.5);
  }
  if (d->fmt->duration > 0 && d->fps > 0) {
    double secs = (double)d->fmt->duration / AV_TIME_BASE;
    return (int64_t)(secs * d->fps + 0.5);
  }
  return 0;
}

}  // namespace

extern "C" {

void* ed_open(const char* path) {
  PhaseTimer pt;
  g_n_open.fetch_add(1, std::memory_order_relaxed);
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
  const AVCodec* dec = nullptr;
  d->stream_index =
      av_find_best_stream(d->fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &dec, 0);
  if (d->stream_index < 0 || !dec) {
    avformat_close_input(&d->fmt);
    delete d;
    return nullptr;
  }
  d->stream = d->fmt->streams[d->stream_index];
  d->codec = avcodec_alloc_context3(dec);
  avcodec_parameters_to_context(d->codec, d->stream->codecpar);
  d->codec->thread_count = 1;  // one decoder per worker thread
  if (avcodec_open2(d->codec, dec, nullptr) < 0) {
    avcodec_free_context(&d->codec);
    avformat_close_input(&d->fmt);
    delete d;
    return nullptr;
  }
  AVRational r = d->stream->avg_frame_rate.num ? d->stream->avg_frame_rate
                                               : d->stream->r_frame_rate;
  d->fps = r.den ? av_q2d(r) : 0.0;
  // The margin only has to cover the decode-order/display-order offset
  // (the packets already queued when the roll decision flips), which is
  // the stream's reorder depth — NOT the 16-frame H.264 reference-depth
  // worst case the fixed margin assumed.  r4 measured that with gop-30
  // corpora a 16-frame margin never engages (rolls average ~gop/2); the
  // overshoot-retry rail in seek_to makes an under-estimate lossless, so
  // the tight bound + 2 is safe.  ED_SKIP_MARGIN=<n> overrides for A/B.
  int reorder = d->codec->has_b_frames;
  if (d->stream->codecpar->video_delay > reorder)
    reorder = d->stream->codecpar->video_delay;
  d->skip_margin = (int64_t)reorder + 2;
  if (const char* env = getenv("ED_SKIP_MARGIN")) {
    // endptr check: a non-numeric value (ED_SKIP_MARGIN=auto, empty)
    // must fall through to the derived margin, not parse to 0 (the most
    // aggressive skip setting)
    char* end = nullptr;
    long v = strtol(env, &end, 10);
    if (end != env && *end == '\0' && v >= 0) d->skip_margin = v;
  }
  d->frame_count = guess_frame_count(d);
  d->frame = av_frame_alloc();
  d->pkt = av_packet_alloc();
  g_open_ns.fetch_add(pt.ns(), std::memory_order_relaxed);
  return d;
}

// Per-phase profile counters since process start (or last reset):
// out[0..3] = open/seek/decode/swscale seconds,
// out[4..7] = open/seek/decoded-frame/output-frame counts.
void ed_stats(double* out8) {
  out8[0] = g_open_ns.load(std::memory_order_relaxed) / 1e9;
  out8[1] = g_seek_ns.load(std::memory_order_relaxed) / 1e9;
  out8[2] = g_decode_ns.load(std::memory_order_relaxed) / 1e9;
  out8[3] = g_sws_ns.load(std::memory_order_relaxed) / 1e9;
  out8[4] = (double)g_n_open.load(std::memory_order_relaxed);
  out8[5] = (double)g_n_seek.load(std::memory_order_relaxed);
  out8[6] = (double)g_n_frames_decoded.load(std::memory_order_relaxed);
  out8[7] = (double)g_n_frames_out.load(std::memory_order_relaxed);
}

// ed_stats plus out[8] = frames skipped by the roll fast path
// (skip_frame = NONREF while far from the target).  Separate symbol so an
// old binding passing an 8-double buffer to ed_stats can never overflow.
void ed_stats9(double* out9) {
  ed_stats(out9);
  out9[8] = (double)g_n_frames_skipped.load(std::memory_order_relaxed);
}

void ed_stats_reset() {
  g_open_ns = g_seek_ns = g_decode_ns = g_sws_ns = 0;
  g_n_open = g_n_seek = g_n_frames_decoded = g_n_frames_out = 0;
  g_n_frames_skipped = 0;
}

void ed_close(void* h) {
  if (!h) return;
  auto* d = static_cast<Decoder*>(h);
  if (d->sws) sws_freeContext(d->sws);
  av_packet_free(&d->pkt);
  av_frame_free(&d->frame);
  avcodec_free_context(&d->codec);
  avformat_close_input(&d->fmt);
  delete d;
}

int64_t ed_frame_count(void* h) {
  return h ? static_cast<Decoder*>(h)->frame_count : -1;
}

double ed_fps(void* h) { return h ? static_cast<Decoder*>(h)->fps : 0.0; }

// Effective NONREF skip-roll margin for this stream (reorder depth + 2,
// or the validated ED_SKIP_MARGIN override) — exposed for tests.
int64_t ed_skip_margin(void* h) {
  return h ? static_cast<Decoder*>(h)->skip_margin : -1;
}

int ed_width(void* h) {
  return h ? static_cast<Decoder*>(h)->codec->width : -1;
}

int ed_height(void* h) {
  return h ? static_cast<Decoder*>(h)->codec->height : -1;
}

namespace {

// Decode forward until reaching target_index (frame counter based on
// presentation order after the last seek point).
//
// Roll fast path (lossless): frames decoded only to advance the stream
// from the seek keyframe to the target don't all need pixels — a
// NON-REFERENCE frame (typical B-frame) in the roll is by definition
// never used to predict any later frame, so telling the codec to skip it
// (skip_frame = AVDISCARD_NONREF) cannot change the target frame's bits.
// A reorder-depth margin before the target keeps the skip from eating the
// target itself if it happens to be a non-ref frame (per-stream
// `skip_margin` = real reorder depth + 2, set at open).
//
// Two safety rails (the margin alone is not sufficient):
//   * streams without per-frame pts fall back to last_index+1 counting,
//     which undercounts codec-dropped frames — skipping is disabled for
//     the rest of the stream the first time a pts-less frame appears;
//   * if the roll still lands PAST the target while frames were skipped
//     (e.g. reorder depth deeper than the 16-frame margin), the caller is
//     told to re-seek and retry with skipping off instead of accepting a
//     later frame as the target.
//
// Returns 1 on success, 0 on EOF/error, 2 if the skip-roll overshot the
// target (a skipped frame may have BEEN the target; re-seek + retry with
// allow_skip=false is lossless by construction).
int decode_to(Decoder* d, int64_t target_index, bool allow_skip) {
  PhaseTimer pt;
  const int64_t kSkipMargin = d->skip_margin;
  const AVDiscard kDefaultSkip = d->codec->skip_frame;
  long long skipped_this_roll = 0;
  bool skip_used = false;  // skip engaged at ANY point in this call
  // Current stream position in frames, derived from pts of last frame.
  while (true) {
    bool rolling = allow_skip && !d->no_pts_seen &&
                   d->last_decoded_index >= 0 &&
                   target_index - d->last_decoded_index > kSkipMargin;
    skip_used = skip_used || rolling;
    d->codec->skip_frame = rolling ? AVDISCARD_NONREF : kDefaultSkip;
    int ret = avcodec_receive_frame(d->codec, d->frame);
    if (ret == 0) {
      g_n_frames_decoded.fetch_add(1, std::memory_order_relaxed);
      int64_t idx;
      if (d->frame->pts != AV_NOPTS_VALUE && d->fps > 0) {
        double sec = d->frame->pts * av_q2d(d->stream->time_base);
        idx = (int64_t)(sec * d->fps + 0.5);
      } else {
        idx = d->last_decoded_index + 1;
        d->no_pts_seen = true;  // counting is now lossy: no more skipping
        if (skip_used) {
          // frames may already have been discarded this call and the
          // last+1 fallback cannot see the gap — hand the caller the
          // lossless re-seek-with-skip-off retry instead of counting on
          d->codec->skip_frame = kDefaultSkip;
          g_decode_ns.fetch_add(pt.ns(), std::memory_order_relaxed);
          return 2;
        }
      }
      // Gap accounting must not be gated on `rolling`: frames discarded
      // under the skip flag can surface as a pts jump on an iteration
      // where the roll has already flipped off (near the target) — those
      // still count toward the overshoot rail below.
      if (skip_used && idx > d->last_decoded_index + 1 &&
          d->last_decoded_index >= 0) {
        long long sk = idx - d->last_decoded_index - 1;
        skipped_this_roll += sk;
        g_n_frames_skipped.fetch_add(sk, std::memory_order_relaxed);
      }
      d->last_decoded_index = idx;
      if (idx >= target_index) {
        d->codec->skip_frame = kDefaultSkip;
        g_decode_ns.fetch_add(pt.ns(), std::memory_order_relaxed);
        return (idx > target_index && skipped_this_roll > 0) ? 2 : 1;
      }
      continue;
    }
    if (ret == AVERROR(EAGAIN)) {
      // feed more packets
      while (true) {
        int r2 = av_read_frame(d->fmt, d->pkt);
        if (r2 < 0) {
          avcodec_send_packet(d->codec, nullptr);  // flush
          break;
        }
        if (d->pkt->stream_index != d->stream_index) {
          av_packet_unref(d->pkt);
          continue;
        }
        int r3 = avcodec_send_packet(d->codec, d->pkt);
        av_packet_unref(d->pkt);
        if (r3 == 0 || r3 == AVERROR(EAGAIN)) break;
      }
      continue;
    }
    d->codec->skip_frame = kDefaultSkip;
    g_decode_ns.fetch_add(pt.ns(), std::memory_order_relaxed);
    // EOF with skip engaged is NOT a verdict: if the target was the last
    // (non-ref) frame of the stream, the skip itself ate it and the drain
    // hit EOF — return 2 so the caller redoes the roll losslessly with
    // skip off.  Only that retry's EOF is a real out-of-range failure.
    return skip_used ? 2 : 0;
  }
}

bool seek_to(Decoder* d, int64_t index) {
  if (index == d->last_decoded_index) return true;  // current frame cached
  bool allow_skip = true;
  // Sequential fast path: target is ahead and near; just decode forward.
  if (index > d->last_decoded_index &&
      index - d->last_decoded_index <= 64) {
    int rc = decode_to(d, index, allow_skip);
    if (rc == 1) return true;
    if (rc == 0) return false;
    allow_skip = false;  // skip-roll overshot: redo losslessly from keyframe
  }
  for (;;) {
    PhaseTimer pt;
    g_n_seek.fetch_add(1, std::memory_order_relaxed);
    double sec = d->fps > 0 ? index / d->fps : 0.0;
    int64_t ts = (int64_t)(sec / av_q2d(d->stream->time_base) + 0.5);
    if (av_seek_frame(d->fmt, d->stream_index, ts, AVSEEK_FLAG_BACKWARD) < 0) {
      g_seek_ns.fetch_add(pt.ns(), std::memory_order_relaxed);
      return false;
    }
    avcodec_flush_buffers(d->codec);
    d->last_decoded_index = -2;
    g_seek_ns.fetch_add(pt.ns(), std::memory_order_relaxed);
    int rc = decode_to(d, index, allow_skip);
    if (rc == 1) return true;
    if (rc == 0) return false;
    allow_skip = false;  // overshot while skipping: one lossless retry
  }
}

// Convert d->frame to RGB24 with short-side resize to `pre` and center
// crop pre x pre into out (pre*pre*3 bytes).
bool convert_frame(Decoder* d, int pre, uint8_t* out) {
  PhaseTimer pt;
  const int w = d->frame->width, h = d->frame->height;
  if (w <= 0 || h <= 0) return false;
  int sw, sh;
  if (w <= h) {
    sw = pre;
    sh = (int)((int64_t)h * pre / w);
  } else {
    sh = pre;
    sw = (int)((int64_t)w * pre / h);
  }
  if (!d->sws || d->sws_src_w != w || d->sws_src_h != h ||
      d->sws_dst_w != sw || d->sws_dst_h != sh ||
      d->sws_src_fmt != (AVPixelFormat)d->frame->format) {
    if (d->sws) sws_freeContext(d->sws);
    d->sws = sws_getContext(w, h, (AVPixelFormat)d->frame->format, sw, sh,
                            AV_PIX_FMT_RGB24, SWS_BILINEAR, nullptr, nullptr,
                            nullptr);
    d->sws_src_w = w;
    d->sws_src_h = h;
    d->sws_dst_w = sw;
    d->sws_dst_h = sh;
    d->sws_src_fmt = (AVPixelFormat)d->frame->format;
  }
  if (!d->sws) return false;

  // sws_scale's SIMD paths write whole aligned vectors per line; give the
  // destination a 64-byte-aligned stride plus tail padding or the last
  // line overruns the buffer (heap corruption).
  const size_t stride = ((size_t)sw * 3 + 63) & ~(size_t)63;
  std::vector<uint8_t> tmp(stride * sh + 64);
  uint8_t* dst_data[4] = {tmp.data(), nullptr, nullptr, nullptr};
  int dst_linesize[4] = {(int)stride, 0, 0, 0};
  sws_scale(d->sws, d->frame->data, d->frame->linesize, 0, h, dst_data,
            dst_linesize);

  const int x0 = (sw - pre) / 2, y0 = (sh - pre) / 2;
  for (int row = 0; row < pre; ++row) {
    std::memcpy(out + (size_t)row * pre * 3,
                tmp.data() + (size_t)(y0 + row) * stride + (size_t)x0 * 3,
                (size_t)pre * 3);
  }
  g_sws_ns.fetch_add(pt.ns(), std::memory_order_relaxed);
  g_n_frames_out.fetch_add(1, std::memory_order_relaxed);
  return true;
}

}  // namespace

// Read |n| frames by index into out [n, pre, pre, 3] (uint8, packed).
// Returns the number of successfully decoded frames; failed reads repeat
// the last good frame (the reference pads the same way,
// base_dataset.py:291-292). Indices must be non-decreasing for best
// performance but any order works.
int ed_read_frames(void* h, const int64_t* indices, int n, int pre,
                   uint8_t* out) {
  if (!h) return 0;
  auto* d = static_cast<Decoder*>(h);
  const size_t frame_bytes = (size_t)pre * pre * 3;
  int ok = 0;
  for (int i = 0; i < n; ++i) {
    int64_t idx = indices[i];
    if (d->frame_count > 0 && idx >= d->frame_count)
      idx = d->frame_count - 1;
    if (idx < 0) idx = 0;
    bool good = seek_to(d, idx) && convert_frame(d, pre, out + i * frame_bytes);
    if (!good) {
      if (i > 0) {
        std::memcpy(out + i * frame_bytes, out + (i - 1) * frame_bytes,
                    frame_bytes);
      } else {
        std::memset(out + i * frame_bytes, 0, frame_bytes);
      }
    } else {
      ++ok;
    }
  }
  return ok;
}

// ---------------------------------------------------------------------------
// Test-support encoder.  The environment has no ffmpeg CLI and cv2 can only
// produce B-frame-free mpeg4 streams, so decoder tests could never exercise
// the reorder/skip paths (pts-based indexing with B-frames, the
// skip_frame=NONREF roll).  This encodes caller-provided RGB24 frames with a
// chosen GOP size and B-frame count via libavcodec's mpeg4 encoder — enough
// to build real reordered streams for fixtures.  Returns 0 on success.

int ed_encode_video(const char* path, const uint8_t* rgb, int n, int w,
                    int h, double fps, int gop, int max_b_frames) {
  AVFormatContext* fmt = nullptr;
  if (avformat_alloc_output_context2(&fmt, nullptr, nullptr, path) < 0 ||
      !fmt)
    return -1;
  const AVCodec* enc = avcodec_find_encoder(AV_CODEC_ID_MPEG4);
  if (!enc) {
    avformat_free_context(fmt);
    return -2;
  }
  AVStream* st = avformat_new_stream(fmt, enc);
  AVCodecContext* c = st ? avcodec_alloc_context3(enc) : nullptr;
  if (!st || !c) {
    avcodec_free_context(&c);
    avformat_free_context(fmt);
    return -4;
  }
  c->width = w;
  c->height = h;
  c->pix_fmt = AV_PIX_FMT_YUV420P;
  c->time_base = AVRational{100, (int)(fps * 100 + 0.5)};
  c->gop_size = gop;
  c->max_b_frames = max_b_frames;
  c->bit_rate = (int64_t)w * h * 8 * (int)fps;  // generous; content fidelity
  if (fmt->oformat->flags & AVFMT_GLOBALHEADER)
    c->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  int rc = -3;
  SwsContext* sws = nullptr;
  AVFrame* fr = nullptr;
  AVPacket* pkt = nullptr;
  if (avcodec_open2(c, enc, nullptr) < 0) goto done;
  if (avcodec_parameters_from_context(st->codecpar, c) < 0) goto done;
  st->time_base = c->time_base;
  if (!(fmt->oformat->flags & AVFMT_NOFILE) &&
      avio_open(&fmt->pb, path, AVIO_FLAG_WRITE) < 0)
    goto done;
  if (avformat_write_header(fmt, nullptr) < 0) goto done;

  sws = sws_getContext(w, h, AV_PIX_FMT_RGB24, w, h, AV_PIX_FMT_YUV420P,
                       SWS_BILINEAR, nullptr, nullptr, nullptr);
  fr = av_frame_alloc();
  pkt = av_packet_alloc();
  fr->format = AV_PIX_FMT_YUV420P;
  fr->width = w;
  fr->height = h;
  if (av_frame_get_buffer(fr, 0) < 0 || !sws) goto done;

  for (int i = 0; i <= n; ++i) {
    AVFrame* send = nullptr;
    if (i < n) {
      av_frame_make_writable(fr);
      const uint8_t* src[1] = {rgb + (size_t)i * w * h * 3};
      const int src_ls[1] = {w * 3};
      sws_scale(sws, src, src_ls, 0, h, fr->data, fr->linesize);
      fr->pts = i;
      send = fr;
    }
    if (avcodec_send_frame(c, send) < 0) goto done;  // null = flush
    while (true) {
      int r = avcodec_receive_packet(c, pkt);
      if (r == AVERROR(EAGAIN) || r == AVERROR_EOF) break;
      if (r < 0) goto done;
      av_packet_rescale_ts(pkt, c->time_base, st->time_base);
      pkt->stream_index = st->index;
      if (av_interleaved_write_frame(fmt, pkt) < 0) goto done;
    }
  }
  if (av_write_trailer(fmt) < 0) goto done;
  rc = 0;

done:
  if (sws) sws_freeContext(sws);
  av_frame_free(&fr);
  av_packet_free(&pkt);
  avcodec_free_context(&c);
  if (fmt && !(fmt->oformat->flags & AVFMT_NOFILE) && fmt->pb)
    avio_closep(&fmt->pb);
  avformat_free_context(fmt);
  return rc;
}

}  // extern "C"
