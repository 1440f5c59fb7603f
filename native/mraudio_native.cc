// mraudio_tpu native decode library (libav-based).
//
// Re-provides the decode capability the reference gets from decord
// (seekable video decode, fps/frame-count probe, batched frame gather at
// arbitrary indices, resize at decode time — processors/alpro_processors.py)
// and from ffmpeg-python (sub-clip extraction, audio demux —
// utils/mr_dataset.py, LAVIS BeatsAudioProcessor), as a small C API bound
// from Python via ctypes.
//
// Design notes:
//  * frame gather decodes sequentially between sorted targets and seeks
//    only when the gap to the next target is large — the uniform-sampling
//    access pattern of this workload (60 indices over a few thousand
//    frames) makes keyframe-seek-per-index slower than smart skipping;
//  * sub-clip extraction is a seek window at decode time ([start,end)
//    seconds), fixing the reference's misuse of the *spatial* crop filter
//    for temporal clipping;
//  * scaling to the target (H, W) happens inside the decode loop via
//    swscale, so only H*W*3 uint8 per frame crosses into Python;
//  * a tiny encoder (write_test_video / write_test_audio) exists so tests
//    can fabricate real media files without an ffmpeg binary.

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libswresample/swresample.h>
#include <libswscale/swscale.h>
}

#include <algorithm>
#include <cstring>
#include <string>
#include <vector>

namespace {

thread_local std::string g_error;

void set_error(const std::string& msg) { g_error = msg; }

struct VideoReader {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* codec = nullptr;
  int stream_index = -1;

  ~VideoReader() {
    if (codec) avcodec_free_context(&codec);
    if (fmt) avformat_close_input(&fmt);
  }

  bool open(const char* path) {
    if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) {
      set_error(std::string("cannot open ") + path);
      return false;
    }
    if (avformat_find_stream_info(fmt, nullptr) < 0) {
      set_error("no stream info");
      return false;
    }
    const AVCodec* dec = nullptr;
    stream_index = av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &dec, 0);
    if (stream_index < 0 || !dec) {
      set_error("no video stream");
      return false;
    }
    codec = avcodec_alloc_context3(dec);
    avcodec_parameters_to_context(codec, fmt->streams[stream_index]->codecpar);
    codec->thread_count = 2;
    if (avcodec_open2(codec, dec, nullptr) < 0) {
      set_error("cannot open video decoder");
      return false;
    }
    return true;
  }

  AVStream* stream() { return fmt->streams[stream_index]; }

  double fps() {
    AVRational r = stream()->avg_frame_rate;
    if (r.num == 0 || r.den == 0) r = stream()->r_frame_rate;
    return r.den ? static_cast<double>(r.num) / r.den : 0.0;
  }

  // Rate for pts -> frame-number math.  avg_frame_rate is
  // nb_frames/duration where mp4 duration excludes the last frame's
  // display time, so it overshoots by ~1/duration — integrated over a
  // long video that drifts a full frame.  r_frame_rate comes from pts
  // deltas and is exact for constant-frame-rate streams.
  double index_rate() {
    AVRational r = stream()->r_frame_rate;
    if (r.num == 0 || r.den == 0) r = stream()->avg_frame_rate;
    return r.den ? static_cast<double>(r.num) / r.den : 0.0;
  }

  int64_t num_frames() {
    int64_t n = stream()->nb_frames;
    if (n > 0) return n;
    // estimate from duration
    double dur = 0.0;
    if (stream()->duration > 0)
      dur = stream()->duration * av_q2d(stream()->time_base);
    else if (fmt->duration > 0)
      dur = static_cast<double>(fmt->duration) / AV_TIME_BASE;
    return static_cast<int64_t>(dur * fps());
  }
};

}  // namespace

extern "C" {

const char* mr_last_error() { return g_error.c_str(); }

// Probe: fill num_frames and fps. Returns 0 on success.
int mr_probe(const char* path, long long* num_frames, double* fps) {
  VideoReader r;
  if (!r.open(path)) return -1;
  *num_frames = r.num_frames();
  *fps = r.fps();
  return 0;
}

// Decode |n| frames at |indices| (frame numbers relative to the
// [start,end) sub-clip when start>=0), scaled to (h, w), written
// consecutively into |out|.  |i420| selects the output pixel format:
// 0 = RGB24 (h*w*3 bytes/frame); 1 = I420 planes (h*w*3/2 bytes/frame:
// Y[h][w] then U,V[h/2][w/2] contiguous — the codec's native 4:2:0
// layout, HALF the bytes of RGB and no chroma upsample on the host;
// the device reconstructs RGB, ops/image.py::yuv420_to_rgb).
static int decode_frames_impl(const char* path, const long long* indices,
                              int n, int h, int w, double start, double end,
                              unsigned char* out, bool i420) {
  const size_t frame_bytes = i420 ? static_cast<size_t>(h) * w * 3 / 2
                                  : static_cast<size_t>(h) * w * 3;
  VideoReader r;
  if (!r.open(path)) return -1;

  // Sort targets, remember destination slots.
  std::vector<std::pair<long long, int>> targets(n);
  for (int i = 0; i < n; ++i) targets[i] = {indices[i], i};
  std::sort(targets.begin(), targets.end());

  const double fps = r.fps();
  const int64_t base_frame =
      start >= 0 ? static_cast<int64_t>(start * fps + 0.5) : 0;
  const int64_t limit_frame =
      end >= 0 ? static_cast<int64_t>(end * fps + 0.5) : INT64_MAX;

  AVStream* st = r.stream();
  SwsContext* sws = nullptr;
  AVFrame* frame = av_frame_alloc();
  AVPacket* pkt = av_packet_alloc();

  int64_t next_decode_frame = 0;  // absolute frame number of next decoded output
  size_t ti = 0;
  bool failed = false;
  // Gap-seek state: |seek_backstep| tracks how far behind the requested
  // frame the demuxer's keyframe seek lands (~ the GOP length of this
  // file).  Between targets, decoding every intermediate frame costs
  // gap*decode; seeking costs ~backstep*decode — so once the gap exceeds
  // the observed backstep (plus slack for the seek itself) a seek wins.
  // This is what makes sparse uniform sampling (60 frames out of
  // thousands) cost O(n_frms * GOP) instead of O(video length).
  int64_t seek_backstep = 0;
  bool seek_pending = false;
  int64_t seek_target = -1;

  const double idx_rate = r.index_rate() > 0 ? r.index_rate() : fps;

  auto seek_to = [&](int64_t abs_target) {
    double t = abs_target / idx_rate;
    int64_t ts = static_cast<int64_t>(t / av_q2d(st->time_base));
    if (av_seek_frame(r.fmt, r.stream_index, ts, AVSEEK_FLAG_BACKWARD) >= 0) {
      avcodec_flush_buffers(r.codec);
      next_decode_frame = -1;  // unknown until first pts
      seek_pending = true;
      seek_target = abs_target;
      return true;
    }
    return false;
  };

  // Seek near the first target if it is far into the file.
  {
    int64_t first_abs = base_frame + targets[0].first;
    if (first_abs > 0 && fps > 0) seek_to(first_abs);
  }

  // Deliver the target frame: normally the exact index; after a seek
  // that lands past it (pts rounding), the first frame at-or-after.
  auto deliver = [&](AVFrame* f, int64_t abs_frame) {
    while (ti < targets.size() &&
           base_frame + targets[ti].first <= abs_frame) {
      if (base_frame + targets[ti].first < abs_frame && !seek_pending)
        break;  // sequential decode cannot have skipped a frame
      if (!sws) {
        // i420: YUV->YUV plane scaling only — the codec's limited-range
        // values pass through untouched (the wire convention is
        // limited-range BT.601; the device applies the 16..235/16..240
        // expansion during RGB reconstruction, ops/image.py).
        sws = sws_getContext(f->width, f->height, (AVPixelFormat)f->format, w,
                             h, i420 ? AV_PIX_FMT_YUV420P : AV_PIX_FMT_RGB24,
                             SWS_BILINEAR, nullptr, nullptr, nullptr);
      }
      unsigned char* base = out + targets[ti].second * frame_bytes;
      if (i420) {
        uint8_t* dst[3] = {base, base + static_cast<size_t>(h) * w,
                           base + static_cast<size_t>(h) * w +
                               static_cast<size_t>(h / 2) * (w / 2)};
        int dst_stride[3] = {w, w / 2, w / 2};
        sws_scale(sws, f->data, f->linesize, 0, f->height, dst, dst_stride);
      } else {
        uint8_t* dst[1] = {base};
        int dst_stride[1] = {w * 3};
        sws_scale(sws, f->data, f->linesize, 0, f->height, dst, dst_stride);
      }
      ++ti;
    }
  };

  while (ti < targets.size()) {
    // Gap-seek: the next target is far ahead of the decode position —
    // jump to its preceding keyframe instead of decoding through.
    if (next_decode_frame >= 0 && fps > 0) {
      int64_t gap = base_frame + targets[ti].first - next_decode_frame;
      // Unknown GOP: try a seek once the gap exceeds ~1s of frames; the
      // observed backstep then calibrates the real break-even point.
      int64_t threshold =
          seek_backstep > 0 ? 2 * seek_backstep + 16
                            : std::max<int64_t>(static_cast<int64_t>(fps), 16);
      if (gap > threshold) seek_to(base_frame + targets[ti].first);
    }
    if (av_read_frame(r.fmt, pkt) < 0) break;
    if (pkt->stream_index != r.stream_index) {
      av_packet_unref(pkt);
      continue;
    }
    if (avcodec_send_packet(r.codec, pkt) < 0) {
      av_packet_unref(pkt);
      continue;
    }
    av_packet_unref(pkt);
    while (avcodec_receive_frame(r.codec, frame) >= 0) {
      int64_t abs_frame;
      if (next_decode_frame < 0) {
        // derive frame number from pts after a seek
        double t = frame->best_effort_timestamp * av_q2d(st->time_base);
        abs_frame = static_cast<int64_t>(t * idx_rate + 0.5);
        if (seek_pending && abs_frame <= seek_target)
          seek_backstep = std::max(seek_backstep, seek_target - abs_frame);
      } else {
        abs_frame = next_decode_frame;
      }
      next_decode_frame = abs_frame + 1;
      if (abs_frame >= limit_frame) break;
      deliver(frame, abs_frame);
      if (seek_pending && abs_frame >= seek_target) seek_pending = false;
    }
  }
  // flush decoder (frame-threaded decode holds frames back by a packet,
  // so a seek near EOF can surface its frames only here — derive the
  // index from pts exactly as the main loop does)
  avcodec_send_packet(r.codec, nullptr);
  while (ti < targets.size() && avcodec_receive_frame(r.codec, frame) >= 0) {
    int64_t abs_frame;
    if (next_decode_frame < 0) {
      if (frame->best_effort_timestamp == AV_NOPTS_VALUE) {
        abs_frame = 0;
      } else {
        double t = frame->best_effort_timestamp * av_q2d(st->time_base);
        abs_frame = static_cast<int64_t>(t * idx_rate + 0.5);
      }
    } else {
      abs_frame = next_decode_frame;
    }
    next_decode_frame = abs_frame + 1;
    deliver(frame, abs_frame);
    if (seek_pending && abs_frame >= seek_target) seek_pending = false;
  }

  // pad unreached targets (e.g. index == vlen due to rounding) with the
  // last delivered frame, mirroring repeat-last-frame semantics
  if (ti > 0) {
    while (ti < targets.size()) {
      std::memcpy(out + targets[ti].second * frame_bytes,
                  out + targets[ti - 1].second * frame_bytes, frame_bytes);
      ++ti;
    }
  } else if (ti < targets.size()) {
    set_error("no frames decoded");
    failed = true;
  }

  if (sws) sws_freeContext(sws);
  av_frame_free(&frame);
  av_packet_free(&pkt);
  return failed ? -1 : 0;
}

int mr_decode_frames(const char* path, const long long* indices, int n,
                     int h, int w, double start, double end,
                     unsigned char* out) {
  return decode_frames_impl(path, indices, n, h, w, start, end, out, false);
}

// I420 variant: |out| holds n * (h*3/2) * w bytes; h and w must be even.
int mr_decode_frames_i420(const char* path, const long long* indices, int n,
                          int h, int w, double start, double end,
                          unsigned char* out) {
  return decode_frames_impl(path, indices, n, h, w, start, end, out, true);
}

// Decode the audio track to mono float |sample_rate|; writes up to
// |max_samples| into |out|; returns the number written, 0 if the file has
// no audio track, -1 on error.
long long mr_decode_audio(const char* path, int sample_rate, float* out,
                          long long max_samples) {
  AVFormatContext* fmt = nullptr;
  if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) {
    set_error(std::string("cannot open ") + path);
    return -1;
  }
  if (avformat_find_stream_info(fmt, nullptr) < 0) {
    avformat_close_input(&fmt);
    set_error("no stream info");
    return -1;
  }
  const AVCodec* dec = nullptr;
  int si = av_find_best_stream(fmt, AVMEDIA_TYPE_AUDIO, -1, -1, &dec, 0);
  if (si < 0 || !dec) {
    avformat_close_input(&fmt);
    return 0;  // no audio track: caller substitutes silence
  }
  AVCodecContext* codec = avcodec_alloc_context3(dec);
  avcodec_parameters_to_context(codec, fmt->streams[si]->codecpar);
  if (avcodec_open2(codec, dec, nullptr) < 0) {
    avcodec_free_context(&codec);
    avformat_close_input(&fmt);
    set_error("cannot open audio decoder");
    return -1;
  }

  SwrContext* swr = nullptr;
  AVChannelLayout mono = AV_CHANNEL_LAYOUT_MONO;
  AVChannelLayout in_layout;
  av_channel_layout_copy(&in_layout, &codec->ch_layout);
  if (swr_alloc_set_opts2(&swr, &mono, AV_SAMPLE_FMT_FLT, sample_rate,
                          &in_layout, codec->sample_fmt, codec->sample_rate,
                          0, nullptr) < 0 ||
      swr_init(swr) < 0) {
    set_error("cannot init resampler");
    avcodec_free_context(&codec);
    avformat_close_input(&fmt);
    return -1;
  }

  AVFrame* frame = av_frame_alloc();
  AVPacket* pkt = av_packet_alloc();
  long long written = 0;
  std::vector<float> chunk(16384);

  auto drain = [&](AVFrame* f) {
    uint8_t* dst = reinterpret_cast<uint8_t*>(chunk.data());
    int max_out = static_cast<int>(chunk.size());
    int got = swr_convert(swr, &dst, max_out,
                          f ? const_cast<const uint8_t**>(f->data) : nullptr,
                          f ? f->nb_samples : 0);
    while (got > 0 && written < max_samples) {
      long long take = std::min<long long>(got, max_samples - written);
      std::memcpy(out + written, chunk.data(), take * sizeof(float));
      written += take;
      if (!f) {
        got = swr_convert(swr, &dst, max_out, nullptr, 0);
      } else {
        break;
      }
    }
  };

  while (written < max_samples && av_read_frame(fmt, pkt) >= 0) {
    if (pkt->stream_index == si && avcodec_send_packet(codec, pkt) >= 0) {
      while (avcodec_receive_frame(codec, frame) >= 0) drain(frame);
    }
    av_packet_unref(pkt);
  }
  avcodec_send_packet(codec, nullptr);
  while (avcodec_receive_frame(codec, frame) >= 0) drain(frame);
  drain(nullptr);  // flush resampler

  av_frame_free(&frame);
  av_packet_free(&pkt);
  swr_free(&swr);
  avcodec_free_context(&codec);
  avformat_close_input(&fmt);
  return written;
}

// Transcode a video to mp4 at (w, h) — the AVI→MP4 + 224² downscale the
// reference's notebook does with an ffmpeg binary (data_preprocess.ipynb
// cells 18-19).  Video-only (the MR datasets' audio is demuxed separately
// at load time).
int mr_transcode(const char* src_path, const char* dst_path, int w, int h) {
  VideoReader r;
  if (!r.open(src_path)) return -1;
  double fps = r.fps();
  if (fps <= 0) fps = 30.0;

  AVFormatContext* ofmt = nullptr;
  avformat_alloc_output_context2(&ofmt, nullptr, nullptr, dst_path);
  if (!ofmt) {
    set_error("cannot alloc output context");
    return -1;
  }
  const AVCodec* enc = avcodec_find_encoder(AV_CODEC_ID_MPEG4);
  AVStream* st = avformat_new_stream(ofmt, nullptr);
  AVCodecContext* ocodec = avcodec_alloc_context3(enc);
  ocodec->width = w;
  ocodec->height = h;
  ocodec->pix_fmt = AV_PIX_FMT_YUV420P;
  ocodec->time_base = av_inv_q(av_d2q(fps, 100000));
  ocodec->gop_size = 12;
  ocodec->bit_rate = 2000000;
  if (ofmt->oformat->flags & AVFMT_GLOBALHEADER)
    ocodec->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  if (avcodec_open2(ocodec, enc, nullptr) < 0) {
    set_error("cannot open transcode encoder");
    return -1;
  }
  avcodec_parameters_from_context(st->codecpar, ocodec);
  st->time_base = ocodec->time_base;
  if (!(ofmt->oformat->flags & AVFMT_NOFILE) &&
      avio_open(&ofmt->pb, dst_path, AVIO_FLAG_WRITE) < 0) {
    set_error("cannot open transcode output");
    return -1;
  }
  if (avformat_write_header(ofmt, nullptr) < 0) {
    set_error("cannot write transcode header");
    return -1;
  }

  SwsContext* sws = nullptr;
  AVFrame* in_frame = av_frame_alloc();
  AVFrame* out_frame = av_frame_alloc();
  out_frame->format = AV_PIX_FMT_YUV420P;
  out_frame->width = w;
  out_frame->height = h;
  av_frame_get_buffer(out_frame, 0);
  AVPacket* pkt = av_packet_alloc();
  AVPacket* opkt = av_packet_alloc();
  int64_t frame_no = 0;

  auto write_out = [&]() {
    while (avcodec_receive_packet(ocodec, opkt) >= 0) {
      av_packet_rescale_ts(opkt, ocodec->time_base, st->time_base);
      opkt->stream_index = st->index;
      av_interleaved_write_frame(ofmt, opkt);
      av_packet_unref(opkt);
    }
  };

  while (av_read_frame(r.fmt, pkt) >= 0) {
    if (pkt->stream_index == r.stream_index &&
        avcodec_send_packet(r.codec, pkt) >= 0) {
      while (avcodec_receive_frame(r.codec, in_frame) >= 0) {
        if (!sws) {
          sws = sws_getContext(in_frame->width, in_frame->height,
                               (AVPixelFormat)in_frame->format, w, h,
                               AV_PIX_FMT_YUV420P, SWS_BILINEAR, nullptr,
                               nullptr, nullptr);
        }
        av_frame_make_writable(out_frame);
        sws_scale(sws, in_frame->data, in_frame->linesize, 0, in_frame->height,
                  out_frame->data, out_frame->linesize);
        out_frame->pts = frame_no++;
        avcodec_send_frame(ocodec, out_frame);
        write_out();
      }
    }
    av_packet_unref(pkt);
  }
  avcodec_send_packet(r.codec, nullptr);
  while (avcodec_receive_frame(r.codec, in_frame) >= 0) {
    av_frame_make_writable(out_frame);
    sws_scale(sws, in_frame->data, in_frame->linesize, 0, in_frame->height,
              out_frame->data, out_frame->linesize);
    out_frame->pts = frame_no++;
    avcodec_send_frame(ocodec, out_frame);
    write_out();
  }
  avcodec_send_frame(ocodec, nullptr);
  write_out();

  av_write_trailer(ofmt);
  if (sws) sws_freeContext(sws);
  av_frame_free(&in_frame);
  av_frame_free(&out_frame);
  av_packet_free(&pkt);
  av_packet_free(&opkt);
  avcodec_free_context(&ocodec);
  if (!(ofmt->oformat->flags & AVFMT_NOFILE)) avio_closep(&ofmt->pb);
  avformat_free_context(ofmt);
  return frame_no > 0 ? 0 : -1;
}

// ---------------------------------------------------------------------------
// Test-media writers (no ffmpeg binary in the image).
// ---------------------------------------------------------------------------

// Encode |n| RGB24 frames (h x w) at |fps| into an mp4 at |path|.
// Forward declaration: the CFR writer delegates to the VFR one with
// pts = frame index.
int mr_write_test_video_vfr(const char* path, const unsigned char* rgb,
                            int n, int h, int w, double fps,
                            const long long* pts);

int mr_write_test_video(const char* path, const unsigned char* rgb, int n,
                        int h, int w, double fps) {
  return mr_write_test_video_vfr(path, rgb, n, h, w, fps, nullptr);
}

// Variable-frame-rate test writer: |pts| (codec time_base ticks, i.e.
// units of 1/fps; nullptr = CFR pts=i) lets tests fabricate the
// real-world case where a stream's presentation timestamps DRIFT from
// the nominal rate — then the container's avg_frame_rate
// (frames/duration) and r_frame_rate (pts deltas) disagree, which is
// exactly the regime the decoder's post-seek pts->frame-number math
// (index_rate(), above) has to survive.  Real QVHighlights/Charades
// videos are consumer VBR encodes where this happens constantly; with
// zero egress, this writer is how we get such a file to test against
// (tests/test_native_decode.py::test_vfr_*).
int mr_write_test_video_vfr(const char* path, const unsigned char* rgb,
                            int n, int h, int w, double fps,
                            const long long* pts) {
  AVFormatContext* fmt = nullptr;
  avformat_alloc_output_context2(&fmt, nullptr, nullptr, path);
  if (!fmt) {
    set_error("cannot alloc output context");
    return -1;
  }
  AVCodecContext* codec = nullptr;
  auto fail = [&](const char* msg) {
    set_error(msg);
    if (codec) avcodec_free_context(&codec);
    if (fmt->pb && !(fmt->oformat->flags & AVFMT_NOFILE))
      avio_closep(&fmt->pb);
    avformat_free_context(fmt);
    return -1;
  };
  const AVCodec* enc = avcodec_find_encoder(AV_CODEC_ID_MPEG4);
  if (!enc) return fail("no mpeg4 encoder");
  AVStream* st = avformat_new_stream(fmt, nullptr);
  codec = avcodec_alloc_context3(enc);
  codec->width = w;
  codec->height = h;
  codec->pix_fmt = AV_PIX_FMT_YUV420P;
  // exact rational time base so the container reports precise fps
  codec->time_base = av_inv_q(av_d2q(fps, 100000));
  codec->gop_size = 12;
  codec->bit_rate = 2000000;
  if (fmt->oformat->flags & AVFMT_GLOBALHEADER)
    codec->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  if (avcodec_open2(codec, enc, nullptr) < 0)
    return fail("cannot open encoder");
  avcodec_parameters_from_context(st->codecpar, codec);
  st->time_base = codec->time_base;

  if (!(fmt->oformat->flags & AVFMT_NOFILE) &&
      avio_open(&fmt->pb, path, AVIO_FLAG_WRITE) < 0)
    return fail("cannot open output file");
  if (avformat_write_header(fmt, nullptr) < 0)
    return fail("cannot write header");

  SwsContext* sws =
      sws_getContext(w, h, AV_PIX_FMT_RGB24, w, h, AV_PIX_FMT_YUV420P,
                     SWS_BILINEAR, nullptr, nullptr, nullptr);
  AVFrame* frame = av_frame_alloc();
  frame->format = AV_PIX_FMT_YUV420P;
  frame->width = w;
  frame->height = h;
  av_frame_get_buffer(frame, 0);
  AVPacket* pkt = av_packet_alloc();

  auto write_packets = [&]() {
    while (avcodec_receive_packet(codec, pkt) >= 0) {
      av_packet_rescale_ts(pkt, codec->time_base, st->time_base);
      pkt->stream_index = st->index;
      av_interleaved_write_frame(fmt, pkt);
      av_packet_unref(pkt);
    }
  };

  for (int i = 0; i < n; ++i) {
    const uint8_t* src[1] = {rgb + static_cast<size_t>(i) * h * w * 3};
    int stride[1] = {w * 3};
    av_frame_make_writable(frame);
    sws_scale(sws, src, stride, 0, h, frame->data, frame->linesize);
    frame->pts = pts ? pts[i] : i;
    avcodec_send_frame(codec, frame);
    write_packets();
  }
  avcodec_send_frame(codec, nullptr);
  write_packets();

  av_write_trailer(fmt);
  sws_freeContext(sws);
  av_frame_free(&frame);
  av_packet_free(&pkt);
  avcodec_free_context(&codec);
  if (!(fmt->oformat->flags & AVFMT_NOFILE)) avio_closep(&fmt->pb);
  avformat_free_context(fmt);
  return 0;
}

// Write mono float samples as a WAV (pcm_s16le) at |path|.
int mr_write_test_audio(const char* path, const float* samples, long long n,
                        int sample_rate) {
  AVFormatContext* fmt = nullptr;
  avformat_alloc_output_context2(&fmt, nullptr, "wav", path);
  if (!fmt) {
    set_error("cannot alloc wav context");
    return -1;
  }
  AVCodecContext* codec = nullptr;
  auto fail = [&](const char* msg) {
    set_error(msg);
    if (codec) avcodec_free_context(&codec);
    if (fmt->pb) avio_closep(&fmt->pb);
    avformat_free_context(fmt);
    return -1;
  };
  const AVCodec* enc = avcodec_find_encoder(AV_CODEC_ID_PCM_S16LE);
  AVStream* st = avformat_new_stream(fmt, nullptr);
  codec = avcodec_alloc_context3(enc);
  codec->sample_rate = sample_rate;
  AVChannelLayout mono = AV_CHANNEL_LAYOUT_MONO;
  av_channel_layout_copy(&codec->ch_layout, &mono);
  codec->sample_fmt = AV_SAMPLE_FMT_S16;
  codec->time_base = {1, sample_rate};
  if (avcodec_open2(codec, enc, nullptr) < 0)
    return fail("cannot open pcm encoder");
  avcodec_parameters_from_context(st->codecpar, codec);
  if (avio_open(&fmt->pb, path, AVIO_FLAG_WRITE) < 0)
    return fail("cannot open wav file");
  if (avformat_write_header(fmt, nullptr) < 0)
    return fail("cannot write wav header");

  AVFrame* frame = av_frame_alloc();
  AVPacket* pkt = av_packet_alloc();
  const int chunk = 4096;
  for (long long off = 0; off < n; off += chunk) {
    int cnt = static_cast<int>(std::min<long long>(chunk, n - off));
    frame->nb_samples = cnt;
    frame->format = AV_SAMPLE_FMT_S16;
    av_channel_layout_copy(&frame->ch_layout, &codec->ch_layout);
    av_frame_get_buffer(frame, 0);
    int16_t* dst = reinterpret_cast<int16_t*>(frame->data[0]);
    for (int i = 0; i < cnt; ++i) {
      float v = samples[off + i];
      v = std::max(-1.0f, std::min(1.0f, v));
      dst[i] = static_cast<int16_t>(v * 32767.0f);
    }
    frame->pts = off;
    avcodec_send_frame(codec, frame);
    while (avcodec_receive_packet(codec, pkt) >= 0) {
      pkt->stream_index = st->index;
      av_interleaved_write_frame(fmt, pkt);
      av_packet_unref(pkt);
    }
    av_frame_unref(frame);
  }
  avcodec_send_frame(codec, nullptr);
  while (avcodec_receive_packet(codec, pkt) >= 0) {
    pkt->stream_index = st->index;
    av_interleaved_write_frame(fmt, pkt);
    av_packet_unref(pkt);
  }
  av_write_trailer(fmt);
  av_frame_free(&frame);
  av_packet_free(&pkt);
  avcodec_free_context(&codec);
  avio_closep(&fmt->pb);
  avformat_free_context(fmt);
  return 0;
}

// Write an mp4 with BOTH a video stream (H.264 via libx264, ultrafast;
// falls back to MPEG-4 Part 2 if x264 is unavailable) and an AAC audio
// track — i.e. a file shaped like the real QVHighlights/Charades videos
// whose decode cost the benchmark must include (the reference decodes
// such files through decord + ffmpeg audio demux,
// processors/alpro_processors.py:14-38, LAVIS BeatsAudioProcessor).
// |gop| sets the keyframe interval (seek granularity for the gather).
int mr_write_media(const char* path, const unsigned char* rgb, int n, int h,
                   int w, double fps, const float* samples, long long n_samples,
                   int sample_rate, int gop) {
  AVFormatContext* fmt = nullptr;
  avformat_alloc_output_context2(&fmt, nullptr, nullptr, path);
  if (!fmt) {
    set_error("cannot alloc output context");
    return -1;
  }
  AVCodecContext* vcodec = nullptr;
  AVCodecContext* acodec = nullptr;
  // Early-exit cleanup: frees everything open so far (contexts, and the
  // avio handle once opened) — a long-lived process fabricating corpora
  // must not leak per failed video (the reader paths free on all exits).
  auto fail = [&](const char* msg) {
    set_error(msg);
    if (vcodec) avcodec_free_context(&vcodec);
    if (acodec) avcodec_free_context(&acodec);
    if (fmt->pb && !(fmt->oformat->flags & AVFMT_NOFILE))
      avio_closep(&fmt->pb);
    avformat_free_context(fmt);
    return -1;
  };

  // --- video stream ---
  const AVCodec* venc = avcodec_find_encoder(AV_CODEC_ID_H264);
  if (venc) {
    vcodec = avcodec_alloc_context3(venc);
    vcodec->width = w;
    vcodec->height = h;
    vcodec->pix_fmt = AV_PIX_FMT_YUV420P;
    vcodec->time_base = av_inv_q(av_d2q(fps, 100000));
    vcodec->gop_size = gop > 0 ? gop : 60;
    if (fmt->oformat->flags & AVFMT_GLOBALHEADER)
      vcodec->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
    AVDictionary* opts = nullptr;
    av_dict_set(&opts, "preset", "ultrafast", 0);
    av_dict_set(&opts, "crf", "26", 0);
    if (avcodec_open2(vcodec, venc, &opts) < 0) {
      avcodec_free_context(&vcodec);
      vcodec = nullptr;
    }
    av_dict_free(&opts);
  }
  if (!vcodec) {  // fall back to mpeg4
    venc = avcodec_find_encoder(AV_CODEC_ID_MPEG4);
    if (!venc) return fail("no h264/mpeg4 encoder");
    vcodec = avcodec_alloc_context3(venc);
    vcodec->width = w;
    vcodec->height = h;
    vcodec->pix_fmt = AV_PIX_FMT_YUV420P;
    vcodec->time_base = av_inv_q(av_d2q(fps, 100000));
    vcodec->gop_size = gop > 0 ? gop : 60;
    vcodec->bit_rate = 2000000;
    if (fmt->oformat->flags & AVFMT_GLOBALHEADER)
      vcodec->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
    if (avcodec_open2(vcodec, venc, nullptr) < 0)
      return fail("cannot open video encoder");
  }
  AVStream* vst = avformat_new_stream(fmt, nullptr);
  avcodec_parameters_from_context(vst->codecpar, vcodec);
  vst->time_base = vcodec->time_base;

  // --- audio stream (AAC) ---
  const AVCodec* aenc = avcodec_find_encoder(AV_CODEC_ID_AAC);
  AVStream* ast = nullptr;
  if (aenc && n_samples > 0) {
    acodec = avcodec_alloc_context3(aenc);
    acodec->sample_rate = sample_rate;
    AVChannelLayout mono = AV_CHANNEL_LAYOUT_MONO;
    av_channel_layout_copy(&acodec->ch_layout, &mono);
    acodec->sample_fmt = AV_SAMPLE_FMT_FLTP;
    acodec->time_base = {1, sample_rate};
    acodec->bit_rate = 64000;
    if (fmt->oformat->flags & AVFMT_GLOBALHEADER)
      acodec->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
    if (avcodec_open2(acodec, aenc, nullptr) < 0)
      return fail("cannot open aac encoder");
    ast = avformat_new_stream(fmt, nullptr);
    avcodec_parameters_from_context(ast->codecpar, acodec);
    ast->time_base = acodec->time_base;
  }

  if (!(fmt->oformat->flags & AVFMT_NOFILE) &&
      avio_open(&fmt->pb, path, AVIO_FLAG_WRITE) < 0)
    return fail("cannot open output file");
  if (avformat_write_header(fmt, nullptr) < 0)
    return fail("cannot write header");

  SwsContext* sws =
      sws_getContext(w, h, AV_PIX_FMT_RGB24, w, h, AV_PIX_FMT_YUV420P,
                     SWS_BILINEAR, nullptr, nullptr, nullptr);
  AVFrame* vframe = av_frame_alloc();
  vframe->format = AV_PIX_FMT_YUV420P;
  vframe->width = w;
  vframe->height = h;
  av_frame_get_buffer(vframe, 0);
  AVFrame* aframe = av_frame_alloc();
  AVPacket* pkt = av_packet_alloc();

  auto write_packets = [&](AVCodecContext* c, AVStream* s) {
    while (avcodec_receive_packet(c, pkt) >= 0) {
      av_packet_rescale_ts(pkt, c->time_base, s->time_base);
      pkt->stream_index = s->index;
      av_interleaved_write_frame(fmt, pkt);
      av_packet_unref(pkt);
    }
  };

  const int achunk = acodec ? (acodec->frame_size > 0 ? acodec->frame_size : 1024) : 0;
  int vi = 0;
  long long aoff = 0;
  while (vi < n || (acodec && aoff < n_samples)) {
    double vt = vi < n ? vi / fps : 1e30;
    double at = (acodec && aoff < n_samples)
                    ? static_cast<double>(aoff) / sample_rate
                    : 1e30;
    if (vt <= at) {
      const uint8_t* src[1] = {rgb + static_cast<size_t>(vi) * h * w * 3};
      int stride[1] = {w * 3};
      av_frame_make_writable(vframe);
      sws_scale(sws, src, stride, 0, h, vframe->data, vframe->linesize);
      vframe->pts = vi;
      avcodec_send_frame(vcodec, vframe);
      write_packets(vcodec, vst);
      ++vi;
    } else {
      int cnt = static_cast<int>(
          std::min<long long>(achunk, n_samples - aoff));
      aframe->nb_samples = cnt;
      aframe->format = AV_SAMPLE_FMT_FLTP;
      av_channel_layout_copy(&aframe->ch_layout, &acodec->ch_layout);
      av_frame_get_buffer(aframe, 0);
      float* dst = reinterpret_cast<float*>(aframe->data[0]);
      for (int i = 0; i < cnt; ++i) {
        float v = samples[aoff + i];
        dst[i] = std::max(-1.0f, std::min(1.0f, v));
      }
      aframe->pts = aoff;
      avcodec_send_frame(acodec, aframe);
      write_packets(acodec, ast);
      av_frame_unref(aframe);
      aoff += cnt;
    }
  }
  avcodec_send_frame(vcodec, nullptr);
  write_packets(vcodec, vst);
  if (acodec) {
    avcodec_send_frame(acodec, nullptr);
    write_packets(acodec, ast);
  }

  av_write_trailer(fmt);
  sws_freeContext(sws);
  av_frame_free(&vframe);
  av_frame_free(&aframe);
  av_packet_free(&pkt);
  avcodec_free_context(&vcodec);
  if (acodec) avcodec_free_context(&acodec);
  if (!(fmt->oformat->flags & AVFMT_NOFILE)) avio_closep(&fmt->pb);
  avformat_free_context(fmt);
  return 0;
}

}  // extern "C"
