// avdecode — library-level FFmpeg (libav*) audio decode for
// qwen3_asr_rs_tpu: any container/codec -> mono f32 at the target rate,
// with NO ffmpeg binary required.
//
// This is the TPU-host analog of the reference's primary audio path
// (ffmpeg-next FFI, src/audio.rs:18-132), reproducing its behaviors:
//   * best-audio-stream selection                      (audio.rs:24-27)
//   * lazy resampler initialized from the FIRST frame  (audio.rs:44-58)
//   * unspecified-channel-layout repair                (audio.rs:104-109)
//   * bounded resampler flush after EOF                (audio.rs:140-147)
//
// Compiled into libaudioio.so when the libav dev headers are present
// (see native/Makefile); qwen3_asr_rs_tpu/audio/native.py degrades to
// the WAV-only path when the symbols are absent.
//
// Also exports avdec_encode_test(): a tiny libav-based encoder used by
// the test suite to fabricate FLAC/OGG fixtures offline.

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/channel_layout.h>
#include <libavutil/opt.h>
#include <libswresample/swresample.h>
}

namespace {

thread_local std::string g_av_error;
thread_local std::vector<float> g_av_result;

std::string av_err(int code) {
  char buf[AV_ERROR_MAX_STRING_SIZE] = {0};
  av_strerror(code, buf, sizeof(buf));
  return std::string(buf);
}

struct DecodeState {
  SwrContext* swr = nullptr;
  int in_rate = 0;
  int target_rate = 0;

  ~DecodeState() {
    if (swr) swr_free(&swr);
  }

  bool init_from_frame(const AVFrame* frame) {
    AVChannelLayout mono = AV_CHANNEL_LAYOUT_MONO;
    // zero-init: av_channel_layout_copy() UNINITIALIZES dst first, and
    // stack garbage whose order field reads AV_CHANNEL_ORDER_CUSTOM
    // would make it free a wild u.map pointer
    AVChannelLayout in_layout = {};
    if (frame->ch_layout.order == AV_CHANNEL_ORDER_UNSPEC) {
      // FFmpeg sometimes emits frames with an unspecified layout
      // (reference repairs this the same way, audio.rs:104-109)
      av_channel_layout_default(&in_layout, frame->ch_layout.nb_channels);
    } else {
      av_channel_layout_copy(&in_layout, &frame->ch_layout);
    }
    int rc = swr_alloc_set_opts2(
        &swr, &mono, AV_SAMPLE_FMT_FLT, target_rate, &in_layout,
        static_cast<AVSampleFormat>(frame->format), frame->sample_rate, 0,
        nullptr);
    av_channel_layout_uninit(&in_layout);
    if (rc < 0 || swr_init(swr) < 0) {
      g_av_error = "swresample init failed";
      return false;
    }
    in_rate = frame->sample_rate;
    return true;
  }

  bool convert(const AVFrame* frame) {
    if (!swr && !init_from_frame(frame)) return false;
    int64_t max_out = av_rescale_rnd(
        swr_get_delay(swr, in_rate) + frame->nb_samples, target_rate,
        in_rate, AV_ROUND_UP);
    std::vector<float> buf(static_cast<size_t>(max_out));
    uint8_t* out_planes[1] = {reinterpret_cast<uint8_t*>(buf.data())};
    int got = swr_convert(swr, out_planes, static_cast<int>(max_out),
                          const_cast<const uint8_t**>(frame->extended_data),
                          frame->nb_samples);
    if (got < 0) {
      g_av_error = "swr_convert failed: " + av_err(got);
      return false;
    }
    g_av_result.insert(g_av_result.end(), buf.begin(), buf.begin() + got);
    return true;
  }

  void flush() {
    if (!swr) return;
    // bounded flush, like the reference's 10-try loop (audio.rs:140-147)
    std::vector<float> buf(4096);
    uint8_t* out_planes[1] = {reinterpret_cast<uint8_t*>(buf.data())};
    for (int tries = 0; tries < 10; ++tries) {
      int got = swr_convert(swr, out_planes, 4096, nullptr, 0);
      if (got <= 0) break;
      g_av_result.insert(g_av_result.end(), buf.begin(), buf.begin() + got);
    }
  }
};

}  // namespace

extern "C" {

// Decode ANY audio container/codec -> mono f32 at target_rate.
// Returns the number of samples (0 on failure; see avdec_error()).
// Copy the samples out with avdec_copy() before the next call.
int64_t avdec_load(const char* path, int target_rate) {
  g_av_error.clear();
  g_av_result.clear();

  AVFormatContext* fmt = nullptr;
  int rc = avformat_open_input(&fmt, path, nullptr, nullptr);
  if (rc < 0) {
    g_av_error = "open failed: " + av_err(rc);
    return 0;
  }
  if ((rc = avformat_find_stream_info(fmt, nullptr)) < 0) {
    g_av_error = "stream info failed: " + av_err(rc);
    avformat_close_input(&fmt);
    return 0;
  }
  const AVCodec* dec = nullptr;
  int si = av_find_best_stream(fmt, AVMEDIA_TYPE_AUDIO, -1, -1, &dec, 0);
  if (si < 0 || !dec) {
    g_av_error = "no decodable audio stream";
    avformat_close_input(&fmt);
    return 0;
  }
  AVCodecContext* ctx = avcodec_alloc_context3(dec);
  if (!ctx) {
    g_av_error = "decoder context alloc failed";
    avformat_close_input(&fmt);
    return 0;
  }
  if ((rc = avcodec_parameters_to_context(ctx,
                                          fmt->streams[si]->codecpar)) < 0) {
    g_av_error = "codec parameter copy failed: " + av_err(rc);
    avcodec_free_context(&ctx);
    avformat_close_input(&fmt);
    return 0;
  }
  if (ctx->ch_layout.nb_channels > 0 &&
      ctx->ch_layout.order == AV_CHANNEL_ORDER_UNSPEC) {
    av_channel_layout_default(&ctx->ch_layout, ctx->ch_layout.nb_channels);
  }
  if ((rc = avcodec_open2(ctx, dec, nullptr)) < 0) {
    g_av_error = "decoder open failed: " + av_err(rc);
    avcodec_free_context(&ctx);
    avformat_close_input(&fmt);
    return 0;
  }

  DecodeState st;
  st.target_rate = target_rate;
  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  bool ok = true;

  auto drain = [&](bool eof) {
    if (eof) avcodec_send_packet(ctx, nullptr);
    while (true) {
      int r = avcodec_receive_frame(ctx, frame);
      if (r == AVERROR(EAGAIN) || r == AVERROR_EOF) break;
      if (r < 0) {
        g_av_error = "decode failed: " + av_err(r);
        ok = false;
        break;
      }
      if (!st.convert(frame)) {
        ok = false;
        break;
      }
      av_frame_unref(frame);
    }
  };

  while (ok && av_read_frame(fmt, pkt) >= 0) {
    if (pkt->stream_index == si) {
      if (avcodec_send_packet(ctx, pkt) == 0) drain(false);
    }
    av_packet_unref(pkt);
  }
  if (ok) {
    drain(true);
    st.flush();
  }

  av_frame_free(&frame);
  av_packet_free(&pkt);
  avcodec_free_context(&ctx);
  avformat_close_input(&fmt);

  if (ok && g_av_result.empty()) {
    g_av_error = "no samples decoded";
    ok = false;
  }
  return ok ? static_cast<int64_t>(g_av_result.size()) : 0;
}

void avdec_copy(float* dst, int64_t n) {
  if (n > static_cast<int64_t>(g_av_result.size()))
    n = static_cast<int64_t>(g_av_result.size());
  std::memcpy(dst, g_av_result.data(), n * sizeof(float));
}

const char* avdec_error() { return g_av_error.c_str(); }

// Test-only helper: encode mono f32 samples into `path`, container/codec
// inferred from the extension (.flac, .ogg, .wav ...). Returns 1 on
// success, 0 on failure (avdec_error()). Lets the test suite fabricate
// real compressed fixtures with zero network egress.
int avdec_encode_test(const char* path, const float* samples, int64_t n,
                      int rate) {
  g_av_error.clear();
  AVFormatContext* ofmt = nullptr;
  int rc = avformat_alloc_output_context2(&ofmt, nullptr, nullptr, path);
  if (rc < 0 || !ofmt) {
    g_av_error = "output context failed";
    return 0;
  }
  const AVCodec* enc = avcodec_find_encoder(ofmt->oformat->audio_codec);
  if (!enc) {
    g_av_error = "no encoder for container";
    avformat_free_context(ofmt);
    return 0;
  }
  AVCodecContext* ctx = avcodec_alloc_context3(enc);
  ctx->sample_rate = rate;
  AVChannelLayout mono = AV_CHANNEL_LAYOUT_MONO;
  av_channel_layout_copy(&ctx->ch_layout, &mono);
  ctx->sample_fmt =
      enc->sample_fmts ? enc->sample_fmts[0] : AV_SAMPLE_FMT_S16;
  ctx->time_base = AVRational{1, rate};
  if (ofmt->oformat->flags & AVFMT_GLOBALHEADER)
    ctx->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  if ((rc = avcodec_open2(ctx, enc, nullptr)) < 0) {
    g_av_error = "encoder open failed: " + av_err(rc);
    avcodec_free_context(&ctx);
    avformat_free_context(ofmt);
    return 0;
  }
  AVStream* stream = avformat_new_stream(ofmt, nullptr);
  avcodec_parameters_from_context(stream->codecpar, ctx);
  stream->time_base = ctx->time_base;

  if (!(ofmt->oformat->flags & AVFMT_NOFILE)) {
    if ((rc = avio_open(&ofmt->pb, path, AVIO_FLAG_WRITE)) < 0) {
      g_av_error = "avio open failed: " + av_err(rc);
      avcodec_free_context(&ctx);
      avformat_free_context(ofmt);
      return 0;
    }
  }
  // close the avio handle on every later failure path: leaking it is
  // an fd per failed call
  auto fail_cleanup = [&]() {
    if (!(ofmt->oformat->flags & AVFMT_NOFILE)) avio_closep(&ofmt->pb);
    avcodec_free_context(&ctx);
    avformat_free_context(ofmt);
  };
  if ((rc = avformat_write_header(ofmt, nullptr)) < 0) {
    g_av_error = "write header failed: " + av_err(rc);
    fail_cleanup();
    return 0;
  }

  // f32 -> encoder sample format via swresample (handles s16/s32/fltp)
  SwrContext* swr = nullptr;
  rc = swr_alloc_set_opts2(&swr, &mono, ctx->sample_fmt, rate, &mono,
                           AV_SAMPLE_FMT_FLT, rate, 0, nullptr);
  if (rc < 0 || swr_init(swr) < 0) {
    g_av_error = "encode swr init failed";
    if (swr) swr_free(&swr);
    fail_cleanup();
    return 0;
  }

  AVPacket* pkt = av_packet_alloc();
  bool ok = true;
  auto write_packets = [&](AVFrame* f) {
    if (avcodec_send_frame(ctx, f) < 0) {
      ok = false;
      return;
    }
    while (true) {
      int r = avcodec_receive_packet(ctx, pkt);
      if (r == AVERROR(EAGAIN) || r == AVERROR_EOF) break;
      if (r < 0) {
        ok = false;
        break;
      }
      av_packet_rescale_ts(pkt, ctx->time_base, stream->time_base);
      pkt->stream_index = stream->index;
      if (av_interleaved_write_frame(ofmt, pkt) < 0) {
        ok = false;
        break;
      }
    }
  };

  int frame_size = ctx->frame_size > 0 ? ctx->frame_size : 4096;
  int64_t pos = 0, pts = 0;
  while (ok && pos < n) {
    int take = static_cast<int>(
        frame_size < n - pos ? frame_size : n - pos);
    AVFrame* f = av_frame_alloc();
    f->nb_samples = take;
    f->format = ctx->sample_fmt;
    av_channel_layout_copy(&f->ch_layout, &mono);
    f->sample_rate = rate;
    av_frame_get_buffer(f, 0);
    const uint8_t* in_planes[1] = {
        reinterpret_cast<const uint8_t*>(samples + pos)};
    if (swr_convert(swr, f->data, take, in_planes, take) < 0) ok = false;
    f->pts = pts;
    pts += take;
    pos += take;
    if (ok) write_packets(f);
    av_frame_free(&f);
  }
  if (ok) write_packets(nullptr);  // flush encoder
  if (ok && av_write_trailer(ofmt) < 0) ok = false;

  av_packet_free(&pkt);
  swr_free(&swr);
  if (!(ofmt->oformat->flags & AVFMT_NOFILE)) avio_closep(&ofmt->pb);
  avcodec_free_context(&ctx);
  avformat_free_context(ofmt);
  if (!ok && g_av_error.empty()) g_av_error = "encode failed";
  return ok ? 1 : 0;
}

}  // extern "C"
