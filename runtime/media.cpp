// Native media IO runtime (libavformat/libavcodec/libswresample/libswscale).
//
// The reference shells out to the ffmpeg binary for decode/encode/mux
// (src/utils/ffmpeg_utils.py, Inference.py:360). This image ships the FFmpeg
// 5.x libraries but no binary, so the framework links them directly — which
// is also faster (no subprocess / pipe copies) and is the natural home for
// the host-side media runtime. Exposed via ctypes (frontend/video.py,
// frontend/audio.py).
//
// Build: make -C runtime   ->  libactalker_media.so

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/channel_layout.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libswresample/swresample.h>
#include <libswscale/swscale.h>
}

#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct Decoder {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* ctx = nullptr;
  int stream = -1;

  ~Decoder() {
    if (ctx) avcodec_free_context(&ctx);
    if (fmt) avformat_close_input(&fmt);
  }

  bool open(const char* path, AVMediaType type) {
    if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) return false;
    if (avformat_find_stream_info(fmt, nullptr) < 0) return false;
    const AVCodec* dec = nullptr;
    stream = av_find_best_stream(fmt, type, -1, -1, &dec, 0);
    if (stream < 0 || !dec) return false;
    ctx = avcodec_alloc_context3(dec);
    if (avcodec_parameters_to_context(ctx, fmt->streams[stream]->codecpar) < 0)
      return false;
    return avcodec_open2(ctx, dec, nullptr) >= 0;
  }
};

}  // namespace

extern "C" {

void actalker_free(void* p) { free(p); }

// Decode any audio container to mono float32 at sample_rate.
// Returns sample count (<0 on error); *out is malloc'd.
int64_t decode_audio_f32(const char* path, int sample_rate, float** out) {
  Decoder d;
  if (!d.open(path, AVMEDIA_TYPE_AUDIO)) return -1;

  SwrContext* swr = nullptr;
  AVChannelLayout mono = AV_CHANNEL_LAYOUT_MONO;
  if (swr_alloc_set_opts2(&swr, &mono, AV_SAMPLE_FMT_FLT, sample_rate,
                          &d.ctx->ch_layout, d.ctx->sample_fmt,
                          d.ctx->sample_rate, 0, nullptr) < 0 ||
      swr_init(swr) < 0)
    return -2;

  std::vector<float> buf;
  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  std::vector<float> tmp;

  auto drain = [&](AVFrame* f) {
    int64_t max_out =
        swr_get_out_samples(swr, f ? f->nb_samples : 0) + 256;
    tmp.resize(max_out);
    uint8_t* outp[1] = {reinterpret_cast<uint8_t*>(tmp.data())};
    int got = swr_convert(swr, outp, (int)max_out,
                          f ? const_cast<const uint8_t**>(f->extended_data)
                            : nullptr,
                          f ? f->nb_samples : 0);
    if (got > 0) buf.insert(buf.end(), tmp.begin(), tmp.begin() + got);
  };

  bool eof = false;
  while (!eof) {
    int r = av_read_frame(d.fmt, pkt);
    if (r < 0) {
      avcodec_send_packet(d.ctx, nullptr);
      eof = true;
    } else if (pkt->stream_index == d.stream) {
      avcodec_send_packet(d.ctx, pkt);
    }
    av_packet_unref(pkt);
    while (avcodec_receive_frame(d.ctx, frame) >= 0) {
      drain(frame);
      av_frame_unref(frame);
    }
  }
  drain(nullptr);  // flush the resampler

  av_frame_free(&frame);
  av_packet_free(&pkt);
  swr_free(&swr);

  float* res = (float*)malloc(buf.size() * sizeof(float));
  memcpy(res, buf.data(), buf.size() * sizeof(float));
  *out = res;
  return (int64_t)buf.size();
}

// Probe video stream geometry. Returns 0 on success.
int video_info(const char* path, int* w, int* h, double* fps,
               int64_t* nframes) {
  Decoder d;
  if (!d.open(path, AVMEDIA_TYPE_VIDEO)) return -1;
  AVStream* s = d.fmt->streams[d.stream];
  *w = d.ctx->width;
  *h = d.ctx->height;
  AVRational r = s->avg_frame_rate.num ? s->avg_frame_rate : s->r_frame_rate;
  *fps = r.den ? (double)r.num / r.den : 0.0;
  *nframes = s->nb_frames;  // may be 0 for some containers
  return 0;
}

// Decode up to max_frames RGB24 frames at native size into out laid out as
// (max_frames, h, stride_w, 3); stride_w must be >= w and a multiple of 16
// (sws_scale writes aligned row tails). Returns frames decoded.
int64_t read_video_rgb(const char* path, uint8_t* out, int64_t max_frames,
                       int stride_w) {
  Decoder d;
  if (!d.open(path, AVMEDIA_TYPE_VIDEO)) return -1;
  const int w = d.ctx->width, h = d.ctx->height;
  if (stride_w < w) return -2;
  SwsContext* sws =
      sws_getContext(w, h, d.ctx->pix_fmt, w, h, AV_PIX_FMT_RGB24,
                     SWS_BILINEAR, nullptr, nullptr, nullptr);
  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  int64_t n = 0;

  auto drain = [&]() {
    while (n < max_frames && avcodec_receive_frame(d.ctx, frame) >= 0) {
      uint8_t* dst[1] = {out + n * (int64_t)stride_w * h * 3};
      int stride[1] = {stride_w * 3};
      sws_scale(sws, frame->data, frame->linesize, 0, h, dst, stride);
      av_frame_unref(frame);
      ++n;
    }
  };

  while (n < max_frames && av_read_frame(d.fmt, pkt) >= 0) {
    if (pkt->stream_index == d.stream) {
      avcodec_send_packet(d.ctx, pkt);
      drain();
    }
    av_packet_unref(pkt);
  }
  avcodec_send_packet(d.ctx, nullptr);  // flush the decoder
  drain();
  av_frame_free(&frame);
  av_packet_free(&pkt);
  sws_freeContext(sws);
  return n;
}

// Encode RGB24 frames to H.264 MP4 (+ optional AAC audio track decoded from
// audio_path). crf mirrors the reference's `-crf 17`. Returns 0 on success.
int write_video_rgb(const char* path, const uint8_t* frames, int64_t n,
                    int w, int h, double fps, int crf,
                    const char* audio_path) {
  AVFormatContext* ofmt = nullptr;
  if (avformat_alloc_output_context2(&ofmt, nullptr, nullptr, path) < 0)
    return -1;

  const AVCodec* venc = avcodec_find_encoder_by_name("libx264");
  if (!venc) venc = avcodec_find_encoder(AV_CODEC_ID_H264);
  if (!venc) return -2;
  AVStream* vs = avformat_new_stream(ofmt, nullptr);
  AVCodecContext* vc = avcodec_alloc_context3(venc);
  vc->width = w;
  vc->height = h;
  vc->pix_fmt = AV_PIX_FMT_YUV420P;
  AVRational fr = av_d2q(fps, 100000);
  vc->time_base = av_inv_q(fr);
  vc->framerate = fr;
  vc->gop_size = 12;
  vc->max_b_frames = 0;  // keep container frame count exactly decodable
  char crfs[16];
  snprintf(crfs, sizeof crfs, "%d", crf);
  av_opt_set(vc->priv_data, "crf", crfs, 0);
  av_opt_set(vc->priv_data, "preset", "medium", 0);
  if (ofmt->oformat->flags & AVFMT_GLOBALHEADER)
    vc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  if (avcodec_open2(vc, venc, nullptr) < 0) return -3;
  avcodec_parameters_from_context(vs->codecpar, vc);
  vs->time_base = vc->time_base;

  // optional audio: decode to 16 kHz mono f32, encode AAC
  float* audio = nullptr;
  int64_t nsamples = 0;
  AVCodecContext* ac = nullptr;
  AVStream* as = nullptr;
  const int asr = 16000;
  if (audio_path && audio_path[0]) {
    nsamples = decode_audio_f32(audio_path, asr, &audio);
    if (nsamples > 0) {
      const AVCodec* aenc = avcodec_find_encoder(AV_CODEC_ID_AAC);
      if (aenc) {
        as = avformat_new_stream(ofmt, nullptr);
        ac = avcodec_alloc_context3(aenc);
        ac->sample_rate = asr;
        av_channel_layout_default(&ac->ch_layout, 1);
        ac->sample_fmt = AV_SAMPLE_FMT_FLTP;
        ac->bit_rate = 64000;
        ac->time_base = {1, asr};
        if (ofmt->oformat->flags & AVFMT_GLOBALHEADER)
          ac->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
        if (avcodec_open2(ac, aenc, nullptr) < 0) {
          avcodec_free_context(&ac);
          ac = nullptr;
        } else {
          avcodec_parameters_from_context(as->codecpar, ac);
          as->time_base = ac->time_base;
        }
      }
    }
  }

  if (!(ofmt->oformat->flags & AVFMT_NOFILE) &&
      avio_open(&ofmt->pb, path, AVIO_FLAG_WRITE) < 0)
    return -4;
  if (avformat_write_header(ofmt, nullptr) < 0) return -5;

  SwsContext* sws =
      sws_getContext(w, h, AV_PIX_FMT_RGB24, w, h, AV_PIX_FMT_YUV420P,
                     SWS_BILINEAR, nullptr, nullptr, nullptr);
  AVFrame* vf = av_frame_alloc();
  vf->format = AV_PIX_FMT_YUV420P;
  vf->width = w;
  vf->height = h;
  av_frame_get_buffer(vf, 0);
  AVPacket* pkt = av_packet_alloc();

  auto pump_video = [&](bool flush) {
    while (avcodec_receive_packet(vc, pkt) >= 0) {
      av_packet_rescale_ts(pkt, vc->time_base, vs->time_base);
      // explicit sample duration: without it the mp4 muxer leaves the final
      // sample 0-length and demuxers drop the last frame of every clip
      pkt->duration = av_rescale_q(1, vc->time_base, vs->time_base);
      pkt->stream_index = vs->index;
      av_interleaved_write_frame(ofmt, pkt);
      av_packet_unref(pkt);
    }
    (void)flush;
  };

  for (int64_t i = 0; i < n; ++i) {
    const uint8_t* src[1] = {frames + i * (int64_t)w * h * 3};
    int stride[1] = {w * 3};
    av_frame_make_writable(vf);
    sws_scale(sws, src, stride, 0, h, vf->data, vf->linesize);
    vf->pts = i;
    // send_frame returns EAGAIN when output is pending: drain and retry
    // (dropping the frame here loses the clip's final frame).
    while (avcodec_send_frame(vc, vf) == AVERROR(EAGAIN)) pump_video(false);
    pump_video(false);
  }
  while (avcodec_send_frame(vc, nullptr) == AVERROR(EAGAIN)) pump_video(false);
  pump_video(true);

  if (ac && audio) {
    AVFrame* af = av_frame_alloc();
    af->format = AV_SAMPLE_FMT_FLTP;
    av_channel_layout_default(&af->ch_layout, 1);
    af->sample_rate = asr;
    const int fsz = ac->frame_size > 0 ? ac->frame_size : 1024;
    af->nb_samples = fsz;
    av_frame_get_buffer(af, 0);  // allocate once; reuse the buffer per frame
    // limit audio to the video duration (the reference muxes -shortest)
    int64_t limit = (int64_t)(n / fps * asr);
    if (limit < nsamples) nsamples = limit;
    for (int64_t pos = 0; pos < nsamples; pos += fsz) {
      av_frame_make_writable(af);
      const int valid = (int)std::min<int64_t>(fsz, nsamples - pos);
      memcpy(af->data[0], audio + pos, valid * sizeof(float));
      if (valid < fsz)
        memset((float*)af->data[0] + valid, 0, (fsz - valid) * sizeof(float));
      af->pts = pos;
      while (avcodec_send_frame(ac, af) == AVERROR(EAGAIN)) {
        while (avcodec_receive_packet(ac, pkt) >= 0) {
          av_packet_rescale_ts(pkt, ac->time_base, as->time_base);
          pkt->stream_index = as->index;
          av_interleaved_write_frame(ofmt, pkt);
          av_packet_unref(pkt);
        }
      }
      while (avcodec_receive_packet(ac, pkt) >= 0) {
        av_packet_rescale_ts(pkt, ac->time_base, as->time_base);
        pkt->stream_index = as->index;
        av_interleaved_write_frame(ofmt, pkt);
        av_packet_unref(pkt);
      }
    }
    avcodec_send_frame(ac, nullptr);
    while (avcodec_receive_packet(ac, pkt) >= 0) {
      av_packet_rescale_ts(pkt, ac->time_base, as->time_base);
      pkt->stream_index = as->index;
      av_interleaved_write_frame(ofmt, pkt);
      av_packet_unref(pkt);
    }
    av_frame_free(&af);
  }

  av_write_trailer(ofmt);
  av_packet_free(&pkt);
  av_frame_free(&vf);
  sws_freeContext(sws);
  avcodec_free_context(&vc);
  if (ac) avcodec_free_context(&ac);
  if (audio) free(audio);
  if (!(ofmt->oformat->flags & AVFMT_NOFILE)) avio_closep(&ofmt->pb);
  avformat_free_context(ofmt);
  return 0;
}

}  // extern "C"
