// birda_ffmpeg — compressed-audio decode backend via the system FFmpeg
// libraries (libavformat/libavcodec/libswresample).
//
// Covers the containers the native WAV/FLAC decoders do not: MP3, M4A/AAC,
// and OGG — the same format set the reference reaches through symphonia
// (reference src/audio/decode.rs, README "Supported formats"). Linking a
// system codec suite mirrors the reference's own architecture of driving a
// system ONNX Runtime (src/inference/runtime.rs).
//
// Behavior matches the AudioReader contract: streaming mono float32 via
// swresample downmix at the source rate; frames() is the container's
// declared duration (an estimate for VBR streams — the decode loop, not the
// estimate, decides EOF); seek() is coarse (container seek to the nearest
// earlier point then decode-discard), matching the reference clipper's
// coarse-seek semantics (src/clipper/extractor.rs:88).

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>
#include <memory>
#include <algorithm>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/opt.h>
#include <libswresample/swresample.h>
}

#include "birda_reader.h"

namespace {

class FfmpegReader final : public AudioReader {
public:
    static FfmpegReader* open(const char* path, std::string& err) {
        std::unique_ptr<FfmpegReader> r(new FfmpegReader());
        if (!r->init(path, err)) return nullptr;
        return r.release();
    }

    ~FfmpegReader() override {
        if (swr_) swr_free(&swr_);
        if (frame_) av_frame_free(&frame_);
        if (packet_) av_packet_free(&packet_);
        if (codec_ctx_) avcodec_free_context(&codec_ctx_);
        if (fmt_ctx_) avformat_close_input(&fmt_ctx_);
    }

    int32_t rate() const override { return rate_; }
    int32_t channels() const override { return channels_; }
    int64_t frames() const override { return total_frames_; }

    int64_t read_mono(float* out, int64_t n) override {
        int64_t produced = 0;
        while (produced < n) {
            if (buf_pos_ < buf_.size()) {
                int64_t take = std::min<int64_t>(n - produced,
                                                 buf_.size() - buf_pos_);
                memcpy(out + produced, buf_.data() + buf_pos_,
                       (size_t)take * sizeof(float));
                buf_pos_ += (size_t)take;
                produced += take;
                continue;
            }
            if (!decode_more()) break;
        }
        pos_ += produced;
        return produced;
    }

    int64_t seek(int64_t frame) override {
        // Coarse container seek to an earlier point, then decode-discard.
        int64_t target_ts = av_rescale_q(
            frame, AVRational{1, rate_},
            fmt_ctx_->streams[stream_index_]->time_base);
        if (av_seek_frame(fmt_ctx_, stream_index_, target_ts,
                          AVSEEK_FLAG_BACKWARD) < 0) {
            // Fall back to a rewind.
            av_seek_frame(fmt_ctx_, stream_index_, 0, AVSEEK_FLAG_BACKWARD);
            pos_ = 0;
        }
        avcodec_flush_buffers(codec_ctx_);
        buf_.clear();
        buf_pos_ = 0;
        eof_ = false;
        // Position after a container seek is approximate: resync from the
        // next decoded frame's timestamp, then discard up to the target.
        pos_ = -1;
        while (pos_ < 0 || pos_ < frame) {
            if (!decode_more()) {
                pos_ = std::max<int64_t>(pos_, 0);
                break;
            }
            if (pos_ < 0) continue;  // still waiting for a timestamped frame
            int64_t available = (int64_t)(buf_.size() - buf_pos_);
            int64_t skip = std::min(frame - pos_, available);
            buf_pos_ += (size_t)skip;
            pos_ += skip;
            if (buf_pos_ < buf_.size()) break;  // reached target inside buffer
        }
        return pos_;
    }

private:
    FfmpegReader() = default;

    bool init(const char* path, std::string& err) {
        if (avformat_open_input(&fmt_ctx_, path, nullptr, nullptr) < 0) {
            err = "ffmpeg could not open container";
            return false;
        }
        if (avformat_find_stream_info(fmt_ctx_, nullptr) < 0) {
            err = "no stream info";
            return false;
        }
        const AVCodec* codec = nullptr;
        stream_index_ = av_find_best_stream(
            fmt_ctx_, AVMEDIA_TYPE_AUDIO, -1, -1, &codec, 0);
        if (stream_index_ < 0 || codec == nullptr) {
            err = "no audio track";
            return false;
        }
        AVStream* stream = fmt_ctx_->streams[stream_index_];
        codec_ctx_ = avcodec_alloc_context3(codec);
        if (!codec_ctx_ ||
            avcodec_parameters_to_context(codec_ctx_, stream->codecpar) < 0 ||
            avcodec_open2(codec_ctx_, codec, nullptr) < 0) {
            err = "could not open decoder";
            return false;
        }
        rate_ = codec_ctx_->sample_rate;
        channels_ = codec_ctx_->ch_layout.nb_channels;
        if (rate_ <= 0 || channels_ <= 0) {
            err = "bad stream parameters";
            return false;
        }

        AVChannelLayout mono = AV_CHANNEL_LAYOUT_MONO;
        if (swr_alloc_set_opts2(
                &swr_, &mono, AV_SAMPLE_FMT_FLT, rate_,
                &codec_ctx_->ch_layout, codec_ctx_->sample_fmt, rate_,
                0, nullptr) < 0 ||
            swr_init(swr_) < 0) {
            err = "could not init resampler/downmix";
            return false;
        }

        // Declared duration -> sample estimate (VBR streams may be off; the
        // decode loop decides real EOF).
        if (stream->duration > 0) {
            total_frames_ = av_rescale_q(
                stream->duration, stream->time_base, AVRational{1, rate_});
        } else if (fmt_ctx_->duration > 0) {
            total_frames_ = av_rescale(
                fmt_ctx_->duration, rate_, AV_TIME_BASE);
        } else {
            total_frames_ = -1;
        }

        packet_ = av_packet_alloc();
        frame_ = av_frame_alloc();
        if (!packet_ || !frame_) {
            err = "alloc failure";
            return false;
        }
        return true;
    }

    // Decode until the internal buffer gains samples. False at EOF/error.
    bool decode_more() {
        if (eof_) return false;
        buf_.clear();
        buf_pos_ = 0;
        for (;;) {
            int ret = avcodec_receive_frame(codec_ctx_, frame_);
            if (ret == 0) {
                append_frame();
                return !buf_.empty() || true;
            }
            if (ret == AVERROR_EOF) {
                eof_ = true;
                return false;
            }
            if (ret != AVERROR(EAGAIN)) {
                err_ = "decode error";
                eof_ = true;
                return false;
            }
            // Need another packet.
            for (;;) {
                int rr = av_read_frame(fmt_ctx_, packet_);
                if (rr < 0) {
                    avcodec_send_packet(codec_ctx_, nullptr);  // flush
                    break;
                }
                if (packet_->stream_index != stream_index_) {
                    av_packet_unref(packet_);
                    continue;
                }
                avcodec_send_packet(codec_ctx_, packet_);
                av_packet_unref(packet_);
                break;
            }
        }
    }

    void append_frame() {
        // Track position from frame timestamps after seeks.
        if (pos_ < 0 && frame_->pts != AV_NOPTS_VALUE) {
            pos_ = av_rescale_q(
                frame_->pts,
                fmt_ctx_->streams[stream_index_]->time_base,
                AVRational{1, rate_});
        }
        int out_count = frame_->nb_samples;
        size_t old = buf_.size();
        buf_.resize(old + (size_t)out_count);
        uint8_t* dst = reinterpret_cast<uint8_t*>(buf_.data() + old);
        int got = swr_convert(swr_, &dst, out_count,
                              const_cast<const uint8_t**>(frame_->data),
                              frame_->nb_samples);
        if (got < 0) got = 0;
        buf_.resize(old + (size_t)got);
        av_frame_unref(frame_);
    }

    AVFormatContext* fmt_ctx_ = nullptr;
    AVCodecContext* codec_ctx_ = nullptr;
    SwrContext* swr_ = nullptr;
    AVPacket* packet_ = nullptr;
    AVFrame* frame_ = nullptr;
    int stream_index_ = -1;
    int32_t rate_ = 0;
    int32_t channels_ = 0;
    int64_t total_frames_ = -1;
    int64_t pos_ = 0;
    std::vector<float> buf_;
    size_t buf_pos_ = 0;
    bool eof_ = false;
};

}  // namespace

AudioReader* birda_ffmpeg_open(const char* path, std::string& err) {
    return FfmpegReader::open(path, err);
}
