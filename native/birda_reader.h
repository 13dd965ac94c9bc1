// Shared reader interface for birda_tpu native audio backends.
#pragma once

#include <cstdint>
#include <string>

class AudioReader {
public:
    virtual ~AudioReader() = default;
    virtual int32_t rate() const = 0;
    virtual int32_t channels() const = 0;
    // Total frames, or -1 when the container does not declare a length.
    virtual int64_t frames() const = 0;
    // Read up to n mono frames (downmixed). Returns frames produced, 0 at
    // EOF, -1 on error (message in err()).
    virtual int64_t read_mono(float* out, int64_t n) = 0;
    // Seek to an absolute frame. Returns the position reached, or -1.
    virtual int64_t seek(int64_t frame) = 0;
    // True when decode after a seek is bit-identical to sequential decode
    // (frame-independent codecs: PCM/WAV, FLAC). False for codecs with
    // inter-frame state (MP3 bit reservoir, AAC), where mid-stream entry
    // produces slightly different samples — parallel span decoding is only
    // enabled when this holds.
    virtual bool exact_seek() const { return false; }
    const char* err() const { return err_.c_str(); }
protected:
    std::string err_;
};

// Backend factories.
AudioReader* birda_flac_open(const char* path, std::string& err);
AudioReader* birda_ffmpeg_open(const char* path, std::string& err);
