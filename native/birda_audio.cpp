// birda_audio — native audio decode for the birda_tpu framework.
//
// TPU-native equivalent of the reference's symphonia (Rust) decode layer
// (reference src/audio/decode.rs): streaming container decode, mono downmix
// of u8/s16/s24/s32/f32/f64 PCM, frame-accurate seek, and a 16-bit WAV
// writer for the clipper. Decode is inherently sequential host work, so it
// lives in C++ feeding pinned host buffers, not on the accelerator.
//
// Containers: RIFF/WAVE, RF64/BW64 (ds64 64-bit sizes), WAVE_FORMAT_EXTENSIBLE.
// The FLAC decoder lives in birda_flac.cpp behind the same reader interface.
//
// Exposed as a flat C ABI consumed via ctypes (no pybind11 in the image).

#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <string>
#include <vector>
#include <memory>
#include <algorithm>

#include "birda_reader.h"

namespace {

constexpr uint16_t FMT_PCM = 0x0001;
constexpr uint16_t FMT_IEEE_FLOAT = 0x0003;
constexpr uint16_t FMT_EXTENSIBLE = 0xFFFE;

// ---------------------------------------------------------------------------
// WAV / RF64
// ---------------------------------------------------------------------------
class WavReader final : public AudioReader {
public:
    static WavReader* open(const char* path, std::string& err) {
        std::unique_ptr<WavReader> r(new WavReader());
        if (!r->init(path, err)) return nullptr;
        return r.release();
    }
    ~WavReader() override {
        if (f_) fclose(f_);
    }

    int32_t rate() const override { return rate_; }
    int32_t channels() const override { return channels_; }
    int64_t frames() const override { return total_frames_; }

    int64_t read_mono(float* out, int64_t n) override {
        if (pos_ >= total_frames_) return 0;
        int64_t want = std::min(n, total_frames_ - pos_);
        const int64_t frame_bytes = (int64_t)block_align_;
        buf_.resize((size_t)(want * frame_bytes));
        size_t got = fread(buf_.data(), 1, (size_t)(want * frame_bytes), f_);
        int64_t got_frames = (int64_t)(got / (size_t)frame_bytes);
        if (got_frames <= 0) {
            if (ferror(f_)) { err_ = "read error"; return -1; }
            return 0;
        }
        downmix(buf_.data(), got_frames, out);
        pos_ += got_frames;
        return got_frames;
    }

    bool exact_seek() const override { return true; }
    int64_t seek(int64_t frame) override {
        frame = std::max<int64_t>(0, std::min(frame, total_frames_));
        int64_t off = data_offset_ + frame * (int64_t)block_align_;
#if defined(_WIN32)
        if (_fseeki64(f_, off, SEEK_SET) != 0) { err_ = "seek failed"; return -1; }
#else
        if (fseeko(f_, (off_t)off, SEEK_SET) != 0) { err_ = "seek failed"; return -1; }
#endif
        pos_ = frame;
        return pos_;
    }

private:
    WavReader() = default;

    bool init(const char* path, std::string& err) {
        f_ = fopen(path, "rb");
        if (!f_) { err = "cannot open file"; return false; }

        char riff[4], wave[4];
        uint32_t riff_size32 = 0;
        if (fread(riff, 1, 4, f_) != 4 || fread(&riff_size32, 4, 1, f_) != 1 ||
            fread(wave, 1, 4, f_) != 4) {
            err = "not a WAV file (truncated header)";
            return false;
        }
        bool rf64 = false;
        if (memcmp(riff, "RF64", 4) == 0 || memcmp(riff, "BW64", 4) == 0) {
            rf64 = true;
        } else if (memcmp(riff, "RIFF", 4) != 0) {
            err = "not a RIFF/RF64 file";
            return false;
        }
        if (memcmp(wave, "WAVE", 4) != 0) { err = "not a WAVE file"; return false; }

        uint64_t data_size64 = 0;   // from ds64 when RF64
        bool have_fmt = false, have_data = false;
        uint64_t data_size = 0;

        // Chunk walk. RF64 puts real sizes in a ds64 chunk and stores
        // 0xFFFFFFFF in the 32-bit fields.
        for (;;) {
            char id[4];
            uint32_t sz32;
            if (fread(id, 1, 4, f_) != 4 || fread(&sz32, 4, 1, f_) != 1) break;
            uint64_t sz = sz32;
            if (memcmp(id, "ds64", 4) == 0 && rf64) {
                // riff_size(8) + data_size(8) + sample_count(8) + table...
                uint8_t ds64[28];
                size_t take = std::min<uint64_t>(sz, sizeof(ds64));
                if (fread(ds64, 1, take, f_) != take) { err = "truncated ds64"; return false; }
                memcpy(&data_size64, ds64 + 8, 8);
                if (sz > take) skip(sz - take);
                if (sz & 1) skip(1);
                continue;
            }
            if (memcmp(id, "fmt ", 4) == 0) {
                if (!parse_fmt(sz, err)) return false;
                have_fmt = true;
                continue;
            }
            if (memcmp(id, "data", 4) == 0) {
                data_offset_ = ftello_now();
                data_size = (rf64 && sz32 == 0xFFFFFFFFu) ? data_size64 : sz;
                have_data = true;
                if (have_fmt) break;  // normal layout: fmt before data
                // fmt after data (rare): skip past and keep walking.
                skip(data_size + (data_size & 1));
                continue;
            }
            skip(sz + (sz & 1));
        }

        if (!have_fmt) { err = "missing fmt chunk"; return false; }
        if (!have_data) { err = "missing data chunk"; return false; }
        if (channels_ <= 0 || channels_ > 64) { err = "bad channel count"; return false; }
        if (rate_ <= 0) { err = "bad sample rate"; return false; }
        if (block_align_ == 0) block_align_ = (uint16_t)(channels_ * bytes_per_sample_);
        if (block_align_ != channels_ * bytes_per_sample_) {
            err = "unsupported block alignment";
            return false;
        }

        // Clamp the declared size to what the file actually contains —
        // hand-built headers lie (reference clipper hardening, #310).
        int64_t cur = ftello_now();
        if (fseeko_to_end() == 0) {
            int64_t file_end = ftello_now();
            uint64_t avail = (file_end > data_offset_) ? (uint64_t)(file_end - data_offset_) : 0;
            data_size = std::min<uint64_t>(data_size, avail);
        }
        seek_abs(cur);

        total_frames_ = (int64_t)(data_size / block_align_);
        seek_abs(data_offset_);
        pos_ = 0;
        return true;
    }

    bool parse_fmt(uint64_t sz, std::string& err) {
        if (sz < 16) { err = "fmt chunk too small"; return false; }
        uint8_t hdr[16];
        if (fread(hdr, 1, 16, f_) != 16) { err = "truncated fmt"; return false; }
        uint16_t format; memcpy(&format, hdr + 0, 2);
        uint16_t ch; memcpy(&ch, hdr + 2, 2);
        uint32_t rate; memcpy(&rate, hdr + 4, 4);
        uint16_t block; memcpy(&block, hdr + 12, 2);
        uint16_t bits; memcpy(&bits, hdr + 14, 2);
        uint64_t consumed = 16;
        if (format == FMT_EXTENSIBLE) {
            if (sz < 40) { err = "extensible fmt too small"; return false; }
            uint8_t ext[24];
            if (fread(ext, 1, 24, f_) != 24) { err = "truncated extensible fmt"; return false; }
            consumed += 24;
            // cbSize(2) validBits(2) channelMask(4) subformat GUID(16):
            // first two bytes of the GUID are the real format tag.
            memcpy(&format, ext + 8, 2);
        }
        if (sz > consumed) skip(sz - consumed);
        if (sz & 1) skip(1);

        channels_ = (int32_t)ch;
        rate_ = (int32_t)rate;
        block_align_ = block;
        bits_ = bits;
        if (format == FMT_PCM) {
            switch (bits) {
                case 8:  sample_kind_ = U8; bytes_per_sample_ = 1; break;
                case 16: sample_kind_ = S16; bytes_per_sample_ = 2; break;
                case 24: sample_kind_ = S24; bytes_per_sample_ = 3; break;
                case 32: sample_kind_ = S32; bytes_per_sample_ = 4; break;
                default: err = "unsupported PCM bit depth"; return false;
            }
        } else if (format == FMT_IEEE_FLOAT) {
            switch (bits) {
                case 32: sample_kind_ = F32; bytes_per_sample_ = 4; break;
                case 64: sample_kind_ = F64; bytes_per_sample_ = 8; break;
                default: err = "unsupported float bit depth"; return false;
            }
        } else {
            err = "unsupported WAV codec (not PCM or IEEE float)";
            return false;
        }
        return true;
    }

    // Mono downmix: average all channels, normalizing integer PCM into
    // [-1, 1] (reference src/audio/decode.rs:353-411 semantics).
    void downmix(const uint8_t* raw, int64_t nframes, float* out) {
        const int ch = channels_;
        const double inv_ch = 1.0 / ch;
        // Mono fast paths (the dominant field-recorder layout): float
        // math vectorizes, and division by a power of two is exact, so
        // the result is bit-identical to the double-accumulated general
        // path below.
        if (ch == 1 && sample_kind_ == S16) {
            for (int64_t i = 0; i < nframes; i++) {
                int16_t v;
                memcpy(&v, raw + (size_t)i * 2, 2);
                out[i] = (float)v * (1.0f / 32768.0f);
            }
            return;
        }
        if (ch == 1 && sample_kind_ == F32) {
            memcpy(out, raw, (size_t)nframes * 4);
            return;
        }
        if (ch == 1 && sample_kind_ == S32) {
            for (int64_t i = 0; i < nframes; i++) {
                int32_t v;
                memcpy(&v, raw + (size_t)i * 4, 4);
                out[i] = (float)v * (1.0f / 2147483648.0f);
            }
            return;
        }
        if (ch == 1 && sample_kind_ == S24) {
            for (int64_t i = 0; i < nframes; i++) {
                const uint8_t* b = raw + (size_t)i * 3;
                int32_t v = (int32_t)((uint32_t)b[0] | ((uint32_t)b[1] << 8) |
                                      ((uint32_t)b[2] << 16));
                if (v & 0x800000) v |= ~0xFFFFFF;
                out[i] = (float)v * (1.0f / 8388608.0f);
            }
            return;
        }
        if (ch == 1 && sample_kind_ == U8) {
            for (int64_t i = 0; i < nframes; i++)
                out[i] = ((float)raw[i] - 128.0f) * (1.0f / 128.0f);
            return;
        }
        switch (sample_kind_) {
            case U8:
                for (int64_t i = 0; i < nframes; i++) {
                    double acc = 0;
                    for (int c = 0; c < ch; c++)
                        acc += ((double)raw[i * ch + c] - 128.0) / 128.0;
                    out[i] = (float)(acc * inv_ch);
                }
                break;
            case S16:
                for (int64_t i = 0; i < nframes; i++) {
                    double acc = 0;
                    const uint8_t* p = raw + (size_t)i * ch * 2;
                    for (int c = 0; c < ch; c++) {
                        int16_t v; memcpy(&v, p + c * 2, 2);
                        acc += (double)v / 32768.0;
                    }
                    out[i] = (float)(acc * inv_ch);
                }
                break;
            case S24:
                for (int64_t i = 0; i < nframes; i++) {
                    double acc = 0;
                    const uint8_t* p = raw + (size_t)i * ch * 3;
                    for (int c = 0; c < ch; c++) {
                        const uint8_t* b = p + c * 3;
                        int32_t v = (int32_t)((uint32_t)b[0] | ((uint32_t)b[1] << 8) |
                                              ((uint32_t)b[2] << 16));
                        if (v & 0x800000) v |= ~0xFFFFFF;  // sign-extend
                        acc += (double)v / 8388608.0;
                    }
                    out[i] = (float)(acc * inv_ch);
                }
                break;
            case S32:
                for (int64_t i = 0; i < nframes; i++) {
                    double acc = 0;
                    const uint8_t* p = raw + (size_t)i * ch * 4;
                    for (int c = 0; c < ch; c++) {
                        int32_t v; memcpy(&v, p + c * 4, 4);
                        acc += (double)v / 2147483648.0;
                    }
                    out[i] = (float)(acc * inv_ch);
                }
                break;
            case F32:
                for (int64_t i = 0; i < nframes; i++) {
                    double acc = 0;
                    const uint8_t* p = raw + (size_t)i * ch * 4;
                    for (int c = 0; c < ch; c++) {
                        float v; memcpy(&v, p + c * 4, 4);
                        acc += v;
                    }
                    out[i] = (float)(acc * inv_ch);
                }
                break;
            case F64:
                for (int64_t i = 0; i < nframes; i++) {
                    double acc = 0;
                    const uint8_t* p = raw + (size_t)i * ch * 8;
                    for (int c = 0; c < ch; c++) {
                        double v; memcpy(&v, p + c * 8, 8);
                        acc += v;
                    }
                    out[i] = (float)(acc * inv_ch);
                }
                break;
        }
    }

    void skip(uint64_t n) {
#if defined(_WIN32)
        _fseeki64(f_, (int64_t)n, SEEK_CUR);
#else
        fseeko(f_, (off_t)n, SEEK_CUR);
#endif
    }
    int64_t ftello_now() {
#if defined(_WIN32)
        return _ftelli64(f_);
#else
        return (int64_t)ftello(f_);
#endif
    }
    int fseeko_to_end() {
#if defined(_WIN32)
        return _fseeki64(f_, 0, SEEK_END);
#else
        return fseeko(f_, 0, SEEK_END);
#endif
    }
    void seek_abs(int64_t off) {
#if defined(_WIN32)
        _fseeki64(f_, off, SEEK_SET);
#else
        fseeko(f_, (off_t)off, SEEK_SET);
#endif
    }

    enum SampleKind { U8, S16, S24, S32, F32, F64 };

    FILE* f_ = nullptr;
    int32_t rate_ = 0;
    int32_t channels_ = 0;
    uint16_t block_align_ = 0;
    uint16_t bits_ = 0;
    int bytes_per_sample_ = 0;
    SampleKind sample_kind_ = S16;
    int64_t data_offset_ = 0;
    int64_t total_frames_ = 0;
    int64_t pos_ = 0;
    std::vector<uint8_t> buf_;
};

bool has_suffix_nocase(const char* path, const char* suffix) {
    size_t lp = strlen(path), ls = strlen(suffix);
    if (ls > lp) return false;
    for (size_t i = 0; i < ls; i++) {
        char a = path[lp - ls + i], b = suffix[i];
        if (tolower((unsigned char)a) != tolower((unsigned char)b)) return false;
    }
    return true;
}

}  // namespace

extern "C" {

// Open an audio file. Returns an opaque handle, or nullptr with a message in
// err (if provided). Dispatches on magic bytes first, extension second.
void* birda_open(const char* path, char* err, int errlen) {
    std::string e;
    AudioReader* r = nullptr;
    FILE* probe = fopen(path, "rb");
    if (!probe) {
        if (err && errlen > 0) snprintf(err, errlen, "cannot open file");
        return nullptr;
    }
    char magic[4] = {0};
    size_t got = fread(magic, 1, 4, probe);
    fclose(probe);
    if (got == 4 && (memcmp(magic, "RIFF", 4) == 0 || memcmp(magic, "RF64", 4) == 0 ||
                     memcmp(magic, "BW64", 4) == 0)) {
        r = WavReader::open(path, e);
    } else if (got == 4 && memcmp(magic, "fLaC", 4) == 0) {
        r = birda_flac_open(path, e);
    } else if (has_suffix_nocase(path, ".wav")) {
        r = WavReader::open(path, e);
    } else if (has_suffix_nocase(path, ".mp3") || has_suffix_nocase(path, ".m4a") ||
               has_suffix_nocase(path, ".aac") || has_suffix_nocase(path, ".ogg") ||
               has_suffix_nocase(path, ".opus") ||
               (got >= 3 && memcmp(magic, "ID3", 3) == 0) ||
               (got >= 2 && (unsigned char)magic[0] == 0xFF &&
                ((unsigned char)magic[1] & 0xE0) == 0xE0)) {
        // Compressed formats decode through the system FFmpeg libraries.
        r = birda_ffmpeg_open(path, e);
    } else {
        e = "unsupported audio container";
    }
    if (!r && err && errlen > 0) snprintf(err, errlen, "%s", e.c_str());
    return r;
}

int32_t birda_rate(void* h) { return static_cast<AudioReader*>(h)->rate(); }
int32_t birda_channels(void* h) { return static_cast<AudioReader*>(h)->channels(); }
int64_t birda_frames(void* h) { return static_cast<AudioReader*>(h)->frames(); }

int64_t birda_read_mono(void* h, float* out, int64_t n) {
    return static_cast<AudioReader*>(h)->read_mono(out, n);
}

int64_t birda_seek(void* h, int64_t frame) {
    return static_cast<AudioReader*>(h)->seek(frame);
}

int32_t birda_exact_seek(void* h) {
    return static_cast<AudioReader*>(h)->exact_seek() ? 1 : 0;
}

const char* birda_error(void* h) { return static_cast<AudioReader*>(h)->err(); }

void birda_close(void* h) { delete static_cast<AudioReader*>(h); }

// Fused amax + int16 quantization for the chunk transport
// (birda_tpu/inference/classifier.py::ChunkRunner): one vectorizable pass
// for the max, one for the scale+round. Returns the amax through amax_out;
// amax < 1e-9 yields all-zero output (silent chunk).
// Four independent accumulators break the max reduction's loop-carried
// dependency so the compiler vectorizes it (~4x measured vs the naive
// single-accumulator loop on one core).
static float amax_block(const float* __restrict in, int64_t n) {
    float a0 = 0.0f, a1 = 0.0f, a2 = 0.0f, a3 = 0.0f;
    int64_t i = 0;
    for (; i + 4 <= n; i += 4) {
        float v0 = fabsf(in[i]), v1 = fabsf(in[i + 1]);
        float v2 = fabsf(in[i + 2]), v3 = fabsf(in[i + 3]);
        a0 = a0 > v0 ? a0 : v0;
        a1 = a1 > v1 ? a1 : v1;
        a2 = a2 > v2 ? a2 : v2;
        a3 = a3 > v3 ? a3 : v3;
    }
    float tail = 0.0f;
    for (; i < n; i++) {
        float v = fabsf(in[i]);
        tail = tail > v ? tail : v;
    }
    float a01 = a0 > a1 ? a0 : a1, a23 = a2 > a3 ? a2 : a3;
    float head = a01 > a23 ? a01 : a23;
    return head > tail ? head : tail;
}

void birda_quantize_int16(const float* __restrict in, int64_t n,
                          int16_t* __restrict out, float* amax_out) {
    const int64_t BLK = 1 << 16;
    const int64_t nblk = (n + BLK - 1) / BLK;
    float amax = 0.0f;
#pragma omp parallel for reduction(max : amax) schedule(static)
    for (int64_t b = 0; b < nblk; b++) {
        const int64_t lo = b * BLK;
        const int64_t hi = lo + BLK > n ? n : lo + BLK;
        float m = amax_block(in + lo, hi - lo);
        if (m > amax) amax = m;
    }
    *amax_out = amax;
    if (amax < 1e-9f) {
        memset(out, 0, (size_t)n * sizeof(int16_t));
        return;
    }
    const float scale = 32767.0f / amax;
    // rintf rounds half-to-even (same as lrintf / np.round) and, unlike
    // lrintf, vectorizes under -fno-math-errno (~8x measured).
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; i++) {
        float v = in[i] * scale;
        v = v > 32767.0f ? 32767.0f : (v < -32767.0f ? -32767.0f : v);
        out[i] = (int16_t)(int32_t)rintf(v);
    }
}

// 16-bit PCM mono WAV writer (clipper output; reference uses hound).
int birda_write_wav16(const char* path, const float* samples, int64_t n,
                      int32_t rate, char* err, int errlen) {
    FILE* f = fopen(path, "wb");
    if (!f) {
        if (err && errlen > 0) snprintf(err, errlen, "cannot create file");
        return -1;
    }
    uint32_t data_bytes = (uint32_t)(n * 2);
    uint32_t riff_size = 36 + data_bytes;
    uint16_t fmt_pcm = 1, ch = 1, block = 2, bits = 16;
    uint32_t byte_rate = (uint32_t)rate * 2;
    uint32_t fmt_size = 16;
    bool ok = fwrite("RIFF", 1, 4, f) == 4 && fwrite(&riff_size, 4, 1, f) == 1 &&
              fwrite("WAVE", 1, 4, f) == 4 && fwrite("fmt ", 1, 4, f) == 4 &&
              fwrite(&fmt_size, 4, 1, f) == 1 && fwrite(&fmt_pcm, 2, 1, f) == 1 &&
              fwrite(&ch, 2, 1, f) == 1 && fwrite(&rate, 4, 1, f) == 1 &&
              fwrite(&byte_rate, 4, 1, f) == 1 && fwrite(&block, 2, 1, f) == 1 &&
              fwrite(&bits, 2, 1, f) == 1 && fwrite("data", 1, 4, f) == 4 &&
              fwrite(&data_bytes, 4, 1, f) == 1;
    if (ok) {
        std::vector<int16_t> pcm((size_t)n);
        for (int64_t i = 0; i < n; i++) {
            float v = samples[i];
            v = std::max(-1.0f, std::min(1.0f, v));
            pcm[(size_t)i] = (int16_t)lrintf(v * 32767.0f);
        }
        ok = fwrite(pcm.data(), 2, (size_t)n, f) == (size_t)n;
    }
    fclose(f);
    if (!ok) {
        if (err && errlen > 0) snprintf(err, errlen, "write failed");
        remove(path);
        return -1;
    }
    return 0;
}

}  // extern "C"
