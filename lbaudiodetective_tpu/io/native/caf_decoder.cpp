// Native host decode library: CAF container parsing, IMA4 ADPCM / LPCM
// decoding, and polyphase rational resampling.
//
// This is the framework's native runtime component, replacing the reference's
// reliance on Apple AudioToolbox (ExtAudioFileOpenURL/Read + implicit SRC,
// LBAudioDetective.m:224-288).  Exposed as a C ABI consumed via ctypes
// (lbaudiodetective_tpu/io/native/binding.py); semantics match the NumPy
// fallback in io/caf.py and io/resample.py (validated by
// tests/test_native_decoder.py).
//
// Build: make -C lbaudiodetective_tpu/io/native   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

inline uint16_t be16(const uint8_t* p) {
    return static_cast<uint16_t>((p[0] << 8) | p[1]);
}
inline uint32_t be32(const uint8_t* p) {
    return (static_cast<uint32_t>(p[0]) << 24) | (p[1] << 16) | (p[2] << 8) | p[3];
}
inline uint64_t be64(const uint8_t* p) {
    return (static_cast<uint64_t>(be32(p)) << 32) | be32(p + 4);
}
inline double be_f64(const uint8_t* p) {
    uint64_t bits = be64(p);
    double d;
    std::memcpy(&d, &bits, 8);
    return d;
}

const int kIndexTable[16] = {-1, -1, -1, -1, 2, 4, 6, 8,
                             -1, -1, -1, -1, 2, 4, 6, 8};
const int kStepTable[89] = {
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37, 41,
    45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173, 190,
    209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658, 724,
    796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066, 2272,
    2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132,
    7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500,
    20350, 22385, 24623, 27086, 29794, 32767};

inline int clamp(int v, int lo, int hi) {
    return v < lo ? lo : (v > hi ? hi : v);
}

// Decode mono Apple IMA4: 34-byte packets = 2-byte BE state header + 32
// nibble bytes, low nibble first (see io/caf.py decode_ima4).
void decode_ima4(const uint8_t* data, size_t size, int64_t valid_frames,
                 std::vector<float>* out) {
    const size_t packets = size / 34;
    out->reserve(packets * 64);
    for (size_t pk = 0; pk < packets; ++pk) {
        const uint8_t* p = data + pk * 34;
        uint16_t header = be16(p);
        int predictor = static_cast<int16_t>(header & 0xFF80);
        int index = clamp(header & 0x7F, 0, 88);
        for (int i = 0; i < 32; ++i) {
            uint8_t byte = p[2 + i];
            for (int half = 0; half < 2; ++half) {
                int nib = half ? (byte >> 4) : (byte & 0x0F);
                int step = kStepTable[index];
                int diff = step >> 3;
                if (nib & 1) diff += step >> 2;
                if (nib & 2) diff += step >> 1;
                if (nib & 4) diff += step;
                if (nib & 8) diff = -diff;
                predictor = clamp(predictor + diff, -32768, 32767);
                index = clamp(index + kIndexTable[nib], 0, 88);
                out->push_back(static_cast<float>(predictor) / 32768.0f);
            }
        }
    }
    if (valid_frames >= 0 && static_cast<size_t>(valid_frames) < out->size())
        out->resize(static_cast<size_t>(valid_frames));
}

// ITU-T G.711 expansion (same scalar formulas as io/g711.py; the NumPy
// path builds its 256-entry tables from them, so the two paths agree
// bit-exactly).
inline int mulaw_expand(uint8_t u8) {
    int u = ~u8 & 0xFF;
    int sign = u & 0x80;
    int exponent = (u >> 4) & 0x07;
    int mantissa = u & 0x0F;
    int t = (((mantissa << 3) + 0x84) << exponent) - 0x84;
    return sign ? -t : t;
}
inline int alaw_expand(uint8_t a8) {
    int a = a8 ^ 0x55;
    int sign = a & 0x80;
    int seg = (a >> 4) & 0x07;
    int t = (a & 0x0F) << 4;
    if (seg == 0) t += 8;
    else if (seg == 1) t += 0x108;
    else t = (t + 0x108) << (seg - 1);
    return sign ? t : -t;
}

void decode_g711(const uint8_t* data, size_t size, bool mulaw,
                 uint32_t channels, int64_t valid_frames,
                 std::vector<float>* out) {
    const size_t frames = size / channels;
    out->resize(frames);
    for (size_t f = 0; f < frames; ++f) {
        double acc = 0.0;
        for (uint32_t ch = 0; ch < channels; ++ch) {
            uint8_t b = data[f * channels + ch];
            acc += (mulaw ? mulaw_expand(b) : alaw_expand(b)) / 32768.0;
        }
        (*out)[f] = static_cast<float>(acc / channels);
    }
    if (valid_frames >= 0 && static_cast<size_t>(valid_frames) < out->size())
        out->resize(static_cast<size_t>(valid_frames));
}

void decode_lpcm(const uint8_t* data, size_t size, uint32_t flags,
                 uint32_t bits, uint32_t channels, std::vector<float>* out) {
    const bool is_float = flags & 1;
    const bool little = flags & 2;
    const size_t bytes = bits / 8;
    const size_t frames = size / (bytes * channels);
    out->resize(frames);
    for (size_t f = 0; f < frames; ++f) {
        double acc = 0.0;
        for (uint32_t ch = 0; ch < channels; ++ch) {
            const uint8_t* p = data + (f * channels + ch) * bytes;
            uint8_t buf[8];
            if (little) {
                std::memcpy(buf, p, bytes);
            } else {
                for (size_t i = 0; i < bytes; ++i) buf[i] = p[bytes - 1 - i];
            }
            double v = 0.0;
            if (is_float && bits == 32) {
                float x;
                std::memcpy(&x, buf, 4);
                v = x;
            } else if (is_float && bits == 64) {
                double x;
                std::memcpy(&x, buf, 8);
                v = x;
            } else if (bits == 16) {
                int16_t x;
                std::memcpy(&x, buf, 2);
                v = x / 32768.0;
            } else if (bits == 32) {
                int32_t x;
                std::memcpy(&x, buf, 4);
                v = x / 2147483648.0;
            }
            acc += v;
        }
        (*out)[f] = static_cast<float>(acc / channels);
    }
}

}  // namespace

extern "C" {

// Returns 0 on success.  *out_samples is malloc'd; free with lbad_free.
int lbad_read_caf(const char* path, float** out_samples, int64_t* out_n,
                  double* out_rate) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return 1;
    std::fseek(f, 0, SEEK_END);
    long fsize = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    std::vector<uint8_t> raw(static_cast<size_t>(fsize));
    if (std::fread(raw.data(), 1, raw.size(), f) != raw.size()) {
        std::fclose(f);
        return 2;
    }
    std::fclose(f);

    if (raw.size() < 8 || std::memcmp(raw.data(), "caff", 4) != 0) return 3;

    double rate = 0.0;
    char fmt[5] = {0};
    uint32_t flags = 0, bits = 0, channels = 1;
    int64_t valid_frames = -1;
    const uint8_t* data_chunk = nullptr;
    size_t data_size = 0;

    size_t off = 8;
    while (off + 12 <= raw.size()) {
        const uint8_t* hdr = raw.data() + off;
        int64_t csize = static_cast<int64_t>(be64(hdr + 4));
        size_t payload = off + 12;
        if (csize < 0) csize = static_cast<int64_t>(raw.size() - payload);
        // Clamp truncated chunks to the bytes actually present (a cut file
        // must decode its surviving prefix, not read past the buffer).
        if (payload + static_cast<size_t>(csize) > raw.size())
            csize = static_cast<int64_t>(raw.size() - payload);
        if (std::memcmp(hdr, "desc", 4) == 0 && payload + 32 <= raw.size()) {
            rate = be_f64(raw.data() + payload);
            std::memcpy(fmt, raw.data() + payload + 8, 4);
            flags = be32(raw.data() + payload + 12);
            channels = be32(raw.data() + payload + 24);
            bits = be32(raw.data() + payload + 28);
        } else if (std::memcmp(hdr, "pakt", 4) == 0 && payload + 24 <= raw.size()) {
            valid_frames = static_cast<int64_t>(be64(raw.data() + payload + 8));
        } else if (std::memcmp(hdr, "data", 4) == 0 && csize > 4) {
            data_chunk = raw.data() + payload + 4;  // skip edit count
            data_size = static_cast<size_t>(csize) - 4;
        }
        off = payload + static_cast<size_t>(csize);
    }
    if (!data_chunk || rate == 0.0) return 4;

    std::vector<float> samples;
    if (std::strcmp(fmt, "ima4") == 0) {
        if (channels != 1) return 5;
        decode_ima4(data_chunk, data_size, valid_frames, &samples);
    } else if (std::strcmp(fmt, "lpcm") == 0) {
        decode_lpcm(data_chunk, data_size, flags, bits, channels, &samples);
    } else if (std::strcmp(fmt, "ulaw") == 0 || std::strcmp(fmt, "alaw") == 0) {
        if (channels < 1) return 5;
        decode_g711(data_chunk, data_size, fmt[0] == 'u', channels,
                    valid_frames, &samples);
    } else {
        return 6;
    }

    *out_n = static_cast<int64_t>(samples.size());
    *out_samples = static_cast<float*>(std::malloc(samples.size() * sizeof(float)));
    if (!*out_samples) return 7;
    std::memcpy(*out_samples, samples.data(), samples.size() * sizeof(float));
    *out_rate = rate;
    return 0;
}

// Polyphase rational resampling with a caller-provided filter bank
// [up, taps] (same plan arithmetic as io/resample.py: output n reads padded
// input at base = floor(n*down/up) - (taps/2 - 1), phase = (n*down) % up).
int lbad_resample(const float* x, int64_t n_in, const float* bank,
                  int64_t up, int64_t down, int64_t taps, float* out,
                  int64_t n_out) {
    std::vector<float> padded(static_cast<size_t>(n_in) + 2 * taps, 0.0f);
    std::memcpy(padded.data() + taps, x, static_cast<size_t>(n_in) * sizeof(float));
    const int64_t half = taps / 2;
    for (int64_t n = 0; n < n_out; ++n) {
        const int64_t num = n * down;
        const int64_t i0 = num / up;
        const int64_t phase = num - i0 * up;
        const float* w = bank + phase * taps;
        const float* src = padded.data() + (i0 - (half - 1)) + taps;
        // Pairwise-ish accumulation in double keeps parity with NumPy einsum
        // within float32 rounding.
        double acc = 0.0;
        for (int64_t t = 0; t < taps; ++t) acc += static_cast<double>(src[t]) * w[t];
        out[n] = static_cast<float>(acc);
    }
    return 0;
}

void lbad_free(float* p) { std::free(p); }
}
