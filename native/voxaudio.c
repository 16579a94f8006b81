/* voxaudio — native audio hot path for the serving runtime.
 *
 * The API server converts and frames PCM for up to hundreds of concurrent
 * streams; doing it in C keeps the event loop free of numpy allocations and
 * gives deterministic latency. Exposed via ctypes (vox_serve_tpu/native.py),
 * with a numpy fallback when the shared object is unavailable.
 *
 * Functions:
 *   f32_to_i16(src, n, dst): clip to [-1, 1] and convert to int16 PCM
 *   i16_peak(src, n): max |sample| (silence/clipping diagnostics)
 *   wav_header(sample_rate, channels, bits, data_len, out44): RIFF header
 */

#include <stdint.h>
#include <string.h>

#ifdef _WIN32
#define EXPORT __declspec(dllexport)
#else
#define EXPORT __attribute__((visibility("default")))
#endif

EXPORT void f32_to_i16(const float *src, int64_t n, int16_t *dst) {
    for (int64_t i = 0; i < n; i++) {
        float x = src[i];
        if (x > 1.0f) x = 1.0f;
        if (x < -1.0f) x = -1.0f;
        dst[i] = (int16_t)(x * 32767.0f);
    }
}

EXPORT int16_t i16_peak(const int16_t *src, int64_t n) {
    int16_t peak = 0;
    for (int64_t i = 0; i < n; i++) {
        int16_t v = src[i] < 0 ? (int16_t)(-src[i]) : src[i];
        if (v > peak) peak = v;
    }
    return peak;
}

static void put_u32(uint8_t *p, uint32_t v) {
    p[0] = v & 0xff; p[1] = (v >> 8) & 0xff;
    p[2] = (v >> 16) & 0xff; p[3] = (v >> 24) & 0xff;
}

static void put_u16(uint8_t *p, uint16_t v) {
    p[0] = v & 0xff; p[1] = (v >> 8) & 0xff;
}

EXPORT void wav_header(uint32_t sample_rate, uint16_t channels,
                       uint16_t bits, uint32_t data_len, uint8_t *out44) {
    uint32_t byte_rate = sample_rate * channels * bits / 8;
    uint16_t block_align = (uint16_t)(channels * bits / 8);
    memcpy(out44, "RIFF", 4);
    put_u32(out44 + 4, 36 + data_len);
    memcpy(out44 + 8, "WAVEfmt ", 8);
    put_u32(out44 + 16, 16);
    put_u16(out44 + 20, 1); /* PCM */
    put_u16(out44 + 22, channels);
    put_u32(out44 + 24, sample_rate);
    put_u32(out44 + 28, byte_rate);
    put_u16(out44 + 32, block_align);
    put_u16(out44 + 34, bits);
    memcpy(out44 + 36, "data", 4);
    put_u32(out44 + 40, data_len);
}
