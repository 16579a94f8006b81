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
 *   ring_*: single-producer single-consumer byte ring buffer for per-request
 *           chunk queues
 */

#include <stdint.h>
#include <stdlib.h>
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

/* ---- SPSC byte ring buffer ------------------------------------------- */

typedef struct {
    uint8_t *buf;
    uint64_t cap;       /* power of two */
    volatile uint64_t head; /* write index (producer) */
    volatile uint64_t tail; /* read index (consumer) */
} ring_t;

EXPORT ring_t *ring_new(uint64_t capacity) {
    uint64_t cap = 1;
    while (cap < capacity) cap <<= 1;
    ring_t *r = (ring_t *)malloc(sizeof(ring_t));
    if (!r) return NULL;
    r->buf = (uint8_t *)malloc(cap);
    if (!r->buf) { free(r); return NULL; }
    r->cap = cap;
    r->head = 0;
    r->tail = 0;
    return r;
}

EXPORT void ring_free(ring_t *r) {
    if (r) { free(r->buf); free(r); }
}

EXPORT uint64_t ring_size(const ring_t *r) { return r->head - r->tail; }

EXPORT uint64_t ring_space(const ring_t *r) { return r->cap - ring_size(r); }

EXPORT int64_t ring_write(ring_t *r, const uint8_t *src, uint64_t n) {
    if (n > ring_space(r)) return -1;
    uint64_t mask = r->cap - 1;
    uint64_t pos = r->head & mask;
    uint64_t first = n < (r->cap - pos) ? n : (r->cap - pos);
    memcpy(r->buf + pos, src, first);
    memcpy(r->buf, src + first, n - first);
    __sync_synchronize();
    r->head += n;
    return (int64_t)n;
}

EXPORT int64_t ring_read(ring_t *r, uint8_t *dst, uint64_t n) {
    uint64_t avail = ring_size(r);
    if (n > avail) n = avail;
    uint64_t mask = r->cap - 1;
    uint64_t pos = r->tail & mask;
    uint64_t first = n < (r->cap - pos) ? n : (r->cap - pos);
    memcpy(dst, r->buf + pos, first);
    memcpy(dst + first, r->buf, n - first);
    __sync_synchronize();
    r->tail += n;
    return (int64_t)n;
}
