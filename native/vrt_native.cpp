// vrt_native: host-side native runtime components.
//
// The reference's host runtime is C++ throughout; the pieces that are
// genuinely hot on the host side here get native implementations, bound
// via ctypes (no pybind11 in this environment):
//
//  1. A hierarchical scoped-event profiler ring — the analog of the
//     reference's CPUProfiler (source/profiler/Profiler.cpp:409-490):
//     QueryPerformanceCounter -> clock_gettime(CLOCK_MONOTONIC),
//     TLS event stack for nesting depth, fixed per-frame event arrays in
//     a frame ring, atomic event allocation so worker threads (asset IO)
//     can record concurrently.
//  2. Deterministic fBm value-noise heightmap generation for large
//     resolutions (the media/terrain_heightmap.png stand-in at 2K/4K,
//     where the numpy path's per-octave temporaries start to hurt).
//
// Build: native/Makefile (g++ -O3 -shared -fPIC). Loaded lazily by
// vrenderer_tpu/utils/native.py with a pure-Python fallback.

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <ctime>

namespace {

inline uint64_t now_ns() {
    timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return static_cast<uint64_t>(ts.tv_sec) * 1000000000ull + ts.tv_nsec;
}

constexpr int kMaxNameLen = 64;
constexpr int kMaxDepth = 32;  // matches the reference's TLS stack cap

struct Event {
    uint64_t begin_ns;
    uint64_t end_ns;
    int32_t depth;
    int32_t frame;
    char name[kMaxNameLen];
};

struct Profiler {
    Event* events = nullptr;
    int32_t capacity = 0;
    std::atomic<int32_t> count{0};
    int32_t frame = 0;
    // single-threaded scope stack (the render loop); worker threads use
    // begin/end pairs with explicit indices
    int32_t stack[kMaxDepth];
    int32_t stack_depth = 0;
};

Profiler g_prof;

}  // namespace

extern "C" {

// --- profiler ---------------------------------------------------------

int vrt_profiler_init(int capacity) {
    delete[] g_prof.events;
    g_prof.events = new Event[capacity];
    g_prof.capacity = capacity;
    g_prof.count.store(0);
    g_prof.frame = 0;
    g_prof.stack_depth = 0;
    return 0;
}

void vrt_profiler_new_frame() {
    g_prof.frame += 1;
}

int vrt_profiler_begin(const char* name) {
    int32_t idx = g_prof.count.fetch_add(1);
    if (idx >= g_prof.capacity) {
        g_prof.count.fetch_sub(1);
        return -1;
    }
    Event& e = g_prof.events[idx];
    e.begin_ns = now_ns();
    e.end_ns = 0;
    e.frame = g_prof.frame;
    e.depth = g_prof.stack_depth;
    std::strncpy(e.name, name, kMaxNameLen - 1);
    e.name[kMaxNameLen - 1] = '\0';
    if (g_prof.stack_depth < kMaxDepth) {
        g_prof.stack[g_prof.stack_depth] = idx;
    }
    g_prof.stack_depth += 1;
    return idx;
}

void vrt_profiler_end() {
    if (g_prof.stack_depth <= 0) return;
    g_prof.stack_depth -= 1;
    if (g_prof.stack_depth < kMaxDepth) {
        int32_t idx = g_prof.stack[g_prof.stack_depth];
        g_prof.events[idx].end_ns = now_ns();
    }
}

int vrt_profiler_count() { return g_prof.count.load(); }

// copy events out: per event [begin_ns, end_ns, depth, frame] + names
void vrt_profiler_dump(uint64_t* times, int32_t* meta, char* names) {
    int n = g_prof.count.load();
    for (int i = 0; i < n; ++i) {
        const Event& e = g_prof.events[i];
        times[2 * i] = e.begin_ns;
        times[2 * i + 1] = e.end_ns;
        meta[2 * i] = e.depth;
        meta[2 * i + 1] = e.frame;
        std::memcpy(names + i * kMaxNameLen, e.name, kMaxNameLen);
    }
}

void vrt_profiler_reset() {
    g_prof.count.store(0);
    g_prof.stack_depth = 0;
}

uint64_t vrt_now_ns() { return now_ns(); }

// --- fBm heightmap -----------------------------------------------------

namespace {

inline float hash2(int32_t x, int32_t y, uint32_t seed) {
    uint32_t h = seed;
    h ^= static_cast<uint32_t>(x) * 0x9E3779B9u;
    h = (h << 13) | (h >> 19);
    h ^= static_cast<uint32_t>(y) * 0x85EBCA6Bu;
    h *= 0xC2B2AE35u;
    h ^= h >> 16;
    return static_cast<float>(h & 0xFFFFFFu) / 16777215.0f;
}

inline float smooth(float t) { return t * t * (3.0f - 2.0f * t); }

}  // namespace

// Deterministic fBm value noise into out[res*res], values in [0, 1].
void vrt_fbm_heightmap(float* out, int res, uint32_t seed, int octaves,
                       float gain) {
    for (int i = 0; i < res * res; ++i) out[i] = 0.0f;
    float amp = 1.0f, total = 0.0f;
    int cells = 4;
    for (int o = 0; o < octaves && cells <= res / 2; ++o) {
        const float scale = static_cast<float>(cells) / res;
        for (int y = 0; y < res; ++y) {
            const float fy = y * scale;
            const int y0 = static_cast<int>(fy);
            const float ty = smooth(fy - y0);
            for (int x = 0; x < res; ++x) {
                const float fx = x * scale;
                const int x0 = static_cast<int>(fx);
                const float tx = smooth(fx - x0);
                const float a = hash2(x0, y0, seed + o);
                const float b = hash2(x0 + 1, y0, seed + o);
                const float c = hash2(x0, y0 + 1, seed + o);
                const float d = hash2(x0 + 1, y0 + 1, seed + o);
                const float v =
                    (a * (1 - tx) + b * tx) * (1 - ty)
                    + (c * (1 - tx) + d * tx) * ty;
                out[y * res + x] += amp * v;
            }
        }
        total += amp;
        amp *= gain;
        cells *= 2;
    }
    const float inv = total > 0 ? 1.0f / total : 1.0f;
    for (int i = 0; i < res * res; ++i) {
        float v = out[i] * inv;
        out[i] = v < 0 ? 0 : (v > 1 ? 1 : v);
    }
}

}  // extern "C"
