// Native decode helpers for the BrainVision reader (eegflow.data.brainvision).
//
// The reference pipeline relied on MNE's C-backed parser for its data loading
// (ref 02_preprocessing.py:198); eegflow's equivalent native layer is this
// small library: the hot decode path (int16 counts -> scaled float32 volts,
// including the de-multiplexing transpose) runs in C++ with OpenMP across
// channels, called through ctypes with a pure-numpy fallback.
//
// Build: make -C native   (produces libeegflow_native.so)

#include <cstdint>
#include <cstddef>

extern "C" {

// in:     (n_ch, n_t) int16, channel-major (already transposed by caller)
// scale:  (n_ch,) per-channel resolution*unit factor (volts per count)
// out:    (n_ch, n_t) float32 volts
void scale_int16(const int16_t* in, const double* scale, float* out,
                 int64_t n_ch, int64_t n_t) {
#pragma omp parallel for schedule(static)
    for (int64_t c = 0; c < n_ch; ++c) {
        const double s = scale[c];
        const int16_t* row_in = in + c * n_t;
        float* row_out = out + c * n_t;
        for (int64_t t = 0; t < n_t; ++t) {
            row_out[t] = static_cast<float>(row_in[t] * s);
        }
    }
}

// Fused de-multiplex + scale: raw is the on-disk MULTIPLEXED layout
// (n_t frames x n_ch samples); output is channel-major (n_ch, n_t) float32.
// Blocked over time for cache-friendly strided reads.
void demux_scale_int16(const int16_t* raw, const double* scale, float* out,
                       int64_t n_ch, int64_t n_t) {
    const int64_t BLOCK = 1024;
#pragma omp parallel for schedule(static)
    for (int64_t c = 0; c < n_ch; ++c) {
        const double s = scale[c];
        float* row_out = out + c * n_t;
        for (int64_t t0 = 0; t0 < n_t; t0 += BLOCK) {
            const int64_t t1 = (t0 + BLOCK < n_t) ? t0 + BLOCK : n_t;
            for (int64_t t = t0; t < t1; ++t) {
                row_out[t] = static_cast<float>(raw[t * n_ch + c] * s);
            }
        }
    }
}

}  // extern "C"
