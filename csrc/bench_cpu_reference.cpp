// Reference-class CPU throughput measurement for BASELINE config 1.
//
// The reference repository publishes no numbers (BASELINE.md) and its CPU
// binary needs Boost/OpenEXR/TBB which this image does not ship, so the CPU
// baseline is established empirically with this single-threaded marcher that
// performs the same per-sample work as the reference's hot path
// (SparseConvolutionNoiseMedium::intersectGP fixed-step march +
// GaussianProcessMedium::sampleDistance driver): per camera sample, a primary
// march through the bounded medium, a shadow-ray transmittance march, and a
// secondary march after the scatter — using the same noise evaluator as
// csrc/sparse_conv_oracle.cpp at the scene's step counts.
//
// Build/run: make -C csrc bench && ./csrc/bench_cpu_reference
// Output: samples/s (single thread).  bench.py's vs_baseline divides by
// (this number x cores) equivalent recorded in bench_baseline.json.

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cmath>

extern "C" void noise3d_world_se(const float*, const float*, const float*,
                                 int, uint32_t, float, float, int, float,
                                 float*);

namespace {

float eval_one(float x, float y, float z, uint32_t seed, float l) {
    float out;
    noise3d_world_se(&x, &y, &z, 1, seed, l, 3.0f, 3, 3.0f, &out);
    return out;
}

// sphere-in-box GPIS value: mean(|p-c|-r) + sigma * noise
float gpis(float x, float y, float z, uint32_t seed) {
    const float cx = 0.f, cy = 0.9f, cz = 0.f, r = 0.45f;
    const float dx = x - cx, dy = y - cy, dz = z - cz;
    const float mean = std::sqrt(dx * dx + dy * dy + dz * dz) - r;
    return mean + 0.06f * eval_one(x, y, z, seed, 0.12f);
}

// one fixed-step march over [0, far] at step 0.02 (scene config)
bool march(float ox, float oy, float oz, float dx, float dy, float dz,
           float far, uint32_t seed, float* t_hit) {
    const float step = 0.02f;
    float f0 = gpis(ox, oy, oz, seed);
    int s0 = f0 < 0 ? -1 : 1;
    for (float t = step * 0.5f; t < far; t += step) {
        float f = gpis(ox + t * dx, oy + t * dy, oz + t * dz, seed);
        if ((f < 0 ? -1 : 1) != s0) {
            // secant refinement, reference style (~3 extra evals)
            for (int i = 0; i < 3; ++i)
                (void)gpis(ox + (t - step * 0.5f) * dx,
                           oy + (t - step * 0.5f) * dy,
                           oz + (t - step * 0.5f) * dz, seed);
            *t_hit = t;
            return true;
        }
    }
    *t_hit = far;
    return false;
}

}  // namespace

int main() {
    const int n_samples = 300;
    const float far = 2.6f;  // typical in-cube chord for the bench scene

    auto t0 = std::chrono::steady_clock::now();
    double acc = 0.0;
    for (int i = 0; i < n_samples; ++i) {
        uint32_t seed = 42u + (uint32_t)i;
        float t;
        // primary march
        bool hit = march(0.2f, 0.4f, 1.3f, 0.05f, 0.02f, -1.0f, far, seed, &t);
        // NEE shadow transmittance march (volume vertex -> light)
        march(0.2f, 0.4f + 0.1f, 1.3f - t, 0.1f, 0.9f, 0.2f, 1.4f, seed + 1,
              &t);
        // continuation march after the scatter
        march(0.2f, 0.5f, 0.4f, -0.3f, 0.2f, 0.9f, far * 0.6f, seed + 2, &t);
        acc += t;
    }
    auto t1 = std::chrono::steady_clock::now();
    double dt = std::chrono::duration<double>(t1 - t0).count();
    std::printf("{\"cpu_reference_samples_per_s\": %.2f, \"checksum\": %.3f}\n",
                n_samples / dt, acc);
    return 0;
}
