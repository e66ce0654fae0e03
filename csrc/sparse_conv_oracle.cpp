// Independent C++ oracle for the sparse-convolution noise evaluator.
//
// Role: the reference repository ships no test suite (SURVEY.md §4); its
// verification relied on embedded runtime checks.  Here the C++ oracle is an
// independent scalar implementation of the same math as
// tungsten_tpu/ops/sparse_conv_fast.py — same counter-based RNG (xxhash32
// streams), same cell/impulse layout, same SE splat and variance
// normalization — written from the math spec, used by tests/test_oracle.py to
// cross-check the JAX evaluator bit-close from a second language/compiler.
//
// Build: make -C csrc    (produces libscgpis_oracle.so; loaded via ctypes)

#include <cstdint>
#include <cmath>

namespace {

constexpr uint32_t P2 = 2246822519u, P3 = 3266489917u;
constexpr uint32_t P4 = 668265263u, P5 = 374761393u;

inline uint32_t rotl17(uint32_t x) { return (x << 17) | (x >> 15); }

inline uint32_t final_mix(uint32_t h) {
    h = P2 * (h ^ (h >> 15));
    h = P3 * (h ^ (h >> 13));
    return h ^ (h >> 16);
}

inline uint32_t xxhash32_2(uint32_t x, uint32_t y) {
    uint32_t h = y + P5 + x * P3;
    h = P4 * rotl17(h);
    return final_mix(h);
}

inline uint32_t xxhash32_4(uint32_t x, uint32_t y, uint32_t z, uint32_t w) {
    uint32_t h = w + P5 + x * P3;
    h = P4 * rotl17(h);
    h += y * P3;
    h = P4 * rotl17(h);
    h += z * P3;
    h = P4 * rotl17(h);
    return final_mix(h);
}

inline float u01(uint32_t u) {
    // top 24 bits, exactly representable in f32 (utils/rng.py u32_to_uniform)
    return (float)(u >> 8) * (1.0f / 16777216.0f);
}

inline float uniform(uint32_t key, uint32_t ctr) {
    return u01(xxhash32_2(key, ctr));
}

}  // namespace

extern "C" {

// World-space isotropic-covariance 3D noise value at n points.
// Matches ops/sparse_conv_fast.make_value_at for SquaredExponentialCov with
// aniso=(1,1,1): splat exp(-|ab|^2/(2 l_conv^2)), cell radius
// kernel_scale*l_conv, variance = imp/R^3 * pi^1.5 * l_conv^3.
void noise3d_world_se(const float* px, const float* py, const float* pz,
                      int n, uint32_t seed, float l, float impulse_density,
                      int impulse_count, float kernel_scale, float* out) {
    const float l_conv = l * 0.7071067811865476f;
    const float R = kernel_scale * l_conv;
    const float inv_r = 1.0f / R;
    const float inv_two_lconv2 = 0.5f / (l_conv * l_conv);
    const double dens = impulse_density / (double)(R * R * R);
    const double var = dens * std::pow(M_PI, 1.5) *
                       (double)(l_conv * l_conv * l_conv);
    const float inv_norm = 1.0f / (float)std::sqrt(var);

    for (int i = 0; i < n; ++i) {
        const float gx = px[i] * inv_r;
        const float gy = py[i] * inv_r;
        const float gz = pz[i] * inv_r;
        const float bx = std::floor(gx), by = std::floor(gy),
                    bz = std::floor(gz);
        const float fx = gx - bx, fy = gy - by, fz = gz - bz;
        const int32_t ix = (int32_t)bx, iy = (int32_t)by, iz = (int32_t)bz;

        float total = 0.0f;
        for (int dx = -1; dx <= 1; ++dx)
            for (int dy = -1; dy <= 1; ++dy)
                for (int dz = -1; dz <= 1; ++dz) {
                    const uint32_t cx = (uint32_t)(ix + dx);
                    const uint32_t cy = (uint32_t)(iy + dy);
                    const uint32_t cz = (uint32_t)(iz + dz);
                    const uint32_t h = xxhash32_4(cz, cy, cx, seed) + 1u;
                    const float qx = fx - (float)dx;
                    const float qy = fy - (float)dy;
                    const float qz = fz - (float)dz;
                    for (int k = 0; k < impulse_count; ++k) {
                        const float ux = uniform(h, 4 * k);
                        const float uy = uniform(h, 4 * k + 1);
                        const float uz = uniform(h, 4 * k + 2);
                        const float uw = uniform(h, 4 * k + 3);
                        const float ddx = qx - ux;
                        const float ddy = qy - uy;
                        const float ddz = qz - uz;
                        const float r2 = ddx * ddx + ddy * ddy + ddz * ddz;
                        if (r2 < 1.0f) {
                            const float w = uw < 0.5f ? -1.0f : 1.0f;
                            const float q = r2 * (R * R) * inv_two_lconv2;
                            total += w * std::exp(-q);
                        }
                    }
                }
        out[i] = total * inv_norm;
    }
}

// xxhash32 stream sanity exports (tests cross-check the Python RNG)
uint32_t oracle_xxhash32_2(uint32_t x, uint32_t y) { return xxhash32_2(x, y); }
uint32_t oracle_xxhash32_4(uint32_t x, uint32_t y, uint32_t z, uint32_t w) {
    return xxhash32_4(x, y, z, w);
}
float oracle_uniform(uint32_t key, uint32_t ctr) { return uniform(key, ctr); }

}  // extern "C"
