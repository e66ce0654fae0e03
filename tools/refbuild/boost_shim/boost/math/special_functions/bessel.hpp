// Minimal boost::math bessel shim backed by libstdc++ TR1 special functions.
#pragma once
#include <cmath>

namespace boost { namespace math {

// K_{-v} == K_v, so take |v| (libstdc++ requires v >= 0)
inline double cyl_bessel_k(double v, double x) { return std::cyl_bessel_k(std::fabs(v), x); }
inline float cyl_bessel_k(float v, float x) { return std::cyl_bessel_kf(std::fabs(v), x); }
inline double cyl_bessel_k(int v, double x) { return std::cyl_bessel_k(std::fabs((double)v), x); }
inline float cyl_bessel_k(int v, float x) { return std::cyl_bessel_kf(std::fabs((float)v), x); }

}} // namespace boost::math
