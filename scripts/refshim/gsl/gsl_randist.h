// Minimal GSL shim: the rng + bivariate gaussian sampler used by the
// reference's realisticEye camera (cameras/realisticEye.{h,cpp}).  The
// checkout has no vendored GSL and the image has no system GSL; this
// header provides a behavior-compatible subset (different random
// stream, same distribution).
#ifndef GSL_SHIM_RANDIST_H
#define GSL_SHIM_RANDIST_H

#include <cmath>
#include <cstdlib>
#include <random>

struct gsl_rng_type {
    const char *name;
};

struct gsl_rng {
    std::mt19937_64 gen;
};

inline const gsl_rng_type *gsl_rng_default_() {
    static gsl_rng_type t = {"shim-mt19937"};
    return &t;
}
#define gsl_rng_default gsl_rng_default_()

inline void gsl_rng_env_setup(void) {}

inline gsl_rng *gsl_rng_alloc(const gsl_rng_type *) {
    return new gsl_rng();
}

inline void gsl_rng_free(gsl_rng *r) { delete r; }

// correlated bivariate gaussian (gsl/randist/bigauss.c semantics)
inline void gsl_ran_bivariate_gaussian(gsl_rng *r, double sigma_x,
                                       double sigma_y, double rho,
                                       double *x, double *y) {
    std::normal_distribution<double> n01(0.0, 1.0);
    double u = n01(r->gen), v = n01(r->gen);
    *x = sigma_x * u;
    *y = sigma_y * (rho * u + std::sqrt(1.0 - rho * rho) * v);
}

#endif
