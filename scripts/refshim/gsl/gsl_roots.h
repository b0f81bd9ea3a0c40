// Minimal GSL shim: the 1-D bracketing root solver used by the
// reference's realisticEye camera for biconic surface intersections
// (cameras/realisticEye.cpp).  Implements the fsolver API over plain
// bisection — same bracket-shrinking contract as GSL's Brent solver,
// a few more iterations to converge (bounded by the caller's loop).
#ifndef GSL_SHIM_ROOTS_H
#define GSL_SHIM_ROOTS_H

#include <cmath>

#include "gsl_errno.h"

struct gsl_function {
    double (*function)(double x, void *params);
    void *params;
};
#define GSL_FN_EVAL(F, x) ((F)->function(x, (F)->params))

struct gsl_root_fsolver_type {
    const char *name;
};

inline const gsl_root_fsolver_type *gsl_root_fsolver_brent_() {
    static gsl_root_fsolver_type t = {"shim-bisection"};
    return &t;
}
#define gsl_root_fsolver_brent gsl_root_fsolver_brent_()

struct gsl_root_fsolver {
    const gsl_root_fsolver_type *type;
    gsl_function *function;
    double root, x_lower, x_upper, f_lower, f_upper;
};

inline gsl_root_fsolver *gsl_root_fsolver_alloc(
        const gsl_root_fsolver_type *t) {
    gsl_root_fsolver *s = new gsl_root_fsolver();
    s->type = t;
    return s;
}

inline void gsl_root_fsolver_free(gsl_root_fsolver *s) { delete s; }

inline const char *gsl_root_fsolver_name(const gsl_root_fsolver *s) {
    return s->type->name;
}

inline int gsl_root_fsolver_set(gsl_root_fsolver *s, gsl_function *f,
                                double lo, double hi) {
    s->function = f;
    s->x_lower = lo;
    s->x_upper = hi;
    s->f_lower = GSL_FN_EVAL(f, lo);
    s->f_upper = GSL_FN_EVAL(f, hi);
    s->root = 0.5 * (lo + hi);
    if ((s->f_lower < 0.0 && s->f_upper < 0.0) ||
        (s->f_lower > 0.0 && s->f_upper > 0.0))
        return GSL_EINVAL;     // endpoints do not straddle a root
    return GSL_SUCCESS;
}

inline int gsl_root_fsolver_iterate(gsl_root_fsolver *s) {
    double m = 0.5 * (s->x_lower + s->x_upper);
    double fm = GSL_FN_EVAL(s->function, m);
    if (fm == 0.0) {
        s->x_lower = s->x_upper = m;
    } else if ((fm < 0.0) == (s->f_lower < 0.0)) {
        s->x_lower = m;
        s->f_lower = fm;
    } else {
        s->x_upper = m;
        s->f_upper = fm;
    }
    s->root = 0.5 * (s->x_lower + s->x_upper);
    return GSL_SUCCESS;
}

inline double gsl_root_fsolver_root(const gsl_root_fsolver *s) {
    return s->root;
}
inline double gsl_root_fsolver_x_lower(const gsl_root_fsolver *s) {
    return s->x_lower;
}
inline double gsl_root_fsolver_x_upper(const gsl_root_fsolver *s) {
    return s->x_upper;
}

inline int gsl_root_test_interval(double lo, double hi, double epsabs,
                                  double epsrel) {
    double w = std::fabs(hi - lo);
    double mn = std::fmin(std::fabs(lo), std::fabs(hi));
    return (w < epsabs + epsrel * mn) ? GSL_SUCCESS : GSL_CONTINUE;
}

#endif
