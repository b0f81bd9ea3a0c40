// Minimal GSL shim (errno part) — see gsl_roots.h for the rationale.
#ifndef GSL_SHIM_ERRNO_H
#define GSL_SHIM_ERRNO_H

#define GSL_SUCCESS 0
#define GSL_FAILURE -1
#define GSL_CONTINUE -2
#define GSL_EINVAL 4

typedef void gsl_error_handler_t(const char *, const char *, int, int);
inline gsl_error_handler_t *gsl_set_error_handler_off(void) { return 0; }

#endif
