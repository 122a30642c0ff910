/* Minimal functional stand-in for the GSL interpolation API used by
 * PION's tools/interpolate.cpp (natural cubic spline).  Not GSL. */
#ifndef STUB_GSL_INTERP_H
#define STUB_GSL_INTERP_H
#include <stdlib.h>
#include <string.h>
typedef struct { int unused; } gsl_interp_accel;
typedef struct { int id; } gsl_interp_type;
static const gsl_interp_type gsl_interp_cspline_s = {1};
#define gsl_interp_cspline (&gsl_interp_cspline_s)
static inline gsl_interp_accel *gsl_interp_accel_alloc(void) {
  return (gsl_interp_accel *)calloc(1, sizeof(gsl_interp_accel));
}
static inline void gsl_interp_accel_free(gsl_interp_accel *a) { free(a); }
#endif
