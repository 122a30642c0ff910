/* Natural cubic spline matching gsl_spline semantics closely enough for
 * PION's table interpolation (tools/interpolate.cpp). */
#ifndef STUB_GSL_SPLINE_H
#define STUB_GSL_SPLINE_H
#include "gsl/gsl_interp.h"
#include <math.h>
typedef struct {
  size_t n;
  double *x, *y, *c; /* c = second derivatives */
} gsl_spline;
static inline gsl_spline *gsl_spline_alloc(const gsl_interp_type *t,
                                           size_t n) {
  (void)t;
  gsl_spline *s = (gsl_spline *)calloc(1, sizeof(gsl_spline));
  s->n = n;
  s->x = (double *)calloc(n, sizeof(double));
  s->y = (double *)calloc(n, sizeof(double));
  s->c = (double *)calloc(n, sizeof(double));
  return s;
}
static inline int gsl_spline_init(gsl_spline *s, const double *x,
                                  const double *y, size_t n) {
  size_t i;
  double *u = (double *)calloc(n, sizeof(double));
  memcpy(s->x, x, n * sizeof(double));
  memcpy(s->y, y, n * sizeof(double));
  s->n = n;
  s->c[0] = u[0] = 0.0; /* natural BC */
  for (i = 1; i + 1 < n; i++) {
    double sig = (x[i] - x[i - 1]) / (x[i + 1] - x[i - 1]);
    double p = sig * s->c[i - 1] + 2.0;
    s->c[i] = (sig - 1.0) / p;
    u[i] = (y[i + 1] - y[i]) / (x[i + 1] - x[i]) -
           (y[i] - y[i - 1]) / (x[i] - x[i - 1]);
    u[i] = (6.0 * u[i] / (x[i + 1] - x[i - 1]) - sig * u[i - 1]) / p;
  }
  s->c[n - 1] = 0.0;
  for (i = n - 1; i-- > 0;) s->c[i] = s->c[i] * s->c[i + 1] + u[i];
  free(u);
  return 0;
}
static inline int gsl_spline_eval_e(const gsl_spline *s, double xv,
                                    gsl_interp_accel *a, double *out) {
  (void)a;
  size_t lo = 0, hi = s->n - 1;
  if (xv < s->x[0] || xv > s->x[hi]) { /* GSL errors out of domain */
    *out = (xv < s->x[0]) ? s->y[0] : s->y[hi];
    return 1;
  }
  while (hi - lo > 1) {
    size_t mid = (hi + lo) >> 1;
    if (s->x[mid] > xv) hi = mid; else lo = mid;
  }
  double h = s->x[hi] - s->x[lo];
  double A = (s->x[hi] - xv) / h, B = (xv - s->x[lo]) / h;
  *out = A * s->y[lo] + B * s->y[hi] +
         ((A * A * A - A) * s->c[lo] + (B * B * B - B) * s->c[hi]) *
             (h * h) / 6.0;
  return 0;
}
static inline void gsl_spline_free(gsl_spline *s) {
  if (s) { free(s->x); free(s->y); free(s->c); free(s); }
}
#endif
