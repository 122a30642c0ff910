/* Non-functional stand-in: enough to compile PION's cvode wrapper.  Any
 * attempt to actually integrate returns an error (chemistry modules are
 * not exercised in the pure-hydro cross-validation build). */
#ifndef STUB_NVECTOR_SERIAL_H
#define STUB_NVECTOR_SERIAL_H
#include "sundials/sundials_types.h"
#include <stdlib.h>
typedef struct _N_Vector { realtype *data; sunindextype n; } *N_Vector;
static inline N_Vector N_VNew_Serial(sunindextype n) {
  N_Vector v = (N_Vector)calloc(1, sizeof(struct _N_Vector));
  v->data = (realtype *)calloc((size_t)n, sizeof(realtype));
  v->n = n;
  return v;
}
static inline void N_VDestroy_Serial(N_Vector v) {
  if (v) { free(v->data); free(v); }
}
static inline void N_VDestroy(N_Vector v) { N_VDestroy_Serial(v); }
#define NV_DATA_S(v) ((v)->data)
#define NV_LENGTH_S(v) ((v)->n)
#define NV_Ith_S(v, i) ((v)->data[i])
#endif
