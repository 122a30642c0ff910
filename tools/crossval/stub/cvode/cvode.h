/* Non-functional CVODE stand-in: compiles PION's wrapper; integration
 * calls fail loudly.  Pure-hydro binaries never reach them. */
#ifndef STUB_CVODE_H
#define STUB_CVODE_H
#include "sundials/sundials_types.h"
#include "nvector/nvector_serial.h"
#include "sundials/sundials_dense.h"
#include <stdio.h>
#define CV_BDF 2
#define CV_NEWTON 2
#define CV_SUCCESS 0
#define CV_NORMAL 1
#define CV_ONE_STEP 2
typedef int (*CVRhsFn)(realtype, N_Vector, N_Vector, void *);
typedef int (*CVDlsDenseJacFn)(long int, realtype, N_Vector, N_Vector,
                               DlsMat, void *, N_Vector, N_Vector, N_Vector);
typedef int (*CVLsJacFn)(realtype, N_Vector, N_Vector, SUNMatrix, void *,
                         N_Vector, N_Vector, N_Vector);
static inline void *CVodeCreate(int lmm) { (void)lmm; return calloc(1, 8); }
static inline int CVodeInit(void *m, CVRhsFn f, realtype t, N_Vector y) {
  (void)m; (void)f; (void)t; (void)y; return CV_SUCCESS;
}
static inline int CVodeReInit(void *m, realtype t, N_Vector y) {
  (void)m; (void)t; (void)y; return CV_SUCCESS;
}
static inline int CVodeSVtolerances(void *m, realtype r, N_Vector a) {
  (void)m; (void)r; (void)a; return CV_SUCCESS;
}
static inline int CVodeSetUserData(void *m, void *d) {
  (void)m; (void)d; return CV_SUCCESS;
}
static inline int CVodeSetLinearSolver(void *m, SUNLinearSolver ls,
                                       SUNMatrix A) {
  (void)m; (void)ls; (void)A; return CV_SUCCESS;
}
static inline int CVodeSetJacFn(void *m, CVLsJacFn j) {
  (void)m; (void)j; return CV_SUCCESS;
}
static inline int CVode(void *m, realtype tout, N_Vector y, realtype *t,
                        int task) {
  (void)m; (void)tout; (void)y; (void)t; (void)task;
  fprintf(stderr, "STUB CVode called: chemistry disabled in this build\n");
  return -99;
}
static inline void CVodeFree(void **m) { if (m && *m) { free(*m); *m = 0; } }
#endif
