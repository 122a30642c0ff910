#ifndef STUB_CVODE_DENSE_H
#define STUB_CVODE_DENSE_H
#include "cvode/cvode.h"
static inline int CVDense(void *m, long int n) {
  (void)m; (void)n; return CV_SUCCESS;
}
static inline int CVDlsSetDenseJacFn(void *m, CVDlsDenseJacFn j) {
  (void)m; (void)j; return CV_SUCCESS;
}
static inline int CVDlsSetLinearSolver(void *m, SUNLinearSolver ls,
                                       SUNMatrix A) {
  (void)m; (void)ls; (void)A; return CV_SUCCESS;
}
static inline int CVDlsSetJacFn(void *m, CVLsJacFn j) {
  (void)m; (void)j; return CV_SUCCESS;
}
#endif
