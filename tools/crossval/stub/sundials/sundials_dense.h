#ifndef STUB_SUNDIALS_DENSE_H
#define STUB_SUNDIALS_DENSE_H
#include "sundials/sundials_types.h"
#include "nvector/nvector_serial.h"
typedef struct _SUNMatrix { realtype *data; sunindextype m, n; } *SUNMatrix;
typedef struct _SUNLinearSolver { int unused; } *SUNLinearSolver;
typedef SUNMatrix DlsMat;
#define DENSE_ELEM(A, i, j) ((A)->data[(j) * (A)->m + (i)])
static inline SUNMatrix SUNDenseMatrix(sunindextype m, sunindextype n) {
  SUNMatrix A = (SUNMatrix)calloc(1, sizeof(struct _SUNMatrix));
  A->data = (realtype *)calloc((size_t)(m * n), sizeof(realtype));
  A->m = m; A->n = n;
  return A;
}
static inline SUNLinearSolver SUNLinSol_Dense(N_Vector v, SUNMatrix A) {
  (void)v; (void)A;
  return (SUNLinearSolver)calloc(1, sizeof(struct _SUNLinearSolver));
}
#define SUNDenseLinearSolver SUNLinSol_Dense
#endif
