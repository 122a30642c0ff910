#ifndef STUB_SUNDIALS_TYPES_H
#define STUB_SUNDIALS_TYPES_H
typedef double realtype;
typedef long int sunindextype;
#endif
