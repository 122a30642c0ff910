#ifndef STUB_SUNL_H
#define STUB_SUNL_H
#include "sundials/sundials_dense.h"
#endif
