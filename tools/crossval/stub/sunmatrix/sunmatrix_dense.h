#ifndef STUB_SUNM_H
#define STUB_SUNM_H
#include "sundials/sundials_dense.h"
#endif
