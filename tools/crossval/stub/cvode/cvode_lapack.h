#ifndef STUB_CVL_H
#define STUB_CVL_H
#include "cvode/cvode_dense.h"
#endif
