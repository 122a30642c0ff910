#ifndef STUB_CVD_H
#define STUB_CVD_H
#include "cvode/cvode_dense.h"
#endif
