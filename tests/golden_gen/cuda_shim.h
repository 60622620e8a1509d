// minimal shim so the reference's host-side headers compile without CUDA
#pragma once
typedef int cudaError_t;
static const cudaError_t cudaSuccess = 0;
static inline const char* cudaGetErrorString(cudaError_t) { return ""; }
typedef unsigned int uint;
