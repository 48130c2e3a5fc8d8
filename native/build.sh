#!/bin/sh
# Build the native geo kernels -> native/libgeokernels.so
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -fopenmp \
    -o libgeokernels.so geokernels.cpp
echo "built $(pwd)/libgeokernels.so"
