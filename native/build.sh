#!/bin/sh
# Build the native geo kernels -> native/libgeokernels.so
set -e
cd "$(dirname "$0")"
# -ffp-contract=off: the OPTICS kernel needs bit parity with sklearn's
# uncontracted euclidean distances (no FMA in dx*dx + dy*dy).
g++ -O3 -march=native -ffp-contract=off -fPIC -shared -fopenmp \
    -o libgeokernels.so geokernels.cpp
echo "built $(pwd)/libgeokernels.so"
