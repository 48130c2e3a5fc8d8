#!/bin/sh
# Build the native kernels:
#   geokernels.cpp -> libgeokernels.so   (geo/OPTICS/geometry host kernels)
#   decode.cpp     -> libdecode.so       (JPEG decode + resize, needs libjpeg)
set -e
cd "$(dirname "$0")"
# -ffp-contract=off: the OPTICS kernel needs bit parity with sklearn's
# uncontracted euclidean distances (no FMA in dx*dx + dy*dy).
g++ -O3 -march=native -ffp-contract=off -fPIC -shared -fopenmp \
    -o libgeokernels.so geokernels.cpp
echo "built $(pwd)/libgeokernels.so"
# decode has no bit-parity constraint: FMA + unrolling speed the resize.
g++ -O3 -march=native -ffp-contract=fast -funroll-loops -fPIC -shared \
    -fopenmp -o libdecode.so decode.cpp -ljpeg
echo "built $(pwd)/libdecode.so"
