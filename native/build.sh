#!/bin/sh
# Build the native host-side IO library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -fopenmp -o libaudioio.so audioio.cpp
echo "built $(pwd)/libaudioio.so"
