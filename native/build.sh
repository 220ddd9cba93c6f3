#!/bin/sh
# Builds the native host-runtime shared library (batcher + noise injector).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -std=c++17 -shared -fPIC -pthread \
    -o libdadtpu_native.so batcher.cc inject.cc
echo "built $(pwd)/libdadtpu_native.so"
