#!/bin/sh
# Build the native data loader shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 -o libfastloader.so \
    fastloader.cpp -lpng -ljpeg -pthread
echo "built $(pwd)/libfastloader.so"
