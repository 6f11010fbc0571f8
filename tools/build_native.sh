#!/bin/sh
# Build the fastcodec native library.
set -e
cd "$(dirname "$0")/.."
mkdir -p native/build
g++ -O3 -march=native -shared -fPIC -std=c++17 \
    native/fastcodec.cpp -o native/build/libfastcodec.so -lz -lpthread
echo "built native/build/libfastcodec.so"
