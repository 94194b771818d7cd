#!/bin/sh
# Build the native runtime shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -std=c++17 -shared -fPIC \
    orbslam3_tpu_rt.cpp -o liborbslam3_tpu_rt.so -pthread
echo "built $(pwd)/liborbslam3_tpu_rt.so"
