#!/bin/sh
# Build the native augmentation engine (no external deps).
cd "$(dirname "$0")"
g++ -O3 -march=native -ffast-math -funroll-loops -fPIC -shared -std=c++17 -o libxpoint_native.so augment.cpp
echo "built $(pwd)/libxpoint_native.so"
