#!/bin/sh
# Build the fastvideo host-preprocessing library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 -o libfastvideo.so fastvideo.cpp -lpthread
echo "built $(pwd)/libfastvideo.so"
