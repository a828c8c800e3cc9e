#!/bin/bash
# Build the native data-loading runtime (native/dataloader.cc -> .so).
set -e
cd "$(dirname "$0")/.."
mkdir -p build
g++ -O3 -march=native -fPIC -shared -std=c++17 -pthread \
    native/dataloader.cc -ljpeg -o build/libs2l_dataloader.so
echo "built build/libs2l_dataloader.so"
