#!/bin/sh
# Build the native fast-IO helper (plain C ABI, ctypes-loaded).
set -e
cd "$(dirname "$0")"
${CXX:-g++} -O3 -shared -fPIC -o libfastio.so fastio.cpp
echo "built $(pwd)/libfastio.so"
