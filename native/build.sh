#!/bin/sh
# Build the native host library. Safe to re-run; falls back gracefully if
# the toolchain is absent (the Python path covers every feature).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o libfastaparse.so fastaparse.cpp
echo "built $(pwd)/libfastaparse.so"
