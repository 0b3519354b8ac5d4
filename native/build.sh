#!/bin/sh
# Build the native host core (see jxt_native.cpp). No deps beyond libstdc++.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o libjxt_native.so jxt_native.cpp
echo "built $(pwd)/libjxt_native.so"
