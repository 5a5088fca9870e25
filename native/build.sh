#!/bin/sh
# Build the native decoder shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -fPIC -shared -std=c++17 decoder.cc -o librelaxdecode.so \
    -lavformat -lavcodec -lavutil -lswscale
echo "built $(pwd)/librelaxdecode.so"
