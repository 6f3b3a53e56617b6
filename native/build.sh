#!/bin/sh
# Build the native host runtime -> native/libidt_native.so
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -o libidt_native.so src/idt_native.cc -lz
echo "built $(pwd)/libidt_native.so"
