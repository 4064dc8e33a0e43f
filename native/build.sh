#!/bin/sh
# Build the native map compiler -> native/libdtown_mapc.so
set -e
cd "$(dirname "$0")"
g++ -O2 -fPIC -shared -std=c++17 -Wall -o libdtown_mapc.so mapc.cpp
echo "built $(pwd)/libdtown_mapc.so"
