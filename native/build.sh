#!/usr/bin/env bash
# Build the host-side native conversion library (parity with the reference's
# plain-g++ fallback build, reference native/build.sh:30-32).
set -euo pipefail
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread \
    -o libternary_pack.so ternary_pack.cc
echo "built $(pwd)/libternary_pack.so"
