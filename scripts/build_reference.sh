#!/bin/bash
# Build the reference pbrt binary out-of-tree (the checkout's glog /
# openexr / ptex / zlib submodules are empty; we shim glog, stub ptex,
# and link the system OpenEXR 3.1).  Build dir: /tmp/refbuild.
# Usage: scripts/build_reference.sh [--spectral]
set -e
REF=/root/reference
OUT=/tmp/refbuild
SHIM=$(dirname "$0")/refshim


DEFS="-DNDEBUG -DPBRT_HAVE_HEX_FP_CONSTANTS -DPBRT_HAVE_BINARY_CONSTANTS -DPBRT_THREAD_LOCAL=thread_local -DPBRT_HAVE_ALIGNAS -DPBRT_HAVE_ALIGNOF -DPBRT_HAVE_CONSTEXPR -DPBRT_CONSTEXPR=constexpr -DPBRT_IS_LINUX -DPBRT_HAVE_POSIX_MEMALIGN -DPBRT_HAVE_ALLOCA_H -DPBRT_HAVE_MALLOC_H -DPBRT_HAVE_ITIMER -DPBRT_HAVE_MMAP -DPBRT_HAVE_NONPOD_IN_UNIONS -DPBRT_NOINLINE="
if [ "$1" = "--spectral" ]; then
  DEFS="$DEFS -DPBRT_SAMPLED_SPECTRUM"
  BIN=pbrt_spectral
else
  BIN=pbrt
fi
OBJ="$OUT/obj_$BIN"
mkdir -p "$OBJ"
INC="-I$SHIM -I$REF/src -I$REF/src/core -I$REF/src/ext -I/usr/include/OpenEXR -I/usr/include/Imath"
# -ffp-contract=off: gcc otherwise FMA-contracts the watertight
# triangle edge functions (triangle.cpp:263), breaking their exact
# shared-edge antisymmetry — the binary then leaks rays through mesh
# seams (visible as zero pixels on seam-aligned samples).  pbrt's
# watertightness proof assumes plain IEEE multiply-subtract.
FLAGS="-O3 -march=native -ffp-contract=off -std=c++17 -w -pthread"

SRCS=$(ls $REF/src/core/*.cpp $REF/src/accelerators/*.cpp \
          $REF/src/cameras/*.cpp $REF/src/filters/*.cpp \
          $REF/src/integrators/*.cpp $REF/src/lights/*.cpp \
          $REF/src/materials/*.cpp $REF/src/media/*.cpp \
          $REF/src/samplers/*.cpp $REF/src/shapes/*.cpp \
          $REF/src/textures/*.cpp $REF/src/main/pbrt.cpp \
          $REF/src/ext/lodepng.cpp $REF/src/ext/targa.cpp \
          $REF/src/ext/rply.cpp | grep -v "textures/ptex.cpp")
SRCS="$SRCS $SHIM/ptex_stub.cpp $REF/src/ext/ArHosekSkyModel.c"

NJOBS=$(nproc)
i=0
pids=""
for s in $SRCS; do
  o="$OBJ/$(echo "$s" | sed 's;[/.];_;g').o"
  if [ ! -f "$o" ] || [ "$s" -nt "$o" ]; then
    if [[ "$s" == *.c ]]; then
      gcc -O3 -march=native -w -c "$s" -o "$o" &
    else
      g++ $FLAGS $DEFS $INC -c "$s" -o "$o" &
    fi
    pids="$pids $!"
    i=$((i+1))
    if [ $((i % NJOBS)) -eq 0 ]; then wait; pids=""; fi
  fi
done
wait

g++ $FLAGS -o "$OUT/$BIN" "$OBJ"/*.o \
    -lOpenEXR-3_1 -lIex-3_1 -lImath-3_1 -lIlmThread-3_1 -lz -pthread
echo "built $OUT/$BIN"
