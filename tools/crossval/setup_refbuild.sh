#!/bin/sh
# Build the reference PION serial binaries (text I/O only) out-of-tree.
# Usage: sh tools/crossval/setup_refbuild.sh [builddir]
set -e
BUILD=${1:-/tmp/pion_build}
HERE=$(cd "$(dirname "$0")" && pwd)
mkdir -p "$BUILD/patched"
cp -r "$HERE/stub" "$BUILD/"
cp "$HERE/Makefile.refbuild" "$BUILD/Makefile"
# build-local fix for the upstream do-while bug on BC_Ninternal=0
# (source/dataIO/dataio_text.cpp:348-361)
python3 - "$BUILD" <<'PYEOF'
import sys
build = sys.argv[1]
src = open("/root/reference/source/dataIO/dataio_text.cpp").read()
old = "  int v=0;\n  do {"
new = "  int v=0;\n  while (v<SimPM.BC_Nint) {"
old2 = "  } while (v<SimPM.BC_Nint);"
new2 = "  }"
assert old in src and old2 in src
open(build + "/patched/dataio_text.cpp", "w").write(
    src.replace(old, new, 1).replace(old2, new2, 1))
PYEOF
cd "$BUILD" && make -j"$(nproc)" all
echo "built: $BUILD/pion-ugs icgen-ugs pion-ngs icgen-ngs"
