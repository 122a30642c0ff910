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
src = src.replace(old, new, 1).replace(old2, new2, 1)
# build-local case 99: cgs radiative-shock states (colliding-flow slab;
# the stock RIEMANN menu is dimensionless, which no cooling curve can
# act on) — used by the mp_only_cooling cross-validation
anchor = "   case 14:"
case99 = (
    "   case 99:\n"
    "    /** case 99 (build-local): cgs radiative shock for cooling"
    " crossval.*/\n"
    "    l[RO]=2.34e-22; l[PG]=3.10e-12; l[VX]=7.0e6; l[VY]=l[VZ]=0.;\n"
    "    r[RO]=2.34e-22; r[PG]=3.10e-12; r[VX]=-7.0e6; r[VY]=r[VZ]=0.;\n"
    "    if (SimPM.eqntype==2 || SimPM.eqntype==EQGLM) {\n"
    "      l[BX]=l[BY]=l[BZ]=r[BX]=r[BY]=r[BZ]=0.;\n"
    "    }\n"
    "    *xm = 0.5*(SimPM.Xmin[XX]+SimPM.Xmax[XX]);\n"
    "    break;\n"
)
assert anchor in src
src = src.replace(anchor, case99 + anchor, 1)
# build-local: the text-parameterfile reader never parses the EP_* physics
# flags, so cooling/microphysics can never switch on through this path;
# read the ones the cooling crossval needs (same keys as the silo header,
# dataio_base.cpp:255-280)
ep_anchor = 'cout <<"(dataio_text::get_parameters) Finished getting parameters.\\n";'
ep_patch = (
    '  ts = rp->find_parameter("EP_cooling");\n'
    '  if (ts!="") SimPM.EP.cooling = atoi(ts.c_str());\n'
    '  ts = rp->find_parameter("EP_chemistry");\n'
    '  if (ts!="") SimPM.EP.chemistry = atoi(ts.c_str());\n'
    '  ts = rp->find_parameter("EP_update_erg");\n'
    '  if (ts!="") SimPM.EP.update_erg = atoi(ts.c_str());\n'
    '  ts = rp->find_parameter("EP_MP_timestep_limit");\n'
    '  if (ts!="") SimPM.EP.MP_timestep_limit = atoi(ts.c_str());\n'
    '  ts = rp->find_parameter("EP_Min_Temperature");\n'
    '  if (ts!="") SimPM.EP.MinTemperature = atof(ts.c_str());\n'
    '  ts = rp->find_parameter("EP_Max_Temperature");\n'
    '  if (ts!="") SimPM.EP.MaxTemperature = atof(ts.c_str());\n'
    '  '
)
assert ep_anchor in src, "EP anchor not found"
src = src.replace(ep_anchor, ep_patch + ep_anchor, 1)
open(build + "/patched/dataio_text.cpp", "w").write(src)
PYEOF
cd "$BUILD" && make -j"$(nproc)" all
echo "built: $BUILD/pion-ugs icgen-ugs pion-ngs icgen-ngs"
