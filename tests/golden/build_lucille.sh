#!/bin/sh
# Build CPU-lucille (the reference) as a static archive + stub shader dir,
# for baseline measurement (BASELINE.md: baselines must be established by
# building/running lucille on this container).  flex/bison are absent so
# only the libraries are compiled; scenes are replayed through the Ri* C
# API by generated drivers (gen_ri_driver.py) or hand-written ones
# (bench_large_driver.c).
#
# Usage: sh tests/golden/build_lucille.sh [outdir]   (default /tmp/lucille_cpu)
set -e
REF=/root/reference
OUT=${1:-/tmp/lucille_cpu}
mkdir -p "$OUT/obj"
# -D__64bit__ is REQUIRED on this host: without it ri_mem_free_aligned
# truncates the embedded malloc address to 32 bits (memory.c:178) and the
# render crashes freeing bucket pixels.  -DWITH_PTHREAD enables the
# numcpus-threaded bucket loop (option.c:128-134); -DLINUX lets
# get_numcpus() read /proc/cpuinfo (option.c:618).
CFLAGS="-O2 -w -I$REF/include -I$REF/src/base -I$REF/src/ri -I$REF/src/render \
-I$REF/src/transport -I$REF/src/display -I$REF/src/imageio -DNDEBUG \
-D__64bit__ -DWITH_PTHREAD -DLINUX"
for d in base ri render transport display imageio; do
  for f in "$REF"/src/$d/*.c; do
    o="$OUT/obj/$(basename "$f" .c)_$d.o"
    [ -f "$o" ] && [ "$o" -nt "$f" ] && continue
    gcc $CFLAGS -c "$f" -o "$o" 2>/dev/null || echo "skip $f"
  done
done
ar rcs "$OUT/liblucille.a" "$OUT"/obj/*.o
echo "built $OUT/liblucille.a"
