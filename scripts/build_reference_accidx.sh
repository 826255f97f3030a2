#!/usr/bin/env bash
# Build the REFERENCE index binary `accidx` from /root/reference out-of-tree,
# for byte-level index-artifact parity testing (tests/test_reference_parity.py).
#
# The reference repo has two unresolved git submodules (gact/, mlog/ — see
# SURVEY.md "Critical repo fact"); accidx links but never calls them, so this
# script supplies minimal stubs with the APIs recovered from call sites
# (mutils.h:57-58, accaln.h:18,83).  divsufsort's CMake-templated headers are
# instantiated with the standard int32/int64 type choices.
#
# Usage: build_reference_accidx.sh <out_dir>   -> <out_dir>/accidx
set -euo pipefail
R=${REFERENCE_DIR:-/root/reference}
OUT=${1:?usage: build_reference_accidx.sh <out_dir>}
mkdir -p "$OUT"/gact/mstring "$OUT"/mlog "$OUT"/divhdr
cd "$OUT"

cat > gact/mstring/mstring.h <<'EOF'
#ifndef GACT_MSTRING_STUB_H
#define GACT_MSTRING_STUB_H
#include <stddef.h>
#include <stdint.h>
#ifdef __cplusplus
extern "C" {
#endif
typedef struct { char *s; uint64_t l; } mmstring;
mmstring ms_borrow(char *s, uint64_t l);
#ifdef __cplusplus
}
#endif
#endif
EOF
cat > gact/gact.h <<'EOF'
#ifndef GACT_STUB_H
#define GACT_STUB_H
#include <stdint.h>
#include "mstring/mstring.h"
#ifdef __cplusplus
extern "C" {
#endif
typedef struct { uint8_t *cigar; int n_cigar_op; int score; } cigar;
void simple_gact(mmstring q, mmstring d, cigar *out);
int parse_cigar(cigar *c, uint64_t qlen, char *buf);
#ifdef __cplusplus
}
#endif
#endif
EOF
cat > gact_stub.c <<'EOF'
#include <stdlib.h>
#include "gact/gact.h"
void simple_gact(mmstring q, mmstring d, cigar *out) { (void)q; (void)d; (void)out; abort(); }
int parse_cigar(cigar *c, uint64_t qlen, char *buf) { (void)c; (void)qlen; (void)buf; abort(); }
mmstring ms_borrow(char *s, uint64_t l) { mmstring m; m.s = s; m.l = l; return m; }
EOF
cat > mlog/logger.h <<'EOF'
#ifndef MLOG_STUB_H
#define MLOG_STUB_H
#include <time.h>
#include <stdarg.h>
#ifdef __cplusplus
extern "C" {
#endif
typedef struct mlog mlog;
struct mlog {
    void *ctx;
    struct timespec (*mvlog)(mlog *self, const char *fmt, ...);
    struct timespec (*melog)(mlog *self, const char *fmt, ...);
};
mlog new_mlogger(void *out);
#ifdef __cplusplus
}
#endif
#endif
EOF
cat > mlog_stub.c <<'EOF'
#include <stdio.h>
#include "mlog/logger.h"
static struct timespec _vlog(mlog *self, const char *fmt, ...) {
    struct timespec ts; clock_gettime(CLOCK_REALTIME, &ts);
    va_list ap; va_start(ap, fmt);
    vfprintf(stderr, fmt, ap); fputc('\n', stderr); va_end(ap);
    (void)self; return ts;
}
mlog new_mlogger(void *out) { (void)out; mlog m; m.ctx = 0; m.mvlog = _vlog; m.melog = _vlog; return m; }
EOF

gen_div_hdr() { # $1=out $2=W64BIT $3=saindex type $4=saindex prid
  sed -e "s/@DIVSUFSORT_API@//g" -e "s/@INCFILE@/#include <inttypes.h>/g" \
      -e "s/@SAUCHAR_TYPE@/uint8_t/g" -e "s/@SAINT32_TYPE@/int32_t/g" -e "s/@SAINT32_PRId@/PRId32/g" \
      -e "s/@SAINT64_TYPE@/int64_t/g" -e "s/@SAINT64_PRId@/PRId64/g" \
      -e "s/@SAINDEX_TYPE@/$3/g" -e "s/@SAINDEX_PRId@/$4/g" \
      -e "s/@SAINT_PRId@/PRId32/g" -e "s/@W64BIT@/$2/g" -e "s/@[A-Za-z0-9_]*@//g" \
      "$R/psascan/libdivsufsort/include/divsufsort.h.cmake" > "$1"
}
gen_div_hdr divhdr/divsufsort.h "" int32_t PRId32
gen_div_hdr divhdr/divsufsort64.h 64 int64_t PRId64
sed -e 's/#cmakedefine \(HAVE_STRING_H\|HAVE_STDLIB_H\|HAVE_MEMORY_H\|HAVE_STDINT_H\|HAVE_STDDEF_H\) 1/#define \1 1/' \
    -e 's/#cmakedefine.*//' -e 's/@[A-Za-z0-9_]*@//g' \
    "$R/psascan/libdivsufsort/include/config.h.cmake" > divhdr/config.h
sed -e 's/#cmakedefine.*//' -e 's/@[A-Za-z0-9_]*@//g' \
    "$R/psascan/libdivsufsort/include/lfs.h.cmake" > divhdr/lfs.h

for f in sssort trsort utils; do
  gcc -O2 -w -c -I divhdr -I "$R/psascan/libdivsufsort/include" -DHAVE_CONFIG_H "$R/psascan/libdivsufsort/lib/$f.c" -o ${f}32.o
  gcc -O2 -w -c -I divhdr -I "$R/psascan/libdivsufsort/include" -DHAVE_CONFIG_H -DBUILD_DIVSUFSORT64 "$R/psascan/libdivsufsort/lib/$f.c" -o ${f}64.o
done
gcc -O2 -w -c -I divhdr -I "$R/psascan/libdivsufsort/include" -DHAVE_CONFIG_H -DPROJECT_VERSION_FULL='"2.0.2"' "$R/psascan/libdivsufsort/lib/divsufsort.c" -o divsufsort32.o
gcc -O2 -w -c -I divhdr -I "$R/psascan/libdivsufsort/include" -DHAVE_CONFIG_H -DBUILD_DIVSUFSORT64 -DPROJECT_VERSION_FULL='"2.0.2"' "$R/psascan/libdivsufsort/lib/divsufsort.c" -o divsufsort64.o
g++ -O2 -w -std=c++11 -fopenmp -c -I divhdr -I "$R/psascan" "$R/psascan/sa_use.cc" -o sa_use.o
g++ -O2 -w -std=c++11 -fopenmp -c -I divhdr -I "$R/psascan" "$R/psascan/src/psascan_src/psascan.cc" -o psascan.o
g++ -O2 -w -std=c++11 -fopenmp -c -I "$R/psascan" "$R/psascan/src/psascan_src/utils.cpp" -o psutils.o
gcc -O2 -w -c -I . -I "$R" "$R/mutils.c" -o mutils.o
gcc -O2 -w -c -I . -I "$R" "$R/fmidx/fmidx.c" -o fmidx.o
gcc -O2 -w -c -I . -I "$R" "$R/lchash/lchash.c" -o lchash.o
gcc -O2 -w -c -I . -I "$R" "$R/asindex.c" -o asindex.o
gcc -O2 -w -c -I . gact_stub.c -o gact_stub.o
gcc -O2 -w -c -I . mlog_stub.c -o mlog_stub.o
g++ -O2 -fopenmp -o accidx asindex.o mutils.o fmidx.o lchash.o sa_use.o psascan.o psutils.o gact_stub.o mlog_stub.o \
    divsufsort32.o sssort32.o trsort32.o utils32.o divsufsort64.o sssort64.o trsort64.o utils64.o -lz -lpthread
echo "built: $OUT/accidx"
