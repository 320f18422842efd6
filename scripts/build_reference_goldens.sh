#!/bin/bash
# Build the GraphMat v2.0 reference binaries from /root/reference with
# g++ and capture golden outputs for tests/test_golden.py.
#
# The reference Makefile wants icpc + MPI + Boost; this image has none.
# scripts/ref_stub/ provides (a) a single-rank MPI stub (self-sends go
# through a FIFO queue — the SpVec ingest loops self-send at 1 rank),
# (b) a raw-byte boost-archive stub covering the serialize()/save()/
# load() surface GraphMat uses, (c) ICC intrinsic shims (_popcnt32,
# _mm_malloc).  NOT wire-compatible with real boost/MPI; correct for
# single-process golden runs.
set -e
REF=${REF:-/root/reference}
OUT=${OUT:-/tmp/refbuild}
STUB=$(cd "$(dirname "$0")/ref_stub" && pwd)
mkdir -p "$OUT/bin" "$OUT/data"
for f in test.bin.mtx ratings7.bin.mtx 2_10_upper_triangle.bin.mtx; do
  cp -f $REF/data/$f $OUT/data/$f
  ln -sf $OUT/data/$f $OUT/data/${f}0   # ReadMTX wants per-rank suffixes
done
for app in PageRank BFS SSSP TopologicalSort TriangleCounting \
           IncrementalPageRank DeltaStepping SGD LDA; do
  g++ -O1 -march=native -fopenmp -std=c++11 -w \
      -include "$STUB/gm_compat.h" -I "$STUB" \
      -I $REF/include -I $REF/include/GMDP \
      $REF/src/$app.cpp -o $OUT/bin/$app
  echo "built $app"
done
cd "$OUT"; export OMP_NUM_THREADS=${OMP_NUM_THREADS:-2}
G=$(cd "$(dirname "$0")" && cd ../tests/golden && pwd) 2>/dev/null || G=/root/repo/tests/golden
STAMP() { "$@" ; }
./bin/PageRank data/test.bin.mtx                       > $G/pagerank_test.txt
./bin/BFS data/test.bin.mtx 1                          > $G/bfs_test_s1.txt
./bin/SSSP data/test.bin.mtx 1                         > $G/sssp_test_s1.txt
./bin/TopologicalSort data/2_10_upper_triangle.bin.mtx > $G/toposort_2_10.txt
./bin/TriangleCounting data/2_10_upper_triangle.bin.mtx > $G/tc_2_10.txt
./bin/IncrementalPageRank data/test.bin.mtx            > $G/incpr_test.txt
./bin/DeltaStepping data/test.bin.mtx 3 1              > $G/deltastepping_test_d3_s1.txt
./bin/SGD data/ratings7.bin.mtx                        > $G/sgd_ratings7.txt
./bin/LDA data/ratings7.bin.mtx 3 4 10                 > $G/lda_ratings7.txt
echo "goldens written to $G"
