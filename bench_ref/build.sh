#!/bin/sh
# Build the reference-workload provenance harness (bench_ref/ref_workload.cpp)
# against the read-only reference headers.  Objects land in bench_ref/obj
# (gitignored); binary at bench_ref/ref_workload.
set -e
cd "$(dirname "$0")"
REF=/root/reference
GI=$REF/graph500-1.2/generator
mkdir -p obj
for f in graph_generator splittable_mrg utils mrg_transitions btrd_binomial_distribution; do
  [ -f obj/$f.o ] || gcc -O3 -fopenmp -I $GI/include/graph500/generator -c $GI/$f.c -o obj/$f.o
done
g++ -O3 -std=c++14 -w -fopenmp -DTHREADED \
    -I mpi_stub -I $REF/include -I $GI/include \
    -I $REF/psort-1.0/include -I $REF/usort/include \
    ref_workload.cpp obj/*.o -o ref_workload
echo "built bench_ref/ref_workload"
