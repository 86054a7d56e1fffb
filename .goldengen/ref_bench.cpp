// Timing harness for the REFERENCE's CPU build, verbatim:
// lqt_create (lqt.cpp:16-21) = lqt_nodify (32-level encode) +
// lqt_sortify (base-10 linked-list radix sort) — the same pipeline the
// reference's own test_unified times and prints as ms/point
// (main.cpp:299-301). Points are uniform in [1000,1100)^2 exactly like
// the reference's create_points (main.cpp:60-72), except srand() is
// seeded for reproducibility (the reference leaves rand() unseeded,
// main.cpp:631).
//
// Build:  g++ -O3 -std=c++11 ref_bench.cpp /root/reference/lqt.cpp -o ref_bench -lm
// Run:    ./ref_bench <n>
#include "../../reference/lqt.h"
#include <chrono>
#include <cstdio>
#include <cstdlib>

static lqt_point* create_points(size_t len) {
  lqt_point* pts = new lqt_point[len];
  const ord_t min = 1000.0f, max = 1100.0f;
  for (size_t i = 0; i < len; ++i) {
    pts[i].x = min + (ord_t)rand() / ((ord_t)RAND_MAX / (max - min));
    pts[i].y = min + (ord_t)rand() / ((ord_t)RAND_MAX / (max - min));
    pts[i].key = (int)i;
  }
  return pts;
}

int main(int argc, char** argv) {
  const size_t n = argc > 1 ? strtoull(argv[1], nullptr, 10) : 1000000;
  srand(42);
  lqt_point* pts = create_points(n);
  size_t depth = 0;
  const auto t0 = std::chrono::steady_clock::now();
  linear_quadtree q =
      lqt_create(pts, n, 1000.0f, 1100.0f, 1000.0f, 1100.0f, &depth);
  const auto t1 = std::chrono::steady_clock::now();
  const double s = std::chrono::duration<double>(t1 - t0).count();
  // keep the result alive so the build isn't optimized away
  unsigned long long acc = 0;
  for (size_t i = 0; i < n; i += n / 13 + 1) acc ^= q.locations[i];
  printf("{\"n\": %zu, \"build_s\": %.3f, \"ms_per_point\": %.6f, "
         "\"rows_per_sec\": %.1f, \"acc\": %llu}\n",
         n, s, 1000.0 * s / (double)n, (double)n / s, acc);
  lqt_delete(q);
  return 0;
}
