// Golden-vector generator: links the UNMODIFIED reference lqt.cpp
// (read-only at /root/reference) and prints zkeys for points fed on stdin.
// Used only to mint test vectors; not part of the engine.
#include "lqt.h"
#include <cstdio>
#include <cstdlib>
extern "C" {}
int main() {
  size_t n;
  if (scanf("%zu", &n) != 1) return 1;
  lqt_point* pts = new lqt_point[n];
  for (size_t i = 0; i < n; ++i) {
    double x, y; int k;
    scanf("%lf %lf %d", &x, &y, &k);
    pts[i].x = (float)x; pts[i].y = (float)y; pts[i].key = k;
  }
  size_t depth;
  linear_quadtree q = lqt_nodify(pts, n, 1000.0f, 1100.0f, 1000.0f, 1100.0f, &depth);
  for (size_t i = 0; i < n; ++i) printf("%llu\n", (unsigned long long)q.locations[i]);
  return 0;
}
