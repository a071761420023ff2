// Native shortest-path engine for host-side tooling and test oracles.
//
// Role parity with the reference's Cython module
// (shortest_paths/shortest_paths.pyx): 8-connected grid graph over a binary
// configuration-space bitmap, queue-based shortest paths (SLF heuristic),
// distance images, and line-of-sight waypoint simplification.  The TPU hot
// path uses the chamfer-sweep wavefront kernels instead; this library serves
// the interactive tools, the real-robot bridge, and as an exact oracle the
// JAX kernels are validated against.
//
// Build: g++ -O3 -shared -fPIC spfa.cpp -o libspfa.so  (see __init__.py)

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>
#include <deque>

namespace {

constexpr float kSqrt2 = 1.41421356237309504880f;
constexpr float kInf = 1e30f;

struct Dir {
  int di, dj;
  float cost;
};

const Dir kDirs[8] = {
    {0, -1, 1.0f},  {0, 1, 1.0f},   {-1, -1, kSqrt2}, {-1, 0, 1.0f},
    {-1, 1, kSqrt2}, {1, -1, kSqrt2}, {1, 0, 1.0f},    {1, 1, kSqrt2},
};

// Queue-based label-correcting shortest paths (SPFA) with the
// smallest-label-first swap heuristic.
void spfa(const uint8_t* grid, int h, int w, int si, int sj, float* dist,
          int32_t* parent) {
  const int n = h * w;
  for (int v = 0; v < n; ++v) {
    dist[v] = kInf;
    parent[v] = -1;
  }
  const int s = si * w + sj;
  if (si < 0 || sj < 0 || si >= h || sj >= w || !grid[s]) return;
  dist[s] = 0.0f;

  std::deque<int> queue;
  std::vector<uint8_t> in_queue(n, 0);
  queue.push_back(s);
  in_queue[s] = 1;

  while (!queue.empty()) {
    const int u = queue.front();
    queue.pop_front();
    in_queue[u] = 0;
    const int ui = u / w, uj = u % w;
    const float du = dist[u];
    for (const Dir& d : kDirs) {
      const int vi = ui + d.di, vj = uj + d.dj;
      if (vi < 0 || vj < 0 || vi >= h || vj >= w) continue;
      const int v = vi * w + vj;
      if (!grid[v]) continue;
      const float nd = du + d.cost;
      if (nd < dist[v]) {
        dist[v] = nd;
        parent[v] = u;
        if (!in_queue[v]) {
          // SLF: keep the queue head small.
          if (!queue.empty() && nd < dist[queue.front()]) {
            queue.push_front(v);
          } else {
            queue.push_back(v);
          }
          in_queue[v] = 1;
        }
      }
    }
  }
}

bool line_free(const uint8_t* grid, int h, int w, float i0, float j0, float i1,
               float j1) {
  const float di = i1 - i0, dj = j1 - j0;
  const int steps = (int)std::ceil(std::fmax(std::fabs(di), std::fabs(dj))) + 1;
  for (int k = 0; k <= steps; ++k) {
    const float t = steps ? (float)k / steps : 0.0f;
    const int ii = (int)std::lround(i0 + t * di);
    const int jj = (int)std::lround(j0 + t * dj);
    if (ii < 0 || jj < 0 || ii >= h || jj >= w) return false;
    if (!grid[ii * w + jj]) return false;
  }
  return true;
}

}  // namespace

extern "C" {

// Distance image from (si, sj); unreachable cells get -1 (matching the
// reference's convention).
void spfa_distance_image(const uint8_t* grid, int h, int w, int si, int sj,
                         float* out) {
  std::vector<int32_t> parent(h * w);
  spfa(grid, h, w, si, sj, out, parent.data());
  for (int v = 0; v < h * w; ++v) {
    if (out[v] >= kInf * 0.5f) out[v] = -1.0f;
  }
}

float spfa_distance(const uint8_t* grid, int h, int w, int si, int sj, int ti,
                    int tj) {
  std::vector<float> dist(h * w);
  std::vector<int32_t> parent(h * w);
  spfa(grid, h, w, si, sj, dist.data(), parent.data());
  const float d = dist[ti * w + tj];
  return d >= kInf * 0.5f ? -1.0f : d;
}

// Shortest path from source to target as simplified waypoints.
// out_path: (max_len, 2) int32 buffer; returns the number of waypoints
// written (>= 1, path[0] = source), or 0 if the target is unreachable.
int spfa_shortest_path(const uint8_t* grid, int h, int w, int si, int sj,
                       int ti, int tj, int32_t* out_path, int max_len) {
  std::vector<float> dist(h * w);
  std::vector<int32_t> parent(h * w);
  spfa(grid, h, w, si, sj, dist.data(), parent.data());

  const int s = si * w + sj;
  int v = ti * w + tj;
  if (dist[v] >= kInf * 0.5f) return 0;

  // Recover the dense path target -> source, then reverse.
  std::vector<int> dense;
  while (v != s && v >= 0) {
    dense.push_back(v);
    v = parent[v];
  }
  dense.push_back(s);
  std::vector<int> path(dense.rbegin(), dense.rend());

  // Greedy line-of-sight string pulling (waypoint pruning).
  std::vector<int> waypoints;
  size_t anchor = 0;
  waypoints.push_back(path[0]);
  while (anchor + 1 < path.size()) {
    size_t best = anchor + 1;
    for (size_t t = path.size() - 1; t > anchor; --t) {
      const int a = path[anchor], b = path[t];
      if (line_free(grid, h, w, (float)(a / w), (float)(a % w), (float)(b / w),
                    (float)(b % w))) {
        best = t;
        break;
      }
    }
    waypoints.push_back(path[best]);
    anchor = best;
  }

  const int n = (int)std::min((size_t)max_len, waypoints.size());
  for (int k = 0; k < n; ++k) {
    out_path[2 * k] = waypoints[k] / w;
    out_path[2 * k + 1] = waypoints[k] % w;
  }
  return n;
}

}  // extern "C"
