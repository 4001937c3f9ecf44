// Fast sparse-depth densification: Delaunay triangulation + barycentric
// rasterization.
//
// Native replacement for the scipy/Qhull LinearNDInterpolator path the
// reference preprocessing leans on (data/data_utils.py:231-367): the
// offline tool interpolates one full lidar frame per image
// (pointcloud_project_zju.py:68-76), and Qhull + per-pixel simplex lookup
// dominates its runtime.  This library triangulates with Bowyer-Watson
// (double precision, deterministic insertion order) and then rasterizes
// each triangle's bounding box with barycentric weights - O(image area)
// instead of per-pixel point location.
//
// Exposed via a plain C ABI for ctypes (no pybind11 dependency):
//   delaunay_interpolate(values, rows, cols, n, H, W, fill, out)
// Returns 0 on success, nonzero on degenerate input (<3 points or all
// collinear), in which case `out` is filled with `fill`.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Tri {
  int a, b, c;
  // circumcircle (squared radius), cached
  double cx, cy, r2;
  bool valid;
};

struct Edge {
  int u, v;
  bool operator==(const Edge& o) const { return u == o.u && v == o.v; }
};

inline void circumcircle(const std::vector<double>& px,
                         const std::vector<double>& py, Tri& t) {
  const double ax = px[t.a], ay = py[t.a];
  const double bx = px[t.b], by = py[t.b];
  const double cx = px[t.c], cy = py[t.c];
  const double d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by));
  if (std::fabs(d) < 1e-12) {
    t.valid = false;
    t.r2 = -1.0;
    return;
  }
  const double a2 = ax * ax + ay * ay;
  const double b2 = bx * bx + by * by;
  const double c2 = cx * cx + cy * cy;
  t.cx = (a2 * (by - cy) + b2 * (cy - ay) + c2 * (ay - by)) / d;
  t.cy = (a2 * (cx - bx) + b2 * (ax - cx) + c2 * (bx - ax)) / d;
  const double dx = ax - t.cx, dy = ay - t.cy;
  t.r2 = dx * dx + dy * dy;
  t.valid = true;
}

}  // namespace

extern "C" {

// values/rows/cols: n_points sparse samples at integer pixel (row, col).
// out: H*W row-major float32, pre-allocated by the caller.
int delaunay_interpolate(const float* values, const int32_t* rows,
                         const int32_t* cols, int n_points, int H, int W,
                         float fill, float* out) {
  const long total = static_cast<long>(H) * W;
  for (long i = 0; i < total; ++i) out[i] = fill;
  if (n_points < 3) return 1;

  // Point set (super-triangle appended at the end).
  std::vector<double> px(n_points + 3), py(n_points + 3);
  double min_x = 1e30, max_x = -1e30, min_y = 1e30, max_y = -1e30;
  for (int i = 0; i < n_points; ++i) {
    px[i] = static_cast<double>(cols[i]);
    py[i] = static_cast<double>(rows[i]);
    min_x = std::fmin(min_x, px[i]);
    max_x = std::fmax(max_x, px[i]);
    min_y = std::fmin(min_y, py[i]);
    max_y = std::fmax(max_y, py[i]);
  }
  const double span = std::fmax(max_x - min_x, max_y - min_y) + 1.0;
  const double mx = 0.5 * (min_x + max_x);
  const double my = 0.5 * (min_y + max_y);
  const int s0 = n_points, s1 = n_points + 1, s2 = n_points + 2;
  px[s0] = mx - 20.0 * span; py[s0] = my - span;
  px[s1] = mx + 20.0 * span; py[s1] = my - span;
  px[s2] = mx;               py[s2] = my + 20.0 * span;

  std::vector<Tri> tris;
  tris.reserve(4 * n_points);
  {
    Tri t{s0, s1, s2, 0, 0, 0, true};
    circumcircle(px, py, t);
    tris.push_back(t);
  }

  std::vector<Edge> boundary;
  std::vector<char> bad;
  for (int p = 0; p < n_points; ++p) {
    const double x = px[p], y = py[p];
    bad.assign(tris.size(), 0);
    boundary.clear();

    // Triangles whose circumcircle contains p.
    for (size_t ti = 0; ti < tris.size(); ++ti) {
      const Tri& t = tris[ti];
      if (!t.valid) continue;
      const double dx = x - t.cx, dy = y - t.cy;
      if (dx * dx + dy * dy <= t.r2 * (1.0 + 1e-12) + 1e-12) bad[ti] = 1;
    }

    // Boundary = edges of bad triangles not shared by two bad triangles.
    auto add_edge = [&](int u, int v) {
      for (size_t e = 0; e < boundary.size(); ++e) {
        if ((boundary[e].u == v && boundary[e].v == u) ||
            (boundary[e].u == u && boundary[e].v == v)) {
          boundary[e] = boundary.back();
          boundary.pop_back();
          return;
        }
      }
      boundary.push_back(Edge{u, v});
    };
    for (size_t ti = 0; ti < tris.size(); ++ti) {
      if (!bad[ti] || !tris[ti].valid) continue;
      add_edge(tris[ti].a, tris[ti].b);
      add_edge(tris[ti].b, tris[ti].c);
      add_edge(tris[ti].c, tris[ti].a);
    }

    // Remove bad triangles (swap-erase; recompute bad flags alongside).
    size_t w = 0;
    for (size_t ti = 0; ti < tris.size(); ++ti) {
      if (!bad[ti]) tris[w++] = tris[ti];
    }
    tris.resize(w);

    // Re-triangulate the cavity.
    for (const Edge& e : boundary) {
      Tri t{e.u, e.v, p, 0, 0, 0, true};
      circumcircle(px, py, t);
      if (t.valid) tris.push_back(t);
    }
  }

  // Rasterize every triangle not touching the super-triangle.
  int n_rasterized = 0;
  for (const Tri& t : tris) {
    if (t.a >= n_points || t.b >= n_points || t.c >= n_points) continue;
    const double ax = px[t.a], ay = py[t.a];
    const double bx = px[t.b], by = py[t.b];
    const double cx = px[t.c], cy = py[t.c];
    const double det = (by - cy) * (ax - cx) + (cx - bx) * (ay - cy);
    if (std::fabs(det) < 1e-12) continue;
    const float va = values[t.a], vb = values[t.b], vc = values[t.c];

    int x0 = static_cast<int>(std::floor(std::fmin(ax, std::fmin(bx, cx))));
    int x1 = static_cast<int>(std::ceil(std::fmax(ax, std::fmax(bx, cx))));
    int y0 = static_cast<int>(std::floor(std::fmin(ay, std::fmin(by, cy))));
    int y1 = static_cast<int>(std::ceil(std::fmax(ay, std::fmax(by, cy))));
    x0 = x0 < 0 ? 0 : x0;
    y0 = y0 < 0 ? 0 : y0;
    x1 = x1 >= W ? W - 1 : x1;
    y1 = y1 >= H ? H - 1 : y1;

    const double inv = 1.0 / det;
    for (int yy = y0; yy <= y1; ++yy) {
      for (int xx = x0; xx <= x1; ++xx) {
        const double l0 = ((by - cy) * (xx - cx) + (cx - bx) * (yy - cy))
                          * inv;
        const double l1 = ((cy - ay) * (xx - cx) + (ax - cx) * (yy - cy))
                          * inv;
        const double l2 = 1.0 - l0 - l1;
        const double eps = -1e-9;
        if (l0 >= eps && l1 >= eps && l2 >= eps) {
          out[static_cast<long>(yy) * W + xx] =
              static_cast<float>(l0 * va + l1 * vb + l2 * vc);
        }
      }
    }
    ++n_rasterized;
  }
  return n_rasterized > 0 ? 0 : 1;
}

}  // extern "C"
