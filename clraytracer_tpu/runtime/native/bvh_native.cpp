// Native binned-SAH BVH builder.
//
// Clean-room C++ implementation of the same algorithm as bvh.py (and the
// reference's BVH.cpp:103-255): 8-bin x 3-axis SAH with prefix/suffix area
// sweeps, split-vs-leaf by SAH cost against the parent, adjacent children
// (right = left + 1), in-place index partition, optional hard max_leaf bound
// with object-median fallback. This is the cold-start performance path for
// large scenes; the level-synchronous numpy builder is the portable default.
//
// The builder permutes an index array (perm) rather than the triangle
// payload — the Python side reorders its SoA arrays with the permutation.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Vec3 {
  float x, y, z;
};

inline Vec3 vmin(const Vec3& a, const Vec3& b) {
  return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
inline Vec3 vmax(const Vec3& a, const Vec3& b) {
  return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}

struct AABB {
  Vec3 mn{1e30f, 1e30f, 1e30f};
  Vec3 mx{-1e30f, -1e30f, -1e30f};
  void grow(const Vec3& p) {
    mn = vmin(mn, p);
    mx = vmax(mx, p);
  }
  void grow(const AABB& o) {
    mn = vmin(mn, o.mn);
    mx = vmax(mx, o.mx);
  }
  double half_area() const {
    double ex = (double)mx.x - mn.x, ey = (double)mx.y - mn.y,
           ez = (double)mx.z - mn.z;
    return ex * ey + ey * ez + ez * ex;
  }
};

struct Builder {
  const Vec3 *tmin, *tmax, *cent;
  int32_t* perm;
  float* node_min;
  float* node_max;
  int32_t* left_first;
  int32_t* tri_count;
  long n_nodes = 0;
  long max_nodes;
  int min_leaf, max_leaf;

  AABB range_bounds(long first, long count) const {
    AABB b;
    for (long i = first; i < first + count; ++i) {
      int32_t t = perm[i];
      b.grow(tmin[t]);
      b.grow(tmax[t]);
    }
    return b;
  }

  void store(long node, const AABB& b, long first, long count, bool leaf) {
    node_min[node * 3 + 0] = b.mn.x;
    node_min[node * 3 + 1] = b.mn.y;
    node_min[node * 3 + 2] = b.mn.z;
    node_max[node * 3 + 0] = b.mx.x;
    node_max[node * 3 + 1] = b.mx.y;
    node_max[node * 3 + 2] = b.mx.z;
    left_first[node] = (int32_t)first;
    tri_count[node] = leaf ? (int32_t)count : 0;
  }

  // returns (axis, pos, cost); axis -1 when no valid plane
  void best_plane(long first, long count, int* out_axis, float* out_pos,
                  double* out_cost) const {
    constexpr int BINS = 8;
    *out_axis = -1;
    *out_cost = 1e300;
    for (int axis = 0; axis < 3; ++axis) {
      float cmn = 1e30f, cmx = -1e30f;
      for (long i = first; i < first + count; ++i) {
        float c = (&cent[perm[i]].x)[axis];
        cmn = std::min(cmn, c);
        cmx = std::max(cmx, c);
      }
      if (cmx <= cmn) continue;
      AABB bins[BINS];
      int counts[BINS] = {0};
      float scale = BINS / (cmx - cmn);
      for (long i = first; i < first + count; ++i) {
        int32_t t = perm[i];
        int b = std::min(BINS - 1, (int)(((&cent[t].x)[axis] - cmn) * scale));
        counts[b]++;
        bins[b].grow(tmin[t]);
        bins[b].grow(tmax[t]);
      }
      double left_area[BINS - 1], right_area[BINS - 1];
      int left_cnt[BINS - 1], right_cnt[BINS - 1];
      AABB lb, rb;
      int ls = 0, rs = 0;
      for (int i = 0; i < BINS - 1; ++i) {
        ls += counts[i];
        left_cnt[i] = ls;
        lb.grow(bins[i]);
        left_area[i] = lb.half_area();
        rs += counts[BINS - 1 - i];
        right_cnt[BINS - 2 - i] = rs;
        rb.grow(bins[BINS - 1 - i]);
        right_area[BINS - 2 - i] = rb.half_area();
      }
      float step = (cmx - cmn) / BINS;
      for (int i = 0; i < BINS - 1; ++i) {
        if (left_cnt[i] == 0 || right_cnt[i] == 0) continue;
        double cost = left_cnt[i] * left_area[i] + right_cnt[i] * right_area[i];
        if (cost < *out_cost) {
          *out_cost = cost;
          *out_axis = axis;
          *out_pos = cmn + step * (i + 1);
        }
      }
    }
  }

  // recursive subdivide; returns false on node-pool overflow
  bool subdivide(long node, long first, long count, int depth) {
    AABB bounds = range_bounds(first, count);
    bool must_split = max_leaf > 0 && count > max_leaf && depth < 64;

    int axis = -1;
    float pos = 0.0f;
    double cost = 1e300;
    if (count > 1) best_plane(first, count, &axis, &pos, &cost);

    double parent_cost = (double)count * bounds.half_area();
    bool sah_split = axis >= 0 && cost < parent_cost && count > min_leaf;
    if (!(sah_split || must_split) || count < 2 || depth >= 64) {
      store(node, bounds, first, count, true);
      return true;
    }

    long mid;
    if (axis >= 0) {
      // in-place partition of perm by centroid side
      long i = first, j = first + count - 1;
      while (i <= j) {
        if ((&cent[perm[i]].x)[axis] < pos) {
          ++i;
        } else {
          std::swap(perm[i], perm[j]);
          --j;
        }
      }
      mid = i;
    } else {
      mid = first;
    }
    if (mid == first || mid == first + count) {
      if (must_split) {
        mid = first + count / 2;  // object-median fallback
      } else {
        store(node, bounds, first, count, true);
        return true;
      }
    }

    if (n_nodes + 2 > max_nodes) return false;
    long left = n_nodes;
    n_nodes += 2;
    store(node, bounds, left, 0, false);
    if (!subdivide(left, first, mid - first, depth + 1)) return false;
    if (!subdivide(left + 1, mid, first + count - mid, depth + 1)) return false;
    return true;
  }
};

}  // namespace

extern "C" {

// Builds one BVH per mesh over the shared triangle arena.
// v0/v1/v2: [T, 3] f32; mesh_counts: [n_meshes]; outputs preallocated:
// node_min/node_max [max_nodes, 3], left_first/tri_count [max_nodes],
// roots [n_meshes], perm [T]. Returns node count, or -1 on overflow.
long clrt_build_bvh(const float* v0, const float* v1, const float* v2, long T,
                    const long* mesh_counts, int n_meshes, int min_leaf,
                    int max_leaf, float* node_min, float* node_max,
                    int32_t* left_first, int32_t* tri_count, int32_t* roots,
                    int32_t* perm, long max_nodes) {
  std::vector<Vec3> tmin(T), tmax(T), cent(T);
  for (long i = 0; i < T; ++i) {
    Vec3 a{v0[i * 3], v0[i * 3 + 1], v0[i * 3 + 2]};
    Vec3 b{v1[i * 3], v1[i * 3 + 1], v1[i * 3 + 2]};
    Vec3 c{v2[i * 3], v2[i * 3 + 1], v2[i * 3 + 2]};
    tmin[i] = vmin(a, vmin(b, c));
    tmax[i] = vmax(a, vmax(b, c));
    cent[i] = {(a.x + b.x + c.x) / 3.0f, (a.y + b.y + c.y) / 3.0f,
               (a.z + b.z + c.z) / 3.0f};
  }
  for (long i = 0; i < T; ++i) perm[i] = (int32_t)i;

  Builder bld;
  bld.tmin = tmin.data();
  bld.tmax = tmax.data();
  bld.cent = cent.data();
  bld.perm = perm;
  bld.node_min = node_min;
  bld.node_max = node_max;
  bld.left_first = left_first;
  bld.tri_count = tri_count;
  bld.max_nodes = max_nodes;
  bld.min_leaf = min_leaf;
  bld.max_leaf = max_leaf;
  bld.n_nodes = n_meshes;  // roots first

  long start = 0;
  for (int m = 0; m < n_meshes; ++m) {
    roots[m] = m;
    if (!bld.subdivide(m, start, mesh_counts[m], 0)) return -1;
    start += mesh_counts[m];
  }
  return bld.n_nodes;
}

}  // extern "C"
