// Single-core C++ LiDAR-odometry map-building baseline.
//
// Purpose (VERDICT r3 Next #1): the measured C++ denominator for the TPU
// fused odometry loop (mp2p_icp_tpu/odometry.py). Mirrors the reference's
// single-core hot path for the same per-frame pipeline:
//   deskew (constant twist, FilterDeskew.cpp:69-275 model)
//   -> voxel decimate FIRST_POINT (PointCloudToVoxelGrid semantics)
//   -> scan-to-accumulated-map point-to-plane ICP (KD-tree kNN per point,
//      plane fit via 3x3 eigen, Gauss-Newton 6-DoF update — the
//      Solver_GaussNewton/errorTerms pt2pl math)
//   -> merge into the map with first-point-per-voxel maintenance
//      (FilterMerge.cpp:96-108 + map decimation)
// with the KD-tree REBUILT whenever the map grows (the reference's lazy
// per-map trees are invalidated on every update, metricmap.cpp:784-802).
// Fresh implementation of standard algorithms; no reference/nanoflann code.
//
// Input binary (written by bench.py):
//   int32 n_frames, float32 dt
//   per frame: float32 twist[6], int32 n, float32 (x,y,z,time) * n
// argv: frames.bin out_poses.txt [threshold=1.5] [voxel=0.5]
// Output: one JSON line {"scans_per_s":..,"n_frames":..,"map_points":..};
//   per-frame world poses go to out_poses.txt in KITTI 3x4 format.

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <numeric>
#include <unordered_set>
#include <vector>

struct V3 {
  float x, y, z;
};

static inline float d2(const V3 &a, const V3 &b) {
  float dx = a.x - b.x, dy = a.y - b.y, dz = a.z - b.z;
  return dx * dx + dy * dy + dz * dz;
}

// ---------------------------------------------------------------- KD-tree
// Median-split tree, leaf 16, with bounded k-NN search.
struct KDTree {
  struct Node {
    int left = -1, right = -1;
    int begin = 0, end = 0;
    int axis = 0;
    float split = 0.f;
  };
  const std::vector<V3> *pts = nullptr;
  std::vector<int> idx;
  std::vector<Node> nodes;

  void build(const std::vector<V3> &p) {
    pts = &p;
    idx.resize(p.size());
    std::iota(idx.begin(), idx.end(), 0);
    nodes.clear();
    nodes.reserve(p.size() / 8 + 4);
    if (!p.empty()) build_rec(0, (int)p.size());
  }

  int build_rec(int b, int e) {
    int id = (int)nodes.size();
    nodes.push_back({});
    Node n;
    n.begin = b;
    n.end = e;
    if (e - b <= 16) {
      nodes[id] = n;
      return id;
    }
    float lo[3] = {1e30f, 1e30f, 1e30f}, hi[3] = {-1e30f, -1e30f, -1e30f};
    for (int i = b; i < e; i++) {
      const V3 &q = (*pts)[idx[i]];
      const float c[3] = {q.x, q.y, q.z};
      for (int a = 0; a < 3; a++) {
        lo[a] = std::min(lo[a], c[a]);
        hi[a] = std::max(hi[a], c[a]);
      }
    }
    int axis = 0;
    for (int a = 1; a < 3; a++)
      if (hi[a] - lo[a] > hi[axis] - lo[axis]) axis = a;
    int m = (b + e) / 2;
    auto key = [&](int i) {
      const V3 &q = (*pts)[i];
      return axis == 0 ? q.x : (axis == 1 ? q.y : q.z);
    };
    std::nth_element(idx.begin() + b, idx.begin() + m, idx.begin() + e,
                     [&](int i, int j) { return key(i) < key(j); });
    n.axis = axis;
    n.split = key(idx[m]);
    n.left = build_rec(b, m);
    n.right = build_rec(m, e);
    nodes[id] = n;
    return id;
  }

  // k nearest within sqrt(maxD2): fills (idx, d2) pairs, returns count.
  int knn(const V3 &q, int k, float maxD2, int *out_idx, float *out_d2) const {
    int cnt = 0;
    float worst = maxD2;
    knn_rec(0, q, k, cnt, worst, out_idx, out_d2);
    return cnt;
  }

  void knn_rec(int id, const V3 &q, int k, int &cnt, float &worst,
               int *oi, float *od) const {
    const Node &n = nodes[id];
    if (n.left < 0) {
      for (int i = n.begin; i < n.end; i++) {
        float d = d2(q, (*pts)[idx[i]]);
        if (d >= worst && cnt >= k) continue;
        if (d >= worst) continue;  // beyond radius even if room remains
        // insertion into the small sorted heap-array
        int pos = cnt < k ? cnt : k - 1;
        if (cnt < k) cnt++;
        while (pos > 0 && od[pos - 1] > d) {
          od[pos] = od[pos - 1];
          oi[pos] = oi[pos - 1];
          pos--;
        }
        od[pos] = d;
        oi[pos] = idx[i];
        if (cnt == k) worst = od[k - 1];
      }
      return;
    }
    const float c[3] = {q.x, q.y, q.z};
    float delta = c[n.axis] - n.split;
    int near = delta <= 0 ? n.left : n.right;
    int far = delta <= 0 ? n.right : n.left;
    knn_rec(near, q, k, cnt, worst, oi, od);
    if (delta * delta < worst) knn_rec(far, q, k, cnt, worst, oi, od);
  }
};

// ------------------------------------------------------------------ SE(3)
struct Pose {
  double R[9] = {1, 0, 0, 0, 1, 0, 0, 0, 1};
  double t[3] = {0, 0, 0};
  V3 apply(const V3 &p) const {
    return {(float)(R[0] * p.x + R[1] * p.y + R[2] * p.z + t[0]),
            (float)(R[3] * p.x + R[4] * p.y + R[5] * p.z + t[1]),
            (float)(R[6] * p.x + R[7] * p.y + R[8] * p.z + t[2])};
  }
};

static Pose compose(const Pose &a, const Pose &b) {
  Pose c;
  for (int i = 0; i < 3; i++) {
    for (int j = 0; j < 3; j++) {
      double s = 0;
      for (int k = 0; k < 3; k++) s += a.R[3 * i + k] * b.R[3 * k + j];
      c.R[3 * i + j] = s;
    }
    double s = a.t[i];
    for (int k = 0; k < 3; k++) s += a.R[3 * i + k] * b.t[k];
    c.t[i] = s;
  }
  return c;
}

// se(3) exp, tangent = [v, w]
static Pose se3_exp(const double xi[6]) {
  Pose p;
  const double wx = xi[3], wy = xi[4], wz = xi[5];
  const double th = std::sqrt(wx * wx + wy * wy + wz * wz);
  double K[9] = {0, -wz, wy, wz, 0, -wx, -wy, wx, 0};
  double K2[9];
  for (int i = 0; i < 3; i++)
    for (int j = 0; j < 3; j++) {
      double s = 0;
      for (int k = 0; k < 3; k++) s += K[3 * i + k] * K[3 * k + j];
      K2[3 * i + j] = s;
    }
  double A, B, C;
  if (th < 1e-9) {
    A = 1.0;
    B = 0.5;
    C = 1.0 / 6.0;
  } else {
    A = std::sin(th) / th;
    B = (1 - std::cos(th)) / (th * th);
    C = (th - std::sin(th)) / (th * th * th);
  }
  for (int i = 0; i < 9; i++) p.R[i] = (i % 4 == 0 ? 1.0 : 0.0) + A * K[i] + B * K2[i];
  double V[9];
  for (int i = 0; i < 9; i++) V[i] = (i % 4 == 0 ? 1.0 : 0.0) + B * K[i] + C * K2[i];
  for (int i = 0; i < 3; i++)
    p.t[i] = V[3 * i] * xi[0] + V[3 * i + 1] * xi[1] + V[3 * i + 2] * xi[2];
  return p;
}

// smallest-eigenvector of a symmetric 3x3 via cyclic Jacobi (5 sweeps)
static void min_eigvec_3x3(double M[9], double out[3]) {
  double V[9] = {1, 0, 0, 0, 1, 0, 0, 0, 1};
  for (int sweep = 0; sweep < 5; sweep++) {
    for (int p = 0; p < 2; p++)
      for (int q = p + 1; q < 3; q++) {
        double apq = M[3 * p + q];
        if (std::fabs(apq) < 1e-15) continue;
        double app = M[3 * p + p], aqq = M[3 * q + q];
        double phi = 0.5 * std::atan2(2 * apq, aqq - app);
        double c = std::cos(phi), s = std::sin(phi);
        for (int k = 0; k < 3; k++) {
          double mkp = M[3 * k + p], mkq = M[3 * k + q];
          M[3 * k + p] = c * mkp - s * mkq;
          M[3 * k + q] = s * mkp + c * mkq;
        }
        for (int k = 0; k < 3; k++) {
          double mpk = M[3 * p + k], mqk = M[3 * q + k];
          M[3 * p + k] = c * mpk - s * mqk;
          M[3 * q + k] = s * mpk + c * mqk;
        }
        for (int k = 0; k < 3; k++) {
          double vkp = V[3 * k + p], vkq = V[3 * k + q];
          V[3 * k + p] = c * vkp - s * vkq;
          V[3 * k + q] = s * vkp + c * vkq;
        }
      }
  }
  int mi = 0;
  for (int i = 1; i < 3; i++)
    if (M[3 * i + i] < M[3 * mi + mi]) mi = i;
  for (int k = 0; k < 3; k++) out[k] = V[3 * k + mi];
}

// 6x6 Cholesky solve (in-place); returns false if not SPD
static bool solve6(double H[36], double g[6], double out[6]) {
  double L[36] = {0};
  for (int i = 0; i < 6; i++) {
    for (int j = 0; j <= i; j++) {
      double s = H[6 * i + j];
      for (int k = 0; k < j; k++) s -= L[6 * i + k] * L[6 * j + k];
      if (i == j) {
        if (s <= 1e-12) return false;
        L[6 * i + j] = std::sqrt(s);
      } else {
        L[6 * i + j] = s / L[6 * j + j];
      }
    }
  }
  double y[6];
  for (int i = 0; i < 6; i++) {
    double s = g[i];
    for (int k = 0; k < i; k++) s -= L[6 * i + k] * y[k];
    y[i] = s / L[6 * i + i];
  }
  for (int i = 5; i >= 0; i--) {
    double s = y[i];
    for (int k = i + 1; k < 6; k++) s -= L[6 * k + i] * out[k];
    out[i] = s / L[6 * i + i];
  }
  return true;
}

// voxel key
static inline int64_t vkey(const V3 &p, float inv_res) {
  int64_t a = (int64_t)std::floor(p.x * inv_res) + (1 << 20);
  int64_t b = (int64_t)std::floor(p.y * inv_res) + (1 << 20);
  int64_t c = (int64_t)std::floor(p.z * inv_res) + (1 << 20);
  return (a << 42) | (b << 21) | c;
}

int main(int argc, char **argv) {
  if (argc < 3) {
    std::fprintf(stderr,
                 "usage: %s frames.bin out_poses.txt [thr] [voxel]\n",
                 argv[0]);
    return 2;
  }
  FILE *f = std::fopen(argv[1], "rb");
  if (!f) {
    std::perror("open");
    return 2;
  }
  int32_t n_frames = 0;
  float dt = 0.1f;
  if (std::fread(&n_frames, 4, 1, f) != 1) return 2;
  if (std::fread(&dt, 4, 1, f) != 1) return 2;
  struct Frame {
    float twist[6];
    std::vector<float> pts;  // (x, y, z, time) * n
  };
  std::vector<Frame> frames(n_frames);
  for (auto &fr : frames) {
    if (std::fread(fr.twist, 4, 6, f) != 6) return 2;
    int32_t n = 0;
    if (std::fread(&n, 4, 1, f) != 1) return 2;
    fr.pts.resize((size_t)n * 4);
    if (std::fread(fr.pts.data(), 4, fr.pts.size(), f) != fr.pts.size())
      return 2;
  }
  std::fclose(f);
  const float thr = argc > 3 ? (float)std::atof(argv[3]) : 1.5f;
  const float voxel = argc > 4 ? (float)std::atof(argv[4]) : 0.5f;
  const float thr2 = thr * thr, inv_vox = 1.0f / voxel;
  const int KNN = 8;

  auto preprocess = [&](const Frame &fr, std::vector<V3> &out) {
    // deskew: p' = exp(time * twist) ∘ p, then FIRST_POINT voxel decimate
    out.clear();
    std::unordered_set<int64_t> seen;
    const size_t n = fr.pts.size() / 4;
    double xi[6];
    for (size_t i = 0; i < n; i++) {
      const float tm = fr.pts[4 * i + 3];
      for (int k = 0; k < 6; k++) xi[k] = (double)tm * fr.twist[k];
      Pose c = se3_exp(xi);
      V3 p = {fr.pts[4 * i], fr.pts[4 * i + 1], fr.pts[4 * i + 2]};
      V3 q = c.apply(p);
      int64_t key = vkey(q, inv_vox);
      if (seen.insert(key).second) out.push_back(q);
    }
  };

  std::vector<V3> map_pts;
  std::unordered_set<int64_t> map_vox;
  auto merge_into_map = [&](const std::vector<V3> &world) {
    for (const V3 &p : world) {
      int64_t key = vkey(p, inv_vox);
      if (map_vox.insert(key).second) map_pts.push_back(p);
    }
  };

  FILE *fo = std::fopen(argv[2], "w");
  if (!fo) {
    std::perror("out");
    return 2;
  }
  auto emit_pose = [&](const Pose &p) {
    std::fprintf(fo,
                 "%.9g %.9g %.9g %.9g %.9g %.9g %.9g %.9g %.9g %.9g %.9g "
                 "%.9g\n",
                 p.R[0], p.R[1], p.R[2], p.t[0], p.R[3], p.R[4], p.R[5],
                 p.t[1], p.R[6], p.R[7], p.R[8], p.t[2]);
  };

  // frame 0 seeds the map at the origin (bench feeds sensor-frame scans
  // with the first pose as world origin)
  Pose pose;  // identity
  std::vector<V3> local;
  preprocess(frames[0], local);
  {
    std::vector<V3> world(local.size());
    for (size_t i = 0; i < local.size(); i++) world[i] = pose.apply(local[i]);
    merge_into_map(world);
  }
  emit_pose(pose);

  auto t0 = std::chrono::steady_clock::now();
  for (int fi = 1; fi < n_frames; fi++) {
    preprocess(frames[fi], local);
    // KD-tree rebuild: the map changed last frame (lazy-tree invalidation)
    KDTree tree;
    tree.build(map_pts);
    // motion-model seed from the previous frame's twist
    double xi[6];
    for (int k = 0; k < 6; k++) xi[k] = (double)dt * frames[fi - 1].twist[k];
    Pose cur = compose(pose, se3_exp(xi));

    int oi[KNN];
    float od[KNN];
    for (int it = 0; it < 30; it++) {
      Pose before = cur;
      for (int gn = 0; gn < 3; gn++) {
        double H[36] = {0}, g[6] = {0};
        int n_pairs = 0;
        for (const V3 &pl : local) {
          V3 q = cur.apply(pl);
          int cnt = tree.knn(q, KNN, thr2, oi, od);
          if (cnt < 4) continue;
          // plane fit over the k neighbours
          double c[3] = {0, 0, 0};
          for (int k = 0; k < cnt; k++) {
            const V3 &m = map_pts[oi[k]];
            c[0] += m.x;
            c[1] += m.y;
            c[2] += m.z;
          }
          for (int a = 0; a < 3; a++) c[a] /= cnt;
          double M[9] = {0};
          for (int k = 0; k < cnt; k++) {
            const V3 &m = map_pts[oi[k]];
            double dd[3] = {m.x - c[0], m.y - c[1], m.z - c[2]};
            for (int a = 0; a < 3; a++)
              for (int b = 0; b < 3; b++) M[3 * a + b] += dd[a] * dd[b];
          }
          double nvec[3];
          min_eigvec_3x3(M, nvec);
          double r = nvec[0] * (q.x - c[0]) + nvec[1] * (q.y - c[1]) +
                     nvec[2] * (q.z - c[2]);
          // J = [n ; q x n]
          double J[6] = {nvec[0], nvec[1], nvec[2],
                         q.y * nvec[2] - q.z * nvec[1],
                         q.z * nvec[0] - q.x * nvec[2],
                         q.x * nvec[1] - q.y * nvec[0]};
          for (int a = 0; a < 6; a++) {
            g[a] += J[a] * r;
            for (int b = 0; b < 6; b++) H[6 * a + b] += J[a] * J[b];
          }
          n_pairs++;
        }
        if (n_pairs < 10) break;
        for (int a = 0; a < 6; a++) H[7 * a] += 1e-6;
        double delta[6];
        if (!solve6(H, g, delta)) break;
        for (int a = 0; a < 6; a++) delta[a] = -delta[a];
        cur = compose(se3_exp(delta), cur);
      }
      double dtr = 0;
      for (int a = 0; a < 3; a++) {
        double d = cur.t[a] - before.t[a];
        dtr += d * d;
      }
      double drr = 0;
      for (int a = 0; a < 9; a++) {
        double d = cur.R[a] - before.R[a];
        drr += d * d;
      }
      if (std::sqrt(dtr) < 5e-4 && std::sqrt(drr) < 1e-4) break;
    }
    pose = cur;
    emit_pose(pose);
    std::vector<V3> world(local.size());
    for (size_t i = 0; i < local.size(); i++) world[i] = pose.apply(local[i]);
    merge_into_map(world);
  }
  auto t1 = std::chrono::steady_clock::now();
  double secs = std::chrono::duration<double>(t1 - t0).count();
  std::fclose(fo);

  std::printf(
      "{\"scans_per_s\": %.4f, \"n_frames\": %d, \"map_points\": %zu}\n",
      (n_frames - 1) / secs, n_frames, map_pts.size());
  return 0;
}
