// Single-core C++ KD-tree ICP micro-baseline.
//
// Purpose (BASELINE.md "to be measured" item 1): the reference (MOLAorg/
// mp2p_icp) cannot be built in this image (MRPT >= 2.11.5 is not
// installable), so this is the measured stand-in for its single-core
// icp-run hot path: per-align KD-tree build over the global cloud
// (the reference builds nanoflann trees lazily per map,
// mp2p_icp_map/src/metricmap.cpp:784-802), per-iteration radius-bounded
// 1-NN per local point (Matcher_Points_DistanceThreshold.cpp:206-266,
// single-thread fallback path), Horn closed-form SE(3) update
// (optimal_tf_horn.cpp:77-252), iterate to the reference's default
// termination (Parameters.h:42-52: 40 iters, 5e-4 m / 1e-4 rad steps).
// No code is copied from the reference or nanoflann; this is a fresh
// implementation of the same standard algorithms.
//
// Input: binary file
//   int32 nG, float32 xyzG[nG*3], int32 nL, float32 xyzL[nL*3]
// argv: file n_reps [threshold] [tx ty tz yaw pitch roll]
//   the optional 6-DoF initial guess makes this the scan-to-LARGE-map
//   baseline (BASELINE.md / VERDICT r2 Missing #1): G is then an
//   accumulated map (e.g. 1M points) and L a sensor-frame scan whose world
//   pose rides in the guess, matching bench.py's scan2map workload.
// Output: one JSON line {"aligns_per_s":..,"iters":..,"tx":..,...};
//   aligns_per_s pays the per-align KD-tree build (the reference builds
//   per-map trees lazily and rebuilds on map update — an odometry map
//   changes every keyframe, metricmap.cpp:784-802); aligns_per_s_cached
//   reuses one tree across reps (best case: a frozen map).
//
// Usage: bench.py writes the identical synthetic pair it benchmarks on the
// TPU, runs this binary, and reports vs_baseline against the measured
// number.

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <numeric>
#include <vector>

struct V3 {
  float x, y, z;
};

static inline float d2(const V3 &a, const V3 &b) {
  float dx = a.x - b.x, dy = a.y - b.y, dz = a.z - b.z;
  return dx * dx + dy * dy + dz * dz;
}

// ---------------------------------------------------------------- KD-tree
// Median-split tree over indices; leaf size 16 (reference exposes
// kdtree_leaf_max_points tuning, Matcher_Points_Base.cpp:104-114).
struct KDTree {
  struct Node {
    int left = -1, right = -1;  // children node ids (-1 = leaf)
    int begin = 0, end = 0;     // leaf range into idx
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
    build_rec(0, (int)p.size());
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
    // split on max-spread axis at the median
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

  // 1-NN within sqrt(maxD2); returns index or -1.
  int nn(const V3 &q, float maxD2, float *outD2) const {
    int best = -1;
    float bd = maxD2;
    nn_rec(0, q, best, bd);
    *outD2 = bd;
    return best;
  }

  void nn_rec(int id, const V3 &q, int &best, float &bd) const {
    const Node &n = nodes[id];
    if (n.left < 0) {
      for (int i = n.begin; i < n.end; i++) {
        float d = d2(q, (*pts)[idx[i]]);
        if (d < bd) {
          bd = d;
          best = idx[i];
        }
      }
      return;
    }
    const float c[3] = {q.x, q.y, q.z};
    float delta = c[n.axis] - n.split;
    int near = delta <= 0 ? n.left : n.right;
    int far = delta <= 0 ? n.right : n.left;
    nn_rec(near, q, best, bd);
    if (delta * delta < bd) nn_rec(far, q, best, bd);
  }
};

// ------------------------------------------------------------- SE(3) Horn
struct Pose {
  float R[9] = {1, 0, 0, 0, 1, 0, 0, 0, 1};
  float t[3] = {0, 0, 0};
  V3 apply(const V3 &p) const {
    return {R[0] * p.x + R[1] * p.y + R[2] * p.z + t[0],
            R[3] * p.x + R[4] * p.y + R[5] * p.z + t[1],
            R[6] * p.x + R[7] * p.y + R[8] * p.z + t[2]};
  }
};

// Largest-eigenvector of the symmetric 4x4 Horn matrix by shifted power
// iteration; quaternion -> rotation.
static Pose horn(const std::vector<V3> &L, const std::vector<V3> &G,
                 const std::vector<std::pair<int, int>> &pairs) {
  double cl[3] = {0, 0, 0}, cg[3] = {0, 0, 0};
  const double n = (double)pairs.size();
  for (auto &pr : pairs) {
    const V3 &a = L[pr.first], &b = G[pr.second];
    cl[0] += a.x; cl[1] += a.y; cl[2] += a.z;
    cg[0] += b.x; cg[1] += b.y; cg[2] += b.z;
  }
  for (int i = 0; i < 3; i++) {
    cl[i] /= n;
    cg[i] /= n;
  }
  double S[9] = {0};
  for (auto &pr : pairs) {
    const V3 &a = L[pr.first], &b = G[pr.second];
    double l[3] = {a.x - cl[0], a.y - cl[1], a.z - cl[2]};
    double g[3] = {b.x - cg[0], b.y - cg[1], b.z - cg[2]};
    for (int i = 0; i < 3; i++)
      for (int j = 0; j < 3; j++) S[3 * i + j] += l[i] * g[j];
  }
  const double Sxx = S[0], Sxy = S[1], Sxz = S[2], Syx = S[3], Syy = S[4],
               Syz = S[5], Szx = S[6], Szy = S[7], Szz = S[8];
  double N[16] = {
      Sxx + Syy + Szz, Syz - Szy,        Szx - Sxz,        Sxy - Syx,
      Syz - Szy,       Sxx - Syy - Szz,  Sxy + Syx,        Szx + Sxz,
      Szx - Sxz,       Sxy + Syx,        -Sxx + Syy - Szz, Syz + Szy,
      Sxy - Syx,       Szx + Sxz,        Syz + Szy,        -Sxx - Syy + Szz};
  // shift so the target eigenvalue is the dominant one in magnitude
  double shift = 0;
  for (int i = 0; i < 4; i++) {
    double row = 0;
    for (int j = 0; j < 4; j++) row += std::fabs(N[4 * i + j]);
    shift = std::max(shift, row);
  }
  for (int i = 0; i < 4; i++) N[5 * i] += shift;
  double q[4] = {1, 0.1, 0.1, 0.1};
  for (int it = 0; it < 60; it++) {
    double r[4] = {0, 0, 0, 0};
    for (int i = 0; i < 4; i++)
      for (int j = 0; j < 4; j++) r[i] += N[4 * i + j] * q[j];
    double nm = std::sqrt(r[0] * r[0] + r[1] * r[1] + r[2] * r[2] + r[3] * r[3]);
    for (int i = 0; i < 4; i++) q[i] = r[i] / nm;
  }
  const double w = q[0], x = q[1], y = q[2], z = q[3];
  Pose P;
  P.R[0] = (float)(w * w + x * x - y * y - z * z);
  P.R[1] = (float)(2 * (x * y - w * z));
  P.R[2] = (float)(2 * (x * z + w * y));
  P.R[3] = (float)(2 * (x * y + w * z));
  P.R[4] = (float)(w * w - x * x + y * y - z * z);
  P.R[5] = (float)(2 * (y * z - w * x));
  P.R[6] = (float)(2 * (x * z - w * y));
  P.R[7] = (float)(2 * (y * z + w * x));
  P.R[8] = (float)(w * w - x * x - y * y + z * z);
  V3 c = {(float)cl[0], (float)cl[1], (float)cl[2]};
  V3 rc = P.apply(c);
  P.t[0] = (float)(cg[0] - (rc.x - P.t[0]));
  P.t[1] = (float)(cg[1] - (rc.y - P.t[1]));
  P.t[2] = (float)(cg[2] - (rc.z - P.t[2]));
  return P;
}

int main(int argc, char **argv) {
  if (argc < 3) {
    std::fprintf(stderr, "usage: %s pair.bin n_reps [threshold]\n", argv[0]);
    return 2;
  }
  FILE *f = std::fopen(argv[1], "rb");
  if (!f) {
    std::perror("open");
    return 2;
  }
  auto read_cloud = [&](std::vector<V3> &out) {
    int32_t n = 0;
    if (std::fread(&n, 4, 1, f) != 1) std::exit(2);
    out.resize(n);
    if (std::fread(out.data(), sizeof(V3), n, f) != (size_t)n) std::exit(2);
  };
  std::vector<V3> G, L;
  read_cloud(G);
  read_cloud(L);
  std::fclose(f);
  const int reps = std::atoi(argv[2]);
  const float thr = argc > 3 ? (float)std::atof(argv[3]) : 2.0f;
  const float thr2 = thr * thr;

  // optional 6-DoF initial guess (scan-to-map mode): ZYX yaw-pitch-roll
  Pose guess;
  if (argc > 9) {
    guess.t[0] = (float)std::atof(argv[4]);
    guess.t[1] = (float)std::atof(argv[5]);
    guess.t[2] = (float)std::atof(argv[6]);
    const double cy = std::cos(std::atof(argv[7])), sy = std::sin(std::atof(argv[7]));
    const double cp = std::cos(std::atof(argv[8])), sp = std::sin(std::atof(argv[8]));
    const double cr = std::cos(std::atof(argv[9])), sr = std::sin(std::atof(argv[9]));
    guess.R[0] = (float)(cy * cp);
    guess.R[1] = (float)(cy * sp * sr - sy * cr);
    guess.R[2] = (float)(cy * sp * cr + sy * sr);
    guess.R[3] = (float)(sy * cp);
    guess.R[4] = (float)(sy * sp * sr + cy * cr);
    guess.R[5] = (float)(sy * sp * cr - cy * sr);
    guess.R[6] = (float)(-sp);
    guess.R[7] = (float)(cp * sr);
    guess.R[8] = (float)(cp * cr);
  }

  auto run_icp = [&](const KDTree &tree, Pose pose, int &iters_out) {
    std::vector<std::pair<int, int>> pairs;
    pairs.reserve(L.size());
    int it = 0;
    for (; it < 40; it++) {
      pairs.clear();
      for (int i = 0; i < (int)L.size(); i++) {
        V3 p = pose.apply(L[i]);
        float dd;
        int j = tree.nn(p, thr2, &dd);
        if (j >= 0) pairs.emplace_back(i, j);
      }
      if (pairs.empty()) break;
      // Horn solves for the FULL pose from raw local points; with a guess,
      // solve on guess-transformed locals then compose (same as the
      // reference seeding currentSolution with the guess, ICP.cpp:129).
      std::vector<V3> Lt(L.size());
      for (size_t i = 0; i < L.size(); i++) Lt[i] = pose.apply(L[i]);
      std::vector<std::pair<int, int>> id_pairs = pairs;
      Pose delta = horn(Lt, G, id_pairs);
      // next = delta ∘ pose
      Pose next;
      for (int i = 0; i < 3; i++)
        for (int j = 0; j < 3; j++) {
          float s = 0;
          for (int k = 0; k < 3; k++) s += delta.R[3 * i + k] * pose.R[3 * k + j];
          next.R[3 * i + j] = s;
        }
      for (int i = 0; i < 3; i++) {
        float s = delta.t[i];
        for (int k = 0; k < 3; k++) s += delta.R[3 * i + k] * pose.t[k];
        next.t[i] = s;
      }
      float dt = 0, dr = 0;
      for (int a = 0; a < 3; a++) {
        float d = next.t[a] - pose.t[a];
        dt += d * d;
      }
      for (int a = 0; a < 9; a++) {
        float d = next.R[a] - pose.R[a];
        dr += d * d;
      }
      pose = next;
      if (std::sqrt(dt) < 5e-4f && std::sqrt(dr) < 1e-4f) {
        it++;
        break;
      }
    }
    iters_out = it;
    return pose;
  };

  Pose final_pose;
  int final_iters = 0;
  auto t0 = std::chrono::steady_clock::now();
  for (int rep = 0; rep < reps; rep++) {
    // per-align tree build: the reference's lazy per-map KD-tree is
    // invalidated whenever the map changes (every odometry keyframe)
    KDTree tree;
    tree.build(G);
    final_pose = run_icp(tree, guess, final_iters);
  }
  auto t1 = std::chrono::steady_clock::now();
  double secs = std::chrono::duration<double>(t1 - t0).count();

  // tree-cached variant: one build amortised over all reps (frozen map)
  KDTree tree;
  auto tb0 = std::chrono::steady_clock::now();
  tree.build(G);
  auto tb1 = std::chrono::steady_clock::now();
  double tree_secs = std::chrono::duration<double>(tb1 - tb0).count();
  int it2 = 0;
  auto t2 = std::chrono::steady_clock::now();
  for (int rep = 0; rep < reps; rep++) final_pose = run_icp(tree, guess, it2);
  auto t3 = std::chrono::steady_clock::now();
  double secs_cached = std::chrono::duration<double>(t3 - t2).count();

  std::printf(
      "{\"aligns_per_s\": %.4f, \"aligns_per_s_cached\": %.4f, "
      "\"tree_build_s\": %.4f, \"iters\": %d, \"tx\": %.4f, \"ty\": %.4f, "
      "\"tz\": %.4f}\n",
      reps / secs, reps / secs_cached, tree_secs, final_iters,
      final_pose.t[0], final_pose.t[1], final_pose.t[2]);
  return 0;
}
