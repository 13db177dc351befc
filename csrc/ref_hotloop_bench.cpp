// Measured CPU floor for the reference's step-1 hot loop.
//
// The reference binary (tum-vision/povar) cannot be built here: its
// vendored submodules (Sophus, abseil, cereal, fmt, visit_struct, ...)
// are empty and there is no network. What CAN be measured is the cost
// of its hot-loop *algorithm* on this host's CPU: one pOSE
// Power-VarProj LM iteration over per-landmark dense blocks in double
// precision with Eigen — the same storage layout
// (sc/landmark_block.hpp:101-133: per-landmark [4*n_obs x (12+3+1)]
// row-major), the same passes (linearize -> Hll^-1 -> Hpp/b ->
// m power-series terms of B^-1 E0 -> back-substitution;
// sc/linearization_power_varproj.hpp:124-287), and the same
// per-camera scatter-adds the reference serializes with pose mutexes
// (single-threaded here: the bench host has one vCPU, so mutexes are
// uncontended and omitted).
//
// This is an independent implementation of the algorithm (no reference
// code), used solely to turn the analytic 60 GFLOP/s 64-thread
// baseline model of bench.py into a number anchored by a measured
// per-thread rate. Output: one JSON line with seconds/iteration and
// the implied effective GFLOP/s for the FLOP count bench.py uses.
//
// Build: g++ -O3 -march=native -DNDEBUG -I<eigen> ref_hotloop_bench.cpp
//
// Usage: ./ref_hotloop_bench [n_cams n_lms obs_per_lm m reps]

#include <Eigen/Dense>

#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <vector>

using Mat34 = Eigen::Matrix<double, 3, 4>;
using Mat4x12 = Eigen::Matrix<double, 4, 12, Eigen::RowMajor>;
using Mat43 = Eigen::Matrix<double, 4, 3, Eigen::RowMajor>;
using Mat3 = Eigen::Matrix3d;
using Mat12 = Eigen::Matrix<double, 12, 12>;
using Vec12 = Eigen::Matrix<double, 12, 1>;
using Vec4 = Eigen::Vector4d;
using Vec3 = Eigen::Vector3d;

namespace {

struct LandmarkBlock {
  // storage rows: per obs 4 residual rows, cols [Jp(12) | Jl(3) | r]
  // (landmark_block.hpp storage_pOSE_ layout)
  Eigen::Matrix<double, Eigen::Dynamic, 16, Eigen::RowMajor> storage;
  std::vector<int> cam_idx;
  Mat3 hll_inv;
  Vec3 hll_inv_bl;
};

double now_s() {
  return std::chrono::duration<double>(
             std::chrono::steady_clock::now().time_since_epoch())
      .count();
}

}  // namespace

int main(int argc, char** argv) {
  int n_cams = argc > 1 ? atoi(argv[1]) : 89;
  int n_lms = argc > 2 ? atoi(argv[2]) : 110973;
  int obs_per_lm = argc > 3 ? atoi(argv[3]) : 5;
  int m = argc > 4 ? atoi(argv[4]) : 10;
  int reps = argc > 5 ? atoi(argv[5]) : 3;
  const double alpha = 0.01;
  const double sa = std::sqrt(alpha), sp = std::sqrt(1.0 - alpha);

  std::mt19937 rng(42);
  std::normal_distribution<double> gauss(0.0, 1.0);

  std::vector<Mat34> cams(n_cams);
  for (auto& c : cams) {
    for (int i = 0; i < 12; ++i) c(i / 4, i % 4) = gauss(rng);
  }
  std::vector<Vec3> lms(n_lms);
  for (auto& l : lms) l = Vec3(gauss(rng), gauss(rng), gauss(rng));

  std::vector<LandmarkBlock> blocks(n_lms);
  std::uniform_int_distribution<int> cam_pick(0, n_cams - 1);
  std::uniform_real_distribution<double> uv(-1.0, 1.0);
  std::vector<std::array<double, 2>> obs_uv;
  for (int l = 0; l < n_lms; ++l) {
    blocks[l].storage.resize(4 * obs_per_lm, 16);
    blocks[l].cam_idx.resize(obs_per_lm);
    for (int o = 0; o < obs_per_lm; ++o) {
      blocks[l].cam_idx[o] = cam_pick(rng);
    }
  }
  int n_obs = n_lms * obs_per_lm;

  std::vector<Mat12> b_inv(n_cams);
  Eigen::VectorXd bvec(12 * n_cams);
  Eigen::VectorXd x(12 * n_cams), tmp(12 * n_cams), acc(12 * n_cams);

  double total = 0.0;
  for (int rep = 0; rep < reps + 1; ++rep) {
    double t0 = now_s();

    // ---- linearize: pOSE residual + Jacobians per obs
    // (helper.cpp:243-313 math: affine rows sqrt(a)*(Px)_{0,1},
    // projective rows sqrt(1-a)*((Px)_{0,1} - uv*(Px)_2))
    for (int l = 0; l < n_lms; ++l) {
      auto& blk = blocks[l];
      const Vec3& X = lms[l];
      for (size_t o = 0; o < blk.cam_idx.size(); ++o) {
        const Mat34& P = cams[blk.cam_idx[o]];
        Vec4 Xh(X[0], X[1], X[2], 1.0);
        Vec3 px = P * Xh;
        double u = 0.3, v = -0.2;  // synthetic measurement
        Vec4 r(sp * (px[0] - u * px[2]), sp * (px[1] - v * px[2]),
               sa * (px[0] - u), sa * (px[1] - v));
        Mat4x12 Jp = Mat4x12::Zero();
        for (int c = 0; c < 4; ++c) {
          Jp(0, 0 * 4 + c) = sp * Xh[c];
          Jp(0, 2 * 4 + c) = -sp * u * Xh[c];
          Jp(1, 1 * 4 + c) = sp * Xh[c];
          Jp(1, 2 * 4 + c) = -sp * v * Xh[c];
          Jp(2, 0 * 4 + c) = sa * Xh[c];
          Jp(3, 1 * 4 + c) = sa * Xh[c];
        }
        Mat43 Jl;
        for (int c = 0; c < 3; ++c) {
          Jl(0, c) = sp * (P(0, c) - u * P(2, c));
          Jl(1, c) = sp * (P(1, c) - v * P(2, c));
          Jl(2, c) = sa * P(0, c);
          Jl(3, c) = sa * P(1, c);
        }
        blk.storage.block<4, 12>(4 * o, 0) = Jp;
        blk.storage.block<4, 3>(4 * o, 12) = Jl;
        blk.storage.block<4, 1>(4 * o, 15) = r;
      }
    }

    // ---- prepare_Hb: Hll^-1 per landmark, Hpp block diag + b per cam
    // (linearization_power_varproj.hpp:124-188 two passes)
    std::vector<Mat12> hpp(n_cams, Mat12::Zero());
    bvec.setZero();
    for (int l = 0; l < n_lms; ++l) {
      auto& blk = blocks[l];
      int rows = blk.storage.rows();
      auto Jl = blk.storage.middleCols<3>(12).topRows(rows);
      auto r = blk.storage.col(15).head(rows);
      Mat3 hll = Jl.transpose() * Jl;
      blk.hll_inv = hll.llt().solve(Mat3::Identity());
      blk.hll_inv_bl = blk.hll_inv * (Jl.transpose() * r);
      for (size_t o = 0; o < blk.cam_idx.size(); ++o) {
        auto Jp = blk.storage.block<4, 12>(4 * o, 0);
        auto Jlo = blk.storage.block<4, 3>(4 * o, 12);
        Vec4 ro = blk.storage.block<4, 1>(4 * o, 15);
        Vec4 rt = ro - Jlo * blk.hll_inv_bl;
        int c = blk.cam_idx[o];
        hpp[c].noalias() += Jp.transpose() * Jp;   // pose-mutex scatter
        bvec.segment<12>(12 * c).noalias() += Jp.transpose() * rt;
      }
    }
    const double lam = 1e-4;
    for (int c = 0; c < n_cams; ++c) {
      Mat12 damped = hpp[c] + lam * Mat12::Identity();
      b_inv[c] = damped.llt().solve(Mat12::Identity());
    }

    // ---- power series: x = sum_i (B^-1 E0)^i B^-1 (-b)
    // (hpp:191-287; E0 x via per-landmark gather/scatter, hpp:364-407)
    for (int c = 0; c < n_cams; ++c)
      x.segment<12>(12 * c) = b_inv[c] * (-bvec.segment<12>(12 * c));
    acc = x;
    for (int it = 0; it < m; ++it) {
      tmp.setZero();
      for (int l = 0; l < n_lms; ++l) {
        auto& blk = blocks[l];
        Vec3 u3 = Vec3::Zero();
        for (size_t o = 0; o < blk.cam_idx.size(); ++o) {
          auto Jp = blk.storage.block<4, 12>(4 * o, 0);
          auto Jlo = blk.storage.block<4, 3>(4 * o, 12);
          u3.noalias() +=
              Jlo.transpose() * (Jp * x.segment<12>(12 * blk.cam_idx[o]));
        }
        Vec3 w = blk.hll_inv * u3;
        for (size_t o = 0; o < blk.cam_idx.size(); ++o) {
          auto Jp = blk.storage.block<4, 12>(4 * o, 0);
          auto Jlo = blk.storage.block<4, 3>(4 * o, 12);
          tmp.segment<12>(12 * blk.cam_idx[o]).noalias() +=
              Jp.transpose() * (Jlo * w);  // pose-mutex scatter
        }
      }
      for (int c = 0; c < n_cams; ++c)
        x.segment<12>(12 * c) = b_inv[c] * tmp.segment<12>(12 * c);
      acc += x;
    }

    // ---- back-substitution (landmark_block.hpp:670-707)
    double l_diff = 0.0;
    for (int l = 0; l < n_lms; ++l) {
      auto& blk = blocks[l];
      Vec3 t3 = Vec3::Zero();
      for (size_t o = 0; o < blk.cam_idx.size(); ++o) {
        auto Jp = blk.storage.block<4, 12>(4 * o, 0);
        auto Jlo = blk.storage.block<4, 3>(4 * o, 12);
        Vec4 ro = blk.storage.block<4, 1>(4 * o, 15);
        Vec4 jinc = Jp * acc.segment<12>(12 * blk.cam_idx[o]);
        t3.noalias() += Jlo.transpose() * (ro + jinc);
      }
      Vec3 inc_lm = -(blk.hll_inv * t3);
      lms[l] += inc_lm;
      l_diff += inc_lm.squaredNorm();
    }

    double dt = now_s() - t0;
    if (rep > 0) total += dt;  // first rep warms caches/pages
    if (l_diff == -1.0) printf("impossible\n");  // defeat DCE
  }

  double s_per_it = total / reps;
  // FLOP count mirrored from bench.py flops_per_iteration
  double n_obs_d = n_obs, n_lms_d = n_lms, n_cams_d = n_cams;
  double jac = n_obs_d * (4 * 12 + 4 * 3) * 4;
  double hll = n_lms_d * (2 * 9 * 4 + 42);
  double hppf = n_obs_d * 2 * 4 * 12 * 12 + n_cams_d * 1728;
  double bf = n_obs_d * 2 * 4 * (12 + 3) * 2;
  double per_term = n_obs_d * 2 * 4 * (12 + 3) * 2 + n_lms_d * 18 +
                    n_cams_d * 2 * 144;
  double bsub = n_obs_d * (2 * 4 * 3 * 2 + 2 * 4 * 12) + n_lms_d * 60;
  double flops = jac + hll + hppf + bf + m * per_term + bsub;
  printf(
      "{\"metric\": \"reference-hotloop CPU s/iteration (Eigen f64, "
      "1 thread, %d cams, %d lms, %d obs, m=%d)\", \"value\": %.6f, "
      "\"unit\": \"s/iteration\", \"gflops_per_s\": %.3f}\n",
      n_cams, n_lms, n_obs, m, s_per_it, flops / s_per_it / 1e9);
  return 0;
}
