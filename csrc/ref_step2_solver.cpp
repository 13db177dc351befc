// Executable reference-trajectory harness for STEP 2: the reference's
// joint Riemannian-manifold homogeneous refinement, re-implemented in
// Eigen f64 (companion to ref_step1_solver.cpp, same rationale: the
// upstream binary cannot be built here, so this provides executed
// ground truth for tests/test_reference_parity.py).
//
// Reference control flow and math reproduced (file:line are citations
// into /root/reference, no code copied):
//
//   * LM driver:        solver/bal_bundle_adjustment.cpp:557-843
//                       (fresh lambda=1/1e4, vee backtracking, accept
//                       iff l_diff > 0 AND step_quality >
//                       min_relative_decrease (default 0), NaN-inc
//                       rejection, function_tolerance termination,
//                       post-step camera normalize + p_h /= p_h[3],
//                       cpp:700-705)
//   * residual:         helper.cpp:316-381
//                       linearize_point_projective_space_homogeneous +
//                       basalt_custom/camera/bal_camera.hpp:120-167
//                       (mx = x/z - u, my = y/z - v on p = P_4x4 X_h)
//   * tangent bases:    helper.cpp:202-216 kernel_COD — the nullspace
//                       of p_h^T (4->3) and vec_rowmajor(P)^T (12->11)
//                       via Eigen's CompleteOrthogonalDecomposition.
//                       This 8-line function is necessarily the same
//                       Eigen call sequence as the reference's (class-b
//                       unavoidable similarity; any orthonormal kernel
//                       basis yields the same trajectory, see note
//                       below).
//   * Jl scaling:       landmark_block.hpp:298-309
//                       scale_Jl_cols_homogeneous (4 cols, eps 1e-5)
//   * Jp scaling:       linearizor_power_varproj.cpp:96-106 +
//                       landmark_block.hpp:311-321 scale_Jp_cols_joint
//   * nullspace stor.:  landmark_block.hpp:227-269 linearize_nullspace
//                       (scaled storage * Proj_pose / Proj)
//   * prepare_Hb_joint: linearization_power_varproj.hpp:74-122 +
//                       landmark_block.hpp:475-507
//                       (Hll = Jl'Jl + Proj' lambda Proj, .inverse();
//                       per-camera 11x11 damped by Proj_pose' lambda
//                       Proj_pose, LLT-inverted)
//   * power series:     linearization_power_varproj.hpp:240-287
//                       solve_joint (same zeta = i|tmp|/|accum| < eta)
//   * right_mul_e0:     linearization_power_varproj.hpp:408-460 on the
//                       2x11 nullspace storage
//   * apply_joint:      linearizor_power_varproj.cpp:277-310
//                       (back_substitute_joint FIRST at the old
//                       cameras, then cam += Proj_pose*inc11 scaled by
//                       pose_scale — additive, bal_problem.hpp:132-146)
//   * back-substitute:  landmark_block.hpp:574-625 back_substitute_joint
//                       (tangent landmark solve with the SAME lambda
//                       damping, model decrease from stored scaled
//                       storage, landmark update scaled by
//                       Jl_col_scale before p_h += Proj*inc)
//
// Basis-freedom note: kernel_COD's basis is one orthonormal basis of
// the 1-vector's nullspace; the TPU framework uses a Householder
// basis. In exact arithmetic the joint trajectory is invariant to the
// choice (damping is Proj' lambda Proj = lambda I in tangent
// coordinates, per-block orthogonal re-parameterizations preserve all
// norms the zeta test uses, and all ambient quantities compose as
// Proj f(Proj' A Proj) Proj' which is basis-invariant), so the
// comparison is meaningful decision-for-decision up to f64 rounding.
//
// RIPCG mode (argv[2] == "ripcg") replaces the power series with the
// reference's explicit-RCS PCG path:
//   * explicit SC:    linearization_sc.hpp:432-498 get_hb_f_joint +
//                     landmark_block.hpp:415-472 add_Hb_joint (all
//                     camera-pair 11x11 blocks
//                     -Jp_i' Jl_i Hll^-1 Jl_j' Jp_j on the nullspace
//                     storage, Hll = Jl'Jl + Proj' lambda Proj, plus
//                     per-camera Proj_pose' lambda Proj_pose damping)
//   * PCG:            cg/conjugate_gradient.hpp:301-493 solve_joint —
//                     Ceres CG with Nash q-tolerance, residual refresh
//                     every 10; SCHUR_JACOBI = LLT inverse of the
//                     (damped) 11x11 SC diagonal blocks
//                     (preconditioner.hpp:70-144, linearizor_sc.cpp:
//                     solve_joint); solves Hx = b then negates
//                     (linearizor_base.cpp:pcg_joint)
//   * apply_joint:    identical to RIPOBA (linearizor_sc.cpp:
//                     apply_joint == linearizor_power_varproj.cpp's)
//
// Input: POVAR_STATE2 text dump (write_state_dump_homogeneous):
//
//   POVAR_STATE2 1
//   n_cams n_lms n_obs
//   m max_iters eta ftol min_relative_decrease
//   <12 numbers per camera: row-major 3x4 space_matrix>   x n_cams
//   <4 numbers per landmark: homogeneous p_h>             x n_lms
//   <lm_id cam_id u v>                                    x n_obs
//
// Usage: ref_step2_solver state2.txt [ripoba|ripcg]
//
// The dump is the post-boundary state (landmarks already homogenized,
// cameras already Frobenius-normalized, cpp:544-553).
//
// Output: one JSON object on stdout, same shape as ref_step1_solver
// (final_lms carries 4 numbers per landmark here).
//
// Build: make -C csrc ref_step2_solver

#include <Eigen/Dense>
#include <Eigen/QR>

#include <algorithm>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <limits>
#include <string>
#include <vector>

using Mat34 = Eigen::Matrix<double, 3, 4>;
using Mat2x12 = Eigen::Matrix<double, 2, 12>;
using Mat24 = Eigen::Matrix<double, 2, 4>;
using Mat12x11 = Eigen::Matrix<double, 12, 11>;
using Mat43 = Eigen::Matrix<double, 4, 3>;
using Mat11 = Eigen::Matrix<double, 11, 11>;
using Mat3 = Eigen::Matrix3d;
using Vec11 = Eigen::Matrix<double, 11, 1>;
using Vec12 = Eigen::Matrix<double, 12, 1>;
using Vec4 = Eigen::Vector4d;
using Vec3 = Eigen::Vector3d;
using Vec2 = Eigen::Vector2d;
using VecX = Eigen::VectorXd;
using MatX = Eigen::MatrixXd;

namespace {

// Sophus::Constants<double>::epsilonSqrt()
const double kJacobiEps = std::sqrt(1e-10);

// kernel_COD (helper.cpp:202-216): orthonormal basis of the nullspace
// of the row vector v^T, columns = cols(v)-rank.
MatX kernel_cod(const Eigen::RowVectorXd& v) {
  Eigen::CompleteOrthogonalDecomposition<MatX> cod;
  cod.compute(v);
  const unsigned rk = cod.rank();
  const MatX P = cod.colsPermutation();
  const MatX V = cod.matrixZ().transpose();
  return P * V.block(0, rk, V.rows(), V.cols() - rk);
}

Eigen::RowVectorXd vec_rowmajor(const Mat34& P) {
  Eigen::RowVectorXd v(12);
  for (int i = 0; i < 12; ++i) v[i] = P(i / 4, i % 4);
  return v;
}

struct Obs {
  int cam;
  Vec2 uv;
};

struct LandmarkBlock {
  std::vector<Obs> obs;  // ascending camera id (std::map order)
  // homogeneous storage (landmark_block.hpp:101-133
  // storage_homogeneous_): per obs 2 rows, cols [Jp(12)|Jl(4)|r]
  Eigen::Matrix<double, Eigen::Dynamic, 17> storage;
  // nullspace storage (landmark_block.hpp:227-269): per obs 2 rows,
  // cols [Jp_proj(11)|Jl_proj(3)]
  Eigen::Matrix<double, Eigen::Dynamic, 14> storage_ns;
  Vec4 jl_col_scale;
  Mat43 proj;  // kernel_COD(p_h^T) at the linearization point
};

struct Problem {
  std::vector<Mat34> cams;
  std::vector<Vec4> lms;  // homogeneous
  std::vector<LandmarkBlock> blocks;
  int m = 10;
  int max_iters = 50;
  double eta = 1e-2;
  double ftol = 1e-6;
  double min_rel_decrease = 0.0;
  int n_obs = 0;
  bool ripcg = false;           // RIPCG instead of RIPOBA
  int max_cg_iters = 500;       // max_linear_solver_iterations default
  int residual_reset_period = 10;
};

inline bool is_zero_or_inf(double x) {
  return x == 0.0 || std::isinf(x);
}

// Ceres-derived CG on the 11-block joint system (conjugate_gradient.
// hpp:301-493 solve_joint — same loop as `solve`): q-tolerance (Nash
// zeta test), r_tolerance = -1 (disabled by pcg_joint), residual
// refresh every residual_reset_period. Solves H x = b from x = 0;
// `precond` = SCHUR_JACOBI 11x11 block inverses. Returns iterations.
int ceres_cg_joint(const std::vector<Mat11>& precond,
                   const std::function<VecX(const VecX&)>& mul_h,
                   const VecX& b, VecX& x, double q_tolerance,
                   int max_iterations, int residual_reset_period) {
  const int n_cams = (int)precond.size();
  const double norm_b = b.norm();
  x.setZero(b.size());
  if (norm_b == 0.0) return 0;

  auto apply_precond = [&](const VecX& r) {
    VecX z(r.size());
    for (int c = 0; c < n_cams; ++c)
      z.segment<11>(11 * c) = precond[c] * r.segment<11>(11 * c);
    return z;
  };

  VecX r = b - mul_h(x);
  double rho = 1.0;
  double q0 = -1.0 * x.dot(b + r);
  VecX p, z, q;
  int iters = 0;
  for (iters = 1;; ++iters) {
    z = apply_precond(r);
    const double last_rho = rho;
    rho = r.dot(z);
    if (is_zero_or_inf(rho)) break;  // LINEAR_SOLVER_FAILURE
    if (iters == 1) {
      p = z;
    } else {
      const double beta = rho / last_rho;
      if (is_zero_or_inf(beta)) break;
      p = z + beta * p;
    }
    q = mul_h(p);
    const double pq = p.dot(q);
    if (pq <= 0 || std::isinf(pq)) break;  // indefinite
    const double alpha = rho / pq;
    if (std::isinf(alpha)) break;
    x = x + alpha * p;
    if (iters % residual_reset_period == 0) {
      r = b - mul_h(x);
    } else {
      r = r - alpha * q;
    }
    const double q1 = -1.0 * x.dot(b + r);
    const double zeta = iters * (q1 - q0) / q1;
    if (zeta < q_tolerance) break;  // SUCCESS (min_num_iterations = 0)
    q0 = q1;
    if (iters >= max_iterations) break;
  }
  return iters;
}

// homogeneous residual (helper.cpp:316-350 + bal_camera.hpp:120-147):
// p = [P; 0 0 0 1] X_h, res = (p0/p2 - u, p1/p2 - v)
Vec2 residual(const Mat34& P, const Vec4& Xh, const Vec2& uv) {
  const Vec3 p = P * Xh;
  return Vec2(p[0] / p[2] - uv[0], p[1] / p[2] - uv[1]);
}

// 0.5 sum ||res||^2 over all obs (compute_error_projective_space_
// homogeneous, helper.cpp:157-196; validity ignored under the default
// OptimizedCost::ERROR config, solver_options.hpp:144-145)
double compute_error(const Problem& p) {
  double err = 0.0;
  for (size_t l = 0; l < p.blocks.size(); ++l)
    for (const auto& o : p.blocks[l].obs)
      err += 0.5 * residual(p.cams[o.cam], p.lms[l], o.uv).squaredNorm();
  return err;
}

// Jp (2x12), Jl (2x4) of the homogeneous residual
// (helper.cpp:351-380: d_res_d_p * d_p_d_xi and d_res_d_p * T_mat)
void jacobians(const Mat34& P, const Vec4& Xh, Mat2x12& Jp, Mat24& Jl) {
  const Vec3 p = P * Xh;
  const double z = p[2], iz = 1.0 / z, iz2 = iz * iz;
  // d res / d p_c (2x3 effective; 4th col of d_p is zero)
  // rows of d_p_d_xi: d p_c[r] / d vec(P) = Xh in cols 4r..4r+3
  for (int c = 0; c < 4; ++c) {
    Jp(0, c) = iz * Xh[c];
    Jp(0, 4 + c) = 0.0;
    Jp(0, 8 + c) = -p[0] * iz2 * Xh[c];
    Jp(1, c) = 0.0;
    Jp(1, 4 + c) = iz * Xh[c];
    Jp(1, 8 + c) = -p[1] * iz2 * Xh[c];
  }
  // Jl = d_res_d_p (2x3) * P (3x4 rows of the lifted 4x4; the lifted
  // 4th row never contributes because d_res_d_p's 4th column is zero)
  for (int c = 0; c < 4; ++c) {
    Jl(0, c) = iz * P(0, c) - p[0] * iz2 * P(2, c);
    Jl(1, c) = iz * P(1, c) - p[1] * iz2 * P(2, c);
  }
}

struct IterRecord {
  int it;
  double cost;
  bool accept;
  bool valid;
  int lin_iters;
  double trust_region_radius;
  double relative_decrease;
  double l_diff;
  double f_diff;
};

}  // namespace

int main(int argc, char** argv) {
  if (argc < 2) {
    fprintf(stderr, "usage: %s state2.txt [ripoba|ripcg]\n", argv[0]);
    return 2;
  }
  bool want_ripcg = false;
  if (argc >= 3) {
    const std::string s = argv[2];
    if (s == "ripcg") {
      want_ripcg = true;
    } else if (s != "ripoba") {
      fprintf(stderr, "unknown step-2 solver %s\n", argv[2]);
      return 2;
    }
  }
  FILE* f = fopen(argv[1], "r");
  if (!f) {
    fprintf(stderr, "cannot open %s\n", argv[1]);
    return 2;
  }
  char magic[32];
  int version = 0;
  if (fscanf(f, "%31s %d", magic, &version) != 2 ||
      std::string(magic) != "POVAR_STATE2" || version != 1) {
    fprintf(stderr, "bad state2 file header\n");
    return 2;
  }
  Problem p;
  p.ripcg = want_ripcg;
  int n_cams, n_lms, n_obs;
  if (fscanf(f, "%d %d %d", &n_cams, &n_lms, &n_obs) != 3) return 2;
  if (fscanf(f, "%d %d %lf %lf %lf", &p.m, &p.max_iters, &p.eta,
             &p.ftol, &p.min_rel_decrease) != 5)
    return 2;
  p.n_obs = n_obs;
  p.cams.resize(n_cams);
  for (auto& c : p.cams)
    for (int i = 0; i < 12; ++i)
      if (fscanf(f, "%lf", &c(i / 4, i % 4)) != 1) return 2;
  p.lms.resize(n_lms);
  for (auto& l : p.lms)
    for (int i = 0; i < 4; ++i)
      if (fscanf(f, "%lf", &l[i]) != 1) return 2;
  p.blocks.resize(n_lms);
  for (int i = 0; i < n_obs; ++i) {
    int lm, cam;
    double u, v;
    if (fscanf(f, "%d %d %lf %lf", &lm, &cam, &u, &v) != 4) return 2;
    p.blocks[lm].obs.push_back({cam, Vec2(u, v)});
  }
  fclose(f);
  for (auto& blk : p.blocks) {
    std::sort(blk.obs.begin(), blk.obs.end(),
              [](const Obs& a, const Obs& b) { return a.cam < b.cam; });
    blk.storage.setZero(2 * blk.obs.size(), 17);
    blk.storage_ns.setZero(2 * blk.obs.size(), 14);
  }

  // ---- LM loop state (bal_bundle_adjustment.cpp:568-577; lambda
  // starts FRESH for step 2 at 1/initial_trust_region_radius)
  const double min_lambda = 1.0 / 1e16;
  const double max_lambda = 1.0 / 1e-32;
  const double initial_vee = 2.0, vee_factor = 2.0;
  double lambda = 1.0 / 1e4;
  double lambda_vee = initial_vee;

  std::vector<IterRecord> records;
  std::string termination = "NO_CONVERGENCE";

  VecX pose_scale(12 * n_cams);
  std::vector<Mat12x11> proj_pose(n_cams);  // at linearization point
  std::vector<Mat11> b_inv(n_cams);
  std::vector<Mat3> hll_inv(n_lms);
  VecX bvec(11 * n_cams);
  std::vector<Mat34> cams_backup(n_cams);
  std::vector<Vec4> lms_backup(n_lms);

  bool terminated = false;
  double ri = 0.0;
  // cost of the previous RECORDED trial: finish_iteration computes
  // cost_change against summary.iterations.back() (cpp:74-78), so the
  // ftol check after backtracking compares against the last REJECTED
  // trial's cost; a NaN-increment record carries a default-constructed
  // ResidualInfo (cost 0, residual_info.hpp:59-62)
  double last_recorded_cost = 0.0;

  for (int it = 0; it <= p.max_iters && !terminated;) {
    ri = compute_error(p);

    if (it == 0) {
      records.push_back(
          {it, ri, true, true, 0, 1.0 / lambda, 0.0, 0.0, 0.0});
      last_recorded_cost = ri;
      ++it;
      continue;
    }

    // ---- linearize_projective_space_homogeneous
    // (linearizor_power_varproj.cpp:79-110 + landmark_block.hpp:180-225)
    VecX jp_diag2 = VecX::Zero(12 * n_cams);
    for (size_t l = 0; l < p.blocks.size(); ++l) {
      auto& blk = p.blocks[l];
      for (size_t i = 0; i < blk.obs.size(); ++i) {
        Mat2x12 Jp;
        Mat24 Jl;
        jacobians(p.cams[blk.obs[i].cam], p.lms[l], Jp, Jl);
        Vec2 r =
            residual(p.cams[blk.obs[i].cam], p.lms[l], blk.obs[i].uv);
        blk.storage.block<2, 12>(2 * i, 0) = Jp;
        blk.storage.block<2, 4>(2 * i, 12) = Jl;
        blk.storage.block<2, 1>(2 * i, 16) = r;
        // add_Jp_diag2_projective_space (landmark_block.hpp:666-676)
        jp_diag2.segment<12>(12 * blk.obs[i].cam) +=
            Jp.colwise().squaredNorm();
      }
      // scale_Jl_cols_homogeneous (landmark_block.hpp:298-309)
      auto jl_block = blk.storage.middleCols<4>(12);
      blk.jl_col_scale =
          (kJacobiEps + jl_block.colwise().norm().array()).inverse();
      jl_block *= blk.jl_col_scale.asDiagonal();
    }
    pose_scale = (kJacobiEps + jp_diag2.array().sqrt()).inverse();

    bool new_linearization_point = true;

    // ---- inner backtracking loop (cpp:632-840)
    for (int j = 0; it <= p.max_iters && !terminated; ++j) {
      if (new_linearization_point) {
        // scale_Jp_cols_joint (landmark_block.hpp:311-321)
        for (size_t l = 0; l < p.blocks.size(); ++l) {
          auto& blk = p.blocks[l];
          for (size_t i = 0; i < blk.obs.size(); ++i)
            blk.storage.block<2, 12>(2 * i, 0) *=
                pose_scale.segment<12>(12 * blk.obs[i].cam)
                    .asDiagonal();
        }
        // linearize_nullspace (landmark_block.hpp:227-269): tangent
        // bases at the linearization point
        for (int c = 0; c < n_cams; ++c)
          proj_pose[c] = kernel_cod(vec_rowmajor(p.cams[c]));
        for (size_t l = 0; l < p.blocks.size(); ++l) {
          auto& blk = p.blocks[l];
          blk.proj = kernel_cod(p.lms[l].transpose());
          for (size_t i = 0; i < blk.obs.size(); ++i) {
            blk.storage_ns.block<2, 11>(2 * i, 0) =
                blk.storage.block<2, 12>(2 * i, 0) *
                proj_pose[blk.obs[i].cam];
            blk.storage_ns.block<2, 3>(2 * i, 11) =
                blk.storage.block<2, 4>(2 * i, 12) * blk.proj;
          }
        }
      }

      // prepare_Hb_joint (linearization_power_varproj.hpp:74-122 +
      // landmark_block.hpp:475-507); lambda enters Hll here, so this
      // runs every trial
      std::vector<Mat11> hpp(n_cams, Mat11::Zero());
      bvec.setZero();
      for (size_t l = 0; l < p.blocks.size(); ++l) {
        auto& blk = p.blocks[l];
        const int rows = 2 * (int)blk.obs.size();
        auto jl = blk.storage_ns.middleCols<3>(11).topRows(rows);
        auto r = blk.storage.col(16).head(rows);
        Mat3 hll = jl.transpose() * jl;
        hll += blk.proj.transpose() * lambda * blk.proj;
        hll_inv[l] = hll.inverse();
        const Vec3 hll_inv_bl = hll_inv[l] * (jl.transpose() * r);
        for (size_t i = 0; i < blk.obs.size(); ++i) {
          const int cam = blk.obs[i].cam;
          auto jp = blk.storage_ns.block<2, 11>(2 * i, 0);
          auto jlo = blk.storage_ns.block<2, 3>(2 * i, 11);
          Vec2 ro = blk.storage.block<2, 1>(2 * i, 16);
          bvec.segment<11>(11 * cam) +=
              jp.transpose() * (ro - jlo * hll_inv_bl);
          hpp[cam].noalias() += jp.transpose() * jp;
        }
      }
      VecX accum;
      int lin_iters = 0;

      if (!p.ripcg) {
        for (int c = 0; c < n_cams; ++c) {
          Mat11 damped =
              hpp[c] +
              proj_pose[c].transpose() * lambda * proj_pose[c];
          b_inv[c] = damped.selfadjointView<Eigen::Upper>().llt().solve(
              Mat11::Identity());
        }

        // solve_joint power series
        // (linearization_power_varproj.hpp:240-287)
        auto mul_b_inv = [&](const VecX& x) {
          VecX res(11 * n_cams);
          for (int c = 0; c < n_cams; ++c)
            res.segment<11>(11 * c) = b_inv[c] * x.segment<11>(11 * c);
          return res;
        };
        auto mul_e0 = [&](const VecX& x) {
          VecX res = VecX::Zero(11 * n_cams);
          for (size_t l = 0; l < p.blocks.size(); ++l) {
            auto& blk = p.blocks[l];
            const int k = (int)blk.obs.size();
            VecX jp_x(2 * k);
            for (int i = 0; i < k; ++i)
              jp_x.segment<2>(2 * i) =
                  blk.storage_ns.block<2, 11>(2 * i, 0) *
                  x.segment<11>(11 * blk.obs[i].cam);
            auto jl = blk.storage_ns.middleCols<3>(11).topRows(2 * k);
            const VecX tmp = jl * (hll_inv[l] * (jl.transpose() * jp_x));
            for (int i = 0; i < k; ++i)
              res.segment<11>(11 * blk.obs[i].cam) +=
                  blk.storage_ns.block<2, 11>(2 * i, 0).transpose() *
                  tmp.segment<2>(2 * i);
          }
          return res;
        };

        accum = mul_b_inv(-bvec);
        lin_iters = p.m;
        {
          VecX tmp = accum;
          for (int i = 1; i <= p.m; ++i) {
            tmp = mul_b_inv(mul_e0(tmp));
            accum += tmp;
            const double zeta = i * tmp.norm() / accum.norm();
            if (zeta < p.eta) {
              lin_iters = i;
              break;
            }
          }
        }
      } else {
        // ---- RIPCG: explicit 11-block RCS (get_hb_f_joint,
        // linearization_sc.hpp:432-498 + landmark_block.hpp:415-472
        // add_Hb_joint): per-landmark diag blocks Jp_i'Jp_i on the
        // nullspace storage plus ALL camera-pair SC blocks
        // -Jp_i' Jl_i Hll^-1 Jl_j' Jp_j (Hll damped, the shared
        // hll_inv above), then per-camera Proj_pose' lambda Proj_pose
        // damping. Toy/mid-scale => dense [11N, 11N] is exact.
        MatX H = MatX::Zero(11 * n_cams, 11 * n_cams);
        for (size_t l = 0; l < p.blocks.size(); ++l) {
          auto& blk = p.blocks[l];
          const int k = (int)blk.obs.size();
          for (int i = 0; i < k; ++i) {
            const int ci = blk.obs[i].cam;
            auto jp_i = blk.storage_ns.block<2, 11>(2 * i, 0);
            auto jl_i = blk.storage_ns.block<2, 3>(2 * i, 11);
            H.block<11, 11>(11 * ci, 11 * ci).noalias() +=
                jp_i.transpose() * jp_i;
            for (int jj = 0; jj < k; ++jj) {
              const int cj = blk.obs[jj].cam;
              auto jp_j = blk.storage_ns.block<2, 11>(2 * jj, 0);
              auto jl_j = blk.storage_ns.block<2, 3>(2 * jj, 11);
              H.block<11, 11>(11 * ci, 11 * cj).noalias() -=
                  jp_i.transpose() *
                  (jl_i * (hll_inv[l] * (jl_j.transpose() * jp_j)));
            }
          }
        }
        for (int c = 0; c < n_cams; ++c)
          H.block<11, 11>(11 * c, 11 * c).noalias() +=
              proj_pose[c].transpose() * lambda * proj_pose[c];

        // SCHUR_JACOBI = LLT inverse of the (damped) diagonal blocks
        // (preconditioner.hpp:70-144, built from block_storage AFTER
        // assembly+damping); Ceres CG solves Hx = b then inc = -x
        std::vector<Mat11> precond(n_cams);
        for (int c = 0; c < n_cams; ++c)
          precond[c] = H.block<11, 11>(11 * c, 11 * c)
                           .selfadjointView<Eigen::Upper>()
                           .llt()
                           .solve(Mat11::Identity());
        auto mul_h = [&](const VecX& x) -> VecX { return H * x; };
        VecX x;
        lin_iters =
            ceres_cg_joint(precond, mul_h, bvec, x, p.eta,
                           p.max_cg_iters, p.residual_reset_period);
        accum = -x;
      }
      // the reference clears the flag at the END of solve_joint
      // (linearizor_power_varproj.cpp:174), BEFORE the driver's NaN
      // check — a NaN trial must not re-scale Jp / rebuild nullspace
      // storage on the next trial
      new_linearization_point = false;

      if (!accum.array().isFinite().all()) {
        lambda = lambda_vee * lambda;
        lambda_vee *= vee_factor;
        records.push_back({it, std::numeric_limits<double>::quiet_NaN(),
                           false, false, lin_iters, 1.0 / lambda, 0.0,
                           0.0, 0.0});
        last_recorded_cost = 0.0;  // default-constructed ResidualInfo
        ++it;
        if (lambda > max_lambda) {
          terminated = true;
          termination = "NO_CONVERGENCE";
        }
        continue;
      }

      // backup_joint (bal_problem.hpp:179-182, 238)
      cams_backup = p.cams;
      lms_backup = p.lms;

      // apply_joint (linearizor_power_varproj.cpp:277-310):
      // back_substitute_joint FIRST (old cameras), then camera update
      double l_diff = 0.0;
      for (size_t l = 0; l < p.blocks.size(); ++l) {
        // back_substitute_joint (landmark_block.hpp:574-625)
        auto& blk = p.blocks[l];
        const int k = (int)blk.obs.size();
        Mat3 H_ll = Mat3::Zero();
        Vec3 tmp3 = Vec3::Zero();
        VecX J_inc = VecX::Zero(2 * k);
        for (int i = 0; i < k; ++i) {
          const int cam = blk.obs[i].cam;
          auto jp = blk.storage.block<2, 12>(2 * i, 0);
          auto jl = blk.storage.block<2, 4>(2 * i, 12);
          Vec2 r = blk.storage.block<2, 1>(2 * i, 16);
          Eigen::Matrix<double, 2, 3> jl_proj = jl * blk.proj;
          H_ll += jl_proj.transpose() * jl_proj;
          Vec2 jp_inc =
              jp * (proj_pose[cam] * accum.segment<11>(11 * cam));
          tmp3 += jl_proj.transpose() * (r + jp_inc);
          J_inc.segment<2>(2 * i) += jp_inc;
        }
        H_ll += blk.proj.transpose() * lambda * blk.proj;
        const Vec3 inc3 = -H_ll.inverse() * tmp3;
        VecX inc_proj = blk.proj * inc3;
        J_inc += blk.storage.middleCols<4>(12).topRows(2 * k) * inc_proj;
        l_diff -= J_inc.transpose() *
                  (0.5 * J_inc + blk.storage.col(16).head(2 * k));
        // scale only after the model cost change (hpp:621-623)
        inc_proj.array() *= blk.jl_col_scale.array();
        p.lms[l] += inc_proj;
      }
      // camera update (cpp:283-309): lift 11->12 at the OLD tangent
      // basis, unscale, additive
      for (int c = 0; c < n_cams; ++c) {
        Vec12 inc12 = proj_pose[c] * accum.segment<11>(11 * c);
        inc12.array() *= pose_scale.segment<12>(12 * c).array();
        for (int i = 0; i < 12; ++i) p.cams[c](i / 4, i % 4) += inc12[i];
      }
      // manifold retraction (cpp:700-705)
      for (int c = 0; c < n_cams; ++c) p.cams[c].normalize();
      for (int l = 0; l < n_lms; ++l) p.lms[l] /= p.lms[l][3];

      const double ri2 = compute_error(p);
      const double f_diff = ri - ri2;  // OptimizedCost::ERROR
      const double step_quality = f_diff / l_diff;
      // step-2 accept rule (cpp:743-746): valid iff l_diff > 0,
      // successful iff valid && quality > min_relative_decrease
      const bool valid = l_diff > 0;
      const bool accept = valid && step_quality > p.min_rel_decrease;

      if (accept) {
        lambda *= std::max(1.0 / 3,
                           1 - std::pow(2 * step_quality - 1, 3));
        lambda = std::max(min_lambda, lambda);
        lambda_vee = initial_vee;
        const double prev_rec = last_recorded_cost;
        records.push_back({it, ri2, true, true, lin_iters, 1.0 / lambda,
                           step_quality, l_diff, f_diff});
        last_recorded_cost = ri2;
        ++it;
        // function_tolerance_reached (cpp:179-205) against the cost of
        // the previous RECORDED trial (cpp:776 + 74-78)
        if (std::abs(prev_rec - ri2) <= p.ftol * ri2) {
          terminated = true;
          termination = "CONVERGENCE";
        }
        break;
      } else {
        lambda = lambda_vee * lambda;
        lambda_vee *= vee_factor;
        records.push_back({it, ri2, false, valid, lin_iters,
                           1.0 / lambda, step_quality, l_diff, f_diff});
        last_recorded_cost = ri2;
        p.cams = cams_backup;  // restore_joint
        p.lms = lms_backup;
        ++it;
        if (lambda > max_lambda) {
          terminated = true;
          termination = "NO_CONVERGENCE";
        }
      }
    }
  }

  // ---- JSON output
  printf("{\"iterations\": [");
  for (size_t i = 0; i < records.size(); ++i) {
    const auto& r = records[i];
    printf(
        "%s{\"it\": %d, \"cost\": %.17g, \"accept\": %s, "
        "\"valid\": %s, \"lin_iters\": %d, "
        "\"trust_region_radius\": %.17g, \"relative_decrease\": %.17g, "
        "\"l_diff\": %.17g, \"f_diff\": %.17g}",
        i ? ", " : "", r.it, r.cost, r.accept ? "true" : "false",
        r.valid ? "true" : "false", r.lin_iters, r.trust_region_radius,
        r.relative_decrease, r.l_diff, r.f_diff);
  }
  const double final_cost = compute_error(p);
  printf("], \"final_cost\": %.17g, \"termination\": \"%s\"", final_cost,
         termination.c_str());
  printf(", \"final_cams\": [");
  for (int c = 0; c < n_cams; ++c)
    for (int i = 0; i < 12; ++i)
      printf("%s%.17g", (c || i) ? ", " : "", p.cams[c](i / 4, i % 4));
  printf("], \"final_lms\": [");
  for (int l = 0; l < n_lms; ++l)
    for (int i = 0; i < 4; ++i)
      printf("%s%.17g", (l || i) ? ", " : "", p.lms[l][i]);
  printf("]}\n");
  return 0;
}
