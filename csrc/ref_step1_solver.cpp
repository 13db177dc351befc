// Executable reference-trajectory harness: the reference's step-1
// (pOSE) LM solver, re-implemented in Eigen f64 — ALL FOUR linear
// solvers plus robust norms.
//
// The upstream binary (tum-vision/povar) cannot be built here (its
// vendored submodules are empty checkouts, no network), so this
// harness provides the missing executed ground truth: it reproduces
// the reference's step-1 control flow and math decision-for-decision —
//
//   * LM driver:      solver/bal_bundle_adjustment.cpp:252-542
//                     (lambda = 1/trust-region-radius, vee-factor
//                     backtracking, accept iff f_diff > 0, NaN-inc
//                     rejection, function_tolerance termination)
//   * VarProj init:   helper.cpp:75-99 (per-landmark thin-SVD v*(u0))
//   * pOSE residual:  helper.cpp:243-313 (affine sqrt(a) rows +
//                     projective sqrt(1-a) rows)
//   * robust norms:   helper.cpp:50-74 compute_error_weight
//                     (HUBER weight t/|r| beyond t, error
//                     0.5(2-w)w r^2; CAUCHY error log(1+r^2) with
//                     weight 1 — the reference's quirk) applied as
//                     sqrt(weight) on stored Jp/Jl/res rows
//                     (landmark_block.hpp:160-170)
//   * Jacobi scaling: linearizor_power_varproj.cpp:62-70 +
//                     landmark_block.hpp:284-334; epsilon =
//                     Sophus::Constants<double>::epsilonSqrt()
//                     = sqrt(1e-10) = 1e-5 (linearizor_base.cpp:94-100).
//                     QUIRK preserved: the SC linearizor (PCG/CHOLESKY)
//                     does NOT scale Jl columns (linearizor_sc.cpp:
//                     linearize_pOSE has no scale_Jl_cols_pOSE call),
//                     only the power linearizor does.
//   * prepare_Hb:     linearization_power_varproj.hpp:124-188
//                     (Hll^-1 via .inverse(), per-camera 12x12 LLT of
//                     the damped block diagonal); poBA variant damps
//                     Hll with +lambda I (landmark_block.hpp:548-556
//                     get_Hll_inv_add_Hpp_b_pOSE_poBA)
//   * power series:   linearization_power_varproj.hpp:191-237
//                     (x = sum_i (B^-1 E0)^i B^-1 (-b), q-tolerance
//                     zeta = i*|tmp|/|accum| < eta early exit)
//   * explicit SC:    linearization_sc.hpp:403-450 get_hb_f_pOSE +
//                     landmark_block.hpp:360-413 add_Hb_pOSE (all
//                     camera-pair blocks -Jp_i' Jl_i Hll^-1 Jl_j' Jp_j,
//                     diag blocks Jp'Jp, +lambda I via add_diag)
//   * PCG:            cg/conjugate_gradient.hpp:114-301 Ceres CG with
//                     Nash q-tolerance, residual refresh every 10,
//                     rho/pq failure codes; SCHUR_JACOBI = per-camera
//                     LLT inverse of the SC diagonal blocks
//                     (cg/preconditioner.hpp:70-144); solves Hx = b
//                     then negates (linearizor_base.cpp:102-125)
//   * CHOLESKY:       linearization_sc.hpp:236-245 solve_direct_pOSE
//                     (Eigen SimplicialLLT of the sparse RCS, -b rhs)
//   * apply/back-sub: linearizor_power_varproj.cpp:245-259 +
//                     landmark_block.hpp:670-707 (fresh UNWEIGHTED
//                     Jl/res at the updated cameras, exact VarProj
//                     landmark step, model cost decrease from mixed
//                     fresh/stored terms exactly as the reference
//                     computes it); poBA variant back_substitute_poBA
//                     (landmark_block.hpp:627-657: stored scaled
//                     storage only, damped Hll, landmark step scaled
//                     by Jl_col_scale, runs BEFORE the camera update
//                     on the scaled increment)
//
// This is an independent implementation from the algorithm's public
// description and the file/line citations above (no reference code
// copied); it exists so that tests/test_reference_parity.py can assert
// the TPU framework reproduces the same per-iteration costs, lambda
// schedule and accept/reject decisions from the same inputs.
//
// Input: a plain-text state dump (written by
// povar_tpu.problem.bal_io.write_state_dump):
//
//   POVAR_STATE 1
//   n_cams n_lms n_obs
//   alpha m max_iters eta ftol
//   <12 numbers per camera: row-major 3x4 space_matrix>  x n_cams
//   <3 numbers per landmark>                             x n_lms
//   <lm_id cam_id u v>                                   x n_obs
//
// Usage: ref_step1_solver state.txt [solver] [robust] [huber_param]
//   solver: power_varproj (default) | power_sc | pcg | cholesky
//   robust: none (default) | huber | cauchy
//
// Output: one JSON object on stdout:
//   {"iterations": [{"it":..,"cost":..,"accept":..,"lin_iters":..,
//                    "trust_region_radius":..,"relative_decrease":..,
//                    "l_diff":..,"f_diff":..}, ...],
//    "final_cost":.., "termination":"CONVERGENCE"|"NO_CONVERGENCE",
//    "final_cams":[...], "final_lms":[...]}
//
// Build: make -C csrc ref_step1_solver

#include <Eigen/Dense>
#include <Eigen/SVD>
#include <Eigen/Sparse>
#include <Eigen/SparseCholesky>

#include <algorithm>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <functional>
#include <limits>
#include <string>
#include <vector>

using Mat34 = Eigen::Matrix<double, 3, 4>;
using Mat4x12 = Eigen::Matrix<double, 4, 12>;
using Mat43 = Eigen::Matrix<double, 4, 3>;
using Mat3 = Eigen::Matrix3d;
using Mat12 = Eigen::Matrix<double, 12, 12>;
using Vec12 = Eigen::Matrix<double, 12, 1>;
using Vec4 = Eigen::Vector4d;
using Vec3 = Eigen::Vector3d;
using Vec2 = Eigen::Vector2d;
using VecX = Eigen::VectorXd;
using MatX = Eigen::MatrixXd;

namespace {

// Sophus::Constants<double>::epsilonSqrt() (Sophus common.hpp)
const double kJacobiEps = std::sqrt(1e-10);

enum class SolverType { POWER_VARPROJ, POWER_SC, PCG, CHOLESKY };
enum class RobustNorm { NONE, HUBER, CAUCHY };

struct Obs {
  int cam;
  Vec2 uv;
};

struct LandmarkBlock {
  std::vector<Obs> obs;  // sorted by cam id (std::map iteration order)
  // storage rows: per obs 4 residual rows, cols [Jp(12) | Jl(3) | r]
  // (landmark_block.hpp:101-133 storage_pOSE_)
  Eigen::Matrix<double, Eigen::Dynamic, 16> storage;
  Vec3 jl_col_scale;
};

struct Problem {
  std::vector<Mat34> cams;
  std::vector<Vec3> lms;
  std::vector<LandmarkBlock> blocks;
  double alpha = 0.01;
  int m = 10;           // power_sc_iterations
  int max_iters = 50;   // max_num_iterations_step_1
  double eta = 1e-2;    // q-tolerance
  double ftol = 1e-6;   // function_tolerance
  int n_obs = 0;
  SolverType solver = SolverType::POWER_VARPROJ;
  RobustNorm robust = RobustNorm::NONE;
  double huber_param = 1.0;
  int max_cg_iters = 500;       // max_linear_solver_iterations default
  int residual_reset_period = 10;
};

// compute_error_weight (helper.cpp:50-74): {error, weight}
void error_weight(const Problem& p, double res_squared, double& error,
                  double& weight) {
  switch (p.robust) {
    case RobustNorm::HUBER: {
      const double t = p.huber_param;
      weight = res_squared < t * t ? 1.0 : t / std::sqrt(res_squared);
      error = 0.5 * (2 - weight) * weight * res_squared;
      return;
    }
    case RobustNorm::CAUCHY:
      // the reference's CAUCHY only reweights the ERROR, weight stays 1
      error = std::log(1.0 + res_squared);
      weight = 1.0;
      return;
    case RobustNorm::NONE:
    default:
      error = 0.5 * res_squared;
      weight = 1.0;
      return;
  }
}

// pOSE residual (helper.cpp:243-262): 4-vector
// [sp*((Px)_0 - u (Px)_2), sp*((Px)_1 - v (Px)_2),
//  sa*((Px)_0 - u),        sa*((Px)_1 - v)]
// where Px uses homogeneous landmark and full rows incl. translation.
Vec4 pose_residual(double alpha, const Mat34& P, const Vec3& X,
                   const Vec2& uv) {
  const double sa = std::sqrt(alpha), sp = std::sqrt(1.0 - alpha);
  Vec4 Xh(X[0], X[1], X[2], 1.0);
  Vec3 px = P * Xh;
  Vec4 r;
  r[0] = sp * (px[0] - uv[0] * px[2]);
  r[1] = sp * (px[1] - uv[1] * px[2]);
  r[2] = sa * (px[0] - uv[0]);
  r[3] = sa * (px[1] - uv[1]);
  return r;
}

// helper.cpp:269-311: 4x12 pose Jacobian (vec(P) row-major order:
// cols 0-3 = row 0 of P, 4-7 = row 1, 8-11 = row 2).
void pose_jacobians(double alpha, const Mat34& P, const Vec3& X,
                    const Vec2& uv, Mat4x12& Jp, Mat43& Jl) {
  const double sa = std::sqrt(alpha), sp = std::sqrt(1.0 - alpha);
  Vec4 Xh(X[0], X[1], X[2], 1.0);
  Jp.setZero();
  for (int c = 0; c < 4; ++c) {
    Jp(0, c) = sp * Xh[c];
    Jp(0, 8 + c) = -sp * uv[0] * Xh[c];
    Jp(1, 4 + c) = sp * Xh[c];
    Jp(1, 8 + c) = -sp * uv[1] * Xh[c];
    Jp(2, c) = sa * Xh[c];
    Jp(3, 4 + c) = sa * Xh[c];
  }
  // Jl = T_tilde(:, 0:3) (helper.cpp:310)
  for (int c = 0; c < 3; ++c) {
    Jl(0, c) = sp * (P(0, c) - uv[0] * P(2, c));
    Jl(1, c) = sp * (P(1, c) - uv[1] * P(2, c));
    Jl(2, c) = sa * P(0, c);
    Jl(3, c) = sa * P(1, c);
  }
}

// robust error summed over all observations (compute_error_pOSE,
// helper.cpp:116-154)
double compute_error(const Problem& p) {
  double err = 0.0;
  for (size_t l = 0; l < p.blocks.size(); ++l) {
    for (const auto& o : p.blocks[l].obs) {
      Vec4 r = pose_residual(p.alpha, p.cams[o.cam], p.lms[l], o.uv);
      double e, w;
      error_weight(p, r.squaredNorm(), e, w);
      err += e;
    }
  }
  return err;
}

// closed-form VarProj landmark init v*(u0) via thin SVD
// (helper.cpp:75-99 initialize_varproj_lm_pOSE + 220-241
// initialize_varproj_pOSE: G rows use only the rotation part, z the
// translation part; NO robust weighting here — the reference's init
// is unweighted)
void initialize_varproj(Problem& p) {
  const double sa = std::sqrt(p.alpha), sp = std::sqrt(1.0 - p.alpha);
  for (size_t l = 0; l < p.blocks.size(); ++l) {
    const auto& obs = p.blocks[l].obs;
    Eigen::MatrixXd G(4 * obs.size(), 3);
    VecX z(4 * obs.size());
    for (size_t i = 0; i < obs.size(); ++i) {
      const Mat34& P = p.cams[obs[i].cam];
      const Vec2& uv = obs[i].uv;
      for (int c = 0; c < 3; ++c) {
        G(4 * i + 0, c) = sp * (P(0, c) - P(2, c) * uv[0]);
        G(4 * i + 1, c) = sp * (P(1, c) - P(2, c) * uv[1]);
        G(4 * i + 2, c) = sa * P(0, c);
        G(4 * i + 3, c) = sa * P(1, c);
      }
      z[4 * i + 0] = sp * (P(2, 3) * uv[0] - P(0, 3));
      z[4 * i + 1] = sp * (P(2, 3) * uv[1] - P(1, 3));
      z[4 * i + 2] = sa * (uv[0] - P(0, 3));
      z[4 * i + 3] = sa * (uv[1] - P(1, 3));
    }
    p.lms[l] =
        G.bdcSvd(Eigen::ComputeThinU | Eigen::ComputeThinV).solve(z);
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

inline bool is_zero_or_inf(double x) {
  return x == 0.0 || std::isinf(x);
}

// Ceres-derived CG (cg/conjugate_gradient.hpp:114-301): q-tolerance
// (Nash truncated-Newton zeta test), r_tolerance = -1 (disabled, the
// reference's pcg wrapper), residual refresh every
// residual_reset_period iterations. Solves H x = b from x = 0;
// `precond` is the SCHUR_JACOBI block inverse. Returns iterations.
int ceres_cg(const std::vector<Mat12>& precond,
             const std::function<VecX(const VecX&)>& mul_h, const VecX& b,
             VecX& x, double q_tolerance, int max_iterations,
             int residual_reset_period) {
  const int n_cams = (int)precond.size();
  const double norm_b = b.norm();
  x.setZero(b.size());
  if (norm_b == 0.0) return 0;

  auto apply_precond = [&](const VecX& r) {
    VecX z(r.size());
    for (int c = 0; c < n_cams; ++c)
      z.segment<12>(12 * c) = precond[c] * r.segment<12>(12 * c);
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

}  // namespace

int main(int argc, char** argv) {
  if (argc < 2) {
    fprintf(stderr,
            "usage: %s state.txt [power_varproj|power_sc|pcg|cholesky] "
            "[none|huber|cauchy] [huber_param]\n",
            argv[0]);
    return 2;
  }
  FILE* f = fopen(argv[1], "r");
  if (!f) {
    fprintf(stderr, "cannot open %s\n", argv[1]);
    return 2;
  }
  char magic[32];
  int version = 0;
  if (fscanf(f, "%31s %d", magic, &version) != 2 ||
      std::string(magic) != "POVAR_STATE" || version != 1) {
    fprintf(stderr, "bad state file header\n");
    return 2;
  }
  Problem p;
  int n_cams, n_lms, n_obs;
  if (fscanf(f, "%d %d %d", &n_cams, &n_lms, &n_obs) != 3) return 2;
  if (fscanf(f, "%lf %d %d %lf %lf", &p.alpha, &p.m, &p.max_iters,
             &p.eta, &p.ftol) != 5)
    return 2;
  p.n_obs = n_obs;
  p.cams.resize(n_cams);
  for (auto& c : p.cams)
    for (int i = 0; i < 12; ++i)
      if (fscanf(f, "%lf", &c(i / 4, i % 4)) != 1) return 2;
  p.lms.resize(n_lms);
  for (auto& l : p.lms)
    for (int i = 0; i < 3; ++i)
      if (fscanf(f, "%lf", &l[i]) != 1) return 2;
  p.blocks.resize(n_lms);
  for (int i = 0; i < n_obs; ++i) {
    int lm, cam;
    double u, v;
    if (fscanf(f, "%d %d %lf %lf", &lm, &cam, &u, &v) != 4) return 2;
    p.blocks[lm].obs.push_back({cam, Vec2(u, v)});
  }
  fclose(f);

  if (argc >= 3) {
    const std::string s = argv[2];
    if (s == "power_varproj")
      p.solver = SolverType::POWER_VARPROJ;
    else if (s == "power_sc" || s == "power_schur_complement")
      p.solver = SolverType::POWER_SC;
    else if (s == "pcg")
      p.solver = SolverType::PCG;
    else if (s == "cholesky")
      p.solver = SolverType::CHOLESKY;
    else {
      fprintf(stderr, "unknown solver %s\n", argv[2]);
      return 2;
    }
  }
  if (argc >= 4) {
    const std::string s = argv[3];
    if (s == "none")
      p.robust = RobustNorm::NONE;
    else if (s == "huber")
      p.robust = RobustNorm::HUBER;
    else if (s == "cauchy")
      p.robust = RobustNorm::CAUCHY;
    else {
      fprintf(stderr, "unknown robust norm %s\n", argv[3]);
      return 2;
    }
  }
  if (argc >= 5) p.huber_param = atof(argv[4]);

  const bool is_power = p.solver == SolverType::POWER_VARPROJ ||
                        p.solver == SolverType::POWER_SC;
  const bool is_poba = p.solver == SolverType::POWER_SC;

  // obs per landmark in ascending camera order, like the reference's
  // std::map<FrameIdx, Observation> (bal_problem.hpp:93)
  for (auto& blk : p.blocks) {
    std::sort(blk.obs.begin(), blk.obs.end(),
              [](const Obs& a, const Obs& b) { return a.cam < b.cam; });
    blk.storage.setZero(4 * blk.obs.size(), 16);
    blk.jl_col_scale.setOnes();
  }

  // ---- LM loop state (bal_bundle_adjustment.cpp:264-293)
  const double min_lambda = 1.0 / 1e16;  // 1/max_trust_region_radius
  const double max_lambda = 1.0 / 1e-32;
  const double initial_vee = 2.0, vee_factor = 2.0;
  double lambda = 1.0 / 1e4;  // 1/initial_trust_region_radius
  double lambda_vee = initial_vee;

  std::vector<IterRecord> records;
  std::string termination = "NO_CONVERGENCE";

  VecX pose_scale(12 * n_cams);          // pose_jacobian_scaling_pOSE_
  std::vector<Mat12> b_inv(n_cams);      // damped (Hpp)^-1 blocks
  std::vector<Mat3> hll_inv(n_lms);
  VecX bvec(12 * n_cams);
  std::vector<Mat34> cams_backup(n_cams);
  std::vector<Vec3> lms_backup(n_lms);

  bool terminated = false;
  bool initialization_varproj = true;
  double ri = 0.0;  // current cost
  // cost of the previous RECORDED trial: finish_iteration computes
  // cost_change against summary.iterations.back()
  // (bal_bundle_adjustment.cpp:74-78), so after backtracking the ftol
  // check compares the accept against the last REJECTED trial's cost;
  // a NaN-increment record carries a default-constructed ResidualInfo
  // (cost 0, residual_info.hpp:59-62)
  double last_recorded_cost = 0.0;

  for (int it = 0; it <= p.max_iters && !terminated;) {
    if (initialization_varproj) {
      initialize_varproj(p);
      initialization_varproj = false;
    }
    ri = compute_error(p);

    if (it == 0) {
      records.push_back({it, ri, true, true, 0, 1.0 / lambda, 0.0, 0.0,
                         0.0});
      last_recorded_cost = ri;
      ++it;
      continue;
    }

    // ---- linearize_pOSE (linearizor_power_varproj.cpp:44-76 /
    // linearizor_sc.cpp:174-203 — identical except the SC variant
    // SKIPS the Jl column scaling)
    VecX jp_diag2 = VecX::Zero(12 * n_cams);
    for (size_t l = 0; l < p.blocks.size(); ++l) {
      auto& blk = p.blocks[l];
      for (size_t i = 0; i < blk.obs.size(); ++i) {
        Mat4x12 Jp;
        Mat43 Jl;
        pose_jacobians(p.alpha, p.cams[blk.obs[i].cam], p.lms[l],
                       blk.obs[i].uv, Jp, Jl);
        Vec4 r = pose_residual(p.alpha, p.cams[blk.obs[i].cam], p.lms[l],
                               blk.obs[i].uv);
        // robust sqrt-weighting on the stored rows
        // (landmark_block.hpp:160-170)
        double e, w;
        error_weight(p, r.squaredNorm(), e, w);
        const double sw = std::sqrt(w);
        blk.storage.block<4, 12>(4 * i, 0) = sw * Jp;
        blk.storage.block<4, 3>(4 * i, 12) = sw * Jl;
        blk.storage.block<4, 1>(4 * i, 15) = sw * r;
        // add_Jp_diag2_pOSE (landmark_block.hpp:272-282) reads the
        // (weighted) storage
        jp_diag2.segment<12>(12 * blk.obs[i].cam) +=
            blk.storage.block<4, 12>(4 * i, 0).colwise().squaredNorm();
      }
      if (is_power) {
        // scale_Jl_cols_pOSE (landmark_block.hpp:284-295) — only the
        // power linearizor does this (linearizor_power_varproj.cpp:64)
        auto jl_block = blk.storage.middleCols<3>(12);
        blk.jl_col_scale =
            (kJacobiEps + jl_block.colwise().norm().array()).inverse();
        jl_block *= blk.jl_col_scale.asDiagonal();
      }
    }
    pose_scale = (kJacobiEps + jp_diag2.array().sqrt()).inverse();

    bool new_linearization_point = true;

    // ---- inner backtracking loop (cpp:337-519)
    for (int j = 0; it <= p.max_iters && !terminated; ++j) {
      // solve (linearizor_power_varproj.cpp:177-243 /
      // linearizor_sc.cpp:91-172)
      if (new_linearization_point) {
        // scale_Jp_cols_pOSE (landmark_block.hpp:324-334)
        for (size_t l = 0; l < p.blocks.size(); ++l) {
          auto& blk = p.blocks[l];
          for (size_t i = 0; i < blk.obs.size(); ++i) {
            blk.storage.block<4, 12>(4 * i, 0) *=
                pose_scale.segment<12>(12 * blk.obs[i].cam).asDiagonal();
          }
        }
      }

      VecX accum;
      int lin_iters = 0;

      if (is_power) {
        // prepare_Hb_pOSE[_poBA] (linearization_power_varproj.hpp:
        // 124-188, landmark_block.hpp:511-572); poBA damps Hll with
        // +lambda I (set_landmark_damping, landmark_block.hpp:548-556)
        std::vector<Mat12> hpp(n_cams, Mat12::Zero());
        bvec.setZero();
        for (size_t l = 0; l < p.blocks.size(); ++l) {
          auto& blk = p.blocks[l];
          int rows = 4 * (int)blk.obs.size();
          auto jl = blk.storage.middleCols<3>(12).topRows(rows);
          auto r = blk.storage.col(15).head(rows);
          Mat3 hll = jl.transpose() * jl;
          if (is_poba) hll.diagonal().array() += lambda;
          hll_inv[l] = hll.inverse();  // .inverse(), not LLT (hpp:518)
          const Vec3 hll_inv_bl = hll_inv[l] * (jl.transpose() * r);
          for (size_t i = 0; i < blk.obs.size(); ++i) {
            const int cam = blk.obs[i].cam;
            auto jp = blk.storage.block<4, 12>(4 * i, 0);
            auto jlo = blk.storage.block<4, 3>(4 * i, 12);
            Vec4 ro = blk.storage.block<4, 1>(4 * i, 15);
            bvec.segment<12>(12 * cam) +=
                jp.transpose() * (ro - jlo * hll_inv_bl);
            hpp[cam].noalias() += jp.transpose() * jp;
          }
        }
        for (int c = 0; c < n_cams; ++c) {
          Mat12 damped = hpp[c];
          damped.diagonal().array() += lambda;
          b_inv[c] = damped.selfadjointView<Eigen::Upper>().llt().solve(
              Mat12::Identity());
        }

        // solve_pOSE power series (hpp:191-237)
        auto mul_b_inv = [&](const VecX& x) {
          VecX res(12 * n_cams);
          for (int c = 0; c < n_cams; ++c)
            res.segment<12>(12 * c) = b_inv[c] * x.segment<12>(12 * c);
          return res;
        };
        auto mul_e0 = [&](const VecX& x) {
          VecX res = VecX::Zero(12 * n_cams);
          for (size_t l = 0; l < p.blocks.size(); ++l) {
            auto& blk = p.blocks[l];
            const int k = (int)blk.obs.size();
            VecX jp_x(4 * k);
            for (int i = 0; i < k; ++i) {
              jp_x.segment<4>(4 * i) =
                  blk.storage.block<4, 12>(4 * i, 0) *
                  x.segment<12>(12 * blk.obs[i].cam);
            }
            auto jl = blk.storage.middleCols<3>(12).topRows(4 * k);
            const VecX tmp = jl * (hll_inv[l] * (jl.transpose() * jp_x));
            for (int i = 0; i < k; ++i) {
              res.segment<12>(12 * blk.obs[i].cam) +=
                  blk.storage.block<4, 12>(4 * i, 0).transpose() *
                  tmp.segment<4>(4 * i);
            }
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
            const double iter_norm = tmp.norm();
            const double zeta = i * iter_norm / accum.norm();
            if (zeta < p.eta) {
              lin_iters = i;
              break;
            }
          }
        }
      } else {
        // ---- explicit RCS assembly (get_hb_f_pOSE,
        // linearization_sc.hpp:403-430 + landmark_block.hpp:360-413):
        // per-landmark diag blocks Jp_i'Jp_i and ALL camera-pair SC
        // blocks -Jp_i' Jl_i Hll^-1 Jl_j' Jp_j, then +lambda I
        // (add_diag). Toy/mid-scale => dense [12N, 12N] is exact.
        MatX H = MatX::Zero(12 * n_cams, 12 * n_cams);
        bvec.setZero();
        for (size_t l = 0; l < p.blocks.size(); ++l) {
          auto& blk = p.blocks[l];
          const int k = (int)blk.obs.size();
          auto jl = blk.storage.middleCols<3>(12).topRows(4 * k);
          auto r = blk.storage.col(15).head(4 * k);
          Mat3 hll = jl.transpose() * jl;
          const Mat3 hll_i = hll.inverse();
          const Vec3 hll_inv_bl = hll_i * (jl.transpose() * r);
          for (int i = 0; i < k; ++i) {
            const int ci = blk.obs[i].cam;
            auto jp_i = blk.storage.block<4, 12>(4 * i, 0);
            auto jl_i = blk.storage.block<4, 3>(4 * i, 12);
            Vec4 r_i = blk.storage.block<4, 1>(4 * i, 15);
            H.block<12, 12>(12 * ci, 12 * ci).noalias() +=
                jp_i.transpose() * jp_i;
            for (int jj = 0; jj < k; ++jj) {
              const int cj = blk.obs[jj].cam;
              auto jp_j = blk.storage.block<4, 12>(4 * jj, 0);
              auto jl_j = blk.storage.block<4, 3>(4 * jj, 12);
              H.block<12, 12>(12 * ci, 12 * cj).noalias() -=
                  jp_i.transpose() *
                  (jl_i * (hll_i * (jl_j.transpose() * jp_j)));
            }
            bvec.segment<12>(12 * ci) +=
                jp_i.transpose() * (r_i - jl_i * hll_inv_bl);
          }
        }
        H.diagonal().array() += lambda;  // add_diag (has_pose_damping)

        if (p.solver == SolverType::CHOLESKY) {
          // solve_direct_pOSE (linearization_sc.hpp:236-245):
          // SimplicialLLT of the sparse RCS, rhs -b. num_iterations
          // stays 0 (the reference's Summary is default-constructed).
          Eigen::SparseMatrix<double, Eigen::RowMajor> Hs =
              H.sparseView().pruned();
          Eigen::SimplicialLLT<
              Eigen::SparseMatrix<double, Eigen::RowMajor>>
              solver;
          accum = solver.compute(Hs).solve(-bvec);
          lin_iters = 0;
        } else {
          // PCG: SCHUR_JACOBI preconditioner = LLT inverse of the
          // (damped) SC diagonal blocks (preconditioner.hpp:70-144,
          // built from H_pp.block_storage AFTER assembly+damping);
          // Ceres CG solves Hx = b then inc = -x
          // (linearizor_base.cpp:102-125)
          std::vector<Mat12> precond(n_cams);
          for (int c = 0; c < n_cams; ++c)
            precond[c] = H.block<12, 12>(12 * c, 12 * c)
                             .selfadjointView<Eigen::Upper>()
                             .llt()
                             .solve(Mat12::Identity());
          auto mul_h = [&](const VecX& x) -> VecX { return H * x; };
          VecX x;
          lin_iters =
              ceres_cg(precond, mul_h, bvec, x, p.eta, p.max_cg_iters,
                       p.residual_reset_period);
          accum = -x;
        }
      }

      // the reference clears the flag at the END of solve
      // (linearizor_power_varproj.cpp:240 `new_linearization_point_ =
      // false`), BEFORE the driver's NaN check — so a NaN-increment
      // trial must not re-scale Jp on the next trial
      new_linearization_point = false;

      const bool inc_finite = accum.array().isFinite().all();
      if (!inc_finite) {
        // NaN increment (cpp:362-401)
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

      // backup_pOSE (bal_problem.cpp:670)
      cams_backup = p.cams;
      lms_backup = p.lms;

      double l_diff = 0.0;
      if (is_poba) {
        // apply, POWER_SCHUR_COMPLEMENT order (linearizor_power_
        // varproj.cpp:261-273): back_substitute_poBA FIRST on the
        // SCALED increment (stored storage only, landmark_block.hpp:
        // 627-657), then unscale + update cameras
        for (size_t l = 0; l < p.blocks.size(); ++l) {
          auto& blk = p.blocks[l];
          const int k = (int)blk.obs.size();
          Mat3 H_ll = Mat3::Zero();
          Vec3 tmp3 = Vec3::Zero();
          VecX J_inc = VecX::Zero(4 * k);
          for (int i = 0; i < k; ++i) {
            auto jp_i = blk.storage.block<4, 12>(4 * i, 0);
            auto jl_i = blk.storage.block<4, 3>(4 * i, 12);
            Vec4 r_i = blk.storage.block<4, 1>(4 * i, 15);
            H_ll += jl_i.transpose() * jl_i;
            const Vec12 p_inc = accum.segment<12>(12 * blk.obs[i].cam);
            tmp3 += jl_i.transpose() * (r_i + jp_i * p_inc);
            J_inc.segment<4>(4 * i) += jp_i * p_inc;
          }
          H_ll.diagonal().array() += lambda;
          Vec3 inc_lm = -H_ll.inverse() * tmp3;
          J_inc +=
              blk.storage.middleCols<3>(12).topRows(4 * k) * inc_lm;
          l_diff -= J_inc.transpose() *
                    (0.5 * J_inc + blk.storage.col(15).head(4 * k));
          // scale only after the model cost change (hpp:653-655)
          inc_lm.array() *= blk.jl_col_scale.array();
          p.lms[l] += inc_lm;
        }
        for (int c = 0; c < n_cams; ++c) {
          Vec12 inc_phys = accum.segment<12>(12 * c).cwiseProduct(
              pose_scale.segment<12>(12 * c));
          for (int i = 0; i < 12; ++i)
            p.cams[c](i / 4, i % 4) += inc_phys[i];
        }
      } else {
        // apply, VarProj order (linearizor_power_varproj.cpp:245-259 /
        // linearizor_sc.cpp:69-89): cameras first, then
        // back_substitute_pOSE with the SCALED inc (the reference
        // multiplies back by the inverse scale before
        // back-substitution, cpp:255)
        for (int c = 0; c < n_cams; ++c) {
          Vec12 inc_phys = accum.segment<12>(12 * c).cwiseProduct(
              pose_scale.segment<12>(12 * c));
          // apply_inc_pose_pOSE (bal_problem.hpp:147-163): additive
          for (int i = 0; i < 12; ++i)
            p.cams[c](i / 4, i % 4) += inc_phys[i];
        }
        // back_substitute_pOSE (landmark_block.hpp:670-707): fresh
        // UNWEIGHTED Jacobians/residual at NEW cams, OLD lms
        // (update_landmark_jacobian_pOSE, helper.cpp:382-454 — no
        // robust weighting there, a reference quirk preserved)
        for (size_t l = 0; l < p.blocks.size(); ++l) {
          auto& blk = p.blocks[l];
          const int k = (int)blk.obs.size();
          Mat3 H_ll = Mat3::Zero();
          Vec3 tmp3 = Vec3::Zero();
          VecX J_inc = VecX::Zero(4 * k);
          for (int i = 0; i < k; ++i) {
            Mat4x12 Jp_new;
            Mat43 Jl_new;
            pose_jacobians(p.alpha, p.cams[blk.obs[i].cam], p.lms[l],
                           blk.obs[i].uv, Jp_new, Jl_new);
            Vec4 r_new = pose_residual(p.alpha, p.cams[blk.obs[i].cam],
                                       p.lms[l], blk.obs[i].uv);
            H_ll += Jl_new.transpose() * Jl_new;
            tmp3 += Jl_new.transpose() * r_new;
            J_inc.segment<4>(4 * i) +=
                Jp_new * accum.segment<12>(12 * blk.obs[i].cam);
          }
          Vec3 inc_lm = -H_ll.inverse() * tmp3;
          J_inc +=
              blk.storage.middleCols<3>(12).topRows(4 * k) * inc_lm;
          l_diff -= J_inc.transpose() *
                    (0.5 * J_inc + blk.storage.col(15).head(4 * k));
          p.lms[l] += inc_lm;
        }
      }

      const double ri2 = compute_error(p);
      const double f_diff = ri - ri2;  // OptimizedCost::ERROR
      const double step_quality = f_diff / l_diff;
      const bool accept = f_diff > 0;  // cpp:443-446

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
        // the previous RECORDED trial (cpp:476 + 74-78), which after
        // backtracking is the last rejected trial, not ri
        if (std::abs(prev_rec - ri2) <= p.ftol * ri2) {
          terminated = true;
          termination = "CONVERGENCE";
        }
        break;  // leave inner loop
      } else {
        lambda = lambda_vee * lambda;
        lambda_vee *= vee_factor;
        records.push_back({it, ri2, false, true, lin_iters, 1.0 / lambda,
                           step_quality, l_diff, f_diff});
        last_recorded_cost = ri2;
        p.cams = cams_backup;  // restore_pOSE
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
    for (int i = 0; i < 3; ++i)
      printf("%s%.17g", (l || i) ? ", " : "", p.lms[l][i]);
  printf("]}\n");
  return 0;
}
