// Executable reference-trajectory harness: the reference's step-1
// (pOSE Power-VarProj) LM solver, re-implemented in Eigen f64.
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
//   * Jacobi scaling: linearizor_power_varproj.cpp:62-70 +
//                     landmark_block.hpp:284-334; epsilon =
//                     Sophus::Constants<double>::epsilonSqrt()
//                     = sqrt(1e-10) = 1e-5 (linearizor_base.cpp:94-100)
//   * prepare_Hb:     linearization_power_varproj.hpp:124-155
//                     (Hll^-1 via .inverse(), per-camera 12x12 LLT of
//                     the damped block diagonal)
//   * power series:   linearization_power_varproj.hpp:191-237
//                     (x = sum_i (B^-1 E0)^i B^-1 (-b), q-tolerance
//                     zeta = i*|tmp|/|accum| < eta early exit)
//   * apply/back-sub: linearizor_power_varproj.cpp:245-259 +
//                     landmark_block.hpp:670-707 (fresh Jl/res at the
//                     updated cameras, exact VarProj landmark step,
//                     model cost decrease from mixed fresh/stored terms
//                     exactly as the reference computes it)
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

#include <algorithm>
#include <cmath>
#include <cstdio>
#include <cstdlib>
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

namespace {

// Sophus::Constants<double>::epsilonSqrt() (Sophus common.hpp)
const double kJacobiEps = std::sqrt(1e-10);

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
};

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

// 0.5 ||r||^2 summed over all observations (compute_error_pOSE,
// helper.cpp:116-154; robust norm NONE)
double compute_error(const Problem& p) {
  double err = 0.0;
  for (size_t l = 0; l < p.blocks.size(); ++l) {
    for (const auto& o : p.blocks[l].obs) {
      Vec4 r = pose_residual(p.alpha, p.cams[o.cam], p.lms[l], o.uv);
      err += 0.5 * r.squaredNorm();
    }
  }
  return err;
}

// closed-form VarProj landmark init v*(u0) via thin SVD
// (helper.cpp:75-99 initialize_varproj_lm_pOSE + 220-241
// initialize_varproj_pOSE: G rows use only the rotation part, z the
// translation part)
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

}  // namespace

int main(int argc, char** argv) {
  if (argc < 2) {
    fprintf(stderr, "usage: %s state.txt\n", argv[0]);
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
  // obs per landmark in ascending camera order, like the reference's
  // std::map<FrameIdx, Observation> (bal_problem.hpp:93)
  for (auto& blk : p.blocks) {
    std::sort(blk.obs.begin(), blk.obs.end(),
              [](const Obs& a, const Obs& b) { return a.cam < b.cam; });
    blk.storage.setZero(4 * blk.obs.size(), 16);
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

    // ---- linearize_pOSE (linearizor_power_varproj.cpp:44-76)
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
        blk.storage.block<4, 12>(4 * i, 0) = Jp;
        blk.storage.block<4, 3>(4 * i, 12) = Jl;
        blk.storage.block<4, 1>(4 * i, 15) = r;
        // add_Jp_diag2_pOSE (landmark_block.hpp:272-282)
        jp_diag2.segment<12>(12 * blk.obs[i].cam) +=
            Jp.colwise().squaredNorm();
      }
      // scale_Jl_cols_pOSE (landmark_block.hpp:284-295)
      auto jl_block = blk.storage.middleCols<3>(12);
      blk.jl_col_scale =
          (kJacobiEps + jl_block.colwise().norm().array()).inverse();
      jl_block *= blk.jl_col_scale.asDiagonal();
    }
    pose_scale = (kJacobiEps + jp_diag2.array().sqrt()).inverse();

    bool new_linearization_point = true;

    // ---- inner backtracking loop (cpp:337-519)
    for (int j = 0; it <= p.max_iters && !terminated; ++j) {
      // solve (linearizor_power_varproj.cpp:177-243)
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
      // prepare_Hb_pOSE (linearization_power_varproj.hpp:124-155,
      // landmark_block.hpp:511-539)
      std::vector<Mat12> hpp(n_cams, Mat12::Zero());
      bvec.setZero();
      for (size_t l = 0; l < p.blocks.size(); ++l) {
        auto& blk = p.blocks[l];
        int rows = 4 * (int)blk.obs.size();
        auto jl = blk.storage.middleCols<3>(12).topRows(rows);
        auto r = blk.storage.col(15).head(rows);
        Mat3 hll = jl.transpose() * jl;
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

      VecX accum = mul_b_inv(-bvec);
      int lin_iters = p.m;
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

      // apply (linearizor_power_varproj.cpp:245-259)
      for (int c = 0; c < n_cams; ++c) {
        Vec12 inc_phys = accum.segment<12>(12 * c).cwiseProduct(
            pose_scale.segment<12>(12 * c));
        // apply_inc_pose_pOSE (bal_problem.hpp:147-163): additive
        for (int i = 0; i < 12; ++i) p.cams[c](i / 4, i % 4) += inc_phys[i];
      }
      // back_substitute_pOSE (landmark_block.hpp:670-707) with the
      // SCALED inc (the reference multiplies back by the inverse scale
      // before back-substitution, cpp:255)
      double l_diff = 0.0;
      for (size_t l = 0; l < p.blocks.size(); ++l) {
        auto& blk = p.blocks[l];
        const int k = (int)blk.obs.size();
        Mat3 H_ll = Mat3::Zero();
        Vec3 tmp3 = Vec3::Zero();
        VecX J_inc = VecX::Zero(4 * k);
        for (int i = 0; i < k; ++i) {
          // fresh (unscaled) Jacobians/residual at NEW cams, OLD lms
          // (update_landmark_jacobian_pOSE, helper.cpp:382-454)
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
