// Native Gauss-Newton pose-refinement engine for denovo3D (VERDICT r4 #6).
//
// refine_mode="all" re-solves every candidate's density at every GN
// iteration through the NON-separable gather projector — the one part of
// the framework that maps badly onto both XLA backends here: XLA:CPU
// scalarizes gathers (the AOT build carries +prefer-no-gather) and the
// experimental TPU backend executes them slower than one host core.
// This engine mirrors helicon_tpu/denovo3d/refine.py::_refine_batch.one
// (which itself mirrors the reference refine_tilt_psi_dy,
// /root/reference/src/helicon/webApps/denovo3D/solver_linear_regression.py:550-841)
// for the default config — nn-interpolation lsq solve, cosine score,
// linear-interpolation pose Jacobian — with three host-native wins the
// XLA formulation cannot express:
//
//   1. per-pose CSR sampling tables: the nn projector's sample indices
//      are computed ONCE per (candidate, pose) and reused by every
//      CG/FISTA/power matvec (XLA recomputes all coordinates on every
//      operator application by design — the right trade for huge vmap
//      batches, the wrong one for 21 matvecs at a fixed pose);
//   2. dynamic validity pruning: padded copy slots and (copy, image row)
//      combinations whose z-window cannot intersect the volume are
//      skipped OUTRIGHT (static-shape XLA must compute-and-mask them);
//   3. the GN residual/Jacobian accumulate J^T J and J^T r on the fly
//      with analytic trilinear derivatives — no jacfwd triple pass, no
//      stored Jacobian.
//
// Numerical parity: float32 data path with float64 reductions;
// nearbyintf under the default FE_TONEAREST rounding matches
// jnp.round's half-to-even. Agreement with the JAX path is asserted by
// tests/test_native_refine.py (poses to ~1e-2 deg, scores to ~1e-4 —
// reassociation-level drift over an iterative solve).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Geometry {
  int d2, l2, d3, l3;
  float scale;
  int csym;
};

struct Pose {
  float tilt_deg, psi_deg, dy;
};

constexpr double kDegToRad = 0.017453292519943295;

// R = (Ry(tilt) @ Rx(psi))^T applied as refine.py::_rot_yx_inv
// (extrinsic 'yx' euler inverse). m[r][c], row-major.
static void rot_yx_inv(float tilt_deg, float psi_deg, float m[3][3]) {
  const float t = (float)(tilt_deg * kDegToRad);
  const float p = (float)(psi_deg * kDegToRad);
  const float ct = std::cos(t), st = std::sin(t);
  const float cp = std::cos(p), sp = std::sin(p);
  // ry @ rx with ry = [[ct,0,-st],[0,1,0],[st,0,ct]],
  //            rx = [[1,0,0],[0,cp,sp],[0,-sp,cp]]
  m[0][0] = ct; m[0][1] = st * sp;  m[0][2] = -st * cp;
  m[1][0] = 0;  m[1][1] = cp;       m[1][2] = sp;
  m[2][0] = st; m[2][1] = -ct * sp; m[2][2] = ct * cp;
}

// d(rot_yx_inv)/d(tilt_deg) and /d(psi_deg) — in DEGREES (the JAX
// Jacobian differentiates through deg2rad, so the pi/180 chain factor
// belongs to the matrix derivative).
static void rot_yx_inv_dtilt(float tilt_deg, float psi_deg, float m[3][3]) {
  const float t = (float)(tilt_deg * kDegToRad);
  const float p = (float)(psi_deg * kDegToRad);
  const float ct = std::cos(t), st = std::sin(t);
  const float cp = std::cos(p), sp = std::sin(p);
  const float k = (float)kDegToRad;
  m[0][0] = -st * k; m[0][1] = ct * sp * k;  m[0][2] = -ct * cp * k;
  m[1][0] = 0;       m[1][1] = 0;            m[1][2] = 0;
  m[2][0] = ct * k;  m[2][1] = st * sp * k;  m[2][2] = -st * cp * k;
}

static void rot_yx_inv_dpsi(float tilt_deg, float psi_deg, float m[3][3]) {
  const float t = (float)(tilt_deg * kDegToRad);
  const float p = (float)(psi_deg * kDegToRad);
  const float ct = std::cos(t), st = std::sin(t);
  const float cp = std::cos(p), sp = std::sin(p);
  const float k = (float)kDegToRad;
  m[0][0] = 0; m[0][1] = st * cp * k;  m[0][2] = st * sp * k;
  m[1][0] = 0; m[1][1] = -sp * k;      m[1][2] = cp * k;
  m[2][0] = 0; m[2][1] = -ct * cp * k; m[2][2] = -ct * sp * k;
}

// Per-pose compressed data-projector: for every surviving (copy, i, j)
// row, the valid samples' voxel indices — plus, for LINEAR
// interpolation, the trilinear cell fractions (wz, wy, wx) per sample
// (cols then holds the cell BASE corner; nn leaves w empty).
struct DataCSR {
  // rows kept in (copy-order, i, j) traversal order
  std::vector<int64_t> row_ptr;   // n_rows + 1
  std::vector<int32_t> cols;      // voxel (nn) / cell base (linear)
  std::vector<float> w;           // linear: 3 fractions per sample
  std::vector<float> bvec;        // b_eff value of the row (b * rowv)
  int64_t n_rows = 0;
  bool linear = false;
};

struct SymPairs {
  // nn: ST(S(x)) entries: d = x[a] - x[b]; acc[a] += d; acc[b] -= d.
  // linear: a/b hold the two cell BASES, wa/wb the two fraction triples.
  std::vector<int32_t> a, b;
  std::vector<float> wa, wb;  // linear: 3 per entry
  bool linear = false;
};

// trilinear sample of x at cell base `base` with fractions (wz, wy, wx)
static inline float tri_sample(const float* x, int32_t base, int d3,
                               float wz, float wy, float wx) {
  const int dzs = d3 * d3;
  const float c00 = x[base] * (1 - wx) + x[base + 1] * wx;
  const float c01 = x[base + d3] * (1 - wx) + x[base + d3 + 1] * wx;
  const float c10 = x[base + dzs] * (1 - wx) + x[base + dzs + 1] * wx;
  const float c11 =
      x[base + dzs + d3] * (1 - wx) + x[base + dzs + d3 + 1] * wx;
  return (c00 * (1 - wy) + c01 * wy) * (1 - wz) +
         (c10 * (1 - wy) + c11 * wy) * wz;
}

// scatter-add v into the 8 corners of the cell at `base`
static inline void tri_scatter(float* acc, int32_t base, int d3,
                               float wz, float wy, float wx, float v) {
  const int dzs = d3 * d3;
  const float v0 = v * (1 - wz), v1 = v * wz;
  acc[base] += v0 * (1 - wy) * (1 - wx);
  acc[base + 1] += v0 * (1 - wy) * wx;
  acc[base + d3] += v0 * wy * (1 - wx);
  acc[base + d3 + 1] += v0 * wy * wx;
  acc[base + dzs] += v1 * (1 - wy) * (1 - wx);
  acc[base + dzs + 1] += v1 * (1 - wy) * wx;
  acc[base + dzs + d3] += v1 * wy * (1 - wx);
  acc[base + dzs + d3 + 1] += v1 * wy * wx;
}

struct Tables {
  const int32_t* ch;
  const int32_t* cc;
  const uint8_t* cv;
  int n_copies;
  const int32_t* pairs_hc;  // (n_pairs, 4)
  const uint8_t* pv;
  int n_pairs;
};

// ---------------------------------------------------------------------
// data CSR build (solve path; nn or linear interpolation)
// ---------------------------------------------------------------------
static void build_data_csr(const Geometry& g, const Tables& tb,
                           float twist_deg, float rise_px, const Pose& pose,
                           const float* b,     // (l2, d2): b[i*d2+j]
                           const float* aux,   // mask (nn) / cellok (linear)
                           bool linear, DataCSR& out) {
  const int d2 = g.d2, l2 = g.l2, d3 = g.d3, l3 = g.l3;
  const float s = g.scale;
  const int h3 = d3 / 2, hl = l3 / 2, h2 = d2 / 2;
  float R[3][3];
  rot_yx_inv(pose.tilt_deg, pose.psi_deg, R);

  out.row_ptr.clear();
  out.cols.clear();
  out.w.clear();
  out.bvec.clear();
  out.row_ptr.push_back(0);
  out.n_rows = 0;
  out.linear = linear;

  // base coordinates u = R * (x0, y0, z0); x0 = -s*kc, y0 = s*jc - dy,
  // z0 = s*ic (refine path: dy rides in the pose triple)
  // z-window prune per (copy, i): bz = R20*x0 + R21*y0 + R22*z0;
  // |R20*x0 + R21*y0| <= |R20|*s*h2 + |R21|*(s*h2 + |dy|)
  const float zslack = std::fabs(R[2][0]) * s * h2 +
                       std::fabs(R[2][1]) * (s * h2 + std::fabs(pose.dy)) +
                       (linear ? 1.5f : 0.5f) + 1e-3f;

  for (int t = 0; t < tb.n_copies; ++t) {
    if (!tb.cv[t]) continue;
    const float th = (float)((twist_deg * tb.ch[t] +
                              360.0 * tb.cc[t] / g.csym) * kDegToRad);
    const float cth = std::cos(th), sth = std::sin(th);
    const float dzc = tb.ch[t] * rise_px;
    for (int i = 0; i < l2; ++i) {
      const float z0 = s * (i - l2 / 2);
      // prune: can any sample of this (copy, i) land in the valid z band?
      const float bz_c = R[2][2] * z0;
      const float zlo = bz_c - zslack - dzc + hl;
      const float zhi = bz_c + zslack - dzc + hl;
      if (zhi < -0.5f || zlo > (float)l3) continue;
      // row block (i, all j): coords computed per tap
      for (int j = 0; j < d2; ++j) {
        const float y0 = s * (j - h2) - pose.dy;
        int64_t start = (int64_t)out.cols.size();
        for (int k = 0; k < d2; ++k) {
          const float x0 = -s * (k - h2);
          const float ux = R[0][0] * x0 + R[0][1] * y0 + R[0][2] * z0;
          const float uy = R[1][0] * x0 + R[1][1] * y0 + R[1][2] * z0;
          const float uz = R[2][0] * x0 + R[2][1] * y0 + R[2][2] * z0;
          const float X = (ux * cth + uy * sth) + h3;
          const float Y = (-ux * sth + uy * cth) + h3;
          const float Z = (uz - dzc) + hl;
          if (linear) {
            const float zf = std::floor(Z), yf = std::floor(Y),
                        xf = std::floor(X);
            const int zi = (int)zf, yi = (int)yf, xi = (int)xf;
            if (zi < 0 || zi > l3 - 2 || yi < 0 || yi > d3 - 2 ||
                xi < 0 || xi > d3 - 2)
              continue;
            const int32_t base = (zi * d3 + yi) * d3 + xi;
            if (aux[base] <= 0.5f) continue;
            out.cols.push_back(base);
            out.w.push_back(Z - zf);
            out.w.push_back(Y - yf);
            out.w.push_back(X - xf);
          } else {
            const int zi = (int)std::nearbyintf(Z);
            const int yi = (int)std::nearbyintf(Y);
            const int xi = (int)std::nearbyintf(X);
            if (zi < 0 || zi > l3 - 1 || yi < 0 || yi > d3 - 1 ||
                xi < 0 || xi > d3 - 1)
              continue;
            const int32_t idx = (zi * d3 + yi) * d3 + xi;
            if (aux[idx] <= 0.5f) continue;
            out.cols.push_back(idx);
          }
        }
        if ((int64_t)out.cols.size() > start) {
          out.row_ptr.push_back((int64_t)out.cols.size());
          out.bvec.push_back(b[i * d2 + j]);
          ++out.n_rows;
        }
      }
    }
  }
}

// ---------------------------------------------------------------------
// sym pair table build (pose-independent -> once per candidate)
// ---------------------------------------------------------------------
static void build_sym_pairs(const Geometry& g, const Tables& tb,
                            float twist_deg, float rise_px,
                            const float* mask,  // voxel_in_mask test
                            const float* aux,   // mask (nn) / cellok (linear)
                            bool linear, SymPairs& out) {
  const int d3 = g.d3, l3 = g.l3;
  const int h3 = d3 / 2, hl = l3 / 2;
  out.a.clear();
  out.b.clear();
  out.wa.clear();
  out.wb.clear();
  out.linear = linear;

  // idx = voxel (nn) / cell base (linear); w3 = fractions (linear)
  auto op_index = [&](int h, int c, int z, int y, int x, int32_t* idx,
                      float* w3) {
    const float th = (float)((twist_deg * h + 360.0 * c / g.csym) *
                             kDegToRad);
    const float cs = std::cos(th), sn = std::sin(th);
    const float X0 = (float)(x - h3), Y0 = (float)(y - h3),
                Z0 = (float)(z - hl);
    const float X = X0 * cs - Y0 * sn + h3;
    const float Y = X0 * sn + Y0 * cs + h3;
    const float Z = Z0 + h * rise_px + hl;
    if (linear) {
      const float zf = std::floor(Z), yf = std::floor(Y),
                  xf = std::floor(X);
      const int zi = (int)zf, yi = (int)yf, xi = (int)xf;
      if (zi < 0 || zi > l3 - 2 || yi < 0 || yi > d3 - 2 || xi < 0 ||
          xi > d3 - 2)
        return false;
      *idx = (zi * d3 + yi) * d3 + xi;
      if (aux[*idx] <= 0.5f) return false;
      w3[0] = Z - zf;
      w3[1] = Y - yf;
      w3[2] = X - xf;
      return true;
    }
    const int zi = (int)std::nearbyintf(Z);
    const int yi = (int)std::nearbyintf(Y);
    const int xi = (int)std::nearbyintf(X);
    if (zi < 0 || zi > l3 - 1 || yi < 0 || yi > d3 - 1 || xi < 0 ||
        xi > d3 - 1)
      return false;
    *idx = (zi * d3 + yi) * d3 + xi;
    return aux[*idx] > 0.5f;
  };

  for (int p = 0; p < tb.n_pairs; ++p) {
    if (!tb.pv[p]) continue;
    const int h1 = tb.pairs_hc[p * 4 + 0], c1 = tb.pairs_hc[p * 4 + 1];
    const int h2_ = tb.pairs_hc[p * 4 + 2], c2 = tb.pairs_hc[p * 4 + 3];
    for (int z = 0; z < l3; ++z)
      for (int y = 0; y < d3; ++y)
        for (int x = 0; x < d3; ++x) {
          const int32_t v = (z * d3 + y) * d3 + x;
          if (mask[v] <= 0.5f) continue;
          int32_t ia, ib;
          float wa3[3] = {0, 0, 0}, wb3[3] = {0, 0, 0};
          if (!op_index(h1, c1, z, y, x, &ia, wa3)) continue;
          if (!op_index(h2_, c2, z, y, x, &ib, wb3)) continue;
          out.a.push_back(ia);
          out.b.push_back(ib);
          if (linear) {
            out.wa.insert(out.wa.end(), wa3, wa3 + 3);
            out.wb.insert(out.wb.end(), wb3, wb3 + 3);
          }
        }
  }
}

// ---------------------------------------------------------------------
// solver pieces on the CSR tables (mirrors solver._cg/_power/_fista)
// ---------------------------------------------------------------------
struct Solver {
  const DataCSR* csr;
  const SymPairs* sym;
  int64_t vol;
  int d3;

  // row sum of P(v) for row r (nn: plain gather-sum; linear: trilinear)
  inline float row_apply(const float* v, int64_t r) const {
    const auto& rp = csr->row_ptr;
    const auto& cols = csr->cols;
    const int64_t s0 = rp[r], s1 = rp[r + 1];
    float acc = 0.0f;
    if (csr->linear) {
      const float* w = csr->w.data();
      for (int64_t s = s0; s < s1; ++s)
        acc += tri_sample(v, cols[s], d3, w[3 * s], w[3 * s + 1],
                          w[3 * s + 2]);
    } else {
      for (int64_t s = s0; s < s1; ++s) acc += v[cols[s]];
    }
    return acc;
  }

  // scatter r_val through row r's samples into acc (the PT side)
  inline void row_scatter(float* acc, int64_t r, float r_val) const {
    const auto& rp = csr->row_ptr;
    const auto& cols = csr->cols;
    const int64_t s0 = rp[r], s1 = rp[r + 1];
    if (csr->linear) {
      const float* w = csr->w.data();
      for (int64_t s = s0; s < s1; ++s)
        tri_scatter(acc, cols[s], d3, w[3 * s], w[3 * s + 1],
                    w[3 * s + 2], r_val);
    } else {
      for (int64_t s = s0; s < s1; ++s) acc[cols[s]] += r_val;
    }
  }

  // y = N(v) = PT(P(v)) + ST(S(v))
  void apply_N(const float* v, float* y) const {
    std::memset(y, 0, sizeof(float) * vol);
    for (int64_t r = 0; r < csr->n_rows; ++r)
      row_scatter(y, r, row_apply(v, r));
    const auto& a = sym->a;
    const auto& b = sym->b;
    const size_t n = a.size();
    if (sym->linear) {
      const float* wa = sym->wa.data();
      const float* wb = sym->wb.data();
      for (size_t s = 0; s < n; ++s) {
        const float d =
            tri_sample(v, a[s], d3, wa[3 * s], wa[3 * s + 1],
                       wa[3 * s + 2]) -
            tri_sample(v, b[s], d3, wb[3 * s], wb[3 * s + 1],
                       wb[3 * s + 2]);
        tri_scatter(y, a[s], d3, wa[3 * s], wa[3 * s + 1], wa[3 * s + 2],
                    d);
        tri_scatter(y, b[s], d3, wb[3 * s], wb[3 * s + 1], wb[3 * s + 2],
                    -d);
      }
    } else {
      for (size_t s = 0; s < n; ++s) {
        const float d = v[a[s]] - v[b[s]];
        y[a[s]] += d;
        y[b[s]] -= d;
      }
    }
  }

  void rhs(float* out) const {
    std::memset(out, 0, sizeof(float) * vol);
    for (int64_t r = 0; r < csr->n_rows; ++r)
      row_scatter(out, r, csr->bvec[r]);
  }

  double dot(const float* x, const float* y) const {
    double d = 0;
    for (int64_t i = 0; i < vol; ++i) d += (double)x[i] * y[i];
    return d;
  }

  // cosine(P(x), b_eff) without materializing pred
  double cosine(const float* x) const {
    double num = 0, pp = 0, bb = 0;
    for (int64_t r = 0; r < csr->n_rows; ++r) {
      const float acc = row_apply(x, r);
      const double bv = csr->bvec[r];
      num += acc * bv;
      pp += (double)acc * acc;
      bb += bv * bv;
    }
    const double den = std::sqrt(pp) * std::sqrt(bb);
    return den > 0 ? num / std::max(den, 1e-30) : 0.0;
  }
};

static void clip_vec(float* x, int64_t n, float lb, float ub) {
  for (int64_t i = 0; i < n; ++i)
    x[i] = std::fmin(std::fmax(x[i], lb), ub);
}

// full lsq solve (cosine score): CG from 0 + power iteration + FISTA box
static double solve_lsq(const Solver& sv, int cg_iters, int fista_iters,
                        int power_iters, float lb, float ub, float* x) {
  const int64_t n = sv.vol;
  std::vector<float> r(n), p(n), Np(n), rhs(n), y(n), g(n), v(n), w(n);
  sv.rhs(rhs.data());

  // CG, x0 = 0 (solver._cg)
  std::memset(x, 0, sizeof(float) * n);
  std::memcpy(r.data(), rhs.data(), sizeof(float) * n);
  std::memcpy(p.data(), rhs.data(), sizeof(float) * n);
  double rs = sv.dot(r.data(), r.data());
  for (int it = 0; it < cg_iters; ++it) {
    sv.apply_N(p.data(), Np.data());
    const double pNp = sv.dot(p.data(), Np.data());
    const double alpha = pNp > 0 ? rs / std::max(pNp, 1e-30) : 0.0;
    for (int64_t i = 0; i < n; ++i) {
      x[i] += (float)(alpha * p[i]);
      r[i] -= (float)(alpha * Np[i]);
    }
    const double rs_new = sv.dot(r.data(), r.data());
    const double beta = rs > 0 ? rs_new / std::max(rs, 1e-30) : 0.0;
    for (int64_t i = 0; i < n; ++i) p[i] = r[i] + (float)(beta * p[i]);
    rs = rs_new;
  }

  if (fista_iters > 0) {
    // Lipschitz power iteration from the normalized ones vector
    const float inv = 1.0f / std::sqrt((float)n);
    for (int64_t i = 0; i < n; ++i) v[i] = inv;
    for (int it = 0; it < power_iters; ++it) {
      sv.apply_N(v.data(), w.data());
      const double nw = std::sqrt(sv.dot(w.data(), w.data()));
      const float s = (float)(1.0 / std::max(nw, 1e-30));
      for (int64_t i = 0; i < n; ++i) v[i] = w[i] * s;
    }
    sv.apply_N(v.data(), w.data());
    const double margin =
        power_iters >= 4 ? 1.2 : (power_iters >= 2 ? 1.5 : 1.8);
    const double lips = margin * sv.dot(v.data(), w.data());
    const double eta = 1.0 / std::max(lips, 1e-20);

    // FISTA from clip(x_cg) (solver._fista)
    clip_vec(x, n, lb, ub);
    std::memcpy(y.data(), x, sizeof(float) * n);
    double t = 1.0;
    for (int it = 0; it < fista_iters; ++it) {
      sv.apply_N(y.data(), g.data());
      const double t_new = 0.5 * (1.0 + std::sqrt(1.0 + 4.0 * t * t));
      const double m = (t - 1.0) / t_new;
      for (int64_t i = 0; i < n; ++i) {
        float xn = (float)(y[i] - eta * (g[i] - rhs[i]));
        xn = std::fmin(std::fmax(xn, lb), ub);
        y[i] = xn + (float)(m * (xn - x[i]));
        x[i] = xn;
      }
      t = t_new;
    }
  } else {
    clip_vec(x, n, lb, ub);
  }
  return sv.cosine(x);
}

// ---------------------------------------------------------------------
// GN residual + analytic Jacobian (LINEAR interpolation, x fixed) —
// accumulates J^T J (3x3) and J^T r on the fly, mirroring
// refine.py::_refine_batch's jacfwd over the linear-interp residual.
// ---------------------------------------------------------------------
static void gn_accumulate(const Geometry& g, const Tables& tb,
                          float twist_deg, float rise_px, const Pose& pose,
                          const float* b, const float* cellok,
                          const float* x,  // (l3*d3*d3)
                          double JtJ[3][3], double Jtr[3]) {
  const int d2 = g.d2, l2 = g.l2, d3 = g.d3, l3 = g.l3;
  const float s = g.scale;
  const int h3 = d3 / 2, hl = l3 / 2, h2 = d2 / 2;
  const int dzs = d3 * d3;
  float R[3][3], Dt[3][3], Dp[3][3];
  rot_yx_inv(pose.tilt_deg, pose.psi_deg, R);
  rot_yx_inv_dtilt(pose.tilt_deg, pose.psi_deg, Dt);
  rot_yx_inv_dpsi(pose.tilt_deg, pose.psi_deg, Dp);

  for (int i = 0; i < 3; ++i) {
    Jtr[i] = 0;
    for (int j = 0; j < 3; ++j) JtJ[i][j] = 0;
  }

  // linear valid needs cell indices in [0, dim-2]: slightly wider slack
  const float zslack = std::fabs(R[2][0]) * s * h2 +
                       std::fabs(R[2][1]) * (s * h2 + std::fabs(pose.dy)) +
                       1.5f;

  for (int t = 0; t < tb.n_copies; ++t) {
    if (!tb.cv[t]) continue;
    const float th = (float)((twist_deg * tb.ch[t] +
                              360.0 * tb.cc[t] / g.csym) * kDegToRad);
    const float cth = std::cos(th), sth = std::sin(th);
    const float dzc = tb.ch[t] * rise_px;
    for (int i = 0; i < l2; ++i) {
      const float z0 = s * (i - l2 / 2);
      const float bz_c = R[2][2] * z0;
      if (bz_c + zslack - dzc + hl < -1.0f ||
          bz_c - zslack - dzc + hl > (float)l3)
        continue;
      for (int j = 0; j < d2; ++j) {
        const float y0 = s * (j - h2) - pose.dy;
        float pred = 0.0f;
        float dpred[3] = {0, 0, 0};
        bool any = false;
        for (int k = 0; k < d2; ++k) {
          const float x0 = -s * (k - h2);
          const float ux = R[0][0] * x0 + R[0][1] * y0 + R[0][2] * z0;
          const float uy = R[1][0] * x0 + R[1][1] * y0 + R[1][2] * z0;
          const float uz = R[2][0] * x0 + R[2][1] * y0 + R[2][2] * z0;
          const float X = (ux * cth + uy * sth) + h3;
          const float Y = (-ux * sth + uy * cth) + h3;
          const float Z = (uz - dzc) + hl;
          const float zf = std::floor(Z), yf = std::floor(Y),
                      xf = std::floor(X);
          const int zi = (int)zf, yi = (int)yf, xi = (int)xf;
          if (zi < 0 || zi > l3 - 2 || yi < 0 || yi > d3 - 2 ||
              xi < 0 || xi > d3 - 2)
            continue;
          const int32_t base = (zi * d3 + yi) * d3 + xi;
          if (cellok[base] <= 0.5f) continue;
          any = true;
          const float wz = Z - zf, wy = Y - yf, wx = X - xf;
          const float v000 = x[base], v001 = x[base + 1];
          const float v010 = x[base + d3], v011 = x[base + d3 + 1];
          const float v100 = x[base + dzs], v101 = x[base + dzs + 1];
          const float v110 = x[base + dzs + d3],
                      v111 = x[base + dzs + d3 + 1];
          // value + partials wrt (X, Y, Z) of the trilinear sample
          const float c00 = v000 * (1 - wx) + v001 * wx;
          const float c01 = v010 * (1 - wx) + v011 * wx;
          const float c10 = v100 * (1 - wx) + v101 * wx;
          const float c11 = v110 * (1 - wx) + v111 * wx;
          const float c0 = c00 * (1 - wy) + c01 * wy;
          const float c1 = c10 * (1 - wy) + c11 * wy;
          pred += c0 * (1 - wz) + c1 * wz;
          const float dZ = c1 - c0;
          const float dY = (c01 - c00) * (1 - wz) + (c11 - c10) * wz;
          const float dX =
              ((v001 - v000) * (1 - wy) + (v011 - v010) * wy) * (1 - wz) +
              ((v101 - v100) * (1 - wy) + (v111 - v110) * wy) * wz;
          // d(coords)/d(pose): du/dp via the rotation derivatives;
          // dy enters y0 with coefficient -1
          // p = tilt:
          {
            const float dux = Dt[0][0] * x0 + Dt[0][1] * y0 + Dt[0][2] * z0;
            const float duy = Dt[1][0] * x0 + Dt[1][1] * y0 + Dt[1][2] * z0;
            const float duz = Dt[2][0] * x0 + Dt[2][1] * y0 + Dt[2][2] * z0;
            const float dXp = dux * cth + duy * sth;
            const float dYp = -dux * sth + duy * cth;
            dpred[0] += dX * dXp + dY * dYp + dZ * duz;
          }
          // p = psi:
          {
            const float dux = Dp[0][0] * x0 + Dp[0][1] * y0 + Dp[0][2] * z0;
            const float duy = Dp[1][0] * x0 + Dp[1][1] * y0 + Dp[1][2] * z0;
            const float duz = Dp[2][0] * x0 + Dp[2][1] * y0 + Dp[2][2] * z0;
            const float dXp = dux * cth + duy * sth;
            const float dYp = -dux * sth + duy * cth;
            dpred[1] += dX * dXp + dY * dYp + dZ * duz;
          }
          // p = dy: d(y0)/d(dy) = -1
          {
            const float dux = -R[0][1];
            const float duy = -R[1][1];
            const float duz = -R[2][1];
            const float dXp = dux * cth + duy * sth;
            const float dYp = -dux * sth + duy * cth;
            dpred[2] += dX * dXp + dY * dYp + dZ * duz;
          }
        }
        if (!any) continue;  // rowv_linear = 0: residual row masked out
        const double rres = (double)pred - b[i * d2 + j];
        for (int a = 0; a < 3; ++a) {
          Jtr[a] += dpred[a] * rres;
          for (int c = a; c < 3; ++c) JtJ[a][c] += (double)dpred[a] * dpred[c];
        }
      }
    }
  }
  JtJ[1][0] = JtJ[0][1];
  JtJ[2][0] = JtJ[0][2];
  JtJ[2][1] = JtJ[1][2];
}

// solve (JtJ + 1e-6 I) step = Jtr (3x3, Cholesky-free direct)
static void solve3(double A[3][3], const double b[3], double out[3]) {
  double M[3][4];
  for (int i = 0; i < 3; ++i) {
    for (int j = 0; j < 3; ++j) M[i][j] = A[i][j] + (i == j ? 1e-6 : 0.0);
    M[i][3] = b[i];
  }
  for (int c = 0; c < 3; ++c) {
    int piv = c;
    for (int r2 = c + 1; r2 < 3; ++r2)
      if (std::fabs(M[r2][c]) > std::fabs(M[piv][c])) piv = r2;
    if (piv != c)
      for (int j = c; j < 4; ++j) std::swap(M[c][j], M[piv][j]);
    const double d = M[c][c] != 0.0 ? M[c][c] : 1e-30;
    for (int r2 = 0; r2 < 3; ++r2) {
      if (r2 == c) continue;
      const double f = M[r2][c] / d;
      for (int j = c; j < 4; ++j) M[r2][j] -= f * M[c][j];
    }
  }
  for (int i = 0; i < 3; ++i) out[i] = M[i][3] / (M[i][i] != 0.0 ? M[i][i] : 1e-30);
}

}  // namespace

extern "C" {

// GN pose refinement for ONE candidate; mirrors
// refine.py::_refine_batch.one for the nn-lsq-cosine default config.
// Returns 0 on success. All arrays are C-contiguous float32/int32/uint8.
int helicon_refine_candidate(
    const float* region,   // (d2, l2) — grid.py's centered crop
    const float* mask,     // (l3, d3, d3) cylindrical mask (0/1)
    const float* cellok,   // (l3, d3, d3) linear cell-valid volume
    int d2, int l2, int d3, int l3, float scale, int csym,
    float twist_deg, float rise_px,
    const int32_t* copies_h, const int32_t* copies_c,
    const uint8_t* copies_valid, int n_copies,
    const int32_t* pairs_hc, const uint8_t* pairs_valid, int n_pairs,
    int interp_linear,  // 0 = nearest-neighbor solve, 1 = trilinear
    int cg_iters, int fista_iters, int power_iters,
    int positive_mode,  // SolveConfig.positive_constraint: <0 auto, 0 off, >0 on
    float tilt0, float psi0, float dy0,
    const float* lo, const float* hi,  // (3,) pose bounds
    int max_iter,
    float* out_pose,    // (3,)
    float* out_score) { // (1,)
  Geometry g{d2, l2, d3, l3, scale, csym};
  Tables tb{copies_h, copies_c, copies_valid, n_copies,
            pairs_hc, pairs_valid, n_pairs};
  const int64_t vol = (int64_t)l3 * d3 * d3;

  // b[i*d2+j] = region[j*l2+i] (projector.build_problem: b = region.T)
  std::vector<float> b((size_t)l2 * d2);
  for (int i = 0; i < l2; ++i)
    for (int j = 0; j < d2; ++j) b[(size_t)i * d2 + j] = region[(size_t)j * l2 + i];

  // positivity (solver._solve_candidate_impl): auto = pitch > 2*l3
  const float pitch_px = std::nearbyintf(rise_px * 360.0f / std::fabs(twist_deg));
  const bool positive =
      positive_mode > 0 || (positive_mode < 0 && pitch_px > 2.0f * l3);

  const bool linear = interp_linear != 0;
  const float* aux = linear ? cellok : mask;
  SymPairs sym;
  build_sym_pairs(g, tb, twist_deg, rise_px, mask, aux, linear, sym);

  float params[3] = {tilt0, psi0, dy0};
  float best_p[3] = {tilt0, psi0, dy0};
  double best_s = -1e30;
  std::vector<float> x(vol);
  DataCSR csr;

  auto clip_pose = [&](float* p) {
    for (int a = 0; a < 3; ++a)
      p[a] = std::fmin(std::fmax(p[a], lo[a]), hi[a]);
  };

  auto solve_and_score = [&](const float* p, float* xv) -> double {
    Pose pose{p[0], p[1], p[2]};
    build_data_csr(g, tb, twist_deg, rise_px, pose, b.data(), aux,
                   linear, csr);
    Solver sv{&csr, &sym, vol, d3};
    // box bounds: lb = 0 / ub = max(b_eff) when positive (solver flow).
    // The JAX ub_val maxes over the FULL padded (C, l2, d2) tensor,
    // whose invalid entries are 0 — so its ub is never negative even
    // for an all-negative region; clamp to match.
    float ub = 0.0f;
    for (int64_t r = 0; r < csr.n_rows; ++r)
      ub = std::fmax(ub, csr.bvec[r]);
    const float lb_v = positive ? 0.0f : -1e30f;
    const float ub_v = positive ? ub : 1e30f;
    return solve_lsq(sv, cg_iters, fista_iters, power_iters, lb_v, ub_v, xv);
  };

  for (int it = 0; it < max_iter; ++it) {
    const double score = solve_and_score(params, x.data());
    if (score > best_s) {
      best_s = score;
      std::memcpy(best_p, params, sizeof(best_p));
    }
    double JtJ[3][3], Jtr[3], step[3];
    Pose pose{params[0], params[1], params[2]};
    gn_accumulate(g, tb, twist_deg, rise_px, pose, b.data(), cellok,
                  x.data(), JtJ, Jtr);
    solve3(JtJ, Jtr, step);
    for (int a = 0; a < 3; ++a) params[a] -= (float)step[a];
    clip_pose(params);
  }
  // score the final iterate too (refine.py does the same)
  const double score = solve_and_score(params, x.data());
  if (score > best_s) {
    best_s = score;
    std::memcpy(best_p, params, sizeof(best_p));
  }

  std::memcpy(out_pose, best_p, sizeof(best_p));
  *out_score = (float)best_s;
  return 0;
}

}  // extern "C"
