// Independent float64 cross-check implementations — validation oracles.
//
// Second implementations (flat-array C++, no JAX, no code copied from the
// reference) of the math the compiled-reference oracles cannot reach (the
// reference TUs depend on the Adept autodiff library; see PARITY.md):
//
//  * the SW candidate costs of find_g_points — "transmission" averaging
//    and the total-transmission method with low/high-scaled truths
//    (semantics of ref calc_cost_function_sw.cpp:20-110 and
//    find_g_points.cpp:113-204,340-394), and
//  * the 8 g-point LUT averaging methods of create_look_up_table
//    (semantics of ref average_optical_depth.cpp:120-197).
//
// Everything here computes in double precision with simple serial loops,
// so agreement with the framework's f64 CPU path at ~1e-12 validates both
// implementations (tests/test_native_baseline.py).

#include <cmath>
#include <cstdint>
#include <vector>

namespace {

constexpr double kDiffusivity = 1.66;        // LW_DIFFUSIVITY
constexpr double kSwDiffuseSecant = 2.0;     // SW_DIFFUSE_SECANT
constexpr double kHrWeight = 86400.0;        // HR_WEIGHT (K/s -> K/day)
constexpr double kAccelGravity = 9.80665;
constexpr double kSpecificHeatAir = 1004.0;
constexpr double kTransClamp = 0.9999999999999999;  // f64 clamp (ref)

// Broadband SW fluxes over one rank interval [a, b] with grey od_fit:
// direct-beam downwelling at sec(sza) = 1/cos_sza, optional no-Rayleigh
// upwelling at the fixed diffuse secant with per-wavenumber albedo.
void sw_interval_fluxes(int nlay, int nwav, int a, int b, double cos_sza,
                        const double* ssi, const double* bg_od,
                        const double* albedo, const double* od_fit,
                        std::vector<double>& flux_dn,
                        std::vector<double>& flux_up) {
  const int nhl = nlay + 1;
  for (int l = 0; l < nhl; ++l) {
    flux_dn[l] = 0.0;
    flux_up[l] = 0.0;
  }
  const double sec = 1.0 / cos_sza;
  for (int j = a; j <= b; ++j) {
    double flux = cos_sza * ssi[j];
    flux_dn[0] += flux;
    double cum = 0.0;
    for (int l = 0; l < nlay; ++l) {
      cum += bg_od[l * (size_t)nwav + j] + od_fit[l];
      flux_dn[l + 1] += cos_sza * ssi[j] * std::exp(-sec * cum);
    }
    const double dn_surf = cos_sza * ssi[j] * std::exp(-sec * cum);
    const double boundary = albedo[j] * dn_surf;
    flux_up[nlay] += boundary;
    double cum_up = 0.0;
    for (int l = nlay - 1; l >= 0; --l) {
      cum_up += bg_od[l * (size_t)nwav + j] + od_fit[l];
      flux_up[l] += boundary * std::exp(-kSwDiffuseSecant * cum_up);
    }
  }
}

// SW scalar cost from broadband fluxes: heating rate from DOWNWELLING
// only (ref calc_cost_function_sw.cpp:93), boundary flux errors weighted.
double sw_cost_from_fluxes(int nlay, const double* layer_weight,
                           const double* pressure_hl, double flux_weight,
                           const std::vector<double>& flux_dn,
                           const std::vector<double>& flux_up,
                           const double* hr_true, double fd_surf_true,
                           double fu_toa_true) {
  double hr_cost = 0.0;
  for (int l = 0; l < nlay; ++l) {
    const double conv = -(kAccelGravity / kSpecificHeatAir)
                        / (pressure_hl[l + 1] - pressure_hl[l]);
    const double err = conv * (flux_dn[l + 1] - flux_dn[l]) - hr_true[l];
    hr_cost += layer_weight[l] * err * err;
  }
  const double dn_err = flux_dn[nlay] - fd_surf_true;
  const double up_err = flux_up[0] - fu_toa_true;
  return std::sqrt(kHrWeight * kHrWeight * hr_cost
                   + flux_weight * (dn_err * dn_err + up_err * up_err));
}

void interval_truth(int nlay, int nwav, int a, int b, const double* hr,
                    const double* fd_surf, const double* fu_toa,
                    std::vector<double>& hr_true, double& fd_true,
                    double& fu_true) {
  for (int l = 0; l < nlay; ++l) {
    double s = 0.0;
    const double* h = hr + l * (size_t)nwav;
    for (int j = a; j <= b; ++j) s += h[j];
    hr_true[l] = s;
  }
  fd_true = 0.0;
  fu_true = 0.0;
  for (int j = a; j <= b; ++j) {
    fd_true += fd_surf[j];
    fu_true += fu_toa[j];
  }
}

}  // namespace

extern "C" {

// SW candidate cost, "transmission" averaging (fit_optical_depth_sw with
// the clamp applied to the weighted SUM before normalization — the
// documented reference quirk, find_g_points.cpp:125-133).
// Layout: ssi/albedo/flux_dn_surf/flux_up_toa (nwav); bg_od/metric/hr
// (nlay, nwav) row-major; pressure_hl (nlay+1); i1/i2 (nseg) inclusive.
int sw_cost_transmission(
    int nlay, int nwav, int nseg, double cos_sza,
    const double* layer_weight, const double* pressure_hl,
    const double* ssi, const double* albedo,
    const double* flux_dn_surf, const double* flux_up_toa,
    const double* bg_od, const double* metric, const double* hr,
    const int32_t* i1, const int32_t* i2, double flux_weight,
    double* costs_out) {
  if (nlay <= 0 || nwav <= 0 || nseg <= 0) return 0;
  std::vector<double> od_fit(nlay), hr_true(nlay);
  std::vector<double> flux_dn(nlay + 1), flux_up(nlay + 1);
  for (int c = 0; c < nseg; ++c) {
    const int a = i1[c], b = i2[c];
    if (a < 0 || b >= nwav || b < a) return -1;
    double wsum = 0.0;
    for (int j = a; j <= b; ++j) wsum += ssi[j];
    for (int l = 0; l < nlay; ++l) {
      double num = 0.0;
      const double* m = metric + l * (size_t)nwav;
      for (int j = a; j <= b; ++j) num += m[j] * ssi[j];
      // Clamp BEFORE normalization (ref quirk)
      if (num > kTransClamp) num = kTransClamp;
      const double mean = num / wsum;
      od_fit[l] = std::fabs(-std::log1p(-mean) / kDiffusivity);
    }
    double fd_true, fu_true;
    interval_truth(nlay, nwav, a, b, hr, flux_dn_surf, flux_up_toa,
                   hr_true, fd_true, fu_true);
    sw_interval_fluxes(nlay, nwav, a, b, cos_sza, ssi, bg_od, albedo,
                       od_fit.data(), flux_dn, flux_up);
    costs_out[c] = sw_cost_from_fluxes(nlay, layer_weight, pressure_hl,
                                       flux_weight, flux_dn, flux_up,
                                       hr_true.data(), fd_true, fu_true);
  }
  return 1;
}

// SW candidate cost, total-transmission method (find_g_points.cpp:173-204
// fit + :340-394 averaged low/high-scaled costs).  od is the target gas
// optical depth (the sorting metric for this method); hr_low/high and the
// boundary truths are the low/high-scaled reference fluxes.
int sw_cost_total_transmission(
    int nlay, int nwav, int nseg, double cos_sza,
    const double* layer_weight, const double* pressure_hl,
    const double* ssi, const double* albedo,
    const double* bg_od, const double* od,
    const double* hr_low, const double* fd_surf_low, const double* fu_toa_low,
    const double* hr_high, const double* fd_surf_high,
    const double* fu_toa_high,
    double min_scaling, double max_scaling,
    const int32_t* i1, const int32_t* i2, double flux_weight,
    double* costs_out) {
  if (nlay <= 0 || nwav <= 0 || nseg <= 0) return 0;
  std::vector<double> od_fit(nlay), scaled(nlay), hr_true(nlay);
  std::vector<double> flux_dn(nlay + 1), flux_up(nlay + 1);
  std::vector<double> bb_bg(nlay + 1), bb(nlay + 1);
  for (int c = 0; c < nseg; ++c) {
    const int a = i1[c], b = i2[c];
    if (a < 0 || b >= nwav || b < a) return -1;

    // Fit: broadband direct-flux ratios at secant 2 with/without the gas
    double top = 0.0;
    for (int l = 0; l <= nlay; ++l) {
      bb_bg[l] = 0.0;
      bb[l] = 0.0;
    }
    for (int j = a; j <= b; ++j) {
      top += ssi[j];
      double cum_bg = 0.0, cum = 0.0;
      for (int l = 0; l < nlay; ++l) {
        cum_bg += bg_od[l * (size_t)nwav + j];
        cum += bg_od[l * (size_t)nwav + j] + od[l * (size_t)nwav + j];
        bb_bg[l + 1] += ssi[j] * std::exp(-kSwDiffuseSecant * cum_bg);
        bb[l + 1] += ssi[j] * std::exp(-kSwDiffuseSecant * cum);
      }
    }
    // linear fallback numerators per layer: sum_j od(l, j) * ssi[j]
    std::vector<double> linear(nlay, 0.0);
    for (int l = 0; l < nlay; ++l) {
      const double* o = od + l * (size_t)nwav;
      double s = 0.0;
      for (int j = a; j <= b; ++j) s += o[j] * ssi[j];
      linear[l] = s / top;
    }
    bool any_bad = false;
    for (int l = 1; l <= nlay; ++l)
      if (!(bb_bg[l] > 0.0) || !(bb[l] > 0.0)) any_bad = true;
    if (any_bad) {
      for (int l = 0; l < nlay; ++l) od_fit[l] = linear[l];
    } else {
      for (int l = 0; l < nlay; ++l) {
        const double above_bg = (l == 0) ? top : bb_bg[l];
        const double above = (l == 0) ? top : bb[l];
        const double bg_fit =
            -0.5 * std::log(bb_bg[l + 1] / std::max(above_bg, 1e-300));
        od_fit[l] =
            -0.5 * std::log(bb[l + 1] / std::max(above, 1e-300)) - bg_fit;
      }
    }

    // Averaged cost of the low- and high-scaled fits vs their truths
    double cost = 0.0;
    const double scalings[2] = {min_scaling, max_scaling};
    const double* hrs[2] = {hr_low, hr_high};
    const double* fds[2] = {fd_surf_low, fd_surf_high};
    const double* fus[2] = {fu_toa_low, fu_toa_high};
    for (int s = 0; s < 2; ++s) {
      for (int l = 0; l < nlay; ++l) scaled[l] = od_fit[l] * scalings[s];
      double fd_true, fu_true;
      interval_truth(nlay, nwav, a, b, hrs[s], fds[s], fus[s], hr_true,
                     fd_true, fu_true);
      sw_interval_fluxes(nlay, nwav, a, b, cos_sza, ssi, bg_od, albedo,
                         scaled.data(), flux_dn, flux_up);
      cost += 0.5 * sw_cost_from_fluxes(nlay, layer_weight, pressure_hl,
                                        flux_weight, flux_dn, flux_up,
                                        hr_true.data(), fd_true, fu_true);
    }
    costs_out[c] = cost;
  }
  return 1;
}

// G-point LUT averaging (create_look_up_table), all 8 methods.
// method: 0 linear, 1 transmission, 2 transmission-2, 3 transmission-3,
// 4 transmission-10, 5 square-root, 6 logarithmic,
// 7 hybrid-logarithmic-transmission-3 (needs pressure_fl).
// g_point (nwav) int32, <0 = unassigned; od/weight (nz, nwav) row-major;
// outputs od_fit/min_od/max_od (nz, ng).
int gpoint_average(
    int nz, int nwav, int ng, int method,
    const int32_t* g_point, const double* od, const double* weight,
    const double* pressure_fl,
    double* od_fit, double* min_od, double* max_od) {
  if (nz <= 0 || nwav <= 0 || ng <= 0) return 0;
  if (method == 7 && pressure_fl == nullptr) return -2;

  auto trans_scale = [](int m) {
    switch (m) {
      case 1: return 1.0;
      case 2: return 2.0;
      case 3: return 3.0;
      case 4: return 10.0;
    }
    return 0.0;
  };

  std::vector<int> count(ng, 0);
  for (int j = 0; j < nwav; ++j)
    if (g_point[j] >= 0 && g_point[j] < ng) count[g_point[j]]++;

  for (int z = 0; z < nz; ++z) {
    const double* o = od + z * (size_t)nwav;
    const double* w = weight + z * (size_t)nwav;
    for (int g = 0; g < ng; ++g) {
      const size_t out = z * (size_t)ng + g;
      if (count[g] == 0) {
        od_fit[out] = 0.0;
        min_od[out] = 0.0;
        max_od[out] = 0.0;
        continue;
      }
      double w_sum = 0.0, mn = 0.0, mx = 0.0;
      bool first = true;
      for (int j = 0; j < nwav; ++j) {
        if (g_point[j] != g) continue;
        w_sum += w[j];
        if (first) {
          mn = mx = o[j];
          first = false;
        } else {
          if (o[j] < mn) mn = o[j];
          if (o[j] > mx) mx = o[j];
        }
      }
      const double safe_w = w_sum > 0.0 ? w_sum : 1.0;

      int m = method;
      if (method == 7)  // hybrid: logarithmic below 100 hPa pressure level
        m = (pressure_fl[z] > 100.0e2) ? 6 : 3;

      double fit = 0.0;
      if (m == 0) {  // linear
        double s = 0.0;
        for (int j = 0; j < nwav; ++j)
          if (g_point[j] == g) s += o[j] * w[j];
        fit = s / safe_w;
      } else if (m >= 1 && m <= 4) {  // transmission family
        const double scale = trans_scale(m);
        double s = 0.0;
        for (int j = 0; j < nwav; ++j)
          if (g_point[j] == g)
            s += -std::expm1(-o[j] * (kDiffusivity * scale)) * w[j];
        double mean = s / safe_w;
        if (mean > kTransClamp) mean = kTransClamp;
        fit = std::fabs(-std::log1p(-mean) / (kDiffusivity * scale));
      } else if (m == 5) {  // square-root
        double s = 0.0;
        for (int j = 0; j < nwav; ++j)
          if (g_point[j] == g) s += std::sqrt(o[j]) * w[j];
        fit = s / safe_w;
        fit = fit * fit;
      } else {  // logarithmic
        double sum_log = 0.0, sum_w_nz = 0.0;
        long n_nz = 0;
        for (int j = 0; j < nwav; ++j) {
          if (g_point[j] != g) continue;
          if (o[j] > 0.0) {
            sum_log += std::log(o[j]) * w[j];
            sum_w_nz += w[j];
            n_nz++;
          }
        }
        if (n_nz == 0) {
          fit = 0.0;
        } else if (n_nz >= count[g]) {
          fit = std::exp(sum_log / safe_w);
        } else {
          fit = std::exp(sum_log / sum_w_nz)
                * (double)n_nz / (double)count[g];
        }
      }

      // Clamp fit into [min, max]; widen degenerate bounds
      // (ref average_optical_depth.cpp:139-163)
      if (fit < mn) fit = mn;
      if (fit > mx) fit = mx;
      if (mn > 0.0 && mn >= mx) {
        mn *= 0.99;
        mx *= 1.01;
      }
      od_fit[out] = fit;
      min_od[out] = mn;
      max_od[out] = mx;
    }
  }
  return 1;
}

}  // extern "C"
