// Test-oracle driver: exercises the REFERENCE equipartition algorithm
// (compiled at test time from /root/reference/src/ecckd/equipartition.cpp,
// which depends only on the C++ standard library) on synthetic error
// functions, printing bounds/errors for comparison against the Python port
// in ecckd_tpu/partition/equipartition.py.
//
// Usage: oracle NPOINTS NI TOL [RAMP] [CUBIC] [TARGET_SCALE]
//   RAMP: 0 exp ramp, 1 bumpy (sin-modulated) ramp, 2 plateau
//   CUBIC: 0/1 -> set_cubic_interpolation
//   TARGET_SCALE: equipartition_e target = TARGET_SCALE * error[0]
//
// This file is original driver code; no reference source is copied into
// the repository.

#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <iostream>   // equipartition.h uses std::cout without including it
#include <vector>

#include "equipartition.h"

class RampEquipartition : public Equipartition {
  public:
    RampEquipartition(int n, int shape) : npoints(n), values(n) {
        for (int i = 0; i < n; ++i) {
            double x = static_cast<double>(i) / (n - 1);
            if (shape == 1) {
                values[i] = std::exp(-2.0 + 12.0 * x)
                            * (1.5 + std::sin(40.0 * x));
            } else if (shape == 2) {
                values[i] = std::exp(12.0 * (x < 0.6 ? x : 0.6)) + 0.1 * x;
            } else {
                values[i] = std::exp(-2.0 + 12.0 * x);
            }
        }
    }

    ep_real calc_error(ep_real bound1, ep_real bound2) override {
        int i1 = static_cast<int>(std::ceil(bound1 * (npoints - 1)));
        int i2 = static_cast<int>(std::floor(bound2 * (npoints - 1)));
        double sum = 0.0;
        for (int i = i1; i <= i2; ++i) sum += values[i];
        return std::fabs(sum - (i2 - i1 + 1) * values[(i1 + i2) / 2]);
    }

    int npoints;
    std::vector<double> values;
};

int main(int argc, char** argv) {
    int npoints = argc > 1 ? std::atoi(argv[1]) : 100000;
    int ni = argc > 2 ? std::atoi(argv[2]) : 16;
    double tol = argc > 3 ? std::atof(argv[3]) : 0.01;
    int shape = argc > 4 ? std::atoi(argv[4]) : 0;
    int cubic = argc > 5 ? std::atoi(argv[5]) : 0;
    double target_scale = argc > 6 ? std::atof(argv[6]) : 1.0;

    RampEquipartition eq(npoints, shape);
    eq.set_partition_max_iterations(200);
    eq.set_line_search_max_iterations(15);
    eq.set_partition_tolerance(tol);
    eq.set_resolution(1.0 / npoints);
    eq.set_cubic_interpolation(cubic != 0);
    eq.set_verbose(0);

    std::vector<ep_real> bounds(ni + 1), error(ni);
    for (int i = 0; i <= ni; ++i) bounds[i] = static_cast<double>(i) / ni;
    EpStatus status = eq.equipartition_n(ni, bounds.data(), error.data());

    printf("status %d\n", static_cast<int>(status));
    printf("bounds");
    for (int i = 0; i <= ni; ++i) printf(" %.12g", bounds[i]);
    printf("\nerror");
    for (int i = 0; i < ni; ++i) printf(" %.12g", error[i]);
    printf("\n");

    // Target-error mode
    int ne = 0;
    std::vector<ep_real> bounds_e, error_e;
    double target = target_scale * error[0];
    EpStatus status_e = eq.equipartition_e(target, 0.0, 1.0, ne,
                                           bounds_e, error_e);
    printf("status_e %d ne %d\n", static_cast<int>(status_e), ne);
    printf("bounds_e");
    for (int i = 0; i <= ne; ++i) printf(" %.12g", bounds_e[i]);
    printf("\n");
    return 0;
}
