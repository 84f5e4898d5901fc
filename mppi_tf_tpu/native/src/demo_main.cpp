// Closed-loop native MPPI demo + timing harness.
//
// The C++ analogue of the reference's src/main.cpp demo (reference
// src/main.cpp:36-64 builds the env + controller and has a chrono benchmark
// loop commented out) — here the loop is real: drive a 3-DoF analytic
// point-mass plant with the native f64 MPPI core, print the trajectory tail
// and per-solve latency percentiles.
//
// Build & run:  make -C mppi_tf_tpu/native demo
//
// Usage: demo_main [k] [tau] [steps]

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <random>
#include <vector>

extern "C" void mppi_pm_solve(const double*, const double*, const double*,
                              const double*, const double*, const double*,
                              const double*, const double*, int64_t, int64_t,
                              int64_t, int64_t, double, double, double, int,
                              double*, double*, double*);

int main(int argc, char** argv) {
  const int64_t k = argc > 1 ? std::atoll(argv[1]) : 2048;
  const int64_t tau = argc > 2 ? std::atoll(argv[2]) : 25;
  const int steps = argc > 3 ? std::atoi(argv[3]) : 60;
  if (k <= 0 || tau <= 0 || steps <= 0) {
    std::fprintf(stderr, "usage: demo_main [k>0] [tau>0] [steps>0]\n");
    return 2;
  }
  const int64_t sdim = 6, adim = 3;
  const double dt = 0.1, mass = 1.0, lam = 0.8, gamma = 0.2, ups = 1.0;

  // block-diagonal double integrator (reference point_mass_model.py:134-151)
  std::vector<double> A(sdim * sdim, 0.0), Bm(sdim * adim, 0.0);
  for (int64_t i = 0; i < adim; ++i) {
    A[(2 * i) * sdim + 2 * i] = 1.0;
    A[(2 * i) * sdim + 2 * i + 1] = dt;
    A[(2 * i + 1) * sdim + 2 * i + 1] = 1.0;
    Bm[(2 * i) * adim + i] = dt * dt / 2.0 / mass;
    Bm[(2 * i + 1) * adim + i] = dt / mass;
  }
  std::vector<double> Q(sdim * sdim, 0.0);
  const double qd[6] = {5.0, 1.0, 5.0, 1.0, 5.0, 1.0};
  for (int64_t i = 0; i < sdim; ++i) Q[i * sdim + i] = qd[i];
  const double goal[6] = {1.0, 0.0, 0.5, 0.0, -0.5, 0.0};
  std::vector<double> inv_sigma(adim * adim, 0.0), sigma(adim, 0.25);
  for (int64_t i = 0; i < adim; ++i) inv_sigma[i * adim + i] = 1.0 / sigma[i];

  std::vector<double> x(sdim, 0.0), useq(tau * adim, 0.0);
  std::vector<double> eps(k * tau * adim), action(adim), next_useq(tau * adim);
  double stats[4];
  std::mt19937_64 rng(2);  // fixed seed like the reference (seed=2)
  std::normal_distribution<double> normal(0.0, 1.0);

  std::vector<double> lat_ms;
  lat_ms.reserve(steps);
  for (int s = 0; s < steps; ++s) {
    for (auto& e : eps) e = normal(rng);
    for (int64_t i = 0; i < k * tau; ++i)     // eps = (ups*sigma) @ z, diag
      for (int64_t j = 0; j < adim; ++j)
        eps[i * adim + j] *= ups * sigma[j];
    const auto t0 = std::chrono::steady_clock::now();
    mppi_pm_solve(A.data(), Bm.data(), x.data(), useq.data(), eps.data(),
                  Q.data(), goal, inv_sigma.data(), k, tau, sdim, adim, lam,
                  gamma, ups, /*normalize=*/0, action.data(),
                  next_useq.data(), stats);
    const auto t1 = std::chrono::steady_clock::now();
    lat_ms.push_back(
        std::chrono::duration<double, std::milli>(t1 - t0).count());
    useq = next_useq;  // receding horizon: carry the updated sequence
    // plant step: x' = A x + B/m * u
    std::vector<double> xn(sdim, 0.0);
    for (int64_t i = 0; i < sdim; ++i) {
      for (int64_t j = 0; j < sdim; ++j) xn[i] += A[i * sdim + j] * x[j];
      for (int64_t j = 0; j < adim; ++j) xn[i] += Bm[i * adim + j] * action[j];
    }
    x = xn;
  }

  std::sort(lat_ms.begin(), lat_ms.end());
  const double p50 = lat_ms[lat_ms.size() / 2];
  const double p95 = lat_ms[static_cast<size_t>(lat_ms.size() * 0.95)];
  double err = 0.0;
  for (int64_t i = 0; i < sdim; ++i)
    err += (x[i] - goal[i]) * (x[i] - goal[i]);
  std::printf("{\"k\": %lld, \"tau\": %lld, \"steps\": %d, "
              "\"final_state\": [%.4f, %.4f, %.4f, %.4f, %.4f, %.4f], "
              "\"goal_err_l2\": %.4f, \"p50_solve_ms\": %.3f, "
              "\"p95_solve_ms\": %.3f}\n",
              static_cast<long long>(k), static_cast<long long>(tau), steps,
              x[0], x[1], x[2], x[3], x[4], x[5], std::sqrt(err), p50, p95);
  return std::sqrt(err) < 0.5 ? 0 : 1;  // demo doubles as a smoke test
}
