// Native-core unit tests with closed-form expectations.
//
// Plays the role of the reference's GoogleTest suite
// (test/test_controller.cpp:109-226 — decomposed softmax-update numbers,
// shift semantics, data prep) without the gtest dependency: plain asserts,
// exit 0 on success. Run via `make test`.

#include <cassert>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {
void mppi_update(const double*, const double*, int64_t, int64_t, int64_t,
                 double, int, double*, double*);
void mppi_pm_rollout(const double*, const double*, const double*,
                     const double*, const double*, const double*,
                     const double*, const double*, int64_t, int64_t, int64_t,
                     int64_t, double, double, double, double*);
void mppi_pm_solve(const double*, const double*, const double*, const double*,
                   const double*, const double*, const double*, const double*,
                   int64_t, int64_t, int64_t, int64_t, double, double, double,
                   int, double*, double*, double*);
}

#define CHECK_NEAR(a, b, tol)                                              \
  do {                                                                     \
    if (std::fabs((a) - (b)) > (tol)) {                                    \
      std::fprintf(stderr, "FAIL %s:%d: |%g - %g| > %g\n", __FILE__,       \
                   __LINE__, (double)(a), (double)(b), (double)(tol));     \
      return 1;                                                            \
    }                                                                      \
  } while (0)

static int test_update_softmax() {
  // k=3, tau=1, adim=1: hand-computed softmax weights.
  const double costs[3] = {1.0, 2.0, 4.0};
  const double eps[3] = {1.0, -1.0, 2.0};
  double wnoise[1], stats[4];
  // lam=1, no normalization: w ~ exp(-(c-1)) = {1, e^-1, e^-3}
  mppi_update(costs, eps, 3, 1, 1, 1.0, 0, wnoise, stats);
  const double e1 = std::exp(-1.0), e3 = std::exp(-3.0);
  const double nabla = 1.0 + e1 + e3;
  CHECK_NEAR(stats[0], 1.0, 1e-12);            // beta = min cost
  CHECK_NEAR(stats[1], nabla, 1e-12);          // nabla
  CHECK_NEAR(stats[2], 7.0 / 3.0, 1e-12);      // mean
  CHECK_NEAR(stats[3], 4.0, 1e-12);            // max
  CHECK_NEAR(wnoise[0], (1.0 - e1 + 2.0 * e3) / nabla, 1e-12);
  // normalized variant: arg = (c-beta)/3 -> w ~ {1, e^{-1/3}, e^{-1}}
  mppi_update(costs, eps, 3, 1, 1, 1.0, 1, wnoise, stats);
  const double a = std::exp(-1.0 / 3.0), b = std::exp(-1.0);
  CHECK_NEAR(wnoise[0], (1.0 - a + 2.0 * b) / (1.0 + a + b), 1e-12);
  return 0;
}

static int test_pm_rollout_deterministic() {
  // 1-DoF double integrator, zero noise, one step: closed form.
  // x = [pos, vel]; A = [[1, dt], [0, 1]]; Bm = [[dt^2/2], [dt]] (mass 1).
  const double dt = 0.1;
  const double A[4] = {1.0, dt, 0.0, 1.0};
  const double Bm[2] = {dt * dt / 2.0, dt};
  const double x0[2] = {0.0, 1.0};
  const double useq[2] = {2.0, 0.0};  // tau = 2
  const double eps[4] = {0.0, 0.0, 0.0, 0.0};  // k=1 (wasteful but legal)
  const double Q[4] = {1.0, 0.0, 0.0, 0.5};
  const double goal[2] = {1.0, 0.0};
  const double inv_sigma[1] = {4.0};
  double costs[1];
  // step 1: x1 = [0 + .1*1 + .005*2, 1 + .2] = [0.11, 1.2]
  // step 2: x2 = [0.11 + .12, 1.2] = [0.23, 1.2]
  // state costs: (x-g)^T Q (x-g)
  const double c1 = (0.11 - 1.0) * (0.11 - 1.0) * 1.0 + 1.2 * 1.2 * 0.5;
  const double c2 = (0.23 - 1.0) * (0.23 - 1.0) * 1.0 + 1.2 * 1.2 * 0.5;
  // action cost per step: 0.5*gamma*u^2*invSig (eps=0)
  const double gamma = 0.2;
  const double ca1 = 0.5 * gamma * 2.0 * 4.0 * 2.0;
  // terminal: state cost of x2 again
  const double expect = c1 + c2 + ca1 + 0.0 + c2;
  mppi_pm_rollout(A, Bm, x0, useq, eps, Q, goal, inv_sigma, 1, 2, 2, 1, 0.8,
                  gamma, 1.0, costs);
  CHECK_NEAR(costs[0], expect, 1e-12);
  return 0;
}

static int test_solve_shift() {
  // With k=1 the weight is 1 and wnoise == eps; check carry + shift + zero.
  const double dt = 0.1;
  const double A[4] = {1.0, dt, 0.0, 1.0};
  const double Bm[2] = {dt * dt / 2.0, dt};
  const double x0[2] = {0.0, 0.0};
  const double useq[3] = {1.0, 2.0, 3.0};  // tau = 3
  const double eps[3] = {0.5, -0.5, 0.25};
  const double Q[4] = {1.0, 0.0, 0.0, 1.0};
  const double goal[2] = {0.0, 0.0};
  const double inv_sigma[1] = {1.0};
  double action[1], next_useq[3], stats[4];
  mppi_pm_solve(A, Bm, x0, useq, eps, Q, goal, inv_sigma, 1, 3, 2, 1, 1.0,
                0.0, 1.0, 0, action, next_useq, stats);
  CHECK_NEAR(action[0], 1.5, 1e-12);       // u0 + eps0
  CHECK_NEAR(next_useq[0], 1.5, 1e-12);    // u1 + eps1
  CHECK_NEAR(next_useq[1], 3.25, 1e-12);   // u2 + eps2
  CHECK_NEAR(next_useq[2], 0.0, 1e-12);    // zero fill
  return 0;
}

int main() {
  int fails = 0;
  fails += test_update_softmax();
  fails += test_pm_rollout_deterministic();
  fails += test_solve_shift();
  if (fails) {
    std::fprintf(stderr, "%d native test(s) FAILED\n", fails);
    return 1;
  }
  std::printf("all native mppi_core tests passed\n");
  return 0;
}
