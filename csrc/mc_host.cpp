// mc_host.cpp — native multithreaded CPU Monte Carlo engine.
//
// The framework's native host runtime: the role of the reference's serial C
// engine MonteCarloHost.c (CPU baseline + independent cross-check of the
// accelerator results), rebuilt as modern C++17 with counter-based RNG and
// std::thread data parallelism over paths.  Deliberately shares NO code with
// the JAX/Pallas path: agreement between the two is a genuine
// independent-implementation test (the reference's own methodology,
// basketOpt.cu:122).
//
// Exposed via a C ABI (loaded with ctypes from mctpu/native.py).
//
// Estimator semantics match the reference (MonteCarloHost.c:221-229):
//   price = discount * sum/n,  empstd = sqrt((n*sum2 - sum^2)/(n(n-1))),
//   ci = 1.96 * empstd / sqrt(n); CVA mean is NOT discounted.

#include <array>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Counter-based RNG: splitmix64-seeded xoshiro256++, one stream per chunk.
// ---------------------------------------------------------------------------

static inline uint64_t splitmix64(uint64_t& x) {
    uint64_t z = (x += 0x9E3779B97F4A7C15ULL);
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
    return z ^ (z >> 31);
}

struct Xoshiro256pp {
    uint64_t s[4];
    explicit Xoshiro256pp(uint64_t seed) {
        uint64_t sm = seed;
        for (auto& w : s) w = splitmix64(sm);
    }
    static inline uint64_t rotl(uint64_t x, int k) {
        return (x << k) | (x >> (64 - k));
    }
    inline uint64_t next() {
        const uint64_t result = rotl(s[0] + s[3], 23) + s[0];
        const uint64_t t = s[1] << 17;
        s[2] ^= s[0]; s[3] ^= s[1]; s[1] ^= s[2]; s[0] ^= s[3]; s[2] ^= t;
        s[3] = rotl(s[3], 45);
        return result;
    }
    // Uniform in (0, 1]: top 53 bits, offset so log() is finite.
    inline double uniform() {
        return static_cast<double>((next() >> 11) + 1) * 0x1.0p-53;
    }
};

// Box-Muller with a cached spare (the reference host RNG is also
// Box-Muller, MonteCarloHost.c:118-122).
struct NormalGen {
    Xoshiro256pp rng;
    double spare = 0.0;
    bool has_spare = false;
    explicit NormalGen(uint64_t seed) : rng(seed) {}
    inline double next() {
        if (has_spare) { has_spare = false; return spare; }
        double u1 = rng.uniform();
        double u2 = rng.uniform();
        double r = std::sqrt(-2.0 * std::log(u1));
        double th = 6.283185307179586476925286766559 * u2;
        spare = r * std::sin(th);
        has_spare = true;
        return r * std::cos(th);
    }
};

// ---------------------------------------------------------------------------
// Math: normal CDF (erfc-based, full double accuracy) + Black-Scholes call.
// ---------------------------------------------------------------------------

static inline double norm_cdf(double d) {
    return 0.5 * std::erfc(-d * 0.70710678118654752440);
}

static inline double bs_call(double s, double k, double r, double v, double t) {
    if (t <= 1e-12) return s > k ? s - k : 0.0;
    const double sq = v * std::sqrt(t);
    const double d1 = (std::log(s / k) + (r + 0.5 * v * v) * t) / sq;
    return s * norm_cdf(d1) - k * std::exp(-r * t) * norm_cdf(d1 - sq);
}

// ---------------------------------------------------------------------------
// Parallel accumulation framework: paths split into chunks, one RNG stream
// per chunk (chunk id folds into the seed, so results are independent of the
// thread count — the same shard-invariance contract as the TPU engine).
// ---------------------------------------------------------------------------

struct Sums { double s = 0.0, s2 = 0.0; };

template <typename PathFn>
static Sums run_parallel(int64_t n, uint64_t seed, const PathFn& path_value) {
    const int64_t kChunk = 1 << 16;
    const int64_t n_chunks = (n + kChunk - 1) / kChunk;
    unsigned hw = std::thread::hardware_concurrency();
    const unsigned n_threads =
        hw ? std::min<int64_t>(hw, n_chunks) : 1;

    std::vector<Sums> per_thread(n_threads);
    std::atomic<int64_t> next_chunk{0};
    auto worker = [&](unsigned tid) {
        Sums local;
        for (;;) {
            const int64_t c = next_chunk.fetch_add(1);
            if (c >= n_chunks) break;
            uint64_t mix = seed;
            splitmix64(mix);                     // decorrelate from raw seed
            NormalGen gen(mix ^ (0xA5A5A5A5DEADBEEFULL + 0x9E3779B9ULL * c));
            const int64_t lo = c * kChunk;
            const int64_t hi = std::min(lo + kChunk, n);
            // Per-chunk compensated accumulation (Neumaier).
            double s = 0, cs = 0, s2 = 0, cs2 = 0;
            for (int64_t i = lo; i < hi; ++i) {
                const double p = path_value(gen);
                double t1 = s + p;
                cs += std::abs(s) >= std::abs(p) ? (s - t1) + p : (p - t1) + s;
                s = t1;
                const double q = p * p;
                double t2 = s2 + q;
                cs2 += std::abs(s2) >= std::abs(q) ? (s2 - t2) + q : (q - t2) + s2;
                s2 = t2;
            }
            local.s += s + cs;
            local.s2 += s2 + cs2;
        }
        per_thread[tid] = local;
    };

    std::vector<std::thread> threads;
    threads.reserve(n_threads);
    for (unsigned t = 0; t < n_threads; ++t) threads.emplace_back(worker, t);
    for (auto& th : threads) th.join();

    Sums total;
    for (const auto& p : per_thread) { total.s += p.s; total.s2 += p.s2; }
    return total;
}

// Multi-output variant: path_fn(gen, vals) fills K integrands per path;
// (sum, sum^2) pairs accumulate per output with the same per-chunk Neumaier
// compensation and chunk-keyed streams (thread-count invariant).
template <int K, typename PathFn>
static void run_parallel_vec(int64_t n, uint64_t seed,
                             const PathFn& path_fn, double* s_out,
                             double* s2_out) {
    const int64_t kChunk = 1 << 16;
    const int64_t n_chunks = (n + kChunk - 1) / kChunk;
    unsigned hw = std::thread::hardware_concurrency();
    const unsigned n_threads = hw ? std::min<int64_t>(hw, n_chunks) : 1;

    std::vector<std::array<double, 2 * K>> per_thread(
        n_threads, std::array<double, 2 * K>{});
    std::atomic<int64_t> next_chunk{0};
    auto worker = [&](unsigned tid) {
        std::array<double, 2 * K> local{};
        for (;;) {
            const int64_t c = next_chunk.fetch_add(1);
            if (c >= n_chunks) break;
            uint64_t mix = seed;
            splitmix64(mix);
            NormalGen gen(mix ^ (0xA5A5A5A5DEADBEEFULL + 0x9E3779B9ULL * c));
            const int64_t lo = c * kChunk;
            const int64_t hi = std::min(lo + kChunk, n);
            double s[K] = {0}, cs[K] = {0}, s2[K] = {0}, cs2[K] = {0};
            for (int64_t i = lo; i < hi; ++i) {
                double vals[K];
                path_fn(gen, vals);
                for (int j = 0; j < K; ++j) {
                    const double p = vals[j];
                    double t1 = s[j] + p;
                    cs[j] += std::abs(s[j]) >= std::abs(p)
                        ? (s[j] - t1) + p : (p - t1) + s[j];
                    s[j] = t1;
                    const double q = p * p;
                    double t2 = s2[j] + q;
                    cs2[j] += std::abs(s2[j]) >= std::abs(q)
                        ? (s2[j] - t2) + q : (q - t2) + s2[j];
                    s2[j] = t2;
                }
            }
            for (int j = 0; j < K; ++j) {
                local[j] += s[j] + cs[j];
                local[K + j] += s2[j] + cs2[j];
            }
        }
        per_thread[tid] = local;
    };

    std::vector<std::thread> threads;
    threads.reserve(n_threads);
    for (unsigned t = 0; t < n_threads; ++t) threads.emplace_back(worker, t);
    for (auto& th : threads) th.join();

    for (int j = 0; j < K; ++j) { s_out[j] = 0; s2_out[j] = 0; }
    for (const auto& p : per_thread)
        for (int j = 0; j < K; ++j) {
            s_out[j] += p[j];
            s2_out[j] += p[K + j];
        }
}

// Runtime-width variant of run_parallel_vec for the portfolio ("book")
// engine, where the instrument count m is a runtime value.  Same
// per-chunk Neumaier compensation and chunk-keyed streams
// (thread-count invariant).
template <typename PathFn>
static void run_parallel_dyn(int64_t n, uint64_t seed, int m,
                             const PathFn& path_fn, double* s_out,
                             double* s2_out) {
    const int64_t kChunk = 1 << 16;
    const int64_t n_chunks = (n + kChunk - 1) / kChunk;
    unsigned hw = std::thread::hardware_concurrency();
    const unsigned n_threads = hw ? std::min<int64_t>(hw, n_chunks) : 1;

    std::vector<std::vector<double>> per_thread(
        n_threads, std::vector<double>(2 * m, 0.0));
    std::atomic<int64_t> next_chunk{0};
    auto worker = [&](unsigned tid) {
        std::vector<double> local(2 * m, 0.0);
        std::vector<double> vals(m), s(m), cs(m), s2(m), cs2(m);
        for (;;) {
            const int64_t c = next_chunk.fetch_add(1);
            if (c >= n_chunks) break;
            uint64_t mix = seed;
            splitmix64(mix);
            NormalGen gen(mix ^ (0xA5A5A5A5DEADBEEFULL + 0x9E3779B9ULL * c));
            const int64_t lo = c * kChunk;
            const int64_t hi = std::min(lo + kChunk, n);
            std::fill(s.begin(), s.end(), 0.0);
            std::fill(cs.begin(), cs.end(), 0.0);
            std::fill(s2.begin(), s2.end(), 0.0);
            std::fill(cs2.begin(), cs2.end(), 0.0);
            for (int64_t i = lo; i < hi; ++i) {
                path_fn(gen, vals.data());
                for (int j = 0; j < m; ++j) {
                    const double p = vals[j];
                    double t1 = s[j] + p;
                    cs[j] += std::abs(s[j]) >= std::abs(p)
                        ? (s[j] - t1) + p : (p - t1) + s[j];
                    s[j] = t1;
                    const double q = p * p;
                    double t2 = s2[j] + q;
                    cs2[j] += std::abs(s2[j]) >= std::abs(q)
                        ? (s2[j] - t2) + q : (q - t2) + s2[j];
                    s2[j] = t2;
                }
            }
            for (int j = 0; j < m; ++j) {
                local[j] += s[j] + cs[j];
                local[m + j] += s2[j] + cs2[j];
            }
        }
        per_thread[tid] = local;
    };

    std::vector<std::thread> threads;
    threads.reserve(n_threads);
    for (unsigned t = 0; t < n_threads; ++t) threads.emplace_back(worker, t);
    for (auto& th : threads) th.join();

    for (int j = 0; j < m; ++j) { s_out[j] = 0; s2_out[j] = 0; }
    for (const auto& p : per_thread)
        for (int j = 0; j < m; ++j) {
            s_out[j] += p[j];
            s2_out[j] += p[m + j];
        }
}

static void finish(const Sums& sums, int64_t n, double discount, double* out) {
    const double nd = static_cast<double>(n);
    const double price = discount * sums.s / nd;
    const double var =
        std::max(nd * sums.s2 - sums.s * sums.s, 0.0) / (nd * (nd - 1.0));
    const double se = discount * std::sqrt(var) / std::sqrt(nd);
    out[0] = price;          // estimator mean (discounted)
    out[1] = 1.96 * se;      // 95% CI half-width, discounted like the mean
    out[2] = se;             //   (package convention; the reference leaves the
                             //    CI undiscounted, MonteCarloKernel.cu:423)
}

}  // namespace

extern "C" {

// out[3] = {price, ci, std_error}; is_put selects max(k - s, 0) payoffs.
void mc_vanilla(double s0, double k, double r, double v, double t,
                int64_t n_paths, uint64_t seed, int antithetic, int is_put,
                double* out) {
    const double mu = (r - 0.5 * v * v) * t;
    const double sig = v * std::sqrt(t);
    const double sign = is_put ? -1.0 : 1.0;
    auto payoff = [&](double z) {
        return std::max(sign * (s0 * std::exp(mu + sig * z) - k), 0.0);
    };
    Sums sums;
    if (antithetic) {
        sums = run_parallel(n_paths / 2, seed, [&](NormalGen& g) {
            const double z = g.next();
            return 0.5 * (payoff(z) + payoff(-z));
        });
        finish(sums, n_paths / 2, std::exp(-r * t), out);
    } else {
        sums = run_parallel(n_paths, seed, [&](NormalGen& g) {
            return payoff(g.next());
        });
        finish(sums, n_paths, std::exp(-r * t), out);
    }
}

// Full vanilla Greeks surface: out[16] = (mean, se) pairs for price,
// delta, vega, rho, theta, gamma, vanna, volga.  Same pathwise and mixed
// pathwise-LR (Stein) integrands as the TPU kernel
// (mctpu/kernels/greeks.py), evaluated in f64 with an independent RNG —
// a genuine cross-implementation check of the estimator formulas.
void mc_vanilla_greeks(double s0, double k, double r, double v, double t,
                       int64_t n_paths, uint64_t seed, int antithetic,
                       int is_put, double* out) {
    const double mu = (r - 0.5 * v * v) * t;
    const double sqt = std::sqrt(t);
    const double sig = v * sqt;
    const double cg = k / (s0 * s0 * sig);
    const double cvn = k / (s0 * sig);
    const double cvg = k / sig;
    const double disc = std::exp(-r * t);
    constexpr int K = 8;
    auto quants = [&](double z, double* q) {
        const double st = s0 * std::exp(mu + sig * z);
        double ind, p;
        if (is_put) {
            ind = st < k ? -1.0 : 0.0;
            p = std::max(k - st, 0.0);
        } else {
            ind = st > k ? 1.0 : 0.0;
            p = std::max(st - k, 0.0);
        }
        const double w = ind * st;
        const double wv = sqt * z - v * t;
        q[0] = p;
        q[1] = w / s0;
        q[2] = w * wv;
        q[3] = t * k * ind;
        q[4] = w * (r - 0.5 * v * v + 0.5 * v * z / sqt) - r * p;
        q[5] = cg * ind * z;
        q[6] = q[1] * wv + cvn * ind * (wv * z - sqt);
        q[7] = w * (wv * wv - t) + cvg * ind * (wv * (wv * z - 2.0 * sqt));
    };
    double s[K], s2[K];
    int64_t n = n_paths;
    if (antithetic) {
        n = n_paths / 2;
        run_parallel_vec<K>(n, seed, [&](NormalGen& g, double* vals) {
            const double z = g.next();
            double qa[K], qb[K];
            quants(z, qa);
            quants(-z, qb);
            for (int j = 0; j < K; ++j) vals[j] = 0.5 * (qa[j] + qb[j]);
        }, s, s2);
    } else {
        run_parallel_vec<K>(n, seed, [&](NormalGen& g, double* vals) {
            quants(g.next(), vals);
        }, s, s2);
    }
    const double nd = static_cast<double>(n);
    for (int j = 0; j < K; ++j) {
        const double var =
            std::max(nd * s2[j] - s[j] * s[j], 0.0) / (nd * (nd - 1.0));
        out[2 * j] = disc * s[j] / nd;
        out[2 * j + 1] = disc * std::sqrt(var) / std::sqrt(nd);
    }
}

// chol is the row-major lower Cholesky factor (a x a); payoff follows
// basketPayoff (MonteCarloKernel.cu:89-101).
void mc_basket(const double* s0, const double* v, const double* w,
               const double* chol, const double* drift, int32_t a,
               double k, double r, double t,
               int64_t n_paths, uint64_t seed, double* out) {
    if (a > 1024) { out[0] = out[1] = out[2] = -1.0; return; }  // stack guard
    const double sqt = std::sqrt(t);
    std::vector<double> mu(a);
    for (int i = 0; i < a; ++i) mu[i] = (r - 0.5 * v[i] * v[i]) * t;
    Sums sums = run_parallel(n_paths, seed, [&](NormalGen& g) {
        double z[1024];
        for (int i = 0; i < a; ++i) z[i] = g.next();
        double basket = 0.0;
        for (int i = 0; i < a; ++i) {
            double bt = drift[i];
            const double* row = chol + static_cast<size_t>(i) * a;
            for (int j = 0; j <= i; ++j) bt += row[j] * z[j];
            basket += w[i] * s0[i] * std::exp(mu[i] + v[i] * sqt * bt);
        }
        return std::max(basket - k, 0.0);
    });
    finish(sums, n_paths, std::exp(-r * t), out);
}

// Discretely-monitored Asian call: running (log-)average walk per path.
// geometric != 0 averages log-spots (exact closed form exists for testing).
void mc_asian(double s0, double k, double r, double v, double t,
              int32_t n_obs, int32_t geometric, int64_t n_paths,
              uint64_t seed, int antithetic, double* out) {
    if (n_obs < 1 || n_obs > 65536) { out[0] = out[1] = out[2] = -1.0; return; }
    const double dt = t / n_obs;
    const double mu = (r - 0.5 * v * v) * dt;
    const double sig = v * std::sqrt(dt);
    auto walk = [&](const double* z, double sign) {
        double s = s0, acc = 0.0;
        for (int j = 0; j < n_obs; ++j) {
            s *= std::exp(mu + sig * sign * z[j]);
            acc += geometric ? std::log(s) : s;
        }
        const double avg = geometric ? std::exp(acc / n_obs) : acc / n_obs;
        return std::max(avg - k, 0.0);
    };
    const int64_t units = antithetic ? n_paths / 2 : n_paths;
    Sums sums = run_parallel(units, seed, [&](NormalGen& g) {
        double z[4096];
        // n_obs > 4096 uses a per-thread heap buffer, allocated once per
        // thread rather than once per path (the lambda runs per unit).
        static thread_local std::vector<double> heap;
        double* zp = z;
        if (n_obs > 4096) {
            if (heap.size() < static_cast<size_t>(n_obs)) heap.resize(n_obs);
            zp = heap.data();
        }
        for (int j = 0; j < n_obs; ++j) zp[j] = g.next();
        if (!antithetic) return walk(zp, 1.0);
        return 0.5 * (walk(zp, 1.0) + walk(zp, -1.0));
    });
    finish(sums, units, std::exp(-r * t), out);
}

// Discretely-monitored knock-out barrier call; up != 0 -> up-and-out.
void mc_barrier(double s0, double k, double r, double v, double t,
                double barrier, int32_t n_obs, int32_t up,
                int64_t n_paths, uint64_t seed, double* out) {
    if (n_obs < 1 || n_obs > 1 << 20) { out[0] = out[1] = out[2] = -1.0; return; }
    const double dt = t / n_obs;
    const double mu = (r - 0.5 * v * v) * dt;
    const double sig = v * std::sqrt(dt);
    Sums sums = run_parallel(n_paths, seed, [&](NormalGen& g) {
        double s = s0;
        bool alive = true;
        for (int j = 0; j < n_obs; ++j) {
            s *= std::exp(mu + sig * g.next());
            alive &= up ? (s < barrier) : (s > barrier);
        }
        return alive ? std::max(s - k, 0.0) : 0.0;
    });
    finish(sums, n_paths, std::exp(-r * t), out);
}

// CVA of a call: grid walk per path (cvaCallOptMC, MonteCarloKernel.cu:242-263)
// with the normalized final-node semantics (intrinsic exposure at t == T).
// ee_profile (length n_grid, may be null) receives E[exposure] per node.
// NOTE: undiscounted mean, as in the reference (MonteCarloKernel.cu:467).
void mc_cva(double s0, double k, double r, double v, double t,
            double intensity, double lgd, int32_t n_grid,
            int64_t n_paths, uint64_t seed, double* out, double* ee_profile) {
    const double dt = t / n_grid;
    const double mu = (r - 0.5 * v * v) * dt;
    const double sig = v * std::sqrt(dt);
    std::vector<double> dp(n_grid), t_rem(n_grid);
    for (int j = 1; j <= n_grid; ++j) {
        dp[j - 1] = std::exp(-dt * (j - 1) * intensity)
                  - std::exp(-dt * j * intensity);
        t_rem[j - 1] = t * (n_grid - j) / n_grid;
    }
    Sums sums = run_parallel(n_paths, seed, [&](NormalGen& g) {
        double s = s0, acc = 0.0;
        for (int j = 0; j < n_grid; ++j) {
            s *= std::exp(mu + sig * g.next());
            const double ee = t_rem[j] > 0.0 ? bs_call(s, k, r, v, t_rem[j])
                                             : std::max(s - k, 0.0);
            acc += dp[j] * ee;
        }
        return lgd * acc;
    });
    finish(sums, n_paths, 1.0, out);

    if (ee_profile) {
        // Expected-exposure profile on its own (independent-stream, serial)
        // pass with a down-sampled path count — profile accuracy needs far
        // fewer paths than the CVA scalar.
        const int64_t n_prof = std::min<int64_t>(n_paths, 1 << 16);
        std::vector<double> prof(n_grid, 0.0);
        uint64_t mix = seed ^ 0xC0FFEE123456789ULL;
        splitmix64(mix);
        NormalGen g(mix);
        for (int64_t p = 0; p < n_prof; ++p) {
            double s = s0;
            for (int j = 0; j < n_grid; ++j) {
                s *= std::exp(mu + sig * g.next());
                prof[j] += t_rem[j] > 0.0 ? bs_call(s, k, r, v, t_rem[j])
                                          : std::max(s - k, 0.0);
            }
        }
        for (int j = 0; j < n_grid; ++j)
            ee_profile[j] = prof[j] / static_cast<double>(n_prof);
    }
}

// Golub-Van Loan Cholesky with the PSD pivot guard (Chol,
// MonteCarloHost.c:91-106) so singular correlation matrices factorize.
// Portfolio ("book") of m European options priced on SHARED normals —
// the f64 native twin of the TPU book kernel (mctpu/kernels/book.py):
// every instrument sees the same z per path, so marks are comonotone
// across the book.  sgn[i] = +1 call / -1 put.  out[3*m] holds
// (price, ci, se) per instrument, each discounted by its own
// exp(-r_i t_i) (estimator semantics per MonteCarloKernel.cu:413-423).
void mc_book(const double* s0, const double* k, const double* r,
             const double* v, const double* t, const double* sgn,
             int32_t m, int64_t n_paths, uint64_t seed, int antithetic,
             double* out) {
    if (m < 1 || m > 4096) {
        for (int i = 0; i < 3 * std::max<int32_t>(m, 0); ++i) out[i] = -1.0;
        return;
    }
    std::vector<double> mu(m), sig(m);
    for (int i = 0; i < m; ++i) {
        mu[i] = (r[i] - 0.5 * v[i] * v[i]) * t[i];
        sig[i] = v[i] * std::sqrt(t[i]);
    }
    auto pay = [&](int i, double z) {
        return std::max(
            sgn[i] * (s0[i] * std::exp(mu[i] + sig[i] * z) - k[i]), 0.0);
    };
    const int64_t n_units = antithetic ? n_paths / 2 : n_paths;
    std::vector<double> s(m), s2(m);
    if (antithetic) {
        run_parallel_dyn(n_units, seed, m,
                         [&](NormalGen& g, double* vals) {
                             const double z = g.next();
                             for (int i = 0; i < m; ++i)
                                 vals[i] = 0.5 * (pay(i, z) + pay(i, -z));
                         }, s.data(), s2.data());
    } else {
        run_parallel_dyn(n_units, seed, m,
                         [&](NormalGen& g, double* vals) {
                             const double z = g.next();
                             for (int i = 0; i < m; ++i) vals[i] = pay(i, z);
                         }, s.data(), s2.data());
    }
    for (int i = 0; i < m; ++i) {
        Sums sums; sums.s = s[i]; sums.s2 = s2[i];
        finish(sums, n_units, std::exp(-r[i] * t[i]), out + 3 * i);
    }
}

void mc_cholesky(const double* c, int32_t n, double* a) {
    std::memset(a, 0, sizeof(double) * n * n);
    std::vector<double> vcol(n);
    // Relative pivot tolerance: an exact > 0 test divides by rounding noise
    // for singular matrices and produces a garbage column.
    double max_diag = 0.0;
    for (int j = 0; j < n; ++j) max_diag = std::max(max_diag, std::abs(c[j * n + j]));
    const double tol = n * 2.220446049250313e-16 * max_diag;
    for (int j = 0; j < n; ++j) {
        for (int i = j; i < n; ++i) {
            double v = c[i * n + j];
            for (int k2 = 0; k2 < j; ++k2)
                v -= a[j * n + k2] * a[i * n + k2];
            vcol[i] = v;
        }
        if (vcol[j] > tol) {
            const double inv = 1.0 / std::sqrt(vcol[j]);
            for (int i = j; i < n; ++i) a[i * n + j] = vcol[i] * inv;
        }
    }
}

// Closed-form Black-Scholes call (host_bsCall twin, full double accuracy).
double mc_bs_call(double s, double k, double r, double v, double t) {
    return bs_call(s, k, r, v, t);
}

int32_t mc_abi_version(void) { return 5; }

}  // extern "C"
