// Standalone timing harness for the native host index (pcindex.cpp).
// Mirrors benches/bench_ops.py single_query_bench: 100K (and 1M) uniform
// points in a 10-unit cube, 2000 queries, k=10 KNN + radius 0.5.
//
// Build/run:
//   g++ -O3 -march=native -std=c++17 -I pointclouds_tpu/native \
//       scripts/bench_pcindex.cpp -o /tmp/bench_pcindex && /tmp/bench_pcindex

#include "../pointclouds_tpu/native/pcindex.cpp"

#include <chrono>
#include <cstdio>
#include <random>

static double now_us() {
    using namespace std::chrono;
    return duration_cast<nanoseconds>(
               steady_clock::now().time_since_epoch())
               .count() /
           1e3;
}

// Two workloads:
//  - "ref": the reference's own Criterion methodology (benches/
//    bench_kdtree.rs): box 0..100, ONE fixed query at the center,
//    radius 0.1 (→ ~0 hits), k=10 — warm-cache repeat of one query.
//  - "rand": our harder secondary workload: box 0..10 (dense), 2000
//    random queries (cold cache), radius 0.5 (~52/524 hits).
static void bench(int64_t n, int64_t nq, double box, double radius,
                  bool fixed_query, const char* tag) {
    std::mt19937_64 rng(9);
    std::uniform_real_distribution<double> u(0.0, box);
    std::vector<float> xyz(n * 3);
    std::vector<uint8_t> valid(n, 1);
    for (int64_t i = 0; i < n * 3; ++i) xyz[i] = (float)u(rng);
    std::vector<double> qs(nq * 3);
    if (fixed_query)
        for (int64_t i = 0; i < nq; ++i) {
            qs[i * 3] = box / 2;
            qs[i * 3 + 1] = box / 2;
            qs[i * 3 + 2] = box / 2;
        }
    else
        for (int64_t i = 0; i < nq * 3; ++i) qs[i] = u(rng);

    double t0 = now_us();
    void* h = pcidx_build(xyz.data(), valid.data(), n);
    double build_ms = (now_us() - t0) / 1e3;

    int64_t rows[64];
    double dists[64];
    volatile int64_t sink = 0;
    // warm
    for (int64_t i = 0; i < nq; ++i)
        sink += pcidx_knn(h, qs.data() + i * 3, 10, rows, dists);
    t0 = now_us();
    for (int64_t i = 0; i < nq; ++i)
        sink += pcidx_knn(h, qs.data() + i * 3, 10, rows, dists);
    double knn_us = (now_us() - t0) / nq;

    std::vector<int64_t> rbuf(4096);
    for (int64_t i = 0; i < nq; ++i)
        sink += pcidx_radius(h, qs.data() + i * 3, radius, rbuf.data(), 4096);
    t0 = now_us();
    for (int64_t i = 0; i < nq; ++i)
        sink += pcidx_radius(h, qs.data() + i * 3, radius, rbuf.data(), 4096);
    double rad_us = (now_us() - t0) / nq;

    printf(
        "%-5s n=%8lld  build=%8.2f ms  knn k=10 = %6.3f us/q  "
        "radius(%.1f) = %6.3f us/q  (sink %lld)\n",
        tag, (long long)n, build_ms, knn_us, radius, rad_us,
        (long long)sink);
    pcidx_free(h);
}

int main() {
    bench(100000, 20000, 100.0, 0.1, true, "ref");
    bench(1000000, 20000, 100.0, 0.1, true, "ref");
    bench(100000, 2000, 10.0, 0.5, false, "rand");
    bench(1000000, 2000, 10.0, 0.5, false, "rand");
    return 0;
}
