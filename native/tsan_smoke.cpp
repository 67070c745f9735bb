// ThreadSanitizer smoke test for the native host layer.
//
// The reference CI compiles with -Werror and runs ctest
// (scripts/ci/ci_run.bash:6-19) but never sanitizes its hand-rolled
// thread code (SURVEY.md §5.2). Here the threaded entry points —
// wave_knn_exact's parallel_for fan-out and concurrent wave_load_csv
// calls — run under TSAN in CI (scripts/ci.sh builds this file with
// -fsanitize=thread; any data race fails the build).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <thread>
#include <vector>

extern "C" {
int wave_knn_exact(const float *query, int64_t n_query, const float *target,
                   int64_t n_target, int k, int32_t *out_idx,
                   float *out_dist2);
int64_t wave_load_csv(const char *path, double *out, int64_t capacity,
                      int32_t *out_cols);
}

int main() {
    // 1) big enough to trigger parallel_for's thread fan-out (>= 1024 rows)
    const int64_t nq = 4096, nt = 2048;
    const int k = 4;
    std::mt19937 rng(7);
    std::uniform_real_distribution<float> u(-10.f, 10.f);
    std::vector<float> q(3 * nq), t(3 * nt);
    for (auto &v : q) v = u(rng);
    for (auto &v : t) v = u(rng);
    std::vector<int32_t> idx(nq * k);
    std::vector<float> d2(nq * k);
    if (wave_knn_exact(q.data(), nq, t.data(), nt, k, idx.data(),
                       d2.data()) != 0) {
        std::fprintf(stderr, "knn failed\n");
        return 1;
    }
    for (int64_t i = 0; i < nq * k; ++i) {
        if (idx[i] < 0 || idx[i] >= nt) {
            std::fprintf(stderr, "bad index\n");
            return 1;
        }
    }

    // 2) concurrent CSV loads (two threads, same file)
    const char *path = "/tmp/wave_tsan_smoke.csv";
    {
        FILE *f = std::fopen(path, "w");
        for (int i = 0; i < 200; ++i)
            std::fprintf(f, "%d,%d.5,%d\n", i, i, 3 * i);
        std::fclose(f);
    }
    auto load = [&] {
        // two-call protocol: count pass, then fill pass
        int32_t cols = 0;
        int64_t rows = wave_load_csv(path, nullptr, 0, &cols);
        if (rows != 200 || cols != 3) std::abort();
        std::vector<double> out(rows * cols);
        int64_t rows2 = wave_load_csv(path, out.data(), rows * cols, &cols);
        if (rows2 != rows || out[3] != 1.0 || out[5] != 3.0) std::abort();
    };
    std::thread a(load), b(load);
    a.join();
    b.join();
    std::remove(path);
    std::printf("tsan smoke ok\n");
    return 0;
}
