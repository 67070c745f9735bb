// Native host-side runtime for libwave_tpu.
//
// The reference is a native C++ library throughout (wave_utils CSV I/O,
// PCL's PCD reader, kd-trees inside pcl::IterativeClosestPoint). The TPU
// framework keeps its compute on device (XLA/Pallas), but host-side work —
// dataset decoding, exact-answer oracles used by the test-suite, feeding —
// stays native here (SURVEY.md §7: "plus a small C++ host extension layer").
//
// Exposed as a plain C ABI consumed through ctypes (no pybind11 in the
// image). All functions are thread-parallel where it matters.

#include <atomic>
#include <cctype>
#include <cfloat>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <functional>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

int hardware_threads() {
    unsigned n = std::thread::hardware_concurrency();
    return n == 0 ? 2 : static_cast<int>(n);
}

void parallel_for(int64_t n, const std::function<void(int64_t, int64_t)> &fn) {
    int nt = hardware_threads();
    if (n < 1024 || nt <= 1) {
        fn(0, n);
        return;
    }
    std::vector<std::thread> threads;
    int64_t chunk = (n + nt - 1) / nt;
    for (int t = 0; t < nt; ++t) {
        int64_t lo = t * chunk;
        int64_t hi = std::min(n, lo + chunk);
        if (lo >= hi) break;
        threads.emplace_back([=, &fn] { fn(lo, hi); });
    }
    for (auto &th : threads) th.join();
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// Exact k-nearest-neighbour oracle (reference: PCL kd-trees inside ICP).
// Used by tests to validate the device-side chunked-matmul kNN, and as a
// host fallback. Brute force but multi-threaded + blocked: exactness is the
// point (kd-tree approximations would defeat the oracle role).
// ---------------------------------------------------------------------------
int wave_knn_exact(const float *query, int64_t n_query,
                   const float *target, int64_t n_target,
                   int k, int32_t *out_idx, float *out_dist2) {
    if (k <= 0 || n_target <= 0) return -1;
    parallel_for(n_query, [&](int64_t lo, int64_t hi) {
        std::vector<std::pair<float, int32_t>> best;
        for (int64_t i = lo; i < hi; ++i) {
            const float qx = query[3 * i], qy = query[3 * i + 1],
                        qz = query[3 * i + 2];
            best.clear();
            best.reserve(k + 1);
            float worst = FLT_MAX;
            for (int64_t j = 0; j < n_target; ++j) {
                const float dx = target[3 * j] - qx;
                const float dy = target[3 * j + 1] - qy;
                const float dz = target[3 * j + 2] - qz;
                const float d2 = dx * dx + dy * dy + dz * dz;
                if (d2 >= worst && (int)best.size() >= k) continue;
                // insertion sort into the k-best list
                auto it = best.begin();
                while (it != best.end() && it->first <= d2) ++it;
                best.insert(it, {d2, (int32_t)j});
                if ((int)best.size() > k) best.pop_back();
                if ((int)best.size() == k) worst = best.back().first;
            }
            for (int kk = 0; kk < k; ++kk) {
                if (kk < (int)best.size()) {
                    out_idx[i * k + kk] = best[kk].second;
                    out_dist2[i * k + kk] = best[kk].first;
                } else {
                    out_idx[i * k + kk] = -1;
                    out_dist2[i * k + kk] = FLT_MAX;
                }
            }
        }
    });
    return 0;
}

// ---------------------------------------------------------------------------
// Exact voxel-grid downsample oracle (reference: pcl::VoxelGrid). Hash-map
// based, collision-free (unlike the device spatial hash) — the ground truth
// the device filter is validated against.
// Returns the number of voxels written (<= n_points).
// ---------------------------------------------------------------------------
int64_t wave_voxel_downsample(const float *points, int64_t n_points,
                              float leaf, float *out_points) {
    struct Key {
        int64_t x, y, z;
        bool operator==(const Key &o) const {
            return x == o.x && y == o.y && z == o.z;
        }
    };
    struct KeyHash {
        size_t operator()(const Key &k) const {
            return (size_t)(k.x * 73856093LL ^ k.y * 19349663LL ^
                            k.z * 83492791LL);
        }
    };
    struct Acc {
        double sx = 0, sy = 0, sz = 0;
        int64_t n = 0;
    };
    std::unordered_map<Key, Acc, KeyHash> cells;
    cells.reserve(n_points);
    for (int64_t i = 0; i < n_points; ++i) {
        Key key{(int64_t)std::floor(points[3 * i] / leaf),
                (int64_t)std::floor(points[3 * i + 1] / leaf),
                (int64_t)std::floor(points[3 * i + 2] / leaf)};
        Acc &a = cells[key];
        a.sx += points[3 * i];
        a.sy += points[3 * i + 1];
        a.sz += points[3 * i + 2];
        a.n += 1;
    }
    int64_t m = 0;
    for (const auto &kv : cells) {
        out_points[3 * m] = (float)(kv.second.sx / kv.second.n);
        out_points[3 * m + 1] = (float)(kv.second.sy / kv.second.n);
        out_points[3 * m + 2] = (float)(kv.second.sz / kv.second.n);
        ++m;
    }
    return m;
}

// ---------------------------------------------------------------------------
// PCD reader (reference: pcl::io::loadPCDFile for testscan.pcd fixtures).
// Supports ascii and binary encodings with x/y/z float32 fields (the layout
// lidar fixtures use). Two-call protocol: first call with out=nullptr
// returns the point count; second call fills the buffer.
// ---------------------------------------------------------------------------
int64_t wave_load_pcd(const char *path, float *out, int64_t capacity) {
    FILE *f = std::fopen(path, "rb");
    if (!f) return -1;
    char line[1024];
    int64_t count = -1;
    bool binary = false;
    int n_fields = 0;
    int xi = -1, yi = -1, zi = -1;
    std::vector<int> sizes;
    long data_offset = -1;
    while (std::fgets(line, sizeof(line), f)) {
        if (std::strncmp(line, "FIELDS", 6) == 0) {
            char *tok = std::strtok(line + 6, " \t\r\n");
            int idx = 0;
            while (tok) {
                if (std::strcmp(tok, "x") == 0) xi = idx;
                if (std::strcmp(tok, "y") == 0) yi = idx;
                if (std::strcmp(tok, "z") == 0) zi = idx;
                ++idx;
                tok = std::strtok(nullptr, " \t\r\n");
            }
            n_fields = idx;
        } else if (std::strncmp(line, "SIZE", 4) == 0) {
            char *tok = std::strtok(line + 4, " \t\r\n");
            while (tok) {
                sizes.push_back(std::atoi(tok));
                tok = std::strtok(nullptr, " \t\r\n");
            }
        } else if (std::strncmp(line, "POINTS", 6) == 0) {
            count = std::atoll(line + 6);
        } else if (std::strncmp(line, "DATA", 4) == 0) {
            binary = std::strstr(line, "binary") != nullptr;
            data_offset = std::ftell(f);
            break;
        }
    }
    if (count < 0 || xi < 0 || yi < 0 || zi < 0 || data_offset < 0) {
        std::fclose(f);
        return -2;
    }
    if (out == nullptr) {
        std::fclose(f);
        return count;
    }
    if (capacity < count) {
        std::fclose(f);
        return -3;
    }
    if (binary) {
        int stride = 0;
        std::vector<int> offs(n_fields, 0);
        for (int i = 0; i < n_fields; ++i) {
            offs[i] = stride;
            stride += (i < (int)sizes.size()) ? sizes[i] : 4;
        }
        std::vector<char> buf(stride);
        for (int64_t i = 0; i < count; ++i) {
            if (std::fread(buf.data(), 1, stride, f) != (size_t)stride) {
                std::fclose(f);
                return -4;
            }
            std::memcpy(&out[3 * i], buf.data() + offs[xi], 4);
            std::memcpy(&out[3 * i + 1], buf.data() + offs[yi], 4);
            std::memcpy(&out[3 * i + 2], buf.data() + offs[zi], 4);
        }
    } else {
        std::vector<float> vals(n_fields);
        for (int64_t i = 0; i < count; ++i) {
            for (int fo = 0; fo < n_fields; ++fo) {
                if (std::fscanf(f, "%f", &vals[fo]) != 1) {
                    std::fclose(f);
                    return -4;
                }
            }
            out[3 * i] = vals[xi];
            out[3 * i + 1] = vals[yi];
            out[3 * i + 2] = vals[zi];
        }
    }
    std::fclose(f);
    return count;
}

// ---------------------------------------------------------------------------
// Fast numeric CSV reader (reference: wave_utils csv2mat, and the EuRoC
// sensor logs' timestamped CSV layout). Skips '#' comment/header lines.
// Two-call protocol like wave_load_pcd; returns rows; *out_cols receives the
// column count.
// ---------------------------------------------------------------------------
int64_t wave_load_csv(const char *path, double *out, int64_t capacity,
                      int32_t *out_cols) {
    FILE *f = std::fopen(path, "rb");
    if (!f) return -1;
    std::fseek(f, 0, SEEK_END);
    long size = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    std::vector<char> buf(size + 1);
    if (std::fread(buf.data(), 1, size, f) != (size_t)size) {
        std::fclose(f);
        return -4;
    }
    std::fclose(f);
    buf[size] = '\0';

    // two-call protocol: with out == nullptr, count rows and report cols
    // through *out_cols; with out != nullptr, *out_cols carries the column
    // count from the first call.
    const int fill_cols = (out != nullptr && out_cols) ? *out_cols : 0;
    int64_t rows = 0;
    int cols = 0;
    char *p = buf.data();
    char *end = buf.data() + size;
    while (p < end) {
        while (p < end && (*p == '\n' || *p == '\r')) ++p;
        if (p >= end) break;
        if (*p == '#' || std::isalpha((unsigned char)*p)) {
            while (p < end && *p != '\n') ++p;
            continue;
        }
        int c = 0;
        while (p < end && *p != '\n') {
            char *next = nullptr;
            double v = std::strtod(p, &next);
            if (next == p) {
                ++p;
                continue;
            }
            if (out && fill_cols > 0 && c < fill_cols &&
                rows * fill_cols + c < capacity)
                out[rows * fill_cols + c] = v;
            ++c;
            p = next;
            while (p < end && (*p == ',' || *p == ' ' || *p == '\t')) ++p;
        }
        if (c > 0) {
            if (cols == 0) cols = c;
            ++rows;
        }
    }
    if (out == nullptr && out_cols) *out_cols = cols;
    return rows;
}

}  // extern "C"
