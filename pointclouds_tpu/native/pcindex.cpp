// Native build-once / query-many host cell index.
//
// C++ twin of spatial/hostindex.HostCellIndex (same grid construction,
// same exact-f64 distance checks, same ring-expansion coverage bound and
// tie order), serving the single-point KD-tree-style API surface
// (radius_search / knn_indices / small-batch knn) at reference speed:
// the reference amortizes a KD-tree build to ~1.5 us per KNN query
// (ref: crates/spatial/src/kdtree.rs:25-44, BENCHMARKS.md:43-48); the
// pure-numpy index pays ~100-300 us of interpreter overhead per query.
//
// Exactness contract (mirrors the numpy class): candidate coverage by
// construction (ring r covers every point within (r-1)*cell), exact f64
// distances, inclusive radius boundary, distance ties resolved in
// cell-sorted candidate order (a per-candidate sequence number makes the
// (d2, seq) order total — identical to numpy's stable argsort).
//
// Queries iterate cell RUNS in place (no gathered index vector) and keep
// the k best in a bounded max-heap (O(n log k), no full sort). All query
// state is stack-local: ctypes releases the GIL around foreign calls, so
// concurrent queries on one index MUST NOT share scratch (a shared
// vector race corrupts the heap).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

namespace {

struct Cand {
    double d2;
    int64_t seq;  // gather order: makes tie-breaking identical to numpy
    int64_t pos;  // position in the sorted arrays
};

inline bool cand_less(const Cand& a, const Cand& b) {
    return a.d2 < b.d2 || (a.d2 == b.d2 && a.seq < b.seq);
}

struct Index {
    int64_t n = 0;         // input rows (padded capacity)
    int64_t n_valid = 0;   // finite+valid points indexed
    double cell = 1.0;
    double mn[3] = {0, 0, 0};
    int64_t extent[3] = {1, 1, 1};
    std::vector<int64_t> slin;   // sorted cell ids
    std::vector<double> spts;    // [n_valid * 3] sorted coords (f64)
    std::vector<int64_t> srows;  // sorted -> original row
    // Dense cell -> first sorted row table (built when the grid is small
    // enough; empty => fall back to binary search over slin). starts[c]
    // .. starts[c+1] is cell c's run.
    std::vector<int64_t> starts;
};

constexpr int64_t kDenseTableMax = 8 * 1024 * 1024;

inline int64_t lower_bound_lin(const std::vector<int64_t>& v, int64_t key) {
    return std::lower_bound(v.begin(), v.end(), key) - v.begin();
}

inline double d2_at(const Index& ix, int64_t pos, const double q[3]) {
    const double* p = &ix.spts[pos * 3];
    const double dx = p[0] - q[0];
    const double dy = p[1] - q[1];
    const double dz = p[2] - q[2];
    return dx * dx + dy * dy + dz * dz;
}

}  // namespace

extern "C" {

void* pcidx_build(const float* xyz, const uint8_t* valid, int64_t n) {
    auto* ix = new Index();
    ix->n = n;
    std::vector<int64_t> rows;
    rows.reserve(n);
    for (int64_t i = 0; i < n; ++i) {
        const float x = xyz[i * 3], y = xyz[i * 3 + 1], z = xyz[i * 3 + 2];
        if (valid[i] && std::isfinite(x) && std::isfinite(y) &&
            std::isfinite(z))
            rows.push_back(i);
    }
    ix->n_valid = (int64_t)rows.size();
    if (ix->n_valid == 0) return ix;

    std::vector<double> pts(ix->n_valid * 3);
    double mn[3] = {1e300, 1e300, 1e300}, mx[3] = {-1e300, -1e300, -1e300};
    for (int64_t j = 0; j < ix->n_valid; ++j) {
        for (int a = 0; a < 3; ++a) {
            const double v = (double)xyz[rows[j] * 3 + a];
            pts[j * 3 + a] = v;
            mn[a] = std::min(mn[a], v);
            mx[a] = std::max(mx[a], v);
        }
    }
    double span[3], vol = 1.0, span_max = 0.0;
    for (int a = 0; a < 3; ++a) {
        span[a] = std::max(mx[a] - mn[a], 1e-12);
        vol *= span[a];
        span_max = std::max(span_max, span[a]);
        ix->mn[a] = mn[a];
    }
    // Same sizing as the numpy class: ~8 points per cell, BLENDED over
    // 3D / planar / linear density so degenerate clouds (flat planes,
    // collinear scans) never explode the cell count (identical
    // arithmetic to the numpy twin: pow, not cbrt — they differ by ulps
    // and the parity contract is bit-exact).
    double sspan[3] = {span[0], span[1], span[2]};
    std::sort(sspan, sspan + 3);
    const double nv = (double)std::max<int64_t>(ix->n_valid, 1);
    const double c3 = std::pow(vol * 8.0 / nv, 1.0 / 3.0);
    const double c2 = std::sqrt(sspan[1] * sspan[2] * 8.0 / nv);
    const double c1 = sspan[2] * 8.0 / nv;
    const double cell = std::max(c3, std::max(c2, c1));
    ix->cell = std::min(std::max(cell, 1e-9), span_max);

    std::vector<int64_t> lin(ix->n_valid);
    int64_t cmax[3] = {0, 0, 0};
    std::vector<int64_t> c(ix->n_valid * 3);
    for (int64_t j = 0; j < ix->n_valid; ++j) {
        for (int a = 0; a < 3; ++a) {
            int64_t cc =
                (int64_t)std::floor((pts[j * 3 + a] - mn[a]) / ix->cell);
            c[j * 3 + a] = cc;
            cmax[a] = std::max(cmax[a], cc);
        }
    }
    for (int a = 0; a < 3; ++a) ix->extent[a] = cmax[a] + 1;
    for (int64_t j = 0; j < ix->n_valid; ++j)
        lin[j] = (c[j * 3] * ix->extent[1] + c[j * 3 + 1]) * ix->extent[2] +
                 c[j * 3 + 2];

    std::vector<int64_t> order(ix->n_valid);
    std::iota(order.begin(), order.end(), 0);
    std::stable_sort(order.begin(), order.end(),
                     [&](int64_t a, int64_t b) { return lin[a] < lin[b]; });
    ix->slin.resize(ix->n_valid);
    ix->spts.resize(ix->n_valid * 3);
    ix->srows.resize(ix->n_valid);
    for (int64_t j = 0; j < ix->n_valid; ++j) {
        const int64_t o = order[j];
        ix->slin[j] = lin[o];
        ix->srows[j] = rows[o];
        std::memcpy(&ix->spts[j * 3], &pts[o * 3], 3 * sizeof(double));
    }
    const int64_t ncells =
        ix->extent[0] * ix->extent[1] * ix->extent[2];
    if (ncells <= kDenseTableMax) {
        // Dense run table: two array reads per cell column instead of two
        // binary searches — the searches dominated query time.
        ix->starts.assign(ncells + 1, 0);
        int64_t j = 0;
        for (int64_t c = 0; c < ncells; ++c) {
            ix->starts[c] = j;
            while (j < ix->n_valid && ix->slin[j] == c) ++j;
        }
        ix->starts[ncells] = ix->n_valid;
    }
    return ix;
}

int64_t pcidx_nvalid(void* h) { return ((Index*)h)->n_valid; }

void pcidx_free(void* h) { delete (Index*)h; }

// k nearest of q (ascending distance; ties in cell-sorted candidate
// order, matching numpy's stable argsort). Fills out_rows/out_dists
// (caller sizes them to k); returns the count actually found.
int64_t pcidx_knn(void* h, const double* q, int64_t k, int64_t* out_rows,
                  double* out_dists) {
    Index& ix = *(Index*)h;
    if (ix.n_valid == 0 || k <= 0) return 0;
    // Non-finite query: the radius-doubling certificate below can never
    // terminate (NaN comparisons are all-false), so bail out empty —
    // matching the reference KdTree::knn's NaN-query behavior
    // (crates/spatial/src/kdtree.rs:64-80).
    if (!std::isfinite(q[0]) || !std::isfinite(q[1]) ||
        !std::isfinite(q[2]))
        return 0;

    const int64_t want = std::min<int64_t>(k, ix.n_valid);
    std::vector<Cand> heap;  // stack-local: calls run GIL-released
    heap.reserve((size_t)k);

    // Scan every cell intersecting the ball of radius r around q (exact
    // per-axis AABB window + per-column planar pruning): if the kth
    // candidate distance comes out <= r, the result is provably the true
    // k nearest. One pass keeps the k smallest in a bounded max-heap,
    // ordered by (d2, cell-lex seq) — identical tie order to numpy's
    // stable argsort over cell-gathered candidates (pruned cells cannot
    // hold a tie: their points are strictly farther than r >= kth).
    const int64_t ey = ix.extent[1], ez = ix.extent[2];
    const bool dense = !ix.starts.empty();
    auto scan_ball = [&](double r) {
        heap.clear();
        int64_t seq = 0, seen = 0;
        const double rr2 = r * r;
        int64_t lo[3], hi[3];
        for (int a = 0; a < 3; ++a) {
            lo[a] = std::max<int64_t>(
                (int64_t)std::floor((q[a] - r - ix.mn[a]) / ix.cell), 0);
            hi[a] = std::min<int64_t>(
                (int64_t)std::floor((q[a] + r - ix.mn[a]) / ix.cell),
                ix.extent[a] - 1);
            if (hi[a] < lo[a]) return (int64_t)0;
        }
        for (int64_t x = lo[0]; x <= hi[0]; ++x) {
            const double xlo = ix.mn[0] + (double)x * ix.cell;
            const double dx =
                q[0] < xlo
                    ? xlo - q[0]
                    : (q[0] > xlo + ix.cell ? q[0] - xlo - ix.cell : 0.0);
            for (int64_t y = lo[1]; y <= hi[1]; ++y) {
                const double ylo = ix.mn[1] + (double)y * ix.cell;
                const double dy =
                    q[1] < ylo
                        ? ylo - q[1]
                        : (q[1] > ylo + ix.cell ? q[1] - ylo - ix.cell
                                                : 0.0);
                if (dx * dx + dy * dy > rr2) continue;
                const int64_t base = (x * ey + y) * ez;
                int64_t s, e;
                if (dense) {
                    s = ix.starts[base + lo[2]];
                    e = ix.starts[base + hi[2] + 1];
                } else {
                    s = lower_bound_lin(ix.slin, base + lo[2]);
                    e = lower_bound_lin(ix.slin, base + hi[2] + 1);
                }
                for (int64_t pos = s; pos < e; ++pos, ++seq) {
                    const Cand c{d2_at(ix, pos, q), seq, pos};
                    if ((int64_t)heap.size() < k) {
                        heap.push_back(c);
                        std::push_heap(heap.begin(), heap.end(), cand_less);
                    } else if (cand_less(c, heap.front())) {
                        std::pop_heap(heap.begin(), heap.end(), cand_less);
                        heap.back() = c;
                        std::push_heap(heap.begin(), heap.end(), cand_less);
                    }
                }
                seen += e - s;
            }
        }
        return seen;
    };

    // Density-predicted starting radius; double until certified.
    const double density = (double)ix.n_valid /
                           std::max(1e-12, (double)ix.extent[0] *
                                               ix.extent[1] * ix.extent[2] *
                                               ix.cell * ix.cell * ix.cell);
    const double rk =
        std::cbrt(3.0 * (double)k / (4.0 * 3.14159265358979 *
                                     std::max(density, 1e-12)));
    // Whole-grid distance bound from q (query may sit outside the grid).
    double r_max = 0.0;
    for (int a = 0; a < 3; ++a) {
        const double span = (double)ix.extent[a] * ix.cell;
        const double lo_d = q[a] - ix.mn[a];
        const double hi_d = ix.mn[a] + span - q[a];
        const double far = std::max(std::abs(lo_d), std::abs(hi_d)) + ix.cell;
        r_max += far * far;
    }
    r_max = std::sqrt(r_max);

    for (double r = std::max(rk * 1.1, ix.cell);; r *= 2.0) {
        const bool last = r >= r_max;
        const int64_t seen = scan_ball(std::min(r, r_max));
        if (seen >= want) {
            const double kth =
                std::sqrt(heap.empty() ? 0.0 : heap.front().d2);
            if (kth <= r || last) break;
        } else if (last) {
            break;
        }
    }
    std::sort_heap(heap.begin(), heap.end(), cand_less);
    const int64_t kk = (int64_t)heap.size();
    for (int64_t j = 0; j < kk; ++j) {
        out_rows[j] = ix.srows[heap[j].pos];
        out_dists[j] = std::sqrt(heap[j].d2);
    }
    return kk;
}

// Rows within `radius` (inclusive) of q, ascending original order.
// Returns the total hit count; fills out_rows up to cap (caller retries
// with a larger buffer when count > cap).
int64_t pcidx_radius(void* h, const double* q, double radius,
                     int64_t* out_rows, int64_t cap) {
    Index& ix = *(Index*)h;
    if (ix.n_valid == 0) return 0;
    // Non-finite query or radius: floor(NaN)->int64 below is UB and no
    // point can certify a distance to a NaN center — return empty, like
    // the reference KdTree's NaN-query behavior.
    if (!std::isfinite(q[0]) || !std::isfinite(q[1]) ||
        !std::isfinite(q[2]) || !std::isfinite(radius))
        return 0;
    const double r2 = radius * radius;
    std::vector<int64_t> hits;  // stack-local: calls run GIL-released

    // Exact per-axis window of the ball's AABB (a strictly smaller
    // superset of the true hit set than the numpy path's cubic
    // ceil(r/cell)+1 ring — the exact d2 filter makes results identical),
    // plus per-column planar pruning.
    const int64_t ey = ix.extent[1], ez = ix.extent[2];
    int64_t lo[3], hi[3];
    for (int a = 0; a < 3; ++a) {
        lo[a] = std::max<int64_t>(
            (int64_t)std::floor((q[a] - radius - ix.mn[a]) / ix.cell), 0);
        hi[a] = std::min<int64_t>(
            (int64_t)std::floor((q[a] + radius - ix.mn[a]) / ix.cell),
            ix.extent[a] - 1);
        if (hi[a] < lo[a]) return 0;
    }
    const bool dense = !ix.starts.empty();
    for (int64_t x = lo[0]; x <= hi[0]; ++x) {
        // Min distance from q to the column's x-slab.
        const double xlo = ix.mn[0] + (double)x * ix.cell;
        const double dx =
            q[0] < xlo ? xlo - q[0]
                       : (q[0] > xlo + ix.cell ? q[0] - xlo - ix.cell : 0.0);
        for (int64_t y = lo[1]; y <= hi[1]; ++y) {
            const double ylo = ix.mn[1] + (double)y * ix.cell;
            const double dy =
                q[1] < ylo
                    ? ylo - q[1]
                    : (q[1] > ylo + ix.cell ? q[1] - ylo - ix.cell : 0.0);
            if (dx * dx + dy * dy > r2) continue;
            const int64_t base = (x * ey + y) * ez;
            int64_t s, e;
            if (dense) {
                s = ix.starts[base + lo[2]];
                e = ix.starts[base + hi[2] + 1];
            } else {
                s = lower_bound_lin(ix.slin, base + lo[2]);
                e = lower_bound_lin(ix.slin, base + hi[2] + 1);
            }
            for (int64_t pos = s; pos < e; ++pos)
                if (d2_at(ix, pos, q) <= r2) hits.push_back(ix.srows[pos]);
        }
    }
    std::sort(hits.begin(), hits.end());
    const int64_t cnt = (int64_t)hits.size();
    for (int64_t j = 0; j < std::min(cnt, cap); ++j) out_rows[j] = hits[j];
    return cnt;
}

}  // extern "C"

extern "C" {

// Batched KNN: nq queries in one call (the Python per-query loop costs
// ~40 us/call of interpreter overhead). out_rows/out_dists are [nq * k];
// out_counts[i] = results found for query i (rows beyond it untouched).
void pcidx_knn_batch(void* h, const double* qs, int64_t nq, int64_t k,
                     int64_t* out_rows, double* out_dists,
                     int64_t* out_counts) {
    for (int64_t i = 0; i < nq; ++i)
        out_counts[i] =
            pcidx_knn(h, qs + i * 3, k, out_rows + i * k, out_dists + i * k);
}

}  // extern "C"

extern "C" {

// Cluster epilogue: group rows by component label into the reference's
// canonical order (size desc, then lexicographic — the first member IS
// the label, since labels are component-minimum row ids and members are
// emitted ascending; ref: crates/segmentation/src/euclidean_cluster.rs:
// 169-186). Replaces the Python np.argsort + per-segment list build,
// which dominated the euclidean_cluster API wall time (~37 ms at 131K).
//
// labels: [n] component label per row, each in [0, n).
// out_order: [n] row ids grouped by cluster, ascending within a cluster.
// out_starts: [n + 1] capacity; start offset of cluster c in out_order.
// Returns the number of clusters k passing min_size <= size <= max_size
// (out_starts[0..k] valid, segment c ends at out_starts[c + 1]).
int64_t pcidx_cluster_epilogue(const int32_t* labels, int64_t n,
                               int64_t min_size, int64_t max_size,
                               int32_t* out_order, int64_t* out_starts) {
    std::vector<int64_t> count(n, 0);
    for (int64_t i = 0; i < n; ++i) count[labels[i]]++;
    // Surviving cluster labels, canonical order: size desc, label asc.
    std::vector<int32_t> keep;
    keep.reserve(1024);
    for (int64_t l = 0; l < n; ++l) {
        const int64_t c = count[l];
        if (c >= min_size && c <= max_size && c > 0) keep.push_back((int32_t)l);
    }
    std::sort(keep.begin(), keep.end(), [&](int32_t a, int32_t b) {
        if (count[a] != count[b]) return count[a] > count[b];
        return a < b;
    });
    // Per-label write cursor into out_order (n sentinel = dropped).
    std::vector<int64_t> cursor(n, -1);
    int64_t off = 0;
    const int64_t k = (int64_t)keep.size();
    for (int64_t c = 0; c < k; ++c) {
        out_starts[c] = off;
        cursor[keep[c]] = off;
        off += count[keep[c]];
    }
    out_starts[k] = off;
    // Rows visited ascending: members land ascending within each cluster.
    for (int64_t i = 0; i < n; ++i) {
        int64_t& cur = cursor[labels[i]];
        if (cur >= 0) out_order[cur++] = (int32_t)i;
    }
    return k;
}

}  // extern "C"
