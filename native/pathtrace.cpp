// Native geometry kernels for host-side grid preparation.
//
// Role: the per-cell ray marches that build the star/ISM column-density
// path matrices (the TPU-side consumes them as sparse matrices; see
// rac2d_tpu/ops/columns.py, rebuilding reference src/disk.f90:2559-2729
// calc_Ncol_from_cell_to_point).  Pure Python marching is O(n_cells *
// crossings) with interpreter overhead per step; this C++ version keeps
// grid rebuilds fast at 1e5-cell scale.  Exposed with a plain C ABI for
// ctypes (no pybind11 dependency in the image).
//
// Build: g++ -O3 -march=native -shared -fPIC pathtrace.cpp -o libpathtrace.so

#include <cmath>
#include <cstdint>
#include <algorithm>

namespace {

struct GridIndexView {
    const double* r_edges;    // [n_col + 1]
    const double* z_edges;    // [n_col, max_nz + 1] padded with +inf
    const int32_t* cell_of;   // [n_col, max_nz] -1 padded
    int64_t n_col;
    int64_t max_nz;
    double rmin_dom, rmax_dom, zmax_dom;
};

int64_t locate(const GridIndexView& g, double r, double z_abs) {
    if (r < g.rmin_dom || r > g.rmax_dom || z_abs > g.zmax_dom) return -1;
    // binary search the column
    int64_t lo = 0, hi = g.n_col;           // edges are n_col + 1
    while (hi - lo > 1) {
        int64_t mid = (lo + hi) / 2;
        if (g.r_edges[mid] <= r) lo = mid; else hi = mid;
    }
    int64_t ic = std::min(lo, g.n_col - 1);
    const double* zrow = g.z_edges + ic * (g.max_nz + 1);
    int64_t iz = -1;
    for (int64_t k = 0; k <= g.max_nz; ++k) {
        if (zrow[k] <= z_abs) iz = k; else break;
    }
    if (iz < 0 || iz >= g.max_nz) return -1;
    if (z_abs > zrow[iz + 1]) return -1;
    return g.cell_of[ic * g.max_nz + iz];
}

// first positive exit length of a ray from an annular box (reference
// calc_intersection_ray_cell, src/ray_propagating.f90:365-504)
bool exit_len(double x, double y, double z, double vx, double vy, double vz,
              double rmin, double rmax, double zmin, double zmax,
              double* out) {
    double best = 1e300;
    bool found = false;
    if (std::fabs(vz) > 1e-20) {
        for (double zb : {zmin, zmax}) {
            double L = (zb - z) / vz;
            if (L > 1e-30) {
                double tx = x + vx * L, ty = y + vy * L;
                double rr = tx * tx + ty * ty;
                if (rr >= rmin * rmin && rr <= rmax * rmax && L < best) {
                    best = L; found = true;
                }
            }
        }
    }
    double A = vx * vx + vy * vy;
    if (A > 1e-40) {
        double B = 2.0 * (x * vx + y * vy);
        for (double rb : {rmin, rmax}) {
            double C = x * x + y * y - rb * rb;
            double D = B * B - 4.0 * A * C;
            if (D > 0) {
                double sq = std::sqrt(D);
                for (double L : {(-B + sq) / (2 * A), (-B - sq) / (2 * A)}) {
                    if (L > 1e-30 && L < best) {
                        double zz = z + vz * L;
                        if (zz >= zmin && zz <= zmax) { best = L; found = true; }
                    }
                }
            }
        }
    }
    if (found) *out = best;
    return found;
}

}  // namespace

extern "C" {

// March a ray from each cell toward a target point, accumulating
// (row=cell, col=crossed cell, w=path length) COO entries.
// target: (tx, tz); if to_ism != 0, the target is (cell_center_r, z_far).
// Returns the number of entries written (or -1 if max_entries exceeded).
int64_t trace_path_matrix(
    int64_t n_cells,
    const double* rmin, const double* rmax,
    const double* zmin, const double* zmax,
    const uint8_t* using_mask,
    // grid index
    const double* r_edges, const double* z_edges, const int32_t* cell_of,
    int64_t n_col, int64_t max_nz,
    double rmin_dom, double rmax_dom, double zmax_dom,
    // target
    double tx, double tz, int32_t to_ism,
    // outputs
    int64_t max_entries, int64_t* rows, int64_t* cols, double* w) {
    GridIndexView g{r_edges, z_edges, cell_of, n_col, max_nz,
                    rmin_dom, rmax_dom, zmax_dom};
    int64_t n_out = 0;
    const double sf = 1e-6;
    for (int64_t i = 0; i < n_cells; ++i) {
        if (!using_mask[i]) continue;
        double x0 = rmin[i], x1 = rmax[i], y0 = zmin[i], y1 = zmax[i];
        double dx = x1 - x0, dy = y1 - y0;
        double txx = to_ism ? 0.5 * (x0 + x1) : tx;
        double tzz = to_ism ? zmax_dom * 2.0 : tz;
        // start from the corner closest to the target (reference
        // disk.f90:2577-2616)
        double cands[5][2] = {
            {x0 + dx * sf, y0 + dy * sf}, {x0 + dx * sf, y1 - dy * sf},
            {x1 - dx * sf, y0 + dy * sf}, {x1 - dx * sf, y1 - dy * sf},
            {0.5 * (x0 + x1), 0.5 * (y0 + y1)}};
        double bd = 1e300; int bi = 0;
        for (int k = 0; k < 5; ++k) {
            double d2 = (txx - cands[k][0]) * (txx - cands[k][0])
                      + (tzz - cands[k][1]) * (tzz - cands[k][1]);
            if (d2 < bd) { bd = d2; bi = k; }
        }
        double cx = cands[bi][0], cz = cands[bi][1];
        double vx = txx - cx, vz = tzz - cz;
        double t = std::sqrt(vx * vx + vz * vz);
        if (t < 1e-50) continue;
        vx /= t; vz /= t;
        double x = cx, y = 0.0, z = cz;
        int64_t cur = i;
        int64_t guard = 8 * (n_col + max_nz) + 64;
        for (int64_t s = 0; s < guard && cur >= 0; ++s) {
            double rm = rmin[cur], rM = rmax[cur];
            double zm = zmin[cur], zM = zmax[cur];
            double L;
            if (!exit_len(x, y, z, vx, 0.0, vz, rm, rM, zm, zM, &L)) break;
            if (using_mask[cur]) {
                if (n_out >= max_entries) return -1;
                rows[n_out] = i; cols[n_out] = cur; w[n_out] = L;
                ++n_out;
            }
            double eps = std::min(rM - rm, zM - zm) * 1e-6;
            x += vx * (L + eps);
            z += vz * (L + eps);
            cur = locate(g, std::hypot(x, y), std::fabs(z));
        }
    }
    return n_out;
}

// Neighbor lists by shared-edge overlap (role of reference make_neighbors,
// src/grid.f90:785-860; the reference is O(N^2) over all pairs — this
// scan is too, but at native speed with early bounds checks).
// kind: 0 above, 1 below, 2 inner, 3 outer.
int64_t find_neighbors(
    int64_t n_cells,
    const double* rmin, const double* rmax,
    const double* zmin, const double* zmax,
    int32_t kind, double eps,
    int64_t max_entries, int64_t* rows, int64_t* cols) {
    int64_t n_out = 0;
    for (int64_t i = 0; i < n_cells; ++i) {
        for (int64_t j = 0; j < n_cells; ++j) {
            bool xo = std::min(rmax[j], rmax[i]) - std::max(rmin[j], rmin[i]) > eps;
            bool yo = std::min(zmax[j], zmax[i]) - std::max(zmin[j], zmin[i]) > eps;
            bool hit = false;
            switch (kind) {
                case 0: hit = xo && std::fabs(zmin[j] - zmax[i]) < eps; break;
                case 1: hit = xo && std::fabs(zmax[j] - zmin[i]) < eps; break;
                case 2: hit = yo && std::fabs(rmax[j] - rmin[i]) < eps; break;
                case 3: hit = yo && std::fabs(rmin[j] - rmax[i]) < eps; break;
            }
            if (hit) {
                if (n_out >= max_entries) return -1;
                rows[n_out] = i; cols[n_out] = j; ++n_out;
            }
        }
    }
    return n_out;
}

}  // extern "C"
