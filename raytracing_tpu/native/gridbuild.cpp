// Native uniform-grid builder: bins object AABBs into nx*ny*nz cells (CSR).
//
// Semantics mirror the reference's splitSphereData / splitTriangleData /
// splitMeshData (Assign10-Path_Tracing/code.js:1554-1772, 899-1045):
// floor((aabb - grid_min) / cell_width) clamped per axis, every
// overlapped cell gets a reference, cells laid out iz-major, and objects
// appear within each cell in input order.
//
// Built as a plain shared library, called through ctypes (no pybind11 in
// this image). Two-pass: count, then fill against caller-computed offsets.

#include <cstdint>

namespace {

struct BinBox {
    long lo[3];
    long hi[3];
};

inline BinBox object_cells(const float* lo, const float* hi, long i,
                           const float* pmin, const float* inv_width,
                           const int64_t* n) {
    BinBox b;
    for (int a = 0; a < 3; ++a) {
        long mn = static_cast<long>((lo[i * 3 + a] - pmin[a]) * inv_width[a]);
        long mx = static_cast<long>((hi[i * 3 + a] - pmin[a]) * inv_width[a]);
        // match JS Math.floor for negatives (values below pmin clamp anyway)
        if (lo[i * 3 + a] < pmin[a]) mn = 0;
        if (mn < 0) mn = 0;
        if (mx < 0) mx = 0;
        if (mn >= n[a]) mn = n[a] - 1;
        if (mx >= n[a]) mx = n[a] - 1;
        b.lo[a] = mn;
        b.hi[a] = mx;
    }
    return b;
}

inline void inv_cell_width(const float* pmin, const float* pmax,
                           const int64_t* n, float* inv_width) {
    for (int a = 0; a < 3; ++a) {
        float w = (pmax[a] - pmin[a]) / static_cast<float>(n[a]);
        if (w <= 0.0f) w = 1e-30f;
        inv_width[a] = 1.0f / w;
    }
}

}  // namespace

extern "C" {

// Pass 1: counts[c] = number of object references in cell c. Returns total.
int64_t grid_count(const float* lo, const float* hi, int64_t n_obj,
                   const float* pmin, const float* pmax, const int64_t* n,
                   int32_t* counts) {
    float inv_width[3];
    inv_cell_width(pmin, pmax, n, inv_width);
    const int64_t n2 = n[0] * n[1];
    int64_t total = 0;
    for (int64_t c = 0; c < n[2] * n2; ++c) counts[c] = 0;
    for (int64_t i = 0; i < n_obj; ++i) {
        BinBox b = object_cells(lo, hi, i, pmin, inv_width, n);
        for (long iz = b.lo[2]; iz <= b.hi[2]; ++iz)
            for (long iy = b.lo[1]; iy <= b.hi[1]; ++iy)
                for (long ix = b.lo[0]; ix <= b.hi[0]; ++ix) {
                    ++counts[iz * n2 + iy * n[0] + ix];
                    ++total;
                }
    }
    return total;
}

// Pass 2: payload filled against CSR offsets (offsets has n^3+1 entries and
// is NOT modified; an internal cursor array tracks per-cell positions).
// cursor must be a caller-provided scratch of n^3 int32 (zero-initialized).
void grid_fill(const float* lo, const float* hi, int64_t n_obj,
               const float* pmin, const float* pmax, const int64_t* n,
               const int32_t* offsets, int32_t* cursor, int32_t* payload) {
    float inv_width[3];
    inv_cell_width(pmin, pmax, n, inv_width);
    const int64_t n2 = n[0] * n[1];
    for (int64_t i = 0; i < n_obj; ++i) {
        BinBox b = object_cells(lo, hi, i, pmin, inv_width, n);
        for (long iz = b.lo[2]; iz <= b.hi[2]; ++iz)
            for (long iy = b.lo[1]; iy <= b.hi[1]; ++iy)
                for (long ix = b.lo[0]; ix <= b.hi[0]; ++ix) {
                    const int64_t c = iz * n2 + iy * n[0] + ix;
                    payload[offsets[c] + cursor[c]] =
                        static_cast<int32_t>(i);
                    ++cursor[c];
                }
    }
}

}  // extern "C"
