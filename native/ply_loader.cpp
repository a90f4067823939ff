// Native 3DGS PLY loader.
//
// C++ replacement for the reference's vendored header-only happly reader +
// per-element host activation loops (reference app/happly.h,
// app/gaussians.cpp:75-171). Differences by design:
//   * zero-copy scan of the binary vertex table (single read, no
//     per-property std::vector copies like happly's column extraction);
//   * activations (sigmoid/exp/normalize, gaussians.cpp:137-168) fused
//     into the SoA transpose pass;
//   * multithreaded over row ranges;
//   * plain C ABI consumed from Python via ctypes (no pybind11 needed).
//
// Only the 3DGS checkpoint schema is handled here (x y z [normals]
// f_dc_* f_rest_* opacity scale_* rot_*, all float32,
// binary_little_endian); everything else falls back to the Python reader.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Layout {
    long n = 0;            // vertex count
    int stride = 0;        // bytes per vertex row
    int k_rest = 0;        // number of f_rest_* properties (3*(K-1))
    long data_offset = 0;  // file offset of the binary table
    // byte offsets within a row (-1 = absent)
    int off_xyz[3] = {-1, -1, -1};
    int off_dc[3] = {-1, -1, -1};
    int off_rest0 = -1;  // f_rest_0 (assumed contiguous ascending)
    int off_opacity = -1;
    int off_scale[3] = {-1, -1, -1};
    int off_rot[4] = {-1, -1, -1, -1};
    bool rest_contiguous = true;
};

int prop_size(const std::string& t) {
    if (t == "float" || t == "float32" || t == "int" || t == "int32" ||
        t == "uint" || t == "uint32")
        return 4;
    if (t == "double" || t == "float64") return 8;
    if (t == "short" || t == "ushort") return 2;
    if (t == "char" || t == "uchar" || t == "int8" || t == "uint8") return 1;
    return -1;
}

// returns 0 on success, negative error codes otherwise
int parse_header(FILE* f, Layout& lay) {
    char line[512];
    if (!fgets(line, sizeof line, f) || strncmp(line, "ply", 3) != 0) return -1;
    bool in_vertex = false;
    bool fmt_ok = false;
    int cursor = 0;
    std::vector<std::pair<std::string, int>> props;  // name, offset
    while (fgets(line, sizeof line, f)) {
        std::string s(line);
        while (!s.empty() && (s.back() == '\n' || s.back() == '\r')) s.pop_back();
        if (s.rfind("format ", 0) == 0) {
            fmt_ok = s.find("binary_little_endian") != std::string::npos;
        } else if (s.rfind("element ", 0) == 0) {
            in_vertex = s.rfind("element vertex ", 0) == 0;
            if (in_vertex) lay.n = atol(s.c_str() + 15);
        } else if (s.rfind("property ", 0) == 0 && in_vertex) {
            // "property <type> <name>"
            size_t sp1 = s.find(' ');
            size_t sp2 = s.find(' ', sp1 + 1);
            if (sp2 == std::string::npos) return -2;
            std::string type = s.substr(sp1 + 1, sp2 - sp1 - 1);
            std::string name = s.substr(sp2 + 1);
            if (type == "list") return -3;  // unsupported in vertex element
            int sz = prop_size(type);
            if (sz < 0) return -4;
            if (sz == 4 && (type == "float" || type == "float32"))
                props.emplace_back(name, cursor);
            cursor += sz;
        } else if (s == "end_header") {
            lay.stride = cursor;
            lay.data_offset = ftell(f);
            if (!fmt_ok) return -5;
            int prev_rest = -1;
            for (auto& [name, off] : props) {
                if (name == "x") lay.off_xyz[0] = off;
                else if (name == "y") lay.off_xyz[1] = off;
                else if (name == "z") lay.off_xyz[2] = off;
                else if (name == "opacity") lay.off_opacity = off;
                else if (name.rfind("f_dc_", 0) == 0)
                    lay.off_dc[atoi(name.c_str() + 5)] = off;
                else if (name.rfind("f_rest_", 0) == 0) {
                    int idx = atoi(name.c_str() + 7);
                    if (idx == 0) lay.off_rest0 = off;
                    if (idx != lay.k_rest) lay.rest_contiguous = false;
                    if (prev_rest >= 0 && off != prev_rest + 4)
                        lay.rest_contiguous = false;
                    prev_rest = off;
                    lay.k_rest++;
                } else if (name.rfind("scale_", 0) == 0)
                    lay.off_scale[atoi(name.c_str() + 6)] = off;
                else if (name.rfind("rot_", 0) == 0)
                    lay.off_rot[atoi(name.c_str() + 4)] = off;
            }
            for (int i = 0; i < 3; i++)
                if (lay.off_xyz[i] < 0 || lay.off_dc[i] < 0 || lay.off_scale[i] < 0)
                    return -6;
            if (lay.off_opacity < 0) return -6;
            for (int i = 0; i < 4; i++)
                if (lay.off_rot[i] < 0) return -6;
            if (lay.k_rest > 0 && (lay.off_rest0 < 0 || !lay.rest_contiguous))
                return -7;
            return 0;
        }
    }
    return -8;
}

inline float sigmoidf(float x) { return 1.0f / (1.0f + std::exp(-x)); }

}  // namespace

extern "C" {

// Phase 1: header scan. Returns 0 and fills (n, k_rest) on success.
int gsply_info(const char* path, long* n, int* k_rest) {
    FILE* f = fopen(path, "rb");
    if (!f) return -100;
    Layout lay;
    int rc = parse_header(f, lay);
    fclose(f);
    if (rc != 0) return rc;
    *n = lay.n;
    *k_rest = lay.k_rest;
    return 0;
}

// Phase 2: load + activate into caller-allocated SoA buffers:
//   means (n,3)  sh (n, 1 + k_rest/3, 3)  opacity (n,)  scales (n,3)
//   quats (n,4) in (x, y, z, w) order, normalised.
// apply_activations: sigmoid(opacity), exp(scale), normalize(quat)
// exactly as the reference does at load (gaussians.cpp:137-168).
int gsply_load(const char* path, float* means, float* sh, float* opacity,
               float* scales, float* quats, int apply_activations,
               int n_threads) {
    FILE* f = fopen(path, "rb");
    if (!f) return -100;
    Layout lay;
    int rc = parse_header(f, lay);
    if (rc != 0) {
        fclose(f);
        return rc;
    }
    std::vector<unsigned char> raw((size_t)lay.n * lay.stride);
    if (fseek(f, lay.data_offset, SEEK_SET) != 0 ||
        fread(raw.data(), 1, raw.size(), f) != raw.size()) {
        fclose(f);
        return -101;
    }
    fclose(f);

    const int k_sh = 1 + lay.k_rest / 3;  // total SH coeffs per channel
    const int kr = lay.k_rest / 3;        // rest coeffs per channel
    const Layout L = lay;

    auto work = [&](long lo, long hi) {
        for (long i = lo; i < hi; i++) {
            const unsigned char* row = raw.data() + (size_t)i * L.stride;
            auto rd = [&](int off) {
                float v;
                memcpy(&v, row + off, 4);
                return v;
            };
            for (int c = 0; c < 3; c++) means[i * 3 + c] = rd(L.off_xyz[c]);
            // SH layout (N, K, 3); file stores f_rest channel-major
            // (gaussians.cpp:124-135): f_rest[c*kr + k] -> sh[k+1][c]
            float* shp = sh + (size_t)i * k_sh * 3;
            for (int c = 0; c < 3; c++) shp[c] = rd(L.off_dc[c]);
            for (int c = 0; c < 3; c++)
                for (int k = 0; k < kr; k++)
                    shp[(k + 1) * 3 + c] = rd(L.off_rest0 + 4 * (c * kr + k));
            float op = rd(L.off_opacity);
            opacity[i] = apply_activations ? sigmoidf(op) : op;
            for (int c = 0; c < 3; c++) {
                float s = rd(L.off_scale[c]);
                scales[i * 3 + c] = apply_activations ? std::exp(s) : s;
            }
            // file order (w, x, y, z) -> output (x, y, z, w)
            float w = rd(L.off_rot[0]), x = rd(L.off_rot[1]);
            float y = rd(L.off_rot[2]), z = rd(L.off_rot[3]);
            if (apply_activations) {
                float inv = 1.0f / std::sqrt(x * x + y * y + z * z + w * w);
                x *= inv; y *= inv; z *= inv; w *= inv;
            }
            quats[i * 4 + 0] = x;
            quats[i * 4 + 1] = y;
            quats[i * 4 + 2] = z;
            quats[i * 4 + 3] = w;
        }
    };

    int nt = n_threads > 0 ? n_threads
                           : (int)std::thread::hardware_concurrency();
    if (nt < 1) nt = 1;
    if (nt == 1 || lay.n < 4096) {
        work(0, lay.n);
    } else {
        std::vector<std::thread> pool;
        long per = (lay.n + nt - 1) / nt;
        for (int t = 0; t < nt; t++) {
            long lo = t * per, hi = std::min<long>(lay.n, lo + per);
            if (lo < hi) pool.emplace_back(work, lo, hi);
        }
        for (auto& th : pool) th.join();
    }
    return 0;
}

}  // extern "C"
