// Native topology builder for softbodysimulation_tpu.
//
// Host-side graph preprocessing — the C++ counterpart of topology/edges.py
// and topology/coloring.py, for large meshes where the Python greedy colorer
// (a per-constraint loop) becomes the scene-build bottleneck.  Exposed as a
// plain C ABI consumed via ctypes (no pybind11 in this image).
//
// Capabilities (parity with the reference's topology passes):
//   * unique undirected edge extraction from triangles
//     (SoftBodyCPU.cs:160-201)
//   * dihedral hinge discovery: edges shared by exactly two triangles,
//     with opposite tips (SoftBodyCPU.cs:203-266)
//   * greedy first-fit constraint coloring, deterministic row order
//     (the sound replacement for SoftBodySimulator.cs:316-364 /
//     GraphClustering.cs — see topology/coloring.py for why the
//     reference's cluster coloring is unsound)
//   * position-epsilon vertex welding via a quantised hash grid
//     (SoftBodyGPU.cs:369-413, O(n) instead of O(n^2))

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

extern "C" {

// Unique undirected edges (a<b), lexicographically sorted.
// out_edges must hold 2 * 3 * n_tris int32s. Returns the edge count.
int32_t sbs_unique_edges(const int32_t* tris, int32_t n_tris,
                         int32_t* out_edges) {
    std::vector<uint64_t> keys;
    keys.reserve(static_cast<size_t>(n_tris) * 3);
    for (int32_t t = 0; t < n_tris; ++t) {
        const int32_t v0 = tris[3 * t], v1 = tris[3 * t + 1],
                      v2 = tris[3 * t + 2];
        const int32_t e[3][2] = {{v0, v1}, {v1, v2}, {v2, v0}};
        for (auto& p : e) {
            const uint64_t a = static_cast<uint64_t>(std::min(p[0], p[1]));
            const uint64_t b = static_cast<uint64_t>(std::max(p[0], p[1]));
            keys.push_back((a << 32) | b);
        }
    }
    std::sort(keys.begin(), keys.end());
    keys.erase(std::unique(keys.begin(), keys.end()), keys.end());
    for (size_t i = 0; i < keys.size(); ++i) {
        out_edges[2 * i] = static_cast<int32_t>(keys[i] >> 32);
        out_edges[2 * i + 1] = static_cast<int32_t>(keys[i] & 0xffffffffu);
    }
    return static_cast<int32_t>(keys.size());
}

// Hinges [a,b,c,d]: edge (a,b) shared by exactly two triangles, opposite
// tips c,d; degenerate tip configurations skipped.
// out_hinges must hold 4 * 3 * n_tris int32s. Returns the hinge count.
int32_t sbs_hinges(const int32_t* tris, int32_t n_tris, int32_t* out_hinges) {
    struct Inc { uint64_t key; int32_t opp; };
    std::vector<Inc> inc;
    inc.reserve(static_cast<size_t>(n_tris) * 3);
    for (int32_t t = 0; t < n_tris; ++t) {
        const int32_t v0 = tris[3 * t], v1 = tris[3 * t + 1],
                      v2 = tris[3 * t + 2];
        const int32_t e[3][3] = {{v0, v1, v2}, {v1, v2, v0}, {v2, v0, v1}};
        for (auto& p : e) {
            const uint64_t a = static_cast<uint64_t>(std::min(p[0], p[1]));
            const uint64_t b = static_cast<uint64_t>(std::max(p[0], p[1]));
            inc.push_back({(a << 32) | b, p[2]});
        }
    }
    std::sort(inc.begin(), inc.end(), [](const Inc& x, const Inc& y) {
        return x.key != y.key ? x.key < y.key : x.opp < y.opp;
    });
    int32_t count = 0;
    size_t i = 0;
    while (i < inc.size()) {
        size_t j = i;
        while (j < inc.size() && inc[j].key == inc[i].key) ++j;
        if (j - i == 2) {
            const int32_t a = static_cast<int32_t>(inc[i].key >> 32);
            const int32_t b = static_cast<int32_t>(inc[i].key & 0xffffffffu);
            const int32_t c = inc[i].opp, d = inc[i + 1].opp;
            if (c != d && c != a && c != b && d != a && d != b) {
                out_hinges[4 * count] = a;
                out_hinges[4 * count + 1] = b;
                out_hinges[4 * count + 2] = c;
                out_hinges[4 * count + 3] = d;
                ++count;
            }
        }
        i = j;
    }
    return count;
}

// Greedy first-fit coloring. cons: (k, arity) row-major particle indices.
// colors_out: k int32s. Returns the number of colors used.
int32_t sbs_greedy_color(const int32_t* cons, int32_t k, int32_t arity,
                         int32_t n_particles, int32_t* colors_out) {
    // per-particle sorted vector of used colors (degrees are small)
    std::vector<std::vector<int32_t>> used(
        static_cast<size_t>(n_particles));
    std::vector<char> taken;  // scratch bitmap per constraint
    int32_t max_color = -1;
    for (int32_t i = 0; i < k; ++i) {
        taken.assign(static_cast<size_t>(max_color) + 2, 0);
        for (int32_t a = 0; a < arity; ++a) {
            const int32_t p = cons[i * arity + a];
            for (int32_t c : used[p])
                if (c < static_cast<int32_t>(taken.size())) taken[c] = 1;
        }
        int32_t c = 0;
        while (c < static_cast<int32_t>(taken.size()) && taken[c]) ++c;
        colors_out[i] = c;
        max_color = std::max(max_color, c);
        for (int32_t a = 0; a < arity; ++a)
            used[cons[i * arity + a]].push_back(c);
    }
    return max_color + 1;
}

// Weld vertices within eps (quantised grid, order of first appearance).
// map_out: n int32s mapping original -> welded index.
// Returns the welded vertex count.
// Keys are the full (qx,qy,qz) int64 triple (no bit packing): quantised
// coordinates of any magnitude hash exactly, so a metre-scale mesh welded
// with a tiny eps can never alias distant vertices.
namespace {
struct QKey {
    int64_t x, y, z;
    bool operator==(const QKey& o) const {
        return x == o.x && y == o.y && z == o.z;
    }
};
struct QKeyHash {
    size_t operator()(const QKey& k) const {
        uint64_t h = 0x9e3779b97f4a7c15ull;
        for (uint64_t v : {static_cast<uint64_t>(k.x),
                           static_cast<uint64_t>(k.y),
                           static_cast<uint64_t>(k.z)}) {
            v *= 0xff51afd7ed558ccdull;
            v ^= v >> 33;
            h = (h ^ v) * 0xc4ceb9fe1a85ec53ull;
        }
        return static_cast<size_t>(h ^ (h >> 29));
    }
};
}  // namespace

extern "C" int32_t sbs_weld(const float* verts, int32_t n, float eps,
                            int32_t* map_out) {
    std::unordered_map<QKey, int32_t, QKeyHash> seen;
    seen.reserve(static_cast<size_t>(n) * 2);
    const double inv = 1.0 / static_cast<double>(eps);
    int32_t next = 0;
    for (int32_t i = 0; i < n; ++i) {
        const QKey key{
            static_cast<int64_t>(std::llround(verts[3 * i] * inv)),
            static_cast<int64_t>(std::llround(verts[3 * i + 1] * inv)),
            static_cast<int64_t>(std::llround(verts[3 * i + 2] * inv))};
        auto it = seen.find(key);
        if (it == seen.end()) {
            seen.emplace(key, next);
            map_out[i] = next++;
        } else {
            map_out[i] = it->second;
        }
    }
    return next;
}

}  // extern "C"
