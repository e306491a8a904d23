// Native host runtime: 3D connected components (6-connectivity) via
// two-pass union-find.  This is the hot host-side morphology op behind
// single_component_label reduction and defragmentation (the role TIPL's
// C++ morphology plays in the reference; SURVEY.md §2.9 item 7).
//
// Exposed as a C ABI for ctypes; built on demand by
// unet_studio_tpu/utils/native.py.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct UnionFind {
    std::vector<int32_t> parent;

    explicit UnionFind(size_t n) : parent(n) {
        for (size_t i = 0; i < n; ++i) parent[i] = static_cast<int32_t>(i);
    }

    int32_t find(int32_t x) {
        while (parent[x] != x) {
            parent[x] = parent[parent[x]];  // path halving
            x = parent[x];
        }
        return x;
    }

    void unite(int32_t a, int32_t b) {
        a = find(a);
        b = find(b);
        if (a == b) return;
        if (a < b)
            parent[b] = a;
        else
            parent[a] = b;
    }
};

}  // namespace

extern "C" {

// mask: d*h*w uint8 volume (nonzero = foreground).
// labels_out: d*h*w int32, 0 = background, components numbered 1..n.
// counts_out: optional (may be null) buffer of size max_components+1
//             receiving per-component voxel counts (index = label).
// Returns the number of components (or -1 if it would exceed
// max_components).
int32_t cc3d_label(const uint8_t* mask, int32_t d, int32_t h, int32_t w,
                   int32_t* labels_out, int64_t* counts_out,
                   int32_t max_components) {
    const int64_t plane = static_cast<int64_t>(h) * w;
    const int64_t total = static_cast<int64_t>(d) * plane;

    // first pass: provisional labels + unions with -x/-y/-z neighbors
    std::vector<int32_t> prov(total, 0);
    UnionFind uf(1);
    uf.parent.reserve(1 << 16);
    int32_t next = 1;

    for (int64_t z = 0; z < d; ++z) {
        for (int64_t y = 0; y < h; ++y) {
            const int64_t row = z * plane + y * w;
            for (int64_t x = 0; x < w; ++x) {
                const int64_t i = row + x;
                if (!mask[i]) continue;
                int32_t lab = 0;
                const int32_t lx = (x > 0 && mask[i - 1]) ? prov[i - 1] : 0;
                const int32_t ly = (y > 0 && mask[i - w]) ? prov[i - w] : 0;
                const int32_t lz = (z > 0 && mask[i - plane]) ? prov[i - plane] : 0;
                // take any existing neighbor label, union the others
                if (lx) lab = lx;
                if (ly) { if (!lab) lab = ly; else if (ly != lab) uf.unite(lab, ly); }
                if (lz) { if (!lab) lab = lz; else if (lz != lab) uf.unite(lab, lz); }
                if (!lab) {
                    lab = next++;
                    uf.parent.push_back(lab);
                }
                prov[i] = lab;
            }
        }
    }

    // second pass: compress to dense 1..n labels
    std::vector<int32_t> remap(next, 0);
    int32_t n = 0;
    for (int32_t p = 1; p < next; ++p) {
        const int32_t root = uf.find(p);
        if (!remap[root]) {
            if (n + 1 > max_components) return -1;
            remap[root] = ++n;
        }
        remap[p] = remap[root];
    }

    if (counts_out) std::memset(counts_out, 0, sizeof(int64_t) * (n + 1));
    for (int64_t i = 0; i < total; ++i) {
        const int32_t lab = prov[i] ? remap[prov[i]] : 0;
        labels_out[i] = lab;
        if (counts_out) ++counts_out[lab];
    }
    return n;
}

}  // extern "C"
