// Host-side 3D KD-tree: nearest-neighbor and radius-existence queries.
//
// Native equivalent of the reference's C++ dependencies for host geometry:
// Open3D KDTreeFlann 1-NN (reference utils/registration.py:120-128), scipy
// cKDTree NN (utils/point_cloud.py:136-147), and Open3D-ML RadiusSearch
// overlap queries (utils/point_cloud.py:91-103). Written from scratch;
// exposed through a C API consumed via ctypes (sgaligner_tpu/native).
//
// Build: g++ -O3 -march=native -shared -fPIC -fopenmp kdtree.cpp -o libsgakdtree.so

#include <algorithm>
#include <cfloat>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Node {
    float split;
    int axis;        // -1 for leaf
    int left, right; // children node indices
    int begin, end;  // leaf point range [begin, end)
};

struct KDTree {
    std::vector<float> pts;   // [n, 3] reordered
    std::vector<int> index;   // reordered -> original index
    std::vector<Node> nodes;
    int root = -1;

    static constexpr int LEAF_SIZE = 16;

    int build(int begin, int end, std::vector<int>& order,
              const float* raw) {
        Node node{};
        int id = static_cast<int>(nodes.size());
        nodes.push_back(node);

        if (end - begin <= LEAF_SIZE) {
            nodes[id].axis = -1;
            nodes[id].begin = begin;
            nodes[id].end = end;
            return id;
        }

        // pick the widest axis
        float lo[3] = {FLT_MAX, FLT_MAX, FLT_MAX};
        float hi[3] = {-FLT_MAX, -FLT_MAX, -FLT_MAX};
        for (int i = begin; i < end; ++i) {
            const float* p = raw + 3 * order[i];
            for (int a = 0; a < 3; ++a) {
                lo[a] = std::min(lo[a], p[a]);
                hi[a] = std::max(hi[a], p[a]);
            }
        }
        int axis = 0;
        for (int a = 1; a < 3; ++a)
            if (hi[a] - lo[a] > hi[axis] - lo[axis]) axis = a;

        int mid = (begin + end) / 2;
        std::nth_element(order.begin() + begin, order.begin() + mid,
                         order.begin() + end,
                         [raw, axis](int i, int j) {
                             return raw[3 * i + axis] < raw[3 * j + axis];
                         });
        nodes[id].axis = axis;
        nodes[id].split = raw[3 * order[mid] + axis];
        int l = build(begin, mid, order, raw);
        int r = build(mid, end, order, raw);
        nodes[id].left = l;
        nodes[id].right = r;
        return id;
    }

    void init(const float* raw, int n) {
        std::vector<int> order(n);
        for (int i = 0; i < n; ++i) order[i] = i;
        nodes.reserve(2 * n / LEAF_SIZE + 4);
        root = build(0, n, order, raw);
        pts.resize(3 * static_cast<size_t>(n));
        index = order;
        for (int i = 0; i < n; ++i)
            std::memcpy(&pts[3 * static_cast<size_t>(i)],
                        raw + 3 * static_cast<size_t>(order[i]),
                        3 * sizeof(float));
    }

    void nn(const float* q, int* best_idx, float* best_d2) const {
        *best_d2 = FLT_MAX;
        *best_idx = -1;
        nn_rec(root, q, best_idx, best_d2);
    }

    void nn_rec(int id, const float* q, int* best_idx, float* best_d2) const {
        const Node& node = nodes[id];
        if (node.axis < 0) {
            for (int i = node.begin; i < node.end; ++i) {
                const float* p = &pts[3 * static_cast<size_t>(i)];
                float dx = p[0] - q[0], dy = p[1] - q[1], dz = p[2] - q[2];
                float d2 = dx * dx + dy * dy + dz * dz;
                if (d2 < *best_d2) {
                    *best_d2 = d2;
                    *best_idx = index[i];
                }
            }
            return;
        }
        float diff = q[node.axis] - node.split;
        int near = diff <= 0 ? node.left : node.right;
        int far = diff <= 0 ? node.right : node.left;
        nn_rec(near, q, best_idx, best_d2);
        if (diff * diff < *best_d2) nn_rec(far, q, best_idx, best_d2);
    }

    bool within(const float* q, float r2, int id) const {
        const Node& node = nodes[id];
        if (node.axis < 0) {
            for (int i = node.begin; i < node.end; ++i) {
                const float* p = &pts[3 * static_cast<size_t>(i)];
                float dx = p[0] - q[0], dy = p[1] - q[1], dz = p[2] - q[2];
                if (dx * dx + dy * dy + dz * dz <= r2) return true;
            }
            return false;
        }
        float diff = q[node.axis] - node.split;
        int near = diff <= 0 ? node.left : node.right;
        int far = diff <= 0 ? node.right : node.left;
        if (within(q, r2, near)) return true;
        if (diff * diff <= r2 && within(q, r2, far)) return true;
        return false;
    }
};

}  // namespace

extern "C" {

void* sga_kdtree_build(const float* pts, int n) {
    auto* tree = new KDTree();
    tree->init(pts, n);
    return tree;
}

void sga_kdtree_free(void* handle) { delete static_cast<KDTree*>(handle); }

void sga_kdtree_nn(const void* handle, const float* queries, int m,
                   int* out_idx, float* out_dist) {
    const auto* tree = static_cast<const KDTree*>(handle);
#pragma omp parallel for schedule(static)
    for (int i = 0; i < m; ++i) {
        float d2;
        tree->nn(queries + 3 * static_cast<size_t>(i), out_idx + i, &d2);
        out_dist[i] = std::sqrt(d2);
    }
}

void sga_kdtree_radius_exists(const void* handle, const float* queries, int m,
                              float radius, uint8_t* out) {
    const auto* tree = static_cast<const KDTree*>(handle);
    float r2 = radius * radius;
#pragma omp parallel for schedule(static)
    for (int i = 0; i < m; ++i)
        out[i] = tree->within(queries + 3 * static_cast<size_t>(i), r2,
                              tree->root)
                     ? 1
                     : 0;
}

}  // extern "C"
