// flexam_native: host-side native runtime ops.
//
// TPU-native counterparts of the reference's native components
// (SURVEY.md §2.4):
//   * paint_frames  — the track-rasterization painter's algorithm. The
//     reference runs a per-point PIL draw loop on the CPU
//     (`pipelines.py:1545-1573`); this is the same depth-sorted
//     square-splat with direct memory writes.
//   * knn           — brute-force k-nearest-neighbors (the reference
//     vendors pytorch3d's CUDA knn for UniDepth,
//     `comfyui/annotator/UniDepth/unidepth/ops/knn/src/knn.cu`).
//   * extract_patches — gather N arbitrary-center patches from a CHW
//     feature map (the reference's UniDepth CUDA op,
//     `.../ops/extract_patches/src/cuda/extract_patches_kernel.cu`).
//
// Exposed extern "C" for ctypes; built by flexam_tpu/native/__init__.py.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// out: uint8 [T, H, W, 3] (zero-initialized by caller).
// Points are concatenated over frames; offsets[t]..offsets[t+1] index
// frame t's points. Squares span [c-half, c+half] inclusive (PIL
// rectangle includes both corners). Far-to-near order, overwrite wins.
void paint_frames(int32_t T, int32_t H, int32_t W, int32_t half,
                  const int64_t* offsets, const int32_t* xy,
                  const float* depth, const uint8_t* rgb, uint8_t* out) {
  std::vector<int32_t> order;
  for (int32_t t = 0; t < T; ++t) {
    const int64_t beg = offsets[t], end = offsets[t + 1];
    const int64_t n = end - beg;
    order.resize(n);
    std::iota(order.begin(), order.end(), 0);
    const float* d = depth + beg;
    // descending depth (far first); ties keep index order (stable)
    std::stable_sort(order.begin(), order.end(),
                     [d](int32_t a, int32_t b) { return d[a] > d[b]; });
    uint8_t* frame = out + (int64_t)t * H * W * 3;
    for (int64_t i = 0; i < n; ++i) {
      const int64_t p = beg + order[i];
      const int32_t cx = xy[2 * p], cy = xy[2 * p + 1];
      const uint8_t r = rgb[3 * p], g = rgb[3 * p + 1], b = rgb[3 * p + 2];
      const int32_t y0 = std::max(cy - half, 0);
      const int32_t y1 = std::min(cy + half, H - 1);
      const int32_t x0 = std::max(cx - half, 0);
      const int32_t x1 = std::min(cx + half, W - 1);
      for (int32_t y = y0; y <= y1; ++y) {
        uint8_t* row = frame + ((int64_t)y * W + x0) * 3;
        for (int32_t x = x0; x <= x1; ++x) {
          row[0] = r; row[1] = g; row[2] = b;
          row += 3;
        }
      }
    }
  }
}

// query [N, D], ref [M, D] -> idx [N, K] int32, dist [N, K] (squared L2),
// ascending by distance.
void knn(int32_t n, int32_t m, int32_t d, int32_t k, const float* query,
         const float* ref, int32_t* idx, float* dist) {
  std::vector<std::pair<float, int32_t>> heap;
  for (int32_t i = 0; i < n; ++i) {
    heap.clear();
    const float* q = query + (int64_t)i * d;
    for (int32_t j = 0; j < m; ++j) {
      const float* r = ref + (int64_t)j * d;
      float s = 0.f;
      for (int32_t c = 0; c < d; ++c) {
        const float diff = q[c] - r[c];
        s += diff * diff;
      }
      if ((int32_t)heap.size() < k) {
        heap.emplace_back(s, j);
        std::push_heap(heap.begin(), heap.end());
      } else if (s < heap.front().first) {
        std::pop_heap(heap.begin(), heap.end());
        heap.back() = {s, j};
        std::push_heap(heap.begin(), heap.end());
      }
    }
    std::sort_heap(heap.begin(), heap.end());
    for (int32_t kk = 0; kk < k && kk < (int32_t)heap.size(); ++kk) {
      dist[(int64_t)i * k + kk] = heap[kk].first;
      idx[(int64_t)i * k + kk] = heap[kk].second;
    }
  }
}

// feat [C, H, W], centers [N, 2] (y, x) -> out [N, C, ph, pw];
// zero-padded at borders (centered patches).
void extract_patches(const float* feat, int32_t C, int32_t H, int32_t W,
                     const int32_t* centers, int32_t n, int32_t ph,
                     int32_t pw, float* out) {
  const int32_t hy = ph / 2, hx = pw / 2;
  for (int32_t i = 0; i < n; ++i) {
    const int32_t cy = centers[2 * i], cx = centers[2 * i + 1];
    for (int32_t c = 0; c < C; ++c) {
      const float* plane = feat + (int64_t)c * H * W;
      float* dst = out + (((int64_t)i * C + c) * ph) * pw;
      for (int32_t y = 0; y < ph; ++y) {
        const int32_t sy = cy - hy + y;
        for (int32_t x = 0; x < pw; ++x) {
          const int32_t sx = cx - hx + x;
          dst[(int64_t)y * pw + x] =
              (sy >= 0 && sy < H && sx >= 0 && sx < W)
                  ? plane[(int64_t)sy * W + sx]
                  : 0.f;
        }
      }
    }
  }
}

}  // extern "C"
