// Host-side native kernels for offline conversion: bit-packing, unpacking and
// iterative-absmean calibration of ternary/binary weights.
//
// This is the TPU-native framework's counterpart of the reference's native
// layer (reference `native/` + the out-of-tree larq_compute_engine fork whose
// ops `pack_fn` / `unpack_ternary` the Python code calls — reference
// `utils/conversion.py:69-72`, `impl/tf/moondream/ternary.py:281,334`).  The
// ON-DEVICE matmul lives in Pallas (ops/ternary_matmul.py); this library
// accelerates the HOST side of checkpoint conversion, where multi-GB float
// checkpoints are calibrated and packed without a TPU round-trip.
//
// Layout contract (must match ternary_vllm_tpu/ops/packing.py):
//   weight W: row-major (K, N), contraction-first.
//   ternary: Kp = ceil4(K); S = Kp/4; packed (S, N) uint8; byte (s, j) holds
//            codes (value+1) of W[p*S + s, j] in bit-field 2p, p = 0..3;
//            K-padding rows use code 1 (value 0).
//   binary:  Kp = ceil8(K); S = Kp/8; bit p of byte (s, j) = W[p*S+s, j] >= 0;
//            padding rows use bit 0.
//
// Build: native/build.sh (plain g++, mirrors reference native/build.sh).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

int64_t ceil_div(int64_t a, int64_t b) { return (a + b - 1) / b; }

// Run fn(j0, j1) over column ranges on all cores.
void parallel_cols(int64_t n, const std::function<void(int64_t, int64_t)>& fn) {
  unsigned hw = std::max(1u, std::thread::hardware_concurrency());
  int64_t n_threads = std::min<int64_t>(hw, n);
  if (n_threads <= 1) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = ceil_div(n, n_threads);
  for (int64_t t = 0; t < n_threads; ++t) {
    int64_t j0 = t * chunk, j1 = std::min(n, j0 + chunk);
    if (j0 >= j1) break;
    threads.emplace_back([=, &fn] { fn(j0, j1); });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// W (k, n) float -> packed (ceil4(k)/4 ... == s, n) uint8.  Values are
// hard-ternarized with thresholds +-0.5 (tri-step, reference
// binary/modules.py:21-26) so latent floats pack correctly.
void tp_pack_ternary(const float* w, uint8_t* out, int64_t k, int64_t n) {
  int64_t kp = ceil_div(k, 4) * 4;
  int64_t s = kp / 4;
  parallel_cols(n, [&](int64_t j0, int64_t j1) {
    for (int64_t row = 0; row < s; ++row) {
      for (int64_t j = j0; j < j1; ++j) {
        uint8_t byte = 0;
        for (int p = 0; p < 4; ++p) {
          int64_t src = p * s + row;
          uint8_t code = 1;  // value 0 (padding-neutral)
          if (src < k) {
            float v = w[src * n + j];
            code = v >= 0.5f ? 2 : (v <= -0.5f ? 0 : 1);
          }
          byte |= code << (2 * p);
        }
        out[row * n + j] = byte;
      }
    }
  });
}

// packed (s, n) -> W (k, n) float in {-1, 0, +1}.
void tp_unpack_ternary(const uint8_t* packed, float* out, int64_t s, int64_t n,
                       int64_t k) {
  parallel_cols(n, [&](int64_t j0, int64_t j1) {
    for (int64_t row = 0; row < s; ++row) {
      for (int64_t j = j0; j < j1; ++j) {
        uint8_t byte = packed[row * n + j];
        for (int p = 0; p < 4; ++p) {
          int64_t dst = p * s + row;
          if (dst < k)
            out[dst * n + j] = static_cast<float>((byte >> (2 * p)) & 0x3) - 1.0f;
        }
      }
    }
  });
}

// W (k, n) float -> packed (ceil8(k)/8 == s, n) uint8, bit = (w >= 0).
void tp_pack_binary(const float* w, uint8_t* out, int64_t k, int64_t n) {
  int64_t kp = ceil_div(k, 8) * 8;
  int64_t s = kp / 8;
  parallel_cols(n, [&](int64_t j0, int64_t j1) {
    for (int64_t row = 0; row < s; ++row) {
      for (int64_t j = j0; j < j1; ++j) {
        uint8_t byte = 0;
        for (int p = 0; p < 8; ++p) {
          int64_t src = p * s + row;
          if (src < k && w[src * n + j] >= 0.0f) byte |= 1u << p;
        }
        out[row * n + j] = byte;
      }
    }
  });
}

// packed (s, n) -> W (k, n); zero_one=0 -> {-1,+1}, zero_one=1 -> {0,1}.
void tp_unpack_binary(const uint8_t* packed, float* out, int64_t s, int64_t n,
                      int64_t k, int zero_one) {
  parallel_cols(n, [&](int64_t j0, int64_t j1) {
    for (int64_t row = 0; row < s; ++row) {
      for (int64_t j = j0; j < j1; ++j) {
        uint8_t byte = packed[row * n + j];
        for (int p = 0; p < 8; ++p) {
          int64_t dst = p * s + row;
          if (dst < k) {
            float bit = static_cast<float>((byte >> p) & 0x1);
            out[dst * n + j] = zero_one ? bit : bit * 2.0f - 1.0f;
          }
        }
      }
    }
  });
}

// Iterative-absmean ternary calibration, per column (independent neuron
// scale): m = mean(|w|); repeat iters: m = mean(|w| over |w| > m/2).
// Outputs latent = clip(w/m, +-1) and scale = m.  Semantics parity with
// reference binary/modules.py:275-298.
void tp_calibrate_ternary(const float* w, float* latent, float* scale,
                          int64_t k, int64_t n, int iters) {
  parallel_cols(n, [&](int64_t j0, int64_t j1) {
    for (int64_t j = j0; j < j1; ++j) {
      double m = 0.0;
      for (int64_t i = 0; i < k; ++i) m += std::fabs(w[i * n + j]);
      m /= static_cast<double>(k);
      for (int it = 0; it < iters; ++it) {
        double sum = 0.0;
        int64_t cnt = 0;
        double thresh = m / 2.0;
        for (int64_t i = 0; i < k; ++i) {
          double a = std::fabs(w[i * n + j]);
          if (a > thresh) {
            sum += a;
            ++cnt;
          }
        }
        m = sum / std::max<int64_t>(cnt, 1);
      }
      scale[j] = static_cast<float>(m);
      for (int64_t i = 0; i < k; ++i) {
        float v = w[i * n + j] / static_cast<float>(m);
        latent[i * n + j] = std::min(1.0f, std::max(-1.0f, v));
      }
    }
  });
}

}  // extern "C"
