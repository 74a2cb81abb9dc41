// Multithreaded image preprocessing for the serving input pipeline.
//
// The TPU-native framework keeps all NN compute on-device; host-side work is
// the batch input pipeline - decode/resize/layout/quantize - which the
// reference delegates to its caller (Caffe2 feeds preprocessed NHWC uint8,
// README.md:58-147).  Here that pipeline is a first-class native component:
// bilinear resize + float->uint8 quantization over a batch, parallelized
// across a persistent pthread pool (the one legitimate home for host threads
// in this design - the compute-side pthreadpool is replaced by XLA
// partitioning, SURVEY.md 2.1D).
//
// Exposed via ctypes as libqnnpack_tpu_native.so (qnnpack_tpu/io/native.py).

#include <stdint.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <functional>
#include <mutex>
#include <thread>
#include <vector>

#define EXPORT extern "C" __attribute__((visibility("default")))

namespace {

// Minimal persistent thread pool with a parallel-for primitive.
class ThreadPool {
 public:
  explicit ThreadPool(unsigned threads) {
    if (threads == 0) threads = 1;
    for (unsigned i = 0; i < threads; i++) {
      workers_.emplace_back([this] { WorkerLoop(); });
    }
  }

  ~ThreadPool() {
    {
      std::unique_lock<std::mutex> lock(mu_);
      shutdown_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }

  // Runs fn(i) for i in [0, n) across the pool; blocks until done.
  void ParallelFor(size_t n, const std::function<void(size_t)>& fn) {
    if (n == 0) return;
    {
      std::unique_lock<std::mutex> lock(mu_);
      fn_ = &fn;
      next_.store(0, std::memory_order_relaxed);
      total_ = n;
      remaining_.store(n, std::memory_order_relaxed);
      generation_++;
    }
    cv_.notify_all();
    // The calling thread participates too.
    Drain();
    std::unique_lock<std::mutex> lock(mu_);
    done_cv_.wait(lock, [this] {
      return remaining_.load(std::memory_order_acquire) == 0;
    });
    fn_ = nullptr;
  }

  static ThreadPool& Instance() {
    static ThreadPool pool(std::thread::hardware_concurrency());
    return pool;
  }

 private:
  void Drain() {
    const std::function<void(size_t)>* fn = fn_;
    if (fn == nullptr) return;
    while (true) {
      size_t i = next_.fetch_add(1, std::memory_order_relaxed);
      if (i >= total_) break;
      (*fn)(i);
      if (remaining_.fetch_sub(1, std::memory_order_acq_rel) == 1) {
        done_cv_.notify_all();
      }
    }
  }

  void WorkerLoop() {
    uint64_t seen = 0;
    while (true) {
      {
        std::unique_lock<std::mutex> lock(mu_);
        cv_.wait(lock, [this, &seen] {
          return shutdown_ || generation_ != seen;
        });
        if (shutdown_) return;
        seen = generation_;
      }
      Drain();
    }
  }

  std::vector<std::thread> workers_;
  std::mutex mu_;
  std::condition_variable cv_;
  std::condition_variable done_cv_;
  const std::function<void(size_t)>* fn_ = nullptr;
  std::atomic<size_t> next_{0};
  std::atomic<size_t> remaining_{0};
  size_t total_ = 0;
  uint64_t generation_ = 0;
  bool shutdown_ = false;
};

inline uint8_t QuantizeOne(float v, float inv_scale, int32_t zero_point) {
  const long r = lrintf(v * inv_scale) + zero_point;
  return (uint8_t)std::min(255L, std::max(0L, r));
}

}  // namespace

// Bilinear-resize a batch of float HWC images and quantize to uint8 NHWC.
//   src:  [batch, src_h, src_w, channels] float32
//   dst:  [batch, dst_h, dst_w, channels] uint8
//   quantized value = clamp(round(v / scale) + zero_point, 0, 255)
EXPORT void qt_resize_quantize_batch(const float* src, int batch, int src_h,
                                     int src_w, int channels, uint8_t* dst,
                                     int dst_h, int dst_w, float scale,
                                     int zero_point) {
  const float inv_scale = 1.0f / scale;
  const float y_ratio =
      dst_h > 1 ? (float)(src_h - 1) / (float)(dst_h - 1) : 0.0f;
  const float x_ratio =
      dst_w > 1 ? (float)(src_w - 1) / (float)(dst_w - 1) : 0.0f;
  const size_t src_img = (size_t)src_h * src_w * channels;
  const size_t dst_img = (size_t)dst_h * dst_w * channels;

  ThreadPool::Instance().ParallelFor(
      (size_t)batch * dst_h, [&](size_t task) {
        const int b = (int)(task / dst_h);
        const int oy = (int)(task % dst_h);
        const float* img = src + (size_t)b * src_img;
        uint8_t* out = dst + (size_t)b * dst_img +
                       (size_t)oy * dst_w * channels;
        const float fy = oy * y_ratio;
        const int y0 = (int)fy;
        const int y1 = std::min(y0 + 1, src_h - 1);
        const float wy = fy - y0;
        for (int ox = 0; ox < dst_w; ox++) {
          const float fx = ox * x_ratio;
          const int x0 = (int)fx;
          const int x1 = std::min(x0 + 1, src_w - 1);
          const float wx = fx - x0;
          const float* p00 = img + ((size_t)y0 * src_w + x0) * channels;
          const float* p01 = img + ((size_t)y0 * src_w + x1) * channels;
          const float* p10 = img + ((size_t)y1 * src_w + x0) * channels;
          const float* p11 = img + ((size_t)y1 * src_w + x1) * channels;
          for (int c = 0; c < channels; c++) {
            const float top = p00[c] + (p01[c] - p00[c]) * wx;
            const float bot = p10[c] + (p11[c] - p10[c]) * wx;
            out[(size_t)ox * channels + c] =
                QuantizeOne(top + (bot - top) * wy, inv_scale, zero_point);
          }
        }
      });
}

// Quantize a float32 buffer to uint8 (no resize), parallel over rows.
EXPORT void qt_quantize(const float* src, size_t n, uint8_t* dst, float scale,
                        int zero_point) {
  const float inv_scale = 1.0f / scale;
  const size_t chunk = 1 << 16;
  const size_t tasks = (n + chunk - 1) / chunk;
  ThreadPool::Instance().ParallelFor(tasks, [&](size_t t) {
    const size_t begin = t * chunk;
    const size_t end = std::min(begin + chunk, n);
    for (size_t i = begin; i < end; i++) {
      dst[i] = QuantizeOne(src[i], inv_scale, zero_point);
    }
  });
}

// Dequantize uint8 -> float32.
EXPORT void qt_dequantize(const uint8_t* src, size_t n, float* dst,
                          float scale, int zero_point) {
  const size_t chunk = 1 << 16;
  const size_t tasks = (n + chunk - 1) / chunk;
  ThreadPool::Instance().ParallelFor(tasks, [&](size_t t) {
    const size_t begin = t * chunk;
    const size_t end = std::min(begin + chunk, n);
    for (size_t i = begin; i < end; i++) {
      dst[i] = ((int32_t)src[i] - zero_point) * scale;
    }
  });
}
