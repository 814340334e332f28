// Native host-side data path: threaded JPEG clip decode + fused normalize.
//
// The reference feeds GPUs from per-rank Python DataLoader worker processes
// (mmseg/datasets/builder.py:141-177). The TPU-native replacement keeps the
// chip fed from the host CPU: this library decodes all frames of a clip in
// parallel worker threads (libjpeg) and fuses the BGR→RGB conversion,
// mean/std normalisation, and f32 conversion into a single pass over the
// pixels — work that in the Python path costs several numpy passes per
// frame plus per-frame interpreter overhead.
//
// Exposed C ABI (consumed via ctypes from vss_cffm_tpu/native/__init__.py):
//   vss_decode_jpeg        : one JPEG buffer → uint8 BGR HWC
//   vss_jpeg_dims          : peek (height, width) without full decode
//   vss_normalize_f32      : uint8 BGR HWC → f32 (x[::-1] - mean) / std
//   vss_decode_clip_normalized :
//       N JPEG buffers → (N, H, W, 3) f32 normalized, threaded decode
//
// Build: make -C vss_cffm_tpu/native   (g++ + libjpeg, no other deps)

#include <cstdio>  // jpeglib.h needs FILE declared first

#include <csetjmp>

#include <jpeglib.h>

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// libjpeg's default error handler exit()s the process; recover via longjmp.
struct JmpErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf env;
};

void jmp_error_exit(j_common_ptr cinfo) {
  longjmp(reinterpret_cast<JmpErrorMgr*>(cinfo->err)->env, 1);
}

}  // namespace

extern "C" {

// Decode a JPEG byte buffer to uint8 BGR HWC (cv2 channel order, matching
// mmcv's LoadImageFromFile). Returns 0 on success.
int vss_decode_jpeg(const uint8_t* buf, int64_t len, uint8_t* out, int out_h,
                    int out_w) {
  jpeg_decompress_struct cinfo;
  JmpErrorMgr jerr;
  // Constructed BEFORE setjmp: the longjmp from the libjpeg error handler
  // must not cross the initialization of any non-trivially-destructible
  // automatic object (UB + leak otherwise); declared here, the vector's
  // destructor runs normally on the error-path return.
  std::vector<uint8_t> row;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jmp_error_exit;
  if (setjmp(jerr.env)) {
    jpeg_destroy_decompress(&cinfo);
    return 3;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, static_cast<unsigned long>(len));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  if (static_cast<int>(cinfo.output_height) != out_h ||
      static_cast<int>(cinfo.output_width) != out_w ||
      cinfo.output_components != 3) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  row.resize(static_cast<size_t>(out_w) * 3);
  uint8_t* rowp = row.data();
  while (cinfo.output_scanline < cinfo.output_height) {
    int y = static_cast<int>(cinfo.output_scanline);
    jpeg_read_scanlines(&cinfo, &rowp, 1);
    uint8_t* dst = out + static_cast<size_t>(y) * out_w * 3;
    // RGB (libjpeg) → BGR (cv2 order)
    for (int x = 0; x < out_w; ++x) {
      dst[x * 3 + 0] = rowp[x * 3 + 2];
      dst[x * 3 + 1] = rowp[x * 3 + 1];
      dst[x * 3 + 2] = rowp[x * 3 + 0];
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

int vss_jpeg_dims(const uint8_t* buf, int64_t len, int* h, int* w) {
  jpeg_decompress_struct cinfo;
  JmpErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jmp_error_exit;
  if (setjmp(jerr.env)) {
    jpeg_destroy_decompress(&cinfo);
    return 3;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, static_cast<unsigned long>(len));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  *h = static_cast<int>(cinfo.image_height);
  *w = static_cast<int>(cinfo.image_width);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Fused (BGR uint8 → optional RGB flip → f32 (x - mean) / std).
// mean/std given in the *output* channel order (mmcv convention).
void vss_normalize_f32(const uint8_t* src, float* dst, int64_t n_pixels,
                       const float* mean, const float* std_, int to_rgb) {
  float inv0 = 1.0f / std_[0], inv1 = 1.0f / std_[1], inv2 = 1.0f / std_[2];
  float m0 = mean[0], m1 = mean[1], m2 = mean[2];
  if (to_rgb) {
    for (int64_t i = 0; i < n_pixels; ++i) {
      const uint8_t* p = src + i * 3;  // BGR
      float* q = dst + i * 3;          // RGB out
      q[0] = (static_cast<float>(p[2]) - m0) * inv0;
      q[1] = (static_cast<float>(p[1]) - m1) * inv1;
      q[2] = (static_cast<float>(p[0]) - m2) * inv2;
    }
  } else {
    for (int64_t i = 0; i < n_pixels; ++i) {
      const uint8_t* p = src + i * 3;
      float* q = dst + i * 3;
      q[0] = (static_cast<float>(p[0]) - m0) * inv0;
      q[1] = (static_cast<float>(p[1]) - m1) * inv1;
      q[2] = (static_cast<float>(p[2]) - m2) * inv2;
    }
  }
}

// Threaded clip decode + fused normalize: n frames, each a JPEG buffer of
// identical dimensions (h, w), into one (n, h, w, 3) f32 tensor.
// Returns 0 on success, else the first nonzero per-frame status.
int vss_decode_clip_normalized(const uint8_t** bufs, const int64_t* lens,
                               int n, int h, int w, const float* mean,
                               const float* std_, int to_rgb, float* out,
                               int n_threads) {
  std::atomic<int> status{0};
  std::atomic<int> next{0};
  auto worker = [&]() {
    std::vector<uint8_t> tmp(static_cast<size_t>(h) * w * 3);
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      int rc = vss_decode_jpeg(bufs[i], lens[i], tmp.data(), h, w);
      if (rc != 0) {
        int expected = 0;
        status.compare_exchange_strong(expected, rc);
        continue;
      }
      vss_normalize_f32(tmp.data(), out + static_cast<int64_t>(i) * h * w * 3,
                        static_cast<int64_t>(h) * w, mean, std_, to_rgb);
    }
  };
  int workers = n_threads > 0 ? n_threads : 1;
  if (workers > n) workers = n;
  std::vector<std::thread> threads;
  threads.reserve(workers);
  for (int t = 0; t < workers; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return status.load();
}

}  // extern "C"
