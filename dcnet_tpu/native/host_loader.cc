// Native host input pipeline: threaded JPEG/PNG decode + letterbox +
// normalize, called from Python via ctypes (dcnet_tpu/native/__init__.py).
//
// Rebuilds the hot host loop of the reference's DataLoader workers
// (/root/reference/dataset/vid_loader.py:333-346 decode,
//  /root/reference/utils/transforms.py:123-137 letterbox) as a C++ core:
// one batch-level call decodes every frame of a clip (or batch) in
// parallel with no GIL and writes normalized float32 NHWC directly into a
// caller-owned buffer. The torch DataLoader gets its parallelism from
// worker processes; this core gets it from an in-process thread pool,
// which avoids the fork/IPC tax measured in BENCH_NOTES.md (host pipeline
// section).
//
// Geometry and arithmetic mirror dcnet_tpu/data/transforms.py exactly:
//   ratio     = size / max(h, w)
//   new_shape = round_half_even(w * ratio), round_half_even(h * ratio)
//   dw, dh    = (size - new_w) / 2, (size - new_h) / 2
//   pad       = round(dh - 0.1) / round(dh + 0.1) (same for dw), color
//               (123.7, 116.3, 103.5) BGR? -> no: constant applied on the
//               BGR image, then BGR->RGB swap, matching the Python order
//               (imread BGR -> cvtColor RGB -> letterbox pads RGB tuple).
//   normalize = ((p / 255) - mean) / std  in float32, same op order as
//               numpy so results are bit-identical for equal uint8 input.

#include <opencv2/core.hpp>
#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>

#include <atomic>
#include <cfenv>
#include <cmath>
#include <csetjmp>
#include <cstdio>
#include <cstring>
#include <functional>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>

namespace {

// Python's round() is round-half-to-even; std::nearbyint honours the
// current rounding mode, which is FE_TONEAREST (half-even) by default.
inline int py_round(double v) { return (int)std::nearbyint(v); }

struct LetterboxGeom {
  int new_w, new_h, top, bottom, left, right;
  double ratio, dw, dh;
};

LetterboxGeom letterbox_geom(int h, int w, int size) {
  LetterboxGeom g;
  g.ratio = (double)size / (double)std::max(h, w);
  g.new_w = py_round(w * g.ratio);
  g.new_h = py_round(h * g.ratio);
  g.dw = (size - g.new_w) / 2.0;
  g.dh = (size - g.new_h) / 2.0;
  g.top = py_round(g.dh - 0.1);
  g.bottom = py_round(g.dh + 0.1);
  g.left = py_round(g.dw - 0.1);
  g.right = py_round(g.dw + 0.1);
  return g;
}

// --- direct libjpeg-turbo JPEG decode (straight to RGB) ----------------
// OpenCV's generic imread path costs an extra dispatch + BGR->RGB pass;
// decoding JPEG with libjpeg-turbo's JCS_EXT_RGB writes RGB rows directly.
// Same library family cv2 bundles, default ISLOW IDCT -> identical pixels
// (tests/test_native.py holds both paths to the cv2 reference).

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  longjmp(reinterpret_cast<JpegErr*>(cinfo->err)->jb, 1);
}

void jpeg_silent(j_common_ptr, int) {}
void jpeg_silent_msg(j_common_ptr) {}

bool decode_jpeg_rgb(const unsigned char* data, size_t len, cv::Mat* out) {
  jpeg_decompress_struct cinfo;
  JpegErr err;
  cinfo.err = jpeg_std_error(&err.mgr);
  err.mgr.error_exit = jpeg_err_exit;
  err.mgr.emit_message = jpeg_silent;
  err.mgr.output_message = jpeg_silent_msg;
  if (setjmp(err.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, (unsigned long)len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
#ifdef JCS_EXTENSIONS
  cinfo.out_color_space = JCS_EXT_RGB;  // turbo: decode straight to RGB
#else
  cinfo.out_color_space = JCS_RGB;
#endif
  jpeg_start_decompress(&cinfo);
  out->create((int)cinfo.output_height, (int)cinfo.output_width, CV_8UC3);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out->ptr<unsigned char>((int)cinfo.output_scanline);
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

bool read_file(const char* path, std::vector<unsigned char>* buf) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  if (n <= 0) { std::fclose(f); return false; }
  std::fseek(f, 0, SEEK_SET);
  buf->resize((size_t)n);
  size_t got = std::fread(buf->data(), 1, (size_t)n, f);
  std::fclose(f);
  return got == (size_t)n;
}

// Decode one image to RGB uint8, mirroring VIDDataset._read_image
// (dcnet_tpu/data/vid.py:104-113): JPEGs via libjpeg-turbo, everything
// else via imread(IMREAD_COLOR) + BGR->RGB.
bool decode_rgb(const char* path, cv::Mat* out) {
  std::vector<unsigned char> buf;
  if (read_file(path, &buf) && buf.size() > 3 && buf[0] == 0xFF &&
      buf[1] == 0xD8 && decode_jpeg_rgb(buf.data(), buf.size(), out)) {
    return true;
  }
  cv::Mat bgr = buf.empty()
                    ? cv::Mat()
                    : cv::imdecode(cv::Mat(1, (int)buf.size(), CV_8UC1,
                                           buf.data()),
                                   cv::IMREAD_COLOR);
  if (bgr.empty()) return false;
  cv::cvtColor(bgr, *out, cv::COLOR_BGR2RGB);
  return true;
}

void run_pool(int n, int num_threads, const std::function<void(int)>& fn) {
  int workers = std::max(1, std::min(n, num_threads));
  if (workers == 1) {
    for (int i = 0; i < n; ++i) fn(i);
    return;
  }
  std::atomic<int> next{0};
  std::vector<std::thread> threads;
  threads.reserve(workers);
  for (int t = 0; t < workers; ++t) {
    threads.emplace_back([&] {
      for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) fn(i);
    });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

int dcnet_native_abi_version() { return 5; }

// Decode + letterbox + normalize a batch.
//   paths:   n C strings
//   size:    square output side (e.g. 256)
//   mean,std,pad: float[3], RGB order (pad is the pre-normalize uint8-space
//            constant, e.g. {123.7, 116.3, 103.5})
//   out:     float32 [n, size, size, 3] (caller-allocated)
//   ratios/dws/dhs: float64[n] letterbox geometry per image (double so the
//            caller's box arithmetic matches the Python float path bitwise)
//   ok:      uint8[n]; 0 marks a failed decode (its out slot is zeroed)
// Returns the number of failed decodes.
int dcnet_decode_letterbox_batch(const char** paths, int n, int size,
                                 const float* mean, const float* std_,
                                 const float* pad, float* out, double* ratios,
                                 double* dws, double* dhs, unsigned char* ok,
                                 int num_threads) {
  std::atomic<int> failures{0};
  const size_t plane = (size_t)size * size * 3;
  cv::setNumThreads(0);  // parallelism lives at the batch level
  run_pool(n, num_threads, [&](int i) {
    float* dst = out + (size_t)i * plane;
    cv::Mat rgb;
    if (!decode_rgb(paths[i], &rgb)) {
      std::memset(dst, 0, plane * sizeof(float));
      ratios[i] = 1.0; dws[i] = 0.0; dhs[i] = 0.0; ok[i] = 0;
      failures.fetch_add(1);
      return;
    }
    LetterboxGeom g = letterbox_geom(rgb.rows, rgb.cols, size);
    cv::Mat resized;
    cv::resize(rgb, resized, cv::Size(g.new_w, g.new_h), 0, 0,
               cv::INTER_AREA);
    cv::Mat boxed;
    cv::copyMakeBorder(resized, boxed, g.top, g.bottom, g.left, g.right,
                       cv::BORDER_CONSTANT,
                       cv::Scalar(pad[0], pad[1], pad[2]));
    CV_Assert(boxed.rows == size && boxed.cols == size);
    // ((p / 255) - mean) / std in float32, matching numpy's op order
    // (transforms.py:161-164) so equal uint8 inputs give equal floats.
    for (int r = 0; r < size; ++r) {
      const unsigned char* src = boxed.ptr<unsigned char>(r);
      float* o = dst + (size_t)r * size * 3;
      for (int cpx = 0; cpx < size * 3; cpx += 3) {
        o[cpx + 0] = ((float)src[cpx + 0] / 255.0f - mean[0]) / std_[0];
        o[cpx + 1] = ((float)src[cpx + 1] / 255.0f - mean[1]) / std_[1];
        o[cpx + 2] = ((float)src[cpx + 2] / 255.0f - mean[2]) / std_[2];
      }
    }
    ratios[i] = g.ratio;
    dws[i] = g.dw;
    dhs[i] = g.dh;
    ok[i] = 1;
  });
  return failures.load();
}

// ---------------------------------------------------------------------
// Two-phase raw decode (train path: Python applies flip/HSV/affine on the
// decoded RGB frames, so the native core only parallelizes the decode).
// ---------------------------------------------------------------------

struct DecodeBatch {
  std::vector<cv::Mat> mats;
};

// Phase 1: decode all paths in parallel; returns an opaque handle.
// dims: int32[2*n] filled with (h, w) per image; failed decodes get (0,0).
void* dcnet_decode_batch_open(const char** paths, int n, int* dims,
                              int num_threads) {
  auto* batch = new DecodeBatch();
  batch->mats.resize(n);
  cv::setNumThreads(0);
  run_pool(n, num_threads, [&](int i) {
    cv::Mat rgb;
    if (decode_rgb(paths[i], &rgb)) {
      batch->mats[i] = rgb;
      dims[2 * i] = rgb.rows;
      dims[2 * i + 1] = rgb.cols;
    } else {
      dims[2 * i] = 0;
      dims[2 * i + 1] = 0;
    }
  });
  return batch;
}

// Phase 2: copy image i into a caller-allocated uint8 [h, w, 3] buffer.
int dcnet_decode_batch_copy(void* handle, int i, unsigned char* out) {
  auto* batch = static_cast<DecodeBatch*>(handle);
  if (i < 0 || i >= (int)batch->mats.size() || batch->mats[i].empty())
    return -1;
  const cv::Mat& m = batch->mats[i];
  if (m.isContinuous()) {
    std::memcpy(out, m.data, (size_t)m.rows * m.cols * 3);
  } else {
    for (int r = 0; r < m.rows; ++r)
      std::memcpy(out + (size_t)r * m.cols * 3, m.ptr(r), (size_t)m.cols * 3);
  }
  return 0;
}

void dcnet_decode_batch_close(void* handle) {
  delete static_cast<DecodeBatch*>(handle);
}

}  // extern "C"
