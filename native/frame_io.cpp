// Native frame IO: libpng decode/encode + a pthread worker pool that loads a
// whole frame directory into one contiguous float32 [N, H, W] buffer.
//
// This is the framework's L1 ingestion runtime — the native counterpart of
// the reference's OpenCV imgcodecs/videoio layer (extract_images_from_mov.cpp
// uses cv::VideoCapture/cv::imwrite; main.cpp:1141 reads PNGs per frame with
// cv::imread). Design differences, TPU-first:
//   * frames decode in parallel into ONE pinned host buffer shaped for a
//     single host->HBM transfer (the device wants [B, H, W] batches, not
//     per-frame mats);
//   * grayscale conversion (BT.601, what cv::imread(IMREAD_GRAYSCALE) uses)
//     and [0,1] float scaling happen during decode, touching each pixel once;
//   * bilinear resize (the README's 50%-downscale speed tip, README.md:171)
//     is fused into the same pass.
//
// Exposed as a C ABI for ctypes (no pybind11 in this image).

#include <png.h>
#include <pthread.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include <atomic>
#include <cstdint>
#include <vector>

namespace {

// BT.601 luma weights in 16.16 fixed point (matches cv::imread grayscale).
constexpr uint32_t kWR = 19595;   // 0.299
constexpr uint32_t kWG = 38470;   // 0.587
constexpr uint32_t kWB = 7471;    // 0.114

struct DecodedImage {
  std::vector<float> gray;  // h * w, [0, 1]
  int h = 0;
  int w = 0;
};

// Decode one PNG to grayscale float32. Returns 0 on success.
int DecodePngGray(const char* path, DecodedImage* out) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return -1;
  png_byte header[8];
  if (fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
    fclose(fp);
    return -2;
  }
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return -3;
  }
  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  int bit_depth = png_get_bit_depth(png, info);
  int color = png_get_color_type(png, info);

  // Normalize every input to 8-bit RGB (or gray).
  if (bit_depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_set_strip_alpha(png);
  png_read_update_info(png, info);

  int channels = png_get_channels(png, info);
  size_t rowbytes = png_get_rowbytes(png, info);
  std::vector<png_byte> row(rowbytes);
  out->gray.resize(static_cast<size_t>(w) * h);
  out->h = static_cast<int>(h);
  out->w = static_cast<int>(w);

  constexpr float kInv255 = 1.0f / 255.0f;
  for (png_uint_32 y = 0; y < h; ++y) {
    png_read_row(png, row.data(), nullptr);
    float* dst = out->gray.data() + static_cast<size_t>(y) * w;
    if (channels == 1) {
      for (png_uint_32 x = 0; x < w; ++x) dst[x] = row[x] * kInv255;
    } else {  // RGB (alpha stripped)
      for (png_uint_32 x = 0; x < w; ++x) {
        const png_byte* p = row.data() + static_cast<size_t>(x) * channels;
        uint32_t v = kWR * p[0] + kWG * p[1] + kWB * p[2];
        dst[x] = static_cast<float>(v >> 16) * kInv255;
      }
    }
  }
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return 0;
}

// Bilinear resize src (sh x sw) -> dst (dh x dw), align-corners=false.
void ResizeBilinear(const float* src, int sh, int sw, float* dst, int dh,
                    int dw) {
  const float sy = static_cast<float>(sh) / dh;
  const float sx = static_cast<float>(sw) / dw;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    if (fy < 0) fy = 0;
    if (fy > sh - 1) fy = static_cast<float>(sh - 1);
    int y0 = static_cast<int>(fy);
    if (y0 > sh - 2) y0 = sh - 2;
    float wy = fy - y0;
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      if (fx < 0) fx = 0;
      if (fx > sw - 1) fx = static_cast<float>(sw - 1);
      int x0 = static_cast<int>(fx);
      if (x0 > sw - 2) x0 = sw - 2;
      float wx = fx - x0;
      const float* r0 = src + static_cast<size_t>(y0) * sw;
      const float* r1 = r0 + sw;
      dst[static_cast<size_t>(y) * dw + x] =
          (1 - wy) * ((1 - wx) * r0[x0] + wx * r0[x0 + 1]) +
          wy * ((1 - wx) * r1[x0] + wx * r1[x0 + 1]);
    }
  }
}

struct BatchJob {
  const char* const* paths;
  int count;
  float* out;       // [count, h, w]
  int h, w;         // target shape (resize if decode differs)
  std::atomic<int> next{0};
  std::atomic<int> failures{0};
};

void* Worker(void* arg) {
  BatchJob* job = static_cast<BatchJob*>(arg);
  DecodedImage img;
  for (;;) {
    int i = job->next.fetch_add(1);
    if (i >= job->count) break;
    if (DecodePngGray(job->paths[i], &img) != 0) {
      job->failures.fetch_add(1);
      memset(job->out + static_cast<size_t>(i) * job->h * job->w, 0,
             sizeof(float) * job->h * job->w);
      continue;
    }
    float* dst = job->out + static_cast<size_t>(i) * job->h * job->w;
    if (img.h == job->h && img.w == job->w) {
      memcpy(dst, img.gray.data(), sizeof(float) * job->h * job->w);
    } else {
      ResizeBilinear(img.gray.data(), img.h, img.w, dst, job->h, job->w);
    }
  }
  return nullptr;
}

}  // namespace

extern "C" {

// Probe a PNG's dimensions. Returns 0 on success.
int frameio_png_shape(const char* path, int* h, int* w) {
  DecodedImage img;  // full decode; shape probes happen once per sequence
  int rc = DecodePngGray(path, &img);
  if (rc != 0) return rc;
  *h = img.h;
  *w = img.w;
  return 0;
}

// Decode one PNG to grayscale float32 at (h, w) (resizing if needed).
int frameio_load_gray(const char* path, float* out, int h, int w) {
  DecodedImage img;
  int rc = DecodePngGray(path, &img);
  if (rc != 0) return rc;
  if (img.h == h && img.w == w) {
    memcpy(out, img.gray.data(), sizeof(float) * h * w);
  } else {
    ResizeBilinear(img.gray.data(), img.h, img.w, out, h, w);
  }
  return 0;
}

// Parallel batch load: decode `count` PNGs into out[count, h, w] using
// `num_threads` workers. Returns the number of failed frames (0 = all good).
int frameio_load_batch_gray(const char* const* paths, int count, float* out,
                            int h, int w, int num_threads) {
  if (num_threads < 1) num_threads = 1;
  if (num_threads > count) num_threads = count;
  BatchJob job;
  job.paths = paths;
  job.count = count;
  job.out = out;
  job.h = h;
  job.w = w;
  std::vector<pthread_t> threads(num_threads);
  for (int t = 0; t < num_threads; ++t)
    pthread_create(&threads[t], nullptr, Worker, &job);
  for (int t = 0; t < num_threads; ++t) pthread_join(threads[t], nullptr);
  return job.failures.load();
}

// Write a grayscale float32 [h, w] image in [0,1] as an 8-bit PNG.
int frameio_write_gray(const char* path, const float* img, int h, int w) {
  FILE* fp = fopen(path, "wb");
  if (!fp) return -1;
  png_structp png =
      png_create_write_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_write_struct(&png, &info);
    fclose(fp);
    return -2;
  }
  png_init_io(png, fp);
  png_set_IHDR(png, info, w, h, 8, PNG_COLOR_TYPE_GRAY, PNG_INTERLACE_NONE,
               PNG_COMPRESSION_TYPE_DEFAULT, PNG_FILTER_TYPE_DEFAULT);
  png_write_info(png, info);
  std::vector<png_byte> row(w);
  for (int y = 0; y < h; ++y) {
    const float* src = img + static_cast<size_t>(y) * w;
    for (int x = 0; x < w; ++x) {
      float v = src[x];
      if (v < 0) v = 0;
      if (v > 1) v = 1;
      row[x] = static_cast<png_byte>(v * 255.0f + 0.5f);
    }
    png_write_row(png, row.data());
  }
  png_write_end(png, nullptr);
  png_destroy_write_struct(&png, &info);
  fclose(fp);
  return 0;
}

}  // extern "C"
