// icka_native: host-side data-plane primitives for the TPU pipeline.
//
// The reference decodes images with PIL/torchvision on the Python side
// (`My_cross_attention.py:115-122,276-281`), single-threaded, materializing
// the whole dataset ahead of time. Feeding a v5e at thousands of
// image+sentence pairs/sec needs a native decode path: this library decodes
// JPEGs with libjpeg and box-resizes to the device-side preprocessing
// input size, across a pthread worker pool, writing straight into a
// caller-provided (numpy) buffer — zero Python-object overhead per image.
//
// Exposed C API (consumed via ctypes from icka_tpu.data.native):
//   icka_decode_jpeg_file(path, out_size, out)            -> 0 on success
//   icka_decode_jpeg_batch(paths, n, out_size, out, nthr) -> #failures
//   icka_crc32(buf, len)                                  -> checksum (tests)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <csetjmp>
#include <pthread.h>

#include <jpeglib.h>

extern "C" {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

static void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Box-filter resize from (w, h, 3) RGB to (out, out, 3). Box averaging is
// the right filter for the large downscale factors here (e.g. 1024->256);
// the fine-grained random crop happens later on-device.
static void box_resize(const uint8_t* src, int w, int h, int out,
                       uint8_t* dst) {
  for (int oy = 0; oy < out; ++oy) {
    int y0 = (int)((int64_t)oy * h / out);
    int y1 = (int)(((int64_t)oy + 1) * h / out);
    if (y1 <= y0) y1 = y0 + 1;
    if (y1 > h) y1 = h;
    for (int ox = 0; ox < out; ++ox) {
      int x0 = (int)((int64_t)ox * w / out);
      int x1 = (int)(((int64_t)ox + 1) * w / out);
      if (x1 <= x0) x1 = x0 + 1;
      if (x1 > w) x1 = w;
      uint32_t acc[3] = {0, 0, 0};
      int count = (y1 - y0) * (x1 - x0);
      for (int y = y0; y < y1; ++y) {
        const uint8_t* row = src + ((int64_t)y * w + x0) * 3;
        for (int x = x0; x < x1; ++x) {
          acc[0] += row[0];
          acc[1] += row[1];
          acc[2] += row[2];
          row += 3;
        }
      }
      uint8_t* o = dst + ((int64_t)oy * out + ox) * 3;
      o[0] = (uint8_t)(acc[0] / count);
      o[1] = (uint8_t)(acc[1] / count);
      o[2] = (uint8_t)(acc[2] / count);
    }
  }
}

// Decode one JPEG file to RGB and resize into out (out_size*out_size*3).
int icka_decode_jpeg_file(const char* path, int out_size, uint8_t* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;

  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;

  uint8_t* pixels = nullptr;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    free(pixels);
    return 2;  // corrupt stream — caller substitutes the fallback image
  }

  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  // let libjpeg do cheap power-of-two DCT downscaling toward the target
  while (cinfo.scale_denom < 8 &&
         (int)(cinfo.image_width / (cinfo.scale_denom * 2)) >= out_size &&
         (int)(cinfo.image_height / (cinfo.scale_denom * 2)) >= out_size) {
    cinfo.scale_denom *= 2;
  }
  jpeg_start_decompress(&cinfo);

  int w = cinfo.output_width, h = cinfo.output_height;
  int comps = cinfo.output_components;
  if (comps != 3 || w <= 0 || h <= 0) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return 3;
  }
  pixels = (uint8_t*)malloc((size_t)w * h * 3);
  if (!pixels) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return 4;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = pixels + (size_t)cinfo.output_scanline * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);

  box_resize(pixels, w, h, out_size, out);
  free(pixels);
  return 0;
}

struct BatchJob {
  const char** paths;
  int n;
  int out_size;
  uint8_t* out;
  int next;            // guarded by lock
  int failures;
  pthread_mutex_t lock;
};

static void* batch_worker(void* arg) {
  BatchJob* job = (BatchJob*)arg;
  size_t stride = (size_t)job->out_size * job->out_size * 3;
  for (;;) {
    pthread_mutex_lock(&job->lock);
    int i = job->next++;
    pthread_mutex_unlock(&job->lock);
    if (i >= job->n) break;
    int rc = icka_decode_jpeg_file(job->paths[i], job->out_size,
                                   job->out + stride * i);
    if (rc != 0) {
      memset(job->out + stride * i, 0, stride);
      pthread_mutex_lock(&job->lock);
      job->failures++;
      pthread_mutex_unlock(&job->lock);
    }
  }
  return nullptr;
}

// Decode n files into out (n, out_size, out_size, 3) with a thread pool.
// Failed rows are zeroed. Returns the number of failures.
int icka_decode_jpeg_batch(const char** paths, int n, int out_size,
                           uint8_t* out, int num_threads) {
  if (num_threads < 1) num_threads = 1;
  if (num_threads > n) num_threads = n;
  BatchJob job{paths, n, out_size, out, 0, 0, PTHREAD_MUTEX_INITIALIZER};
  if (num_threads == 1) {
    batch_worker(&job);
    return job.failures;
  }
  pthread_t* threads =
      (pthread_t*)malloc(sizeof(pthread_t) * (size_t)num_threads);
  for (int t = 0; t < num_threads; ++t)
    pthread_create(&threads[t], nullptr, batch_worker, &job);
  for (int t = 0; t < num_threads; ++t) pthread_join(threads[t], nullptr);
  free(threads);
  return job.failures;
}

// Small checksum helper so tests can verify buffer plumbing end-to-end.
uint32_t icka_crc32(const uint8_t* buf, uint64_t len) {
  uint32_t crc = 0xFFFFFFFFu;
  for (uint64_t i = 0; i < len; ++i) {
    crc ^= buf[i];
    for (int k = 0; k < 8; ++k)
      crc = (crc >> 1) ^ (0xEDB88320u & (0u - (crc & 1u)));
  }
  return ~crc;
}

}  // extern "C"
