// Native host-side runtime kernels for kinet_tpu.
//
// The reference's only native code is the CUDA MSDeformAttn op (on TPU that
// work lives in XLA/Pallas). What remains host-side and hot in this
// framework is the per-frame data path: MOTChallenge CSV parsing (det/gt
// files are read per sequence), image normalize+pad into the static bucket
// (runs every frame in the tracker loop and every sample in the train
// loader), and greedy NMS over track boxes. These are implemented here and
// exposed through a plain C ABI for ctypes (pybind11 is not available in
// this environment).
//
// Build: make -C kinet_tpu/native   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// MOTChallenge CSV parsing: each line "frame,id,x,y,w,h,conf,...".
// Returns the number of rows parsed; writes up to max_rows*7 floats into
// `out` as [frame, id, x, y, w, h, conf] rows. Returns -1 on IO error.
// ---------------------------------------------------------------------------
int64_t parse_mot_csv(const char* path, float* out, int64_t max_rows) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<char> buf(size + 1);
  size_t rd = fread(buf.data(), 1, size, f);
  fclose(f);
  buf[rd] = '\0';

  int64_t rows = 0;
  char* p = buf.data();
  char* end = buf.data() + rd;
  while (p < end && rows < max_rows) {
    // parse up to 7 comma-separated floats
    float vals[7] = {0, 0, 0, 0, 0, 0, 1.0f};
    int col = 0;
    while (col < 7 && p < end && *p != '\n' && *p != '\r') {
      char* next = nullptr;
      vals[col] = strtof(p, &next);
      if (next == p) break;
      p = next;
      ++col;
      if (*p == ',') ++p;
    }
    // skip rest of line
    while (p < end && *p != '\n') ++p;
    while (p < end && (*p == '\n' || *p == '\r')) ++p;
    if (col >= 6) {
      memcpy(out + rows * 7, vals, 7 * sizeof(float));
      ++rows;
    }
  }
  return rows;
}

// ---------------------------------------------------------------------------
// Image normalize + pad: uint8 HWC RGB -> float32 [PH, PW, 3], ImageNet
// normalized, zero beyond (h, w); mask[PH*PW] gets 1 on padding.
// ---------------------------------------------------------------------------
void normalize_pad_image(const uint8_t* img, int64_t h, int64_t w,
                         int64_t ph, int64_t pw, float* out, uint8_t* mask) {
  static const float mean[3] = {0.485f, 0.456f, 0.406f};
  static const float stdv[3] = {0.229f, 0.224f, 0.225f};
  const float inv255 = 1.0f / 255.0f;
  float scale[3], shift[3];
  for (int c = 0; c < 3; ++c) {
    scale[c] = inv255 / stdv[c];
    shift[c] = -mean[c] / stdv[c];
  }
  memset(out, 0, sizeof(float) * ph * pw * 3);
  memset(mask, 1, ph * pw);
  for (int64_t y = 0; y < h; ++y) {
    const uint8_t* src = img + y * w * 3;
    float* dst = out + y * pw * 3;
    uint8_t* mrow = mask + y * pw;
    for (int64_t x = 0; x < w; ++x) {
      dst[x * 3 + 0] = src[x * 3 + 0] * scale[0] + shift[0];
      dst[x * 3 + 1] = src[x * 3 + 1] * scale[1] + shift[1];
      dst[x * 3 + 2] = src[x * 3 + 2] * scale[2] + shift[2];
      mrow[x] = 0;
    }
  }
}

// ---------------------------------------------------------------------------
// Greedy NMS (torchvision contract: IoU strictly greater suppresses).
// boxes: [n, 4] xyxy; scores: [n]. Writes kept indices (desc score order)
// into `keep`; returns the kept count.
// ---------------------------------------------------------------------------
int64_t greedy_nms(const float* boxes, const float* scores, int64_t n,
                   float iou_threshold, int64_t* keep) {
  std::vector<int64_t> order(n);
  for (int64_t i = 0; i < n; ++i) order[i] = i;
  // stable sort by descending score
  for (int64_t i = 1; i < n; ++i) {
    int64_t v = order[i];
    int64_t j = i - 1;
    while (j >= 0 && scores[order[j]] < scores[v]) {
      order[j + 1] = order[j];
      --j;
    }
    order[j + 1] = v;
  }
  std::vector<char> dead(n, 0);
  int64_t kept = 0;
  for (int64_t oi = 0; oi < n; ++oi) {
    int64_t i = order[oi];
    if (dead[i]) continue;
    keep[kept++] = i;
    const float* a = boxes + i * 4;
    float area_a = (a[2] - a[0]) * (a[3] - a[1]);
    for (int64_t oj = oi + 1; oj < n; ++oj) {
      int64_t j = order[oj];
      if (dead[j]) continue;
      const float* b = boxes + j * 4;
      float x0 = a[0] > b[0] ? a[0] : b[0];
      float y0 = a[1] > b[1] ? a[1] : b[1];
      float x1 = a[2] < b[2] ? a[2] : b[2];
      float y1 = a[3] < b[3] ? a[3] : b[3];
      float iw = x1 - x0 > 0 ? x1 - x0 : 0;
      float ih = y1 - y0 > 0 ? y1 - y0 : 0;
      float inter = iw * ih;
      float area_b = (b[2] - b[0]) * (b[3] - b[1]);
      float uni = area_a + area_b - inter;
      float iou = uni > 1e-9f ? inter / uni : 0.0f;
      if (iou > iou_threshold) dead[j] = 1;
    }
  }
  return kept;
}

}  // extern "C"
