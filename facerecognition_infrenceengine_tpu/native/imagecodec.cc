// Native host-side imaging runtime (C ABI, loaded via ctypes).
//
// The reference delegates all host-side image work to OpenCV's C++ core:
// JPEG decode (reference trainingServer.py:221 cv2.imdecode), capture
// buffer resize (infrenceServer.py:581-584), and HUD drawing
// (infrenceServer.py:418-513 draw_enhanced_bounding_box).  This module is
// the TPU build's native equivalent: libjpeg decode/encode, bilinear
// resize / letterbox to the detector canvas, and a small rasterizer
// (rectangles, alpha panels, confidence bars, 5x7 bitmap text) that draws
// straight into numpy-owned uint8 RGB buffers with zero copies.
//
// Build: g++ -O3 -shared -fPIC imagecodec.cc -ljpeg -o libfreimage.so

#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

#include <jpeglib.h>

extern "C" {

// ------------------------------------------------------------------ JPEG --
struct fre_error_mgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

static void fre_error_exit(j_common_ptr cinfo) {
  fre_error_mgr* err = reinterpret_cast<fre_error_mgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decodes JPEG bytes into caller-provided RGB buffer.  Two-phase use:
// call with out=nullptr to get dimensions, then with a H*W*3 buffer.
// Returns 0 ok, -1 decode error, -2 dimensions-only call.
int fre_jpeg_decode(const uint8_t* data, long size, uint8_t* out,
                    int* height, int* width) {
  jpeg_decompress_struct cinfo;
  fre_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = fre_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, static_cast<unsigned long>(size));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *height = static_cast<int>(cinfo.output_height);
  *width = static_cast<int>(cinfo.output_width);
  if (out == nullptr) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  const int stride = (*width) * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out + static_cast<long>(cinfo.output_scanline) * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Encodes H*W*3 RGB into JPEG.  Caller provides a destination buffer of
// capacity cap; returns bytes written, or -1 on error / buffer too small.
long fre_jpeg_encode(const uint8_t* rgb, int height, int width, int quality,
                     uint8_t* dst, long cap) {
  jpeg_compress_struct cinfo;
  fre_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = fre_error_exit;
  unsigned char* mem = nullptr;
  unsigned long mem_size = 0;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_compress(&cinfo);
    if (mem) free(mem);
    return -1;
  }
  jpeg_create_compress(&cinfo);
  jpeg_mem_dest(&cinfo, &mem, &mem_size);
  cinfo.image_width = static_cast<JDIMENSION>(width);
  cinfo.image_height = static_cast<JDIMENSION>(height);
  cinfo.input_components = 3;
  cinfo.in_color_space = JCS_RGB;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, quality, TRUE);
  jpeg_start_compress(&cinfo, TRUE);
  const int stride = width * 3;
  while (cinfo.next_scanline < cinfo.image_height) {
    JSAMPROW row = const_cast<uint8_t*>(rgb) +
                   static_cast<long>(cinfo.next_scanline) * stride;
    jpeg_write_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);
  long written = -1;
  if (static_cast<long>(mem_size) <= cap) {
    memcpy(dst, mem, mem_size);
    written = static_cast<long>(mem_size);
  }
  free(mem);
  return written;
}

// ---------------------------------------------------------------- resize --
// Bilinear resize RGB u8 (src HxWx3 -> dst OHxOWx3), OpenCV-compatible
// pixel-center alignment: src_x = (x + 0.5) * W/OW - 0.5.
void fre_resize_bilinear(const uint8_t* src, int h, int w, uint8_t* dst,
                         int oh, int ow) {
  const float sy = static_cast<float>(h) / oh;
  const float sx = static_cast<float>(w) / ow;
  for (int y = 0; y < oh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    if (fy < 0) fy = 0;
    int y0 = static_cast<int>(fy);
    if (y0 > h - 2) y0 = h - 2 >= 0 ? h - 2 : 0;
    float wy = fy - y0;
    if (h == 1) { y0 = 0; wy = 0; }
    const uint8_t* r0 = src + static_cast<long>(y0) * w * 3;
    const uint8_t* r1 = src + static_cast<long>(h == 1 ? y0 : y0 + 1) * w * 3;
    uint8_t* drow = dst + static_cast<long>(y) * ow * 3;
    for (int x = 0; x < ow; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      if (fx < 0) fx = 0;
      int x0 = static_cast<int>(fx);
      if (x0 > w - 2) x0 = w - 2 >= 0 ? w - 2 : 0;
      float wx = fx - x0;
      if (w == 1) { x0 = 0; wx = 0; }
      const int x1 = (w == 1) ? x0 : x0 + 1;
      for (int c = 0; c < 3; ++c) {
        const float top = r0[x0 * 3 + c] * (1 - wx) + r0[x1 * 3 + c] * wx;
        const float bot = r1[x0 * 3 + c] * (1 - wx) + r1[x1 * 3 + c] * wx;
        const float v = top * (1 - wy) + bot * wy;
        drow[x * 3 + c] = static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
}

// Letterbox into a canvas (top-left anchored, like the detector expects):
// scale = min(OH/h, OW/w), resize, pad the rest with zeros.  Returns scale.
float fre_letterbox(const uint8_t* src, int h, int w, uint8_t* dst, int oh,
                    int ow) {
  const float scale = (static_cast<float>(oh) / h < static_cast<float>(ow) / w)
                          ? static_cast<float>(oh) / h
                          : static_cast<float>(ow) / w;
  int nh = static_cast<int>(h * scale + 0.5f);
  int nw = static_cast<int>(w * scale + 0.5f);
  if (nh > oh) nh = oh;
  if (nw > ow) nw = ow;
  memset(dst, 0, static_cast<long>(oh) * ow * 3);
  uint8_t* tmp = static_cast<uint8_t*>(malloc(static_cast<long>(nh) * nw * 3));
  if (!tmp) return -1.0f;
  fre_resize_bilinear(src, h, w, tmp, nh, nw);
  for (int y = 0; y < nh; ++y) {
    memcpy(dst + static_cast<long>(y) * ow * 3, tmp + static_cast<long>(y) * nw * 3,
           static_cast<long>(nw) * 3);
  }
  free(tmp);
  return scale;
}

// Letterbox directly into s2d4-packed layout [OH/4, OW/4, 48]: packed
// channel (p*4 + q)*3 + c holds raw canvas pixel (4*Y + p, 4*X + q).  The
// permutation costs nothing at pixel-writing time, and it is exactly the
// input layout the fused Pallas detector stem consumes
// (ops/stem_pallas.py) — emitting it here is what lets the fused stem run
// end-to-end without any on-device byte transpose.  Bilinear math is
// identical to fre_resize_bilinear (tests pin letterbox_s2d4 against
// letterbox + host pack, byte-for-byte).  OH, OW must be multiples of 4.
float fre_letterbox_s2d4(const uint8_t* src, int h, int w, uint8_t* dst,
                         int oh, int ow) {
  if ((oh & 3) || (ow & 3)) return -1.0f;
  const float scale = (static_cast<float>(oh) / h < static_cast<float>(ow) / w)
                          ? static_cast<float>(oh) / h
                          : static_cast<float>(ow) / w;
  int nh = static_cast<int>(h * scale + 0.5f);
  int nw = static_cast<int>(w * scale + 0.5f);
  if (nh > oh) nh = oh;
  if (nw > ow) nw = ow;
  memset(dst, 0, static_cast<long>(oh) * ow * 3);
  const int wp = ow / 4;
  const float sy = static_cast<float>(h) / nh;
  const float sx = static_cast<float>(w) / nw;
  for (int y = 0; y < nh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    if (fy < 0) fy = 0;
    int y0 = static_cast<int>(fy);
    if (y0 > h - 2) y0 = h - 2 >= 0 ? h - 2 : 0;
    float wy = fy - y0;
    if (h == 1) { y0 = 0; wy = 0; }
    const uint8_t* r0 = src + static_cast<long>(y0) * w * 3;
    const uint8_t* r1 = src + static_cast<long>(h == 1 ? y0 : y0 + 1) * w * 3;
    uint8_t* prow = dst + (static_cast<long>(y >> 2) * wp) * 48 + (y & 3) * 12;
    for (int x = 0; x < nw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      if (fx < 0) fx = 0;
      int x0 = static_cast<int>(fx);
      if (x0 > w - 2) x0 = w - 2 >= 0 ? w - 2 : 0;
      float wx = fx - x0;
      if (w == 1) { x0 = 0; wx = 0; }
      const int x1 = (w == 1) ? x0 : x0 + 1;
      uint8_t* px = prow + static_cast<long>(x >> 2) * 48 + (x & 3) * 3;
      for (int c = 0; c < 3; ++c) {
        const float top = r0[x0 * 3 + c] * (1 - wx) + r0[x1 * 3 + c] * wx;
        const float bot = r1[x0 * 3 + c] * (1 - wx) + r1[x1 * 3 + c] * wx;
        const float v = top * (1 - wy) + bot * wy;
        px[c] = static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
  return scale;
}

// RGB canvas [H, W, 3] -> packed 4:2:0 YUV in s2d4 layout [H/4, W/4, 24]:
// channels 0-15  = Y of raw pixel (4Y+p, 4X+q) at channel p*4+q,
// channels 16-19 = U of the 2x2 chroma block (2*(2Y+p2), 2*(2X+q2)) at
//                  channel 16 + p2*2 + q2 (average of the block's 4 pixels),
// channels 20-23 = V likewise.  BT.601 full-range (JPEG) coefficients.
// 1.5 bytes/pixel: HALF the host->device bytes of raw RGB — the streaming
// serving path's bottleneck is the transfer link (BENCH_r02: 20 MB/s tunnel
// / 1.2 MB frame), and the device undoes this packing with one constant
// 24->48 matmul (ops/yuv.py) feeding the fused packed program.
int fre_pack_yuv420_s2d4(const uint8_t* src, int h, int w, uint8_t* dst) {
  if ((h & 3) || (w & 3)) return -1;
  const int wp = w / 4;
  for (int yp = 0; yp < h / 4; ++yp) {
    uint8_t* out = dst + static_cast<long>(yp) * wp * 24;
    for (int xp = 0; xp < wp; ++xp, out += 24) {
      const uint8_t* base = src + (static_cast<long>(yp) * 4 * w + xp * 4) * 3;
      for (int p = 0; p < 4; ++p) {
        const uint8_t* row = base + static_cast<long>(p) * w * 3;
        for (int q = 0; q < 4; ++q) {
          const float r = row[q * 3], g = row[q * 3 + 1], b = row[q * 3 + 2];
          out[p * 4 + q] = static_cast<uint8_t>(
              0.299f * r + 0.587f * g + 0.114f * b + 0.5f);
        }
      }
      for (int p2 = 0; p2 < 2; ++p2) {
        for (int q2 = 0; q2 < 2; ++q2) {
          float rs = 0, gs = 0, bs = 0;
          for (int dy = 0; dy < 2; ++dy) {
            const uint8_t* row =
                base + (static_cast<long>(p2) * 2 + dy) * w * 3 + q2 * 6;
            for (int dx = 0; dx < 2; ++dx) {
              rs += row[dx * 3];
              gs += row[dx * 3 + 1];
              bs += row[dx * 3 + 2];
            }
          }
          rs *= 0.25f; gs *= 0.25f; bs *= 0.25f;
          float u = -0.168736f * rs - 0.331264f * gs + 0.5f * bs + 128.0f;
          float v = 0.5f * rs - 0.418688f * gs - 0.081312f * bs + 128.0f;
          if (u < 0) u = 0; if (u > 255) u = 255;
          if (v < 0) v = 0; if (v > 255) v = 255;
          out[16 + p2 * 2 + q2] = static_cast<uint8_t>(u + 0.5f);
          out[20 + p2 * 2 + q2] = static_cast<uint8_t>(v + 0.5f);
        }
      }
    }
  }
  return 0;
}

// Letterbox an RGB frame straight into packed-YUV420 s2d4 [OH/4, OW/4, 24].
float fre_letterbox_yuv420_s2d4(const uint8_t* src, int h, int w,
                                uint8_t* dst, int oh, int ow) {
  if ((oh & 3) || (ow & 3)) return -1.0f;
  uint8_t* canvas =
      static_cast<uint8_t*>(malloc(static_cast<long>(oh) * ow * 3));
  if (!canvas) return -1.0f;
  const float scale = fre_letterbox(src, h, w, canvas, oh, ow);
  if (scale > 0) fre_pack_yuv420_s2d4(canvas, oh, ow, dst);
  free(canvas);
  return scale;
}

// Repack an already-letterboxed raw canvas [H, W, 3] into s2d4 [H/4, W/4,
// 48] (sources that hand us raw canvases; same layout as above).
int fre_pack_s2d4(const uint8_t* src, int h, int w, uint8_t* dst) {
  if ((h & 3) || (w & 3)) return -1;
  const int wp = w / 4;
  for (int y = 0; y < h; ++y) {
    const uint8_t* srow = src + static_cast<long>(y) * w * 3;
    uint8_t* prow = dst + (static_cast<long>(y >> 2) * wp) * 48 + (y & 3) * 12;
    for (int xp = 0; xp < wp; ++xp) {
      memcpy(prow + static_cast<long>(xp) * 48, srow + xp * 12, 12);
    }
  }
  return 0;
}

// ------------------------------------------------------------ rasterizer --
static inline void blend_px(uint8_t* p, uint8_t r, uint8_t g, uint8_t b,
                            float a) {
  p[0] = static_cast<uint8_t>(p[0] * (1 - a) + r * a);
  p[1] = static_cast<uint8_t>(p[1] * (1 - a) + g * a);
  p[2] = static_cast<uint8_t>(p[2] * (1 - a) + b * a);
}

static inline int clampi(int v, int lo, int hi) {
  return v < lo ? lo : (v > hi ? hi : v);
}

// Filled rectangle with alpha blend (alpha in [0,1]; 1 = opaque).
void fre_fill_rect(uint8_t* img, int h, int w, int y0, int x0, int y1, int x1,
                   uint8_t r, uint8_t g, uint8_t b, float alpha) {
  y0 = clampi(y0, 0, h); y1 = clampi(y1, 0, h);
  x0 = clampi(x0, 0, w); x1 = clampi(x1, 0, w);
  for (int y = y0; y < y1; ++y) {
    uint8_t* row = img + (static_cast<long>(y) * w + x0) * 3;
    for (int x = x0; x < x1; ++x, row += 3) blend_px(row, r, g, b, alpha);
  }
}

// Rectangle outline of given thickness.
void fre_draw_rect(uint8_t* img, int h, int w, int y0, int x0, int y1, int x1,
                   int thick, uint8_t r, uint8_t g, uint8_t b) {
  fre_fill_rect(img, h, w, y0, x0, y0 + thick, x1, r, g, b, 1.0f);
  fre_fill_rect(img, h, w, y1 - thick, x0, y1, x1, r, g, b, 1.0f);
  fre_fill_rect(img, h, w, y0, x0, y1, x0 + thick, r, g, b, 1.0f);
  fre_fill_rect(img, h, w, y0, x1 - thick, y1, x1, r, g, b, 1.0f);
}

// Corner-accent box (the reference's "enhanced" HUD style draws bracketed
// corners, infrenceServer.py:430-447): 4 L-shaped corner marks.
void fre_draw_corners(uint8_t* img, int h, int w, int y0, int x0, int y1,
                      int x1, int len, int thick, uint8_t r, uint8_t g,
                      uint8_t b) {
  // top-left
  fre_fill_rect(img, h, w, y0, x0, y0 + thick, x0 + len, r, g, b, 1.0f);
  fre_fill_rect(img, h, w, y0, x0, y0 + len, x0 + thick, r, g, b, 1.0f);
  // top-right
  fre_fill_rect(img, h, w, y0, x1 - len, y0 + thick, x1, r, g, b, 1.0f);
  fre_fill_rect(img, h, w, y0, x1 - thick, y0 + len, x1, r, g, b, 1.0f);
  // bottom-left
  fre_fill_rect(img, h, w, y1 - thick, x0, y1, x0 + len, r, g, b, 1.0f);
  fre_fill_rect(img, h, w, y1 - len, x0, y1, x0 + thick, r, g, b, 1.0f);
  // bottom-right
  fre_fill_rect(img, h, w, y1 - thick, x1 - len, y1, x1, r, g, b, 1.0f);
  fre_fill_rect(img, h, w, y1 - len, x1 - thick, y1, x1, r, g, b, 1.0f);
}

// 5x7 bitmap font, column-major bits (bit0 = top row), uppercase+digits+
// punctuation.  Lowercase maps to uppercase; unknown glyphs render hollow.
static const uint8_t FONT_COLS = 5, FONT_ROWS = 7;
struct Glyph { char ch; uint8_t col[5]; };
static const Glyph FONT[] = {
    {' ', {0x00, 0x00, 0x00, 0x00, 0x00}},
    {'0', {0x3E, 0x51, 0x49, 0x45, 0x3E}},
    {'1', {0x00, 0x42, 0x7F, 0x40, 0x00}},
    {'2', {0x42, 0x61, 0x51, 0x49, 0x46}},
    {'3', {0x21, 0x41, 0x45, 0x4B, 0x31}},
    {'4', {0x18, 0x14, 0x12, 0x7F, 0x10}},
    {'5', {0x27, 0x45, 0x45, 0x45, 0x39}},
    {'6', {0x3C, 0x4A, 0x49, 0x49, 0x30}},
    {'7', {0x01, 0x71, 0x09, 0x05, 0x03}},
    {'8', {0x36, 0x49, 0x49, 0x49, 0x36}},
    {'9', {0x06, 0x49, 0x49, 0x29, 0x1E}},
    {'A', {0x7E, 0x11, 0x11, 0x11, 0x7E}},
    {'B', {0x7F, 0x49, 0x49, 0x49, 0x36}},
    {'C', {0x3E, 0x41, 0x41, 0x41, 0x22}},
    {'D', {0x7F, 0x41, 0x41, 0x22, 0x1C}},
    {'E', {0x7F, 0x49, 0x49, 0x49, 0x41}},
    {'F', {0x7F, 0x09, 0x09, 0x09, 0x01}},
    {'G', {0x3E, 0x41, 0x49, 0x49, 0x7A}},
    {'H', {0x7F, 0x08, 0x08, 0x08, 0x7F}},
    {'I', {0x00, 0x41, 0x7F, 0x41, 0x00}},
    {'J', {0x20, 0x40, 0x41, 0x3F, 0x01}},
    {'K', {0x7F, 0x08, 0x14, 0x22, 0x41}},
    {'L', {0x7F, 0x40, 0x40, 0x40, 0x40}},
    {'M', {0x7F, 0x02, 0x0C, 0x02, 0x7F}},
    {'N', {0x7F, 0x04, 0x08, 0x10, 0x7F}},
    {'O', {0x3E, 0x41, 0x41, 0x41, 0x3E}},
    {'P', {0x7F, 0x09, 0x09, 0x09, 0x06}},
    {'Q', {0x3E, 0x41, 0x51, 0x21, 0x5E}},
    {'R', {0x7F, 0x09, 0x19, 0x29, 0x46}},
    {'S', {0x46, 0x49, 0x49, 0x49, 0x31}},
    {'T', {0x01, 0x01, 0x7F, 0x01, 0x01}},
    {'U', {0x3F, 0x40, 0x40, 0x40, 0x3F}},
    {'V', {0x1F, 0x20, 0x40, 0x20, 0x1F}},
    {'W', {0x3F, 0x40, 0x38, 0x40, 0x3F}},
    {'X', {0x63, 0x14, 0x08, 0x14, 0x63}},
    {'Y', {0x07, 0x08, 0x70, 0x08, 0x07}},
    {'Z', {0x61, 0x51, 0x49, 0x45, 0x43}},
    {'.', {0x00, 0x60, 0x60, 0x00, 0x00}},
    {',', {0x00, 0xA0, 0x60, 0x00, 0x00}},
    {':', {0x00, 0x36, 0x36, 0x00, 0x00}},
    {';', {0x00, 0xB6, 0x76, 0x00, 0x00}},
    {'!', {0x00, 0x00, 0x5F, 0x00, 0x00}},
    {'?', {0x02, 0x01, 0x51, 0x09, 0x06}},
    {'%', {0x63, 0x13, 0x08, 0x64, 0x63}},
    {'-', {0x08, 0x08, 0x08, 0x08, 0x08}},
    {'+', {0x08, 0x08, 0x3E, 0x08, 0x08}},
    {'_', {0x40, 0x40, 0x40, 0x40, 0x40}},
    {'/', {0x60, 0x10, 0x08, 0x04, 0x03}},
    {'(', {0x00, 0x1C, 0x22, 0x41, 0x00}},
    {')', {0x00, 0x41, 0x22, 0x1C, 0x00}},
    {'[', {0x00, 0x7F, 0x41, 0x41, 0x00}},
    {']', {0x00, 0x41, 0x41, 0x7F, 0x00}},
    {'\'', {0x00, 0x05, 0x03, 0x00, 0x00}},
    {'"', {0x00, 0x07, 0x00, 0x07, 0x00}},
    {'#', {0x14, 0x7F, 0x14, 0x7F, 0x14}},
    {'*', {0x14, 0x08, 0x3E, 0x08, 0x14}},
    {'=', {0x14, 0x14, 0x14, 0x14, 0x14}},
    {'<', {0x08, 0x14, 0x22, 0x41, 0x00}},
    {'>', {0x00, 0x41, 0x22, 0x14, 0x08}},
    {'@', {0x32, 0x49, 0x79, 0x41, 0x3E}},
};

static const uint8_t* glyph_cols(char c) {
  if (c >= 'a' && c <= 'z') c = static_cast<char>(c - 'a' + 'A');
  const int n = sizeof(FONT) / sizeof(FONT[0]);
  for (int i = 0; i < n; ++i) {
    if (FONT[i].ch == c) return FONT[i].col;
  }
  return nullptr;
}

// Draw text at (y, x) top-left, integer scale >= 1.
void fre_draw_text(uint8_t* img, int h, int w, int y, int x, const char* text,
                   int scale, uint8_t r, uint8_t g, uint8_t b) {
  if (scale < 1) scale = 1;
  int cx = x;
  for (const char* p = text; *p; ++p) {
    const uint8_t* cols = glyph_cols(*p);
    if (cols) {
      for (int cc = 0; cc < FONT_COLS; ++cc) {
        for (int rr = 0; rr < FONT_ROWS; ++rr) {
          if (cols[cc] & (1 << rr)) {
            fre_fill_rect(img, h, w, y + rr * scale, cx + cc * scale,
                          y + (rr + 1) * scale, cx + (cc + 1) * scale,
                          r, g, b, 1.0f);
          }
        }
      }
    } else {
      fre_draw_rect(img, h, w, y, cx, y + FONT_ROWS * scale,
                    cx + FONT_COLS * scale, 1, r, g, b);
    }
    cx += (FONT_COLS + 1) * scale;
  }
}

// Horizontal confidence bar: outline + proportional fill.
void fre_draw_bar(uint8_t* img, int h, int w, int y0, int x0, int y1, int x1,
                  float frac, uint8_t r, uint8_t g, uint8_t b) {
  if (frac < 0) frac = 0;
  if (frac > 1) frac = 1;
  fre_draw_rect(img, h, w, y0, x0, y1, x1, 1, r, g, b);
  const int fill_w = static_cast<int>((x1 - x0 - 4) * frac);
  fre_fill_rect(img, h, w, y0 + 2, x0 + 2, y1 - 2, x0 + 2 + fill_w, r, g, b,
                0.85f);
}

}  // extern "C"
