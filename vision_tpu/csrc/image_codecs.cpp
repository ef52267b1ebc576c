// Native image codec shim — the TPU-VM-host analog of the reference's
// _C_stable image extension (torchvision/csrc/io/image/cpu/*).
//
// C ABI (consumed via ctypes from vision_tpu/io/_codecs.py):
//   decode -> caller passes the compressed bytes; we return a malloc'd
//   RGB8 (or RGBA8 for webp/png-with-alpha) buffer + dims; caller frees
//   with vtpu_free.
//
// Reference behaviors mirrored:
//   * decode_jpeg.cpp: libjpeg decompress to 8-bit, channel conversion
//   * decode_png.cpp: libpng with palette/gray expansion, 16->8 strip
//   * decode_webp.cpp: libwebp RGBA decode
//   * encode_jpeg.cpp / encode_png.cpp: quality / default compression
//
// Build: g++ -O2 -shared -fPIC image_codecs.cpp -o libvtpu_codecs.so
//        -ljpeg -lpng -lwebp

#include <csetjmp>
#include <cstdint>
#include <cstdio>  // jpeglib.h needs FILE
#include <cstdlib>
#include <cstring>

#include <jpeglib.h>
#include <png.h>
#include <webp/decode.h>
#include <webp/encode.h>

extern "C" {

struct VtpuImage {
  uint8_t* data;
  int height;
  int width;
  int channels;
};

void vtpu_free(uint8_t* p) { free(p); }

// ------------------------------------------------------------------ JPEG
namespace {
struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  JpegErrorMgr* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}
}  // namespace

int vtpu_decode_jpeg(const uint8_t* buf, size_t len, VtpuImage* out) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  const int w = cinfo.output_width;
  const int h = cinfo.output_height;
  const int c = cinfo.output_components;
  uint8_t* data = static_cast<uint8_t*>(malloc((size_t)w * h * c));
  if (!data) {
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = data + (size_t)cinfo.output_scanline * w * c;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  out->data = data;
  out->height = h;
  out->width = w;
  out->channels = c;
  return 0;
}

int vtpu_encode_jpeg(const uint8_t* rgb, int h, int w, int quality,
                     uint8_t** out_buf, size_t* out_len) {
  jpeg_compress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  unsigned char* mem = nullptr;
  unsigned long mem_size = 0;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_compress(&cinfo);
    if (mem) free(mem);
    return -1;
  }
  jpeg_create_compress(&cinfo);
  jpeg_mem_dest(&cinfo, &mem, &mem_size);
  cinfo.image_width = w;
  cinfo.image_height = h;
  cinfo.input_components = 3;
  cinfo.in_color_space = JCS_RGB;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, quality, TRUE);
  jpeg_start_compress(&cinfo, TRUE);
  while (cinfo.next_scanline < cinfo.image_height) {
    const uint8_t* row = rgb + (size_t)cinfo.next_scanline * w * 3;
    jpeg_write_scanlines(&cinfo, const_cast<uint8_t**>(&row), 1);
  }
  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);
  *out_buf = mem;  // libjpeg mem dest uses malloc; freed via vtpu_free
  *out_len = mem_size;
  return 0;
}

// ------------------------------------------------------------------- PNG
namespace {
struct PngReadState {
  const uint8_t* data;
  size_t len;
  size_t pos;
};

void png_read_fn(png_structp png, png_bytep out, png_size_t n) {
  PngReadState* s = static_cast<PngReadState*>(png_get_io_ptr(png));
  if (s->pos + n > s->len) {
    png_error(png, "read past end");
  }
  memcpy(out, s->data + s->pos, n);
  s->pos += n;
}

struct PngWriteState {
  uint8_t* data;
  size_t len;
  size_t cap;
};

void png_write_fn(png_structp png, png_bytep in, png_size_t n) {
  PngWriteState* s = static_cast<PngWriteState*>(png_get_io_ptr(png));
  if (s->len + n > s->cap) {
    size_t ncap = (s->cap ? s->cap * 2 : 65536);
    while (ncap < s->len + n) ncap *= 2;
    s->data = static_cast<uint8_t*>(realloc(s->data, ncap));
    s->cap = ncap;
  }
  memcpy(s->data + s->len, in, n);
  s->len += n;
}

void png_flush_fn(png_structp) {}
}  // namespace

int vtpu_decode_png(const uint8_t* buf, size_t len, VtpuImage* out) {
  if (png_sig_cmp(buf, 0, 8)) return -1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return -2;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return -2;
  }
  uint8_t* data = nullptr;
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    if (data) free(data);
    return -1;
  }
  PngReadState state{buf, len, 0};
  png_set_read_fn(png, &state, png_read_fn);
  png_read_info(png, info);

  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr,
               nullptr);
  // expand palettes / low-bit gray, strip 16-bit (reference decode_png
  // keeps 16-bit; we normalize to 8-bit like ImageReadMode conversion)
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (bit_depth == 16) png_set_strip_16(png);
  png_read_update_info(png, info);

  const int c = png_get_channels(png, info);
  data = static_cast<uint8_t*>(malloc((size_t)w * h * c));
  if (!data) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -2;
  }
  for (png_uint_32 y = 0; y < h; ++y) {
    png_read_row(png, data + (size_t)y * w * c, nullptr);
  }
  png_destroy_read_struct(&png, &info, nullptr);
  out->data = data;
  out->height = (int)h;
  out->width = (int)w;
  out->channels = c;
  return 0;
}

// 16-bit PNG decode (reference decode_png.cpp keeps 16-bit output; needed
// for KITTI/HD1K flow maps and 16-bit depth/medical images). Returns a
// uint16 host-endian buffer in out->data (reinterpret on the Python side).
int vtpu_decode_png16(const uint8_t* buf, size_t len, VtpuImage* out) {
  if (png_sig_cmp(buf, 0, 8)) return -1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return -2;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return -2;
  }
  uint8_t* data = nullptr;
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    if (data) free(data);
    return -1;
  }
  PngReadState state{buf, len, 0};
  png_set_read_fn(png, &state, png_read_fn);
  png_read_info(png, info);

  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr,
               nullptr);
  if (bit_depth != 16) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -3;  // caller should use the 8-bit path
  }
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_set_swap(png);  // PNG is big-endian; emit host (LE) uint16
  png_read_update_info(png, info);

  const int c = png_get_channels(png, info);
  data = static_cast<uint8_t*>(malloc((size_t)w * h * c * 2));
  if (!data) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -2;
  }
  for (png_uint_32 y = 0; y < h; ++y) {
    png_read_row(png, data + (size_t)y * w * c * 2, nullptr);
  }
  png_destroy_read_struct(&png, &info, nullptr);
  out->data = data;
  out->height = (int)h;
  out->width = (int)w;
  out->channels = c;
  return 0;
}

int vtpu_encode_png(const uint8_t* img, int h, int w, int channels,
                    int compression, uint8_t** out_buf, size_t* out_len) {
  png_structp png =
      png_create_write_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return -2;
  png_infop info = png_create_info_struct(png);
  PngWriteState state{nullptr, 0, 0};
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_write_struct(&png, &info);
    if (state.data) free(state.data);
    return -1;
  }
  png_set_write_fn(png, &state, png_write_fn, png_flush_fn);
  int color =
      channels == 1 ? PNG_COLOR_TYPE_GRAY
                    : (channels == 3 ? PNG_COLOR_TYPE_RGB : PNG_COLOR_TYPE_RGBA);
  png_set_IHDR(png, info, w, h, 8, color, PNG_INTERLACE_NONE,
               PNG_COMPRESSION_TYPE_DEFAULT, PNG_FILTER_TYPE_DEFAULT);
  png_set_compression_level(png, compression);
  png_write_info(png, info);
  for (int y = 0; y < h; ++y) {
    png_write_row(png, const_cast<uint8_t*>(img + (size_t)y * w * channels));
  }
  png_write_end(png, info);
  png_destroy_write_struct(&png, &info);
  *out_buf = state.data;
  *out_len = state.len;
  return 0;
}

// ------------------------------------------------------------------ WEBP
int vtpu_decode_webp(const uint8_t* buf, size_t len, VtpuImage* out) {
  int w, h;
  if (!WebPGetInfo(buf, len, &w, &h)) return -1;
  uint8_t* rgba = WebPDecodeRGBA(buf, len, &w, &h);
  if (!rgba) return -1;
  // WebPDecodeRGBA allocates with its own allocator; copy into malloc so
  // a single vtpu_free works
  size_t n = (size_t)w * h * 4;
  uint8_t* data = static_cast<uint8_t*>(malloc(n));
  memcpy(data, rgba, n);
  WebPFree(rgba);
  out->data = data;
  out->height = h;
  out->width = w;
  out->channels = 4;
  return 0;
}

}  // extern "C"
