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

// scale_num/scale_den: libjpeg DCT scaling (M/8, M=1..16) — decoding at
// reduced scale skips most of the IDCT work, the classic input-pipeline
// optimization when the consumer resizes down anyway (nvJPEG's
// ROI/scaled-decode analog; the reference decodes full-size only).
int vtpu_decode_jpeg_scaled(const uint8_t* buf, size_t len, int scale_num,
                            int scale_den, VtpuImage* out) {
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
  // keep 1-component streams grayscale (reference UNCHANGED semantics);
  // expand everything else (YCbCr/CMYK/…) to RGB
  cinfo.out_color_space =
      cinfo.jpeg_color_space == JCS_GRAYSCALE ? JCS_GRAYSCALE : JCS_RGB;
  if (scale_num > 0 && scale_den > 0) {
    cinfo.scale_num = scale_num;
    cinfo.scale_denom = scale_den;
  }
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

int vtpu_decode_jpeg(const uint8_t* buf, size_t len, VtpuImage* out) {
  return vtpu_decode_jpeg_scaled(buf, len, 0, 0, out);
}

int vtpu_encode_jpeg(const uint8_t* rgb, int h, int w, int channels,
                     int quality, uint8_t** out_buf, size_t* out_len) {
  if (channels != 1 && channels != 3) return -3;  // permitted set only
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
  cinfo.input_components = channels;
  cinfo.in_color_space = channels == 1 ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, quality, TRUE);
  jpeg_start_compress(&cinfo, TRUE);
  while (cinfo.next_scanline < cinfo.image_height) {
    const uint8_t* row =
        rgb + (size_t)cinfo.next_scanline * w * channels;
    jpeg_write_scanlines(&cinfo, const_cast<uint8_t**>(&row), 1);
  }
  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);
  *out_buf = mem;  // libjpeg mem dest uses malloc; freed via vtpu_free
  *out_len = mem_size;
  return 0;
}

// Entropy-decode ONLY: stop after Huffman decoding and hand the quantized
// DCT coefficient blocks to the caller, so dequantization + IDCT + chroma
// upsampling + YCbCr->RGB run on the accelerator (8x8 IDCT = two small
// matmuls, ideal MXU work). This is the TPU-native split of the
// reference's nvJPEG batch-decode path (decode_jpegs_cuda): the only
// inherently serial part of JPEG decode (Huffman) stays on host, the
// data-parallel tail moves on device. Roughly halves host CPU per image.
//
// Per component ci < ncomp (max 3):
//   blocks_w[ci] x blocks_h[ci] 8x8 blocks, coefficients in natural
//   (row-major) order as int16, laid out [blocks_h, blocks_w, 64];
//   qtab[ci*64..] = quantization table (natural order);
//   samp_h/samp_v = sampling factors relative to max (e.g. 4:2:0 luma
//   = 2,2 chroma = 1,1).
// Caller frees each coefs[ci] with vtpu_free.
// coef_limit: 0 or 8 = full 8x8 blocks; 1..7 = copy only the top-left
// MxM coefficients per block (layout [blocks_h, blocks_w, M*M]) — the
// host half of DCT-scaled decode (device does an M-point IDCT producing
// an M/8-scale image), cutting transfer bytes by (M/8)^2.
int vtpu_jpeg_coefficients(const uint8_t* buf, size_t len, int coef_limit,
                           int* ncomp, int* height, int* width,
                           int* blocks_h, int* blocks_w, int* samp_h,
                           int* samp_v, uint16_t* qtab, int16_t** coefs) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  int16_t* allocs[3] = {nullptr, nullptr, nullptr};
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    for (int i = 0; i < 3; i++)
      if (allocs[i]) free(allocs[i]);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, len);
  jpeg_read_header(&cinfo, TRUE);
  jvirt_barray_ptr* bars = jpeg_read_coefficients(&cinfo);
  if (!bars || cinfo.num_components > 3) {
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  *ncomp = cinfo.num_components;
  *height = cinfo.image_height;
  *width = cinfo.image_width;
  for (int ci = 0; ci < cinfo.num_components; ci++) {
    jpeg_component_info* comp = &cinfo.comp_info[ci];
    const int bh = comp->height_in_blocks;
    const int bw = comp->width_in_blocks;
    blocks_h[ci] = bh;
    blocks_w[ci] = bw;
    samp_h[ci] = comp->h_samp_factor;
    samp_v[ci] = comp->v_samp_factor;
    JQUANT_TBL* qt = cinfo.quant_tbl_ptrs[comp->quant_tbl_no];
    if (!qt) {
      jpeg_destroy_decompress(&cinfo);
      for (int i = 0; i < 3; i++)
        if (allocs[i]) free(allocs[i]);
      return -3;
    }
    for (int k = 0; k < 64; k++) qtab[ci * 64 + k] = qt->quantval[k];
    const int m = (coef_limit > 0 && coef_limit < 8) ? coef_limit : 8;
    const int per_block = m * m;
    int16_t* dst = static_cast<int16_t*>(
        malloc((size_t)bh * bw * per_block * sizeof(int16_t)));
    if (!dst) {
      jpeg_destroy_decompress(&cinfo);
      for (int i = 0; i < 3; i++)
        if (allocs[i]) free(allocs[i]);
      return -4;
    }
    allocs[ci] = dst;
    for (int r = 0; r < bh; r++) {
      JBLOCKARRAY rows = (*cinfo.mem->access_virt_barray)(
          (j_common_ptr)&cinfo, bars[ci], r, 1, FALSE);
      if (m == 8) {
        memcpy(dst + (size_t)r * bw * 64, rows[0],
               (size_t)bw * 64 * sizeof(JCOEF));
      } else {
        int16_t* drow = dst + (size_t)r * bw * per_block;
        for (int b = 0; b < bw; b++) {
          const JCOEF* src_block = rows[0][b];
          for (int u = 0; u < m; u++)
            memcpy(drow + b * per_block + u * m, src_block + u * 8,
                   m * sizeof(JCOEF));
        }
      }
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  for (int ci = 0; ci < *ncomp; ci++) coefs[ci] = allocs[ci];
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
  int color = channels == 1   ? PNG_COLOR_TYPE_GRAY
              : channels == 2 ? PNG_COLOR_TYPE_GRAY_ALPHA
              : channels == 3 ? PNG_COLOR_TYPE_RGB
                              : PNG_COLOR_TYPE_RGBA;
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


// ------------------------------------------------------------------- GIF
// Clean-room GIF87a/89a decoder (no giflib on TPU-VM hosts; the reference
// vendors giflib — csrc/io/image/cpu/decode_gif.cpp — and returns
// (N, 3, H, W) animations; this implements the same observable behavior:
// LZW decode, interlace, local/global color tables, frame compositing with
// disposal methods and transparency, RGB output frames).
namespace gif {

struct Reader {
  const uint8_t* p;
  size_t len;
  size_t pos = 0;
  bool ok = true;
  uint8_t u8() {
    if (pos >= len) { ok = false; return 0; }
    return p[pos++];
  }
  uint16_t u16() {  // little-endian
    uint16_t lo = u8(), hi = u8();
    return (uint16_t)(lo | (hi << 8));
  }
  bool skip(size_t n) {
    if (pos + n > len) { ok = false; return false; }
    pos += n;
    return true;
  }
};

// LZW over GIF data sub-blocks -> index stream (max n_out indices).
static bool lzw_decode(Reader& r, int min_code_size, uint8_t* out,
                       size_t n_out) {
  if (min_code_size < 2 || min_code_size > 11) return false;
  const int clear_code = 1 << min_code_size;
  const int end_code = clear_code + 1;
  static const int kMax = 4096;
  uint16_t prefix[kMax];
  uint8_t suffix[kMax];
  uint8_t stack[kMax];
  int code_size = min_code_size + 1;
  int next_code = end_code + 1;
  int prev = -1;

  uint32_t bits = 0;
  int n_bits = 0;
  int block_left = 0;
  size_t written = 0;

  auto first_char = [&](int code) {
    while (code >= clear_code) code = prefix[code];
    return (uint8_t)code;
  };

  while (true) {
    while (n_bits < code_size) {
      if (block_left == 0) {
        block_left = r.u8();
        if (!r.ok) return false;
        if (block_left == 0) return written == n_out;  // terminator
      }
      bits |= (uint32_t)r.u8() << n_bits;
      if (!r.ok) return false;
      n_bits += 8;
      block_left--;
    }
    int code = bits & ((1 << code_size) - 1);
    bits >>= code_size;
    n_bits -= code_size;

    if (code == clear_code) {
      code_size = min_code_size + 1;
      next_code = end_code + 1;
      prev = -1;
      continue;
    }
    if (code == end_code) {
      // drain remaining sub-blocks
      while (true) {
        if (block_left > 0) { if (!r.skip(block_left)) return false; }
        block_left = r.u8();
        if (!r.ok || block_left == 0) break;
      }
      return written == n_out;
    }
    if (prev < 0) {
      if (code >= clear_code) return false;
      if (written < n_out) out[written++] = (uint8_t)code;
      prev = code;
      continue;
    }

    int sp = 0;
    int cur = code;
    if (code >= next_code || code == next_code) {
      if (code != next_code) return false;
      stack[sp++] = first_char(prev);
      cur = prev;
    }
    while (cur >= clear_code) {
      if (sp >= kMax) return false;
      stack[sp++] = suffix[cur];
      cur = prefix[cur];
    }
    stack[sp++] = (uint8_t)cur;

    if (next_code < kMax) {
      prefix[next_code] = (uint16_t)prev;
      suffix[next_code] = stack[sp - 1] /* first char of this output */;
      // first char of the emitted string is the LAST pushed (stack order)
      next_code++;
      if (next_code == (1 << code_size) && code_size < 12) code_size++;
    }
    while (sp > 0 && written < n_out) out[written++] = stack[--sp];
    if (written == n_out) {
      // consume to end of image data
      while (true) {
        if (block_left > 0) { if (!r.skip(block_left)) return false; }
        block_left = r.u8();
        if (!r.ok || block_left == 0) break;
      }
      return true;
    }
    prev = code;
  }
}

}  // namespace gif

// Decode every frame: out = malloc'd (n_frames * h * w * 3) RGB.
int vtpu_decode_gif(const uint8_t* buf, size_t len, uint8_t** out_frames,
                    int* out_n, int* out_h, int* out_w) {
  gif::Reader r{buf, len};
  if (len < 13 || memcmp(buf, "GIF8", 4) != 0) return -1;
  r.pos = 6;
  const int sw = r.u16(), sh = r.u16();
  const uint8_t packed = r.u8();
  r.u8();  // background color index (used below via gct)
  const uint8_t bg_index = buf[11];
  r.u8();  // aspect
  if (!r.ok || sw <= 0 || sh <= 0) return -1;

  uint8_t gct[256][3];
  bool has_gct = (packed & 0x80) != 0;
  int gct_size = 2 << (packed & 0x07);
  if (has_gct) {
    for (int i = 0; i < gct_size; ++i) {
      gct[i][0] = r.u8();
      gct[i][1] = r.u8();
      gct[i][2] = r.u8();
    }
  }
  if (!r.ok) return -1;

  const size_t canvas_px = (size_t)sw * sh;
  uint8_t* canvas = (uint8_t*)malloc(canvas_px * 3);
  uint8_t* saved = (uint8_t*)malloc(canvas_px * 3);
  if (!canvas || !saved) {
    free(canvas); free(saved);
    return -2;
  }
  // initial canvas: background color if GCT, else black
  for (size_t i = 0; i < canvas_px; ++i) {
    const uint8_t* c =
        (has_gct && bg_index < gct_size) ? gct[bg_index] : nullptr;
    canvas[i * 3 + 0] = c ? c[0] : 0;
    canvas[i * 3 + 1] = c ? c[1] : 0;
    canvas[i * 3 + 2] = c ? c[2] : 0;
  }

  uint8_t* frames = nullptr;
  size_t frames_cap = 0;
  int n_frames = 0;

  int transparent = -1;
  int disposal = 0;
  int rc = -1;

  while (r.ok) {
    uint8_t block = r.u8();
    if (!r.ok) break;
    if (block == 0x3B) {  // trailer
      rc = n_frames > 0 ? 0 : -1;
      break;
    }
    if (block == 0x21) {  // extension
      uint8_t label = r.u8();
      if (label == 0xF9) {  // graphic control
        uint8_t size = r.u8();
        if (size >= 4) {
          uint8_t flags = r.u8();
          r.u16();  // delay
          uint8_t tindex = r.u8();
          disposal = (flags >> 2) & 0x07;
          transparent = (flags & 1) ? tindex : -1;
          if (size > 4) r.skip(size - 4);
        } else {
          r.skip(size);
        }
      }
      // skip remaining sub-blocks (and the whole body for other labels)
      while (r.ok) {
        uint8_t n = r.u8();
        if (n == 0) break;
        r.skip(n);
      }
      continue;
    }
    if (block != 0x2C) break;  // unknown block: bail

    // image descriptor
    const int left = r.u16(), top = r.u16();
    const int fw = r.u16(), fh = r.u16();
    const uint8_t fpacked = r.u8();
    if (!r.ok || fw <= 0 || fh <= 0 || left + fw > sw || top + fh > sh) break;
    uint8_t lct[256][3];
    const bool has_lct = (fpacked & 0x80) != 0;
    const bool interlaced = (fpacked & 0x40) != 0;
    const int lct_size = 2 << (fpacked & 0x07);
    if (has_lct) {
      for (int i = 0; i < lct_size; ++i) {
        lct[i][0] = r.u8();
        lct[i][1] = r.u8();
        lct[i][2] = r.u8();
      }
    }
    const uint8_t (*table)[3] = has_lct ? lct : gct;
    const int table_size = has_lct ? lct_size : gct_size;
    if (!has_lct && !has_gct) break;  // no palette at all

    const int min_code = r.u8();
    if (!r.ok) break;
    uint8_t* fidx = (uint8_t*)malloc((size_t)fw * fh);
    if (!fidx || !gif::lzw_decode(r, min_code, fidx, (size_t)fw * fh)) {
      free(fidx);
      break;
    }

    if (disposal == 3) memcpy(saved, canvas, canvas_px * 3);

    // draw (with de-interlacing)
    static const int i0[4] = {0, 4, 2, 1};
    static const int istep[4] = {8, 8, 4, 2};
    int src_row = 0;
    for (int pass = interlaced ? 0 : 3; pass < 4; ++pass) {
      const int start = interlaced ? i0[pass] : 0;
      const int step = interlaced ? istep[pass] : 1;
      for (int y = start; y < fh; y += step, ++src_row) {
        const uint8_t* srow = fidx + (size_t)src_row * fw;
        uint8_t* drow = canvas + ((size_t)(top + y) * sw + left) * 3;
        for (int x = 0; x < fw; ++x) {
          const int idx = srow[x];
          if (idx == transparent || idx >= table_size) continue;
          drow[x * 3 + 0] = table[idx][0];
          drow[x * 3 + 1] = table[idx][1];
          drow[x * 3 + 2] = table[idx][2];
        }
      }
      if (!interlaced) break;
    }
    free(fidx);

    // append the composed canvas as this frame's RGB
    const size_t fbytes = canvas_px * 3;
    if ((size_t)(n_frames + 1) * fbytes > frames_cap) {
      size_t ncap = frames_cap ? frames_cap * 2 : fbytes * 4;
      while (ncap < (size_t)(n_frames + 1) * fbytes) ncap *= 2;
      uint8_t* grown = (uint8_t*)realloc(frames, ncap);
      if (!grown) {  // keep `frames` for the free() below; fail the decode
        rc = -1;
        break;
      }
      frames = grown;
      frames_cap = ncap;
    }
    memcpy(frames + (size_t)n_frames * fbytes, canvas, fbytes);
    n_frames++;

    // disposal for the NEXT frame
    if (disposal == 2) {  // restore to background within the frame rect
      const uint8_t* c =
          (has_gct && bg_index < gct_size) ? gct[bg_index] : nullptr;
      for (int y = 0; y < fh; ++y) {
        uint8_t* drow = canvas + ((size_t)(top + y) * sw + left) * 3;
        for (int x = 0; x < fw; ++x) {
          drow[x * 3 + 0] = c ? c[0] : 0;
          drow[x * 3 + 1] = c ? c[1] : 0;
          drow[x * 3 + 2] = c ? c[2] : 0;
        }
      }
    } else if (disposal == 3) {
      memcpy(canvas, saved, canvas_px * 3);
    }
    disposal = 0;
    transparent = -1;

    rc = 0;  // at least one frame decoded; trailer may still follow
  }

  free(canvas);
  free(saved);
  if (rc != 0 || n_frames == 0) {
    free(frames);
    return -1;
  }
  *out_frames = frames;
  *out_n = n_frames;
  *out_h = sh;
  *out_w = sw;
  return 0;
}

}  // extern "C"
