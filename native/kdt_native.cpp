// kdt_native — native data engine for kidney_diffusion_tpu.
//
// Replaces the C++ capability the reference gets from the slideio/OpenCV
// dependency stack (SURVEY.md §2.4): tiled-TIFF (SVS) region decode,
// OOB-safe multi-magnification patch extraction with resampling,
// dihedral augmentation, and HSV tissue masking — multithreaded, zero
// Python in the loop, exposed as a plain C ABI for ctypes.
//
// Build: make -C native   (links against the system libtiff; the TIFF
// prototypes below are hand-declared because this image ships the
// library without development headers).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdarg>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

// ---------------------------------------------------------------------------
// minimal libtiff C API declarations (stable ABI; tags from the TIFF spec)
// ---------------------------------------------------------------------------

extern "C" {
typedef struct tiff TIFF;
typedef int64_t tmsize_t_;  // tmsize_t == ssize_t on LP64
TIFF* TIFFOpen(const char*, const char*);
void TIFFClose(TIFF*);
int TIFFGetField(TIFF*, uint32_t tag, ...);
int TIFFSetDirectory(TIFF*, uint16_t);
uint16_t TIFFNumberOfDirectories(TIFF*);
int TIFFReadRGBATile(TIFF*, uint32_t x, uint32_t y, uint32_t* raster);
int TIFFIsTiled(TIFF*);
int TIFFReadRGBAImageOriented(TIFF*, uint32_t w, uint32_t h, uint32_t* raster,
                              int orientation, int stop_on_error);
uint32_t TIFFComputeTile(TIFF*, uint32_t x, uint32_t y, uint32_t z, uint16_t sample);
tmsize_t_ TIFFReadRawTile(TIFF*, uint32_t tile, void* buf, tmsize_t_ size);
typedef void (*TIFFErrorHandler)(const char*, const char*, va_list);
TIFFErrorHandler TIFFSetErrorHandler(TIFFErrorHandler);
TIFFErrorHandler TIFFSetWarningHandler(TIFFErrorHandler);
}

static const uint32_t TAG_IMAGEWIDTH = 256;
static const uint32_t TAG_IMAGELENGTH = 257;
static const uint32_t TAG_COMPRESSION = 259;
static const uint32_t TAG_TILEWIDTH = 322;
static const uint32_t TAG_TILELENGTH = 323;
static const int ORIENTATION_TOPLEFT_ = 1;
// Aperio JPEG2000 compression codes (YCbCr / RGB codestreams); libtiff
// has no codec for these — tiles must be fetched raw and decoded by the
// caller (data/native.py routes them through an external J2K decoder)
static const uint16_t COMPRESSION_APERIO_J2K_YCBCR = 33003;
static const uint16_t COMPRESSION_APERIO_J2K_RGB = 33005;

// ---------------------------------------------------------------------------
// helpers
// ---------------------------------------------------------------------------

namespace {

inline int64_t clamp64(int64_t v, int64_t lo, int64_t hi) {
  return v < lo ? lo : (v > hi ? hi : v);
}

// Bilinear sample of an RGB8 image at continuous coords (half-pixel grid).
inline void bilinear_rgb(const uint8_t* img, int64_t H, int64_t W, double sy,
                         double sx, uint8_t* out) {
  sy = std::max(0.0, std::min(sy, double(H - 1)));
  sx = std::max(0.0, std::min(sx, double(W - 1)));
  int64_t y0 = (int64_t)sy, x0 = (int64_t)sx;
  int64_t y1 = std::min(y0 + 1, H - 1), x1 = std::min(x0 + 1, W - 1);
  double wy = sy - y0, wx = sx - x0;
  for (int c = 0; c < 3; ++c) {
    double top = img[(y0 * W + x0) * 3 + c] * (1 - wx) +
                 img[(y0 * W + x1) * 3 + c] * wx;
    double bot = img[(y1 * W + x0) * 3 + c] * (1 - wx) +
                 img[(y1 * W + x1) * 3 + c] * wx;
    out[c] = (uint8_t)std::lround(top * (1 - wy) + bot * wy);
  }
}

// Apply dihedral transform k (the reference's 8-way index encoding,
// /root/reference/patient_dataset.py:243-259) to output coordinates:
// maps (oy, ox) in the transformed image to (iy, ix) in the source.
inline void dihedral_src(int k, int64_t n, int64_t oy, int64_t ox, int64_t* iy,
                         int64_t* ix) {
  switch (k & 7) {
    case 0: *iy = oy; *ix = ox; break;
    case 1: *iy = oy; *ix = n - 1 - ox; break;                // flip W
    case 2: *iy = n - 1 - oy; *ix = ox; break;                // flip H
    case 3: *iy = n - 1 - oy; *ix = n - 1 - ox; break;        // flip both
    case 4: *iy = ox; *ix = oy; break;                        // transpose
    case 5: *iy = n - 1 - ox; *ix = oy; break;                // T + flip W
    case 6: *iy = ox; *ix = n - 1 - oy; break;                // T + flip H
    default: *iy = n - 1 - ox; *ix = n - 1 - oy; break;       // T + both
  }
}

void parallel_for(int64_t n, int threads, const std::function<void(int64_t)>& fn) {
  if (threads <= 1 || n <= 1) {
    for (int64_t i = 0; i < n; ++i) fn(i);
    return;
  }
  std::atomic<int64_t> next(0);
  std::vector<std::thread> pool;
  int t = std::min<int64_t>(threads, n);
  for (int i = 0; i < t; ++i) {
    pool.emplace_back([&] {
      for (;;) {
        int64_t i = next.fetch_add(1);
        if (i >= n) return;
        fn(i);
      }
    });
  }
  for (auto& th : pool) th.join();
}

}  // namespace

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------

extern "C" {

// ---- in-RAM patch engine ---------------------------------------------------

// OOB-safe region read + bilinear resize + fill, the read_block geometry
// (/root/reference/ultra_res_patient_dataset.py:154-200): reads the
// region² source window at (x, y) from an RGB8 image, resamples the
// in-bounds part to scale out_size/region, fills the rest.
int kdt_extract_patch(const uint8_t* img, int64_t H, int64_t W, int64_t x,
                      int64_t y, int64_t region, int64_t out_size,
                      uint8_t fill_r, uint8_t fill_g, uint8_t fill_b,
                      int aug_index, uint8_t* out) {
  if (!img || !out || region <= 0 || out_size <= 0) return -1;
  const double scale = double(out_size) / double(region);

  const int64_t rx = clamp64(x, 0, W);
  const int64_t ry = clamp64(y, 0, H);
  const int64_t rw = std::min(W - rx, region - std::max<int64_t>(-x, 0));
  const int64_t rh = std::min(H - ry, region - std::max<int64_t>(-y, 0));

  // output rect covered by in-bounds source
  const int64_t ox0 = (int64_t)((rx - x) * scale);
  const int64_t oy0 = (int64_t)((ry - y) * scale);
  const int64_t ow = rw > 0 ? (int64_t)(rw * scale) : 0;
  const int64_t oh = rh > 0 ? (int64_t)(rh * scale) : 0;

  const uint8_t fill[3] = {fill_r, fill_g, fill_b};
  for (int64_t oy = 0; oy < out_size; ++oy) {
    for (int64_t ox = 0; ox < out_size; ++ox) {
      int64_t ty, tx;  // coords in the un-augmented patch
      dihedral_src(aug_index, out_size, oy, ox, &ty, &tx);
      uint8_t* dst = out + (oy * out_size + ox) * 3;
      if (ty >= oy0 && ty < oy0 + oh && tx >= ox0 && tx < ox0 + ow) {
        const double sy = ry + (ty - oy0 + 0.5) * rh / double(oh) - 0.5;
        const double sx = rx + (tx - ox0 + 0.5) * rw / double(ow) - 0.5;
        bilinear_rgb(img, H, W, sy, sx, dst);
      } else {
        memcpy(dst, fill, 3);
      }
    }
  }
  return 0;
}

// Batched multithreaded extraction: n patches from one image.
// xs/ys/regions/aug are length-n arrays; out is (n, out_size, out_size, 3).
int kdt_extract_batch(const uint8_t* img, int64_t H, int64_t W,
                      const int64_t* xs, const int64_t* ys,
                      const int64_t* regions, const int32_t* aug, int64_t n,
                      int64_t out_size, uint8_t fill_r, uint8_t fill_g,
                      uint8_t fill_b, int threads, uint8_t* out) {
  std::atomic<int> err(0);
  parallel_for(
      n, threads, [&](int64_t i) {
        int rc = kdt_extract_patch(img, H, W, xs[i], ys[i], regions[i],
                                   out_size, fill_r, fill_g, fill_b,
                                   aug ? aug[i] : 0,
                                   out + i * out_size * out_size * 3);
        if (rc != 0) err.store(rc);
      });
  return err.load();
}

// HSV tissue mask: out[i] = (h > hue_min && s > sat_min) for RGB8 input
// (/root/reference/patient_dataset.py:132-136 semantics).
int kdt_tissue_mask(const uint8_t* img, int64_t n_pixels, float hue_min,
                    float sat_min, uint8_t* out) {
  for (int64_t i = 0; i < n_pixels; ++i) {
    const float r = img[i * 3 + 0] / 255.f;
    const float g = img[i * 3 + 1] / 255.f;
    const float b = img[i * 3 + 2] / 255.f;
    const float maxc = std::max(r, std::max(g, b));
    const float minc = std::min(r, std::min(g, b));
    const float delta = maxc - minc;
    float h = 0.f, s = 0.f;
    if (delta > 0.f && maxc > 0.f) {
      s = delta / maxc;
      if (maxc == r)
        h = (g - b) / delta;
      else if (maxc == g)
        h = 2.f + (b - r) / delta;
      else
        h = 4.f + (r - g) / delta;
      h /= 6.f;
      if (h < 0.f) h += 1.f;
    }
    out[i] = (h > hue_min && s > sat_min) ? 1 : 0;
  }
  return 0;
}

// ---- tiled-TIFF (SVS) reader ----------------------------------------------

struct KdtTiff {
  TIFF* tif;
  int64_t width;
  int64_t height;
  int64_t tile_w;
  int64_t tile_h;
  uint16_t compression;
};

static void kdt_quiet_handler(const char*, const char*, va_list) {}

void* kdt_tiff_open(const char* path) {
  TIFFSetWarningHandler(kdt_quiet_handler);
  TIFF* tif = TIFFOpen(path, "r");
  if (!tif) return nullptr;
  uint32_t w = 0, h = 0, tw = 0, th = 0;
  uint16_t comp = 1;
  TIFFGetField(tif, TAG_IMAGEWIDTH, &w);
  TIFFGetField(tif, TAG_IMAGELENGTH, &h);
  TIFFGetField(tif, TAG_COMPRESSION, &comp);
  if (TIFFIsTiled(tif)) {
    TIFFGetField(tif, TAG_TILEWIDTH, &tw);
    TIFFGetField(tif, TAG_TILELENGTH, &th);
  }
  auto* s = new KdtTiff{tif, (int64_t)w, (int64_t)h, (int64_t)tw, (int64_t)th,
                        comp};
  return s;
}

// COMPRESSION tag (259) of the level-0 directory; lets the caller detect
// codecs libtiff cannot decode (Aperio J2K: 33003/33005).
int kdt_tiff_compression(void* handle) {
  auto* s = (KdtTiff*)handle;
  if (!s) return -1;
  return (int)s->compression;
}

int kdt_tiff_tile_dims(void* handle, int64_t* tw, int64_t* th) {
  auto* s = (KdtTiff*)handle;
  if (!s) return -1;
  *tw = s->tile_w;
  *th = s->tile_h;
  return 0;
}

// Raw (compressed) bytes of the tile containing pixel (x, y). Returns the
// byte count, or -1 on error. Used for Aperio J2K tiles, whose
// codestreams are decoded by the caller.
int64_t kdt_tiff_read_raw_tile(void* handle, int64_t x, int64_t y,
                               uint8_t* buf, int64_t bufsize) {
  auto* s = (KdtTiff*)handle;
  if (!s || s->tile_w <= 0 || x < 0 || y < 0 || x >= s->width ||
      y >= s->height)
    return -1;
  uint32_t tile = TIFFComputeTile(s->tif, (uint32_t)x, (uint32_t)y, 0, 0);
  tmsize_t_ n = TIFFReadRawTile(s->tif, tile, buf, (tmsize_t_)bufsize);
  return (int64_t)n;
}

void kdt_tiff_close(void* handle) {
  auto* s = (KdtTiff*)handle;
  if (!s) return;
  TIFFClose(s->tif);
  delete s;
}

int kdt_tiff_size(void* handle, int64_t* w, int64_t* h) {
  auto* s = (KdtTiff*)handle;
  if (!s) return -1;
  *w = s->width;
  *h = s->height;
  return 0;
}

// Decode the level-0 rect (x, y, w, h) and bilinear-resample to
// (out_h, out_w) RGB8. Tiles are decoded once each via TIFFReadRGBATile.
int kdt_tiff_read_region(void* handle, int64_t x, int64_t y, int64_t w,
                         int64_t h, int64_t out_w, int64_t out_h,
                         uint8_t* out) {
  auto* s = (KdtTiff*)handle;
  if (!s || w <= 0 || h <= 0 || out_w <= 0 || out_h <= 0) return -1;
  if (s->compression == COMPRESSION_APERIO_J2K_YCBCR ||
      s->compression == COMPRESSION_APERIO_J2K_RGB)
    return -3;  // codec unsupported by libtiff: use kdt_tiff_read_raw_tile
  x = clamp64(x, 0, s->width - 1);
  y = clamp64(y, 0, s->height - 1);
  w = std::min(w, s->width - x);
  h = std::min(h, s->height - y);

  // assemble the source rect at full res (RGB8)
  std::vector<uint8_t> rect((size_t)w * h * 3);

  if (s->tile_w > 0) {
    std::vector<uint32_t> tile((size_t)s->tile_w * s->tile_h);
    for (int64_t ty = (y / s->tile_h) * s->tile_h; ty < y + h; ty += s->tile_h) {
      for (int64_t tx = (x / s->tile_w) * s->tile_w; tx < x + w; tx += s->tile_w) {
        if (!TIFFReadRGBATile(s->tif, (uint32_t)tx, (uint32_t)ty, tile.data()))
          return -2;
        // TIFFReadRGBATile rasters are bottom-up within the tile
        const int64_t y0 = std::max(y, ty), y1 = std::min(y + h, ty + s->tile_h);
        const int64_t x0 = std::max(x, tx), x1 = std::min(x + w, tx + s->tile_w);
        for (int64_t yy = y0; yy < y1; ++yy) {
          const int64_t tyy = s->tile_h - 1 - (yy - ty);
          const uint32_t* src = tile.data() + tyy * s->tile_w + (x0 - tx);
          uint8_t* dst = rect.data() + ((yy - y) * w + (x0 - x)) * 3;
          for (int64_t xx = 0; xx < x1 - x0; ++xx) {
            const uint32_t px = src[xx];
            dst[xx * 3 + 0] = px & 0xff;          // R
            dst[xx * 3 + 1] = (px >> 8) & 0xff;   // G
            dst[xx * 3 + 2] = (px >> 16) & 0xff;  // B
          }
        }
      }
    }
  } else {
    // striped image: decode whole (small) directory once
    std::vector<uint32_t> full((size_t)s->width * s->height);
    if (!TIFFReadRGBAImageOriented(s->tif, (uint32_t)s->width,
                                   (uint32_t)s->height, full.data(),
                                   ORIENTATION_TOPLEFT_, 0))
      return -2;
    for (int64_t yy = 0; yy < h; ++yy) {
      const uint32_t* src = full.data() + (y + yy) * s->width + x;
      uint8_t* dst = rect.data() + yy * w * 3;
      for (int64_t xx = 0; xx < w; ++xx) {
        const uint32_t px = src[xx];
        dst[xx * 3 + 0] = px & 0xff;
        dst[xx * 3 + 1] = (px >> 8) & 0xff;
        dst[xx * 3 + 2] = (px >> 16) & 0xff;
      }
    }
  }

  // resample rect -> out
  for (int64_t oy = 0; oy < out_h; ++oy) {
    for (int64_t ox = 0; ox < out_w; ++ox) {
      const double sy = (oy + 0.5) * h / double(out_h) - 0.5;
      const double sx = (ox + 0.5) * w / double(out_w) - 0.5;
      bilinear_rgb(rect.data(), h, w, sy, sx, out + (oy * out_w + ox) * 3);
    }
  }
  return 0;
}

}  // extern "C"
