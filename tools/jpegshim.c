/* Test oracle shim around the system libjpeg (independent reference
 * implementation): encodes raw pixels to JFIF (Huffman or arithmetic,
 * sequential or progressive) and dumps entropy-decoded DCT
 * coefficients, so the pure-Python codec in sources/jpeg.py can be
 * cross-validated at the COEFFICIENT level (no IDCT fuzz) against a
 * real third-party decoder/encoder.  Compiled on demand by
 * tests/jpeg_shim.py; tests skip cleanly when gcc/jpeglib are absent.
 *
 * Usage:
 *   jpegshim encode <w> <h> <ncomp> <quality> <arith> <progressive> <restart>
 *       stdin: w*h*ncomp raw bytes -> stdout: JFIF stream
 *   jpegshim coef
 *       stdin: JFIF stream -> stdout: text dump, one line per block:
 *       comp by bx then 64 coefficients in natural (row-major) order
 *   jpegshim pixels
 *       stdin: JFIF stream -> stdout: "w h n\n" then raw decoded bytes
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>

static unsigned char *slurp(FILE *f, unsigned long *n) {
  unsigned long cap = 1 << 20, len = 0;
  unsigned char *buf = malloc(cap);
  size_t got;
  while ((got = fread(buf + len, 1, cap - len, f)) > 0) {
    len += got;
    if (len == cap) { cap *= 2; buf = realloc(buf, cap); }
  }
  *n = len;
  return buf;
}

static int do_encode(int argc, char **argv) {
  int w = atoi(argv[2]), h = atoi(argv[3]), nc = atoi(argv[4]);
  int quality = atoi(argv[5]), arith = atoi(argv[6]);
  int progressive = atoi(argv[7]), restart = atoi(argv[8]);
  unsigned long rawlen;
  unsigned char *raw = slurp(stdin, &rawlen);
  struct jpeg_compress_struct cinfo;
  struct jpeg_error_mgr jerr;
  unsigned char *out = NULL;
  unsigned long outlen = 0;
  JSAMPROW row;
  int y;

  if (rawlen < (unsigned long)(w * h * nc)) {
    fprintf(stderr, "short input\n");
    return 2;
  }
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_compress(&cinfo);
  jpeg_mem_dest(&cinfo, &out, &outlen);
  cinfo.image_width = w;
  cinfo.image_height = h;
  cinfo.input_components = nc;
  cinfo.in_color_space = nc == 1 ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, quality, TRUE);
  cinfo.arith_code = arith ? TRUE : FALSE;
  if (progressive)
    jpeg_simple_progression(&cinfo);
  if (restart > 0)
    cinfo.restart_interval = restart;
  if (nc == 3) { /* 4:4:4 so block grids align across components */
    int ci;
    for (ci = 0; ci < 3; ci++) {
      cinfo.comp_info[ci].h_samp_factor = 1;
      cinfo.comp_info[ci].v_samp_factor = 1;
    }
  }
  jpeg_start_compress(&cinfo, TRUE);
  for (y = 0; y < h; y++) {
    row = raw + (unsigned long)y * w * nc;
    jpeg_write_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);
  fwrite(out, 1, outlen, stdout);
  return 0;
}

static int do_coef(void) {
  unsigned long len;
  unsigned char *buf = slurp(stdin, &len);
  struct jpeg_decompress_struct cinfo;
  struct jpeg_error_mgr jerr;
  jvirt_barray_ptr *coefs;
  int ci;

  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, len);
  jpeg_read_header(&cinfo, TRUE);
  coefs = jpeg_read_coefficients(&cinfo);
  for (ci = 0; ci < cinfo.num_components; ci++) {
    jpeg_component_info *comp = &cinfo.comp_info[ci];
    JDIMENSION by, bx;
    for (by = 0; by < comp->height_in_blocks; by++) {
      JBLOCKARRAY rows = (*cinfo.mem->access_virt_barray)(
          (j_common_ptr)&cinfo, coefs[ci], by, 1, FALSE);
      for (bx = 0; bx < comp->width_in_blocks; bx++) {
        int k;
        printf("%d %u %u", ci, by, bx);
        for (k = 0; k < DCTSIZE2; k++)
          printf(" %d", rows[0][bx][k]); /* zigzag order as stored */
        printf("\n");
      }
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

static int do_pixels(void) {
  unsigned long len;
  unsigned char *buf = slurp(stdin, &len);
  struct jpeg_decompress_struct cinfo;
  struct jpeg_error_mgr jerr;
  int y;

  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, len);
  jpeg_read_header(&cinfo, TRUE);
  jpeg_start_decompress(&cinfo);
  printf("%u %u %d\n", cinfo.output_width, cinfo.output_height,
         cinfo.output_components);
  fflush(stdout);
  {
    unsigned long stride =
        (unsigned long)cinfo.output_width * cinfo.output_components;
    unsigned char *row = malloc(stride);
    for (y = 0; (JDIMENSION)y < cinfo.output_height; y++) {
      JSAMPROW r = row;
      jpeg_read_scanlines(&cinfo, &r, 1);
      fwrite(row, 1, stride, stdout);
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

int main(int argc, char **argv) {
  if (argc >= 9 && !strcmp(argv[1], "encode"))
    return do_encode(argc, argv);
  if (argc >= 2 && !strcmp(argv[1], "coef"))
    return do_coef();
  if (argc >= 2 && !strcmp(argv[1], "pixels"))
    return do_pixels();
  fprintf(stderr, "usage: jpegshim encode|coef|pixels ...\n");
  return 2;
}
