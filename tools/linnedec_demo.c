/* linnedec_demo — decode a .lnn stream to .wav in pure C.
 *
 * Demonstrates that native/linne_host.h is a complete decode-only C ABI
 * (the analog of the reference's `linnedec` static-library target,
 * reference CMakeLists.txt:5-29): this file contains ONLY the embedder-side
 * pieces — .lnn header parsing (linne_encoder.c:104-137 layout), the
 * wire-format preset tables (linne_internal.c:16-41), the static-Huffman
 * tree construction (static_huffman.c:28-92 two-minimum build), and a WAV
 * writer — while block scanning, CRC, entropy decode and integer synthesis
 * all come from the exported runtime in linne_host.so.
 *
 * Build:  gcc -O2 tools/linnedec_demo.c <build>/linne_host.so -lm \
 *             -o linnedec_demo
 * Usage:  ./linnedec_demo in.lnn out.wav
 */
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "../native/linne_host.h"

/* ---- wire-format constants (linne_internal.c:16-41) ------------------- */

#define LNN_HEADER_SIZE 30
#define LNN_FORMAT_VERSION 1
#define LNN_CODEC_VERSION 2
#define LNN_NUM_PREEMPH 2
#define LNN_NUM_SYMBOLS 256

static const int32_t kPresetLayers[8] = {2, 2, 3, 3, 3, 3, 3, 3};
static const int32_t kPresetOrders[8][3] = {
    {2, 32, 0}, {2, 32, 0},
    {4, 64, 8}, {4, 64, 8}, {4, 64, 8},
    {4, 128, 16}, {4, 128, 16}, {4, 128, 16},
};

/* Coefficient symbol frequency table (256 zigzag symbols) — wire-format
 * data shared by every preset (linne_internal.c:26-28). */
static const uint32_t kCoefFreq[LNN_NUM_SYMBOLS] = {
    2944693, 2417040, 2500224, 2220717, 2361506, 2005548, 2161319, 1804396, 1961813, 1628891,
    1774159, 1471673, 1604885, 1335449, 1451476, 1218111, 1316402, 1112581, 1200154, 1019661,
    1094294, 935533, 1000598, 861453, 914647, 793863, 837607, 733372, 769686, 679634,
    709504, 630828, 653277, 583990, 602876, 545068, 556612, 507071, 516014, 473301,
    478009, 441389, 442848, 415057, 412045, 389010, 384623, 364872, 359578, 343600,
    335976, 322541, 314173, 304513, 293388, 286871, 277191, 271905, 260699, 256892,
    245269, 243815, 231142, 231894, 217938, 220197, 205798, 209146, 196061, 199652,
    185811, 189659, 176121, 181265, 168122, 173827, 159699, 167156, 150968, 158868,
    144276, 152666, 137117, 146329, 130245, 141026, 124044, 134984, 118946, 130389,
    113141, 125287, 108826, 120399, 102664, 116857, 98953, 112210, 93718, 109059,
    89757, 106036, 86363, 102597, 82554, 99558, 78306, 96473, 76105, 92575,
    72428, 89227, 68911, 85952, 66258, 82764, 63571, 80241, 61196, 78050,
    58502, 75544, 56329, 73454, 53557, 71750, 51667, 81769, 52853, 90325,
    53934, 86990, 51338, 83565, 48756, 80882, 47304, 78156, 44823, 75050,
    43129, 72304, 41339, 70163, 39767, 67853, 37538, 65134, 35572, 62994,
    34367, 61059, 32981, 58664, 31690, 56196, 30505, 54354, 29091, 52803,
    27750, 50577, 26523, 49428, 25414, 47359, 24109, 46224, 23419, 44925,
    22167, 43578, 21336, 42201, 20551, 41434, 19640, 39842, 18815, 38775,
    18200, 37804, 17159, 36516, 16591, 35217, 16053, 34221, 14962, 33101,
    14533, 32077, 13842, 31550, 13427, 30277, 12962, 29616, 12296, 29090,
    11678, 27922, 11467, 27212, 10733, 26329, 10270, 25938, 9930, 24828,
    9336, 24672, 9085, 23868, 8616, 23456, 8430, 22633, 7892, 21759,
    7594, 21723, 7430, 20729, 6988, 20475, 6673, 20100, 6489, 19480,
    6100, 18993, 5912, 18480, 5599, 17993, 5292, 17267, 5100, 17013,
    4919, 16502, 4721, 16304, 4471, 16040, 4313, 16120, 4090, 17146,
    3921, 28239, 3817, 49638, 5544, 7587,
};

/* ---- static Huffman tree (static_huffman.c:28-92) --------------------- */

/* Two-minimum linear-scan build with first-index tie-breaking; zero counts
 * bumped to one. Fills node0/node1 (children per internal node) and
 * returns the root index. Arrays must hold 2*LNN_NUM_SYMBOLS entries. */
static int32_t build_tree(const uint32_t* freq, int16_t* node0,
                          int16_t* node1) {
  enum { SENTINEL = 2 * LNN_NUM_SYMBOLS };
  uint64_t counts[2 * LNN_NUM_SYMBOLS + 1];
  int i, free_node;
  for (i = 0; i < 2 * LNN_NUM_SYMBOLS + 1; i++) counts[i] = 0;
  for (i = 0; i < LNN_NUM_SYMBOLS; i++)
    counts[i] = freq[i] > 0 ? freq[i] : 1;
  counts[SENTINEL] = 0xFFFFFFFFu;
  free_node = LNN_NUM_SYMBOLS;
  for (;;) {
    int min1 = SENTINEL, min2 = SENTINEL, node;
    for (node = 0; node < free_node; node++) {
      uint64_t c = counts[node];
      if (c > 0) {
        if (c < counts[min1]) {
          min2 = min1;
          min1 = node;
        } else if (c < counts[min2]) {
          min2 = node;
        }
      }
    }
    if (min2 == SENTINEL) break;
    counts[free_node] = counts[min1] + counts[min2];
    counts[min1] = counts[min2] = 0;
    node0[free_node] = (int16_t)min1;
    node1[free_node] = (int16_t)min2;
    free_node++;
  }
  return free_node - 1;
}

/* ---- helpers ---------------------------------------------------------- */

static uint32_t be32(const uint8_t* p) {
  return ((uint32_t)p[0] << 24) | ((uint32_t)p[1] << 16) |
         ((uint32_t)p[2] << 8) | p[3];
}
static uint32_t be16(const uint8_t* p) { return ((uint32_t)p[0] << 8) | p[1]; }

static void le_put(FILE* f, uint32_t v, int nbytes) {
  int i;
  for (i = 0; i < nbytes; i++) fputc((v >> (8 * i)) & 0xFF, f);
}

/* Interleaved linear PCM writer; 8-bit is unsigned with a +128 bias
 * (reference wav.c:389-393). */
static int write_wav(const char* path, const int32_t* planes, int nch,
                     int64_t n, int rate, int bps) {
  FILE* f = fopen(path, "wb");
  int64_t t;
  int c;
  uint32_t data_bytes = (uint32_t)(n * nch * (bps / 8));
  if (!f) return -1;
  fwrite("RIFF", 1, 4, f);
  le_put(f, 36 + data_bytes, 4);
  fwrite("WAVEfmt ", 1, 8, f);
  le_put(f, 16, 4);
  le_put(f, 1, 2); /* PCM */
  le_put(f, (uint32_t)nch, 2);
  le_put(f, (uint32_t)rate, 4);
  le_put(f, (uint32_t)(rate * nch * (bps / 8)), 4);
  le_put(f, (uint32_t)(nch * (bps / 8)), 2);
  le_put(f, (uint32_t)bps, 2);
  fwrite("data", 1, 4, f);
  le_put(f, data_bytes, 4);
  for (t = 0; t < n; t++) {
    for (c = 0; c < nch; c++) {
      int32_t v = planes[c * n + t];
      if (bps == 8)
        fputc((v + 128) & 0xFF, f);
      else
        le_put(f, (uint32_t)v, bps / 8);
    }
  }
  fclose(f);
  return 0;
}

int main(int argc, char** argv) {
  FILE* f;
  long size;
  uint8_t* data;
  int16_t node0[2 * LNN_NUM_SYMBOLS] = {0};
  int16_t node1[2 * LNN_NUM_SYMBOLS] = {0};
  int32_t root, st;
  uint32_t nch, nsmpl, rate, bps, preset, ms;
  int32_t* planes;

  if (argc != 3) {
    fprintf(stderr, "usage: %s in.lnn out.wav\n", argv[0]);
    return 2;
  }
  f = fopen(argv[1], "rb");
  if (!f) { perror(argv[1]); return 1; }
  fseek(f, 0, SEEK_END);
  size = ftell(f);
  fseek(f, 0, SEEK_SET);
  data = (uint8_t*)malloc((size_t)size);
  if (fread(data, 1, (size_t)size, f) != (size_t)size) { fclose(f); return 1; }
  fclose(f);

  if (size < LNN_HEADER_SIZE || memcmp(data, "IBRA", 4) != 0 ||
      be32(data + 4) != LNN_FORMAT_VERSION ||
      be32(data + 8) != LNN_CODEC_VERSION) {
    fprintf(stderr, "not a LINNE v2 stream\n");
    return 1;
  }
  nch = be16(data + 12);
  nsmpl = be32(data + 14);
  rate = be32(data + 18);
  bps = be16(data + 22);
  preset = data[28];
  ms = data[29];
  if (preset > 7 || nch == 0) {
    fprintf(stderr, "bad header\n");
    return 1;
  }

  root = build_tree(kCoefFreq, node0, node1);
  planes = (int32_t*)calloc((size_t)nch * nsmpl, sizeof(int32_t));
  st = linne_decode_stream(
      data + LNN_HEADER_SIZE, size - LNN_HEADER_SIZE, (int64_t)nsmpl,
      node0, node1, root, LNN_NUM_SYMBOLS, (int32_t)nch, (int32_t)bps,
      kPresetLayers[preset], kPresetOrders[preset], LNN_NUM_PREEMPH,
      (int32_t)ms, /*check_crc=*/1, /*num_threads=*/0, planes);
  if (st != 0) {
    fprintf(stderr, "decode failed (status %d)\n", st);
    return 1;
  }
  if (write_wav(argv[2], planes, (int32_t)nch, nsmpl, (int32_t)rate,
                (int32_t)bps) != 0) {
    perror(argv[2]);
    return 1;
  }
  free(planes);
  free(data);
  return 0;
}
