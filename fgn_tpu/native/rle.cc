// Native hot loops for COCO-style run-length mask coding.
//
// The Python fallback in fgn_tpu/data/rle.py implements the same format;
// these functions replace its per-run Python loops for the evaluation path
// (thousands of mask encodes per eval; reference throughput relied on the
// pycocotools C extension, see SURVEY.md §2.9).
//
// Build: see fgn_tpu/native/Makefile. Loaded via ctypes from
// fgn_tpu/native/__init__.py.

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Encode a binary HxW mask (row-major uint8) into the COCO compressed
// counts string. Returns the number of bytes written to `out` (capacity
// `out_cap`), or -1 if the buffer is too small.
long long rle_encode(const uint8_t* mask, long long h, long long w,
                     char* out, long long out_cap) {
  // Column-major scan; runs alternate 0s/1s starting with 0s.
  std::vector<long long> counts;
  counts.reserve(256);
  uint8_t prev = 0;
  long long run = 0;
  for (long long x = 0; x < w; ++x) {
    const uint8_t* col = mask + x;  // stride w within a column walk
    for (long long y = 0; y < h; ++y) {
      uint8_t v = col[y * w] ? 1 : 0;
      if (v == prev) {
        ++run;
      } else {
        counts.push_back(run);
        run = 1;
        prev = v;
      }
    }
  }
  counts.push_back(run);

  long long pos = 0;
  const size_t n = counts.size();
  for (size_t i = 0; i < n; ++i) {
    long long xval = counts[i];
    if (i > 2) xval -= counts[i - 2];
    bool more = true;
    while (more) {
      long long c = xval & 0x1f;
      xval >>= 5;
      more = !((xval == 0 && !(c & 0x10)) || (xval == -1 && (c & 0x10)));
      if (more) c |= 0x20;
      if (pos >= out_cap) return -1;
      out[pos++] = static_cast<char>(c + 48);
    }
  }
  return pos;
}

// Decode a compressed counts string into a binary HxW mask (row-major
// uint8, caller-allocated h*w bytes). Returns 0 on success, -1 if the
// runs do not cover exactly h*w pixels.
long long rle_decode(const char* s, long long slen, long long h, long long w,
                     uint8_t* mask) {
  std::vector<long long> counts;
  counts.reserve(256);
  long long i = 0;
  while (i < slen) {
    long long x = 0;
    int k = 0;
    bool more = true;
    long long c = 0;
    while (more) {
      c = s[i] - 48;
      x |= (c & 0x1f) << (5 * k);
      more = (c & 0x20) != 0;
      ++i;
      ++k;
      if (!more && (c & 0x10)) x |= -1LL << (5 * k);
    }
    if (counts.size() > 2) x += counts[counts.size() - 2];
    counts.push_back(x);
  }

  long long total = 0;
  for (long long cval : counts) total += cval;
  if (total != h * w) return -1;

  std::memset(mask, 0, static_cast<size_t>(h * w));
  long long pos = 0;  // column-major position
  uint8_t val = 0;
  for (long long cval : counts) {
    if (val) {
      for (long long t = 0; t < cval; ++t) {
        long long p = pos + t;
        long long y = p % h;
        long long x = p / h;
        mask[y * w + x] = 1;
      }
    }
    pos += cval;
    val ^= 1;
  }
  return 0;
}

// Pairwise mask IoU from decoded masks is done in NumPy (matmul); the
// area of a compressed RLE, however, is a common small call:
long long rle_area(const char* s, long long slen) {
  std::vector<long long> counts;
  long long i = 0;
  while (i < slen) {
    long long x = 0;
    int k = 0;
    bool more = true;
    long long c = 0;
    while (more) {
      c = s[i] - 48;
      x |= (c & 0x1f) << (5 * k);
      more = (c & 0x20) != 0;
      ++i;
      ++k;
      if (!more && (c & 0x10)) x |= -1LL << (5 * k);
    }
    if (counts.size() > 2) x += counts[counts.size() - 2];
    counts.push_back(x);
  }
  long long area = 0;
  for (size_t j = 1; j < counts.size(); j += 2) area += counts[j];
  return area;
}

}  // extern "C"
