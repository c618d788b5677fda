// fd_test.cpp — differential test: fast_deflate9_filtered vs the system
// zlib at the exact parameters the PNG encoder uses
// (deflateInit2(9, Z_DEFLATED, 15, 9, Z_FILTERED); rwpng.c:471-472).
// Exit 0 iff every case produces byte-identical output.
//
// Usage: fd_test [seed] [file...]
//   With file args, also checks each file's raw bytes.
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <ctime>
#include <vector>
#include <string>
#include <zlib.h>

extern "C" int fast_deflate9_filtered(const uint8_t* in, size_t n,
                                      uint8_t** out_data, size_t* out_len);

static std::vector<uint8_t> zlib_ref(const uint8_t* in, size_t n,
                                     size_t chunk) {
  z_stream zs{};
  if (deflateInit2(&zs, 9, Z_DEFLATED, 15, 9, Z_FILTERED) != Z_OK) abort();
  std::vector<uint8_t> out;
  std::vector<uint8_t> buf(1 << 16);
  size_t pos = 0;
  do {
    size_t k = n - pos < chunk ? n - pos : chunk;
    zs.next_in = const_cast<uint8_t*>(in + pos);
    zs.avail_in = (uInt)k;
    pos += k;
    int flush = pos == n ? Z_FINISH : Z_NO_FLUSH;
    do {
      zs.next_out = buf.data();
      zs.avail_out = (uInt)buf.size();
      deflate(&zs, flush);
      out.insert(out.end(), buf.data(), buf.data() + (buf.size() - zs.avail_out));
    } while (zs.avail_out == 0);
  } while (pos < n);
  deflateEnd(&zs);
  return out;
}

static uint64_t rng_state;
static uint32_t rnd() {
  rng_state = rng_state * 6364136223846793005ULL + 1442695040888963407ULL;
  return (uint32_t)(rng_state >> 33);
}

// generators spanning the regimes that exercise distinct deflate machinery
static const int N_KINDS = 9;
static std::vector<uint8_t> gen(int kind, size_t n) {
  std::vector<uint8_t> v(n);
  switch (kind % N_KINDS) {
    case 8: {  // matches planted at distances straddling MAX_DIST (32506):
               // exercises the unconditional first candidate + limit cutoff
      for (auto& b : v) b = (uint8_t)(rnd() % 4 ? 0 : rnd());
      for (size_t i = 33000; i + 8 < n; i += 1 + rnd() % 700) {
        size_t back = 32498 + rnd() % 20;
        size_t len = 3 + rnd() % 12;
        if (len > n - i) len = n - i;
        for (size_t k = 0; k < len; k++) v[i + k] = v[i - back + k];
        i += len;
      }
      break;
    }
    case 0:  // pure random: incompressible, stored-block decision
      for (auto& b : v) b = (uint8_t)rnd();
      break;
    case 1:  // all one byte: max-length matches, window slides
      memset(v.data(), (int)(rnd() & 255), n);
      break;
    case 2: {  // short periodic: small distances, lazy matching
      size_t period = 1 + rnd() % 17;
      for (size_t i = 0; i < n; i++)
        v[i] = (uint8_t)((i % period) * 37 + (rnd() % 4 == 0 ? rnd() % 3 : 0));
      break;
    }
    case 3: {  // lossy-scanline-like: long runs + small residual noise
      uint8_t cur = (uint8_t)rnd();
      for (size_t i = 0; i < n; i++) {
        if (rnd() % 23 == 0) cur = (uint8_t)(cur + (int)(rnd() % 7) - 3);
        v[i] = cur;
      }
      break;
    }
    case 4: {  // text-like: small alphabet, variable-length words
      static const char* words[] = {"the", "quick", "brown", "fox", " ",
                                    "jumps", "over", "lazy", "dog", "\n"};
      size_t i = 0;
      while (i < n) {
        const char* w = words[rnd() % 10];
        size_t l = strlen(w);
        if (l > n - i) l = n - i;
        memcpy(v.data() + i, w, l);
        i += l;
      }
      break;
    }
    case 5: {  // long-distance repeats: blocks re-pasted at >256 distances
      size_t i = 0;
      while (i < n) {
        if (i > 4096 && rnd() % 3) {
          size_t back = 257 + rnd() % 30000;
          if (back > i) back = i;
          size_t len = 4 + rnd() % 300;
          if (len > n - i) len = n - i;
          for (size_t k = 0; k < len; k++) v[i + k] = v[i - back + k];
          i += len;
        } else {
          v[i++] = (uint8_t)rnd();
        }
      }
      break;
    }
    case 6: {  // mixed compressible / incompressible segments (per-block
               // stored-vs-huffman decisions)
      size_t i = 0;
      while (i < n) {
        size_t len = 1000 + rnd() % 60000;
        if (len > n - i) len = n - i;
        if (rnd() & 1)
          for (size_t k = 0; k < len; k++) v[i + k] = (uint8_t)rnd();
        else
          memset(v.data() + i, (int)(rnd() & 255), len);
        i += len;
      }
      break;
    }
    default: {  // match-length boundary stress: runs of ~258
      size_t i = 0;
      while (i < n) {
        size_t len = 250 + rnd() % 20;
        if (len > n - i) len = n - i;
        memset(v.data() + i, (int)(rnd() & 255), len);
        i += len;
      }
      break;
    }
  }
  return v;
}

static int check(const std::vector<uint8_t>& data, const char* what) {
  uint8_t* fd_out = nullptr;
  size_t fd_len = 0;
  if (fast_deflate9_filtered(data.data(), data.size(), &fd_out, &fd_len) != 0) {
    printf("FAIL %s: fast_deflate returned error\n", what);
    return 1;
  }
  size_t chunk = data.size() + 1;
  if (rnd() % 3 == 0) chunk = 1 + rnd() % 5000;  // exercise streamed feeding
  std::vector<uint8_t> ref = zlib_ref(data.data(), data.size(), chunk);
  int bad = 0;
  if (fd_len != ref.size()) {
    printf("FAIL %s: size %zu vs zlib %zu\n", what, fd_len, ref.size());
    bad = 1;
  } else if (memcmp(fd_out, ref.data(), fd_len) != 0) {
    size_t i = 0;
    while (i < fd_len && fd_out[i] == ref[i]) i++;
    printf("FAIL %s: first byte diff at %zu/%zu (%02x vs %02x)\n", what, i,
           fd_len, fd_out[i], ref[i]);
    bad = 1;
  }
  free(fd_out);
  return bad;
}

static std::vector<uint8_t> read_file(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return {};
  fseek(f, 0, SEEK_END);
  long fl = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> data((size_t)fl);
  if (fread(data.data(), 1, data.size(), f) != data.size()) data.clear();
  fclose(f);
  return data;
}

// --bench FILE [reps]: time the clone (and libz once) on FILE's raw bytes
static int bench_mode(int argc, char** argv) {
  if (argc < 3) return 2;
  std::vector<uint8_t> data = read_file(argv[2]);
  if (data.empty()) { printf("cannot read %s\n", argv[2]); return 2; }
  int reps = argc > 3 ? atoi(argv[3]) : 9;
  double best = 1e30;
  size_t out_len = 0;
  for (int r = 0; r < reps; r++) {
    struct timespec t0, t1;
    clock_gettime(CLOCK_MONOTONIC, &t0);
    uint8_t* out = nullptr;
    fast_deflate9_filtered(data.data(), data.size(), &out, &out_len);
    clock_gettime(CLOCK_MONOTONIC, &t1);
    free(out);
    double s = (t1.tv_sec - t0.tv_sec) + 1e-9 * (t1.tv_nsec - t0.tv_nsec);
    if (s < best) best = s;
  }
  struct timespec t0, t1;
  clock_gettime(CLOCK_MONOTONIC, &t0);
  std::vector<uint8_t> ref = zlib_ref(data.data(), data.size(), data.size() + 1);
  clock_gettime(CLOCK_MONOTONIC, &t1);
  double zs = (t1.tv_sec - t0.tv_sec) + 1e-9 * (t1.tv_nsec - t0.tv_nsec);
  printf("clone: %.1f ms (%.1f ns/B) -> %zu B; libz: %.1f ms (%.1f ns/B), "
         "%.2fx, identical=%d\n",
         best * 1e3, best * 1e9 / data.size(), out_len, zs * 1e3,
         zs * 1e9 / data.size(), zs / best,
         out_len == ref.size());
  return 0;
}

int main(int argc, char** argv) {
  if (argc > 1 && strcmp(argv[1], "--bench") == 0) return bench_mode(argc, argv);
  rng_state = argc > 1 ? strtoull(argv[1], nullptr, 10) : 12345;
  int fails = 0, cases = 0;

  static const size_t sizes[] = {0, 1, 2, 3, 4, 5, 17, 100, 261, 262,
                                 1000, 16384, 32768, 32769, 65536,
                                 98301 - 5, 98301 + 5, 200000, 1 << 20};
  char label[64];
  for (size_t s : sizes) {
    for (int kind = 0; kind < N_KINDS; kind++) {
      snprintf(label, sizeof label, "size=%zu kind=%d", s, kind);
      fails += check(gen(kind, s), label);
      cases++;
    }
  }
  // randomized sizes, incl. >2*W_SIZE to cross window slides repeatedly
  for (int i = 0; i < 40; i++) {
    size_t s = rnd() % (1u << (10 + rnd() % 11));
    int kind = (int)(rnd() % N_KINDS);
    snprintf(label, sizeof label, "rand size=%zu kind=%d", s, kind);
    fails += check(gen(kind, s), label);
    cases++;
  }
  for (int a = 2; a < argc; a++) {
    FILE* f = fopen(argv[a], "rb");
    if (!f) continue;
    fseek(f, 0, SEEK_END);
    long fl = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::vector<uint8_t> data((size_t)fl);
    if (fread(data.data(), 1, data.size(), f) != data.size()) {
      fclose(f);
      continue;
    }
    fclose(f);
    fails += check(data, argv[a]);
    cases++;
  }
  printf("%s: %d/%d cases byte-identical\n", fails ? "FAIL" : "OK",
         cases - fails, cases);
  return fails ? 1 : 0;
}
