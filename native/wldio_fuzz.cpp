// Fuzz/soak harness for the wldio parsers, built with sanitizers:
//
//   make -C native fuzz     (ASan + UBSan, then runs it)
//
// Feeds the FASTA/VCF/format entry points structured-random and mutated
// inputs; any out-of-bounds access, leak, or UB aborts the run.  This is a
// standalone binary (not linked into libwldio.so) so the sanitizer runtime
// doesn't need to be preloaded into Python.

#include <unistd.h>
#include <zlib.h>

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <random>
#include <string>
#include <vector>

extern "C" {
void* wldio_fasta_open(const char*, int64_t*, int64_t*, int64_t*, char*,
                       int64_t);
int wldio_fasta_fill(void*, int8_t*, char*);
void wldio_fasta_close(void*);
void* wldio_vcf_open(const char*, int64_t*, int64_t*, char*, int64_t);
int wldio_vcf_fill(void*, int8_t*, int64_t*, char*, int64_t);
void wldio_vcf_close(void*);
int64_t wldio_format_pairs(const int64_t*, const int64_t*, const double*,
                           const double*, const double*, int64_t, int, char*,
                           int64_t);
int64_t wldio_format_weights(const double*, int64_t, int, char*, int64_t);
}

namespace {

std::mt19937_64 rng(20260818);

std::string tmp_write(const std::string& body) {
  static int counter = 0;
  std::string path = "/tmp/wldio_fuzz_" + std::to_string(getpid()) + "_" +
                     std::to_string(counter++);
  FILE* f = fopen(path.c_str(), "wb");
  fwrite(body.data(), 1, body.size(), f);
  fclose(f);
  return path;
}

void drive_fasta(const std::string& body) {
  std::string path = tmp_write(body);
  int64_t ns = 0, ss = 0, nl = 0;
  char err[4096] = {0};
  void* h = wldio_fasta_open(path.c_str(), &ns, &ss, &nl, err, sizeof(err));
  if (h) {
    std::vector<int8_t> out((size_t)(ns * ss));
    std::vector<char> names((size_t)nl + 1);
    wldio_fasta_fill(h, out.data(), names.data());
    wldio_fasta_close(h);
  }
  unlink(path.c_str());
}

void drive_vcf(const std::string& body) {
  std::string path = tmp_write(body);
  int64_t ns = 0, nh = 0;
  char err[4096] = {0};
  void* h = wldio_vcf_open(path.c_str(), &ns, &nh, err, sizeof(err));
  if (h) {
    std::vector<int8_t> out((size_t)(ns * nh));
    std::vector<int64_t> pos((size_t)ns);
    wldio_vcf_fill(h, out.data(), pos.data(), err, sizeof(err));
    wldio_vcf_close(h);
  }
  unlink(path.c_str());
}

std::string random_fasta() {
  static const char chars[] = "ACGTacgt-nNRY.>\t \r\n|/:0123456789";
  std::uniform_int_distribution<int> nlines(0, 20), llen(0, 60),
      ch(0, sizeof(chars) - 2);
  std::string s;
  int n = nlines(rng);
  for (int i = 0; i < n; ++i) {
    if (rng() % 3 == 0) s += ">";
    int m = llen(rng);
    for (int j = 0; j < m; ++j) s += chars[ch(rng)];
    s += "\n";
  }
  return s;
}

std::string random_vcf() {
  std::uniform_int_distribution<int> nrec(0, 12), nsmp(0, 24);
  static const char* gts[] = {"0|1", "1|1", ".|.", "0/1", "1",   ".",
                              "2|3", "0|6", "x|1", "0|1:35", "", "0||1"};
  std::string s;
  if (rng() % 8) s += "##fileformat=VCFv4.1\n";
  if (rng() % 8) s += "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT";
  int ns = nsmp(rng);
  for (int i = 0; i < ns; ++i) s += "\ts" + std::to_string(i);
  s += "\n";
  int n = nrec(rng);
  for (int r = 0; r < n; ++r) {
    s += "1\t" + std::to_string(rng() % 2000000000) + "\t.\tA\tT\t.\t.\t.\tGT";
    int k = (rng() % 4 == 0) ? nsmp(rng) : ns;  // sometimes ragged
    for (int i = 0; i < k; ++i) {
      s += "\t";
      s += gts[rng() % (sizeof(gts) / sizeof(*gts))];
    }
    s += "\n";
  }
  return s;
}

void mutate(std::string* s) {
  if (s->empty()) return;
  std::uniform_int_distribution<size_t> pos(0, s->size() - 1);
  switch (rng() % 4) {
    case 0: (*s)[pos(rng)] = (char)(rng() % 256); break;
    case 1: s->erase(pos(rng), 1 + rng() % 8); break;
    case 2: s->insert(pos(rng), std::string(1 + rng() % 8,
                                            (char)(rng() % 256))); break;
    case 3: s->resize(pos(rng)); break;  // truncate
  }
}

std::string gzip_compress(const std::string& in) {
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  deflateInit2(&zs, Z_DEFAULT_COMPRESSION, Z_DEFLATED, 15 + 16, 8,
               Z_DEFAULT_STRATEGY);
  std::string out(in.size() + 128, '\0');
  zs.next_in = (Bytef*)in.data();
  zs.avail_in = (uInt)in.size();
  zs.next_out = (Bytef*)&out[0];
  zs.avail_out = (uInt)out.size();
  while (deflate(&zs, Z_FINISH) != Z_STREAM_END) {
    size_t used = out.size() - zs.avail_out;
    out.resize(out.size() * 2);
    zs.next_out = (Bytef*)&out[used];
    zs.avail_out = (uInt)(out.size() - used);
  }
  out.resize(out.size() - zs.avail_out);
  deflateEnd(&zs);
  return out;
}

// Gzip family: the inflate loop in wldio.cpp (buffer resizing, multi-member
// reset, corrupt/truncated streams) is unreachable from byte-random inputs
// (the 1f 8b magic is ~2^-16 per input), so feed it deliberately: valid
// single- and multi-member streams, then sanitizer-checked mutations of the
// COMPRESSED bytes.
void drive_gzip(const std::string& plain, void (*drive)(const std::string&)) {
  std::string gz = gzip_compress(plain);
  if (rng() % 3 == 0) gz += gzip_compress(plain);  // multi-member (BGZF-like)
  drive(gz);
  mutate(&gz);
  drive(gz);
}

void drive_format(int iters) {
  std::uniform_real_distribution<double> u(-2.0, 2.0);
  for (int i = 0; i < iters; ++i) {
    int n = (int)(rng() % 64);
    std::vector<int64_t> pa(n), pb(n);
    std::vector<double> d(n), dp(n), r2(n);
    for (int j = 0; j < n; ++j) {
      pa[j] = (int64_t)rng();
      pb[j] = (int64_t)(rng() % 1000000);
      d[j] = u(rng) * std::pow(10.0, (double)((int)(rng() % 41) - 20));
      dp[j] = (rng() % 16 == 0) ? (0.0 / 0.0) : u(rng);
      r2[j] = (rng() % 16 == 0) ? (1.0 / 0.0) : u(rng);
    }
    std::vector<char> out((size_t)n * 128 + 16);
    int ndig = (int)(rng() % 120) - 4;  // includes invalid <0 and >100
    int64_t w = wldio_format_pairs(pa.data(), pb.data(), d.data(), dp.data(),
                                   r2.data(), n, ndig, out.data(),
                                   (int64_t)out.size());
    if (w > (int64_t)out.size()) abort();
    std::vector<char> wout((size_t)n * 64 + 16);
    w = wldio_format_weights(r2.data(), n, ndig, wout.data(),
                             (int64_t)wout.size());
    if (w > (int64_t)wout.size()) abort();
  }
}

}  // namespace

int main(int argc, char** argv) {
  int iters = argc > 1 ? atoi(argv[1]) : 2000;
  for (int i = 0; i < iters; ++i) {
    std::string f = random_fasta();
    drive_fasta(f);
    mutate(&f);
    drive_fasta(f);
    std::string v = random_vcf();
    drive_vcf(v);
    drive_gzip(v, drive_vcf);
    mutate(&v);
    drive_vcf(v);
    drive_gzip(f, drive_fasta);
  }
  drive_format(iters / 4);
  printf("fuzz ok: %d iterations\n", iters);
  return 0;
}
