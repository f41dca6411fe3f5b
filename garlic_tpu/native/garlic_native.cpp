// Native host kernels for garlic_tpu.
//
// 1. Streaming gzip TPED parser with the reference's exact allele-coding
//    semantics (first non-missing character becomes the '1' allele; a
//    half-missing genotype still contributes its observed allele to the
//    frequency) — reference behavior: szpiech/garlic src/garlic-data.cpp:10-177.
// 2. Exact float64 rolling-window LOD recurrence matching the reference's
//    summation order (fresh left-to-right sum at the start of each
//    non-missing run, then win[l] = (win[l-1] - a[l-1]) + a[l+W-1]) —
//    reference behavior: src/garlic-roh.cpp:46-126.
//
// Exposed as a C ABI for ctypes.  Build: see build.py.

#include <cctype>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>
#include <zlib.h>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

struct ChromBlock {
  std::string name;
  std::vector<int64_t> positions;
  std::vector<double> gpos;
  std::vector<double> freq;
  std::vector<char> allele;
  std::string names;  // '\n'-joined locus names
  std::vector<int8_t> geno;        // [L][I] locus-major (transposed on copy)
  std::vector<uint8_t> first_copy; // [L][I]
};

struct TpedHandle {
  std::vector<ChromBlock> chroms;
  int64_t nind = 0;
  std::string error;
};

// Read one line from a gzFile into buf (grows as needed). Returns false on EOF.
bool read_line(gzFile f, std::string &buf) {
  buf.clear();
  char chunk[1 << 16];
  for (;;) {
    if (gzgets(f, chunk, sizeof(chunk)) == nullptr) return !buf.empty();
    buf += chunk;
    if (!buf.empty() && buf.back() == '\n') {
      buf.pop_back();
      if (!buf.empty() && buf.back() == '\r') buf.pop_back();
      return true;
    }
  }
}

int count_fields(const std::string &s) {
  int n = 0;
  bool in_tok = false;
  for (char c : s) {
    if (!isspace((unsigned char)c)) {
      if (!in_tok) { n++; in_tok = true; }
    } else {
      in_tok = false;
    }
  }
  return n;
}

}  // namespace

extern "C" {

void *gt_tped_open(const char *path, char missing) {
  gzFile f = gzopen(path, "rb");
  if (!f) return nullptr;
  auto *h = new TpedHandle;
  std::string line;
  ChromBlock *blk = nullptr;
  std::string prev_chr;
  std::vector<int8_t> geno_row;
  std::vector<uint8_t> fc_row;
  while (read_line(f, line)) {
    if (line.find_first_not_of(" \t") == std::string::npos) continue;
    int nfields = count_fields(line);
    int64_t nind = (nfields - 4) / 2;
    if (nind <= 0) { h->error = "bad tped line"; break; }
    h->nind = nind;
    const char *p = line.c_str();
    // field 1: chromosome
    while (isspace((unsigned char)*p)) p++;
    const char *q = p;
    while (*q && !isspace((unsigned char)*q)) q++;
    std::string chrom(p, q - p);
    p = q;
    // field 2: locus name
    while (isspace((unsigned char)*p)) p++;
    q = p;
    while (*q && !isspace((unsigned char)*q)) q++;
    std::string lname(p, q - p);
    p = q;
    // fields 3-4: genetic and physical position
    char *endp;
    double gpos = strtod(p, &endp);
    p = endp;
    double ppos = strtod(p, &endp);
    p = endp;

    if (blk == nullptr || chrom != prev_chr) {
      h->chroms.emplace_back();
      blk = &h->chroms.back();
      blk->name = chrom;
      prev_chr = chrom;
    }
    blk->positions.push_back((int64_t)ppos);
    blk->gpos.push_back(gpos);
    if (!blk->names.empty()) blk->names += '\n';
    blk->names += lname;

    // allele stream: one non-whitespace char at a time (matches C++ `>> char`)
    char one_allele = missing;
    int64_t nalleles = 0, total = 0;
    geno_row.assign(nind, 0);
    fc_row.assign(nind, 0);
    for (int64_t i = 0; i < nind; i++) {
      while (isspace((unsigned char)*p)) p++;
      char a1 = *p ? *p++ : missing;
      while (isspace((unsigned char)*p)) p++;
      char a2 = *p ? *p++ : missing;
      if (one_allele == missing && a1 != missing) one_allele = a1;
      if (one_allele == missing && a2 != missing) one_allele = a2;
      int d = 0;
      if (a1 == missing) d += -9;
      else if (a1 == one_allele) { d += 1; nalleles++; total++; }
      else total++;
      if (a2 == missing) d += -9;
      else if (a2 == one_allele) { d += 1; nalleles++; total++; }
      else total++;
      if (d < 0) d = -9;
      geno_row[i] = (int8_t)d;
      fc_row[i] = (a1 == one_allele);
    }
    blk->allele.push_back(one_allele);
    blk->freq.push_back(total == 0 ? 0.0 : (double)nalleles / (double)total);
    blk->geno.insert(blk->geno.end(), geno_row.begin(), geno_row.end());
    blk->first_copy.insert(blk->first_copy.end(), fc_row.begin(), fc_row.end());
  }
  gzclose(f);
  if (!h->error.empty() || h->chroms.empty()) {
    delete h;
    return nullptr;
  }
  return h;
}

int gt_tped_nchrom(void *hv) { return (int)((TpedHandle *)hv)->chroms.size(); }
int64_t gt_tped_nind(void *hv) { return ((TpedHandle *)hv)->nind; }

int64_t gt_tped_nloci(void *hv, int c) {
  return (int64_t)((TpedHandle *)hv)->chroms[c].positions.size();
}

const char *gt_tped_chrom_name(void *hv, int c) {
  return ((TpedHandle *)hv)->chroms[c].name.c_str();
}

int64_t gt_tped_names_size(void *hv, int c) {
  return (int64_t)((TpedHandle *)hv)->chroms[c].names.size();
}

// Copy chromosome c into caller buffers. geno/first_copy become
// individual-major [I][L].
void gt_tped_copy(void *hv, int c, int64_t *positions, double *gpos,
                  char *alleles, int8_t *geno, uint8_t *first_copy,
                  double *freq, char *names_buf) {
  TpedHandle *h = (TpedHandle *)hv;
  ChromBlock &b = h->chroms[c];
  int64_t L = (int64_t)b.positions.size();
  int64_t I = h->nind;
  memcpy(positions, b.positions.data(), L * sizeof(int64_t));
  memcpy(gpos, b.gpos.data(), L * sizeof(double));
  memcpy(alleles, b.allele.data(), L * sizeof(char));
  memcpy(freq, b.freq.data(), L * sizeof(double));
  memcpy(names_buf, b.names.data(), b.names.size());
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (int64_t l = 0; l < L; l++) {
    for (int64_t i = 0; i < I; i++) {
      geno[i * L + l] = b.geno[l * I + i];
      first_copy[i * L + l] = b.first_copy[l * I + i];
    }
  }
}

void gt_tped_close(void *hv) { delete (TpedHandle *)hv; }

// Exact rolling-window LOD: terms [I][L] f64, missing [nwin] u8 (1=missing),
// out win [I][L] f64 pre-filled by caller or filled here with MISSING.
void gt_lod_windows_exact(const double *terms, const uint8_t *missing,
                          int64_t I, int64_t L, int64_t W, double miss_val,
                          double *win) {
  int64_t nwin = L - W + 1;
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (int64_t ind = 0; ind < I; ind++) {
    const double *a = terms + ind * L;
    double *w = win + ind * L;
    for (int64_t l = 0; l < L; l++) w[l] = miss_val;
    if (nwin <= 0) continue;
    int64_t l = 0;
    bool have_acc = false;
    double acc = 0.0;
    while (l < nwin) {
      if (missing[l]) {
        have_acc = false;
        l++;
        continue;
      }
      if (!have_acc) {
        acc = 0.0;
        for (int64_t k = 0; k < W; k++) acc += a[l + k];
        have_acc = true;
      } else {
        acc = (acc - a[l - 1]) + a[l + W - 1];
      }
      w[l] = acc;
      l++;
    }
  }
}

}  // extern "C"
