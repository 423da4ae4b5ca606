// Native sequence ingest: FASTA/FASTQ (plain or gzip) -> packed base-code
// batches.  Role of ref libs/seq_file + src/basic/seq_reader.c: the
// host-side decode path that must not starve the chips (SURVEY.md §7
// "Host IO throughput").  Exposed as a tiny C ABI consumed via ctypes
// (no pybind11 in this image).
//
// Base coding matches mccortex_tpu.constants: A=0 C=1 G=2 T=3, other=4.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <zlib.h>

namespace {

struct SeqFile {
  gzFile gz;            // zlib handles plain files transparently
  int format;           // 0 unknown, 1 fasta, 2 fastq
  char *linebuf;
  size_t linecap;
  bool have_pending;    // a header line already read
  char *pending;
  size_t pendingcap;
};

uint8_t base_code[256];

struct CodeInit {
  CodeInit() {
    memset(base_code, 4, sizeof(base_code));
    base_code[(int)'A'] = base_code[(int)'a'] = 0;
    base_code[(int)'C'] = base_code[(int)'c'] = 1;
    base_code[(int)'G'] = base_code[(int)'g'] = 2;
    base_code[(int)'T'] = base_code[(int)'t'] = 3;
  }
} code_init;

// gz-aware getline; returns length or -1 on EOF. Strips trailing \n/\r.
long read_line(SeqFile *f, char **buf, size_t *cap) {
  size_t len = 0;
  for (;;) {
    if (len + 4096 > *cap) {
      *cap = (*cap ? *cap * 2 : 8192);
      *buf = (char *)realloc(*buf, *cap);
    }
    char *dst = *buf + len;
    if (gzgets(f->gz, dst, (int)(*cap - len)) == NULL) {
      if (len == 0) return -1;
      break;
    }
    size_t got = strlen(dst);
    len += got;
    if (len > 0 && (*buf)[len - 1] == '\n') break;
  }
  while (len > 0 && ((*buf)[len - 1] == '\n' || (*buf)[len - 1] == '\r'))
    len--;
  (*buf)[len] = '\0';
  return (long)len;
}

}  // namespace

extern "C" {

void *mctx_seq_open(const char *path) {
  gzFile gz = gzopen(path, "rb");
  if (!gz) return nullptr;
  gzbuffer(gz, 1 << 20);
  SeqFile *f = new SeqFile();
  f->gz = gz;
  f->format = 0;
  f->linebuf = nullptr;
  f->linecap = 0;
  f->have_pending = false;
  f->pending = nullptr;
  f->pendingcap = 0;
  return f;
}

void mctx_seq_close(void *h) {
  SeqFile *f = (SeqFile *)h;
  if (!f) return;
  gzclose(f->gz);
  free(f->linebuf);
  free(f->pending);
  delete f;
}

// Read up to max_reads reads; each padded/truncated to max_len.
// codes:  (max_reads * max_len) u8, filled with 4 padding
// quals:  (max_reads * max_len) u8 phred scores (0 if absent)
// lens:   (max_reads) i32 true lengths (pre-truncation)
// Returns number of reads produced, 0 at EOF, -1 on error.
long mctx_seq_read_batch(void *h, long max_reads, long max_len,
                         uint8_t *codes, uint8_t *quals, int32_t *lens) {
  SeqFile *f = (SeqFile *)h;
  memset(codes, 4, (size_t)max_reads * max_len);
  memset(quals, 0, (size_t)max_reads * max_len);
  long n = 0;
  while (n < max_reads) {
    long len;
    if (f->have_pending) {
      len = (long)strlen(f->pending);
      // swap pending into linebuf
      char *tmp = f->linebuf; size_t tcap = f->linecap;
      f->linebuf = f->pending; f->linecap = f->pendingcap;
      f->pending = tmp; f->pendingcap = tcap;
      f->have_pending = false;
    } else {
      len = read_line(f, &f->linebuf, &f->linecap);
      if (len < 0) break;
      if (len == 0) continue;
    }
    char first = f->linebuf[0];
    if (f->format == 0) {
      if (first == '>') f->format = 1;
      else if (first == '@') f->format = 2;
      else return -1;
    }
    uint8_t *crow = codes + (size_t)n * max_len;
    uint8_t *qrow = quals + (size_t)n * max_len;
    if (f->format == 1) {
      if (first != '>') return -1;
      // read sequence lines until next '>' or EOF
      long total = 0;
      for (;;) {
        long l2 = read_line(f, &f->pending, &f->pendingcap);
        if (l2 < 0) break;
        if (l2 == 0) continue;
        if (f->pending[0] == '>') { f->have_pending = true; break; }
        for (long i = 0; i < l2; i++) {
          if (total + i < max_len)
            crow[total + i] = base_code[(uint8_t)f->pending[i]];
        }
        total += l2;
      }
      lens[n] = (int32_t)total;
      n++;
    } else {
      if (first != '@') return -1;
      long l2 = read_line(f, &f->linebuf, &f->linecap);  // sequence
      if (l2 < 0) return -1;
      long seqlen = l2;
      for (long i = 0; i < l2 && i < max_len; i++)
        crow[i] = base_code[(uint8_t)f->linebuf[i]];
      if (read_line(f, &f->linebuf, &f->linecap) < 0) return -1;  // '+'
      long l4 = read_line(f, &f->linebuf, &f->linecap);           // quals
      if (l4 < 0) return -1;
      for (long i = 0; i < l4 && i < max_len; i++) {
        int q = (int)f->linebuf[i] - 33;
        qrow[i] = (uint8_t)(q < 0 ? 0 : (q > 255 ? 255 : q));
      }
      lens[n] = (int32_t)seqlen;
      n++;
    }
  }
  return n;
}

}  // extern "C"
