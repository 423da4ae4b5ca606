// Native sorted-record merge for the host-spill path of the LSM build
// (graph/build.py _merge2_np): two sorted sentinel-padded record arrays
// -> one merged array with duplicate keys combined (covg summed with
// u32 saturation, edges OR-ed per colour).  Role of the reference's
// hash-table accumulation at scales past device memory
// (ref src/graph/hash_table.c find_or_insert + db_graph covg/edges);
// a single-pass two-pointer merge runs ~5-10x numpy's searchsorted +
// scatter + ufunc.at pipeline on 100M-record inputs.

#include <cstdint>
#include <cstring>

namespace {

inline bool is_sent(const uint64_t *k, int W) {
  for (int w = 0; w < W; w++)
    if (k[w] != ~0ULL) return false;
  return true;
}

inline int keycmp(const uint64_t *a, const uint64_t *b, int W) {
  for (int w = 0; w < W; w++) {
    if (a[w] < b[w]) return -1;
    if (a[w] > b[w]) return 1;
  }
  return 0;
}

}  // namespace

extern "C" {

// Returns the number of merged records written (<= na + nb).
long mctx_merge_records(const uint64_t *ak, const uint32_t *ac,
                        const uint8_t *ae, long na,
                        const uint64_t *bk, const uint32_t *bc,
                        const uint8_t *be, long nb,
                        int W, int C,
                        uint64_t *ok, uint32_t *oc, uint8_t *oe) {
  long i = 0, j = 0, o = 0;
  // trim sentinel tails
  while (na > 0 && is_sent(ak + (na - 1) * W, W)) na--;
  while (nb > 0 && is_sent(bk + (nb - 1) * W, W)) nb--;
  while (i < na || j < nb) {
    int c;
    if (i >= na) c = 1;
    else if (j >= nb) c = -1;
    else c = keycmp(ak + i * W, bk + j * W, W);
    if (c < 0) {
      memcpy(ok + o * W, ak + i * W, 8 * W);
      memcpy(oc + o * C, ac + i * C, 4 * C);
      memcpy(oe + o * C, ae + i * C, C);
      i++;
    } else if (c > 0) {
      memcpy(ok + o * W, bk + j * W, 8 * W);
      memcpy(oc + o * C, bc + j * C, 4 * C);
      memcpy(oe + o * C, be + j * C, C);
      j++;
    } else {
      memcpy(ok + o * W, ak + i * W, 8 * W);
      for (int col = 0; col < C; col++) {
        uint64_t s = (uint64_t)ac[i * C + col] + bc[j * C + col];
        oc[o * C + col] = s > 0xFFFFFFFFULL ? 0xFFFFFFFFU : (uint32_t)s;
        oe[o * C + col] = ae[i * C + col] | be[j * C + col];
      }
      i++;
      j++;
    }
    o++;
  }
  return o;
}

}  // extern "C"
