/* Native host codec: exact-policy BestSpeed DEFLATE encoder + inflate.
 *
 * Role in the framework (SURVEY.md §7): the host-side fast path and the
 * at-scale parity oracle.  The encoder reproduces, decision-for-decision,
 * the reference's policy so its output sizes define the ratio bar the TPU
 * encoder is measured against:
 *   - windowing + block policy      deflate.mbt:236-294
 *   - deflateFast matcher           deflate-fast.mbt:123-342 (including
 *     the empty-prev quirk, SURVEY §2.9.3: cross-block matches are
 *     admitted via the table value check but never extended)
 *   - boundary package-merge codes  huffman-code.mbt:112-343 (leaf-prefix
 *     formulation, identical tie-breaking)
 *   - codegen RLE + dynamic blocks  huffman-bit-writer.mbt:241-542
 *   - close-time final empty stored block  deflate.mbt:157-183
 * The decoder implements the zlib-style two-level table walk
 * (inflate.mbt:69-223) with a 32 KB window and preset-dictionary support.
 *
 * Built as a plain shared library; Python binds with ctypes
 * (moonbit_flate_tpu/native.py).
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#define WINDOW_SIZE 32768
#define MAX_MATCH_OFFSET 32768
#define MAX_STORE 65535
#define TABLE_BITS 14
#define TABLE_SIZE (1 << TABLE_BITS)
#define HASH_MUL 0x1e35a7bdu
#define BUFFER_RESET (0x7fffffff - 2 * MAX_STORE)
#define MAX_NUM_LIT 286
#define MAX_NUM_DIST 30
#define NUM_CODES 19
#define EOB 256

/* ---------------- tables ---------------- */

static const int codegen_order[19] =
    {16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1, 15};

static uint8_t length_codes[256];
static int32_t length_base[29], length_extra[29];
static uint8_t offset_codes_tab[256];
static int32_t offset_base[30], offset_extra[30];
static uint16_t rev_tab[1 << 16];
static int tables_ready = 0;

static void init_tables(void) {
    if (tables_ready) return;
    int len = 3;
    for (int i = 0; i < 28; i++) {
        int eb = i < 8 ? 0 : (i - 4) >> 2;
        length_base[i] = len; length_extra[i] = eb;
        len += 1 << eb;
    }
    length_base[28] = 258; length_extra[28] = 0;
    for (int c = 0; c < 28; c++) {
        int lo = length_base[c] - 3, hi = lo + (1 << length_extra[c]);
        for (int x = lo; x < hi && x < 256; x++) length_codes[x] = (uint8_t)c;
    }
    length_codes[255] = 28;
    int d = 1;
    for (int c = 0; c < 30; c++) {
        int eb = c < 4 ? 0 : (c - 2) >> 1;
        offset_base[c] = d; offset_extra[c] = eb;
        d += 1 << eb;
    }
    for (int c = 0; c < 30; c++) {
        int lo = offset_base[c] - 1;
        if (lo >= 256) break;
        int hi = lo + (1 << offset_extra[c]); if (hi > 256) hi = 256;
        for (int x = lo; x < hi; x++) offset_codes_tab[x] = (uint8_t)c;
    }
    for (int v = 0; v < (1 << 16); v++) {
        uint16_t r = 0;
        for (int b = 0; b < 16; b++) if (v & (1 << b)) r |= 1 << (15 - b);
        rev_tab[v] = r;
    }
    tables_ready = 1;
}

static inline int offset_code(int xoff) {
    if (xoff < 256) return offset_codes_tab[xoff];
    if (xoff < (256 << 7)) return offset_codes_tab[xoff >> 7] + 14;
    return offset_codes_tab[xoff >> 14] + 28;
}

static inline uint32_t rev_bits(uint32_t v, int width) {
    return rev_tab[(v << (16 - width)) & 0xffff];
}

/* ---------------- bit writer ---------------- */

typedef struct {
    uint8_t *out;
    long cap, pos;
    uint64_t bits;
    unsigned nbits;
    int err;
} BitW;

static inline void bw_flush48(BitW *w) {
    while (w->nbits >= 48) {
        if (w->pos + 6 > w->cap) { w->err = 1; return; }
        for (int i = 0; i < 6; i++) w->out[w->pos++] = (uint8_t)(w->bits >> (8 * i));
        w->bits >>= 48; w->nbits -= 48;
    }
}

static inline void bw_bits(BitW *w, uint32_t v, unsigned n) {
    w->bits |= (uint64_t)(v & ((1u << n) - 1)) << w->nbits;
    w->nbits += n;
    if (w->nbits >= 48) bw_flush48(w);
}

static void bw_align(BitW *w) { /* pad to byte boundary and drain */
    while (w->nbits > 0) {
        if (w->pos >= w->cap) { w->err = 1; return; }
        w->out[w->pos++] = (uint8_t)w->bits;
        w->bits >>= 8;
        w->nbits = w->nbits > 8 ? w->nbits - 8 : 0;
    }
    w->bits = 0;
}

static void bw_bytes(BitW *w, const uint8_t *p, long n) {
    bw_align(w);
    if (w->pos + n > w->cap) { w->err = 1; return; }
    memcpy(w->out + w->pos, p, (size_t)n); w->pos += n;
}

/* ---------------- huffman code construction ---------------- */

typedef struct { int32_t freq; int32_t sym; } LNode;

static int cmp_lnode(const void *a, const void *b) {
    const LNode *x = a, *y = b;
    if (x->freq != y->freq) return x->freq < y->freq ? -1 : 1;
    return x->sym < y->sym ? -1 : (x->sym > y->sym ? 1 : 0);
}

typedef struct { uint16_t code; uint8_t len; } HC;

/* leaf-prefix boundary package-merge; ties: package before leaf */
static void hgenerate(const int32_t *freq, int n_alpha, int max_bits, HC *codes) {
    LNode list[MAX_NUM_LIT];
    int n = 0;
    for (int i = 0; i < n_alpha; i++) {
        codes[i].len = 0; codes[i].code = 0;
        if (freq[i] > 0) { list[n].freq = freq[i]; list[n].sym = i; n++; }
    }
    if (n == 0) return;
    if (n <= 2) {
        for (int i = 0; i < n; i++) { codes[list[i].sym].len = 1; codes[list[i].sym].code = (uint16_t)i; }
        return;
    }
    qsort(list, (size_t)n, sizeof(LNode), cmp_lnode);
    int L = max_bits < n - 1 ? max_bits : n - 1;

    /* forward merge: weights per level, leaf-prefix counts */
    enum { MAXI = 2 * MAX_NUM_LIT };
    static int64_t w[MAXI], pkg[MAX_NUM_LIT], merged[MAXI];
    static int32_t leaf_pref[16][MAXI + 1];
    int m = n; /* current list length */
    for (int i = 0; i < n; i++) w[i] = list[i].freq;
    for (int lvl = 2; lvl <= L; lvl++) {
        int npkg = m / 2;
        for (int i = 0; i < npkg; i++) pkg[i] = w[2 * i] + w[2 * i + 1];
        /* merge leaves and packages; package wins ties */
        int i = 0, j = 0, k = 0;
        leaf_pref[lvl][0] = 0;
        while (i < npkg || j < n) {
            int take_pkg = (j >= n) || (i < npkg && pkg[i] <= (int64_t)list[j].freq);
            if (take_pkg) { merged[k] = pkg[i++]; leaf_pref[lvl][k + 1] = leaf_pref[lvl][k]; }
            else { merged[k] = list[j++].freq; leaf_pref[lvl][k + 1] = leaf_pref[lvl][k] + 1; }
            k++;
        }
        m = k;
        memcpy(w, merged, (size_t)m * sizeof(int64_t));
    }
    /* backward: s_L = 2n-2; x_l = leaves in first s_l; s_{l-1}=2(s_l-x_l) */
    int x[16];
    int s = 2 * n - 2;
    for (int lvl = L; lvl >= 2; lvl--) {
        x[lvl] = leaf_pref[lvl][s];
        s = 2 * (s - x[lvl]);
    }
    x[1] = s;
    /* lengths by sorted rank: rank r gets #\{lvl: r < x[lvl]\} bits */
    static uint8_t rank_len[MAX_NUM_LIT];
    for (int r = 0; r < n; r++) {
        int c = 0;
        for (int lvl = 1; lvl <= L; lvl++) if (r < x[lvl]) c++;
        rank_len[r] = (uint8_t)c;
    }
    for (int r = 0; r < n; r++) codes[list[r].sym].len = rank_len[r];

    /* canonical assignment in symbol order, bit-reversed */
    int bl_count[16] = {0};
    for (int i = 0; i < n_alpha; i++) if (codes[i].len) bl_count[codes[i].len]++;
    int next_code[17]; int code = 0;
    next_code[0] = 0;
    for (int b = 1; b <= 15; b++) { code = (code + bl_count[b - 1]) << 1; next_code[b] = code; }
    for (int i = 0; i < n_alpha; i++) {
        if (!codes[i].len) continue;
        codes[i].code = (uint16_t)rev_bits((uint32_t)next_code[codes[i].len]++, codes[i].len);
    }
}

/* ---------------- codegen RLE ---------------- */

typedef struct {
    uint8_t syms[MAX_NUM_LIT + MAX_NUM_DIST + 1];
    int16_t extra[MAX_NUM_LIT + MAX_NUM_DIST + 1];
    int count;
    int32_t freq[NUM_CODES];
} Codegen;

static void gen_codegen(const HC *lit, int nlit, const HC *off, int noff, Codegen *cg) {
    uint8_t seq[MAX_NUM_LIT + MAX_NUM_DIST];
    int n = 0;
    for (int i = 0; i < nlit; i++) seq[n++] = lit[i].len;
    for (int i = 0; i < noff; i++) seq[n++] = off[i].len;
    memset(cg->freq, 0, sizeof cg->freq);
    cg->count = 0;
    int i = 0;
    while (i < n) {
        int size = seq[i], j = i + 1;
        while (j < n && seq[j] == size) j++;
        int cnt = j - i;
        if (size != 0) {
            cg->syms[cg->count] = (uint8_t)size; cg->extra[cg->count++] = -1; cg->freq[size]++;
            cnt--;
            while (cnt >= 3) {
                int rep = cnt < 6 ? cnt : 6;
                cg->syms[cg->count] = 16; cg->extra[cg->count++] = (int16_t)(rep - 3); cg->freq[16]++;
                cnt -= rep;
            }
        } else {
            while (cnt >= 11) {
                int rep = cnt < 138 ? cnt : 138;
                cg->syms[cg->count] = 18; cg->extra[cg->count++] = (int16_t)(rep - 11); cg->freq[18]++;
                cnt -= rep;
            }
            if (cnt >= 3) {
                cg->syms[cg->count] = 17; cg->extra[cg->count++] = (int16_t)(cnt - 3); cg->freq[17]++;
                cnt = 0;
            }
        }
        for (; cnt > 0; cnt--) {
            cg->syms[cg->count] = (uint8_t)size; cg->extra[cg->count++] = -1; cg->freq[size]++;
        }
        i = j;
    }
}

/* ---------------- block emitters ---------------- */

static long hbit_length(const HC *c, const int32_t *freq, int n) {
    long t = 0;
    for (int i = 0; i < n; i++) if (freq[i]) t += (long)freq[i] * c[i].len;
    return t;
}

static void write_stored_header(BitW *w, int len, int eof) {
    bw_bits(w, eof ? 1 : 0, 3);
    bw_align(w);
    bw_bits(w, (uint32_t)len, 16);
    bw_bits(w, (uint32_t)(~len) & 0xffff, 16);
}

/* tokens: packed u32, reference layout (token.mbt:8-24) */
#define T_MATCH (1u << 30)

typedef struct {
    int32_t lit_freq[MAX_NUM_LIT];
    int32_t off_freq[MAX_NUM_DIST];
    HC lit[MAX_NUM_LIT], off[MAX_NUM_DIST], cgc[NUM_CODES];
    Codegen cg;
} BlockEnc;

static void write_block_dynamic(BitW *w, BlockEnc *be, uint32_t *toks, int ntok,
                                const uint8_t *input, int inlen, int eof) {
    toks[ntok++] = EOB;
    memset(be->lit_freq, 0, sizeof be->lit_freq);
    memset(be->off_freq, 0, sizeof be->off_freq);
    for (int i = 0; i < ntok; i++) {
        uint32_t t = toks[i];
        if (t < T_MATCH) be->lit_freq[t]++;
        else {
            int xlen = (int)((t >> 22) & 0xff);
            int xoff = (int)(t & 0x3fffff);
            be->lit_freq[257 + length_codes[xlen]]++;
            be->off_freq[offset_code(xoff)]++;
        }
    }
    int nlit = MAX_NUM_LIT; while (be->lit_freq[nlit - 1] == 0) nlit--;
    int noff = MAX_NUM_DIST; while (noff > 0 && be->off_freq[noff - 1] == 0) noff--;
    if (noff == 0) { be->off_freq[0] = 1; noff = 1; }
    hgenerate(be->lit_freq, MAX_NUM_LIT, 15, be->lit);
    hgenerate(be->off_freq, MAX_NUM_DIST, 15, be->off);
    gen_codegen(be->lit, nlit, be->off, noff, &be->cg);
    hgenerate(be->cg.freq, NUM_CODES, 7, be->cgc);

    int ncg = NUM_CODES;
    while (ncg > 4 && be->cg.freq[codegen_order[ncg - 1]] == 0) ncg--;
    long header = 3 + 5 + 5 + 4 + 3L * ncg
        + hbit_length(be->cgc, be->cg.freq, NUM_CODES)
        + be->cg.freq[16] * 2L + be->cg.freq[17] * 3L + be->cg.freq[18] * 7L;
    long size = header + hbit_length(be->lit, be->lit_freq, MAX_NUM_LIT)
        + hbit_length(be->off, be->off_freq, MAX_NUM_DIST);
    /* reference quirk: stored fallback only when 8x smaller (SURVEY §2.9.2) */
    if (inlen > 0 && inlen <= MAX_STORE) {
        long ssize = (inlen + 5L) * 8;
        if (ssize < (size + size) >> 4) {
            write_stored_header(w, inlen, eof);
            bw_bytes(w, input, inlen);
            return;
        }
    }
    bw_bits(w, eof ? 5 : 4, 3);
    bw_bits(w, (uint32_t)(nlit - 257), 5);
    bw_bits(w, (uint32_t)(noff - 1), 5);
    bw_bits(w, (uint32_t)(ncg - 4), 4);
    for (int i = 0; i < ncg; i++) bw_bits(w, be->cgc[codegen_order[i]].len, 3);
    for (int i = 0; i < be->cg.count; i++) {
        int s = be->cg.syms[i];
        bw_bits(w, be->cgc[s].code, be->cgc[s].len);
        if (s == 16) bw_bits(w, (uint32_t)be->cg.extra[i], 2);
        else if (s == 17) bw_bits(w, (uint32_t)be->cg.extra[i], 3);
        else if (s == 18) bw_bits(w, (uint32_t)be->cg.extra[i], 7);
    }
    for (int i = 0; i < ntok; i++) {
        uint32_t t = toks[i];
        if (t < T_MATCH) {
            bw_bits(w, be->lit[t].code, be->lit[t].len);
        } else {
            int xlen = (int)((t >> 22) & 0xff);
            int xoff = (int)(t & 0x3fffff);
            int lc = length_codes[xlen];
            bw_bits(w, be->lit[257 + lc].code, be->lit[257 + lc].len);
            if (length_extra[lc]) bw_bits(w, (uint32_t)(xlen - (length_base[lc] - 3)), (unsigned)length_extra[lc]);
            int dc = offset_code(xoff);
            bw_bits(w, be->off[dc].code, be->off[dc].len);
            if (offset_extra[dc]) bw_bits(w, (uint32_t)(xoff - (offset_base[dc] - 1)), (unsigned)offset_extra[dc]);
        }
    }
}

static void write_block_huff(BitW *w, BlockEnc *be, const uint8_t *input, int inlen, int eof) {
    memset(be->lit_freq, 0, sizeof be->lit_freq);
    for (int i = 0; i < inlen; i++) be->lit_freq[input[i]]++;
    be->lit_freq[EOB] = 1;
    int nlit = EOB + 1, noff = 1;
    hgenerate(be->lit_freq, MAX_NUM_LIT, 15, be->lit);
    /* preset 1-bit offset encoder (huffman-code.mbt:691-726) */
    HC hoff[MAX_NUM_DIST]; memset(hoff, 0, sizeof hoff); hoff[0].len = 1; hoff[0].code = 0;
    int32_t off_freq[MAX_NUM_DIST]; memset(off_freq, 0, sizeof off_freq); off_freq[0] = 1;
    gen_codegen(be->lit, nlit, hoff, noff, &be->cg);
    hgenerate(be->cg.freq, NUM_CODES, 7, be->cgc);
    int ncg = NUM_CODES;
    while (ncg > 4 && be->cg.freq[codegen_order[ncg - 1]] == 0) ncg--;
    long header = 3 + 5 + 5 + 4 + 3L * ncg
        + hbit_length(be->cgc, be->cg.freq, NUM_CODES)
        + be->cg.freq[16] * 2L + be->cg.freq[17] * 3L + be->cg.freq[18] * 7L;
    long size = header + hbit_length(be->lit, be->lit_freq, MAX_NUM_LIT) + 1;
    if (inlen > 0 && inlen <= MAX_STORE) {
        long ssize = (inlen + 5L) * 8;
        if (ssize < (size + size) >> 4) {
            write_stored_header(w, inlen, eof);
            bw_bytes(w, input, inlen);
            return;
        }
    }
    bw_bits(w, eof ? 5 : 4, 3);
    bw_bits(w, (uint32_t)(nlit - 257), 5);
    bw_bits(w, (uint32_t)(noff - 1), 5);
    bw_bits(w, (uint32_t)(ncg - 4), 4);
    for (int i = 0; i < ncg; i++) bw_bits(w, be->cgc[codegen_order[i]].len, 3);
    for (int i = 0; i < be->cg.count; i++) {
        int s = be->cg.syms[i];
        bw_bits(w, be->cgc[s].code, be->cgc[s].len);
        if (s == 16) bw_bits(w, (uint32_t)be->cg.extra[i], 2);
        else if (s == 17) bw_bits(w, (uint32_t)be->cg.extra[i], 3);
        else if (s == 18) bw_bits(w, (uint32_t)be->cg.extra[i], 7);
    }
    for (int i = 0; i < inlen; i++) bw_bits(w, be->lit[input[i]].code, be->lit[input[i]].len);
    bw_bits(w, be->lit[EOB].code, be->lit[EOB].len);
}

/* ---------------- deflateFast matcher (exact reference policy) -------- */

typedef struct {
    uint32_t tab_val[TABLE_SIZE];
    int32_t tab_off[TABLE_SIZE];
    int32_t cur;
} DFast;

static inline uint32_t load32(const uint8_t *b, long i) {
    uint32_t v; memcpy(&v, b + i, 4); return v;  /* little-endian hosts */
}
static inline uint64_t load64(const uint8_t *b, long i) {
    uint64_t v; memcpy(&v, b + i, 8); return v;
}
static inline int dhash(uint32_t u) { return (int)((u * HASH_MUL) >> (32 - TABLE_BITS)); }

static void dfast_shift(DFast *d) {
    /* prev is always empty (reference quirk) -> just clear */
    memset(d->tab_val, 0, sizeof d->tab_val);
    memset(d->tab_off, 0, sizeof d->tab_off);
    d->cur = MAX_MATCH_OFFSET + 1;
}

static void dfast_reset(DFast *d) {
    d->cur += MAX_MATCH_OFFSET;
    if (d->cur >= BUFFER_RESET) dfast_shift(d);
}

static int dfast_match_len(long s, long t, const uint8_t *src, long n) {
    /* extension beyond the 4 already-matched bytes; t < 0 (prev block)
     * always yields 0 because prev is empty (SURVEY §2.9.3). */
    if (t < 0) return 0;
    long s1 = s + 258 - 4; if (s1 > n) s1 = n;
    long i = 0, a = s1 - s;
    while (i < a && src[s + i] == src[t + i]) i++;
    return (int)i;
}

static int dfast_encode(DFast *d, const uint8_t *src, int n, uint32_t *dst) {
    int ndst = 0;
    if (d->cur >= BUFFER_RESET) dfast_shift(d);
    if (n < 17) {
        d->cur += MAX_STORE;
        for (int i = 0; i < n; i++) dst[ndst++] = src[i];
        return ndst;
    }
    long s_limit = n - 15;
    long next_emit = 0, s = 0;
    uint32_t cv = load32(src, 0);
    int next_hash = dhash(cv);
    for (;;) {
        int skip = 32;
        long next_s = s;
        int cand_off; uint32_t cand_val;
        for (;;) {
            s = next_s;
            int bytes_between = skip >> 5;
            next_s = s + bytes_between;
            skip += bytes_between;
            if (next_s > s_limit) goto remainder;
            cand_off = d->tab_off[next_hash];
            cand_val = d->tab_val[next_hash];
            uint32_t now = load32(src, next_s);
            d->tab_off[next_hash] = (int32_t)(s + d->cur);
            d->tab_val[next_hash] = cv;
            next_hash = dhash(now);
            long offset = s - (cand_off - d->cur);
            if (offset > MAX_MATCH_OFFSET || cv != cand_val) { cv = now; continue; }
            break;
        }
        for (long i = next_emit; i < s; i++) dst[ndst++] = src[i];
        for (;;) {
            s += 4;
            long t = cand_off - d->cur + 4;
            int l = dfast_match_len(s, t, src, n);
            dst[ndst++] = T_MATCH | ((uint32_t)(l + 4 - 3) << 22) | (uint32_t)(s - t - 1);
            s += l;
            next_emit = s;
            if (s >= s_limit) goto remainder;
            uint64_t x = load64(src, s - 1);
            int prev_hash = dhash((uint32_t)x);
            d->tab_off[prev_hash] = (int32_t)(d->cur + s - 1);
            d->tab_val[prev_hash] = (uint32_t)x;
            x >>= 8;
            int curr_hash = dhash((uint32_t)x);
            cand_off = d->tab_off[curr_hash];
            cand_val = d->tab_val[curr_hash];
            d->tab_off[curr_hash] = (int32_t)(d->cur + s);
            d->tab_val[curr_hash] = (uint32_t)x;
            long offset = s - (cand_off - d->cur);
            if (offset > MAX_MATCH_OFFSET || (uint32_t)x != cand_val) {
                cv = (uint32_t)(x >> 8);
                next_hash = dhash(cv);
                s++;
                break;
            }
        }
    }
remainder:
    for (long i = next_emit; i < n; i++) dst[ndst++] = src[i];
    d->cur += n;
    return ndst;
}

/* ---------------- public encoder ---------------- */

long mf_deflate_fast(const uint8_t *in, long n, uint8_t *out, long cap) {
    init_tables();
    BitW w = { out, cap, 0, 0, 0, 0 };
    DFast *d = calloc(1, sizeof(DFast));
    BlockEnc *be = malloc(sizeof(BlockEnc));
    uint32_t *toks = malloc((MAX_STORE + 2) * sizeof(uint32_t));
    if (!d || !be || !toks) { free(d); free(be); free(toks); return -2; }
    d->cur = MAX_STORE;

    long pos = 0;
    for (;;) {
        long rem = n - pos;
        if (rem >= MAX_STORE) {
            int ntok = dfast_encode(d, in + pos, MAX_STORE, toks);
            if (ntok > MAX_STORE - (MAX_STORE >> 4))
                write_block_huff(&w, be, in + pos, MAX_STORE, 0);
            else
                write_block_dynamic(&w, be, toks, ntok, in + pos, MAX_STORE, 0);
            pos += MAX_STORE;
            continue;
        }
        /* sync/close path (deflate.mbt:236-277) */
        if (rem > 0) {
            if (rem < 128) {
                if (rem <= 16) {
                    write_stored_header(&w, (int)rem, 0);
                    bw_bytes(&w, in + pos, rem);
                } else {
                    write_block_huff(&w, be, in + pos, (int)rem, 0);
                }
                dfast_reset(d);
            } else {
                int ntok = dfast_encode(d, in + pos, (int)rem, toks);
                if (ntok > rem - (rem >> 4))
                    write_block_huff(&w, be, in + pos, (int)rem, 0);
                else
                    write_block_dynamic(&w, be, toks, ntok, in + pos, (int)rem, 0);
            }
            pos = n;
        }
        break;
    }
    write_stored_header(&w, 0, 1);  /* final empty stored block */
    bw_align(&w);
    long res = w.err ? -1 : w.pos;
    free(d); free(be); free(toks);
    return res;
}

/* ---------------- inflate ---------------- */

#define CHUNK_BITS 9
#define NUM_CHUNKS (1 << CHUNK_BITS)

typedef struct {
    int min;
    uint32_t chunks[NUM_CHUNKS];
    uint32_t *links;      /* nlinks x link_size */
    int nlinks, link_size;
    uint32_t link_mask;
} HDec;

static int hdec_init(HDec *h, const uint8_t *lengths, int n) {
    memset(h->chunks, 0, sizeof h->chunks);
    free(h->links); h->links = NULL; h->nlinks = 0; h->link_mask = 0; h->min = 0;
    int count[16] = {0};
    int mn = 0, mx = 0;
    for (int i = 0; i < n; i++) {
        int l = lengths[i];
        if (!l) continue;
        if (mn == 0 || l < mn) mn = l;
        if (l > mx) mx = l;
        count[l]++;
    }
    if (mx == 0) return 1;
    int code = 0, nextcode[16] = {0};
    for (int i = mn; i <= mx; i++) { code <<= 1; nextcode[i] = code; code += count[i]; }
    if (code != (1 << mx) && !(code == 1 && mx == 1)) return 0;
    h->min = mn;
    if (mx > CHUNK_BITS) {
        int num_links = 1 << (mx - CHUNK_BITS);
        h->link_mask = (uint32_t)(num_links - 1);
        int link = nextcode[CHUNK_BITS + 1] >> 1;
        h->nlinks = NUM_CHUNKS - link;
        h->link_size = num_links;
        h->links = calloc((size_t)h->nlinks * num_links, sizeof(uint32_t));
        if (!h->links) return 0;
        for (int j = link; j < NUM_CHUNKS; j++) {
            int reverse = rev_tab[j & 0xffff] >> (16 - CHUNK_BITS);
            int off = j - link;
            h->chunks[reverse] = ((uint32_t)off << 4) | (CHUNK_BITS + 1);
        }
    }
    for (int i = 0; i < n; i++) {
        int l = lengths[i];
        if (!l) continue;
        int c = nextcode[l]++;
        uint32_t chunk = ((uint32_t)i << 4) | (uint32_t)l;
        int reverse = rev_tab[c & 0xffff] >> (16 - l);
        if (l <= CHUNK_BITS) {
            for (int off = reverse; off < NUM_CHUNKS; off += 1 << l)
                h->chunks[off] = chunk;
        } else {
            int j = reverse & (NUM_CHUNKS - 1);
            uint32_t *tab = h->links + (size_t)(h->chunks[j] >> 4) * h->link_size;
            for (int off = reverse >> CHUNK_BITS; off < h->link_size; off += 1 << (l - CHUNK_BITS))
                tab[off] = chunk;
        }
    }
    return 1;
}

typedef struct {
    const uint8_t *in; long n, pos;
    uint32_t b; unsigned nb;
} BitR;

static inline int br_need(BitR *r, unsigned want) {
    while (r->nb < want) {
        if (r->pos >= r->n) return 0;
        r->b |= (uint32_t)r->in[r->pos++] << r->nb;
        r->nb += 8;
    }
    return 1;
}

static int huff_sym(BitR *r, const HDec *h) {
    unsigned n = (unsigned)h->min;
    for (;;) {
        if (!br_need(r, n)) return -1;            /* unexpected EOF */
        uint32_t chunk = h->chunks[r->b & (NUM_CHUNKS - 1)];
        n = chunk & 15;
        if (n > CHUNK_BITS) {
            chunk = h->links[(size_t)(chunk >> 4) * h->link_size
                             + ((r->b >> CHUNK_BITS) & h->link_mask)];
            n = chunk & 15;
        }
        if (n == 0) return -2;                    /* corrupt */
        if (n <= r->nb) {
            r->b >>= n; r->nb -= n;
            return (int)(chunk >> 4);
        }
    }
}

static const uint8_t fixed_lit_lengths_init[4] = {8, 9, 7, 8};

long mf_inflate_dict(const uint8_t *in, long n, uint8_t *out, long cap,
                     const uint8_t *dict, long dict_len) {
    init_tables();
    BitR r = { in, n, 0, 0, 0 };
    HDec h1 = {0}, h2 = {0};
    static HDec hfixed; static int hfixed_ready = 0;
    if (!hfixed_ready) {
        uint8_t fl[288];
        for (int i = 0; i < 288; i++)
            fl[i] = i < 144 ? 8 : i < 256 ? 9 : i < 280 ? 7 : 8;
        (void)fixed_lit_lengths_init;
        hdec_init(&hfixed, fl, 288);
        hfixed_ready = 1;
    }
    long outpos = 0;
    /* history = out buffer itself; preset dict supplies earlier history */
    long hist0 = 0;
    if (dict_len > WINDOW_SIZE) { dict += dict_len - WINDOW_SIZE; dict_len = WINDOW_SIZE; }
    int final_flag = 0;
    long err = -3;  /* corrupt */
    while (!final_flag) {
        /* EOF while reading a block header is a CLEAN end of stream:
         * the reference's more_bits propagates raw eof in next_block
         * (inflate.mbt:789-799, deliberately unlike Go's noEOF wrap),
         * so a stream truncated at a block boundary decodes to the
         * bytes emitted so far. */
        if (!br_need(&r, 3)) goto done_ok;
        final_flag = (int)(r.b & 1);
        int typ = (int)((r.b >> 1) & 3);
        r.b >>= 3; r.nb -= 3;
        if (typ == 0) {
            r.b = 0; r.nb = 0;
            if (r.pos + 4 > r.n) { err = -4; goto done; }
            int len = r.in[r.pos] | (r.in[r.pos + 1] << 8);
            int nlen = r.in[r.pos + 2] | (r.in[r.pos + 3] << 8);
            r.pos += 4;
            if ((nlen & 0xffff) != (~len & 0xffff)) goto done;
            if (r.pos + len > r.n) { err = -4; goto done; }
            if (outpos + len > cap) { err = -5; goto done; }
            memcpy(out + outpos, r.in + r.pos, (size_t)len);
            outpos += len; r.pos += len;
            continue;
        }
        const HDec *hl; const HDec *hd = NULL;
        if (typ == 1) hl = &hfixed;
        else if (typ == 2) {
            if (!br_need(&r, 14)) goto done_ok;          /* raw eof: inflate.mbt:432 */
            int nlit = (int)(r.b & 0x1f) + 257; r.b >>= 5;
            int ndist = (int)(r.b & 0x1f) + 1; r.b >>= 5;
            int nclen = (int)(r.b & 0xf) + 4; r.b >>= 4;
            r.nb -= 14;
            if (nlit > MAX_NUM_LIT || ndist > MAX_NUM_DIST) goto done;
            uint8_t codebits[NUM_CODES]; memset(codebits, 0, sizeof codebits);
            for (int i = 0; i < nclen; i++) {
                if (!br_need(&r, 3)) goto done_ok;       /* raw eof: inflate.mbt:455 */
                codebits[codegen_order[i]] = (uint8_t)(r.b & 7);
                r.b >>= 3; r.nb -= 3;
            }
            if (!hdec_init(&h1, codebits, NUM_CODES)) goto done;
            uint8_t lens[MAX_NUM_LIT + MAX_NUM_DIST];
            int i = 0, tot = nlit + ndist;
            while (i < tot) {
                int x = huff_sym(&r, &h1);
                if (x == -1) { err = -4; goto done; }
                if (x < 0) goto done;
                if (x < 16) { lens[i++] = (uint8_t)x; continue; }
                int rep, nb2, bval;
                if (x == 16) {
                    if (i == 0) goto done;
                    rep = 3; nb2 = 2; bval = lens[i - 1];
                } else if (x == 17) { rep = 3; nb2 = 3; bval = 0; }
                else { rep = 11; nb2 = 7; bval = 0; }
                if (!br_need(&r, (unsigned)nb2)) goto done_ok;  /* inflate.mbt:513 */
                rep += (int)(r.b & ((1u << nb2) - 1));
                r.b >>= nb2; r.nb -= (unsigned)nb2;
                if (i + rep > tot) goto done;
                while (rep--) lens[i++] = (uint8_t)bval;
            }
            if (!hdec_init(&h1, lens, nlit)) goto done;
            if (!hdec_init(&h2, lens + nlit, ndist)) goto done;
            if (h1.min < lens[EOB]) h1.min = lens[EOB];
            hl = &h1; hd = &h2;
        } else goto done;

        for (;;) {
            int v = huff_sym(&r, hl);
            if (v == -1) { err = -4; goto done; }
            if (v < 0) goto done;
            if (v < 256) {
                if (outpos >= cap) { err = -5; goto done; }
                out[outpos++] = (uint8_t)v;
                continue;
            }
            if (v == EOB) break;
            if (v >= MAX_NUM_LIT) goto done;
            int lc = v - 257;
            int length = length_base[lc];
            if (length_extra[lc]) {
                if (!br_need(&r, (unsigned)length_extra[lc])) goto done_ok;  /* inflate.mbt:620 */
                length += (int)(r.b & ((1u << length_extra[lc]) - 1));
                r.b >>= length_extra[lc]; r.nb -= (unsigned)length_extra[lc];
            }
            int dist;
            if (hd == NULL) {
                if (!br_need(&r, 5)) goto done_ok;       /* raw eof: inflate.mbt:634 */
                dist = rev_tab[(r.b & 0x1f) << 11] & 0xff;  /* reverse 5 bits */
                r.b >>= 5; r.nb -= 5;
            } else {
                dist = huff_sym(&r, hd);
                if (dist == -1) { err = -4; goto done; }
                if (dist < 0) goto done;
            }
            if (dist >= MAX_NUM_DIST) goto done;
            int db = offset_base[dist];
            if (offset_extra[dist]) {
                if (!br_need(&r, (unsigned)offset_extra[dist])) goto done_ok;  /* inflate.mbt:663 */
                db += (int)(r.b & ((1u << offset_extra[dist]) - 1));
                r.b >>= offset_extra[dist]; r.nb -= (unsigned)offset_extra[dist];
            }
            dist = db;
            long hist = outpos + dict_len - hist0;
            if (dist > (hist > WINDOW_SIZE ? WINDOW_SIZE : hist)) goto done;
            if (outpos + length > cap) { err = -5; goto done; }
            if (dist <= outpos) {
                long src = outpos - dist;
                for (int k = 0; k < length; k++) out[outpos + k] = out[src + k];
            } else {
                long from_dict = dist - outpos;
                long k = 0;
                for (; k < length && k < from_dict; k++)
                    out[outpos + k] = dict[dict_len - from_dict + k];
                for (; k < length; k++)
                    out[outpos + k] = out[outpos + k - dist];
            }
            outpos += length;
        }
    }
    err = outpos;
    goto done;
done_ok:
    err = outpos;
done:
    free(h1.links); free(h2.links);
    return err;
}

long mf_inflate(const uint8_t *in, long n, uint8_t *out, long cap) {
    return mf_inflate_dict(in, n, out, cap, NULL, 0);
}

/* ---------------- token scan (stage A for the TPU decode path) -------- */
/* Decode the symbol stream WITHOUT materializing output bytes; emit one
 * packed i32 per token:
 *   literal: byte value (0..255)
 *   match:   (1<<31) | ((len-3) << 15) | (dist-1)
 * The LZ77 window resolution (stage B) then runs data-parallel on the
 * TPU (inflate/tpu_inflate.py).  Returns token count, or negative error.
 * History tracking is positional only (distance validation), so this
 * scan is window-free and fast. */
long mf_scan_tokens(const uint8_t *in, long n, int32_t *toks, long cap,
                    long dict_len) {
    init_tables();
    BitR r = { in, n, 0, 0, 0 };
    HDec h1 = {0}, h2 = {0};
    static HDec hfixed2; static int hfixed2_ready = 0;
    if (!hfixed2_ready) {
        uint8_t fl[288];
        for (int i = 0; i < 288; i++)
            fl[i] = i < 144 ? 8 : i < 256 ? 9 : i < 280 ? 7 : 8;
        hdec_init(&hfixed2, fl, 288);
        hfixed2_ready = 1;
    }
    if (dict_len > WINDOW_SIZE) dict_len = WINDOW_SIZE;
    long ntok = 0;
    long outpos = 0;
    int final_flag = 0;
    long err = -3;
    while (!final_flag) {
        /* clean-EOF at block header, as in mf_inflate_dict above */
        if (!br_need(&r, 3)) goto done_ok;
        final_flag = (int)(r.b & 1);
        int typ = (int)((r.b >> 1) & 3);
        r.b >>= 3; r.nb -= 3;
        if (typ == 0) {
            r.b = 0; r.nb = 0;
            if (r.pos + 4 > r.n) { err = -4; goto done; }
            int len = r.in[r.pos] | (r.in[r.pos + 1] << 8);
            int nlen = r.in[r.pos + 2] | (r.in[r.pos + 3] << 8);
            r.pos += 4;
            if ((nlen & 0xffff) != (~len & 0xffff)) goto done;
            if (r.pos + len > r.n) { err = -4; goto done; }
            if (ntok + len > cap) { err = -5; goto done; }
            for (int k = 0; k < len; k++) toks[ntok++] = r.in[r.pos + k];
            outpos += len; r.pos += len;
            continue;
        }
        const HDec *hl; const HDec *hd = NULL;
        if (typ == 1) hl = &hfixed2;
        else if (typ == 2) {
            if (!br_need(&r, 14)) goto done_ok;          /* raw eof: inflate.mbt:432 */
            int nlit = (int)(r.b & 0x1f) + 257; r.b >>= 5;
            int ndist = (int)(r.b & 0x1f) + 1; r.b >>= 5;
            int nclen = (int)(r.b & 0xf) + 4; r.b >>= 4;
            r.nb -= 14;
            if (nlit > MAX_NUM_LIT || ndist > MAX_NUM_DIST) goto done;
            uint8_t codebits[NUM_CODES]; memset(codebits, 0, sizeof codebits);
            for (int i = 0; i < nclen; i++) {
                if (!br_need(&r, 3)) goto done_ok;       /* raw eof: inflate.mbt:455 */
                codebits[codegen_order[i]] = (uint8_t)(r.b & 7);
                r.b >>= 3; r.nb -= 3;
            }
            if (!hdec_init(&h1, codebits, NUM_CODES)) goto done;
            uint8_t lens[MAX_NUM_LIT + MAX_NUM_DIST];
            int i = 0, tot = nlit + ndist;
            while (i < tot) {
                int x = huff_sym(&r, &h1);
                if (x == -1) { err = -4; goto done; }
                if (x < 0) goto done;
                if (x < 16) { lens[i++] = (uint8_t)x; continue; }
                int rep, nb2, bval;
                if (x == 16) {
                    if (i == 0) goto done;
                    rep = 3; nb2 = 2; bval = lens[i - 1];
                } else if (x == 17) { rep = 3; nb2 = 3; bval = 0; }
                else { rep = 11; nb2 = 7; bval = 0; }
                if (!br_need(&r, (unsigned)nb2)) goto done_ok;  /* inflate.mbt:513 */
                rep += (int)(r.b & ((1u << nb2) - 1));
                r.b >>= nb2; r.nb -= (unsigned)nb2;
                if (i + rep > tot) goto done;
                while (rep--) lens[i++] = (uint8_t)bval;
            }
            if (!hdec_init(&h1, lens, nlit)) goto done;
            if (!hdec_init(&h2, lens + nlit, ndist)) goto done;
            if (h1.min < lens[EOB]) h1.min = lens[EOB];
            hl = &h1; hd = &h2;
        } else goto done;
        for (;;) {
            int v = huff_sym(&r, hl);
            if (v == -1) { err = -4; goto done; }
            if (v < 0) goto done;
            if (v < 256) {
                if (ntok >= cap) { err = -5; goto done; }
                toks[ntok++] = v;
                outpos++;
                continue;
            }
            if (v == EOB) break;
            if (v >= MAX_NUM_LIT) goto done;
            int lc = v - 257;
            int length = length_base[lc];
            if (length_extra[lc]) {
                if (!br_need(&r, (unsigned)length_extra[lc])) goto done_ok;  /* inflate.mbt:620 */
                length += (int)(r.b & ((1u << length_extra[lc]) - 1));
                r.b >>= length_extra[lc]; r.nb -= (unsigned)length_extra[lc];
            }
            int dist;
            if (hd == NULL) {
                if (!br_need(&r, 5)) goto done_ok;       /* raw eof: inflate.mbt:634 */
                dist = rev_tab[(r.b & 0x1f) << 11] & 0xff;
                r.b >>= 5; r.nb -= 5;
            } else {
                dist = huff_sym(&r, hd);
                if (dist == -1) { err = -4; goto done; }
                if (dist < 0) goto done;
            }
            if (dist >= MAX_NUM_DIST) goto done;
            int db = offset_base[dist];
            if (offset_extra[dist]) {
                if (!br_need(&r, (unsigned)offset_extra[dist])) goto done_ok;  /* inflate.mbt:663 */
                db += (int)(r.b & ((1u << offset_extra[dist]) - 1));
                r.b >>= offset_extra[dist]; r.nb -= (unsigned)offset_extra[dist];
            }
            dist = db;
            long hist = outpos + dict_len;
            if (dist > (hist > WINDOW_SIZE ? WINDOW_SIZE : hist)) goto done;
            if (ntok >= cap) { err = -5; goto done; }
            toks[ntok++] = (int32_t)(0x80000000u | ((uint32_t)(length - 3) << 15)
                                     | (uint32_t)(dist - 1));
            outpos += length;
        }
    }
    err = ntok;
    goto done;
done_ok:
    err = ntok;
done:
    free(h1.links); free(h2.links);
    return err;
}
