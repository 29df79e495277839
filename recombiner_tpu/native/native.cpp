// Native host-side kernels for RECOMBINER-TPU.
//
// The reference ships no native code (SURVEY §2.3); this library accelerates
// the framework's own host-side hot paths, with bit-identical Python
// fallbacks (tested in tests/test_native.py):
//
//   - rctb_crc32:        zlib-compatible CRC32 for bitstream integrity
//   - pack_indices_u16:  bulk int32 -> uint16 index packing with range check
//   - parse_pdb_ca:      C-alpha backbone extraction from PDB text
//   - gumbel_chain:      truncated-Gumbel chain (MT19937, numpy-compatible)
//
// Plain C ABI, loaded via ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <cstdlib>

extern "C" {

// ----------------------------------------------------------------- crc32
static uint32_t crc_table[256];
static bool crc_init_done = false;

static void crc_init() {
    for (uint32_t n = 0; n < 256; n++) {
        uint32_t c = n;
        for (int k = 0; k < 8; k++)
            c = (c & 1) ? 0xedb88320u ^ (c >> 1) : c >> 1;
        crc_table[n] = c;
    }
    crc_init_done = true;
}

uint32_t rctb_crc32(const uint8_t* buf, uint64_t len, uint32_t crc) {
    if (!crc_init_done) crc_init();
    crc = crc ^ 0xffffffffu;
    for (uint64_t i = 0; i < len; i++)
        crc = crc_table[(crc ^ buf[i]) & 0xff] ^ (crc >> 8);
    return crc ^ 0xffffffffu;
}

// ---------------------------------------------------- index pack / unpack
// Returns 0 on success, 1 if any index is out of [0, 2^bits).
int pack_indices_u16(const int32_t* idx, uint64_t n, int bits, uint16_t* out) {
    const int32_t limit = (int32_t)1 << bits;
    for (uint64_t i = 0; i < n; i++) {
        int32_t v = idx[i];
        if (v < 0 || v >= limit) return 1;
        out[i] = (uint16_t)v;
    }
    return 0;
}

void unpack_indices_u16(const uint16_t* in, uint64_t n, int32_t* out) {
    for (uint64_t i = 0; i < n; i++) out[i] = (int32_t)in[i];
}

// ----------------------------------------------------------- PDB parsing
// Extract up to max_len C-alpha coordinates from a PDB text buffer.
// Matches the Python parser (data/protein.py): whitespace-tokenized lines,
// token[0]=="ATOM", token[2]=="CA", coords from tokens 6..8. Returns the
// total CA count seen (caller checks >= max_len); fills out[max_len*3].
int64_t parse_pdb_ca(const char* text, uint64_t len, int64_t max_len, float* out) {
    int64_t count = 0;
    uint64_t pos = 0;
    while (pos < len) {
        uint64_t eol = pos;
        while (eol < len && text[eol] != '\n') eol++;
        // tokenize line [pos, eol)
        const char* tk[16];
        uint64_t tklen[16];
        int nt = 0;
        uint64_t i = pos;
        while (i < eol && nt < 16) {
            while (i < eol && (text[i] == ' ' || text[i] == '\t' || text[i] == '\r')) i++;
            if (i >= eol) break;
            uint64_t s = i;
            while (i < eol && text[i] != ' ' && text[i] != '\t' && text[i] != '\r') i++;
            tk[nt] = text + s;
            tklen[nt] = i - s;
            nt++;
        }
        if (nt > 8 && tklen[0] == 4 && memcmp(tk[0], "ATOM", 4) == 0 &&
            tklen[2] == 2 && memcmp(tk[2], "CA", 2) == 0) {
            if (count < max_len) {
                for (int c = 0; c < 3; c++) {
                    char tmp[64];
                    uint64_t l = tklen[6 + c] < 63 ? tklen[6 + c] : 63;
                    memcpy(tmp, tk[6 + c], l);
                    tmp[l] = 0;
                    char* end = nullptr;
                    double v = strtod(tmp, &end);
                    if (end == tmp) return -1;  // malformed float -> python fallback
                    out[count * 3 + c] = (float)v;
                }
            }
            count++;
        }
        pos = eol + 1;
    }
    return count;
}

// ------------------------------------------------- numpy-compatible RNG
// MT19937 with numpy RandomState seeding and random_sample() double output,
// used to reproduce the Gumbel chain spec exactly.
struct MT {
    uint32_t mt[624];
    int mti;
};

static void mt_seed(MT* st, uint32_t s) {
    st->mt[0] = s;
    for (int i = 1; i < 624; i++)
        st->mt[i] = 1812433253u * (st->mt[i - 1] ^ (st->mt[i - 1] >> 30)) + (uint32_t)i;
    st->mti = 624;
}

static uint32_t mt_next(MT* st) {
    if (st->mti >= 624) {
        for (int i = 0; i < 624; i++) {
            uint32_t y = (st->mt[i] & 0x80000000u) | (st->mt[(i + 1) % 624] & 0x7fffffffu);
            st->mt[i] = st->mt[(i + 397) % 624] ^ (y >> 1);
            if (y & 1) st->mt[i] ^= 0x9908b0dfu;
        }
        st->mti = 0;
    }
    uint32_t y = st->mt[st->mti++];
    y ^= y >> 11;
    y ^= (y << 7) & 0x9d2c5680u;
    y ^= (y << 15) & 0xefc60000u;
    y ^= y >> 18;
    return y;
}

static double mt_double(MT* st) {
    uint32_t a = mt_next(st) >> 5, b = mt_next(st) >> 6;
    return (a * 67108864.0 + b) / 9007199254740992.0;
}

// numpy's random_interval: uniform integer on [0, max] by masked rejection
// sampling on 32-bit draws (max here always < 2^32).
static uint32_t mt_interval(MT* st, uint32_t max) {
    if (max == 0) return 0;
    uint32_t mask = max;
    mask |= mask >> 1; mask |= mask >> 2; mask |= mask >> 4;
    mask |= mask >> 8; mask |= mask >> 16;
    uint32_t value;
    while ((value = (mt_next(st) & mask)) > max) {}
    return value;
}

// Cross-patch budget-mixing permutations (format spec, test_model.py:182-208):
// column c's patch order is RandomState(c).choice(n_rows, n_rows, False),
// which numpy implements as permutation(n) = Fisher-Yates with
// random_interval draws. Fills perm (n_rows x n_cols, row-major) with the
// order and inv with its inverse (inv[order[r], c] = r).
void patch_permutations(int64_t n_rows, int64_t n_cols, int32_t* perm, int32_t* inv) {
    int32_t* tmp = (int32_t*)malloc(sizeof(int32_t) * (size_t)n_rows);
    for (int64_t c = 0; c < n_cols; c++) {
        MT st;
        mt_seed(&st, (uint32_t)c);
        for (int64_t i = 0; i < n_rows; i++) tmp[i] = (int32_t)i;
        for (int64_t i = n_rows - 1; i > 0; i--) {
            uint32_t j = mt_interval(&st, (uint32_t)i);
            int32_t t = tmp[i]; tmp[i] = tmp[j]; tmp[j] = t;
        }
        for (int64_t r = 0; r < n_rows; r++) {
            perm[r * n_cols + c] = tmp[r];
            inv[(int64_t)tmp[r] * n_cols + c] = (int32_t)r;
        }
    }
    free(tmp);
}

// b_i = -log(cumsum(-log U_i)) with U from RandomState(seed).rand
void gumbel_chain(uint32_t seed, int64_t n, double* out) {
    MT st;
    mt_seed(&st, seed);
    double acc = 0.0;
    for (int64_t i = 0; i < n; i++) {
        acc += -log(mt_double(&st));
        out[i] = -log(acc);
    }
}

}  // extern "C"
