// Native FASTA parse + encode: the host-side hot path.
//
// Role parity: the reference leans on needletail (Rust) for FASTA parsing
// and kmerutils' Alphabet2b for 2-bit encoding (reference call sites:
// src/dna/dnafiles.rs:52,70-72; src/aa/aafiles.rs:11-28).  This is the
// C++ equivalent feeding the TPU ingest pipeline: one pass over the
// (already decompressed) byte buffer, emitting uint8 symbol codes
// (DNA 0..3 / AA 0..19, 255 = invalid) with single-separator joins
// between records, "capsid" records skipped (dnafiles.rs:67), and
// min-size filtering (parameters.rs:26-29).
//
// Exposed via a C ABI for ctypes (no pybind11 in this image).
//
// Build: ./native/build.sh  (g++ -O3 -march=native -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <cstddef>

namespace {

constexpr uint8_t INVALID = 255;

struct Tables {
    uint8_t dna[256];
    uint8_t aa[256];
    Tables() {
        std::memset(dna, INVALID, sizeof(dna));
        std::memset(aa, INVALID, sizeof(aa));
        const char* d = "ACGT";
        for (int i = 0; i < 4; ++i) {
            dna[(uint8_t)d[i]] = (uint8_t)i;
            dna[(uint8_t)(d[i] + 32)] = (uint8_t)i;  // lowercase
        }
        dna[(uint8_t)'U'] = 3; dna[(uint8_t)'u'] = 3;
        const char* a = "ACDEFGHIKLMNPQRSTVWY";
        for (int i = 0; i < 20; ++i) {
            aa[(uint8_t)a[i]] = (uint8_t)i;
            aa[(uint8_t)(a[i] + 32)] = (uint8_t)i;
        }
    }
};
const Tables kTables;

inline bool header_has_capsid(const uint8_t* h, size_t n) {
    static const char kw[] = "capsid";
    if (n < 6) return false;
    for (size_t i = 0; i + 6 <= n; ++i) {
        if (std::memcmp(h + i, kw, 6) == 0) return true;
    }
    return false;
}

}  // namespace

extern "C" {

// Parse a FASTA buffer into one concatenated code array ("one block" mode,
// reference: process_file_in_one_block, dnafiles.rs:200-276).
//
//   data/len      : decompressed FASTA bytes
//   out           : caller buffer of capacity out_cap (>= len is always enough)
//   is_aa         : 0 = DNA (2-bit alphabet), 1 = AA (20 residues)
//   min_seq_size  : records shorter than this are dropped
//   out_len       : number of codes written (separators included)
//   first_id      : first kept record's id token (NUL-terminated, id_cap bytes)
//   total_bases   : residues encoded, separators excluded
//
// Returns number of kept records, or -1 if out_cap is too small.
long fasta_concat_codes(const uint8_t* data, size_t len,
                        uint8_t* out, size_t out_cap,
                        int is_aa, long min_seq_size,
                        size_t* out_len, char* first_id, size_t id_cap,
                        size_t* total_bases) {
    const uint8_t* table = is_aa ? kTables.aa : kTables.dna;
    size_t w = 0;          // write cursor
    size_t total = 0;
    long kept = 0;
    bool first_done = false;
    size_t i = 0;
    // skip pre-header junk
    while (i < len && data[i] != '>') ++i;
    while (i < len) {
        // at '>': parse header line
        ++i;
        size_t hstart = i;
        while (i < len && data[i] != '\n') ++i;
        size_t hend = i;  // header = [hstart, hend)
        if (i < len) ++i; // skip newline
        bool skip = header_has_capsid(data + hstart, hend - hstart);
        // sequence span: until next '>' at line start or EOF
        size_t rec_start = w + (kept > 0 ? 1 : 0);  // leave room for separator
        size_t seq_len = 0;
        size_t scan = i;
        // first pass to count; second to write (branch-light single pass
        // instead: write optimistically, roll back if dropped)
        size_t wr = rec_start;
        while (scan < len && data[scan] != '>') {
            uint8_t c = data[scan++];
            if (c == '\n' || c == '\r') continue;
            if (wr >= out_cap) return -1;
            out[wr++] = table[c];
            ++seq_len;
        }
        i = scan;
        if (!skip && (long)seq_len >= min_seq_size && seq_len > 0) {
            if (kept > 0) {
                out[w] = INVALID;  // record separator = hard k-mer break
            }
            w = wr;
            total += seq_len;
            ++kept;
            if (!first_done) {
                size_t idn = 0;
                while (hstart + idn < hend && idn + 1 < id_cap) {
                    uint8_t c = data[hstart + idn];
                    if (c == ' ' || c == '\t') break;
                    first_id[idn++] = (char)c;
                }
                first_id[idn] = '\0';
                first_done = true;
            }
        }
        // else: dropped — w unchanged, the optimistic writes are ignored
    }
    *out_len = w;
    *total_bases = total;
    return kept;
}

// Per-record mode (reference: process_file_by_sequence, dnafiles.rs:43-107):
// writes codes back-to-back and fills record offset/length tables.
// Returns kept record count, or -1 on capacity overflow.
long fasta_records_codes(const uint8_t* data, size_t len,
                         uint8_t* out, size_t out_cap,
                         int is_aa, long min_seq_size,
                         size_t* offsets, size_t* lengths, long max_records,
                         char* ids, size_t id_stride, /* ids: max_records * id_stride */
                         size_t* out_len) {
    const uint8_t* table = is_aa ? kTables.aa : kTables.dna;
    size_t w = 0;
    long kept = 0;
    size_t i = 0;
    while (i < len && data[i] != '>') ++i;
    while (i < len) {
        ++i;
        size_t hstart = i;
        while (i < len && data[i] != '\n') ++i;
        size_t hend = i;
        if (i < len) ++i;
        bool skip = header_has_capsid(data + hstart, hend - hstart);
        size_t start = w;
        size_t wr = w;
        size_t seq_len = 0;
        size_t scan = i;
        while (scan < len && data[scan] != '>') {
            uint8_t c = data[scan++];
            if (c == '\n' || c == '\r') continue;
            if (wr >= out_cap) return -1;
            out[wr++] = table[c];
            ++seq_len;
        }
        i = scan;
        if (!skip && (long)seq_len >= min_seq_size && seq_len > 0 && kept < max_records) {
            offsets[kept] = start;
            lengths[kept] = seq_len;
            char* idp = ids + kept * id_stride;
            size_t idn = 0;
            while (hstart + idn < hend && idn + 1 < id_stride) {
                uint8_t c = data[hstart + idn];
                if (c == ' ' || c == '\t') break;
                idp[idn++] = (char)c;
            }
            idp[idn] = '\0';
            w = wr;
            ++kept;
        }
    }
    *out_len = w;
    return kept;
}

}  // extern "C"

// 2-bit pack a batch of u8 code rows (0..3 valid, >=4 invalid) into the
// sketcher's "exception form": packed bytes (4 codes/byte) + per-row
// invalid-position lists.  This runs at memory speed where the numpy
// equivalent costs several passes of strided slicing (~5 Mbases/s on one
// core) — packing on the host only pays off at all because of this
// function (models/base.py UPLOAD_MODE).
//
// arr:  b x nb u8 codes (row-major); lens: b row lengths
// p2:   out, b x nb/4 bytes
// inv:  out, b x max_exc int32, MUST be prefilled with nb by the caller
// Returns 0, or -1 if some row has more than max_exc invalid positions
// inside its length (caller falls back to the bit-plane form).
extern "C"
long pack2bit_exc(const uint8_t* arr, size_t b, size_t nb,
                  uint8_t* p2, const int32_t* lens,
                  int32_t* inv, long max_exc) {
    const size_t nb4 = nb / 4;
    for (size_t i = 0; i < b; ++i) {
        const uint8_t* row = arr + i * nb;
        uint8_t* out = p2 + i * nb4;
        int32_t* ex = inv + (size_t)i * (size_t)max_exc;
        long nexc = 0;
        const size_t len = (size_t)lens[i];
        for (size_t j = 0; j < nb4; ++j) {
            const uint8_t c0 = row[4 * j], c1 = row[4 * j + 1];
            const uint8_t c2 = row[4 * j + 2], c3 = row[4 * j + 3];
            out[j] = (uint8_t)((c0 & 3) | ((c1 & 3) << 2) |
                               ((c2 & 3) << 4) | ((c3 & 3) << 6));
            // invalid positions are rare; branch only on a combined test
            if ((c0 | c1 | c2 | c3) >= 4) {
                for (size_t t = 4 * j; t < 4 * j + 4; ++t) {
                    if (row[t] >= 4 && t < len) {
                        if (nexc >= max_exc) return -1;
                        ex[nexc++] = (int32_t)t;
                    }
                }
            }
        }
    }
    return 0;
}

// Fused parse + 2-bit pack ("one block" mode): parse a FASTA buffer
// directly into the sketcher's exception upload form — packed 2-bit codes
// (4/byte) + the positions of invalid codes (record separators, Ns).
// Skips the intermediate 1 B/base code array entirely: the unfused path
// touches every base ~4x (parse-write, python assembly copy, pack-read,
// pack-write); this touches it twice (scratch write + pack read), which
// is what the 1-core ingest host is bound on.
//
//   out_p2      : capacity >= (len/4 + 1) bytes
//   inv/max_exc : invalid-code positions (NOT prefilled; first *out_ninv
//                 entries are valid on return)
//   out_codes   : total codes in the row, separators included
//
// Returns kept records; -1 = p2 capacity too small; -2 = more than
// max_exc invalid positions (caller falls back to the unfused path).
extern "C"
long fasta_concat_pack2(const uint8_t* data, size_t len,
                        uint8_t* out_p2, size_t out_p2_cap,
                        int32_t* inv, long max_exc,
                        long min_seq_size,
                        size_t* out_codes, char* first_id, size_t id_cap,
                        size_t* total_bases, long* out_ninv) {
    const uint8_t* table = kTables.dna;
    // per-record scratch: parse codes here, commit (pack-append) on keep
    static thread_local uint8_t* scratch = nullptr;
    static thread_local size_t scratch_cap = 0;
    if (scratch_cap < len + 1) {
        delete[] scratch;
        scratch = new uint8_t[len + 1];
        scratch_cap = len + 1;
    }
    size_t pos = 0;       // committed codes (row position)
    size_t total = 0;
    long kept = 0, ninv = 0;
    bool first_done = false;
    uint8_t pending = 0;  // partial byte of out_p2[pos/4]
    size_t i = 0;
    while (i < len && data[i] != '>') ++i;
    while (i < len) {
        ++i;
        size_t hstart = i;
        while (i < len && data[i] != '\n') ++i;
        size_t hend = i;
        if (i < len) ++i;
        bool skip = header_has_capsid(data + hstart, hend - hstart);
        size_t seq_len = 0;
        size_t scan = i;
        while (scan < len && data[scan] != '>') {
            uint8_t c = data[scan++];
            if (c == '\n' || c == '\r') continue;
            scratch[seq_len++] = table[c];
        }
        i = scan;
        if (skip || (long)seq_len < min_seq_size || seq_len == 0) continue;
        if (!first_done) {
            size_t idn = 0;
            while (hstart + idn < hend && idn + 1 < id_cap) {
                uint8_t c = data[hstart + idn];
                if (c == ' ' || c == '\t') break;
                first_id[idn++] = (char)c;
            }
            first_id[idn] = '\0';
            first_done = true;
        }
        if (kept > 0) {
            // separator: one INVALID code (hard k-mer break)
            if (ninv >= max_exc) return -2;
            inv[ninv++] = (int32_t)pos;
            size_t sh = (pos & 3) * 2;
            if (sh == 0) pending = 0;
            ++pos;
            if ((pos & 3) == 0) out_p2[(pos >> 2) - 1] = pending;
        }
        if ((pos + seq_len) / 4 + 1 > out_p2_cap) return -1;
        // pack-append the record: byte loop only to byte-align pos, then
        // a branch-light 4-wide pass (same shape as pack2bit_exc)
        size_t j = 0;
        while (j < seq_len && (pos & 3)) {
            uint8_t c = scratch[j++];
            if (c >= 4) {
                if (ninv >= max_exc) return -2;
                inv[ninv++] = (int32_t)pos;
                c = 0;
            }
            pending |= (uint8_t)(c << ((pos & 3) * 2));
            ++pos;
            if ((pos & 3) == 0) out_p2[(pos >> 2) - 1] = pending;
        }
        size_t ngroups = (seq_len - j) / 4;
        uint8_t* outp = out_p2 + (pos >> 2);
        for (size_t g = 0; g < ngroups; ++g) {
            uint8_t c0 = scratch[j], c1 = scratch[j + 1];
            uint8_t c2 = scratch[j + 2], c3 = scratch[j + 3];
            if ((c0 | c1 | c2 | c3) >= 4) {  // rare: Ns
                for (int t = 0; t < 4; ++t) {
                    if (scratch[j + t] >= 4) {
                        if (ninv >= max_exc) return -2;
                        inv[ninv++] = (int32_t)(pos + t);
                        scratch[j + t] = 0;
                    }
                }
                c0 = scratch[j]; c1 = scratch[j + 1];
                c2 = scratch[j + 2]; c3 = scratch[j + 3];
            }
            outp[g] = (uint8_t)((c0 & 3) | ((c1 & 3) << 2) |
                                ((c2 & 3) << 4) | ((c3 & 3) << 6));
            j += 4;
            pos += 4;
        }
        while (j < seq_len) {
            uint8_t c = scratch[j++];
            if (c >= 4) {
                if (ninv >= max_exc) return -2;
                inv[ninv++] = (int32_t)pos;
                c = 0;
            }
            size_t sh = (pos & 3) * 2;
            if (sh == 0) pending = c;
            else pending |= (uint8_t)(c << sh);
            ++pos;
            if ((pos & 3) == 0) out_p2[(pos >> 2) - 1] = pending;
        }
        total += seq_len;
        ++kept;
    }
    if (pos & 3) out_p2[pos >> 2] = pending;  // flush partial byte
    *out_codes = pos;
    *total_bases = total;
    *out_ninv = ninv;
    return kept;
}
