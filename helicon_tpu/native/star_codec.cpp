// Native STAR loop-table codec (reader tokenizer/typer + row formatter).
//
// The reference reads STAR via the `starfile` package and pandas
// (lib/io.py:549+); the hot ETL paths there are pure Python. Here the
// per-token work — the only part Python cannot vectorize — is done in
// C++ and exposed through a tiny ctypes ABI (no pybind11 in this
// toolchain). The Python wrapper (helicon_tpu/native/__init__.py)
// compiles this file on demand with g++ and falls back to the pure
// Python implementation in io/star.py when unavailable.
//
// Input contract (enforced by the caller): `buf` holds data rows
// separated by '\n' with tokens separated by spaces/tabs and no quoting
// (the caller routes quoted tables to the Python tokenizer). Blank
// lines and full-line '#' comments are skipped here, matching the
// Python reader's line filter.

#include <charconv>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <limits>

namespace {

inline bool is_sep(char c) { return c == ' ' || c == '\t' || c == '\r'; }

// Locale-independent full-token double parse (strtod/snprintf honor
// LC_NUMERIC; a host app calling setlocale() must not change STAR
// semantics). Returns true iff the whole token parses; matches pandas
// to_numeric: leading '+' allowed, overflow -> +-inf.
inline bool parse_double(const char* s, int32_t len, double& out) {
    if (len <= 0) return false;
    const char* p = s;
    if (*p == '+') { ++p; --len; if (len <= 0) return false; }
    auto r = std::from_chars(p, p + len, out);
    if (r.ptr != p + len) return false;
    if (r.ec == std::errc::result_out_of_range) {
        out = (*p == '-') ? -std::numeric_limits<double>::infinity()
                          : std::numeric_limits<double>::infinity();
        return true;
    }
    return r.ec == std::errc();
}

// Walk one row starting at `p` (end `e`). Calls `tok(start, len, idx)`
// for every token. Full-line '#' comments yield zero tokens (like the
// Python reader's line filter). Returns pointer past the row's '\n'.
template <typename F>
const char* walk_row(const char* p, const char* e, int64_t& ntok, F&& tok) {
    ntok = 0;
    while (p < e && is_sep(*p)) ++p;
    if (p < e && *p == '#') {  // comment line: consume without tokens
        while (p < e && *p != '\n') ++p;
        if (p < e) ++p;
        return p;
    }
    while (p < e && *p != '\n') {
        while (p < e && is_sep(*p)) ++p;
        if (p >= e || *p == '\n') break;
        const char* s = p;
        while (p < e && !is_sep(*p) && *p != '\n') ++p;
        tok(s, static_cast<int32_t>(p - s), ntok);
        ++ntok;
    }
    if (p < e && *p == '\n') ++p;
    return p;
}

inline bool token_is_numeric(const char* s, int32_t len) {
    double v;
    // match pandas to_numeric + notna(): a full parse that yields NaN
    // (token "nan") leaves the column non-numeric in the Python path
    return parse_double(s, len, v) && !std::isnan(v);
}

}  // namespace

extern "C" {

// Pass 1: count rows, validate token counts, and type each column.
// col_is_num[c] (out, len ncols) = 1 iff EVERY row's token parses fully
// as a non-NaN double. Returns nrows, or -(row_index + 1) when a row's
// token count differs from ncols (0-based row index of the bad row).
int64_t star_scan(const char* buf, int64_t len, int32_t ncols,
                  int8_t* col_is_num) {
    for (int32_t c = 0; c < ncols; ++c) col_is_num[c] = 1;
    const char* p = buf;
    const char* e = buf + len;
    int64_t nrows = 0;
    while (p < e) {
        int64_t ntok = 0;
        p = walk_row(p, e, ntok, [&](const char* s, int32_t l, int64_t i) {
            if (i < ncols && col_is_num[i] && !token_is_numeric(s, l))
                col_is_num[i] = 0;
        });
        if (ntok == 0) continue;  // trailing blank line
        if (ntok != ncols) return -(nrows + 1);
        ++nrows;
    }
    return nrows;
}

// Pass 2: extract values. Numeric columns (col_is_num[c] == 1, in
// declaration order) land column-major in num_out[slot * nrows + row];
// string columns record byte offsets into `buf` in
// str_start/str_len[slot * nrows + row]. Returns nrows (never fails on
// input that passed star_scan).
int64_t star_parse(const char* buf, int64_t len, int32_t ncols,
                   const int8_t* col_is_num, int64_t nrows,
                   double* num_out, int64_t* str_start, int32_t* str_len) {
    // per-column output slot
    int32_t* slot = static_cast<int32_t*>(std::malloc(sizeof(int32_t) * ncols));
    int32_t num_slots = 0, str_slots = 0;
    for (int32_t c = 0; c < ncols; ++c)
        slot[c] = col_is_num[c] ? num_slots++ : str_slots++;

    const char* p = buf;
    const char* e = buf + len;
    int64_t row = 0;
    while (p < e && row < nrows) {
        int64_t ntok = 0;
        const char* row_p = p;
        p = walk_row(p, e, ntok, [&](const char* s, int32_t l, int64_t i) {
            if (i >= ncols) return;
            if (col_is_num[i]) {
                double v = 0.0;
                parse_double(s, l, v);
                num_out[static_cast<int64_t>(slot[i]) * nrows + row] = v;
            } else {
                int64_t k = static_cast<int64_t>(slot[i]) * nrows + row;
                str_start[k] = s - buf;
                str_len[k] = l;
            }
        });
        if (ntok == 0) { (void)row_p; continue; }
        ++row;
    }
    std::free(slot);
    return row;
}

// Copy one string column's tokens into a contiguous buffer with Arrow
// string layout offsets (offsets[0] = 0, offsets[i+1] = end of token i).
// `out` must hold sum(lens) bytes; offsets must hold n + 1 int32s.
// Returns bytes written.
int64_t star_gather_strings(const char* buf, const int64_t* starts,
                            const int32_t* lens, int64_t n, char* out,
                            int32_t* offsets) {
    int64_t pos = 0;
    offsets[0] = 0;
    for (int64_t i = 0; i < n; ++i) {
        std::memcpy(out + pos, buf + starts[i], lens[i]);
        pos += lens[i];
        offsets[i + 1] = static_cast<int32_t>(pos);
    }
    return pos;
}

// Row formatter: writes nrows lines into `out`, tokens joined by a
// single space, '\n' after each row. kind[c]: 0 = double (printf %.6f),
// 1 = int64 (%lld), 2 = string slice from strbuf. Column data is
// column-major: dcols/icols indexed [slot * nrows + row] with
// independent slot counters per kind, matching the Python wrapper.
// Returns bytes written, or -1 if `cap` would overflow.
int64_t star_format(int64_t nrows, int32_t ncols, const int8_t* kind,
                    const double* dcols, const int64_t* icols,
                    const char* strbuf, const int64_t* s_start,
                    const int32_t* s_len, char* out, int64_t cap) {
    int32_t* slot = static_cast<int32_t*>(std::malloc(sizeof(int32_t) * ncols));
    int32_t nd = 0, ni = 0, ns = 0;
    for (int32_t c = 0; c < ncols; ++c)
        slot[c] = kind[c] == 0 ? nd++ : (kind[c] == 1 ? ni++ : ns++);

    char* o = out;
    char* oe = out + cap;
    for (int64_t r = 0; r < nrows; ++r) {
        for (int32_t c = 0; c < ncols; ++c) {
            if (c && o < oe) *o++ = ' ';
            int64_t k = static_cast<int64_t>(slot[c]) * nrows + r;
            if (kind[c] == 0) {
                if (oe - o < 32) { std::free(slot); return -1; }
                double v = dcols[k];
                if (std::isnan(v)) {  // to_chars may emit "-nan"
                    std::memcpy(o, "nan", 3);
                    o += 3;
                } else {
                    // locale-independent "%.6f" (Python "{:.6f}" match)
                    auto res = std::to_chars(o, o + 32, v,
                                             std::chars_format::fixed, 6);
                    if (res.ec != std::errc()) { std::free(slot); return -1; }
                    o = res.ptr;
                }
            } else if (kind[c] == 1) {
                if (oe - o < 24) { std::free(slot); return -1; }
                o += std::snprintf(o, 24, "%lld",
                                   static_cast<long long>(icols[k]));
            } else {
                int32_t l = s_len[k];
                if (oe - o < l + 1) { std::free(slot); return -1; }
                std::memcpy(o, strbuf + s_start[k], l);
                o += l;
            }
        }
        if (o >= oe) { std::free(slot); return -1; }
        *o++ = '\n';
    }
    std::free(slot);
    return o - out;
}

}  // extern "C"
