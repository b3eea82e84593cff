/* Goxel text-format parser: the native data loader.
 *
 * Parses "X Y Z RRGGBB" voxel lines (reference data.py:271-289 format;
 * '#'-comment and malformed lines skipped exactly like the reference's
 * isdigit() guards). The Python loop costs ~2-3 s on the 209k-line castle
 * model; this parser does it in milliseconds. Bound via ctypes
 * (python_raytracer_tpu/native/__init__.py), compiled on first use with the
 * system compiler, with a pure-Python fallback when no compiler exists.
 *
 * Colors are returned as the raw 8-byte token (case-preserving, padded with
 * NUL) so the Python side can reproduce the reference's exact string-keyed
 * material lookup.
 */

#include <stdint.h>
#include <string.h>

static inline int is_digit(char c) { return c >= '0' && c <= '9'; }

/* Parse one unsigned integer token; returns chars consumed or 0 if the
 * token is not all-digits (the reference's params[n].isdigit() check). */
static long parse_uint(const char *p, const char *end, int32_t *out) {
    long n = 0;
    int64_t v = 0;
    while (p + n < end && p[n] != ' ' && p[n] != '\n' && p[n] != '\r') {
        if (!is_digit(p[n]) || v > 0x7fffffff) return 0;
        v = v * 10 + (p[n] - '0');
        n++;
    }
    if (n == 0) return 0;
    *out = (int32_t)v;
    return n;
}

/* Returns the number of voxels parsed (<= cap). */
long parse_goxel(const char *buf, long len, int32_t *xs, int32_t *ys,
                 int32_t *zs, uint64_t *cols, long cap) {
    const char *p = buf;
    const char *end = buf + len;
    long count = 0;

    while (p < end && count < cap) {
        /* token 1..3: integers separated by single spaces */
        int32_t x, y, z;
        long n;
        const char *line = p;
        /* find end of line first */
        const char *eol = memchr(p, '\n', (size_t)(end - p));
        if (!eol) eol = end;

        n = parse_uint(line, eol, &x);
        if (n == 0 || line + n >= eol || line[n] != ' ') { p = eol + 1; continue; }
        line += n + 1;
        n = parse_uint(line, eol, &y);
        if (n == 0 || line + n >= eol || line[n] != ' ') { p = eol + 1; continue; }
        line += n + 1;
        n = parse_uint(line, eol, &z);
        if (n == 0 || line + n >= eol || line[n] != ' ') { p = eol + 1; continue; }
        line += n + 1;

        /* token 4: color string (up to 8 chars, case preserved) */
        long clen = 0;
        uint64_t col = 0;
        while (line + clen < eol && line[clen] != ' ' && line[clen] != '\r') {
            if (clen < 8) col |= ((uint64_t)(unsigned char)line[clen]) << (8 * clen);
            clen++;
        }
        if (clen == 0 || clen > 8) { p = eol + 1; continue; }

        xs[count] = x;
        ys[count] = y;
        zs[count] = z;
        cols[count] = col;
        count++;
        p = eol + 1;
    }
    return count;
}
