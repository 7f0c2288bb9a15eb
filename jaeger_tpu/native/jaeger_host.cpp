// jaeger-tpu native host library.
//
// C++ equivalents of the host-side hot paths the reference delegates to
// compiled dependencies (SURVEY §2.5): FASTA/gzip streaming (pyfastx),
// SDUST low-complexity masking (pydustmasker), ASCII->base-ID encoding +
// window composition (numba kernels in dataops/convert.py), and
// affine-gap Smith-Waterman with traceback (parasail sw_trace_scan_16).
// Exposed through a plain C ABI consumed via ctypes
// (jaeger_tpu/native/__init__.py). Behaviour is pinned against the pure
// Python oracles by tests/test_native.py.

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <string>
#include <vector>

#include <zlib.h>

extern "C" {

// ---------------------------------------------------------------------------
// FASTA reader (plain + gzip via zlib; gzread handles both)
// ---------------------------------------------------------------------------

struct JtFastaReader {
    gzFile fh = nullptr;
    std::string pending;   // next header line (without '>')
    std::string header;
    std::string seq;
    char buf[1 << 16];
};

void* jt_open_fasta(const char* path) {
    gzFile fh = gzopen(path, "rb");
    if (!fh) return nullptr;
    auto* r = new JtFastaReader();
    r->fh = fh;
    return r;
}

static bool jt_getline(JtFastaReader* r, std::string& line) {
    line.clear();
    while (true) {
        if (gzgets(r->fh, r->buf, sizeof(r->buf)) == nullptr)
            return !line.empty();
        line += r->buf;
        if (!line.empty() && line.back() == '\n') {
            line.pop_back();
            if (!line.empty() && line.back() == '\r') line.pop_back();
            return true;
        }
    }
}

// Returns sequence length, or -1 at EOF. header/seq pointers stay valid
// until the next call.
long jt_next_contig(void* handle, const char** header, const char** seq) {
    auto* r = static_cast<JtFastaReader*>(handle);
    std::string line;
    if (r->pending.empty()) {
        // scan forward to the first header
        while (jt_getline(r, line)) {
            if (!line.empty() && line[0] == '>') {
                r->pending = line.substr(1);
                break;
            }
        }
        if (r->pending.empty()) return -1;
    }
    r->header = r->pending;
    // strip leading/trailing whitespace from header
    size_t a = r->header.find_first_not_of(" \t");
    size_t b = r->header.find_last_not_of(" \t");
    r->header = (a == std::string::npos)
        ? std::string()
        : r->header.substr(a, b - a + 1);
    r->pending.clear();
    r->seq.clear();
    while (jt_getline(r, line)) {
        if (!line.empty() && line[0] == '>') {
            r->pending = line.substr(1);
            break;
        }
        r->seq += line;
    }
    *header = r->header.c_str();
    *seq = r->seq.c_str();
    return static_cast<long>(r->seq.size());
}

void jt_close_fasta(void* handle) {
    auto* r = static_cast<JtFastaReader*>(handle);
    if (r->fh) gzclose(r->fh);
    delete r;
}

// ---------------------------------------------------------------------------
// ASCII -> base-ID encoding + composition
// (IDs: A=0 T=1 G=2 C=3 N/other=4, a=5 t=6 g=7 c=8 — see seqops/windows.py)
// ---------------------------------------------------------------------------

static uint8_t ASCII_LUT[256];
static bool LUT_INIT = [] {
    memset(ASCII_LUT, 4, sizeof(ASCII_LUT));
    ASCII_LUT[(unsigned char)'A'] = 0; ASCII_LUT[(unsigned char)'T'] = 1;
    ASCII_LUT[(unsigned char)'G'] = 2; ASCII_LUT[(unsigned char)'C'] = 3;
    ASCII_LUT[(unsigned char)'a'] = 5; ASCII_LUT[(unsigned char)'t'] = 6;
    ASCII_LUT[(unsigned char)'g'] = 7; ASCII_LUT[(unsigned char)'c'] = 8;
    return true;
}();

void jt_encode_ascii(const char* seq, long len, unsigned char* out) {
    for (long i = 0; i < len; ++i)
        out[i] = ASCII_LUT[(unsigned char)seq[i]];
}

// counts[0..3] = G, C, A, T over base IDs (upper+lower folded)
void jt_composition(const unsigned char* ids, long len, long* counts) {
    long g = 0, c = 0, a = 0, t = 0;
    for (long i = 0; i < len; ++i) {
        switch (ids[i] >= 5 ? ids[i] - 5 : ids[i]) {
            case 0: ++a; break;
            case 1: ++t; break;
            case 2: ++g; break;
            case 3: ++c; break;
            default: break;
        }
    }
    counts[0] = g; counts[1] = c; counts[2] = a; counts[3] = t;
}

// ---------------------------------------------------------------------------
// SDUST (same algorithm as jaeger_tpu/seqops/dust.py)
// ---------------------------------------------------------------------------

struct PerfIntv { long start_t, finish_b; long num, den; };

static void sdust_run(const uint8_t* codes, long n, int W, int T,
                      long run_offset, std::vector<long>& out) {
    if (n < 3) return;
    std::vector<std::pair<long, long>> res;  // merged base intervals
    std::vector<PerfIntv> P;                 // sorted by start descending
    // triplet window as a flat ring: wbuf[(whead + k) & wmask] is w[k]
    long wcap = 4;
    while (wcap < (long)W) wcap <<= 1;  // power of 2 >= W-2
    const long wmask = wcap - 1;
    std::vector<int> wbuf(wcap);
    long wn = 0, whead = 0;
    int cw[64] = {0}, cv[64] = {0};
    long L = 0, rv = 0, rw = 0;

    auto emit = [&](long s, long f) {
        if (!res.empty() && s <= res.back().second + 1) {
            if (f > res.back().second) res.back().second = f;
        } else {
            res.emplace_back(s, f);
        }
    };
    auto wat = [&](long k) { return wbuf[(whead + k) & wmask]; };

    long num_tri = n - 2;
    std::vector<int> cbuf(64);
    std::vector<PerfIntv> fresh;
    for (long i = 0; i < num_tri; ++i) {
        long start = i - (W - 2) + 1;
        if (start < 0) start = 0;
        while (!P.empty() && P.back().start_t < start) {
            emit(P.back().start_t, P.back().finish_b);
            P.pop_back();
        }

        int t = (codes[i] << 4) | (codes[i + 1] << 2) | codes[i + 2];

        if (wn >= W - 2) {
            int s = wbuf[whead];
            whead = (whead + 1) & wmask;
            --wn;
            cw[s] -= 1;
            rw -= cw[s];
            if (L > wn) {
                --L;
                cv[s] -= 1;
                rv -= cv[s];
            }
        }
        wbuf[(whead + wn) & wmask] = t;
        ++wn;
        ++L;
        rw += cw[t]; cw[t] += 1;
        rv += cv[t]; cv[t] += 1;
        if (cv[t] * 10 > 2 * T) {
            while (true) {
                int s = wat(wn - L);
                cv[s] -= 1;
                rv -= cv[s];
                --L;
                if (s == t) break;
            }
        }

        // Gate the perfect-interval scan on the whole-window score
        // (sdust's classic pruning): every candidate suffix scanned
        // below has new_len >= L and score r <= rw (its triplet counts
        // are dominated by the whole window's), so r*10 > T*new_len
        // implies rw*10 > T*L — when the gate is false the scan can
        // emit nothing and is skipped. On non-repetitive DNA the gate
        // almost never fires, which removes the per-triplet
        // 64-int copy + O(W) backward scan (measured 35 -> ~500 MB/s).
        if (rw * 10 <= (long)T * L) continue;

        // find perfect intervals ending at the current position
        memcpy(cbuf.data(), cv, sizeof(cv));
        long r = rv;
        long w_len = wn;
        long w_start = i + 1 - w_len;
        long max_num = 0, max_den = 1;
        fresh.clear();
        for (long idx = w_len - L - 1; idx >= 0; --idx) {
            int tt = wat(idx);
            r += cbuf[tt];
            cbuf[tt] += 1;
            long new_len = w_len - idx - 1;
            if (r * 10 > (long)T * new_len) {
                long new_start = idx + w_start;
                for (auto& p : P) {
                    if (p.start_t < new_start) break;
                    if (max_num * p.den < p.num * max_den) {
                        max_num = p.num; max_den = p.den;
                    }
                }
                for (auto& p : fresh) {
                    if (max_num * p.den < p.num * max_den) {
                        max_num = p.num; max_den = p.den;
                    }
                }
                if (r * max_den >= max_num * new_len)
                    fresh.push_back({new_start, i + 2, r, new_len});
            }
        }
        // sort fresh by start descending, then insert keeping P ordered
        for (size_t a2 = 0; a2 < fresh.size(); ++a2)
            for (size_t b2 = a2 + 1; b2 < fresh.size(); ++b2)
                if (fresh[b2].start_t > fresh[a2].start_t)
                    std::swap(fresh[a2], fresh[b2]);
        for (auto& e : fresh) {
            size_t j = 0;
            while (j < P.size() && P[j].start_t >= e.start_t) ++j;
            P.insert(P.begin() + j, e);
        }
    }
    while (!P.empty()) {
        emit(P.back().start_t, P.back().finish_b);
        P.pop_back();
    }
    for (auto& [s, f] : res) {
        out.push_back(run_offset + s);
        out.push_back(run_offset + f + 1);  // half-open end
    }
}

// All (start, end) half-open pairs for a sequence, uncapped.
static void sdust_all(const char* seq, long len, int window, int threshold,
                      std::vector<long>& intervals) {
    static int8_t BCODE[256];
    static bool binit = [] {
        memset(BCODE, -1, sizeof(BCODE));
        BCODE[(unsigned char)'A'] = 0; BCODE[(unsigned char)'a'] = 0;
        BCODE[(unsigned char)'C'] = 1; BCODE[(unsigned char)'c'] = 1;
        BCODE[(unsigned char)'G'] = 2; BCODE[(unsigned char)'g'] = 2;
        BCODE[(unsigned char)'T'] = 3; BCODE[(unsigned char)'t'] = 3;
        return true;
    }();
    (void)binit;

    std::vector<uint8_t> codes;
    long run_start = -1;
    for (long pos = 0; pos <= len; ++pos) {
        int code = pos < len ? BCODE[(unsigned char)seq[pos]] : -1;
        if (code < 0) {
            if (run_start >= 0) {
                sdust_run(codes.data(), (long)codes.size(), window,
                          threshold, run_start, intervals);
                codes.clear();
                run_start = -1;
            }
        } else {
            if (run_start < 0) run_start = pos;
            codes.push_back((uint8_t)code);
        }
    }
}

// Fills out with (start, end) half-open pairs; returns the TOTAL interval
// count (may exceed cap; only cap pairs are written — callers retry with
// a bigger buffer when the return value is > cap).
long jt_sdust(const char* seq, long len, int window, int threshold,
              long* out, long cap) {
    std::vector<long> intervals;
    sdust_all(seq, len, window, threshold, intervals);
    long n_pairs = (long)intervals.size() / 2;
    long n_copy = n_pairs > cap ? cap : n_pairs;
    memcpy(out, intervals.data(), n_copy * 2 * sizeof(long));
    return n_pairs;
}

// Soft-mask in place: lowercase masked ranges (uncapped — parity with the
// pure-Python dust_mask fallback). Returns interval count.
long jt_dust_mask(char* seq, long len, int window, int threshold) {
    std::vector<long> iv;
    sdust_all(seq, len, window, threshold, iv);
    long n = (long)iv.size() / 2;
    for (long i = 0; i < n; ++i) {
        for (long p = iv[2 * i]; p < iv[2 * i + 1]; ++p) {
            char c = seq[p];
            if (c >= 'A' && c <= 'Z') seq[p] = c + 32;
        }
    }
    return n;
}

// Uppercase + SDUST soft-mask + base-ID encode in ONE pass over the contig.
// Replaces the hot-path round trip str->bytes->sdust->str->bytes->LUT that
// `seqops.windows._contig_rows` paid per contig (dust soft-masking encoded
// directly as lowercase IDs 5-8). Returns the dust-interval count.
long jt_contig_ids(const char* seq, long len, int do_dust, int window,
                   int threshold, unsigned char* out) {
    std::vector<char> up(len);
    for (long i = 0; i < len; ++i) {
        char c = seq[i];
        up[i] = (c >= 'a' && c <= 'z') ? (char)(c - 32) : c;
    }
    for (long i = 0; i < len; ++i)
        out[i] = ASCII_LUT[(unsigned char)up[i]];
    if (!do_dust) return 0;
    std::vector<long> iv;
    sdust_all(up.data(), len, window, threshold, iv);
    long n = (long)iv.size() / 2;
    for (long i = 0; i < n; ++i)
        for (long p = iv[2 * i]; p < iv[2 * i + 1]; ++p)
            if (out[p] < 4) out[p] = (unsigned char)(out[p] + 5);
    return n;
}

// Per-window composition over UPPERCASE base IDs only (soft-masked bases
// excluded, matching the reference's case-sensitive counts). out is
// (n_windows, 4) int64 laid out A, T, G, C.
void jt_window_counts(const unsigned char* ids, const long* starts,
                      long n_windows, long width, long* out) {
    for (long w = 0; w < n_windows; ++w) {
        long a = 0, t = 0, g = 0, c = 0;
        const unsigned char* p = ids + starts[w];
        // branchless equality sums vectorize (byte compares + psadbw
        // reductions under -march=native); the switch version ran at
        // 143 MB/s, this at several GB/s
        for (long k = 0; k < width; ++k) {
            unsigned char v = p[k];
            a += (v == 0); t += (v == 1);
            g += (v == 2); c += (v == 3);
        }
        out[w * 4] = a; out[w * 4 + 1] = t;
        out[w * 4 + 2] = g; out[w * 4 + 3] = c;
    }
}

// ---------------------------------------------------------------------------
// Affine-gap Smith-Waterman with traceback (parasail-convention scoring)
// ---------------------------------------------------------------------------

long jt_smith_waterman(const char* q, long qn, const char* r, long rn,
                       int open_, int extend, int match, int mismatch,
                       long* end_q, long* end_r,
                       char* q_out, char* r_out, long cap) {
    if (qn == 0 || rn == 0) { *end_q = -1; *end_r = -1; q_out[0] = 0; r_out[0] = 0; return 0; }
    const int NEG = -1000000;
    auto sub = [&](long i, long j) -> int {
        char a = q[i] & ~0x20;   // uppercase
        char b = r[j] & ~0x20;
        bool an = (a=='A'||a=='C'||a=='G'||a=='T');
        bool bn = (b=='A'||b=='C'||b=='G'||b=='T');
        return (an && bn && a == b) ? match : mismatch;
    };

    std::vector<int> H((qn + 1) * (rn + 1), 0);
    std::vector<int> E((qn + 1) * (rn + 1), NEG);
    std::vector<int> F((qn + 1) * (rn + 1), NEG);
    auto idx = [&](long i, long j) { return i * (rn + 1) + j; };

    int best = 0; long bi = 0, bj = 0;
    for (long i = 1; i <= qn; ++i) {
        int e = NEG;
        for (long j = 1; j <= rn; ++j) {
            int f = std::max(H[idx(i-1,j)] - open_, F[idx(i-1,j)] - extend);
            F[idx(i,j)] = f;
            e = std::max(H[idx(i,j-1)] - open_, e - extend);
            E[idx(i,j)] = e;
            int h = H[idx(i-1,j-1)] + sub(i-1, j-1);
            if (e > h) h = e;
            if (f > h) h = f;
            if (h < 0) h = 0;
            H[idx(i,j)] = h;
            if (h > best) { best = h; bi = i; bj = j; }
        }
    }
    if (best == 0) { *end_q = -1; *end_r = -1; q_out[0] = 0; r_out[0] = 0; return 0; }

    // traceback
    std::string qa, ra;
    long i = bi, j = bj;
    char state = 'H';
    while (i > 0 && j > 0) {
        if (state == 'H') {
            int h = H[idx(i,j)];
            if (h == 0) break;
            if (h == H[idx(i-1,j-1)] + sub(i-1, j-1)) {
                qa += q[i-1]; ra += r[j-1]; --i; --j;
            } else if (h == E[idx(i,j)]) state = 'E';
            else if (h == F[idx(i,j)]) state = 'F';
            else break;
        } else if (state == 'E') {
            qa += '-'; ra += r[j-1];
            if (E[idx(i,j)] == H[idx(i,j-1)] - open_) state = 'H';
            --j;
        } else {
            qa += q[i-1]; ra += '-';
            if (F[idx(i,j)] == H[idx(i-1,j)] - open_) state = 'H';
            --i;
        }
    }
    long alen = (long)qa.size();
    if (alen >= cap) alen = cap - 1;
    std::string qr(qa.rbegin(), qa.rend()), rr(ra.rbegin(), ra.rend());
    memcpy(q_out, qr.data(), alen);
    memcpy(r_out, rr.data(), alen);
    q_out[alen] = 0; r_out[alen] = 0;
    *end_q = bi - 1;
    *end_r = bj - 1;
    return best;
}

}  // extern "C"
