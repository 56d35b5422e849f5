// Native txt matrix IO for the reference's dataset / export formats.
//
// The reference reads and writes whitespace-separated float matrices
// (np.loadtxt / np.savetxt: AR.py:366-374, save_paths AR.py:323-362). The
// posterior-path exports at FHN scale are ~2.5 GB of txt; NumPy's savetxt
// formats one Python string per row and loadtxt tokenizes in Python, both of
// which take minutes at that size. These functions do the same job at
// fwrite/strtod speed, parallelized across hardware threads (row-chunked
// formatting; token-boundary-aligned chunked parsing), and are exposed
// through ctypes (viforssms_tpu/native/__init__.py) with a NumPy fallback
// when no compiler is available.
//
// Build: g++ -O3 -shared -fPIC -pthread -o libfastio.so fastio.cpp

#include <cctype>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

long num_threads(long work_items) {
  const char *env = std::getenv("VIFORSSMS_FASTIO_THREADS");
  long t = env ? std::atol(env) : (long)std::thread::hardware_concurrency();
  if (t < 1) t = 1;
  if (t > 64) t = 64;
  if (t > work_items) t = work_items > 0 ? work_items : 1;
  return t;
}

inline bool is_space(char c) {
  return std::isspace(static_cast<unsigned char>(c)) != 0;
}

// Advance a nominal chunk boundary to the next token start so no token is
// split across chunks: skip the tail of any token in progress, then the
// whitespace run after it. buf[len] is addressable (NUL guard from caller).
long align_boundary(const char *buf, long len, long pos) {
  while (pos < len && !is_space(buf[pos])) ++pos;
  while (pos < len && is_space(buf[pos])) ++pos;
  return pos;
}

}  // namespace

extern "C" {

// Write an (rows x cols) double matrix as '%.<prec>e' space-separated text,
// one row per line (np.savetxt default format when prec=18). Rows are
// formatted in parallel chunks; output bytes are written in order.
// Returns 0 on success, negative codes on failure.
int fastio_write_matrix(const char *path, const double *data, long rows,
                        long cols, int prec) {
  if (prec <= 0) prec = 18;
  FILE *f = std::fopen(path, "wb");
  if (!f) return -1;
  const long T = num_threads(rows);
  char fmt[16];
  std::snprintf(fmt, sizeof fmt, "%%.%de", prec);
  std::vector<std::string> parts(T);
  std::vector<std::thread> threads;
  const long per = (rows + T - 1) / T;
  for (long t = 0; t < T; ++t) {
    threads.emplace_back([&, t]() {
      const long r0 = t * per;
      const long r1 = (t + 1) * per < rows ? (t + 1) * per : rows;
      if (r0 >= r1) return;
      std::string &s = parts[t];
      s.reserve((size_t)(r1 - r0) * (size_t)cols * (prec + 14));
      char tok[64];
      for (long r = r0; r < r1; ++r) {
        for (long c = 0; c < cols; ++c) {
          int n = std::snprintf(tok, sizeof tok, fmt, data[r * cols + c]);
          s.append(tok, (size_t)n);
          s.push_back(c + 1 == cols ? '\n' : ' ');
        }
      }
    });
  }
  for (auto &th : threads) th.join();
  int rc = 0;
  for (const auto &s : parts) {
    if (!s.empty() && std::fwrite(s.data(), 1, s.size(), f) != s.size()) {
      rc = -3;
      break;
    }
  }
  if (std::fclose(f) != 0) rc = rc ? rc : -4;
  return rc;
}

// Count whitespace-separated tokens and newline-terminated non-empty rows.
// Used to size the output of fastio_parse_doubles exactly. Single pass,
// parallel over byte ranges (token/row counts are boundary-aligned so chunks
// never split a token; a row is counted at its terminating newline, plus one
// for a final unterminated row).
void fastio_count_tokens(const char *buf, long len, long *n_tokens,
                         long *n_rows) {
  const long T = num_threads(len / (1 << 16) + 1);
  std::vector<long> toks(T, 0), rows(T, 0);
  std::vector<long> bounds(T + 1);
  bounds[0] = 0;
  bounds[T] = len;
  for (long t = 1; t < T; ++t)
    bounds[t] = align_boundary(buf, len, t * (len / T));
  std::vector<std::thread> threads;
  for (long t = 0; t < T; ++t) {
    threads.emplace_back([&, t]() {
      bool in_tok = false;
      long tok = 0, nl = 0;
      for (long i = bounds[t]; i < bounds[t + 1]; ++i) {
        char ch = buf[i];
        if (is_space(ch)) {
          in_tok = false;
          if (ch == '\n') ++nl;
        } else if (!in_tok) {
          ++tok;
          in_tok = true;
        }
      }
      toks[t] = tok;
      rows[t] = nl;
    });
  }
  for (auto &th : threads) th.join();
  long tok = 0, nl = 0;
  for (long t = 0; t < T; ++t) {
    tok += toks[t];
    nl += rows[t];
  }
  // a trailing row without '\n' still counts; blank-line-only tails don't
  long i = len - 1;
  while (i >= 0 && is_space(buf[i]) && buf[i] != '\n') --i;
  if (i >= 0 && buf[i] != '\n') ++nl;
  *n_tokens = tok;
  *n_rows = nl;
}

// Parse up to max_out whitespace-separated doubles from buf in parallel
// (chunk boundaries aligned to token starts; per-chunk counts are prefix-
// summed so every thread writes its exact output slice). buf[len] must be
// addressable (the Python wrapper appends one NUL). Returns the number
// parsed, or a negative value on a malformed token.
long fastio_parse_doubles(const char *buf, long len, double *out,
                          long max_out) {
  const long T = num_threads(len / (1 << 16) + 1);
  std::vector<long> bounds(T + 1);
  bounds[0] = 0;
  bounds[T] = len;
  for (long t = 1; t < T; ++t)
    bounds[t] = align_boundary(buf, len, t * (len / T));
  // phase 1: count per chunk
  std::vector<long> counts(T, 0);
  {
    std::vector<std::thread> threads;
    for (long t = 0; t < T; ++t) {
      threads.emplace_back([&, t]() {
        bool in_tok = false;
        long n = 0;
        for (long i = bounds[t]; i < bounds[t + 1]; ++i) {
          if (is_space(buf[i])) {
            in_tok = false;
          } else if (!in_tok) {
            ++n;
            in_tok = true;
          }
        }
        counts[t] = n;
      });
    }
    for (auto &th : threads) th.join();
  }
  std::vector<long> offset(T + 1, 0);
  for (long t = 0; t < T; ++t) offset[t + 1] = offset[t] + counts[t];
  if (offset[T] > max_out) return -1;
  // phase 2: parse each chunk into its slice
  std::vector<long> errs(T, 0);
  {
    std::vector<std::thread> threads;
    for (long t = 0; t < T; ++t) {
      threads.emplace_back([&, t]() {
        const char *p = buf + bounds[t];
        const char *end = buf + bounds[t + 1];
        long n = offset[t];
        const long stop = offset[t + 1];
        while (p < end && n < stop) {
          while (p < end && is_space(*p)) ++p;
          if (p >= end) break;
          char *next = nullptr;
          double v = std::strtod(p, &next);
          if (next == p) {
            errs[t] = n + 1;
            return;
          }
          out[n++] = v;
          p = next;
        }
        if (n != stop) errs[t] = n + 1;  // strtod consumed across a boundary
      });
    }
    for (auto &th : threads) th.join();
  }
  for (long t = 0; t < T; ++t)
    if (errs[t]) return -errs[t];
  return offset[T];
}

}  // extern "C"
