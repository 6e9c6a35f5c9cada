// Fast CSV column reader for DualSPHysics-style particle layouts.
//
// Native runtime component of sphexample_tpu: memory-maps the file, parses the
// (possibly quoted / space-padded) header, then extracts the requested numeric
// columns in one pass with strtod.  ~10x faster than pandas on the 400k-row
// reference inputs; exposed to Python via ctypes (sphexample_tpu/io/native.py)
// with a pandas fallback when the shared library is unavailable.
//
// Build: g++ -O3 -shared -fPIC -o libfastcsv.so fastcsv.cpp

#include <algorithm>
#include <cctype>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <fcntl.h>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#include <vector>

namespace {

struct Mapped {
  const char* data = nullptr;
  size_t size = 0;
  int fd = -1;

  bool open_file(const char* path) {
    fd = ::open(path, O_RDONLY);
    if (fd < 0) return false;
    struct stat st;
    if (fstat(fd, &st) != 0) return false;
    size = static_cast<size_t>(st.st_size);
    if (size == 0) return false;
    data = static_cast<const char*>(mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0));
    return data != MAP_FAILED;
  }

  ~Mapped() {
    if (data && data != MAP_FAILED) munmap(const_cast<char*>(data), size);
    if (fd >= 0) ::close(fd);
  }
};

// strip surrounding whitespace and quotes from a header token
std::string clean_token(const char* begin, const char* end) {
  while (begin < end && (std::isspace(static_cast<unsigned char>(*begin)) || *begin == '"'))
    ++begin;
  while (end > begin &&
         (std::isspace(static_cast<unsigned char>(end[-1])) || end[-1] == '"'))
    --end;
  return std::string(begin, end);
}

}  // namespace

extern "C" {

// Parse the header line; returns the number of columns, writing each cleaned
// name NUL-separated into `names_buf` (capacity `buf_len`).  -1 on error.
int fastcsv_header(const char* path, char* names_buf, long buf_len) {
  Mapped m;
  if (!m.open_file(path)) return -1;
  const char* p = m.data;
  const char* line_end = static_cast<const char*>(memchr(p, '\n', m.size));
  if (!line_end) line_end = m.data + m.size;

  long used = 0;
  int ncols = 0;
  const char* tok = p;
  for (const char* c = p; c <= line_end; ++c) {
    if (c == line_end || *c == ',') {
      std::string name = clean_token(tok, c);
      long need = static_cast<long>(name.size()) + 1;
      if (used + need > buf_len) return -1;
      memcpy(names_buf + used, name.c_str(), need);
      used += need;
      ++ncols;
      tok = c + 1;
    }
  }
  return ncols;
}

// Read `ncols` columns (by 0-based index into the header order) from the CSV
// into `out` (row-major [nrows, ncols]).  Returns the number of rows parsed,
// or -1 on error.  `max_rows` bounds the output buffer.
long fastcsv_read_columns(const char* path, const int* col_idx, int ncols,
                          double* out, long max_rows) {
  Mapped m;
  if (!m.open_file(path)) return -1;
  const char* p = m.data;
  const char* end = m.data + m.size;

  // skip header
  const char* nl = static_cast<const char*>(memchr(p, '\n', m.size));
  if (!nl) return 0;
  p = nl + 1;

  int max_col = 0;
  for (int k = 0; k < ncols; ++k)
    if (col_idx[k] > max_col) max_col = col_idx[k];

  std::vector<double> row(max_col + 1, 0.0);
  long nrows = 0;
  while (p < end && nrows < max_rows) {
    // skip empty lines
    if (*p == '\n' || *p == '\r') {
      ++p;
      continue;
    }
    // reset per-row: a short/malformed row must not inherit the previous
    // row's trailing column values
    std::fill(row.begin(), row.end(), 0.0);
    int col = 0;
    while (p < end && *p != '\n') {
      // strtod skips leading whitespace; quotes are not expected in numeric
      // body rows of DualSPHysics exports
      char* next = nullptr;
      double v = strtod(p, &next);
      if (col <= max_col) row[col] = (next == p) ? 0.0 : v;
      p = (next && next > p) ? next : p + 1;
      // advance to the next comma / newline
      while (p < end && *p != ',' && *p != '\n') ++p;
      if (p < end && *p == ',') ++p;
      ++col;
    }
    if (p < end) ++p;  // consume newline
    if (col == 0) continue;
    for (int k = 0; k < ncols; ++k) out[nrows * ncols + k] = row[col_idx[k]];
    ++nrows;
  }
  return nrows;
}

// Count body rows (for buffer sizing).
long fastcsv_count_rows(const char* path) {
  Mapped m;
  if (!m.open_file(path)) return -1;
  long lines = 0;
  const char* p = m.data;
  const char* end = m.data + m.size;
  while (p < end) {
    const char* nl = static_cast<const char*>(memchr(p, '\n', end - p));
    if (!nl) {
      if (end - p > 1) ++lines;  // last line without newline
      break;
    }
    if (nl > p + 0) ++lines;
    p = nl + 1;
  }
  return lines > 0 ? lines - 1 : 0;  // minus header
}

}  // extern "C"
