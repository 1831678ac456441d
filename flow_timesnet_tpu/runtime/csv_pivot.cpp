// Native long->wide CSV pivot: parse a long-format (date, id, target) CSV
// and dictionary-encode it straight into a dense [T, N] grid in one pass.
//
// This is the host-side data-loading hot path for very large long frames
// (reference analogue: pandas read_csv + DataFrame.pivot in
// /root/reference/src/timesnet_forecast/utils/io.py:494-570). The Python
// wrapper (`flow_timesnet_tpu/data/pivot.py::read_long_pivot`) treats this
// as an optimisation only: ANY unsupported input (non-UTF-8 encodings,
// non-ISO dates, malformed floats, short records) makes the parser return a
// negative status and the caller falls back to the pandas path, which is
// the semantic source of truth.
//
// Semantics mirrored from the pandas path exactly:
//   * RFC-4180 quoting ("" escapes, embedded commas/newlines), CRLF, BOM
//   * dates: strict YYYY-MM-DD (lexicographic == chronological)
//   * ids: Python str.split()-style whitespace runs collapsed to "_"
//     (including unicode whitespace), then byte-wise sort — UTF-8 byte
//     order equals code-point order, matching Python's sorted()
//   * duplicate (date, id) pairs -> CP_E_DUPLICATE (caller re-raises via
//     the pandas path so the error message matches bit-for-bit)
//   * empty target field -> NaN with the cell marked present (pandas:
//     read_csv yields NaN, pivot marks the pair filled)
//
// ABI: handle-based two-phase (parse -> query dims -> fill caller buffers)
// because T, N and the id-string byte length are unknown before the parse.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

constexpr int64_t CP_E_IO = -1;        // cannot read the file
constexpr int64_t CP_E_SYNTAX = -2;    // record length mismatch / stray quote
constexpr int64_t CP_E_DATE = -3;      // non-ISO date -> pandas fallback
constexpr int64_t CP_E_FLOAT = -4;     // unparsable target value
constexpr int64_t CP_E_DUPLICATE = -5; // same (date, id) twice
constexpr int64_t CP_E_IDFORM = -6;    // id would be dtype-inferred by pandas

struct Parsed {
  std::vector<int64_t> days;        // [T] unique days since epoch, ascending
  std::vector<std::string> ids;     // [N] normalised ids, byte-sorted
  std::vector<double> values;       // [T * N] row-major f64, NaN = absent/NaN
  std::vector<uint8_t> filled;      // [T * N] cell present in the long frame
};

// ---------------------------------------------------------------- utf-8 ids

// Python str.split() whitespace (what the pandas path's normalize_id uses).
inline bool is_py_space(uint32_t cp) {
  switch (cp) {
    case 0x09: case 0x0A: case 0x0B: case 0x0C: case 0x0D: case 0x20:
    case 0x1C: case 0x1D: case 0x1E: case 0x1F: case 0x85: case 0xA0:
    case 0x1680: case 0x2028: case 0x2029: case 0x202F: case 0x205F:
    case 0x3000:
      return true;
    default:
      return cp >= 0x2000 && cp <= 0x200A;
  }
}

// Decode one UTF-8 code point; returns its byte length (0 = invalid).
inline int utf8_decode(const char* s, const char* end, uint32_t* cp) {
  const unsigned char c = static_cast<unsigned char>(*s);
  if (c < 0x80) { *cp = c; return 1; }
  int n;
  uint32_t v;
  if ((c >> 5) == 0x6) { n = 2; v = c & 0x1F; }
  else if ((c >> 4) == 0xE) { n = 3; v = c & 0x0F; }
  else if ((c >> 3) == 0x1E) { n = 4; v = c & 0x07; }
  else return 0;
  if (s + n > end) return 0;
  for (int i = 1; i < n; ++i) {
    const unsigned char cc = static_cast<unsigned char>(s[i]);
    if ((cc >> 6) != 0x2) return 0;
    v = (v << 6) | (cc & 0x3F);
  }
  *cp = v;
  return n;
}

// normalize_id: collapse whitespace runs to single underscores, trim ends.
std::string normalize_id(const char* s, size_t len) {
  std::string out;
  out.reserve(len);
  const char* p = s;
  const char* end = s + len;
  bool pending_sep = false;
  while (p < end) {
    uint32_t cp;
    int n = utf8_decode(p, end, &cp);
    if (n == 0) { // invalid utf-8: keep the raw byte (matches bytes in == out)
      cp = 0xFFFFFFFFu;
      n = 1;
    }
    if (cp != 0xFFFFFFFFu && is_py_space(cp)) {
      if (!out.empty()) pending_sep = true; // leading ws trims itself
    } else {
      if (pending_sep) { out.push_back('_'); pending_sep = false; }
      out.append(p, n);
    }
    p += n;
  }
  return out; // trailing pending_sep dropped == rstrip
}

// ------------------------------------------------------------------- dates

// Strict YYYY-MM-DD -> days since 1970-01-01 (Howard Hinnant days_from_civil).
bool parse_iso_date(const char* s, size_t len, int64_t* out) {
  // tolerate surrounding ASCII spaces like pandas' parser does
  while (len && (*s == ' ' || *s == '\t')) { ++s; --len; }
  while (len && (s[len - 1] == ' ' || s[len - 1] == '\t')) --len;
  if (len != 10 || s[4] != '-' || s[7] != '-') return false;
  for (int i : {0, 1, 2, 3, 5, 6, 8, 9})
    if (s[i] < '0' || s[i] > '9') return false;
  int y = (s[0] - '0') * 1000 + (s[1] - '0') * 100 + (s[2] - '0') * 10 + (s[3] - '0');
  unsigned m = (s[5] - '0') * 10 + (s[6] - '0');
  unsigned d = (s[8] - '0') * 10 + (s[9] - '0');
  if (m < 1 || m > 12 || d < 1 || d > 31) return false;
  y -= m <= 2;
  const int era = (y >= 0 ? y : y - 399) / 400;
  const unsigned yoe = static_cast<unsigned>(y - era * 400);
  const unsigned doy = (153 * (m + (m > 2 ? -3 : 9)) + 2) / 5 + d - 1;
  const unsigned doe = yoe * 365 + yoe / 4 - yoe / 100 + doy;
  *out = era * 146097LL + static_cast<int64_t>(doe) - 719468LL;
  return true;
}

// ------------------------------------------------------------------ floats

bool parse_target(const char* s, size_t len, double* out) {
  while (len && (*s == ' ' || *s == '\t')) { ++s; --len; }
  while (len && (s[len - 1] == ' ' || s[len - 1] == '\t')) --len;
  if (len == 0) { *out = NAN; return true; } // empty cell -> NaN, present
  // fast path: plain (signed) integers — the dominant case for demand counts
  // (<= 15 digits fits a double exactly, like the pandas float64 path)
  {
    const char* p = s;
    size_t n = len;
    bool neg = false;
    if (*p == '-' || *p == '+') { neg = (*p == '-'); ++p; --n; }
    if (n && n <= 15) {
      int64_t v = 0;
      size_t i = 0;
      for (; i < n; ++i) {
        const char c = p[i];
        if (c < '0' || c > '9') break;
        v = v * 10 + (c - '0');
      }
      if (i == n) {
        *out = static_cast<double>(neg ? -v : v);
        return true;
      }
    }
  }
  for (size_t i = 0; i < len; ++i)
    if (s[i] == 'x' || s[i] == 'X') return false; // strtod hex != pandas
  std::string tmp(s, len); // strtod needs NUL termination
  char* endp = nullptr;
  const double v = std::strtod(tmp.c_str(), &endp);
  if (endp != tmp.c_str() + tmp.size()) return false;
  *out = v;
  return true;
}

// pandas' read_csv dtype-infers the id column BEFORE our normalize_id sees
// it: a fully numeric column round-trips through int64/float64 ('007' ->
// '7', '1.50' -> '1.5') and default NA tokens become NaN regardless of
// dtype. Any id whose raw bytes would be touched by that machinery makes
// the two paths diverge, so the fast path declines (pandas stays the
// semantic oracle). Declining too eagerly only costs a fallback.
bool id_diverges_under_pandas(const char* s, size_t len) {
  static const char* kNaTokens[] = {
      "", "#N/A", "#N/A N/A", "#NA", "-1.#IND", "-1.#QNAN", "-NaN", "-nan",
      "1.#IND", "1.#QNAN", "<NA>", "N/A", "NA", "NULL", "NaN", "None",
      "n/a", "nan", "null",
  };
  const std::string raw(s, len);
  for (const char* tok : kNaTokens)
    if (raw == tok) return true;
  // numeric check on the whitespace-trimmed bytes (the C tokenizer
  // tolerates surrounding blanks when converting)
  const char* b = s;
  size_t n = len;
  while (n && (*b == ' ' || *b == '\t')) { ++b; --n; }
  while (n && (b[n - 1] == ' ' || b[n - 1] == '\t')) --n;
  if (n == 0) return true;
  for (size_t i = 0; i < n; ++i)
    if (b[i] == 'x' || b[i] == 'X') return false; // hex stays object dtype
  std::string tmp(b, n);
  char* endp = nullptr;
  (void)std::strtod(tmp.c_str(), &endp);
  return endp == tmp.c_str() + tmp.size();
}

// --------------------------------------------------------------- tokenizer

// RFC-4180 state machine over the whole buffer. Calls on_field for every
// field and on_record at record ends. Handles quoted fields with embedded
// separators/newlines and "" escapes; a quote opening mid-field is treated
// as a literal (pandas does the same for `ab"cd`).
template <typename FieldFn, typename RecordFn>
int64_t tokenize(const char* p, const char* end, FieldFn&& on_field,
                 RecordFn&& on_record) {
  std::string field;      // scratch for quoted/escaped fields
  bool field_dirty = false; // field content went through `field`
  const char* fstart = p;
  bool any = false;
  while (p < end) {
    if (*p == '"' && fstart == p && !field_dirty) {
      // quoted field
      ++p;
      field.clear();
      field_dirty = true;
      while (p < end) {
        if (*p == '"') {
          if (p + 1 < end && p[1] == '"') { field.push_back('"'); p += 2; }
          else { ++p; break; }
        } else {
          field.push_back(*p++);
        }
      }
      fstart = p; // whatever trails the closing quote is appended literally
      any = true;
      continue;
    }
    const char c = *p;
    if (c == ',' || c == '\n' || c == '\r') {
      if (field_dirty) {
        field.append(fstart, p - fstart);
        if (!on_field(field.data(), field.size())) return CP_E_FLOAT;
        field_dirty = false;
      } else {
        if (!on_field(fstart, static_cast<size_t>(p - fstart))) return CP_E_FLOAT;
      }
      any = true;
      if (c != ',') {
        if (c == '\r' && p + 1 < end && p[1] == '\n') ++p;
        int64_t rc = on_record();
        if (rc < 0) return rc;
        any = false;
      }
      ++p;
      fstart = p;
      continue;
    }
    ++p;
  }
  // final record without trailing newline
  if (any || fstart < end || field_dirty) {
    if (field_dirty) {
      field.append(fstart, end - fstart);
      if (!on_field(field.data(), field.size())) return CP_E_FLOAT;
    } else if (fstart < end) {
      if (!on_field(fstart, static_cast<size_t>(end - fstart))) return CP_E_FLOAT;
    } else if (any) {
      if (!on_field(fstart, 0)) return CP_E_FLOAT;
    }
    if (any || fstart < end) {
      int64_t rc = on_record();
      if (rc < 0) return rc;
    }
  }
  return 0;
}

// ------------------------------------------------------------------- parse

Parsed* parse_file(const char* path, int64_t date_idx, int64_t id_idx,
                   int64_t target_idx, int64_t* status) {
  *status = 0;
  FILE* f = std::fopen(path, "rb");
  if (!f) { *status = CP_E_IO; return nullptr; }
  std::fseek(f, 0, SEEK_END);
  const long fsize = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::string buf;
  buf.resize(static_cast<size_t>(fsize));
  if (fsize > 0 && std::fread(buf.data(), 1, buf.size(), f) != buf.size()) {
    std::fclose(f);
    *status = CP_E_IO;
    return nullptr;
  }
  std::fclose(f);

  const char* p = buf.data();
  const char* end = p + buf.size();
  if (buf.size() >= 3 && static_cast<unsigned char>(p[0]) == 0xEF &&
      static_cast<unsigned char>(p[1]) == 0xBB &&
      static_cast<unsigned char>(p[2]) == 0xBF)
    p += 3; // UTF-8 BOM

  const int64_t needed = std::max(date_idx, std::max(id_idx, target_idx)) + 1;

  // per-row staging
  struct Row { int64_t day; int32_t id; double value; };
  std::vector<Row> rows;
  rows.reserve(1 << 16);
  std::unordered_map<std::string, int32_t> id_map;
  // raw (pre-normalisation) id bytes -> code: ids repeat ~T-fold in long
  // frames, so this skips the UTF-8 normalisation walk on every repeat
  std::unordered_map<std::string, int32_t> raw_id_map;
  std::unordered_map<int64_t, int32_t> day_map;
  std::vector<std::string> id_list;
  std::vector<int64_t> day_list;

  int64_t field_i = 0;
  int64_t header_n = -1;
  bool in_header = true;
  // Raw fields are staged per record and parsed at record end so blank
  // lines (which pandas skips) never reach the date/float parsers.
  std::string f_date, f_id, f_tgt;
  bool f_blank = true;

  auto on_field = [&](const char* s, size_t len) -> bool {
    const int64_t i = field_i++;
    if (in_header) return true;
    if (len) f_blank = false;
    if (i == date_idx) f_date.assign(s, len);
    if (i == id_idx) f_id.assign(s, len);
    if (i == target_idx) f_tgt.assign(s, len);
    return true;
  };
  auto on_record = [&]() -> int64_t {
    const int64_t n = field_i;
    field_i = 0;
    if (in_header) {
      in_header = false;
      header_n = n;
      return 0;
    }
    const bool blank = f_blank;
    f_blank = true;
    if (n == 1 && blank) return 0; // blank line (pandas: skip_blank_lines)
    if (n < needed) return CP_E_SYNTAX;
    // pandas rejects (ParserError) or index-shifts records wider than the
    // header — either way the fast path must not silently accept them
    if (n > header_n) return CP_E_SYNTAX;
    Row cur{0, -1, 0.0};
    if (!parse_iso_date(f_date.data(), f_date.size(), &cur.day))
      return CP_E_DATE;
    if (!parse_target(f_tgt.data(), f_tgt.size(), &cur.value))
      return CP_E_FLOAT;
    auto rit = raw_id_map.find(f_id);
    if (rit != raw_id_map.end()) {
      cur.id = rit->second;
    } else {
      if (id_diverges_under_pandas(f_id.data(), f_id.size()))
        return CP_E_IDFORM;
      std::string norm = normalize_id(f_id.data(), f_id.size());
      auto idit = id_map.find(norm);
      if (idit == id_map.end()) {
        idit = id_map.emplace(std::move(norm),
                              static_cast<int32_t>(id_list.size())).first;
        id_list.push_back(idit->first);
      }
      cur.id = idit->second;
      raw_id_map.emplace(f_id, cur.id);
    }
    auto it = day_map.find(cur.day);
    if (it == day_map.end()) {
      day_map.emplace(cur.day, static_cast<int32_t>(day_list.size()));
      day_list.push_back(cur.day);
    }
    rows.push_back(cur);
    return 0;
  };

  int64_t rc = tokenize(p, end, on_field, on_record);
  if (rc < 0) {
    *status = rc;
    return nullptr;
  }

  // sort days ascending, ids byte-wise; build old->new code maps
  auto* out = new Parsed();
  const size_t T = day_list.size(), N = id_list.size();
  {
    std::vector<int32_t> day_order(T), id_order(N);
    for (size_t i = 0; i < T; ++i) day_order[i] = static_cast<int32_t>(i);
    for (size_t i = 0; i < N; ++i) id_order[i] = static_cast<int32_t>(i);
    std::sort(day_order.begin(), day_order.end(),
              [&](int32_t a, int32_t b) { return day_list[a] < day_list[b]; });
    std::sort(id_order.begin(), id_order.end(),
              [&](int32_t a, int32_t b) { return id_list[a] < id_list[b]; });
    std::vector<int32_t> day_rank(T), id_rank(N);
    out->days.resize(T);
    out->ids.resize(N);
    for (size_t i = 0; i < T; ++i) {
      day_rank[day_order[i]] = static_cast<int32_t>(i);
      out->days[i] = day_list[day_order[i]];
    }
    for (size_t i = 0; i < N; ++i) {
      id_rank[id_order[i]] = static_cast<int32_t>(i);
      out->ids[i] = std::move(id_list[id_order[i]]);
    }
    // day value -> rank for the scatter
    for (auto& kv : day_map) kv.second = day_rank[kv.second];
    out->values.assign(T * N, NAN);
    out->filled.assign(T * N, 0);
    for (const Row& r : rows) {
      const size_t idx = static_cast<size_t>(day_map[r.day]) * N +
                         static_cast<size_t>(id_rank[r.id]);
      if (out->filled[idx]) {
        delete out;
        *status = CP_E_DUPLICATE;
        return nullptr;
      }
      out->filled[idx] = 1;
      out->values[idx] = r.value;
    }
  }
  return out;
}

}  // namespace

extern "C" {

int csv_pivot_abi_version() { return 2; }

// Parse; returns an opaque handle (>0) or a negative CP_E_* status.
int64_t csv_pivot_parse(const char* path, int64_t date_idx, int64_t id_idx,
                        int64_t target_idx) {
  int64_t status = 0;
  Parsed* p = parse_file(path, date_idx, id_idx, target_idx, &status);
  if (!p) return status;
  return reinterpret_cast<int64_t>(p);
}

void csv_pivot_dims(int64_t handle, int64_t* T, int64_t* N, int64_t* id_bytes) {
  const Parsed* p = reinterpret_cast<const Parsed*>(handle);
  *T = static_cast<int64_t>(p->days.size());
  *N = static_cast<int64_t>(p->ids.size());
  int64_t total = 0;
  for (const auto& s : p->ids) total += static_cast<int64_t>(s.size()) + 1;
  *id_bytes = total;
}

// values: [T*N] f64 (NaN where absent — matches pandas' float64 exactly);
// filled: [T*N] u8; days: [T] i64 (days since 1970-01-01); ids:
// concatenated NUL-terminated UTF-8 strings.
void csv_pivot_fill(int64_t handle, double* values, uint8_t* filled,
                    int64_t* days, char* ids) {
  const Parsed* p = reinterpret_cast<const Parsed*>(handle);
  std::memcpy(values, p->values.data(), p->values.size() * sizeof(double));
  std::memcpy(filled, p->filled.data(), p->filled.size());
  std::memcpy(days, p->days.data(), p->days.size() * sizeof(int64_t));
  char* w = ids;
  for (const auto& s : p->ids) {
    std::memcpy(w, s.data(), s.size());
    w += s.size();
    *w++ = '\0';
  }
}

void csv_pivot_free(int64_t handle) {
  delete reinterpret_cast<Parsed*>(handle);
}

}  // extern "C"
