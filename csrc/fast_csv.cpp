// Fast CSV -> columnar parser for the MALLORN lightcurve schema.
//
// The reference's data layer reads ~10^6-row CSVs through pandas
// (reference: src/utils/data_loader.py:36-62). This native reader does a
// single zero-copy pass over the file and emits contiguous columns ready
// for the packer: time/flux/flux_err (double), band index (int), and a
// per-row object index against a deduplicated id table.
//
// C ABI only (consumed via ctypes; no pybind11 in the image).

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

extern "C" {

struct CsvResult {
  int64_t n_rows;
  int64_t n_objects;
  double* time;
  double* flux;
  double* flux_err;
  int32_t* band;
  int32_t* obj_idx;
  char* ids;        // null-separated unique ids, first-appearance order
  int64_t ids_len;  // total bytes in ids
  char* error;      // non-null on failure
};

static int band_index(const char* s, size_t len) {
  if (len < 1) return -1;
  switch (s[0]) {
    case 'u': return 0;
    case 'g': return 1;
    case 'r': return 2;
    case 'i': return 3;
    case 'z': return 4;
    case 'y': return 5;
    default: return -1;
  }
}

static CsvResult* make_error(const char* msg) {
  CsvResult* r = (CsvResult*)calloc(1, sizeof(CsvResult));
  r->error = strdup(msg);
  return r;
}

CsvResult* parse_lightcurves(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return make_error("cannot open file");
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::string buf;
  buf.resize(size);
  if (size > 0 && fread(&buf[0], 1, size, f) != (size_t)size) {
    fclose(f);
    return make_error("short read");
  }
  fclose(f);

  const char* p = buf.data();
  const char* end = p + buf.size();

  // --- header: locate the five known columns -------------------------
  const char* line_end = (const char*)memchr(p, '\n', end - p);
  if (!line_end) return make_error("no header line");
  int col_id = -1, col_time = -1, col_flux = -1, col_err = -1, col_band = -1;
  {
    int col = 0;
    const char* s = p;
    while (s <= line_end) {
      const char* c = s;
      while (c < line_end && *c != ',') c++;
      std::string name(s, c - s);
      if (!name.empty() && name.back() == '\r') name.pop_back();
      if (name == "object_id") col_id = col;
      else if (name == "Time (MJD)") col_time = col;
      else if (name == "Flux") col_flux = col;
      else if (name == "Flux_err") col_err = col;
      else if (name == "Filter") col_band = col;
      col++;
      s = c + 1;
      if (c == line_end) break;
    }
  }
  if (col_id < 0 || col_time < 0 || col_flux < 0 || col_err < 0 || col_band < 0)
    return make_error("missing required columns in header");

  p = line_end + 1;

  std::vector<double> vtime, vflux, verr;
  std::vector<int32_t> vband, vobj;
  std::unordered_map<std::string, int32_t> id_map;
  std::vector<std::string> id_order;
  vtime.reserve(1 << 20);

  int max_col = col_id;
  if (col_time > max_col) max_col = col_time;
  if (col_flux > max_col) max_col = col_flux;
  if (col_err > max_col) max_col = col_err;
  if (col_band > max_col) max_col = col_band;

  std::string last_id;
  int32_t last_idx = -1;

  while (p < end) {
    const char* le = (const char*)memchr(p, '\n', end - p);
    if (!le) le = end;
    if (le > p) {
      const char* fields[64];
      size_t flens[64];
      int col = 0;
      const char* s = p;
      while (s <= le && col <= max_col && col < 64) {
        const char* c = s;
        while (c < le && *c != ',') c++;
        fields[col] = s;
        flens[col] = c - s;
        col++;
        s = c + 1;
        if (c == le) break;
      }
      if (col > max_col) {
        // trim \r
        for (int k = 0; k < col; k++) {
          if (flens[k] && fields[k][flens[k] - 1] == '\r') flens[k]--;
        }
        int b = band_index(fields[col_band], flens[col_band]);
        if (b >= 0) {
          char tmp[64];
          auto parse_d = [&](int k) {
            size_t n = flens[k] < 63 ? flens[k] : 63;
            memcpy(tmp, fields[k], n);
            tmp[n] = 0;
            // empty/non-numeric field -> NaN (pandas semantics; bare
            // strtod would silently yield 0.0 for an empty field)
            char* ep = nullptr;
            double v = strtod(tmp, &ep);
            return ep == tmp ? NAN : v;
          };
          // object id (cache the common consecutive-rows case)
          int32_t oi;
          if ((int64_t)flens[col_id] == (int64_t)last_id.size() &&
              memcmp(fields[col_id], last_id.data(), flens[col_id]) == 0) {
            oi = last_idx;
          } else {
            std::string id(fields[col_id], flens[col_id]);
            auto it = id_map.find(id);
            if (it == id_map.end()) {
              oi = (int32_t)id_order.size();
              id_map.emplace(id, oi);
              id_order.push_back(id);
            } else {
              oi = it->second;
            }
            last_id = std::move(id);
            last_idx = oi;
          }
          vtime.push_back(parse_d(col_time));
          vflux.push_back(parse_d(col_flux));
          verr.push_back(parse_d(col_err));
          vband.push_back(b);
          vobj.push_back(oi);
        }
      }
    }
    p = le + 1;
  }

  CsvResult* r = (CsvResult*)calloc(1, sizeof(CsvResult));
  r->n_rows = (int64_t)vtime.size();
  r->n_objects = (int64_t)id_order.size();
  r->time = (double*)malloc(sizeof(double) * vtime.size());
  r->flux = (double*)malloc(sizeof(double) * vtime.size());
  r->flux_err = (double*)malloc(sizeof(double) * vtime.size());
  r->band = (int32_t*)malloc(sizeof(int32_t) * vtime.size());
  r->obj_idx = (int32_t*)malloc(sizeof(int32_t) * vtime.size());
  memcpy(r->time, vtime.data(), sizeof(double) * vtime.size());
  memcpy(r->flux, vflux.data(), sizeof(double) * vflux.size());
  memcpy(r->flux_err, verr.data(), sizeof(double) * verr.size());
  memcpy(r->band, vband.data(), sizeof(int32_t) * vband.size());
  memcpy(r->obj_idx, vobj.data(), sizeof(int32_t) * vobj.size());

  int64_t total = 0;
  for (auto& s : id_order) total += (int64_t)s.size() + 1;
  r->ids = (char*)malloc(total);
  r->ids_len = total;
  char* w = r->ids;
  for (auto& s : id_order) {
    memcpy(w, s.data(), s.size());
    w += s.size();
    *w++ = 0;
  }
  return r;
}

void free_result(CsvResult* r) {
  if (!r) return;
  free(r->time);
  free(r->flux);
  free(r->flux_err);
  free(r->band);
  free(r->obj_idx);
  free(r->ids);
  free(r->error);
  free(r);
}

}  // extern "C"
