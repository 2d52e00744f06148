// Native data-loader runtime for pygraphblas_tpu.
//
// The reference's native tier is the SuiteSparse C engine; here the
// compute engine is JAX/XLA, and the native tier covers what remains
// host-bound on the hot path: dataset parsing (MatrixMarket / TSV edge
// lists) and COO canonicalization (radix sort + dedup), both of which
// dominate benchmark startup at GAP scale when done in Python/numpy.
//
// Exposed via the CPython C API (no pybind11 in this environment);
// Python-side wrapper: pygraphblas_tpu/io/native.py.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Triples {
  std::vector<int64_t> rows;
  std::vector<int64_t> cols;
  std::vector<double> vals;
  int64_t nrows = 0;
  int64_t ncols = 0;
  char field = 'r';  // r(eal) | i(nteger) | p(attern)
  char symmetry = 'g';
};

// fast forward over spaces/tabs
inline const char* skip_ws(const char* p, const char* end) {
  while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
  return p;
}

inline const char* next_line(const char* p, const char* end) {
  while (p < end && *p != '\n') ++p;
  return p < end ? p + 1 : end;
}

bool parse_mm_buffer(const char* buf, size_t len, Triples* out) {
  const char* p = buf;
  const char* end = buf + len;
  // header
  if (len < 14 || strncmp(p, "%%MatrixMarket", 14) != 0) return false;
  {
    const char* line_end = p;
    while (line_end < end && *line_end != '\n') ++line_end;
    std::string header(p, line_end - p);
    if (header.find("coordinate") == std::string::npos) return false;
    if (header.find("pattern") != std::string::npos) out->field = 'p';
    else if (header.find("integer") != std::string::npos) out->field = 'i';
    else out->field = 'r';
    if (header.find("symmetric") != std::string::npos) out->symmetry = 's';
    else if (header.find("skew-symmetric") != std::string::npos)
      out->symmetry = 'k';
    p = next_line(p, end);
  }
  while (p < end && *p == '%') p = next_line(p, end);
  char* q;
  out->nrows = strtoll(p, &q, 10);
  out->ncols = strtoll(q, &q, 10);
  int64_t nnz = strtoll(q, &q, 10);
  p = next_line(q, end);

  out->rows.reserve(nnz * (out->symmetry == 'g' ? 1 : 2));
  out->cols.reserve(out->rows.capacity());
  if (out->field != 'p') out->vals.reserve(out->rows.capacity());

  for (int64_t k = 0; k < nnz && p < end; ++k) {
    int64_t i = strtoll(p, &q, 10) - 1;
    int64_t j = strtoll(q, &q, 10) - 1;
    double v = 1.0;
    if (out->field != 'p') v = strtod(q, &q);
    out->rows.push_back(i);
    out->cols.push_back(j);
    if (out->field != 'p') out->vals.push_back(v);
    if (out->symmetry != 'g' && i != j) {
      out->rows.push_back(j);
      out->cols.push_back(i);
      if (out->field != 'p')
        out->vals.push_back(out->symmetry == 'k' ? -v : v);
    }
    p = next_line(q, end);
  }
  return true;
}

// LSD radix sort of (row, col) keyed triples, 16 bits per pass.
void radix_sort_triples(std::vector<int64_t>& rows,
                        std::vector<int64_t>& cols,
                        std::vector<double>& vals, bool has_vals) {
  const size_t n = rows.size();
  if (n < 2) return;
  int64_t max_row = 0, max_col = 0;
  for (size_t k = 0; k < n; ++k) {
    if (rows[k] > max_row) max_row = rows[k];
    if (cols[k] > max_col) max_col = cols[k];
  }
  std::vector<uint32_t> order(n), tmp(n);
  for (size_t k = 0; k < n; ++k) order[k] = (uint32_t)k;

  auto passes_for = [](int64_t maxv) {
    int p = 0;
    while (maxv > 0) { ++p; maxv >>= 16; }
    return p > 0 ? p : 1;
  };
  auto run_passes = [&](const std::vector<int64_t>& key, int npass) {
    std::vector<size_t> count(65536);
    for (int pass = 0; pass < npass; ++pass) {
      const int shift = pass * 16;
      std::fill(count.begin(), count.end(), 0);
      for (size_t k = 0; k < n; ++k)
        ++count[(key[order[k]] >> shift) & 0xFFFF];
      size_t total = 0;
      for (size_t b = 0; b < 65536; ++b) {
        size_t c = count[b];
        count[b] = total;
        total += c;
      }
      for (size_t k = 0; k < n; ++k) {
        uint32_t idx = order[k];
        tmp[count[(key[idx] >> shift) & 0xFFFF]++] = idx;
      }
      order.swap(tmp);
    }
  };
  run_passes(cols, passes_for(max_col));
  run_passes(rows, passes_for(max_row));

  // apply permutation, dedup keeping the LAST occurrence (stable LSD sort
  // keeps original order within equal keys)
  std::vector<int64_t> r2, c2;
  std::vector<double> v2;
  r2.reserve(n);
  c2.reserve(n);
  if (has_vals) v2.reserve(n);
  for (size_t k = 0; k < n; ++k) {
    uint32_t idx = order[k];
    bool dup = !r2.empty() && r2.back() == rows[idx] &&
               c2.back() == cols[idx];
    if (dup) {
      if (has_vals) v2.back() = vals[idx];
    } else {
      r2.push_back(rows[idx]);
      c2.push_back(cols[idx]);
      if (has_vals) v2.push_back(vals[idx]);
    }
  }
  rows.swap(r2);
  cols.swap(c2);
  if (has_vals) vals.swap(v2);
}

PyObject* vec_to_bytes(const void* data, size_t nbytes) {
  return PyBytes_FromStringAndSize(reinterpret_cast<const char*>(data),
                                   (Py_ssize_t)nbytes);
}

// parse_mm(path: str, canonicalize: bool=True)
//   -> (rows_bytes, cols_bytes, vals_bytes_or_None, nrows, ncols, field)
PyObject* py_parse_mm(PyObject*, PyObject* args) {
  const char* path;
  int canonicalize = 1;
  if (!PyArg_ParseTuple(args, "s|p", &path, &canonicalize)) return nullptr;

  FILE* f = fopen(path, "rb");
  if (!f) {
    PyErr_SetString(PyExc_FileNotFoundError, path);
    return nullptr;
  }
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<char> buf(sz);
  size_t got = fread(buf.data(), 1, sz, f);
  fclose(f);

  Triples t;
  bool ok;
  Py_BEGIN_ALLOW_THREADS
  ok = parse_mm_buffer(buf.data(), got, &t);
  if (ok && canonicalize)
    radix_sort_triples(t.rows, t.cols, t.vals, t.field != 'p');
  Py_END_ALLOW_THREADS
  if (!ok) {
    PyErr_SetString(PyExc_ValueError, "bad MatrixMarket file");
    return nullptr;
  }

  PyObject* rb = vec_to_bytes(t.rows.data(), t.rows.size() * 8);
  PyObject* cb = vec_to_bytes(t.cols.data(), t.cols.size() * 8);
  PyObject* vb = t.field == 'p'
                     ? (Py_INCREF(Py_None), Py_None)
                     : vec_to_bytes(t.vals.data(), t.vals.size() * 8);
  char field_str[2] = {t.field, 0};
  PyObject* res = Py_BuildValue("(OOOLLs)", rb, cb, vb,
                                (long long)t.nrows, (long long)t.ncols,
                                field_str);
  Py_DECREF(rb);
  Py_DECREF(cb);
  Py_DECREF(vb);
  return res;
}

// sort_dedup(rows_bytes, cols_bytes, vals_bytes_or_None)
//   -> (rows_bytes, cols_bytes, vals_bytes_or_None)
// int64 row/col keys; vals treated as opaque 8-byte lanes.
PyObject* py_sort_dedup(PyObject*, PyObject* args) {
  Py_buffer rb, cb;
  PyObject* vobj;
  if (!PyArg_ParseTuple(args, "y*y*O", &rb, &cb, &vobj)) return nullptr;
  size_t n = rb.len / 8;
  std::vector<int64_t> rows((int64_t*)rb.buf, (int64_t*)rb.buf + n);
  std::vector<int64_t> cols((int64_t*)cb.buf, (int64_t*)cb.buf + n);
  std::vector<double> vals;
  bool has_vals = vobj != Py_None;
  if (has_vals) {
    Py_buffer vb;
    if (PyObject_GetBuffer(vobj, &vb, PyBUF_SIMPLE) < 0) {
      PyBuffer_Release(&rb);
      PyBuffer_Release(&cb);
      return nullptr;
    }
    vals.assign((double*)vb.buf, (double*)vb.buf + n);
    PyBuffer_Release(&vb);
  }
  PyBuffer_Release(&rb);
  PyBuffer_Release(&cb);

  Py_BEGIN_ALLOW_THREADS
  radix_sort_triples(rows, cols, vals, has_vals);
  Py_END_ALLOW_THREADS

  PyObject* ro = vec_to_bytes(rows.data(), rows.size() * 8);
  PyObject* co = vec_to_bytes(cols.data(), cols.size() * 8);
  PyObject* vo = has_vals ? vec_to_bytes(vals.data(), vals.size() * 8)
                          : (Py_INCREF(Py_None), Py_None);
  PyObject* res = Py_BuildValue("(OOO)", ro, co, vo);
  Py_DECREF(ro);
  Py_DECREF(co);
  Py_DECREF(vo);
  return res;
}

PyMethodDef methods[] = {
    {"parse_mm", py_parse_mm, METH_VARARGS,
     "Parse a MatrixMarket file into canonical COO triples."},
    {"sort_dedup", py_sort_dedup, METH_VARARGS,
     "Radix sort + dedup (last wins) int64 COO triples."},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef module = {PyModuleDef_HEAD_INIT, "_fastio",
                      "Native IO runtime for pygraphblas_tpu", -1, methods};

}  // namespace

PyMODINIT_FUNC PyInit__fastio(void) { return PyModule_Create(&module); }
