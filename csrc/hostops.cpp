/* Native host-side batch packing for the serving hot loop.
 *
 * TPU-native counterpart of the reference's csrc/ host runtime (the
 * reference's CUDA kernels become Pallas/XLA programs; what remains hot on
 * the HOST is assembling each step's flat fill-batch buffer — token ids,
 * positions, virtual→physical slot translation, block tables, cu_q_lens —
 * which this extension does in one C pass instead of ~10 Python loops.
 * Falls back to the pure-Python builder (the oracle) when absent, matching
 * the reference's try-import-with-fallback idiom.
 *
 * Buffer layout (must match hydrainfer_tpu.models.factory.pack_fill_batch):
 *   [token_ids(T), positions(T), q_seq_ids(T), q_local_ids(T),
 *    new_kv_slot_ids(T), token_src_slots(T),
 *    kv_lens(S), sample_token_idx(S), sample_dst_slots(S),
 *    block_tables(S*MB), cu_q_lens(S+1), num_seqs(1),
 *    image_slot_ids(Ti), image_dst_idx(Ti)]
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstring>

namespace {

struct Region {
  int32_t *token_ids, *positions, *q_seq_ids, *q_local_ids;
  int32_t *new_slots, *src_slots, *kv_lens, *sample_idx, *dst_slots;
  int32_t *tables, *cu, *num_seqs, *img_slots, *img_dst;
};

Region layout(int32_t *base, long T, long S, long MB, long Ti) {
  Region r;
  r.token_ids = base;
  r.positions = r.token_ids + T;
  r.q_seq_ids = r.positions + T;
  r.q_local_ids = r.q_seq_ids + T;
  r.new_slots = r.q_local_ids + T;
  r.src_slots = r.new_slots + T;
  r.kv_lens = r.src_slots + T;
  r.sample_idx = r.kv_lens + S;
  r.dst_slots = r.sample_idx + S;
  r.tables = r.dst_slots + S;
  r.cu = r.tables + S * MB;
  r.num_seqs = r.cu + S + 1;
  r.img_slots = r.num_seqs + 1;
  r.img_dst = r.img_slots + Ti;
  return r;
}

// pack_fill_batch(out_buffer, T, S, MB, Ti, block_size, seqs, img_slots, img_dst)
// seqs: list of tuples (token_ids: None|list[int], pos_start, n_tokens,
//                       token_slot, kv_len, dst_slot, block_table: list[int],
//                       cache_start)
PyObject *pack_fill_batch(PyObject *, PyObject *args) {
  Py_buffer out;
  long T, S, MB, Ti, block_size;
  PyObject *seqs, *img_slots_obj, *img_dst_obj;
  if (!PyArg_ParseTuple(args, "w*lllllOOO", &out, &T, &S, &MB, &Ti,
                        &block_size, &seqs, &img_slots_obj, &img_dst_obj))
    return nullptr;

  long need = 6 * T + 3 * S + S * MB + (S + 1) + 1 + 2 * Ti;
  if ((long)(out.len / sizeof(int32_t)) != need) {
    PyBuffer_Release(&out);
    return PyErr_Format(PyExc_ValueError, "buffer has %ld i32, need %ld",
                        (long)(out.len / sizeof(int32_t)), need);
  }
  int32_t *base = (int32_t *)out.buf;
  Region r = layout(base, T, S, MB, Ti);

  // defaults / padding values
  for (long t = 0; t < T; t++) {
    r.token_ids[t] = 0;
    r.positions[t] = 0;
    r.q_seq_ids[t] = -1;
    r.q_local_ids[t] = 0;
    r.new_slots[t] = -1;
    r.src_slots[t] = -1;
  }
  for (long s = 0; s < S; s++) {
    r.kv_lens[s] = 0;
    r.sample_idx[s] = -1;
    r.dst_slots[s] = -1;
  }
  for (long i = 0; i < S * MB; i++) r.tables[i] = -1;

  long n_seqs = PyList_GET_SIZE(seqs);
  long t = 0;
  r.cu[0] = 0;
  for (long s = 0; s < n_seqs; s++) {
    PyObject *tup = PyList_GET_ITEM(seqs, s);
    PyObject *tok_obj = PyTuple_GET_ITEM(tup, 0);
    long pos_start = PyLong_AsLong(PyTuple_GET_ITEM(tup, 1));
    long n = PyLong_AsLong(PyTuple_GET_ITEM(tup, 2));
    long token_slot = PyLong_AsLong(PyTuple_GET_ITEM(tup, 3));
    long kv_len = PyLong_AsLong(PyTuple_GET_ITEM(tup, 4));
    long dst_slot = PyLong_AsLong(PyTuple_GET_ITEM(tup, 5));
    PyObject *table = PyTuple_GET_ITEM(tup, 6);
    long cache_start = PyLong_AsLong(PyTuple_GET_ITEM(tup, 7));
    if (PyErr_Occurred()) { PyBuffer_Release(&out); return nullptr; }
    if (t + n > T || s >= S) {
      PyBuffer_Release(&out);
      return PyErr_Format(PyExc_ValueError, "batch overflows buckets");
    }

    long n_blocks = PyList_GET_SIZE(table);
    if (n_blocks > MB) {
      PyBuffer_Release(&out);
      return PyErr_Format(PyExc_ValueError, "block table %ld > MB %ld",
                          n_blocks, MB);
    }
    for (long b = 0; b < n_blocks; b++)
      r.tables[s * MB + b] =
          (int32_t)PyLong_AsLong(PyList_GET_ITEM(table, b));

    for (long i = 0; i < n; i++) {
      long cid = cache_start + i;
      r.positions[t + i] = (int32_t)(pos_start + i);
      r.q_seq_ids[t + i] = (int32_t)s;
      r.q_local_ids[t + i] = (int32_t)i;
      r.new_slots[t + i] =
          r.tables[s * MB + cid / block_size] * block_size +
          (int32_t)(cid % block_size);
    }
    if (tok_obj == Py_None) {
      // unresolved decode token: fed from the device token table
      r.token_ids[t] = 0;
      r.src_slots[t] = (int32_t)token_slot;
    } else {
      for (long i = 0; i < n; i++)
        r.token_ids[t + i] =
            (int32_t)PyLong_AsLong(PyList_GET_ITEM(tok_obj, i));
    }
    t += n;
    r.kv_lens[s] = (int32_t)kv_len;
    r.sample_idx[s] = (int32_t)(t - 1);
    r.dst_slots[s] = (int32_t)dst_slot;
    r.cu[s + 1] = (int32_t)t;
  }
  for (long s = n_seqs; s < S; s++) r.cu[s + 1] = (int32_t)t;
  r.num_seqs[0] = (int32_t)n_seqs;

  long n_img = PyList_GET_SIZE(img_slots_obj);
  for (long i = 0; i < Ti; i++) {
    r.img_slots[i] = i < n_img
        ? (int32_t)PyLong_AsLong(PyList_GET_ITEM(img_slots_obj, i)) : 0;
    r.img_dst[i] = i < n_img
        ? (int32_t)PyLong_AsLong(PyList_GET_ITEM(img_dst_obj, i)) : -1;
  }
  if (PyErr_Occurred()) { PyBuffer_Release(&out); return nullptr; }

  PyBuffer_Release(&out);
  Py_RETURN_NONE;
}

PyMethodDef methods[] = {
    {"pack_fill_batch", pack_fill_batch, METH_VARARGS,
     "Pack one fill step's flat int32 batch buffer."},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef moduledef = {PyModuleDef_HEAD_INIT, "hostops",
                         "native host-side batch packing", -1, methods};

}  // namespace

PyMODINIT_FUNC PyInit_hostops(void) { return PyModule_Create(&moduledef); }
