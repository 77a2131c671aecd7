/* _fnv_native: FNV hash family over Python str/bytes.
 *
 * TPU-era replacement for the single load-bearing behavior the reference
 * consumes from its vendored 73k-LoC pyhash C++ extension (SURVEY §2.9):
 * `pyhash.fnv1_32(str) -> uint32` with UTF-16-LE-minus-BOM marshalling
 * (reference: pyhash-0.9.3/src/Hash.h:219-268, src/fnv/fnv32.c), used for
 * deterministic validation window sizes (mdt/datasets/base_dataset.py:20,37)
 * and evaluation initial-state seeds (mdt/evaluation/utils.py:305).
 *
 * str inputs are hashed over their UTF-16-LE code units (no BOM) — exactly
 * what CPython's PyUnicode_AsUTF16String produces after stripping the 2-byte
 * BOM on little-endian hosts. bytes inputs are hashed directly.
 *
 * Exported: fnv1_32, fnv1a_32, fnv1_64, fnv1a_64 (each taking (obj, seed=basis)).
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdint.h>

#define FNV1_32_INIT  0x811c9dc5U
#define FNV_32_PRIME  0x01000193U
#define FNV1_64_INIT  0xcbf29ce484222325ULL
#define FNV_64_PRIME  0x100000001b3ULL

static uint32_t fnv1_32_buf(const unsigned char *buf, Py_ssize_t len, uint32_t h)
{
    for (Py_ssize_t i = 0; i < len; i++) {
        h *= FNV_32_PRIME;   /* FNV-1: multiply, then xor */
        h ^= buf[i];
    }
    return h;
}

static uint32_t fnv1a_32_buf(const unsigned char *buf, Py_ssize_t len, uint32_t h)
{
    for (Py_ssize_t i = 0; i < len; i++) {
        h ^= buf[i];         /* FNV-1a: xor, then multiply */
        h *= FNV_32_PRIME;
    }
    return h;
}

static uint64_t fnv1_64_buf(const unsigned char *buf, Py_ssize_t len, uint64_t h)
{
    for (Py_ssize_t i = 0; i < len; i++) {
        h *= FNV_64_PRIME;
        h ^= buf[i];
    }
    return h;
}

static uint64_t fnv1a_64_buf(const unsigned char *buf, Py_ssize_t len, uint64_t h)
{
    for (Py_ssize_t i = 0; i < len; i++) {
        h ^= buf[i];
        h *= FNV_64_PRIME;
    }
    return h;
}

/* Marshal a Python object to a byte buffer with pyhash's conventions:
 * bytes -> raw; str -> UTF-16-LE without BOM. Returns 0 on success.
 * *owned is set to a bytes object to DECREF (or NULL). */
static int marshal_data(PyObject *obj, const unsigned char **buf,
                        Py_ssize_t *len, PyObject **owned)
{
    *owned = NULL;
    if (PyBytes_CheckExact(obj)) {
        char *b;
        if (PyBytes_AsStringAndSize(obj, &b, len) == -1) return -1;
        *buf = (const unsigned char *)b;
        return 0;
    }
    if (PyUnicode_CheckExact(obj)) {
        PyObject *utf16 = PyUnicode_AsUTF16String(obj);  /* LE + BOM on LE host */
        if (!utf16) return -1;
        char *b;
        Py_ssize_t n;
        if (PyBytes_AsStringAndSize(utf16, &b, &n) == -1) {
            Py_DECREF(utf16);
            return -1;
        }
        *buf = (const unsigned char *)b + 2;  /* strip 2-byte BOM */
        *len = n - 2;
        *owned = utf16;
        return 0;
    }
    PyErr_SetString(PyExc_TypeError, "expected str or bytes");
    return -1;
}

#define DEFINE_HASH_FN(name, core, itype, init, pyconv)                        \
static PyObject *py_##name(PyObject *self, PyObject *args, PyObject *kwargs)   \
{                                                                              \
    static char *kwlist[] = {"data", "seed", NULL};                            \
    PyObject *obj;                                                             \
    unsigned long long seed = (unsigned long long)(init);                      \
    if (!PyArg_ParseTupleAndKeywords(args, kwargs, "O|K", kwlist, &obj, &seed))\
        return NULL;                                                           \
    const unsigned char *buf;                                                  \
    Py_ssize_t len;                                                            \
    PyObject *owned;                                                           \
    if (marshal_data(obj, &buf, &len, &owned) == -1) return NULL;              \
    itype h = core(buf, len, (itype)seed);                                     \
    Py_XDECREF(owned);                                                         \
    return pyconv((unsigned long long)h);                                      \
}

DEFINE_HASH_FN(fnv1_32, fnv1_32_buf, uint32_t, FNV1_32_INIT, PyLong_FromUnsignedLongLong)
DEFINE_HASH_FN(fnv1a_32, fnv1a_32_buf, uint32_t, FNV1_32_INIT, PyLong_FromUnsignedLongLong)
DEFINE_HASH_FN(fnv1_64, fnv1_64_buf, uint64_t, FNV1_64_INIT, PyLong_FromUnsignedLongLong)
DEFINE_HASH_FN(fnv1a_64, fnv1a_64_buf, uint64_t, FNV1_64_INIT, PyLong_FromUnsignedLongLong)

static PyMethodDef methods[] = {
    {"fnv1_32", (PyCFunction)py_fnv1_32, METH_VARARGS | METH_KEYWORDS,
     "FNV-1 32-bit hash (str: UTF-16-LE no BOM; bytes: raw)."},
    {"fnv1a_32", (PyCFunction)py_fnv1a_32, METH_VARARGS | METH_KEYWORDS,
     "FNV-1a 32-bit hash."},
    {"fnv1_64", (PyCFunction)py_fnv1_64, METH_VARARGS | METH_KEYWORDS,
     "FNV-1 64-bit hash."},
    {"fnv1a_64", (PyCFunction)py_fnv1a_64, METH_VARARGS | METH_KEYWORDS,
     "FNV-1a 64-bit hash."},
    {NULL, NULL, 0, NULL}
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_fnv_native", "FNV hash family (pyhash-compatible)",
    -1, methods
};

PyMODINIT_FUNC PyInit__fnv_native(void)
{
    return PyModule_Create(&moduledef);
}
