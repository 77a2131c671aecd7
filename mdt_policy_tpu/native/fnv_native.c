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
#include <string.h>

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


/* ---- Murmur3 32-bit (public-domain algorithm, Austin Appleby) ---- */

static uint32_t rotl32(uint32_t x, int8_t r) { return (x << r) | (x >> (32 - r)); }

static uint32_t murmur3_32_buf(const unsigned char *data, Py_ssize_t len, uint32_t seed)
{
    const Py_ssize_t nblocks = len / 4;
    uint32_t h1 = seed;
    const uint32_t c1 = 0xcc9e2d51U, c2 = 0x1b873593U;

    for (Py_ssize_t i = 0; i < nblocks; i++) {
        uint32_t k1;
        memcpy(&k1, data + i * 4, 4);   /* little-endian host */
        k1 *= c1; k1 = rotl32(k1, 15); k1 *= c2;
        h1 ^= k1; h1 = rotl32(h1, 13); h1 = h1 * 5 + 0xe6546b64U;
    }
    const unsigned char *tail = data + nblocks * 4;
    uint32_t k1 = 0;
    switch (len & 3) {
    case 3: k1 ^= (uint32_t)tail[2] << 16; /* fallthrough */
    case 2: k1 ^= (uint32_t)tail[1] << 8;  /* fallthrough */
    case 1: k1 ^= (uint32_t)tail[0];
            k1 *= c1; k1 = rotl32(k1, 15); k1 *= c2; h1 ^= k1;
    }
    h1 ^= (uint32_t)len;
    h1 ^= h1 >> 16; h1 *= 0x85ebca6bU; h1 ^= h1 >> 13;
    h1 *= 0xc2b2ae35U; h1 ^= h1 >> 16;
    return h1;
}

/* ---- xxHash 32/64 (public spec, Yann Collet) ---- */

#define XXH32_P1 2654435761U
#define XXH32_P2 2246822519U
#define XXH32_P3 3266489917U
#define XXH32_P4  668265263U
#define XXH32_P5  374761393U

static uint32_t xxh32_buf(const unsigned char *p, Py_ssize_t len, uint32_t seed)
{
    const unsigned char *end = p + len;
    uint32_t h;
    if (len >= 16) {
        uint32_t v1 = seed + XXH32_P1 + XXH32_P2;
        uint32_t v2 = seed + XXH32_P2;
        uint32_t v3 = seed;
        uint32_t v4 = seed - XXH32_P1;
        const unsigned char *limit = end - 16;
        do {
            uint32_t r;
            memcpy(&r, p, 4); v1 = rotl32(v1 + r * XXH32_P2, 13) * XXH32_P1; p += 4;
            memcpy(&r, p, 4); v2 = rotl32(v2 + r * XXH32_P2, 13) * XXH32_P1; p += 4;
            memcpy(&r, p, 4); v3 = rotl32(v3 + r * XXH32_P2, 13) * XXH32_P1; p += 4;
            memcpy(&r, p, 4); v4 = rotl32(v4 + r * XXH32_P2, 13) * XXH32_P1; p += 4;
        } while (p <= limit);
        h = rotl32(v1, 1) + rotl32(v2, 7) + rotl32(v3, 12) + rotl32(v4, 18);
    } else {
        h = seed + XXH32_P5;
    }
    h += (uint32_t)len;
    while (p + 4 <= end) {
        uint32_t r;
        memcpy(&r, p, 4);
        h = rotl32(h + r * XXH32_P3, 17) * XXH32_P4;
        p += 4;
    }
    while (p < end) {
        h = rotl32(h + (*p) * XXH32_P5, 11) * XXH32_P1;
        p++;
    }
    h ^= h >> 15; h *= XXH32_P2; h ^= h >> 13; h *= XXH32_P3; h ^= h >> 16;
    return h;
}

#define XXH64_P1 11400714785074694791ULL
#define XXH64_P2 14029467366897019727ULL
#define XXH64_P3  1609587929392839161ULL
#define XXH64_P4  9650029242287828579ULL
#define XXH64_P5  2870177450012600261ULL

static uint64_t rotl64(uint64_t x, int8_t r) { return (x << r) | (x >> (64 - r)); }

static uint64_t xxh64_round(uint64_t acc, uint64_t input)
{
    acc += input * XXH64_P2;
    acc = rotl64(acc, 31);
    acc *= XXH64_P1;
    return acc;
}

static uint64_t xxh64_merge(uint64_t acc, uint64_t val)
{
    acc ^= xxh64_round(0, val);
    return acc * XXH64_P1 + XXH64_P4;
}

static uint64_t xxh64_buf(const unsigned char *p, Py_ssize_t len, uint64_t seed)
{
    const unsigned char *end = p + len;
    uint64_t h;
    if (len >= 32) {
        uint64_t v1 = seed + XXH64_P1 + XXH64_P2;
        uint64_t v2 = seed + XXH64_P2;
        uint64_t v3 = seed;
        uint64_t v4 = seed - XXH64_P1;
        const unsigned char *limit = end - 32;
        do {
            uint64_t r;
            memcpy(&r, p, 8); v1 = xxh64_round(v1, r); p += 8;
            memcpy(&r, p, 8); v2 = xxh64_round(v2, r); p += 8;
            memcpy(&r, p, 8); v3 = xxh64_round(v3, r); p += 8;
            memcpy(&r, p, 8); v4 = xxh64_round(v4, r); p += 8;
        } while (p <= limit);
        h = rotl64(v1, 1) + rotl64(v2, 7) + rotl64(v3, 12) + rotl64(v4, 18);
        h = xxh64_merge(h, v1); h = xxh64_merge(h, v2);
        h = xxh64_merge(h, v3); h = xxh64_merge(h, v4);
    } else {
        h = seed + XXH64_P5;
    }
    h += (uint64_t)len;
    while (p + 8 <= end) {
        uint64_t r;
        memcpy(&r, p, 8);
        h = rotl64(h ^ xxh64_round(0, r), 27) * XXH64_P1 + XXH64_P4;
        p += 8;
    }
    if (p + 4 <= end) {
        uint32_t r;
        memcpy(&r, p, 4);
        h = rotl64(h ^ ((uint64_t)r * XXH64_P1), 23) * XXH64_P2 + XXH64_P3;
        p += 4;
    }
    while (p < end) {
        h = rotl64(h ^ ((*p) * XXH64_P5), 11) * XXH64_P1;
        p++;
    }
    h ^= h >> 33; h *= XXH64_P2; h ^= h >> 29; h *= XXH64_P3; h ^= h >> 32;
    return h;
}

DEFINE_HASH_FN(murmur3_32, murmur3_32_buf, uint32_t, 0, PyLong_FromUnsignedLongLong)
DEFINE_HASH_FN(xx_32, xxh32_buf, uint32_t, 0, PyLong_FromUnsignedLongLong)
DEFINE_HASH_FN(xx_64, xxh64_buf, uint64_t, 0, PyLong_FromUnsignedLongLong)

static PyMethodDef methods[] = {
    {"fnv1_32", (PyCFunction)py_fnv1_32, METH_VARARGS | METH_KEYWORDS,
     "FNV-1 32-bit hash (str: UTF-16-LE no BOM; bytes: raw)."},
    {"fnv1a_32", (PyCFunction)py_fnv1a_32, METH_VARARGS | METH_KEYWORDS,
     "FNV-1a 32-bit hash."},
    {"fnv1_64", (PyCFunction)py_fnv1_64, METH_VARARGS | METH_KEYWORDS,
     "FNV-1 64-bit hash."},
    {"fnv1a_64", (PyCFunction)py_fnv1a_64, METH_VARARGS | METH_KEYWORDS,
     "FNV-1a 64-bit hash."},
    {"murmur3_32", (PyCFunction)py_murmur3_32, METH_VARARGS | METH_KEYWORDS,
     "MurmurHash3 32-bit."},
    {"xx_32", (PyCFunction)py_xx_32, METH_VARARGS | METH_KEYWORDS,
     "xxHash 32-bit."},
    {"xx_64", (PyCFunction)py_xx_64, METH_VARARGS | METH_KEYWORDS,
     "xxHash 64-bit."},
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
