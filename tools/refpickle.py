"""Dependency-free reader for the reference's joblib artifacts.

The container has no sklearn/scipy/joblib, but the reference ships its
fitted TF-IDF model as joblib pickles (`tfidf_vectorizer.joblib`,
`tfidf_matrix.joblib` — reference app.py:75-79). This module unpickles
them with stub classes standing in for sklearn/scipy types and a
reimplementation of joblib's NumpyArrayWrapper raw-byte protocol, so the
parity tests can compare our Spark-fitted TF-IDF against the reference's
actual fitted weights rather than trusting SURVEY.md numbers.

Only what the parity tests need is exposed:

    read_vectorizer(path) -> {"vocabulary": dict[str,int], "idf": ndarray,
                              "params": dict}
    read_csr(path)        -> (data, indices, indptr, shape)

Joblib stream format (uncompressed, joblib >= 1.2): a protocol-4 pickle
whose numpy arrays are replaced by NumpyArrayWrapper instances; each
wrapper's BUILD opcode is immediately followed *in the same byte stream*
by an optional alignment block (1 length byte + padding, present when the
wrapper has `numpy_array_alignment_bytes`) and then the raw C-order array
bytes. joblib's NumpyUnpickler swaps the wrapper for the materialized
array at BUILD time; we do the same with pickle's pure-Python Unpickler.
"""

from __future__ import annotations

import pickle

import numpy as np


class _Stub:
    """Attribute bag standing in for any sklearn/scipy class."""

    def __init__(self, *a, **k):
        pass


class _NumpyArrayWrapper:
    """Stand-in for joblib.numpy_pickle.NumpyArrayWrapper."""

    def read_array(self, fh):
        dtype = np.dtype(self.dtype)
        pad = getattr(self, "numpy_array_alignment_bytes", None)
        if pad:
            (skip,) = fh.read(1)
            if skip:
                fh.read(skip)
        if dtype.hasobject:
            # object arrays embed a nested plain pickle — load it under the
            # same global allowlist, never bare pickle.load (the artifacts
            # live in the explicitly-untrusted reference tree)
            return _RefUnpickler(fh).load()
        count = int(np.prod(self.shape)) if self.shape else 1
        data = fh.read(count * dtype.itemsize)
        arr = np.frombuffer(data, dtype=dtype, count=count)
        order = getattr(self, "order", "C")
        return arr.reshape(self.shape, order=order)


# The ONLY concrete globals a scikit-learn/scipy joblib artifact legitimately
# needs: numpy array/dtype reconstruction, a few value builtins, and
# OrderedDict. Everything else (os.system, builtins.eval, subprocess...)
# is refused — REDUCE on an unlisted global is exactly how a malicious
# pickle gets code execution.
_SAFE_GLOBALS = {
    ("collections", "OrderedDict"),
    ("builtins", "complex"),
    ("builtins", "bytearray"),
    ("builtins", "frozenset"),
    ("builtins", "set"),
    ("builtins", "slice"),
    ("builtins", "range"),
    ("numpy", "ndarray"),
    ("numpy", "dtype"),
    ("numpy.core.multiarray", "_reconstruct"),
    ("numpy._core.multiarray", "_reconstruct"),
    ("numpy.core.multiarray", "scalar"),
    ("numpy._core.multiarray", "scalar"),
}


class _RefUnpickler(pickle._Unpickler):
    dispatch = dict(pickle._Unpickler.dispatch)

    def __init__(self, fh):
        super().__init__(fh)
        self._fh = fh

    def find_class(self, module, name):
        if module.split(".")[0] in ("sklearn", "scipy"):
            return type(name, (_Stub,), {"__module__": module})
        if "numpy_pickle" in module and name in (
            "NumpyArrayWrapper",
            "NDArrayWrapper",
        ):
            return _NumpyArrayWrapper
        if (module, name) in _SAFE_GLOBALS:
            return super().find_class(module, name)
        if module.split(".")[0] == "numpy" and not name.startswith("_"):
            # numpy scalar types (float64, int32, ...) used in dtype states
            obj = super().find_class(module, name)
            if isinstance(obj, type) and issubclass(obj, (np.generic, np.dtype)):
                return obj
        raise pickle.UnpicklingError(
            f"refusing to resolve global {module}.{name} from untrusted joblib"
        )

    def load_build(self):
        state = self.stack.pop()
        inst = self.stack[-1]
        if isinstance(inst, _NumpyArrayWrapper):
            inst.__dict__.update(state)
            self.stack[-1] = inst.read_array(self._fh)
            return
        if isinstance(inst, _Stub) and isinstance(state, dict):
            inst.__dict__.update(state)
            return
        if isinstance(inst, _Stub) and isinstance(state, tuple) and len(state) == 2:
            d, slots = state
            inst.__dict__.update(d or {})
            inst.__dict__.update(slots or {})
            return
        # fall back to the standard BUILD for plain-python objects
        self.stack.append(state)
        pickle._Unpickler.load_build(self)

    dispatch[pickle.BUILD[0]] = load_build


def _load(path: str):
    with open(path, "rb") as fh:
        return _RefUnpickler(fh).load()


def read_vectorizer(path: str) -> dict:
    obj = _load(path)
    d = obj.__dict__
    idf = None
    tfidf = d.get("_tfidf")
    if tfidf is not None:
        diag = getattr(tfidf, "_idf_diag", None)
        data = diag.__dict__.get("data") if diag is not None else None
        if data is None:
            data = tfidf.__dict__.get("idf_")
        idf = np.asarray(data) if data is not None else None
    params = {
        k: d.get(k)
        for k in (
            "analyzer", "lowercase", "token_pattern", "stop_words",
            "ngram_range", "max_features", "min_df", "max_df", "binary",
            "norm", "use_idf", "smooth_idf", "sublinear_tf",
            "strip_accents",
        )
    }
    return {"vocabulary": dict(d["vocabulary_"]), "idf": idf, "params": params}


def read_csr(path: str):
    obj = _load(path)
    d = obj.__dict__
    shape = tuple(d.get("_shape") or d.get("shape"))
    return (
        np.asarray(d["data"]),
        np.asarray(d["indices"]),
        np.asarray(d["indptr"]),
        shape,
    )


if __name__ == "__main__":
    v = read_vectorizer("/root/reference/tfidf_vectorizer.joblib")
    print("params:", v["params"])
    print("vocab size:", len(v["vocabulary"]))
    print("idf:", None if v["idf"] is None else (v["idf"].shape, v["idf"][:3]))
    data, indices, indptr, shape = read_csr("/root/reference/tfidf_matrix.joblib")
    print("csr:", shape, data.dtype, len(data), data[:3])
