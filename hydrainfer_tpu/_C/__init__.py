"""Native host ops (C++). Build with `make native` or
`python setup.py build_ext --inplace`; every consumer falls back to its
pure-Python twin when the extension is absent (the reference's
try-import-with-graceful-degradation idiom, e.g. causal_attention.py:13-17).
"""
try:
    from . import hostops  # noqa: F401
except ImportError:
    hostops = None
